"""History-array kernel: the per-row light-curve data model, pure Spark SQL.

The reference's single most load-bearing operator is ``concat_col`` —
project field x out of every struct in the history array and append the
current value, producing a flat time-ordered array (reference semantics:
tutorial/utilities.py:23-26 "from the most ancient to the most recent";
exercised at ztf/nalerthist/processor.py:49-55). Everything downstream
(lookback, deltas, non-NaN counts, per-band filters) operates on these
arrays. All builders here are native column expressions — they stay inside
whole-stage codegen, never cross into Python, and Catalyst prunes the
parquet scan to exactly the struct fields referenced.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def concat_col(
    df: DataFrame,
    colname: str,
    prefix: str = "c",
    current: str = "candidate",
    history: str = "prv_candidates",
) -> DataFrame:
    """Append ``{prefix}{colname}`` = history.{colname} || [current.{colname}].

    ``history.colname`` uses Spark's implicit per-element struct-field
    extraction on an array column (an implicit ``transform``); the result
    is a flat ArrayType column ordered oldest → newest.
    (reference semantics: fink_utils concat_col as used in
    ztf/nalerthist/processor.py:49-55; rubin form rubin/cats/processor.py:94-98)
    """
    return df.withColumn(
        prefix + colname,
        F.concat(
            F.col(f"{history}.{colname}"),
            F.array(F.col(f"{current}.{colname}")),
        ),
    )


def collect_history(
    df: DataFrame,
    key: str,
    order: str,
    values: list[str],
    prefix: str = "c",
) -> DataFrame:
    """Group rows of a flat table into one row per key with time-sorted
    value arrays — the ``collect_list`` materialization of a stream
    (reference: the SSOFT aggregated table shape, ztf/ssoft/processor.py:780-800).

    Emits one ``{prefix}{v}`` array column per requested value, all aligned
    on ascending ``order``. Implemented as a single groupBy +
    ``array_sort(collect_list(struct(order, *values)))`` so there is exactly
    ONE shuffle regardless of how many value arrays are requested; the
    per-field projection afterwards is a free narrow transform.
    """
    struct_col = F.struct(F.col(order).alias("__ord"), *[F.col(v) for v in values])
    grouped = df.groupBy(key).agg(
        F.array_sort(F.collect_list(struct_col)).alias("__hist")
    )
    out = grouped.withColumn(prefix + order, F.col("__hist.__ord"))
    for v in values:
        out = out.withColumn(prefix + v, F.col(f"__hist.{v}"))
    return out.drop("__hist")


def delta_last(arr: Column | str) -> Column:
    """Difference of the last two elements of a time-ordered array —
    'magnitude change since previous measurement'
    (reference semantics: tutorial/utilities.py:18-35 np.diff(...)[-1]).
    Null when fewer than 2 elements."""
    c = F.col(arr) if isinstance(arr, str) else arr
    return F.when(
        F.size(c) >= 2, F.element_at(c, -1) - F.element_at(c, -2)
    ).otherwise(F.lit(None))


def non_null_count(arr: Column | str) -> Column:
    """Count of non-null, non-NaN elements of an array — the ``nalerthist``
    kernel (reference semantics: np.sum(x == x),
    ztf/nalerthist/processor.py:66)."""
    c = F.col(arr) if isinstance(arr, str) else arr
    return F.size(F.filter(c, lambda x: x.isNotNull() & ~F.isnan(x)))


def count_in_window(arr_time: Column | str, lo, hi) -> Column:
    """Count history elements whose time lies in [lo, hi) — 'prior
    detections in window' (reference semantics: size(filter(prv_candidates,
    cand -> ...)), ztf/transient_features/processor.py:128-148). Takes
    only the time array: an earlier signature also accepted a value
    array it silently ignored — a trap for callers expecting value
    filtering that never happened."""
    t = F.col(arr_time) if isinstance(arr_time, str) else arr_time
    return F.size(F.filter(t, lambda x: (x >= lo) & (x < hi)))


def last_in_band(
    arr_time: Column | str,
    arr_val: Column | str,
    arr_band: Column | str,
    band,
) -> Column:
    """Most recent value whose band matches — 'last measurement in the same
    filter, walking back' (reference semantics: get_last_alert reverse scan,
    ztf/fast_transient_rate/processor.py:33-115). Implemented as
    zip → filter → element_at(-1): no shuffle, no Python."""
    t = F.col(arr_time) if isinstance(arr_time, str) else arr_time
    v = F.col(arr_val) if isinstance(arr_val, str) else arr_val
    b = F.col(arr_band) if isinstance(arr_band, str) else arr_band
    zipped = F.arrays_zip(t.alias("t"), v.alias("v"), b.alias("b"))
    matching = F.filter(zipped, lambda s: s["b"] == band)
    return F.try_element_at(matching, F.lit(-1))["v"]


def first_above(arr_time: Column | str, arr_val: Column | str, threshold) -> Column:
    """Earliest time whose value exceeds threshold — 'first 5-sigma
    detection time' (reference semantics: jdstarthist5sigma,
    ztf/fast_transient_rate/processor.py:68-69)."""
    t = F.col(arr_time) if isinstance(arr_time, str) else arr_time
    v = F.col(arr_val) if isinstance(arr_val, str) else arr_val
    zipped = F.arrays_zip(t.alias("t"), v.alias("v"))
    matching = F.filter(zipped, lambda s: s["v"] > threshold)
    return F.try_element_at(matching, F.lit(1))["t"]


def band_peak(arr_val: Column | str, arr_band: Column | str, band) -> Column:
    """Per-band historical peak (min value = brightest magnitude) —
    (reference semantics: transform(filter(...)) + array_min,
    ztf/transient_features/processor.py:156-164)."""
    v = F.col(arr_val) if isinstance(arr_val, str) else arr_val
    b = F.col(arr_band) if isinstance(arr_band, str) else arr_band
    zipped = F.arrays_zip(v.alias("v"), b.alias("b"))
    return F.array_min(
        F.transform(F.filter(zipped, lambda s: s["b"] == band), lambda s: s["v"])
    )


def trapezoid_integral(arr_t: Column | str, arr_v: Column | str) -> Column:
    """Trapezoidal integral of v over t for a time-sorted array pair —
    the trailing-fluence kernel (reference semantics: np.trapezoid over
    cjd, ztf/blazar_extreme_state/utils.py:122-146). 0.0 when fewer than
    2 points. Pure array expressions: slice both arrays into (i, i+1)
    views, zip the trapezoid terms, fold-sum."""
    t = F.col(arr_t) if isinstance(arr_t, str) else arr_t
    v = F.col(arr_v) if isinstance(arr_v, str) else arr_v
    # greatest(n-1, 0): a 0-element array would otherwise pass slice a
    # negative length and throw (surfaced by the hypothesis property test
    # — the first streamed micro-batch of a new key has exactly this shape)
    n = F.greatest(F.size(t) - 1, F.lit(0))
    t1, t2 = F.slice(t, 1, n), F.slice(t, 2, n)
    v1, v2 = F.slice(v, 1, n), F.slice(v, 2, n)
    mid = F.zip_with(v1, v2, lambda a, b: (a + b) / 2)
    dt = F.zip_with(t2, t1, lambda a, b: a - b)
    terms = F.zip_with(mid, dt, lambda m, d: m * d)
    return F.aggregate(terms, F.lit(0.0), lambda acc, x: acc + x)


def any_matching(arr: Column | str, predicate) -> Column:
    """EXISTS over an array with null-safe false default (reference
    semantics: EXISTS(prv_candidates, ...) wrapped in coalesce(..., False),
    ztf/transient_features/processor.py:383-403)."""
    c = F.col(arr) if isinstance(arr, str) else arr
    return F.coalesce(F.exists(c, predicate), F.lit(False))
