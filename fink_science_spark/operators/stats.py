"""Distribution-comparison statistics as native window/HOF plans.

The reference's hostless-detection module decides "is there a host
galaxy under this transient?" by comparing two distributions of
Wasserstein distances with a two-sample Kolmogorov–Smirnov test
(ztf/hostless_detection/powerspectrum.py:214-222, scipy.stats.kstest)
over binned Fourier power spectra of the image stamps
(powerspectrum.py:103-117). Neither kernel needs scipy on Spark:

- the two-sample KS statistic ``sup_x |F_a(x) - F_b(x)|`` is a single
  window pass: RANGE-framed cumulative indicator counts give both
  empirical CDFs at every observed point (ties handled exactly — a
  RANGE frame includes every row sharing the current value), and a
  group-max of the |difference| finishes it. One shuffle, all codegen.
- the binned power spectrum is an unrolled real DFT over bounded
  history arrays: per-frequency sequential folds (``F.aggregate``)
  keep the float operation order identical to the SQL oracle.

At 100 TB both are scan-shaped: the KS plan shuffles only the grouping
key + value (two narrow columns), and the DFT folds are per-row HOFs
with no Python and no shuffle beyond the history collect.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def ks_two_sample(
    df: DataFrame,
    group: str,
    value: str,
    in_a: Column,
    in_b: Column,
    out: str = "ks_stat",
) -> DataFrame:
    """Per-group two-sample KS statistic between the rows selected by the
    boolean Columns ``in_a`` and ``in_b`` (reference semantics:
    scipy.stats.kstest two-sample path as called from
    ztf/hostless_detection/powerspectrum.py:216-219).

    Plan: one window partitioned by ``group`` ordered by ``value`` with a
    RANGE unbounded-preceding frame — cumulative membership counts ARE the
    two ECDFs evaluated at every sample point (RANGE, not ROWS, so ties
    contribute all-or-nothing exactly as the mathematical CDF does) — then
    a group-level max of |F_a - F_b|. Rows in neither sample still see the
    correct ECDFs but can never attain the supremum, so they are filtered
    before the window. Returns (group, n_a, n_b, ks_stat).
    """
    a = F.when(in_a, F.lit(1)).otherwise(F.lit(0))
    b = F.when(in_b, F.lit(1)).otherwise(F.lit(0))
    base = df.select(
        F.col(group), F.col(value), a.alias("__a"), b.alias("__b")
    ).filter((F.col("__a") == 1) | (F.col("__b") == 1))

    w_cum = (
        Window.partitionBy(group)
        .orderBy(value)
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(group)
    stepped = base.select(
        F.col(group),
        F.sum("__a").over(w_cum).alias("__ca"),
        F.sum("__b").over(w_cum).alias("__cb"),
        F.sum("__a").over(w_all).alias("__na"),
        F.sum("__b").over(w_all).alias("__nb"),
    )
    return (
        stepped.filter((F.col("__na") > 0) & (F.col("__nb") > 0))
        .groupBy(group)
        .agg(
            F.first("__na").alias("n_a"),
            F.first("__nb").alias("n_b"),
            F.max(
                F.abs(F.col("__ca") / F.col("__na") - F.col("__cb") / F.col("__nb"))
            ).alias(out),
        )
    )


def ks_two_sample_sql(
    table_expr: str,
    group: str,
    value: str,
    in_a_sql: str,
    in_b_sql: str,
    out: str = "ks_stat",
) -> str:
    """DuckDB twin of :func:`ks_two_sample` — same indicator sums, same
    RANGE frame, same division order, so the ECDF values are bit-equal."""
    return f"""
WITH __base AS (
  SELECT {group},
         {value} AS __v,
         CASE WHEN {in_a_sql} THEN 1 ELSE 0 END AS __a,
         CASE WHEN {in_b_sql} THEN 1 ELSE 0 END AS __b
  FROM {table_expr}
  WHERE ({in_a_sql}) OR ({in_b_sql})
),
__stepped AS (
  SELECT {group},
         sum(__a) OVER (PARTITION BY {group} ORDER BY __v
                        RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS __ca,
         sum(__b) OVER (PARTITION BY {group} ORDER BY __v
                        RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS __cb,
         sum(__a) OVER (PARTITION BY {group}) AS __na,
         sum(__b) OVER (PARTITION BY {group}) AS __nb
  FROM __base
)
SELECT {group},
       any_value(__na)::BIGINT AS n_a,
       any_value(__nb)::BIGINT AS n_b,
       max(abs(__ca / __na - __cb / __nb)) AS {out}
FROM __stepped
WHERE __na > 0 AND __nb > 0
GROUP BY {group}
"""


# --------------------------------------------------------------------------
# Unrolled real DFT power spectrum over a bounded value array.
# --------------------------------------------------------------------------

# 2π/N as one literal double so both engines multiply the same constant.
def _omega(n_fft: int) -> float:
    return 2.0 * math.pi / n_fft


def dft_power(arr: Column, k: int, n_fft: int) -> Column:
    """``|X_k|²`` of the first ``n_fft`` elements of ``arr`` — the per-bin
    quantity of the reference's power spectrum (np.fft.fftn then
    |·|² binned, ztf/hostless_detection/powerspectrum.py:103-117).

    Sequential ``F.aggregate`` folds (never a reassociating sum) keep the
    float addition order identical to the SQL twin; the angle is computed
    as ``(j*k) * (2π/N)`` — integer product first, one constant multiply —
    so both engines call cos/sin on bit-identical arguments.
    """
    c = F.lit(_omega(n_fft))
    vs = F.slice(arr, 1, n_fft)
    idx = F.sequence(F.lit(0), F.size(vs) - 1)

    # ONE fold per frequency: a (re, im) struct accumulator with the
    # |X_k|² finish — naive re*re + im*im would inline the whole fold
    # expression four times (re twice, im twice) and blow up codegen.
    power = F.aggregate(
        idx,
        F.struct(F.lit(0.0).alias("re"), F.lit(0.0).alias("im")),
        lambda acc, j: F.struct(
            (
                acc["re"]
                + F.element_at(vs, (j + 1).cast("int"))
                * F.cos((j * k).cast("double") * c)
            ).alias("re"),
            (
                acc["im"]
                + F.element_at(vs, (j + 1).cast("int"))
                * F.sin((j * k).cast("double") * c)
            ).alias("im"),
        ),
        lambda acc: acc["re"] * acc["re"] + acc["im"] * acc["im"],
    )
    # guard: sequence(0, -1) would DESCEND for an empty slice
    return F.when(F.size(vs) > 0, power).otherwise(F.lit(0.0))


def dft_power_sql(arr_expr: str, k: int, n_fft: int) -> str:
    """DuckDB twin of :func:`dft_power`: same slice, same angle formula,
    same left-to-right accumulation (list comprehension + list_sum over
    the in-order index range)."""
    c = repr(_omega(n_fft))
    vs = f"{arr_expr}[1:{n_fft}]"
    re = (
        f"coalesce(list_sum([{vs}[j + 1] * cos((j * {k}) * {c})"
        f" for j in generate_series(0, len({vs}) - 1)]), 0.0)"
    )
    im = (
        f"coalesce(list_sum([{vs}[j + 1] * sin((j * {k}) * {c})"
        f" for j in generate_series(0, len({vs}) - 1)]), 0.0)"
    )
    return f"(({re}) * ({re}) + ({im}) * ({im}))"
