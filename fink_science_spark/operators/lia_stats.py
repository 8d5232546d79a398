"""LIA 47-statistic light-curve feature bank, in the TRAINED order.

The reference's microlensing module feeds 47 per-band statistics from
the external LIA package into its trained RandomForest
(ztf/microlensing/classifier.py:25-43 ``_extract`` →
``extract_features.extract_all(mag, magerr, convert=True)``;
ztf/microlensing/processor.py:129-190 applies DC-mag conversion and
per-band gates first). The LIA package is absent from this
environment; the statistic identities AND their order were recovered
from the real rf.sav itself — each feature index's trained
split-threshold signature pins its definition:

* indices 11/12/13 split only at 0.5 → the three binary
  check_for_duplicate / _max_ / _min_ statistics;
* 0/1/2, 7/8/9, 19/20, 25/26, 33 split at k+0.5 → RAW COUNTS
  (above/below N·σ, count above/below mean, longest strikes, peaks);
* 9 (below5), 17/18 (con, con2) are never split on — vanishingly rare
  counts, exactly what those statistics produce;
* 5 splits up to 2.7e6 → amplitude on RAW zp=24 flux; everything else
  matches max-normalized flux scales ((0,1] ratios, Σx ≤ n, ±0.03
  mean-change slopes, Stetson J up to 3.8e5, von Neumann ~2);
* the resulting name set is exactly the LIA statistic list in
  ASCII-alphabetical order (above1 … vonNeumannRatio, 47 with std),
  the order `np.array([...])` assembly in LIA's extract_all produces.

Two statistics keep documented engine-specific surrogates with the
right range: shannon_entropy (10-bin histogram entropy; LIA's
error-model entropy needs per-point CDFs) and shapiro_wilk → the
Shapiro-Francia W' (squared correlation with Blom scores via the
Beasley-Springer-Moro inverse normal CDF — SQL-expressible, unlike
scipy's AS R94 iteration).

Every statistic has an exact DuckDB SQL twin; Spark == SQL is the
asserted contract (engine-wide round-at-6), plus the spread guard that
the vectors exercise the trained split ranges
(tests/test_sklearn_real.py).

Conversion (LIA's ``convert=True``): raw flux fraw = 10^(−0.4·(m−24)),
normalized flux x = 10^(−0.4·(m − min m)) = fraw/max(fraw) ∈ (0, 1],
errors e_x = magerr · x · ln10/2.5. All three QUANTIZED at 6 decimals
immediately — equality-based statistics (duplicates, recurring-point
ratios, histogram bins) must see identical doubles in both engines,
and numpy's pow and DuckDB's pow may differ in the last ulp.

Sequence statistics use time order (ties broken by value then error —
the engine's array_sort(struct(t, v, e)) order).
"""

from __future__ import annotations

import numpy as np
import pandas as pd  # noqa: F401 - top-level: pandas_udf PEP-563 hints
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the 47 statistics in the forest's trained feature order f0..f46
LIA_STAT_NAMES = [
    "above1",  # 0: count x > med + 1σ
    "above3",  # 1
    "above5",  # 2
    "abs_energy",  # 3: Σx²
    "abs_sum_changes",  # 4: Σ|Δx|
    "amplitude",  # 5: (max−min)/2 of RAW zp=24 flux
    "auto_corr",  # 6: lag-1 autocorrelation
    "below1",  # 7: count x < med − 1σ
    "below3",  # 8
    "below5",  # 9 (unused by the trained forest)
    "c3",  # 10: mean(x_i·x_{i+1}·x_{i+2})
    "check_for_duplicate",  # 11: any value repeats
    "check_for_max_duplicate",  # 12
    "check_for_min_duplicate",  # 13
    "check_max_last_loc",  # 14: (n − last argmax)/n
    "check_min_last_loc",  # 15
    "complexity",  # 16: sqrt(Σ(Δx)²)
    "con",  # 17: count of 3 consecutive > mean + 2σ (unused)
    "con2",  # 18: … < mean − 2σ (unused)
    "count_above",  # 19: count x > mean
    "count_below",  # 20: count x < mean
    "first_loc_max",  # 21: first argmax (0-based) / n
    "first_loc_min",  # 22
    "integrate",  # 23: trapezoid integral, unit spacing
    "kurtosis",  # 24: population excess
    "longest_strike_above",  # 25: longest run x > med (raw length)
    "longest_strike_below",  # 26
    "mean_abs_change",  # 27
    "mean_change",  # 28: (x_n − x_1)/(n−1)
    "mean_second_derivative",  # 29
    "median_abs_dev",  # 30
    "median_buffer_range",  # 31: fraction within 10% amplitude of med
    "median_distance",  # 32: median |Δx|
    "peak_detection",  # 33: count of local maxima above med + σ
    "ratio_recurring",  # 34: recurring values / distinct values
    "root_mean_squared",  # 35
    "shannon_entropy",  # 36: 10-bin histogram entropy (surrogate)
    "shapiro_wilk",  # 37: Shapiro-Francia W' (surrogate)
    "skewness",  # 38: population
    "std",  # 39: sample (ddof=1)
    "std_over_mean",  # 40
    "stetson_j",  # 41
    "stetson_k",  # 42
    "stetson_l",  # 43: J·K/0.798
    "sum_values",  # 44: Σx
    "time_rev_asym",  # 45: mean(x_{i+2}²x_{i+1} − x_{i+1}x_i²)
    "von_neumann",  # 46: Σ(Δx)²/((n−1)·var)
]

assert len(LIA_STAT_NAMES) == 47

LIA_ZP = 24.0  # LIA's convert=True flux zero point

# Beasley-Springer-Moro inverse normal CDF polynomial (Moro 1995, as
# tabulated in Glasserman, "Monte Carlo Methods in Financial
# Engineering" §2.3.2) — evaluated IDENTICALLY (Horner) in numpy and in
# the SQL twin so Blom scores for the Shapiro-Francia statistic match
# to the ulp.
_BSM_A = (2.50662823884, -18.61500062529, 41.39119773534, -25.44106049637)
_BSM_B = (-8.47351093090, 23.08336743743, -21.06224101826, 3.13082909833)
_BSM_C = (
    0.3374754822726147,
    0.9761690190917186,
    0.1607979714918209,
    0.0276438810333863,
    0.0038405729373609,
    0.0003951896511919,
    0.0000321767881768,
    0.0000002888167364,
    0.0000003960315187,
)


def norm_ppf_bsm(u: np.ndarray) -> np.ndarray:
    """Φ⁻¹(u) via the BSM polynomial, vectorized."""
    u = np.asarray(u, dtype=np.float64)
    y = u - 0.5
    r = y * y
    a0, a1, a2, a3 = _BSM_A
    b1, b2, b3, b4 = _BSM_B
    central = (
        y
        * (((a3 * r + a2) * r + a1) * r + a0)
        / ((((b4 * r + b3) * r + b2) * r + b1) * r + 1.0)
    )
    with np.errstate(divide="ignore", invalid="ignore"):
        ut = np.where(y > 0, 1.0 - u, u)
        s = np.log(-np.log(ut))
        c = _BSM_C
        tail = np.full_like(s, c[8])
        for k in range(7, -1, -1):
            tail = tail * s + c[k]
        tail = np.where(y > 0, tail, -tail)
    return np.where(np.abs(y) < 0.42, central, tail)


def _norm_ppf_sql(u: str) -> tuple[str, str]:
    """The identical BSM polynomial as one SQL expression over ``u``.
    Returns (ppf_expr, s_expr); ppf_expr references a column ``__s``
    the caller must bind to s_expr."""
    a0, a1, a2, a3 = _BSM_A
    b1, b2, b3, b4 = _BSM_B
    y = f"(({u}) - 0.5)"
    r = f"({y} * {y})"
    central = (
        f"({y} * ((({a3!r} * {r} + {a2!r}) * {r} + {a1!r}) * {r} + {a0!r})"
        f" / (((({b4!r} * {r} + {b3!r}) * {r} + {b2!r}) * {r} + {b1!r})"
        f" * {r} + 1.0))"
    )
    ut = f"(CASE WHEN {y} > 0 THEN 1.0 - ({u}) ELSE ({u}) END)"
    s = f"ln(-ln({ut}))"
    c = _BSM_C
    horner = repr(c[8])
    for k in range(7, -1, -1):
        horner = f"({horner} * __s + {c[k]!r})"
    tail = f"(CASE WHEN {y} > 0 THEN ({horner}) ELSE -({horner}) END)"
    return (
        f"(CASE WHEN abs({y}) < 0.42 THEN {central} ELSE {tail} END)",
        s,
    )


def lia_stats_curve(
    x: np.ndarray, e: np.ndarray, fraw: np.ndarray
) -> dict[str, float]:
    """The 47 statistics for one normalized, quantized, time-ordered
    curve (``x`` normalized flux, ``e`` its errors, ``fraw`` raw zp=24
    flux for amplitude). NaN where undefined — the real forest routes
    NaN like SQL routes NULL (false branch at every split)."""
    x = np.asarray(x, dtype=np.float64)
    e = np.asarray(e, dtype=np.float64)
    fraw = np.asarray(fraw, dtype=np.float64)
    n = len(x)
    f = {k: float("nan") for k in LIA_STAT_NAMES}
    if n == 0:
        return f
    mean = float(x.mean())
    med = float(np.median(x))
    vmin, vmax = float(x.min()), float(x.max())
    f["amplitude"] = (float(fraw.max()) - float(fraw.min())) / 2.0
    f["abs_energy"] = float((x * x).sum())
    f["sum_values"] = float(x.sum())
    f["root_mean_squared"] = float(np.sqrt((x * x).mean()))
    f["median_abs_dev"] = float(np.median(np.abs(x - med)))
    f["median_buffer_range"] = float(
        np.mean(np.abs(x - med) < 0.1 * (vmax - vmin) / 2.0)
    )
    f["count_above"] = float((x > mean).sum())
    f["count_below"] = float((x < mean).sum())
    f["check_for_duplicate"] = 1.0 if len(np.unique(x)) < n else 0.0
    f["check_for_max_duplicate"] = 1.0 if (x == vmax).sum() > 1 else 0.0
    f["check_for_min_duplicate"] = 1.0 if (x == vmin).sum() > 1 else 0.0
    imax = np.flatnonzero(x == vmax) + 1  # 1-based
    imin = np.flatnonzero(x == vmin) + 1
    f["first_loc_max"] = float(imax[0] - 1) / n
    f["first_loc_min"] = float(imin[0] - 1) / n
    f["check_max_last_loc"] = float(n - imax[-1]) / n
    f["check_min_last_loc"] = float(n - imin[-1]) / n
    vals, counts = np.unique(x, return_counts=True)
    f["ratio_recurring"] = float((counts > 1).sum()) / len(vals)
    if vmax > vmin:
        r_q = np.round((x - vmin) / (vmax - vmin), 6)
        bins = np.minimum(np.floor(r_q * 10.0), 9.0)
        _, bc = np.unique(bins, return_counts=True)
        p = bc / n
        f["shannon_entropy"] = float(-(p * np.log(p)).sum())
    else:
        f["shannon_entropy"] = 0.0

    if n >= 2:
        s = float(x.std(ddof=1))
        var = s * s
        f["std"] = s
        if mean != 0:
            f["std_over_mean"] = s / mean
        for k, nm in ((1, "above1"), (3, "above3"), (5, "above5")):
            f[nm] = float((x > med + k * s).sum())
        for k, nm in ((1, "below1"), (3, "below3"), (5, "below5")):
            f[nm] = float((x < med - k * s).sum())
        d = np.diff(x)
        f["abs_sum_changes"] = float(np.abs(d).sum())
        f["mean_abs_change"] = float(np.abs(d).mean())
        f["median_distance"] = float(np.median(np.abs(d)))
        f["mean_change"] = float((x[-1] - x[0]) / (n - 1))
        f["complexity"] = float(np.sqrt((d * d).sum()))
        f["integrate"] = float(((x[:-1] + x[1:]) / 2.0).sum())
        if var > 0:
            f["von_neumann"] = float((d * d).sum() / ((n - 1) * var))
            dev = x - mean
            f["auto_corr"] = float(
                (dev[:-1] * dev[1:]).sum() / (dev * dev).sum()
            )
            m2 = float((dev * dev).mean())
            f["skewness"] = float((dev**3).mean() / m2**1.5)
            f["kurtosis"] = float((dev**4).mean() / (m2 * m2) - 3.0)
        above = x > med
        below = x < med
        f["longest_strike_above"] = _longest_run(above)
        f["longest_strike_below"] = _longest_run(below)
        # Stetson family (δ with the sqrt(n/(n−1)) factor)
        delta = np.sqrt(n / (n - 1.0)) * (x - mean) / e
        msq = float((delta * delta).mean())
        if msq > 0:
            f["stetson_k"] = float(np.abs(delta).mean()) / np.sqrt(msq)
        p = delta[:-1] * delta[1:]
        f["stetson_j"] = float((np.sign(p) * np.sqrt(np.abs(p))).sum())
        if msq > 0:
            f["stetson_l"] = f["stetson_j"] * f["stetson_k"] / 0.798
        # Shapiro-Francia W': squared correlation of order statistics
        # with Blom scores Φ⁻¹((i − 0.375)/(n + 0.25))
        xs = np.sort(x)
        blom = norm_ppf_bsm(
            (np.arange(1, n + 1, dtype=np.float64) - 0.375) / (n + 0.25)
        )
        dxs = xs - xs.mean()
        db = blom - blom.mean()
        den = float((dxs * dxs).sum() * (db * db).sum())
        if den > 0:
            num = float((dxs * db).sum())
            f["shapiro_wilk"] = num * num / den
    if n >= 3:
        x0, x1, x2 = x[:-2], x[1:-1], x[2:]
        f["c3"] = float((x0 * x1 * x2).mean())
        f["mean_second_derivative"] = float(
            ((x2 - 2.0 * x1 + x0) / 2.0).mean()
        )
        f["time_rev_asym"] = float((x2 * x2 * x1 - x1 * x0 * x0).mean())
        s = f["std"]  # set for every n >= 2
        hi, lo = mean + 2.0 * s, mean - 2.0 * s
        f["con"] = float(((x0 > hi) & (x1 > hi) & (x2 > hi)).sum())
        f["con2"] = float(((x0 < lo) & (x1 < lo) & (x2 < lo)).sum())
        peaks = (x1 > x0) & (x1 > x2) & (x1 > med + s)
        f["peak_detection"] = float(peaks.sum())
    return f


def _longest_run(mask: np.ndarray) -> float:
    """Longest run of True, vectorized (run edges via diff of the
    padded mask — a python per-point loop was the kernel's hot spot on
    long replicated curves)."""
    if not mask.any():
        return 0.0
    m = np.concatenate(([False], mask, [False]))
    d = np.diff(m.astype(np.int8))
    starts = np.flatnonzero(d == 1)
    ends = np.flatnonzero(d == -1)
    return float((ends - starts).max())


def lia_features_per_group(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    mag_col: str,
    err_col: str,
    min_points: int = 10,
) -> DataFrame:
    """Per-group 47-statistic extraction: ONE shuffle (groupBy + sorted
    collect_list) then a scalar Arrow kernel over the array columns —
    the band_features_per_group execution shape. Output: keys, n,
    f0..f46 (raw doubles; callers round with F.round)."""
    grouped = (
        df.groupBy(*keys)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col(ts_col).alias("__t"),
                        F.col(mag_col).alias("__v"),
                        F.col(err_col).alias("__e"),
                    )
                )
            ).alias("__lc")
        )
        .filter(F.size("__lc") >= min_points)
    )
    arrays = grouped.select(
        *keys,
        F.col("__lc.__v").alias("__cv"),
        F.col("__lc.__e").alias("__ce"),
    )
    out_type = "n long, " + ", ".join(f"f{j} double" for j in range(47))

    @F.pandas_udf(f"struct<{out_type}>")
    def feats(cv: pd.Series, ce: pd.Series) -> pd.DataFrame:
        rows = []
        for i in range(len(cv)):
            m = np.asarray(cv.iloc[i], dtype=np.float64)
            e = np.asarray(ce.iloc[i], dtype=np.float64)
            # conversions quantized at 6 (module docstring)
            fraw = np.round(10.0 ** (-0.4 * (m - LIA_ZP)), 6)
            xx = np.round(10.0 ** (-0.4 * (m - m.min())), 6)
            ee = np.round(e * xx * (np.log(10.0) / 2.5), 6)
            st = lia_stats_curve(xx, ee, fraw)
            rows.append((len(m), *[st[k] for k in LIA_STAT_NAMES]))
        return pd.DataFrame(
            rows, columns=["n"] + [f"f{j}" for j in range(47)]
        )

    out = arrays.withColumn("__f", feats("__cv", "__ce"))
    return out.select(*keys, "__f.*")


def lia_stats_sql_ctes(src: str, min_pts: int = 10) -> str:
    """The 47-statistic chain as SQL CTEs over a source relation with
    columns (user_id, event_type, t, m, err). Emits a final CTE
    ``lia_feats`` with (user_id, event_type, n, f0..f46), every
    statistic the same formula as :func:`lia_stats_curve`, raw
    (unrounded). Embeddable inside a caller's WITH block."""
    names = LIA_STAT_NAMES
    ppf_expr, _ = _norm_ppf_sql("uu")

    agg = {
        "above1": "sum(CASE WHEN x > med + 1 * std THEN 1.0 ELSE 0.0 END)",
        "above3": "sum(CASE WHEN x > med + 3 * std THEN 1.0 ELSE 0.0 END)",
        "above5": "sum(CASE WHEN x > med + 5 * std THEN 1.0 ELSE 0.0 END)",
        "below1": "sum(CASE WHEN x < med - 1 * std THEN 1.0 ELSE 0.0 END)",
        "below3": "sum(CASE WHEN x < med - 3 * std THEN 1.0 ELSE 0.0 END)",
        "below5": "sum(CASE WHEN x < med - 5 * std THEN 1.0 ELSE 0.0 END)",
        "abs_energy": "sum(x * x)",
        "abs_sum_changes": "sum(abs(x1 - x)) FILTER (WHERE x1 IS NOT NULL)",
        "amplitude": "(any_value(fmax) - any_value(fmin)) / 2.0",
        "auto_corr": (
            "CASE WHEN any_value(var) > 0 THEN"
            " sum((x - mean) * (x1 - mean)) FILTER (WHERE x1 IS NOT NULL)"
            " / sum((x - mean) * (x - mean)) END"
        ),
        "c3": (
            "CASE WHEN any_value(n) >= 3 THEN"
            " avg(x * x1 * x2) FILTER (WHERE x2 IS NOT NULL) END"
        ),
        "check_for_duplicate": (
            "CASE WHEN count(DISTINCT x) < any_value(n) THEN 1.0 ELSE 0.0 END"
        ),
        "check_for_max_duplicate": (
            "CASE WHEN sum(CASE WHEN x = vmax THEN 1 ELSE 0 END) > 1"
            " THEN 1.0 ELSE 0.0 END"
        ),
        "check_for_min_duplicate": (
            "CASE WHEN sum(CASE WHEN x = vmin THEN 1 ELSE 0 END) > 1"
            " THEN 1.0 ELSE 0.0 END"
        ),
        "check_max_last_loc": (
            "(any_value(n) - max(i) FILTER (WHERE x = vmax))"
            " * 1.0 / any_value(n)"
        ),
        "check_min_last_loc": (
            "(any_value(n) - max(i) FILTER (WHERE x = vmin))"
            " * 1.0 / any_value(n)"
        ),
        "complexity": (
            "sqrt(sum((x1 - x) * (x1 - x)) FILTER (WHERE x1 IS NOT NULL))"
        ),
        "con": (
            "CASE WHEN any_value(n) >= 3 THEN"
            " sum(CASE WHEN x > mean + 2 * std AND x1 > mean + 2 * std"
            " AND x2 > mean + 2 * std THEN 1.0 ELSE 0.0 END)"
            " FILTER (WHERE x2 IS NOT NULL) END"
        ),
        "con2": (
            "CASE WHEN any_value(n) >= 3 THEN"
            " sum(CASE WHEN x < mean - 2 * std AND x1 < mean - 2 * std"
            " AND x2 < mean - 2 * std THEN 1.0 ELSE 0.0 END)"
            " FILTER (WHERE x2 IS NOT NULL) END"
        ),
        "count_above": "sum(CASE WHEN x > mean THEN 1.0 ELSE 0.0 END)",
        "count_below": "sum(CASE WHEN x < mean THEN 1.0 ELSE 0.0 END)",
        "first_loc_max": (
            "(min(i) FILTER (WHERE x = vmax) - 1) * 1.0 / any_value(n)"
        ),
        "first_loc_min": (
            "(min(i) FILTER (WHERE x = vmin) - 1) * 1.0 / any_value(n)"
        ),
        "integrate": "sum((x + x1) / 2.0) FILTER (WHERE x1 IS NOT NULL)",
        "kurtosis": (
            "CASE WHEN any_value(var) > 0 THEN"
            " avg(pow(x - mean, 4))"
            " / (avg(pow(x - mean, 2)) * avg(pow(x - mean, 2))) - 3.0 END"
        ),
        "mean_abs_change": "avg(abs(x1 - x)) FILTER (WHERE x1 IS NOT NULL)",
        "mean_change": (
            "(max(x) FILTER (WHERE i = n) - max(x) FILTER (WHERE i = 1))"
            " / (any_value(n) - 1)"
        ),
        "mean_second_derivative": (
            "avg((x2 - 2.0 * x1 + x) / 2.0) FILTER (WHERE x2 IS NOT NULL)"
        ),
        "median_abs_dev": "median(abs(x - med))",
        "median_buffer_range": (
            "avg(CASE WHEN abs(x - med) < 0.1 * (vmax - vmin) / 2.0"
            " THEN 1.0 ELSE 0.0 END)"
        ),
        "median_distance": (
            "median(abs(x1 - x)) FILTER (WHERE x1 IS NOT NULL)"
        ),
        "peak_detection": (
            "CASE WHEN any_value(n) >= 3 THEN"
            " sum(CASE WHEN x1 > x AND x1 > x2 AND x1 > med + std"
            " THEN 1.0 ELSE 0.0 END) FILTER (WHERE x2 IS NOT NULL) END"
        ),
        "root_mean_squared": "sqrt(avg(x * x))",
        "skewness": (
            "CASE WHEN any_value(var) > 0 THEN"
            " avg(pow(x - mean, 3)) / pow(avg(pow(x - mean, 2)), 1.5) END"
        ),
        "std": "any_value(std)",
        "std_over_mean": (
            "CASE WHEN any_value(mean) != 0"
            " THEN any_value(std) / any_value(mean) END"
        ),
        "stetson_j": (
            "sum(CASE WHEN dl * dl1 > 0 THEN sqrt(dl * dl1)"
            " WHEN dl * dl1 < 0 THEN -sqrt(-(dl * dl1))"
            " ELSE 0.0 END) FILTER (WHERE dl1 IS NOT NULL)"
        ),
        "stetson_k": (
            "CASE WHEN avg(dl * dl) > 0"
            " THEN avg(abs(dl)) / sqrt(avg(dl * dl)) END"
        ),
        "sum_values": "sum(x)",
        "time_rev_asym": (
            "CASE WHEN any_value(n) >= 3 THEN"
            " avg(x2 * x2 * x1 - x1 * x * x)"
            " FILTER (WHERE x2 IS NOT NULL) END"
        ),
        "von_neumann": (
            "CASE WHEN any_value(var) > 0 THEN"
            " sum((x1 - x) * (x1 - x)) FILTER (WHERE x1 IS NOT NULL)"
            " / ((any_value(n) - 1) * any_value(var)) END"
        ),
    }
    derived = {
        "longest_strike_above": "coalesce(r.strike_above, 0) * 1.0",
        "longest_strike_below": "coalesce(r.strike_below, 0) * 1.0",
        "ratio_recurring": "v.rec * 1.0 / v.dist",
        "shannon_entropy": "coalesce(h.ent, 0.0)",
        "shapiro_wilk": "b.sf",
        "stetson_l": (
            "CASE WHEN s.stetson_k IS NOT NULL"
            " THEN s.stetson_j * s.stetson_k / 0.798 END"
        ),
    }
    main_select = ",\n       ".join(
        f"{agg[nm]} AS {nm}" for nm in names if nm in agg
    )
    fcols = ", ".join(
        f"s.{nm} AS {nm}" if nm in agg else f"{derived[nm]} AS {nm}"
        for nm in names
    )
    fnumbered = ", ".join(
        f"__all.{nm} AS f{j}" for j, nm in enumerate(names)
    )

    return f"""lia_base AS (
  SELECT user_id, event_type,
         round(pow(10.0, -0.4 * (m - min(m) OVER g)), 6) AS x,
         round(pow(10.0, -0.4 * (m - {LIA_ZP!r})), 6) AS fraw,
         t, m, err
  FROM {src}
  WINDOW g AS (PARTITION BY user_id, event_type)
),
lia_rows AS (
  SELECT user_id, event_type, x, fraw,
         round(err * x * {repr(float(np.log(10.0) / 2.5))}, 6) AS ex,
         row_number() OVER w AS i,
         lead(x) OVER w AS x1,
         lead(x, 2) OVER w AS x2,
         count(*) OVER (PARTITION BY user_id, event_type) AS n
  FROM lia_base
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY t, m, err)
),
lia_m AS (
  SELECT user_id, event_type, any_value(n) AS n,
         avg(x) AS mean, median(x) AS med,
         stddev_samp(x) AS std, var_samp(x) AS var,
         min(x) AS vmin, max(x) AS vmax,
         min(fraw) AS fmin, max(fraw) AS fmax
  FROM lia_rows GROUP BY user_id, event_type
  HAVING any_value(n) >= {min_pts}
),
lia_d AS (  -- Stetson deltas need the group mean
  SELECT r.*, m.mean, m.med, m.std, m.var, m.vmin, m.vmax,
         m.fmin, m.fmax,
         sqrt(r.n / (r.n - 1.0)) * (r.x - m.mean) / r.ex AS dl,
         lead(sqrt(r.n / (r.n - 1.0)) * (r.x - m.mean) / r.ex)
           OVER (PARTITION BY r.user_id, r.event_type
                 ORDER BY r.i) AS dl1
  FROM lia_rows r JOIN lia_m m USING (user_id, event_type)
),
lia_s AS (
  SELECT user_id, event_type, any_value(n) AS n,
       {main_select}
  FROM lia_d GROUP BY user_id, event_type
),
lia_runs AS (
  SELECT user_id, event_type,
         coalesce(max(CASE WHEN side = 1 THEN cnt END), 0) AS strike_above,
         coalesce(max(CASE WHEN side = -1 THEN cnt END), 0) AS strike_below
  FROM (
    SELECT user_id, event_type, side, count(*) AS cnt
    FROM (
      SELECT d.user_id, d.event_type, d.i,
             CASE WHEN d.x > d.med THEN 1
                  WHEN d.x < d.med THEN -1 ELSE 0 END AS side,
             d.i - row_number() OVER (
               PARTITION BY d.user_id, d.event_type,
                 CASE WHEN d.x > d.med THEN 1
                      WHEN d.x < d.med THEN -1 ELSE 0 END
               ORDER BY d.i) AS grp
      FROM lia_d d
    ) WHERE side != 0
    GROUP BY user_id, event_type, side, grp
  ) GROUP BY user_id, event_type
),
lia_vals AS (
  SELECT user_id, event_type, count(*) AS dist,
         sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS rec
  FROM (
    SELECT user_id, event_type, x, count(*) AS c
    FROM lia_rows GROUP BY user_id, event_type, x
  ) GROUP BY user_id, event_type
),
lia_hist AS (
  SELECT user_id, event_type, -sum(p * ln(p)) AS ent
  FROM (
    SELECT user_id, event_type,
           count(*) * 1.0 / any_value(n) AS p
    FROM (
      SELECT r.user_id, r.event_type, r.n,
             least(floor(round((r.x - m.vmin) / (m.vmax - m.vmin), 6)
                         * 10.0), 9.0) AS bin
      FROM lia_rows r JOIN lia_m m USING (user_id, event_type)
      WHERE m.vmax > m.vmin
    ) GROUP BY user_id, event_type, bin
  ) GROUP BY user_id, event_type
),
lia_blom AS (
  SELECT user_id, event_type,
         CASE WHEN sum((xs - xbar) * (xs - xbar))
                   * sum((bl - blbar) * (bl - blbar)) > 0
              THEN pow(sum((xs - xbar) * (bl - blbar)), 2)
                   / (sum((xs - xbar) * (xs - xbar))
                      * sum((bl - blbar) * (bl - blbar)))
         END AS sf
  FROM (
    SELECT user_id, event_type, xs, bl,
           avg(xs) OVER gg AS xbar, avg(bl) OVER gg AS blbar
    FROM (
      SELECT user_id, event_type, x AS xs,
             {ppf_expr} AS bl
      FROM (
        SELECT user_id, event_type, x, n,
               (row_number() OVER (PARTITION BY user_id, event_type
                                   ORDER BY x) - 0.375)
                 / (n + 0.25) AS uu,
               ln(-ln(CASE WHEN ((row_number()
                 OVER (PARTITION BY user_id, event_type ORDER BY x)
                 - 0.375) / (n + 0.25)) - 0.5 > 0
                 THEN 1.0 - ((row_number()
                   OVER (PARTITION BY user_id, event_type ORDER BY x)
                   - 0.375) / (n + 0.25))
                 ELSE ((row_number()
                   OVER (PARTITION BY user_id, event_type ORDER BY x)
                   - 0.375) / (n + 0.25)) END)) AS __s
        FROM lia_rows
      )
    )
    WINDOW gg AS (PARTITION BY user_id, event_type)
  ) GROUP BY user_id, event_type
),
lia_all AS (
  SELECT s.user_id, s.event_type, s.n, {fcols}
  FROM lia_s s
  LEFT JOIN lia_runs r USING (user_id, event_type)
  JOIN lia_vals v USING (user_id, event_type)
  LEFT JOIN lia_hist h USING (user_id, event_type)
  LEFT JOIN lia_blom b USING (user_id, event_type)
),
lia_feats AS (
  SELECT __all.user_id, __all.event_type, __all.n, {fnumbered}
  FROM lia_all __all
)"""
