"""Aggregation operators: per-group order statistics, weighted quantiles,
trailing time windows, and light-curve materialization.

These reproduce the reference's aggregation surface (per-object/per-filter
min/max/mean/std/skew/kurtosis, ztf/ssoft/processor.py:643-668; weighted
empirical-CDF quantile, ztf/blazar_extreme_state/utils.py:392-424; trailing
fluence window, utils.py:122-146; collect-to-arrays SSOFT input, §1.5 of
SURVEY.md) as native Spark aggregations and window frames — partial
(map-side) aggregation and whole-stage codegen for free, no Python.

Skew/kurtosis note: Spark's builtin ``skewness``/``kurtosis`` use one set
of bias conventions, other engines use another; for oracle-portable
results :func:`order_stats` derives central moments from raw moments
(E[x], E[x²], E[x³], E[x⁴]) computed in a SINGLE scan — one shuffle, no
self-join — with the identical closed-form algebra spelled out in the
oracle SQL. The raw→central conversion loses digits only under extreme
cancellation (|mean| ≫ std); outputs are rounded at 4 decimals and the
differential oracle would surface any such case.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def order_stats(
    df: DataFrame,
    keys: list[str],
    val: str,
    percentiles: tuple[float, ...] = (0.5,),
    round_to: int = 4,
) -> DataFrame:
    """Per-group count / mean / stddev (sample) / min / max / exact
    interpolated percentiles / skewness / excess kurtosis.

    SINGLE scan, one shuffle: raw moments E[x]..E[x⁴] as plain avg()
    aggregates (map-side partial aggregation + whole-stage codegen),
    then the closed-form central-moment algebra
    m2 = E2−μ², m3 = E3−3μE2+2μ³, m4 = E4−4μE3+6μ²E2−3μ⁴
    in the projection. The duckdb oracle spells out the identical
    formula, so both engines agree at the 4-decimal rounding."""
    # cast BEFORE the powers: an integer-typed value column would
    # multiply in int64 and v⁴ overflows long for |v| ≳ 55k (ANSI error)
    v = F.col(val).cast("double")
    aggs = [
        F.count("*").alias("n"),
        F.avg(val).alias("__e1"),
        F.avg(v * v).alias("__e2"),
        F.avg(v * v * v).alias("__e3"),
        F.avg(v * v * v * v).alias("__e4"),
        F.round(F.stddev_samp(val), round_to).alias("std"),
        F.round(F.min(val), round_to).alias("vmin"),
        F.round(F.max(val), round_to).alias("vmax"),
    ]
    for p in percentiles:
        aggs.append(
            F.round(F.percentile(val, F.lit(p)), round_to).alias(
                f"p{int(p * 100):02d}"
            )
        )
    out = df.groupBy(*keys).agg(*aggs)
    u, e2, e3, e4 = (F.col(c) for c in ("__e1", "__e2", "__e3", "__e4"))
    m2 = e2 - u * u
    m3 = e3 - 3.0 * u * e2 + 2.0 * u * u * u
    m4 = e4 - 4.0 * u * e3 + 6.0 * u * u * e2 - 3.0 * u * u * u * u
    return out.select(
        *keys,
        "n",
        F.round(u, round_to).alias("mean"),
        "std",
        "vmin",
        "vmax",
        *[f"p{int(p * 100):02d}" for p in percentiles],
        # m2 > 0 guard: a single-row or constant group has zero variance,
        # where skew/kurt are undefined — NULL, not ANSI DIVIDE_BY_ZERO
        # (surfaced by the degenerate-input fuzz; the oracle twin carries
        # the identical CASE so both engines agree on such groups)
        F.round(
            F.when(m2 > 0, m3 / F.pow(m2, 1.5)), round_to
        ).alias("skew"),
        F.round(
            F.when(m2 > 0, m4 / F.pow(m2, 2.0) - 3.0), round_to
        ).alias("kurt"),
    )


def weighted_quantile(
    df: DataFrame,
    keys: list[str],
    val: str,
    weight: str,
    q: float = 0.5,
    round_to: int = 4,
) -> DataFrame:
    """Weighted empirical-CDF quantile per group: the smallest value whose
    cumulative weight fraction reaches q (ties on value broken
    deterministically by accumulating in (value) order).

    Window cumsum + arg-min — the distributed form of the reference's
    ``cumsum(weights)/sum`` + interp kernel; exact step-CDF semantics
    (no interpolation) so any engine agrees."""
    w_cum = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__v").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy(*keys)
    with_cdf = df.select(
        *keys,
        F.col(val).cast("double").alias("__v"),
        F.col(weight).cast("double").alias("__w"),
    ).select(
        *keys,
        "__v",
        # zero-total-weight guard: a group whose weights sum to 0 has no
        # defined quantile — its cdf stays NULL, every row fails the >= q
        # filter, and the group is omitted from the output (previously an
        # ANSI DIVIDE_BY_ZERO; surfaced by the degenerate-input fuzz)
        F.when(
            F.sum("__w").over(w_tot) > 0,
            F.sum("__w").over(w_cum) / F.sum("__w").over(w_tot),
        ).alias("__cdf"),
    )
    return (
        with_cdf.filter(F.col("__cdf") >= q)
        .groupBy(*keys)
        .agg(F.round(F.min("__v"), round_to).alias(f"wq{int(q * 100):02d}"))
    )


def fit_features_per_group(
    df: DataFrame,
    key: str,
    ts_col: str,
    val_col: str,
    min_points: int = 2,
) -> DataFrame:
    """Per-group light-curve feature fit via ``applyInPandas`` — the
    ad_features/random_forest_snia shape (reference: per-SNID feature fit
    loop, ztf/random_forest_snia/processor.py:188-199; per-band feature
    extraction, ztf/ad_features/processor.py:78-237): group the flat event
    stream by key, hand each group's (t, v) series to a vectorized numpy
    kernel, return one feature row per group.

    Kernel here is the closed-form least-squares slope + mean + amplitude
    (covar/var around the centered time axis — mathematically identical to
    SQL ``regr_slope``, so the oracle can verify the Arrow path end-to-end).
    Groups with fewer than ``min_points`` rows (or zero time variance) are
    dropped, mirroring the reference's nmin cuts (ztf/ssoft/processor.py:784).

    Execution shape (round 2): ONE shuffle (groupBy + collect_list into
    per-group arrays), then a SCALAR Arrow kernel over the array columns —
    NOT group-at-a-time applyInPandas, whose ~3 ms/group of Python
    dispatch + DataFrame-construction overhead dominates at thousands of
    groups. The scalar UDF sees thousands of curves per Arrow batch. At
    100 TB the key cardinality (#objects) spreads uniformly and no group
    outgrows a task (histories are bounded per object).
    """
    import pandas as pd

    grouped = (
        df.groupBy(key)
        .agg(
            F.collect_list(F.col(ts_col)).alias("__t"),
            F.collect_list(F.col(val_col)).alias("__v"),
        )
        .filter(F.size("__t") >= min_points)
    )

    @F.pandas_udf("struct<n long, mean double, amp double, slope double>")
    def fit(ct: pd.Series, cv: pd.Series) -> pd.DataFrame:
        import numpy as np

        rows = []
        for i in range(len(ct)):
            t = np.asarray(ct.iloc[i], dtype=np.float64)
            v = np.asarray(cv.iloc[i], dtype=np.float64)
            tc = t - t.mean()
            denom = float((tc * tc).sum())
            if denom <= 0.0:
                rows.append((len(v), None, None, None))
                continue
            # NB: no rounding here — Python round() is banker's
            # (half-to-even) while SQL ROUND is half-away-from-zero;
            # callers round with F.round so ties agree with any engine.
            rows.append(
                (
                    len(v),
                    float(v.mean()),
                    float(v.max() - v.min()),
                    float((tc * v).sum() / denom),
                )
            )
        return pd.DataFrame(rows, columns=["n", "mean", "amp", "slope"])

    return (
        grouped.select(key, fit("__t", "__v").alias("__f"))
        .select(key, "__f.*")
        .filter(F.col("slope").isNotNull())
    )


BAND_FEATURE_COLS = [
    "n", "mean", "weighted_mean", "std", "median", "amplitude",
    "beyond_1_std", "mad", "skew", "kurt", "max_slope",
    # round-2 extension toward the full ad_features set
    "cusum", "ipr10", "eta", "linear_trend", "linear_trend_sigma",
    "linear_fit_slope", "linear_fit_chi2", "mpr_40_05", "mpr_20_10",
    "median_buffer_pct", "percent_amplitude", "mean_variance",
    "reduced_chi2", "stetson_k", "anderson_darling_normal",
    # the two remaining LinearFit/LinearTrend outputs the reference's
    # anomaly forests consume (ztf/anomaly_detection/processor.py:33-58
    # MODEL_COLUMNS): sigma of the weighted-fit slope (1/sqrt(Stt), Press
    # et al. 15.2) and the unweighted-trend residual noise sqrt(SSE/(n-2))
    "linear_fit_slope_sigma", "linear_trend_noise",
]


def _phi_normal(z):
    """Standard-normal CDF via the Abramowitz–Stegun 7.1.26 erf
    approximation — NOT math.erf, deliberately: the SQL oracle evaluates
    the identical polynomial, so the two engines agree to float ulp
    instead of to the (engine-specific) erf approximation error."""
    import numpy as np

    x = z / np.sqrt(2.0)
    ax = np.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = (
        (((1.061405429 * t - 1.453152027) * t + 1.421413741) * t - 0.284496736)
        * t
        + 0.254829592
    ) * t
    erf = np.where(x < 0, -1.0, 1.0) * (1.0 - poly * np.exp(-ax * ax))
    return 0.5 * (1.0 + erf)


def band_features_per_group(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    val_col: str,
    err_col: str | None = None,
    min_points: int = 3,
) -> DataFrame:
    """Per-(object, band) light-curve feature extraction — the ad_features
    shape (reference: 26 features per band via the light-curve package,
    ztf/ad_features/processor.py:36-75 lists the extractor), as ONE Arrow
    kernel per group computing the full 26-feature set, each feature with
    an exact SQL twin (Anderson–Darling included: both engines evaluate
    the same A-S erf polynomial, see :func:`_phi_normal`):

    n, mean, weighted_mean (1/err² weights), std (sample), median,
    amplitude ((max−min)/2), beyond_1_std (fraction with |x−mean| > std),
    mad (median absolute deviation), skew & excess kurtosis (population
    moments), max_slope (max |Δv/Δt|), cusum range
    ((max−min) of cumsum(v−mean)/(n·std) in time order),
    ipr10 (Q90−Q10, linear interpolation), eta (von Neumann:
    Σ(Δv)²/((n−1)·var)), linear_trend (unweighted LSQ slope of v vs t)
    and its sigma (sqrt(SSE/((n−2)·Σtc²))), linear_fit_slope /
    linear_fit_chi2 (1/err²-weighted LSQ slope + reduced χ² around the
    fitted line), magnitude-percentage ratios mpr_40_05 =
    (Q60−Q40)/(Q95−Q05) and mpr_20_10 = (Q80−Q20)/(Q90−Q10),
    median_buffer_pct (fraction within ±10 % of amplitude around the
    median), percent_amplitude (max(max−med, med−min)), mean_variance
    (std/mean), reduced_chi2 (Σ((v−wmean)/err)²/(n−1)), stetson_k
    (mean|δ|/sqrt(mean δ²), δ=(v−wmean)/err), anderson_darling_normal
    (A*² with the (1 + 4/n − 25/n²) small-sample correction).

    The regression features center t on the group mean before forming the
    normal equations — in BOTH engines — so the sufficient statistics
    carry no |t|²-scale cancellation and the differential comparison
    stays exact at 6 decimals.

    err-based features are NULL when err_col is None. All outputs raw
    doubles — callers round with F.round (SQL semantics).

    Execution shape: ONE shuffle (groupBy + sorted collect_list into the
    per-band light-curve arrays — the SSOFT aggregated layout, SURVEY
    §1.5), then a SCALAR pandas UDF over the array columns. Unlike
    group-at-a-time applyInPandas (one Python call + one DataFrame per
    group — ~3 ms/group of pure overhead at thousands of groups), the
    scalar UDF receives thousands of light curves per Arrow batch and
    loops over plain numpy arrays."""
    import pandas as pd

    has_err = err_col is not None
    struct_fields = [
        F.col(ts_col).alias("__t"),
        F.col(val_col).alias("__v"),
    ] + ([F.col(err_col).alias("__e")] if has_err else [])
    grouped = (
        df.groupBy(*keys)
        .agg(F.array_sort(F.collect_list(F.struct(*struct_fields))).alias("__lc"))
        .filter(F.size("__lc") >= min_points)
    )
    arrays = grouped.select(
        *keys,
        F.col("__lc.__t").alias("__ct"),
        F.col("__lc.__v").alias("__cv"),
        *([F.col("__lc.__e").alias("__ce")] if has_err else []),
    )

    out_type = "n long, " + ", ".join(
        f"{c} double" for c in BAND_FEATURE_COLS[1:]
    )

    def _compute(ct: pd.Series, cv: pd.Series, ce: pd.Series | None) -> pd.DataFrame:
        import numpy as np

        # LENGTH-CLASS BATCHING: curves are bucketed by point count and
        # each class is processed as one dense (g, n) matrix with axis-1
        # reductions. numpy's row-wise reduction uses the same pairwise
        # summation as the 1-D per-curve ops, so results are BIT-IDENTICAL
        # to a python loop over curves — but the per-group python/numpy
        # dispatch overhead (~0.5 ms/curve × tens of calls) collapses to
        # ~n_distinct_lengths vectorized passes per Arrow batch.
        N = len(ct)
        out: list[tuple | None] = [None] * N
        by_len: dict[int, list[int]] = {}
        for i in range(N):
            by_len.setdefault(len(ct.iloc[i]), []).append(i)

        def opt(vals, mask):
            """Per-row value-or-None emission helper."""
            return [float(x) if m else None for x, m in zip(vals, mask)]

        for n, idxs in by_len.items():
            g = len(idxs)
            T = np.empty((g, n), dtype=np.float64)
            V = np.empty((g, n), dtype=np.float64)
            E = np.empty((g, n), dtype=np.float64) if ce is not None else None
            for r, i in enumerate(idxs):
                T[r] = ct.iloc[i]
                V[r] = cv.iloc[i]
                if E is not None:
                    E[r] = ce.iloc[i]

            with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
                mean = V.mean(axis=1)
                std = V.std(axis=1, ddof=1)
                var = std * std
                vmin, vmax = V.min(axis=1), V.max(axis=1)
                med = np.median(V, axis=1)
                d = V - mean[:, None]
                m2 = (d * d).mean(axis=1)
                m3 = (d * d * d).mean(axis=1)
                m4 = (d * d * d * d).mean(axis=1)
                dt = np.diff(T, axis=1)
                dv = np.diff(V, axis=1)
                valid = dt > 0
                any_valid = valid.any(axis=1)
                sl = np.where(valid, np.abs(dv / dt), -np.inf)
                max_slope = sl.max(axis=1)
                s = np.cumsum(V, axis=1) - np.arange(
                    1, n + 1, dtype=np.float64
                )[None, :] * mean[:, None]
                cusum = (s.max(axis=1) - s.min(axis=1)) / (n * std)
                q05, q10, q20, q40, q60, q80, q90, q95 = np.percentile(
                    V, [5, 10, 20, 40, 60, 80, 90, 95], axis=1
                )
                eta = (dv * dv).sum(axis=1) / ((n - 1) * var)
                # unweighted LSQ on centered time
                tc = T - T.mean(axis=1)[:, None]
                st2 = (tc * tc).sum(axis=1)
                has_fit0 = st2 > 0
                b0 = (tc * V).sum(axis=1) / st2
                r0 = V - mean[:, None] - b0[:, None] * tc
                sse = (r0 * r0).sum(axis=1)
                trend_sigma = (
                    np.sqrt(sse / ((n - 2) * st2)) if n > 2 else np.full(g, np.nan)
                )
                trend_noise = (
                    np.sqrt(sse / (n - 2)) if n > 2 else np.full(g, np.nan)
                )
                amp_half = (vmax - vmin) / 2.0
                mbp = (
                    np.abs(V - med[:, None]) < 0.1 * amp_half[:, None]
                ).mean(axis=1)
                pamp = np.maximum(vmax - med, med - vmin)
                mean_var = std / mean
                mpr_40_05 = (q60 - q40) / (q95 - q05)
                mpr_20_10 = (q80 - q20) / (q90 - q10)
                beyond = (np.abs(d) > std[:, None]).mean(axis=1)
                mad = np.median(np.abs(V - med[:, None]), axis=1)
                skew = m3 / m2**1.5
                kurt = m4 / m2**2 - 3.0
                # Anderson–Darling normality A*² (std ddof=1, small-sample
                # correction (1 + 4/n − 25/n²) like the light-curve
                # package). Single-pass sorted form: each z_i contributes
                # (2i−1)·lnΦ(z_i) + (2(n−i)+1)·ln(1−Φ(z_i)); invariant to
                # tie ordering since tied z have equal Φ.
                zs = np.sort(d / std[:, None], axis=1)
                ph = _phi_normal(zs)
                ii = np.arange(1, n + 1, dtype=np.float64)[None, :]
                ssum = (
                    (2.0 * ii - 1.0) * np.log(ph)
                    + (2.0 * (n - ii) + 1.0) * np.log(1.0 - ph)
                ).sum(axis=1)
                ad = (-n - ssum / n) * (1.0 + 4.0 / n - 25.0 / (n * n))

                if E is not None:
                    w = 1.0 / (E * E)
                    sw = w.sum(axis=1)
                    wmean = (V * w).sum(axis=1) / sw
                    delta = (V - wmean[:, None]) / E
                    d2 = delta * delta
                    red_chi2 = d2.sum(axis=1) / (n - 1)
                    msq = d2.mean(axis=1)
                    stetson_k = np.abs(delta).mean(axis=1) / np.sqrt(msq)
                    # weighted LSQ on centered time
                    swt = (w * tc).sum(axis=1)
                    swv = (w * V).sum(axis=1)
                    swtt = (w * tc * tc).sum(axis=1)
                    swtv = (w * tc * V).sum(axis=1)
                    det = sw * swtt - swt * swt
                    has_fit = det > 0
                    b = (sw * swtv - swt * swv) / det
                    a = (swv - b * swt) / sw
                    rw = V - a[:, None] - b[:, None] * tc
                    fit_chi2 = (
                        (w * rw * rw).sum(axis=1) / (n - 2)
                        if n > 2
                        else np.full(g, np.nan)
                    )
                    # Var(slope) = S/Δ (Numerical Recipes 15.2.9): with
                    # centered time, Stt = det/sw, so sigma = sqrt(sw/det)
                    fit_slope_sigma = np.sqrt(sw / det)

            m2_pos, std_pos = m2 > 0, std > 0
            col_mean = opt(mean, np.ones(g, dtype=bool))
            col_wmean = opt(wmean, np.ones(g, dtype=bool)) if E is not None else col_mean
            cols = [
                [n] * g,
                col_mean,
                col_wmean,
                opt(std, np.ones(g, dtype=bool)),
                opt(med, np.ones(g, dtype=bool)),
                opt(amp_half, np.ones(g, dtype=bool)),
                opt(beyond, np.ones(g, dtype=bool)),
                opt(mad, np.ones(g, dtype=bool)),
                opt(skew, m2_pos),
                opt(kurt, m2_pos),
                opt(max_slope, any_valid),
                opt(cusum, std_pos),
                opt(q90 - q10, np.ones(g, dtype=bool)),
                opt(eta, var > 0),
                opt(b0, has_fit0),
                opt(trend_sigma, has_fit0 & (n > 2)),
                opt(b, has_fit) if E is not None else [None] * g,
                opt(fit_chi2, has_fit & (n > 2)) if E is not None else [None] * g,
                opt(mpr_40_05, (q95 - q05) != 0),
                opt(mpr_20_10, (q90 - q10) != 0),
                opt(mbp, np.ones(g, dtype=bool)),
                opt(pamp, np.ones(g, dtype=bool)),
                opt(mean_var, mean != 0),
                opt(red_chi2, np.ones(g, dtype=bool)) if E is not None else [None] * g,
                opt(stetson_k, msq > 0) if E is not None else [None] * g,
                opt(ad, std_pos),
                opt(fit_slope_sigma, has_fit) if E is not None else [None] * g,
                opt(trend_noise, has_fit0 & (n > 2)),
            ]
            for r, i in enumerate(idxs):
                out[i] = tuple(c[r] for c in cols)
        return pd.DataFrame(out, columns=BAND_FEATURE_COLS)

    if has_err:

        @F.pandas_udf(f"struct<{out_type}>")
        def feats(ct: pd.Series, cv: pd.Series, ce: pd.Series) -> pd.DataFrame:
            return _compute(ct, cv, ce)

        out = arrays.withColumn("__f", feats("__ct", "__cv", "__ce"))
    else:

        @F.pandas_udf(f"struct<{out_type}>")
        def feats(ct: pd.Series, cv: pd.Series) -> pd.DataFrame:
            return _compute(ct, cv, None)

        out = arrays.withColumn("__f", feats("__ct", "__cv"))
    return out.select(*keys, "__f.*")


def trailing_window_mean(
    df: DataFrame,
    keys: list[str],
    ts: str,
    val: str,
    window_seconds: int,
    round_to: int = 4,
    quantize: int | None = None,
) -> DataFrame:
    """Per-row trailing mean of ``val`` over the last ``window_seconds``
    (inclusive) within each key group, ordered by event time — the
    trailing-fluence pattern. Uses a RANGE frame on epoch seconds: one
    shuffle on the keys, then a streaming frame scan per partition.

    ``quantize``: when ``val`` has exactly that many decimals, the mean
    is computed as an EXACT integer window sum divided by the count —
    bit-identical across engines regardless of frame summation order.
    Without it, a float avg whose value lands on a round() HALF-UP
    boundary can flip the last rounded digit between engines (surfaced
    at sf0.1: 56.5687 vs 56.5688)."""
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__epoch"))
        .rangeBetween(-window_seconds, 0)
    )
    out = df.withColumn("__epoch", F.col(ts).cast("long"))
    if quantize is not None:
        scale = float(10 ** quantize)
        q = F.round(F.col(val) * scale).cast("long")
        mean = (
            F.sum(q).over(w).cast("double")
            / F.count(q).over(w)
            / F.lit(scale)
        )
    else:
        mean = F.avg(val).over(w)
    return out.withColumn("trail_mean", F.round(mean, round_to)).drop(
        "__epoch"
    )
