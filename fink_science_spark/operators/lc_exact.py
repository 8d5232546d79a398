"""light-curve-package-exact feature extraction (per-curve numpy).

The reference's ad_features module extracts per-band feature vectors
with the public ``light-curve`` Rust package
(ztf/ad_features/processor.py:36-75, feature definitions documented in
arXiv:2012.01419 appendix A and the light-curve-python README), and the
anomaly-detection module consumes 25 of those features in a fixed order
(ztf/anomaly_detection/processor.py:33-58 MODEL_COLUMNS). This module
reimplements those 25 features from the PUBLIC definitions so the REAL
extracted AAD forests can be driven over real ZTF alerts
(tests/test_anomaly_real_alerts.py reproduces the reference's shipped
doctest pin over its datatest sample).

Differences from operators/aggregates.band_features_per_group — the
engine's distributed, oracle-checked extractor:

* sample-bias-corrected skewness G1 and kurtosis G2 (the light-curve
  package's estimators) instead of population moments,
* exact ``math.erf`` normal CDF in Anderson-Darling instead of the
  shared Abramowitz-Stegun polynomial (the engine/oracle pair need a
  POLYNOMIAL both engines can evaluate identically; a parity-to-the-
  reference path needs the exact CDF),
* per-feature minimum-observation gates with NaN fill, mirroring
  ``extractor(..., fill_value=np.nan)`` in the reference.
"""

from __future__ import annotations

import math

import numpy as np

# the anomaly forests' trained feature order
# (ztf/anomaly_detection/processor.py:33-58)
MODEL_COLUMNS = [
    "amplitude",
    "anderson_darling_normal",
    "beyond_1_std",
    "chi2",
    "cusum",
    "kurtosis",
    "linear_fit_slope",
    "linear_fit_slope_sigma",
    "linear_trend_noise",
    "linear_trend_sigma",
    "magnitude_percentage_ratio_20_10",
    "magnitude_percentage_ratio_40_5",
    "maximum_slope",
    "median",
    "median_absolute_deviation",
    "median_buffer_range_percentage_10",
    "skew",
    "stetson_K",
    "percent_amplitude",
    "linear_fit_reduced_chi2",
    "inter_percentile_range_10",
    "linear_trend",
    "standard_deviation",
    "weighted_mean",
    "mean",
]


def _phi(z: float) -> float:
    return 0.5 * (1.0 + math.erf(z / math.sqrt(2.0)))


def extract_model_features(t, m, e) -> dict[str, float]:
    """The 25 MODEL_COLUMNS features for one light curve (time ``t``
    ascending, magnitude ``m``, magnitude error ``e``), NaN where a
    feature's minimum-observation requirement is unmet or the value is
    undefined (zero variance, tied quantiles, ...)."""
    t = np.asarray(t, dtype=np.float64)
    m = np.asarray(m, dtype=np.float64)
    e = np.asarray(e, dtype=np.float64)
    n = len(m)
    f = {k: float("nan") for k in MODEL_COLUMNS}
    if n == 0:
        return f

    mean = float(m.mean())
    vmin, vmax = float(m.min()), float(m.max())
    med = float(np.median(m))
    f["mean"] = mean
    f["median"] = med
    f["amplitude"] = (vmax - vmin) / 2.0
    f["median_absolute_deviation"] = float(np.median(np.abs(m - med)))
    f["percent_amplitude"] = max(vmax - med, med - vmin)
    q05, q10, q20, q40, q60, q80, q90, q95 = np.percentile(
        m, [5, 10, 20, 40, 60, 80, 90, 95]
    )
    f["inter_percentile_range_10"] = float(q90 - q10)
    if q95 != q05:
        f["magnitude_percentage_ratio_40_5"] = float(
            (q60 - q40) / (q95 - q05)
        )
    if q90 != q10:
        f["magnitude_percentage_ratio_20_10"] = float(
            (q80 - q20) / (q90 - q10)
        )
    f["median_buffer_range_percentage_10"] = float(
        np.mean(np.abs(m - med) < 0.1 * (vmax - vmin) / 2.0)
    )
    w = 1.0 / (e * e)
    wmean = float((m * w).sum() / w.sum())
    f["weighted_mean"] = wmean

    if n >= 2:
        s = float(m.std(ddof=1))
        f["standard_deviation"] = s
        if s > 0:
            f["beyond_1_std"] = float(np.mean(np.abs(m - mean) > s))
            S = np.cumsum(m - mean) / (n * s)
            f["cusum"] = float(S.max() - S.min())
        dt = np.diff(t)
        dm = np.diff(m)
        pos = dt > 0
        if pos.any():
            f["maximum_slope"] = float(np.max(np.abs(dm[pos] / dt[pos])))
        f["chi2"] = float(np.sum(((m - wmean) / e) ** 2) / (n - 1))
        delta = (m - wmean) / e  # Stetson's sqrt(n/(n-1)) factor cancels in K
        msq = float(np.mean(delta * delta))
        if msq > 0:
            f["stetson_K"] = float(np.mean(np.abs(delta))) / math.sqrt(msq)
    else:
        s = 0.0

    if n >= 3:
        if s > 0:
            f["skew"] = float(
                n / ((n - 1) * (n - 2)) * np.sum(((m - mean) / s) ** 3)
            )
        tc = t - t.mean()
        st2 = float((tc * tc).sum())
        if st2 > 0:
            b0 = float((tc * m).sum() / st2)
            resid = m - mean - b0 * tc
            sse = float((resid * resid).sum())
            f["linear_trend"] = b0
            f["linear_trend_sigma"] = math.sqrt(sse / ((n - 2) * st2))
            f["linear_trend_noise"] = math.sqrt(sse / (n - 2))
        sw = float(w.sum())
        swt = float((w * tc).sum())
        swv = float((w * m).sum())
        swtt = float((w * tc * tc).sum())
        swtv = float((w * tc * m).sum())
        det = sw * swtt - swt * swt
        if det > 0:
            b = (sw * swtv - swt * swv) / det
            a = (swv - b * swt) / sw
            rw = m - a - b * tc
            f["linear_fit_slope"] = b
            f["linear_fit_slope_sigma"] = math.sqrt(sw / det)
            f["linear_fit_reduced_chi2"] = float(
                (w * rw * rw).sum() / (n - 2)
            )

    if n >= 4 and s > 0:
        d = (m - mean) / s
        f["kurtosis"] = float(
            n * (n + 1) / ((n - 1) * (n - 2) * (n - 3)) * np.sum(d**4)
            - 3.0 * (n - 1) ** 2 / ((n - 2) * (n - 3))
        )
        zs = np.sort(d)
        ph = np.array([_phi(z) for z in zs])
        i = np.arange(1, n + 1, dtype=np.float64)
        with np.errstate(divide="ignore"):
            ssum = float(
                np.sum((2 * i - 1) * np.log(ph) + (2 * (n - i) + 1) * np.log(1 - ph))
            )
        a2 = -n - ssum / n
        f["anderson_darling_normal"] = a2 * (1.0 + 4.0 / n - 25.0 / (n * n))

    return f


def dc_mag_arrays(magpsf, sigmapsf, magnr, sigmagnr, isdiffpos):
    """Vectorized DC-magnitude conversion (difference photometry +
    reference source), the fink-utils ``vect_dc_mag`` contract the
    reference applies before feature extraction when any point has a
    source behind (ztf/ad_features/processor.py:173-184). Returns
    (dc_mag, dc_sigmag) with NaN where the combined flux is
    non-positive."""
    magpsf = np.asarray(magpsf, dtype=np.float64)
    sigmapsf = np.asarray(sigmapsf, dtype=np.float64)
    magnr = np.asarray(magnr, dtype=np.float64)
    sigmagnr = np.asarray(sigmagnr, dtype=np.float64)
    sign = np.where(
        np.isin(np.asarray(isdiffpos, dtype=object), ("t", "1", 1, True)),
        1.0,
        -1.0,
    )
    ln10_over_2p5 = math.log(10.0) / 2.5
    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        diff = 10.0 ** (-0.4 * magpsf)
        dsig = np.abs(diff * sigmapsf * ln10_over_2p5)
        ref = 10.0 ** (-0.4 * magnr)
        rsig = np.abs(ref * sigmagnr * ln10_over_2p5)
        dc_flux = ref + sign * diff
        dc_sigflux = np.sqrt(dsig * dsig + rsig * rsig)
        dc_mag = np.where(dc_flux > 0, -2.5 * np.log10(dc_flux), np.nan)
        dc_sigmag = np.where(
            dc_flux > 0, dc_sigflux / dc_flux / ln10_over_2p5, np.nan
        )
    return dc_mag, dc_sigmag


def is_source_behind(distnr) -> np.ndarray:
    """True where a catalog source sits under the transient (the public
    fink-utils gate: positive nearest-reference distance below 1.4)."""
    d = np.asarray(distnr, dtype=np.float64)
    return (d > 0) & (d < 1.4)
