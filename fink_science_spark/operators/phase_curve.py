"""SSOFT phase-curve fitting: the HG magnitude model per (object, band).

The reference's biggest batch pipeline fits H, G (and HG1G2 / SHG1G2
extensions) per solar-system object from aggregated light curves
(ztf/ssoft/processor.py:436-671 `extract_ssoft_parameters` →
`estimate_sso_params`; the yearly table build is
ztf/ssoft/processor.py:684-800). The Bowell HG model

    m(α) = H − 2.5·log10((1−G)·Φ1(α) + G·Φ2(α)),
    Φi(α) = exp(−Ai·tan(α/2)^Bi),  A=(3.33, 1.87), B=(0.63, 1.22)

is nonlinear in (H, G) but *linear in flux space*: with y = 10^(−0.4·m),

    y = a1·Φ1(α) + a2·Φ2(α),   a1 = (1−G)·10^(−0.4H), a2 = G·10^(−0.4H)

so the fit is closed-form 2-parameter no-intercept least squares via the
normal equations — no scipy, and exactly reproducible in SQL (the
differential oracle computes the same five sufficient statistics
Σx1², Σx1x2, Σx2², Σx1y, Σx2y with plain SUM/exp/tan/pow).

Execution shape (the scale path): ONE shuffle — groupBy(keys) +
collect_list into per-object arrays (the aggregated-SSOFT layout the
reference builds first, ztf/ssoft/processor.py:684-714) — then a SCALAR
Arrow kernel that loops plain numpy arrays, thousands of light curves per
batch. Object count spreads uniformly across partitions at 100 TB;
per-object histories are bounded, so no group outgrows a task.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Bowell HG phase-function constants (public IAU two-parameter system).
PHI_A = (3.33, 1.87)
PHI_B = (0.63, 1.22)


def hg_phase_terms(alpha_rad):
    """Φ1, Φ2 for phase angles in radians (numpy in, numpy out)."""
    import numpy as np

    t = np.tan(alpha_rad / 2.0)
    return (
        np.exp(-PHI_A[0] * np.power(t, PHI_B[0])),
        np.exp(-PHI_A[1] * np.power(t, PHI_B[1])),
    )


def hg_fit_arrays(alpha_rad, mag):
    """Closed-form HG fit for one light curve. Returns (H, G, n) with
    H, G None when the system is degenerate (singular normal matrix or
    non-positive total flux scale)."""
    import numpy as np

    x1, x2 = hg_phase_terms(np.asarray(alpha_rad, dtype=np.float64))
    y = np.power(10.0, -0.4 * np.asarray(mag, dtype=np.float64))
    s11 = float(np.sum(x1 * x1))
    s12 = float(np.sum(x1 * x2))
    s22 = float(np.sum(x2 * x2))
    s1y = float(np.sum(x1 * y))
    s2y = float(np.sum(x2 * y))
    det = s11 * s22 - s12 * s12
    if det <= 0.0:
        return None, None, len(y)
    a1 = (s22 * s1y - s12 * s2y) / det
    a2 = (s11 * s2y - s12 * s1y) / det
    flux0 = a1 + a2
    if flux0 <= 0.0:
        return None, None, len(y)
    h = -2.5 * math.log10(flux0)
    g = a2 / flux0
    return h, g, len(y)


def hg_fit_per_group(
    df: DataFrame,
    keys: list[str],
    phase_col: str,
    mag_col: str,
    min_points: int = 5,
) -> DataFrame:
    """Per-group HG fit: one row per key tuple with (n, H, G).

    ``phase_col`` is the solar phase angle in RADIANS, ``mag_col`` the
    reduced magnitude (distance-corrected, as the reference computes it at
    ztf/ssoft/processor.py:520-524). Groups with fewer than ``min_points``
    observations are dropped (the reference's nmin cut,
    ztf/ssoft/processor.py:784)."""
    grouped = (
        df.groupBy(*keys)
        .agg(
            F.collect_list(F.col(phase_col)).alias("__alpha"),
            F.collect_list(F.col(mag_col)).alias("__mag"),
        )
        .filter(F.size("__alpha") >= min_points)
    )

    @F.pandas_udf("struct<n long, h double, g double>")
    def fit(alpha: pd.Series, mag: pd.Series) -> pd.DataFrame:
        rows = []
        for i in range(len(alpha)):
            h, g, n = hg_fit_arrays(alpha.iloc[i], mag.iloc[i])
            rows.append((n, h, g))
        return pd.DataFrame(rows, columns=["n", "h", "g"])

    return grouped.select(
        *keys, fit("__alpha", "__mag").alias("__f")
    ).select(*keys, "__f.*")


def hg_phase_terms_sql(alpha_expr: str) -> tuple[str, str]:
    """Φ1, Φ2 as SQL expressions over a phase-angle-in-radians expr."""
    return (
        f"exp(-{PHI_A[0]!r} * pow(tan(({alpha_expr}) / 2.0), {PHI_B[0]!r}))",
        f"exp(-{PHI_A[1]!r} * pow(tan(({alpha_expr}) / 2.0), {PHI_B[1]!r}))",
    )


# --------------------------------------------------------------------------
# HG1G2: the three-parameter Muinonen et al. (2010) system
# --------------------------------------------------------------------------
#
# m(α) = H − 2.5·log10(G1·Φ1(α) + G2·Φ2(α) + (1−G1−G2)·Φ3(α)), which in
# flux space y = 10^(−0.4 m) is a THREE-parameter no-intercept linear fit
#
#     y = a1·Φ1 + a2·Φ2 + a3·Φ3,
#     H = −2.5·log10(a1+a2+a3), G1 = a1/Σa, G2 = a2/Σa
#
# (the linearization the reference fits with sbpy/scipy at
# ztf/ssoft/processor.py:436-671; here it is closed-form 3×3 normal
# equations via Cramer's rule — the SAME expression tree in numpy and in
# the SQL oracle so both engines agree to rounding).
#
# Basis: the published linear segments for Φ1, Φ2 (slopes 6/π and 9/5π,
# clipped at zero) and a closed-form approximation of the Φ3 opposition
# spline, exp(−4π·tan^{2/3}(α/2)) — smooth, 1 at α=0, ~0 past 30°.

_PHI1_SLOPE = 6.0 / math.pi
_PHI2_SLOPE = 9.0 / (5.0 * math.pi)
_PHI3_SCALE = 4.0 * math.pi


def hg1g2_basis(alpha_rad):
    """Φ1, Φ2, Φ3 for phase angles in radians (numpy in, numpy out)."""
    import numpy as np

    a = np.asarray(alpha_rad, dtype=np.float64)
    phi1 = np.maximum(0.0, 1.0 - _PHI1_SLOPE * a)
    phi2 = np.maximum(0.0, 1.0 - _PHI2_SLOPE * a)
    phi3 = np.exp(-_PHI3_SCALE * np.power(np.tan(a / 2.0), 2.0 / 3.0))
    return phi1, phi2, phi3


def hg1g2_basis_sql(alpha_expr: str) -> tuple[str, str, str]:
    """The same basis as SQL expressions (radians in)."""
    return (
        f"greatest(0.0, 1.0 - {_PHI1_SLOPE!r} * ({alpha_expr}))",
        f"greatest(0.0, 1.0 - {_PHI2_SLOPE!r} * ({alpha_expr}))",
        # NB: literal 2.0/3.0 would be DECIMAL division in Spark SQL
        # (→ 0.666667) but double in DuckDB — spell out the double
        f"exp(-{_PHI3_SCALE!r} * pow(tan(({alpha_expr}) / 2.0), {2.0 / 3.0!r}))",
    )


def hg1g2_fit_arrays(alpha_rad, mag):
    """Closed-form HG1G2 fit for one light curve: (H, G1, G2, n), with the
    parameters None when the 3×3 system is degenerate or total flux ≤ 0.
    Cramer's rule is spelled out term-by-term to mirror the SQL oracle's
    expression tree exactly."""
    import numpy as np

    x1, x2, x3 = hg1g2_basis(np.asarray(alpha_rad, dtype=np.float64))
    y = np.power(10.0, -0.4 * np.asarray(mag, dtype=np.float64))
    s11 = float(np.sum(x1 * x1))
    s12 = float(np.sum(x1 * x2))
    s13 = float(np.sum(x1 * x3))
    s22 = float(np.sum(x2 * x2))
    s23 = float(np.sum(x2 * x3))
    s33 = float(np.sum(x3 * x3))
    b1 = float(np.sum(x1 * y))
    b2 = float(np.sum(x2 * y))
    b3 = float(np.sum(x3 * y))
    det = (
        s11 * (s22 * s33 - s23 * s23)
        - s12 * (s12 * s33 - s23 * s13)
        + s13 * (s12 * s23 - s22 * s13)
    )
    n = len(y)
    if det <= 0.0:
        return None, None, None, n
    a1 = (
        b1 * (s22 * s33 - s23 * s23)
        - s12 * (b2 * s33 - s23 * b3)
        + s13 * (b2 * s23 - s22 * b3)
    ) / det
    a2 = (
        s11 * (b2 * s33 - s23 * b3)
        - b1 * (s12 * s33 - s23 * s13)
        + s13 * (s12 * b3 - b2 * s13)
    ) / det
    a3 = (
        s11 * (s22 * b3 - b2 * s23)
        - s12 * (s12 * b3 - b2 * s13)
        + b1 * (s12 * s23 - s22 * s13)
    ) / det
    flux0 = a1 + a2 + a3
    if flux0 <= 0.0:
        return None, None, None, n
    h = -2.5 * math.log10(flux0)
    return h, a1 / flux0, a2 / flux0, n


# Quantization grids for the native sufficient-statistics path: basis
# values (≤1) on a 1e-6 grid, fluxes (≤~1, after the M0 offset) on 1e-7.
# Integer sums are EXACT and order-independent, so Spark's map-side
# partial aggregation and DuckDB's sequential sum produce bit-identical
# sufficient statistics — which matters because the 3×3 normal equations
# amplify last-ulp sum noise by κ(X)² (observed ~1e9 on small groups).
# The quantization is part of the operator contract, applied identically
# in both engines; its ~1e-6 relative perturbation of the fit is far
# below the data's own noise scale.
_QX = 1_000_000.0
_QY = 10_000_000.0


def hg1g2_sufficient_stats_cols(x1, x2, x3, y):
    """Quantized int64 product columns for the nine sufficient statistics
    (Spark Columns in, dict of Columns out). floor(v*Q + 0.5) is half-away
    rounding on positive values — the same expression the oracle uses."""

    def q(col, scale):
        return F.floor(col * F.lit(scale) + F.lit(0.5)).cast("long")

    x1q, x2q, x3q, yq = q(x1, _QX), q(x2, _QX), q(x3, _QX), q(y, _QY)
    return {
        "s11": x1q * x1q, "s12": x1q * x2q, "s13": x1q * x3q,
        "s22": x2q * x2q, "s23": x2q * x3q, "s33": x3q * x3q,
        "b1": x1q * yq, "b2": x2q * yq, "b3": x3q * yq,
    }


def hg1g2_fit_native(
    df: DataFrame,
    keys: list[str],
    phase_col: str,
    mag_col: str,
    min_points: int = 5,
    m0: float = 15.0,
) -> DataFrame:
    """HG1G2 fit as a PURE DataFrame aggregation — no Python kernel at all.

    The closed-form solve needs only nine sufficient statistics, so the
    whole fit is sum() aggregates (partial/map-side combinable, one
    shuffle of nine int64s per group — vs collect_list shuffling every
    observation) followed by scalar column algebra for the Cramer solve.
    This is the 100 TB shape: state per group is O(1), whole-stage
    codegen end to end, and the reference's per-object scipy loop
    (ztf/ssoft/processor.py:436-671) becomes a single hash aggregation.

    ``m0`` is a reference magnitude subtracted before exponentiating so
    fluxes are O(1) for the integer grid; the fitted H adds it back.
    """
    alpha = F.col(phase_col)
    x1 = F.greatest(F.lit(0.0), F.lit(1.0) - F.lit(_PHI1_SLOPE) * alpha)
    x2 = F.greatest(F.lit(0.0), F.lit(1.0) - F.lit(_PHI2_SLOPE) * alpha)
    x3 = F.exp(
        F.lit(-_PHI3_SCALE) * F.pow(F.tan(alpha / 2.0), F.lit(2.0 / 3.0))
    )
    y = F.pow(F.lit(10.0), F.lit(-0.4) * (F.col(mag_col) - F.lit(m0)))
    stats = hg1g2_sufficient_stats_cols(x1, x2, x3, y)
    agg = df.groupBy(*keys).agg(
        F.count("*").alias("n"),
        *[F.sum(c).alias(k) for k, c in stats.items()],
    ).filter(F.col("n") >= min_points)

    def s(name, scale):
        return F.col(name).cast("double") / F.lit(scale)

    s11, s12, s13 = s("s11", _QX * _QX), s("s12", _QX * _QX), s("s13", _QX * _QX)
    s22, s23, s33 = s("s22", _QX * _QX), s("s23", _QX * _QX), s("s33", _QX * _QX)
    b1, b2, b3 = s("b1", _QX * _QY), s("b2", _QX * _QY), s("b3", _QX * _QY)
    det = (
        s11 * (s22 * s33 - s23 * s23)
        - s12 * (s12 * s33 - s23 * s13)
        + s13 * (s12 * s23 - s22 * s13)
    )
    a1 = (
        b1 * (s22 * s33 - s23 * s23)
        - s12 * (b2 * s33 - s23 * b3)
        + s13 * (b2 * s23 - s22 * b3)
    ) / det
    a2 = (
        s11 * (b2 * s33 - s23 * b3)
        - b1 * (s12 * s33 - s23 * s13)
        + s13 * (s12 * b3 - b2 * s13)
    ) / det
    a3 = (
        s11 * (s22 * b3 - b2 * s23)
        - s12 * (s12 * b3 - b2 * s13)
        + b1 * (s12 * s23 - s22 * s13)
    ) / det
    flux0 = a1 + a2 + a3
    ok = (det > 0) & (flux0 > 0)
    return agg.select(
        *keys,
        "n",
        F.when(ok, F.lit(m0) - 2.5 * F.log10(flux0)).alias("h"),
        F.when(ok, a1 / flux0).alias("g1"),
        F.when(ok, a2 / flux0).alias("g2"),
    )


def hg1g2_fit_per_group(
    df: DataFrame,
    keys: list[str],
    phase_col: str,
    mag_col: str,
    min_points: int = 5,
) -> DataFrame:
    """Per-group HG1G2 fit: one row per key tuple with (n, h, g1, g2).
    Same execution shape as :func:`hg_fit_per_group` — one shuffle into
    per-object arrays, then a scalar Arrow kernel."""
    grouped = (
        df.groupBy(*keys)
        .agg(
            F.collect_list(F.col(phase_col)).alias("__alpha"),
            F.collect_list(F.col(mag_col)).alias("__mag"),
        )
        .filter(F.size("__alpha") >= min_points)
    )

    @F.pandas_udf("struct<n long, h double, g1 double, g2 double>")
    def fit(alpha: pd.Series, mag: pd.Series) -> pd.DataFrame:
        rows = []
        for i in range(len(alpha)):
            h, g1, g2, n = hg1g2_fit_arrays(alpha.iloc[i], mag.iloc[i])
            rows.append((n, h, g1, g2))
        return pd.DataFrame(rows, columns=["n", "h", "g1", "g2"])

    return grouped.select(
        *keys, fit("__alpha", "__mag").alias("__f")
    ).select(*keys, "__f.*")
