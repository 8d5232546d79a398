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
