"""Value-level parity for the REAL kilonova PCA components.

Two claims, both against reference-shipped artifacts (gated on the
reference tree being present):

1. The committed JSON checkpoint (``fink_science_spark/data/kn_pcs.json``)
   is a BIT-EXACT transcription of the reference's
   ``data/models/KN_PC_all_bands.npy`` (ztf/kilonova/processor.py:165,
   ``load_pcs()``).
2. The engine's peak-aligned projection (operators/kn_pca.py), run INSIDE
   Spark on the reference's real 51-alert ZTF sample with the real g/r
   components, matches an INDEPENDENT plain-numpy transcription of the
   same feature step (SNANA FLUXCAL conversion → max-normalize →
   peak-align on the 51-point grid → dot with the component) to 1e-9
   relative — the PCA-projection slot of
   ztf/kilonova/processor.py:149-176 with reference-shipped component
   values, not synthetic stand-ins.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pytest

from pyspark.sql import functions as F

NPY = "/root/reference/fink_science/data/models/KN_PC_all_bands.npy"
ALERTS = "/root/reference/fink_science/data/alerts/alerts.parquet"

needs_npy = pytest.mark.skipif(
    not os.path.exists(NPY), reason="reference KN_PC_all_bands.npy absent"
)
needs_alerts = pytest.mark.skipif(
    not (os.path.exists(NPY) and os.path.exists(ALERTS)),
    reason="reference npy / alert sample absent",
)


@needs_npy
def test_checkpoint_artifact_bit_exact_vs_reference_npy():
    from fink_science_spark.operators.kn_pca import GRID, load_kn_pcs

    ref = np.load(NPY, allow_pickle=True).item()
    ours = load_kn_pcs()
    assert sorted(ours) == sorted(ref)
    for band, mat in ref.items():
        got = np.asarray(ours[band], dtype=np.float64)
        assert got.shape == (10, GRID)
        assert np.array_equal(got, np.asarray(mat, dtype=np.float64)), band


def test_checkpoint_seam_roundtrip(tmp_path):
    """save_kn_checkpoint → env override → load resolves the user artifact
    (the same driver-side seam models.checkpoint_path uses)."""
    from fink_science_spark.operators import kn_pca

    bands = {"g": [[float(i + j) for j in range(51)] for i in range(2)]}
    p = str(tmp_path / "kn_user.json")
    kn_pca.save_kn_checkpoint(p, bands)
    old = os.environ.get("SPARK_GRAFT_KN_CHECKPOINT")
    os.environ["SPARK_GRAFT_KN_CHECKPOINT"] = p
    try:
        got = kn_pca.load_kn_pcs()
        assert got["g"][1][50] == 51.0
    finally:
        if old is None:
            del os.environ["SPARK_GRAFT_KN_CHECKPOINT"]
        else:
            os.environ["SPARK_GRAFT_KN_CHECKPOINT"] = old


def _numpy_projection(flux: list[float], pc: np.ndarray) -> float:
    """Independent transcription of the engine's projection contract:
    first-GRID slice, max-normalize (1e-9 floor), first-argmax aligned to
    grid slot 26 (1-based), out-of-window slots contribute 0, terms summed
    left-to-right in grid order."""
    from fink_science_spark.operators.kn_pca import GRID, PEAK_SLOT

    v = flux[:GRID]
    if not v:
        return 0.0
    m = max(max(v), 1e-9)
    pos = 1 + max(range(len(v)), key=lambda i: (v[i], -i))  # first argmax
    # (max(..., key) returns the FIRST maximal element; the -i tiebreak is
    # explicit documentation, not a behavior change)
    shift = PEAK_SLOT - pos
    acc = 0.0
    for j in range(1, GRID + 1):
        i = j - shift
        val = v[i - 1] / m if 1 <= i <= len(v) else 0.0
        acc += val * float(pc[j - 1])
    return acc


@needs_alerts
def test_real_alert_projection_matches_numpy_transcription(spark):
    from fink_science_spark.functions.arrays import concat_col
    from fink_science_spark.operators.kn_pca import (
        kn_coef_col,
        kn_prep_cols,
        load_kn_pcs,
    )

    pcs = load_kn_pcs()
    ref = np.load(NPY, allow_pickle=True).item()

    df = spark.read.parquet(ALERTS)
    for c in ("jd", "fid", "magpsf"):
        df = concat_col(df, c)
    # valid detections only (upper limits carry NaN/null magpsf), time order
    pts = F.array_sort(
        F.filter(
            F.arrays_zip("cjd", "cfid", "cmagpsf"),
            lambda s: s.cmagpsf.isNotNull() & ~F.isnan(s.cmagpsf),
        )
    )
    flux = lambda s: F.pow(F.lit(10.0), F.lit(-0.4) * s.cmagpsf) * F.lit(1e11)
    curves = df.select(
        "objectId",
        F.transform(
            F.filter(pts, lambda s: s.cfid == 1), flux
        ).alias("g_flux"),
        F.transform(
            F.filter(pts, lambda s: s.cfid == 2), flux
        ).alias("r_flux"),
    )
    out = (
        curves.select(
            "objectId",
            "g_flux",
            "r_flux",
            *kn_prep_cols("g_flux", "kg"),
            *kn_prep_cols("r_flux", "kr"),
        )
        .select(
            "objectId",
            "g_flux",
            "r_flux",
            kn_coef_col("kg_s", "kg_m", "kg_sh", pcs["g"][0], 1.0).alias("cg1"),
            kn_coef_col("kg_s", "kg_m", "kg_sh", pcs["g"][1], 1.0).alias("cg2"),
            kn_coef_col("kr_s", "kr_m", "kr_sh", pcs["r"][0], 1.0).alias("cr1"),
            kn_coef_col("kr_s", "kr_m", "kr_sh", pcs["r"][1], 1.0).alias("cr2"),
        )
        .collect()
    )
    assert len(out) == 51
    nonzero = 0
    for r in out:
        # independent numpy transcription on the SAME collected curves,
        # against components read straight from the reference npy
        exp = {
            "cg1": _numpy_projection(r["g_flux"], ref["g"][0]),
            "cg2": _numpy_projection(r["g_flux"], ref["g"][1]),
            "cr1": _numpy_projection(r["r_flux"], ref["r"][0]),
            "cr2": _numpy_projection(r["r_flux"], ref["r"][1]),
        }
        for k, want in exp.items():
            got = r[k] if r[k] is not None else 0.0
            assert got == pytest.approx(want, rel=1e-9, abs=1e-12), (
                r["objectId"],
                k,
            )
            if not math.isclose(got, 0.0, abs_tol=1e-15):
                nonzero += 1
    # real history exists: the projection must be non-trivial on the sample
    assert nonzero >= 20
