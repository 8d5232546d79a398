"""Value-level parity for the REAL SuperNNova normalization constants.

Claims (gated on the reference tree being present):

1. The committed artifact (``fink_science_spark/data/snn_data_norm.json``)
   is a VERBATIM transcription of the reference's
   ``data/models/snn_models/snn_sn_vs_all/data_norm.json`` (the constants
   SuperNNova's ``classify_lcs`` standardizes features with —
   ztf/snn/processor.py:84-210, model dir at :196).
2. The engine's feature prep — SNANA FLUXCAL conversion
   (mag2fluxcal_snana) followed by SuperNNova log-standardization
   ``(ln(x - min + 1e-5) - mean)/std`` — run INSIDE Spark on the real
   51-alert ZTF sample, matches an independent plain-numpy transcription
   using constants read straight from the reference JSON, for both the
   FLUXCAL_g flux feature and the delta_time (gap since previous
   detection) feature.
"""

from __future__ import annotations

import json
import math
import os

import pytest

from pyspark.sql import functions as F

REF_NORM = (
    "/root/reference/fink_science/data/models/snn_models/"
    "snn_sn_vs_all/data_norm.json"
)
ALERTS = "/root/reference/fink_science/data/alerts/alerts.parquet"

needs_ref = pytest.mark.skipif(
    not os.path.exists(REF_NORM), reason="reference data_norm.json absent"
)
needs_alerts = pytest.mark.skipif(
    not (os.path.exists(REF_NORM) and os.path.exists(ALERTS)),
    reason="reference data_norm.json / alert sample absent",
)


@needs_ref
def test_artifact_verbatim_vs_reference_json():
    from fink_science_spark.operators.snn_norm import load_snn_norm

    with open(REF_NORM) as f:
        ref = json.load(f)
    assert load_snn_norm() == ref


def test_checkpoint_seam_roundtrip(tmp_path):
    from fink_science_spark.operators import snn_norm

    p = str(tmp_path / "norm.json")
    with open(p, "w") as f:
        json.dump(
            {
                "source": "test",
                "features": {"x": {"mean": 1.0, "min": 0.0, "std": 2.0}},
            },
            f,
        )
    old = os.environ.get("SPARK_GRAFT_SNN_NORM")
    os.environ["SPARK_GRAFT_SNN_NORM"] = p
    try:
        assert snn_norm.load_snn_norm()["x"]["std"] == 2.0
    finally:
        if old is None:
            del os.environ["SPARK_GRAFT_SNN_NORM"]
        else:
            os.environ["SPARK_GRAFT_SNN_NORM"] = old


def _np_norm(x: float, st: dict) -> float:
    return (math.log(max(x - st["min"], 0.0) + 1e-5) - st["mean"]) / st["std"]


@needs_alerts
def test_real_alert_feature_prep_matches_numpy_transcription(spark):
    from fink_science_spark.functions.arrays import concat_col
    from fink_science_spark.operators.snn_norm import (
        load_snn_norm,
        snn_norm_col,
    )

    with open(REF_NORM) as f:
        ref = json.load(f)
    norm = load_snn_norm()

    df = spark.read.parquet(ALERTS)
    for c in ("jd", "magpsf", "fid"):
        df = concat_col(df, c)
    # g-band valid detections, time order — the FLUXCAL_g sequence
    pts = F.array_sort(
        F.filter(
            F.arrays_zip("cjd", "cmagpsf"),
            lambda s: s.cmagpsf.isNotNull()
            & ~F.isnan(s.cmagpsf)
            & (s.cjd.isNotNull()),
        )
    )
    curves = df.select(
        "objectId",
        F.col("cfid").alias("fid_raw"),
        F.transform(pts, lambda s: s.cjd).alias("jd_arr"),
        F.transform(
            pts,
            lambda s: F.pow(F.lit(10.0), F.lit(-0.4) * s.cmagpsf)
            * F.lit(1e11),
        ).alias("flux_arr"),
    )
    # engine-side normalized features: per-element flux norm, per-gap dt norm
    out = curves.select(
        "objectId",
        "jd_arr",
        "flux_arr",
        F.transform(
            "flux_arr", lambda x: snn_norm_col(x, norm["FLUXCAL_g"])
        ).alias("flux_norm"),
        F.transform(
            F.sequence(F.lit(1), F.size("jd_arr")),
            lambda i: snn_norm_col(
                F.when(
                    i == 1, F.lit(0.0)
                ).otherwise(
                    F.element_at("jd_arr", i)
                    - F.element_at("jd_arr", i - 1)
                ),
                norm["delta_time"],
            ),
        ).alias("dt_norm"),
    ).collect()
    assert len(out) == 51
    checked = 0
    for r in out:
        jd, flux = r["jd_arr"], r["flux_arr"]
        for i in range(len(flux)):
            want_f = _np_norm(flux[i], ref["FLUXCAL_g"])
            assert r["flux_norm"][i] == pytest.approx(want_f, rel=1e-9), (
                r["objectId"],
                i,
            )
            dt = 0.0 if i == 0 else jd[i] - jd[i - 1]
            want_d = _np_norm(dt, ref["delta_time"])
            assert r["dt_norm"][i] == pytest.approx(want_d, rel=1e-9), (
                r["objectId"],
                i,
            )
            checked += 1
    # the sample carries real multi-point histories
    assert checked >= 60
