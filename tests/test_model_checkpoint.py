"""Checkpoint seam: prove "swap in a real trained artifact, nothing else
changes". The frozen literal weights serialize to a JSON artifact, the
registered model queries reload them through the ExecutorRegistry path
seam, and the DuckDB oracles (which inline the builtin literals) still
match exactly — so a faithful file round-trip is score-identical, and a
perturbed file demonstrably feeds the kernel (scores move)."""

from __future__ import annotations

import os

import pytest

from fink_science_spark.oracle import compare, duckdb_connection
from fink_science_spark.operators.models import (
    FOREST,
    MLP_W1,
    _load_forest,
    _load_model,
    save_checkpoint,
)

SF = "/root/testdata/sf0.001"


def test_checkpoint_roundtrip_engine_free(tmp_path):
    p = str(tmp_path / "model.json")
    save_checkpoint(p)
    import numpy as np

    m = _load_model(p)
    builtin = _load_model(None)
    for k in ("W1", "b1", "W2"):
        assert np.array_equal(m[k], builtin[k])
    assert m["b2"] == builtin["b2"]
    assert _load_forest(p) == FOREST  # tuples restored from JSON arrays


@pytest.mark.parametrize("name", ["model_score", "model_score_forest"])
def test_model_queries_oracle_green_from_artifact(
    name, spark, tmp_path, monkeypatch
):
    """The driver-facing queries, with weights loaded from a file path via
    SPARK_GRAFT_MODEL_CHECKPOINT, must still match the literal-weight
    DuckDB oracle bit-for-bit. The path is resolved driver-side at
    query-build time and rides the UDF closure to the executors."""
    import __spark_entry__ as entrymod

    p = str(tmp_path / "model.json")
    save_checkpoint(p)
    monkeypatch.setenv("SPARK_GRAFT_MODEL_CHECKPOINT", p)
    df = entrymod.queries()[name](spark, SF)
    con = duckdb_connection(SF)
    res = compare(name, df, con, entrymod.oracle_sql()[name])
    assert res.ok, res.detail
    assert res.spark_rows > 0


def test_perturbed_checkpoint_changes_scores(spark, tmp_path):
    """Negative control: a checkpoint with a shifted weight must change
    the output — proving the artifact actually feeds the kernel rather
    than the kernel silently falling back to the builtin literals."""
    import json

    from pyspark.sql import functions as F

    from fink_science_spark.operators.models import make_mlp_score_udf

    p = str(tmp_path / "model.json")
    save_checkpoint(p)
    with open(p) as f:
        blob = json.load(f)
    assert blob["mlp"]["W1"] == MLP_W1
    blob["mlp"]["b2"] = float(blob["mlp"]["b2"]) + 1.0
    with open(p, "w") as f:
        json.dump(blob, f)

    df = spark.createDataFrame(
        [(1.0, 2.0, 3.0, 4.0), (0.5, -1.0, 2.5, 0.0)],
        "x1 double, x2 double, x3 double, x4 double",
    )
    builtin = make_mlp_score_udf(None)
    from_file = make_mlp_score_udf(p)
    out = df.select(
        builtin("x1", "x2", "x3", "x4").alias("a"),
        from_file("x1", "x2", "x3", "x4").alias("b"),
    ).collect()
    assert all(r["a"] != r["b"] for r in out)
