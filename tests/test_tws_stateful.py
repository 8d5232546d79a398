"""transformWithStateInPandas profile accumulator — gated on protobuf.

The TWS Python state client speaks protobuf to the JVM state server;
``google.protobuf`` is not baked into this container (and installs are
not possible), so the runtime path cannot execute here. The operator
module is still importable and its plan must build; the end-to-end
assertion runs automatically wherever protobuf exists (ROADMAP.md).
"""

from __future__ import annotations

import importlib.util

import pytest

try:
    _HAS_PROTOBUF = importlib.util.find_spec("google.protobuf") is not None
except ModuleNotFoundError:  # no 'google' namespace package at all
    _HAS_PROTOBUF = False


def test_processor_logic_without_engine():
    """The processor's per-batch math, driven directly (no Spark): state
    transitions and emissions are plain Python and must be correct
    regardless of the engine gating."""
    import pandas as pd

    from fink_science_spark.streaming.stateful import (
        make_user_profile_processor,
    )

    class FakeValue:
        def __init__(self):
            self.v = None

        def exists(self):
            return self.v is not None

        def get(self):
            return self.v

        def update(self, v):
            self.v = v

    class FakeMap:
        def __init__(self):
            self.d = {}

        def containsKey(self, k):
            return k in self.d

        def getValue(self, k):
            return self.d[k]

        def updateValue(self, k, v):
            self.d[k] = v

        def keys(self):
            return iter(self.d)

    class FakeHandle:
        def getValueState(self, name, schema, ttlDurationMs=None):
            return FakeValue()

        def getMapState(self, name, ks, vs, ttlDurationMs=None):
            return FakeMap()

    proc = make_user_profile_processor()
    proc.init(FakeHandle())
    b1 = pd.DataFrame({"value": [1.0, 3.0], "event_type": ["a", "b"]})
    b2 = pd.DataFrame({"value": [5.0], "event_type": ["a"]})
    (out1,) = proc.handleInputRows((7,), iter([b1]), None)
    assert out1.iloc[0].to_dict() == {
        "user_id": 7, "n": 2, "mean_value": 2.0, "max_value": 3.0,
        "n_types": 2,
    }
    (out2,) = proc.handleInputRows((7,), iter([b2]), None)
    assert out2.iloc[0].to_dict() == {
        "user_id": 7, "n": 3, "mean_value": 3.0, "max_value": 5.0,
        "n_types": 2,
    }


@pytest.mark.skipif(
    not _HAS_PROTOBUF,
    reason="transformWithState state client requires google.protobuf "
    "(absent from this container; no installs)",
)
def test_tws_stream_matches_batch(spark, tmp_path):
    import os

    from pyspark.sql import functions as F

    from fink_science_spark.streaming.stateful import (
        _ROCKSDB,
        user_profile_stream,
    )

    src = "/root/testdata/sf0.001"
    schema = spark.read.parquet(os.path.join(src, "events.parquet")).schema
    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, None)
    spark.conf.set(key, _ROCKSDB)
    try:
        stream = (
            spark.readStream.schema(schema)
            .format("parquet")
            .option("pathGlobFilter", "events.parquet")
            .load(src)
        )
        q = (
            user_profile_stream(stream)
            .writeStream.format("memory")
            .queryName("tws_test")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            r["user_id"]: r["n"]
            for r in spark.table("tws_test").collect()
        }
        want = {
            r["user_id"]: r["n"]
            for r in spark.read.parquet(os.path.join(src, "events.parquet"))
            .groupBy("user_id")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert got == want
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)
