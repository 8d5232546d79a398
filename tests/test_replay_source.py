"""Unit + integration tests for the pure-Python alert_replay DataSource:
row-group pruning from pushed filters (driver-side, no session), exact
re-filtering end to end, and deterministic multi-micro-batch replay."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from fink_science_spark.sources.replay import (
    AlertReplayReader,
    register_replay_source,
)
from pyspark.sql.datasource import EqualTo, GreaterThan, LessThanOrEqual


@pytest.fixture(scope="module")
def chunked_parquet(tmp_path_factory):
    """4 row groups of 25 rows each, ids 0..99 ascending (so min/max
    stats per group are [0,24], [25,49], [50,74], [75,99])."""
    path = str(tmp_path_factory.mktemp("replay") / "chunked.parquet")
    tbl = pa.table(
        {
            "id": pa.array(range(100), pa.int64()),
            "val": pa.array([float(i % 7) for i in range(100)]),
        }
    )
    pq.write_table(tbl, path, row_group_size=25)
    return path


def _reader(path, filters):
    r = AlertReplayReader({"path": path})
    r.pushFilters(filters)
    return r


def test_pushdown_prunes_row_groups(chunked_parquet):
    r = _reader(chunked_parquet, [GreaterThan(("id",), 60)])
    assert r.planned_row_groups() == [2, 3]
    r = _reader(chunked_parquet, [EqualTo(("id",), 30)])
    assert r.planned_row_groups() == [1]
    r = _reader(
        chunked_parquet,
        [GreaterThan(("id",), 20), LessThanOrEqual(("id",), 55)],
    )
    assert r.planned_row_groups() == [0, 1, 2]


def test_pushdown_keeps_all_without_filters(chunked_parquet):
    assert _reader(chunked_parquet, []).planned_row_groups() == [0, 1, 2, 3]


def test_unknown_filter_shapes_are_ignored(chunked_parquet):
    from pyspark.sql.datasource import IsNotNull

    r = _reader(chunked_parquet, [IsNotNull(("id",))])
    assert r.planned_row_groups() == [0, 1, 2, 3]


def test_batch_read_refilters_exactly(spark, chunked_parquet):
    register_replay_source(spark)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    df = (
        spark.read.format("alert_replay")
        .option("path", chunked_parquet)
        .load()
        .filter(F.col("id") > 60)
    )
    # pruning keeps groups 2-3 (50..99); Spark's re-filter must still cut
    # 50..60 — pushdown is best-effort, never a correctness dependency
    assert df.count() == 39
    assert df.agg(F.min("id")).first()[0] == 61


def test_stream_replay_multiple_batches(spark, tmp_path, chunked_parquet):
    register_replay_source(spark)
    batches: list[int] = []

    def sink(batch_df, batch_id):
        n = batch_df.count()
        if n:
            batches.append(n)

    q = (
        spark.readStream.format("alert_replay")
        .option("path", chunked_parquet)
        .option("rows_per_batch", "30")
        .option("advance_per_trigger", "30")
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    import time

    deadline = time.time() + 60
    while sum(batches) < 100 and time.time() < deadline:
        time.sleep(0.2)
    q.stop()
    q.awaitTermination()
    assert sum(batches) == 100
    assert len(batches) >= 2  # replayed as multiple deterministic chunks
