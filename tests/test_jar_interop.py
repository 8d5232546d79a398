"""Jar-drop rehearsal (r3 verdict #6): the moment spark-avro /
spark-sql-kafka jars are on the classpath, these tests light up and
prove the jar paths are drop-in equivalent to the pure-Python stand-ins
— until then they skip with a precise reason. The wiring mirrors the
reference broker (`/root/reference/fink_science/tester.py:89-105`
spark-avro packages + Kafka/Avro alert stream); the runbook lives in
ROADMAP.md §"Jar-drop runbook".
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _jvm_class_present(spark, cls: str) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(cls)
        return True
    except Exception:  # noqa: BLE001 - absence == any loader failure
        return False


@pytest.fixture(scope="module")
def avro_dir(spark, tmp_path_factory):
    """A directory of Avro containers written by the engine's own
    distributed sink — the layout both spark-avro and avro_replay read."""
    from fink_science_spark.sources.avro_replay import write_avro_dir

    out = str(tmp_path_factory.mktemp("jar_interop") / "docs_avro")
    schema = {
        "type": "record",
        "name": "doc",
        "fields": [
            {"name": "doc_id", "type": "long"},
            {"name": "lang", "type": "string"},
            {"name": "n_chars", "type": "long"},
        ],
    }
    df = (
        spark.read.parquet(os.path.join(SF, "documents.parquet"))
        .select("doc_id", "lang", "n_chars")
        .repartition(4)
    )
    write_avro_dir(df, out, schema, codec="deflate")
    return out


def test_format_avro_equals_avro_replay(spark, avro_dir):
    """`format("avro")` (jar) and `format("avro_replay")` (pure Python)
    must produce identical rows from the same containers — the one-config
    swap the production path depends on."""
    from pyspark.errors.exceptions.captured import AnalysisException

    from fink_science_spark.sources.avro_replay import register_avro_source

    register_avro_source(spark)
    try:
        jar_rows = spark.read.format("avro").load(avro_dir).collect()
    except AnalysisException as exc:
        if "Failed to find data source: avro" in str(exc):
            # avro compile classes ship inside Spark but the data source
            # MODULE is external — Class.forName is NOT a valid gate here
            pytest.skip(
                "spark-avro module not deployed (add --packages "
                "org.apache.spark:spark-avro_2.13:<spark-version>); "
                "pure-Python codec remains the exercised path"
            )
        raise
    via_jar = sorted(tuple(r) for r in jar_rows)
    via_python = sorted(
        tuple(r)
        for r in spark.read.format("avro_replay")
        .option("path", avro_dir)
        .load()
        .collect()
    )
    assert via_jar == via_python


def test_kafka_readstream_wiring(spark):
    """The Kafka source rehearsal: build the exact readStream the broker
    consumer uses (kafka source → binary value → jar-free from_avro
    decode) and check the UNSTARTED plan's schema — no broker contact
    happens before .start(), so this validates the full wiring that a
    jar drop enables."""
    if not _jvm_class_present(
        spark,
        "org.apache.spark.sql.kafka010.KafkaSourceProvider",
    ):
        pytest.skip(
            "spark-sql-kafka jar absent (add --packages "
            "org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>)"
        )
    from fink_science_spark.sources.avro_replay import with_decoded_avro

    stream = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", "localhost:9092")
        .option("subscribe", "ztf_alerts")
        .load()
    )
    assert {"key", "value", "topic", "partition", "offset"} <= set(
        stream.columns
    )
    alert_schema = {
        "type": "record",
        "name": "alert",
        "fields": [
            {"name": "objectId", "type": "string"},
            {"name": "magpsf", "type": ["null", "double"]},
        ],
    }
    decoded = with_decoded_avro(
        stream.select("value"), "value", alert_schema, "alert"
    )
    assert decoded.schema["alert"].dataType.fieldNames() == [
        "objectId",
        "magpsf",
    ]
    assert decoded.isStreaming
