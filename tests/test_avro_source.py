"""Avro wire-format tests: the pure-Python Object Container codec and
the block-parallel avro_replay DataSource, including the alert-packet
schema shape (nested records, named-type reuse, nullable unions, arrays,
bytes cutouts) and the format-agnostic enrichment contract vs parquet.
"""

from __future__ import annotations

import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from fink_science_spark.sources.avro_codec import (
    block_index,
    read_container,
    to_spark_type,
    write_container,
)

SF = "/root/testdata/sf0.001"

# the ZTF alert-packet shape (public schema structure): top-level record
# with a nested candidate record, history re-using the SAME named record
# type, a nullable xmatch, and a binary cutout
ALERT_SCHEMA = {
    "type": "record",
    "name": "alert",
    "fields": [
        {"name": "objectId", "type": "string"},
        {
            "name": "candidate",
            "type": {
                "type": "record",
                "name": "candidate_rec",
                "fields": [
                    {"name": "jd", "type": "double"},
                    {"name": "ra", "type": "double"},
                    {"name": "dec", "type": "double"},
                    {"name": "magpsf", "type": ["null", "double"]},
                    {"name": "fid", "type": "int"},
                ],
            },
        },
        {"name": "prv_candidates", "type": {"type": "array", "items": "candidate_rec"}},
        {"name": "cdsxmatch", "type": ["null", "string"]},
        {"name": "cutout", "type": "bytes"},
    ],
}


def _cand(jd, ra, dec, mag, fid):
    return {"jd": jd, "ra": ra, "dec": dec, "magpsf": mag, "fid": fid}


def _alerts(n):
    return [
        {
            "objectId": f"ZTF{i:06d}",
            "candidate": _cand(2.45e6 + i, (i * 7.3) % 360, -30.0 + i,
                               None if i % 3 == 0 else 17.5 + i / 10, i % 2 + 1),
            "prv_candidates": [
                _cand(2.45e6 + i - k, (i * 7.3) % 360, -30.0 + i, 18.0 + k, 1)
                for k in range(i % 4)
            ],
            "cdsxmatch": None if i % 2 else "Star",
            "cutout": bytes([i % 256, (i * 7) % 256]),
        }
        for i in range(n)
    ]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_roundtrip_alert_schema(tmp_path, codec):
    path = str(tmp_path / f"alerts_{codec}.avro")
    records = _alerts(57)
    write_container(path, ALERT_SCHEMA, records, codec=codec,
                    records_per_block=10)
    schema, got = read_container(path)
    assert schema == ALERT_SCHEMA
    assert got == records
    _s, _c, _sync, blocks = block_index(path)
    assert len(blocks) == 6  # 57 records / 10 per block
    assert [b[1] for b in blocks] == [10, 10, 10, 10, 10, 7]


_prim = st.one_of(
    st.none(),
    st.integers(min_value=-(2**40), max_value=2**40),
    st.text(max_size=20),
)


@given(st.lists(st.tuples(st.integers(-(2**31), 2**31 - 1), _prim,
                          st.floats(allow_nan=False, allow_infinity=False,
                                    width=64)),
                min_size=1, max_size=40))
@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_container_roundtrip_property(tmp_path_factory, rows):
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "k", "type": "long"},
            {"name": "v", "type": ["null", "long", "string"]},
            {"name": "x", "type": "double"},
        ],
    }
    records = [{"k": k, "v": v, "x": x} for k, v, x in rows]
    path = str(tmp_path_factory.mktemp("avro") / "prop.avro")
    write_container(path, schema, records, codec="deflate",
                    records_per_block=7)
    _s, got = read_container(path)
    assert got == records


def test_spark_reads_avro_block_parallel(spark, tmp_path):
    from fink_science_spark.sources.avro_replay import register_avro_source

    register_avro_source(spark)
    path = str(tmp_path / "alerts.avro")
    records = _alerts(57)
    write_container(path, ALERT_SCHEMA, records, codec="deflate",
                    records_per_block=10)
    df = spark.read.format("avro_replay").option("path", path).load()
    # schema translated: nullable union -> nullable double
    assert dict(df.dtypes)["cdsxmatch"] == "string"
    assert df.schema["candidate"].dataType["magpsf"].nullable
    # one partition per block
    assert df.rdd.getNumPartitions() == 6
    rows = {r["objectId"]: r for r in df.collect()}
    assert len(rows) == 57
    r7 = rows["ZTF000007"]
    assert r7["candidate"]["ra"] == (7 * 7.3) % 360
    assert len(r7["prv_candidates"]) == 3
    assert r7["cdsxmatch"] is None  # odd ids were written null
    assert bytes(r7["cutout"]) == bytes([7, 49])
    # the nullable fields actually null/set exactly where written so
    r6 = rows["ZTF000006"]
    assert r6["cdsxmatch"] == "Star"
    assert r6["candidate"]["magpsf"] is None  # i % 3 == 0 → null


def test_avro_source_feeds_same_enrichment_as_parquet(spark, tmp_path):
    """Format-agnosticism with the REAL wire format: the documents table
    re-serialized as an Avro container must drive the identical
    enrichment DAG to the identical result."""
    from pyspark.sql import functions as F

    from fink_science_spark.sources.avro_replay import register_avro_source

    register_avro_source(spark)
    base = spark.read.parquet(os.path.join(SF, "documents.parquet")).select(
        "doc_id", "text", "lang"
    )
    schema = {
        "type": "record",
        "name": "doc",
        "fields": [
            {"name": "doc_id", "type": "long"},
            {"name": "text", "type": "string"},
            {"name": "lang", "type": "string"},
        ],
    }
    records = [
        {"doc_id": r["doc_id"], "text": r["text"], "lang": r["lang"]}
        for r in base.collect()
    ]
    path = str(tmp_path / "docs.avro")
    write_container(path, schema, records, codec="deflate",
                    records_per_block=100)
    avro_df = spark.read.format("avro_replay").option("path", path).load()

    def enrich(df):
        from fink_science_spark.functions.text import token_count, tokens

        return df.select(
            "doc_id",
            token_count(F.col("text")).alias("n_tokens"),
            F.length("text").alias("n_chars"),
        )

    canon = lambda df: sorted(tuple(r) for r in df.collect())  # noqa: E731
    assert canon(enrich(avro_df)) == canon(enrich(base))


def test_avro_stream_replay_matches_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    from fink_science_spark.sources.avro_replay import register_avro_source
    from fink_science_spark.streaming.shell import (
        run_to_memory,
        scoped_shuffle_partitions,
    )

    register_avro_source(spark)
    path = str(tmp_path / "alerts_stream.avro")
    write_container(path, ALERT_SCHEMA, _alerts(57), codec="deflate",
                    records_per_block=10)
    with scoped_shuffle_partitions(spark, 4):
        stream = (
            spark.readStream.format("avro_replay")
            .option("path", path)
            .load()
        )
        counts = stream.groupBy("candidate.fid").agg(
            F.count("*").alias("n"),
            F.round(F.sum("candidate.ra"), 6).alias("sum_ra"),
        )
        got = run_to_memory(counts, "avro_stream_counts", spark)
        batch = (
            spark.read.format("avro_replay").option("path", path).load()
            .groupBy("candidate.fid")
            .agg(
                F.count("*").alias("n"),
                F.round(F.sum("candidate.ra"), 6).alias("sum_ra"),
            )
        )
    canon = lambda df: sorted(tuple(r) for r in df.collect())  # noqa: E731
    assert canon(got) == canon(batch)
    assert len(canon(got)) == 2  # both fid values present


def test_avro_stream_offsets_are_blocks(tmp_path):
    """Engine-free: offsets advance in block units; blocks_per_trigger
    chunks the replay like Kafka partition offsets."""
    from fink_science_spark.sources.avro_replay import AvroReplayStreamReader

    path = str(tmp_path / "chunk.avro")
    write_container(path, ALERT_SCHEMA, _alerts(57), records_per_block=10)
    r = AvroReplayStreamReader({"path": path, "blocks_per_trigger": "2"})
    assert r.initialOffset() == {"block": 0}
    assert r.latestOffset() == {"block": 2}
    assert r.latestOffset() == {"block": 4}
    parts = r.partitions({"block": 2}, {"block": 4})
    offsets = [off for p in parts for (_path, off) in p.items]
    assert offsets == [b[3] for b in r.blocks[2:4]]
    assert r.latestOffset() == {"block": 6}
    assert r.latestOffset() == {"block": 6}  # caught up, stays


def test_with_decoded_avro_kafka_value_shape(spark):
    """The from_avro slot: bare binary datums in a column decode to a
    typed struct through one Arrow stage; nulls inside nullable unions
    survive."""
    from fink_science_spark.sources.avro_codec import encode_datum
    from fink_science_spark.sources.avro_replay import with_decoded_avro

    cand_schema = ALERT_SCHEMA["fields"][1]["type"]
    rows = [
        (1, encode_datum(_cand(2.45e6, 10.0, -5.0, 17.25, 1), cand_schema)),
        (2, encode_datum(_cand(2.45e6, 20.0, 15.0, None, 2), cand_schema)),
    ]
    df = spark.createDataFrame(rows, "key long, value binary")
    out = with_decoded_avro(df, "value", cand_schema, "candidate")
    got = {r["key"]: r["candidate"] for r in out.collect()}
    assert got[1]["ra"] == 10.0 and got[1]["magpsf"] == 17.25
    assert got[2]["fid"] == 2 and got[2]["magpsf"] is None
    assert "value" not in out.columns


def test_container_roundtrip_enum_fixed_map(tmp_path):
    """The remaining type surface: enum (symbol index), fixed (raw
    bytes), map (counted blocks) — roundtrip + Spark-type translation."""
    from pyspark.sql import types as T

    schema = {
        "type": "record",
        "name": "m",
        "fields": [
            {"name": "band", "type": {"type": "enum", "name": "bands",
                                      "symbols": ["g", "r", "i"]}},
            {"name": "sig", "type": {"type": "fixed", "name": "sig16",
                                     "size": 4}},
            {"name": "props", "type": {"type": "map", "values": "long"}},
            {"name": "tags", "type": {"type": "map",
                                      "values": ["null", "string"]}},
        ],
    }
    records = [
        {"band": "r", "sig": b"\x01\x02\x03\x04",
         "props": {"a": 1, "b": -7}, "tags": {"x": None, "y": "z"}},
        {"band": "g", "sig": b"\xff\x00\xff\x00", "props": {},
         "tags": {}},
    ]
    path = str(tmp_path / "efm.avro")
    write_container(path, schema, records, codec="deflate")
    _s, got = read_container(path)
    assert got == records
    st = to_spark_type(schema)
    assert isinstance(st["band"].dataType, T.StringType)
    assert isinstance(st["sig"].dataType, T.BinaryType)
    assert st["props"].dataType == T.MapType(T.StringType(), T.LongType(),
                                             valueContainsNull=False)
    assert st["tags"].dataType == T.MapType(T.StringType(), T.StringType(),
                                            valueContainsNull=True)


def test_avro_stream_chunked_multi_trigger(spark, tmp_path):
    """Real multi-trigger chunked replay: blocks_per_trigger=2 over a
    6-block container must deliver all 57 records across ≥2 micro-batches
    with no loss or duplication."""
    import time

    from fink_science_spark.sources.avro_replay import register_avro_source

    register_avro_source(spark)
    path = str(tmp_path / "chunked.avro")
    write_container(path, ALERT_SCHEMA, _alerts(57), codec="deflate",
                    records_per_block=10)
    seen: list[list] = []

    def sink(batch_df, batch_id):
        rows = [r["objectId"] for r in batch_df.collect()]
        if rows:
            seen.append(rows)

    q = (
        spark.readStream.format("avro_replay")
        .option("path", path)
        .option("blocks_per_trigger", "2")
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    deadline = time.time() + 60
    while sum(len(b) for b in seen) < 57 and time.time() < deadline:
        time.sleep(0.2)
    q.stop()
    q.awaitTermination()
    flat = [x for b in seen for x in b]
    assert sorted(flat) == sorted(f"ZTF{i:06d}" for i in range(57))
    assert len(seen) >= 2  # genuinely chunked across triggers


def test_avro_codec_error_paths(tmp_path):
    """Corrupt inputs fail loudly with a diagnosis, never silently."""
    import pytest as _pytest

    from fink_science_spark.sources.avro_codec import (
        block_index,
        read_block,
    )

    # not an Avro file
    bad = tmp_path / "bad.avro"
    bad.write_bytes(b"PAR1not-avro-at-all")
    with _pytest.raises(ValueError, match="container"):
        block_index(str(bad))

    # corrupted sync marker between blocks
    path = str(tmp_path / "ok.avro")
    write_container(path, ALERT_SCHEMA, _alerts(25), records_per_block=10)
    schema, codec, sync, blocks = block_index(path)
    raw = bytearray(open(path, "rb").read())
    # flip a byte inside the sync marker after the first block
    first_off, _n, first_size = blocks[0]
    # sync begins after (varint n, varint size, payload); find it by
    # searching from the known second block offset backwards 16 bytes
    second_off = blocks[1][0]
    raw[second_off - 1] ^= 0xFF
    corrupted = str(tmp_path / "corrupt.avro")
    open(corrupted, "wb").write(bytes(raw))
    with _pytest.raises(ValueError, match="sync marker"):
        block_index(corrupted)
    # a direct block read past the corruption also refuses
    with _pytest.raises(ValueError, match="sync marker"):
        read_block(corrupted, schema, codec, sync, first_off)


def test_distributed_avro_sink_and_directory_read(spark, tmp_path):
    """df → per-partition part-*.avro containers (rows never reach the
    driver) → directory read back through the same source: lossless,
    including nested structs."""
    from pyspark.sql import functions as F

    from fink_science_spark.sources.avro_replay import (
        register_avro_source,
        write_avro_dir,
    )

    register_avro_source(spark)
    docs = (
        spark.read.parquet(os.path.join(SF, "documents.parquet"))
        .select(
            "doc_id", "lang",
            F.struct(
                F.length("text").alias("n_chars"),
                F.substring("text", 1, 10).alias("head"),
            ).alias("meta"),
        )
        .repartition(4)
    )
    schema = {
        "type": "record",
        "name": "doc",
        "fields": [
            {"name": "doc_id", "type": "long"},
            {"name": "lang", "type": "string"},
            {"name": "meta", "type": {"type": "record", "name": "meta_rec",
                                      "fields": [
                                          {"name": "n_chars", "type": "long"},
                                          {"name": "head", "type": "string"},
                                      ]}},
        ],
    }
    out = str(tmp_path / "docs_avro_dir")
    summaries = write_avro_dir(docs, out, schema, records_per_block=20)
    assert sum(s["n"] for s in summaries) == docs.count()
    assert len(summaries) >= 2  # genuinely written by multiple tasks

    back = spark.read.format("avro_replay").option("path", out).load()
    canon = lambda df: sorted(  # noqa: E731
        (r["doc_id"], r["lang"], r["meta"]["n_chars"], r["meta"]["head"])
        for r in df.collect()
    )
    assert canon(back) == canon(docs)
    # block-parallel across files: more partitions than files
    assert back.rdd.getNumPartitions() >= len(summaries)


def test_directory_read_schema_mismatch_raises(spark, tmp_path):
    from fink_science_spark.sources.avro_replay import _index_files

    d = tmp_path / "mixed"
    d.mkdir()
    write_container(str(d / "a.avro"), ALERT_SCHEMA, _alerts(3))
    other = {"type": "record", "name": "x",
             "fields": [{"name": "k", "type": "long"}]}
    write_container(str(d / "b.avro"), other, [{"k": 1}])
    with pytest.raises(ValueError, match="schema mismatch"):
        _index_files(str(d))


@given(st.lists(st.integers(-(2**63), 2**63 - 1), min_size=1, max_size=50))
@settings(max_examples=50, deadline=None)
def test_zigzag_varint_full_int64_range(longs):
    """Bare-datum encode/decode at the 64-bit zigzag boundaries
    (including -2^63 and 2^63-1, where Python's arbitrary-precision ints
    must still produce the canonical 10-byte wire form)."""
    from fink_science_spark.sources.avro_codec import (
        decode_datum,
        encode_datum,
    )

    schema = {"type": "record", "name": "r",
              "fields": [{"name": "x", "type": "long"}]}
    for v in longs:
        assert decode_datum(encode_datum({"x": v}, schema), schema) == {
            "x": v
        }


def test_deeply_nested_union_array_map_roundtrip(tmp_path):
    """Stress the recursive surface: arrays of nullable records holding
    maps of nullable arrays."""
    schema = {
        "type": "record",
        "name": "outer",
        "fields": [
            {"name": "items", "type": {"type": "array", "items": [
                "null",
                {"type": "record", "name": "inner", "fields": [
                    {"name": "m", "type": {"type": "map", "values": [
                        "null",
                        {"type": "array", "items": "long"},
                    ]}},
                ]},
            ]}},
        ],
    }
    records = [
        {"items": [None, {"m": {"a": [1, -2, 3], "b": None}},
                   {"m": {}}]},
        {"items": []},
    ]
    path = str(tmp_path / "deep.avro")
    write_container(path, schema, records, codec="deflate")
    _s, got = read_container(path)
    assert got == records


def test_interop_with_official_java_avro(spark, tmp_path):
    """Spec conformance against the REFERENCE IMPLEMENTATION: the Apache
    Avro Java library that ships in Spark's jars reads our containers
    (deflate, nested alert schema, NaN doubles, unions), and a container
    written by the Java DataFileWriter reads back through our codec —
    both directions bit-faithful."""
    jvm = spark._jvm

    # ours → Java
    path1 = str(tmp_path / "ours.avro")
    records = _alerts(23)
    write_container(path1, ALERT_SCHEMA, records, codec="deflate",
                    records_per_block=7)
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(path1),
        jvm.org.apache.avro.generic.GenericDatumReader(),
    )
    import json as _json

    assert _json.loads(reader.getSchema().toString()) == _json.loads(
        _json.dumps(ALERT_SCHEMA)
    )
    got = []
    while reader.hasNext():
        rec = reader.next()
        got.append(
            (
                str(rec.get("objectId")),
                float(rec.get("candidate").get("ra")),
                rec.get("candidate").get("magpsf"),
                int(rec.get("prv_candidates").size()),
                str(rec.get("cdsxmatch")) if rec.get("cdsxmatch") else None,
            )
        )
    reader.close()
    assert len(got) == 23
    for (oid, ra, mag, nprv, xm), exp in zip(got, records):
        assert oid == exp["objectId"]
        assert ra == exp["candidate"]["ra"]
        assert (mag is None) == (exp["candidate"]["magpsf"] is None)
        assert nprv == len(exp["prv_candidates"])
        assert xm == exp["cdsxmatch"]

    # Java → ours
    path2 = str(tmp_path / "java.avro")
    sch_json = _json.dumps(
        {
            "type": "record",
            "name": "jrec",
            "fields": [
                {"name": "k", "type": "long"},
                {"name": "x", "type": "double"},
                {"name": "s", "type": ["null", "string"]},
            ],
        }
    )
    jschema = jvm.org.apache.avro.Schema.Parser().parse(sch_json)
    writer = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter()
    )
    writer.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    writer.create(jschema, jvm.java.io.File(path2))
    expected = [(1, 0.5, "a"), (-7, -1.25e10, None), (2**40, 3.0, "z/у")]
    for k, x, s in expected:
        rec = jvm.org.apache.avro.generic.GenericData.Record(jschema)
        rec.put("k", k)
        rec.put("x", float(x))
        rec.put("s", s)
        writer.append(rec)
    writer.close()
    _s, ours = read_container(path2)
    assert ours == [{"k": k, "x": x, "s": s} for k, x, s in expected]


def test_reader_yields_arrow_batches(spark, tmp_path):
    """r3 verdict #3: the DataSource read path must hand the runner Arrow
    RecordBatches (bulk Python->JVM transfer), not per-row tuples — and
    the batch content must round-trip the codec exactly."""
    import pyarrow as pa

    from fink_science_spark.sources.avro_codec import write_container
    from fink_science_spark.sources import avro_replay as ar

    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "s", "type": "string"},
            {"name": "v", "type": ["null", "double"]},
        ],
    }
    path = str(tmp_path / "arrow_probe.avro")
    rows = [
        {"id": i, "s": f"x{i}", "v": None if i % 3 == 0 else i * 0.5}
        for i in range(250)
    ]
    write_container(path, schema, rows, codec="deflate", records_per_block=100)

    reader = ar.AvroReplayReader({"path": path, "max_partitions": "1"})
    assert reader.arrow_schema is not None
    (part,) = reader.partitions()
    out = list(reader.read(part))
    assert out and all(isinstance(b, pa.RecordBatch) for b in out), (
        "Arrow fast path must be taken for arrow-expressible schemas"
    )
    got = pa.Table.from_batches(out).to_pylist()
    assert got == rows


def test_index_memo_invalidates_on_rewrite(spark, tmp_path):
    """The driver-side block-index memo must key on file mtime/size so a
    rewritten container never serves a stale index."""
    from fink_science_spark.sources.avro_codec import write_container
    from fink_science_spark.sources import avro_replay as ar

    schema = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "id", "type": "long"}],
    }
    path = str(tmp_path / "memo.avro")
    write_container(path, schema, [{"id": 1}], records_per_block=10)
    _, blocks1 = ar._index_files(path)
    assert ar._index_files(path)[1] is blocks1  # memo hit
    import os, time as _time

    _time.sleep(0.01)
    write_container(
        path, schema, [{"id": i} for i in range(25)], records_per_block=10
    )
    os.utime(path)
    _, blocks2 = ar._index_files(path)
    assert sum(n for _f, _c, _s, _o, n, _sz in blocks2) == 25


def test_pythonize_single_element_arrays_stay_lists():
    """Regression: a SIZE-1 ndarray's .item() succeeds, so dispatching on
    .item before the container types silently turned one-element array
    columns into bare scalars on the distributed-sink write path."""
    import numpy as np

    from fink_science_spark.sources.avro_replay import _pythonize

    assert _pythonize(np.array([5])) == [5]
    assert _pythonize(np.array([1, 2])) == [1, 2]
    assert _pythonize({"h": np.array([3.5])}) == {"h": [3.5]}
    assert _pythonize(np.int64(7)) == 7
    assert _pythonize(np.array(["a"], dtype=object)) == ["a"]


def test_index_memo_rebuild_refreshes_lru_position(tmp_path):
    """Regression: reassigning an existing dict key keeps its OLD
    insertion position, so a rebuilt (rewritten-container) entry was the
    FIRST evicted — FIFO, not LRU — exactly for the hottest path."""
    import os
    import time as _time

    from fink_science_spark.sources import avro_replay as ar
    from fink_science_spark.sources.avro_codec import write_container

    schema = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "id", "type": "long"}],
    }
    saved = dict(ar._INDEX_MEMO)
    ar._INDEX_MEMO.clear()
    try:
        paths = []
        for i in range(3):
            p = str(tmp_path / f"m{i}.avro")
            write_container(p, schema, [{"id": i}], records_per_block=4)
            ar._index_files(p)
            paths.append(p)
        # rewrite the OLDEST entry -> rebuild must move it to the tail
        _time.sleep(0.01)
        write_container(paths[0], schema, [{"id": 9}], records_per_block=4)
        os.utime(paths[0])
        ar._index_files(paths[0])
        assert list(ar._INDEX_MEMO) == [paths[1], paths[2], paths[0]]
    finally:
        ar._INDEX_MEMO.clear()
        ar._INDEX_MEMO.update(saved)
