"""Pure-Python Avro Object Container File codec (read + write).

The reference ingests alert packets as Avro container files through
spark-avro (`fink_science/tester.py:89-105` wires
``--packages org.apache.spark:spark-avro``); this container has neither
the spark-avro jar nor network access, so the wire format is implemented
directly from the PUBLIC Apache Avro 1.11 specification ("Object
Container Files" + "Binary Encoding" sections):

- container = magic ``Obj\\x01`` · file-metadata map (``avro.schema``
  JSON, ``avro.codec``) · 16-byte sync marker · blocks;
- block = record count (zigzag varint) · byte size · payload · sync;
- codecs: ``null`` and ``deflate`` (raw zlib, RFC 1951);
- binary encoding: zigzag varints for int/long, little-endian IEEE
  float/double, length-prefixed bytes/string, fields in declaration
  order for records, counted blocks for arrays/maps, zigzag branch
  index for unions.

Supported schema surface (the alert-packet shape): null, boolean, int,
long, float, double, bytes, string, record, enum, fixed, array, map,
and unions. Named-type references resolve through a registry so the
self-referential alert schemas (prv_candidates re-using ``candidate``'s
record type) decode correctly.

Scale design: blocks are the split unit — the planner walks the block
index (seek + skip, no decode) and hands byte ranges to executors, so a
large file decodes in parallel and a reader touches only its own
blocks. See :mod:`fink_science_spark.sources.avro_replay`.
"""

from __future__ import annotations

import io
import json
import struct
import zlib

MAGIC = b"Obj\x01"


# --------------------------------------------------------------------------
# Binary primitives (Avro spec: "Binary Encoding")
# --------------------------------------------------------------------------


def _read_varint(buf: io.BufferedIOBase) -> int:
    shift, acc = 0, 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint")
        v = b[0]
        acc |= (v & 0x7F) << shift
        if not v & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)  # zigzag decode


def _write_varint(out: io.BufferedIOBase, n: int) -> None:
    n = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.write(bytes((b | 0x80,)))
        else:
            out.write(bytes((b,)))
            return


def _read_bytes(buf) -> bytes:
    n = _read_varint(buf)
    data = buf.read(n)
    if len(data) != n:
        raise EOFError("truncated bytes")
    return data


def _write_bytes(out, data: bytes) -> None:
    _write_varint(out, len(data))
    out.write(data)


# --------------------------------------------------------------------------
# Schema handling: normalize + named-type registry
# --------------------------------------------------------------------------

_PRIMITIVES = {
    "null", "boolean", "int", "long", "float", "double", "bytes", "string"
}


def _register_names(schema, names: dict) -> None:
    if isinstance(schema, dict):
        t = schema.get("type")
        if t in ("record", "enum", "fixed"):
            names[schema["name"]] = schema
            ns = schema.get("namespace")
            if ns:
                names[f"{ns}.{schema['name']}"] = schema
        if t == "record":
            for f in schema["fields"]:
                _register_names(f["type"], names)
        elif t == "array":
            _register_names(schema["items"], names)
        elif t == "map":
            _register_names(schema["values"], names)
    elif isinstance(schema, list):
        for s in schema:
            _register_names(s, names)


def _resolve(schema, names: dict):
    if isinstance(schema, str) and schema not in _PRIMITIVES:
        try:
            return names[schema]
        except KeyError:
            raise ValueError(f"unknown named type {schema!r}") from None
    return schema


# --------------------------------------------------------------------------
# Datum read / write
# --------------------------------------------------------------------------


def _read_datum(buf, schema, names: dict):
    schema = _resolve(schema, names)
    if isinstance(schema, list):  # union: zigzag branch index
        return _read_datum(buf, schema[_read_varint(buf)], names)
    t = schema["type"] if isinstance(schema, dict) else schema
    if isinstance(schema, dict) and t in _PRIMITIVES:
        schema = t
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1) == b"\x01"
    if t in ("int", "long"):
        return _read_varint(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "bytes":
        return _read_bytes(buf)
    if t == "string":
        return _read_bytes(buf).decode("utf-8")
    if t == "record":
        return {
            f["name"]: _read_datum(buf, f["type"], names)
            for f in schema["fields"]
        }
    if t == "enum":
        return schema["symbols"][_read_varint(buf)]
    if t == "fixed":
        return buf.read(schema["size"])
    if t == "array":
        out = []
        while True:
            n = _read_varint(buf)
            if n == 0:
                return out
            if n < 0:  # block with byte-size prefix
                n = -n
                _read_varint(buf)
            for _ in range(n):
                out.append(_read_datum(buf, schema["items"], names))
    if t == "map":
        out = {}
        while True:
            n = _read_varint(buf)
            if n == 0:
                return out
            if n < 0:
                n = -n
                _read_varint(buf)
            for _ in range(n):
                k = _read_bytes(buf).decode("utf-8")
                out[k] = _read_datum(buf, schema["values"], names)
    raise ValueError(f"unsupported Avro type {t!r}")


def _write_datum(out, datum, schema, names: dict) -> None:
    schema = _resolve(schema, names)
    if isinstance(schema, list):  # union: pick the first matching branch
        for i, branch in enumerate(schema):
            if _matches(datum, branch, names):
                _write_varint(out, i)
                _write_datum(out, datum, branch, names)
                return
        raise ValueError(f"datum {datum!r} matches no union branch {schema}")
    t = schema["type"] if isinstance(schema, dict) else schema
    if isinstance(schema, dict) and t in _PRIMITIVES:
        schema = t
    if t == "null":
        return
    if t == "boolean":
        out.write(b"\x01" if datum else b"\x00")
    elif t in ("int", "long"):
        _write_varint(out, int(datum))
    elif t == "float":
        out.write(struct.pack("<f", float(datum)))
    elif t == "double":
        out.write(struct.pack("<d", float(datum)))
    elif t == "bytes":
        _write_bytes(out, bytes(datum))
    elif t == "string":
        _write_bytes(out, str(datum).encode("utf-8"))
    elif t == "record":
        for f in schema["fields"]:
            _write_datum(out, datum[f["name"]], f["type"], names)
    elif t == "enum":
        _write_varint(out, schema["symbols"].index(datum))
    elif t == "fixed":
        out.write(bytes(datum))
    elif t == "array":
        if datum:
            _write_varint(out, len(datum))
            for item in datum:
                _write_datum(out, item, schema["items"], names)
        _write_varint(out, 0)
    elif t == "map":
        if datum:
            _write_varint(out, len(datum))
            for k, v in datum.items():
                _write_bytes(out, str(k).encode("utf-8"))
                _write_datum(out, v, schema["values"], names)
        _write_varint(out, 0)
    else:
        raise ValueError(f"unsupported Avro type {t!r}")


def _matches(datum, schema, names: dict) -> bool:
    schema = _resolve(schema, names)
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "null":
        return datum is None
    if datum is None:
        return False
    if t == "boolean":
        return isinstance(datum, bool)
    if t in ("int", "long"):
        return isinstance(datum, int) and not isinstance(datum, bool)
    if t in ("float", "double"):
        return isinstance(datum, (int, float)) and not isinstance(datum, bool)
    if t in ("bytes", "fixed"):
        return isinstance(datum, (bytes, bytearray))
    if t in ("string", "enum"):
        return isinstance(datum, str)
    if t == "record":
        return isinstance(datum, dict)
    if t == "array":
        return isinstance(datum, list)
    if t == "map":
        return isinstance(datum, dict)
    return False


# --------------------------------------------------------------------------
# Container file: header, block index, read, write
# --------------------------------------------------------------------------

_META_SCHEMA = {"type": "map", "values": "bytes"}


def read_header(f) -> tuple[dict, str, bytes, int]:
    """Parse the container header → (schema, codec, sync, data_offset)."""
    if f.read(4) != MAGIC:
        raise ValueError("not an Avro object container file")
    meta = _read_datum(f, _META_SCHEMA, {})
    sync = f.read(16)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    return schema, codec, sync, f.tell()


def block_index(path: str) -> tuple[dict, str, bytes, list[tuple[int, int, int]]]:
    """Walk the container WITHOUT decoding records: returns
    (schema, codec, sync, [(byte_offset, n_records, byte_size), ...]).
    This is the planner-side scan — seek + skip only, so indexing cost is
    O(blocks), independent of record count or size."""
    blocks = []
    with open(path, "rb") as f:
        schema, codec, sync, pos = read_header(f)
        while True:
            start = f.tell()
            try:
                n = _read_varint(f)
            except EOFError:
                break
            size = _read_varint(f)
            f.seek(size, 1)
            if f.read(16) != sync:
                raise ValueError(f"sync marker mismatch at offset {start}")
            blocks.append((start, n, size))
    return schema, codec, sync, blocks


def _read_block_payload(path: str, codec: str, sync: bytes, offset: int):
    """Seek to a block and return (n_records, decompressed payload)."""
    with open(path, "rb") as f:
        f.seek(offset)
        n = _read_varint(f)
        size = _read_varint(f)
        payload = f.read(size)
        if f.read(16) != sync:
            raise ValueError(f"sync marker mismatch at offset {offset}")
    if codec == "deflate":
        payload = zlib.decompress(payload, -15)
    elif codec != "null":
        raise ValueError(f"unsupported codec {codec!r}")
    return n, payload


def read_block(path: str, schema, codec: str, sync: bytes, offset: int):
    """Decode one block's records, seeking straight to its offset."""
    names: dict = {}
    _register_names(schema, names)
    n, payload = _read_block_payload(path, codec, sync, offset)
    buf = io.BytesIO(payload)
    return [_read_datum(buf, schema, names) for _ in range(n)]


# --------------------------------------------------------------------------
# Compiled columnar block decode — the hot read path (guide §4.2: do the
# heavy lifting in tight native-ish code, move columns not rows). The
# generic _read_datum interpreter pays, per VALUE, a schema resolve, a
# type dispatch, and byte-at-a-time BytesIO reads (one method call + one
# bytes allocation per byte of varint); for the flat primitive records
# the replay sources serve, a per-schema compiled decoder over a plain
# bytes object with integer indexing decodes the same block ~10× faster
# and emits COLUMNS, which feed pyarrow directly without the
# list-of-dicts → from_pylist detour. Falls back to None (callers use
# the interpreter) for any schema outside the supported surface, so
# correctness never depends on this path.
# --------------------------------------------------------------------------

_COL_DECODER_MEMO: dict = {}


def _compile_field_decoder(ftype, names: dict):
    """field schema → f(payload: bytes, pos: int) -> (value, pos), or
    None when the type needs the generic interpreter."""
    ftype = _resolve(ftype, names)
    if isinstance(ftype, list):
        if len(ftype) == 2 and "null" in ftype:
            other = ftype[0] if ftype[1] == "null" else ftype[1]
            null_branch = ftype.index("null")
            inner = _compile_field_decoder(other, names)
            if inner is None:
                return None

            def dec_nullable(b, pos):
                v = b[pos]
                pos += 1
                if v & 0x80:  # branch index never needs >1 byte here
                    raise ValueError("bad union branch varint")
                if (v >> 1) ^ -(v & 1) == null_branch:
                    return None, pos
                return inner(b, pos)

            return dec_nullable
        return None
    t = ftype["type"] if isinstance(ftype, dict) else ftype
    if t in ("int", "long"):

        def dec_varint(b, pos):
            shift = acc = 0
            while True:
                v = b[pos]
                pos += 1
                acc |= (v & 0x7F) << shift
                if not v & 0x80:
                    return (acc >> 1) ^ -(acc & 1), pos
                shift += 7

        return dec_varint
    if t == "string":

        def dec_string(b, pos):
            shift = acc = 0
            while True:
                v = b[pos]
                pos += 1
                acc |= (v & 0x7F) << shift
                if not v & 0x80:
                    break
                shift += 7
            n = (acc >> 1) ^ -(acc & 1)
            return b[pos : pos + n].decode("utf-8"), pos + n

        return dec_string
    if t == "bytes":

        def dec_bytes(b, pos):
            shift = acc = 0
            while True:
                v = b[pos]
                pos += 1
                acc |= (v & 0x7F) << shift
                if not v & 0x80:
                    break
                shift += 7
            n = (acc >> 1) ^ -(acc & 1)
            return b[pos : pos + n], pos + n

        return dec_bytes
    if t == "double":
        unpack_d = struct.Struct("<d").unpack_from

        def dec_double(b, pos):
            return unpack_d(b, pos)[0], pos + 8

        return dec_double
    if t == "float":
        unpack_f = struct.Struct("<f").unpack_from

        def dec_float(b, pos):
            return unpack_f(b, pos)[0], pos + 4

        return dec_float
    if t == "boolean":

        def dec_bool(b, pos):
            return b[pos] == 1, pos + 1

        return dec_bool
    return None


def compile_block_columns_decoder(schema):
    """For a top-level record of compilable fields, return
    f(payload: bytes, n: int) -> {field: [values]}; None otherwise.
    Memoized per schema identity (the replay sources hold one schema
    object per container)."""
    key = id(schema)
    hit = _COL_DECODER_MEMO.get(key)
    if hit is not None and hit[0] is schema:
        return hit[1]
    names: dict = {}
    _register_names(schema, names)
    resolved = _resolve(schema, names)
    decoder = None
    if (
        isinstance(resolved, dict)
        and resolved.get("type") == "record"
    ):
        fields = [f["name"] for f in resolved["fields"]]
        decs = [
            _compile_field_decoder(f["type"], names)
            for f in resolved["fields"]
        ]
        if all(d is not None for d in decs):
            pairs = list(zip(fields, decs))

            def decode_columns(payload: bytes, n: int) -> dict:
                cols: dict = {name: [] for name, _ in pairs}
                appends = [(cols[name].append, dec) for name, dec in pairs]
                pos = 0
                for _ in range(n):
                    for append, dec in appends:
                        v, pos = dec(payload, pos)
                        append(v)
                return cols

            decoder = decode_columns
    _COL_DECODER_MEMO[key] = (schema, decoder)
    if len(_COL_DECODER_MEMO) > 64:
        _COL_DECODER_MEMO.pop(next(iter(_COL_DECODER_MEMO)))
    return decoder


def read_container(path: str) -> tuple[dict, list]:
    """Whole-file convenience read → (schema, records)."""
    schema, codec, sync, blocks = block_index(path)
    records = []
    for off, _n, _size in blocks:
        records.extend(read_block(path, schema, codec, sync, off))
    return schema, records


def write_container(
    path: str,
    schema: dict,
    records: list,
    codec: str = "null",
    records_per_block: int = 1000,
    sync: bytes = b"fink-spark-sync!",
) -> None:
    """Write an Object Container File (deterministic: fixed sync marker,
    fixed block packing) — the test-side producer standing in for the
    broker's Avro serializer."""
    assert len(sync) == 16
    names: dict = {}
    _register_names(schema, names)
    with open(path, "wb") as f:
        f.write(MAGIC)
        meta = {
            "avro.schema": json.dumps(schema).encode("utf-8"),
            "avro.codec": codec.encode("utf-8"),
        }
        _write_datum(f, meta, _META_SCHEMA, {})
        f.write(sync)
        for lo in range(0, len(records), records_per_block):
            chunk = records[lo : lo + records_per_block]
            buf = io.BytesIO()
            for r in chunk:
                _write_datum(buf, r, schema, names)
            payload = buf.getvalue()
            if codec == "deflate":
                c = zlib.compressobj(wbits=-15)
                payload = c.compress(payload) + c.flush()
            elif codec != "null":
                raise ValueError(f"unsupported codec {codec!r}")
            _write_varint(f, len(chunk))
            _write_varint(f, len(payload))
            f.write(payload)
            f.write(sync)


# --------------------------------------------------------------------------
# Bare-datum encoding — the Kafka-message-value shape: a broker delivers
# (key, value) where value is ONE binary-encoded record with the schema
# agreed out of band (schema registry). This is the payload `from_avro`
# decodes in the reference's consumer; the container framing above is
# the at-rest file shape.
# --------------------------------------------------------------------------


def encode_datum(datum, schema) -> bytes:
    """One record → its bare Avro binary encoding (no container)."""
    names: dict = {}
    _register_names(schema, names)
    buf = io.BytesIO()
    _write_datum(buf, datum, schema, names)
    return buf.getvalue()


def decode_datum(data: bytes, schema):
    """Bare Avro binary payload → Python datum (dicts for records)."""
    names: dict = {}
    _register_names(schema, names)
    return _read_datum(io.BytesIO(data), schema, names)


# --------------------------------------------------------------------------
# Avro schema → Spark StructType translation
# --------------------------------------------------------------------------


def to_spark_type(schema, names: dict | None = None):
    """Translate an Avro schema to the Spark type it decodes into —
    mirrors spark-avro's mapping for the supported surface (nullable
    unions [null, X] become nullable X)."""
    from pyspark.sql import types as T

    if names is None:
        names = {}
        _register_names(schema, names)
    schema = _resolve(schema, names)
    if isinstance(schema, list):
        branches = [s for s in schema if s != "null"]
        if len(branches) != 1:
            raise ValueError(f"only nullable unions supported, got {schema}")
        return to_spark_type(branches[0], names)
    t = schema["type"] if isinstance(schema, dict) else schema
    prim = {
        "boolean": T.BooleanType(),
        "int": T.IntegerType(),
        "long": T.LongType(),
        "float": T.FloatType(),
        "double": T.DoubleType(),
        "bytes": T.BinaryType(),
        "string": T.StringType(),
        "enum": T.StringType(),
        "fixed": T.BinaryType(),
    }
    if t in prim:
        return prim[t]
    if t == "record":
        return T.StructType(
            [
                T.StructField(
                    f["name"],
                    to_spark_type(f["type"], names),
                    nullable=_nullable(f["type"]),
                )
                for f in schema["fields"]
            ]
        )
    if t == "array":
        return T.ArrayType(
            to_spark_type(schema["items"], names),
            containsNull=_nullable(schema["items"]),
        )
    if t == "map":
        return T.MapType(
            T.StringType(),
            to_spark_type(schema["values"], names),
            valueContainsNull=_nullable(schema["values"]),
        )
    raise ValueError(f"unsupported Avro type {t!r}")


def _nullable(schema) -> bool:
    return isinstance(schema, list) and "null" in schema
