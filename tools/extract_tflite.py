"""Transcribe the reference's quantized TFLite artifact — NO tensorflow.

The reference ships ``quantized-model-GR-noZ-...-LL0.836.tflite`` (the
ELAsTiCC-era quantized model; unreferenced by current reference code —
completing the shipped-artifact inventory). TFLite models are
FlatBuffers (public format: https://flatbuffers.dev/ internals +
tensorflow/lite/schema/schema.fbs field ids); this module implements a
minimal generic FlatBuffer table walker with stdlib struct and decodes
the Model: operator codes, subgraph topology (tensors with shapes /
dtypes / quantization scale+zero-point, operator list with
input/output tensor ids), and every weight buffer.

FlatBuffer layout refresher (little-endian):
* root = uint32 offset to the root TABLE;
* a table starts with an int32 soffset BACK to its vtable; the vtable
  is [uint16 vtable_bytes, uint16 table_bytes, uint16 field_off...]
  where field_off is relative to the table start (0 = field absent);
* scalar fields live inline; strings/vectors/tables are uint32
  forward offsets from the field position; vectors are
  [uint32 len, elems...]; strings are byte vectors.
"""

from __future__ import annotations

import struct


class FB:
    def __init__(self, buf: bytes):
        self.buf = buf

    def u16(self, p):
        return struct.unpack_from("<H", self.buf, p)[0]

    def i32(self, p):
        return struct.unpack_from("<i", self.buf, p)[0]

    def u32(self, p):
        return struct.unpack_from("<I", self.buf, p)[0]

    def root(self) -> int:
        return self.u32(0)

    def field(self, table: int, idx: int) -> int | None:
        """Absolute position of field #idx of the table, or None."""
        vt = table - self.i32(table)
        vt_bytes = self.u16(vt)
        slot = 4 + 2 * idx
        if slot >= vt_bytes:
            return None
        off = self.u16(vt + slot)
        return table + off if off else None

    def scalar(self, table: int, idx: int, fmt: str, default=0):
        p = self.field(table, idx)
        return struct.unpack_from(fmt, self.buf, p)[0] if p is not None else default

    def indirect(self, table: int, idx: int) -> int | None:
        p = self.field(table, idx)
        return p + self.u32(p) if p is not None else None

    def vector(self, table: int, idx: int):
        """(elements_start, length) of a vector field, or None."""
        v = self.indirect(table, idx)
        if v is None:
            return None
        return v + 4, self.u32(v)

    def vec_i32(self, table: int, idx: int) -> list[int] | None:
        v = self.vector(table, idx)
        if v is None:
            return None
        p, n = v
        return list(struct.unpack_from(f"<{n}i", self.buf, p))

    def vec_f32(self, table: int, idx: int) -> list[float] | None:
        v = self.vector(table, idx)
        if v is None:
            return None
        p, n = v
        return list(struct.unpack_from(f"<{n}f", self.buf, p))

    def vec_i64(self, table: int, idx: int) -> list[int] | None:
        v = self.vector(table, idx)
        if v is None:
            return None
        p, n = v
        return list(struct.unpack_from(f"<{n}q", self.buf, p))

    def vec_bytes(self, table: int, idx: int) -> bytes | None:
        v = self.vector(table, idx)
        if v is None:
            return None
        p, n = v
        return self.buf[p : p + n]

    def vec_tables(self, table: int, idx: int) -> list[int]:
        v = self.vector(table, idx)
        if v is None:
            return []
        p, n = v
        return [p + 4 * k + self.u32(p + 4 * k) for k in range(n)]

    def string(self, table: int, idx: int) -> str | None:
        b = self.vec_bytes(table, idx)
        return b.decode("utf-8") if b is not None else None


# tflite schema.fbs TensorType enum
TENSOR_TYPES = {
    0: "float32", 1: "float16", 2: "int32", 3: "uint8", 4: "int64",
    5: "string", 6: "bool", 7: "int16", 8: "complex64", 9: "int8",
    10: "float64", 17: "int4",
}

# BuiltinOperator enum (tensorflow/lite/schema/schema.fbs declaration
# order — the subset this model and its peers use)
BUILTIN_OPS = {
    0: "ADD", 1: "AVERAGE_POOL_2D", 2: "CONCATENATION", 3: "CONV_2D",
    4: "DEPTHWISE_CONV_2D", 6: "DEQUANTIZE", 9: "FULLY_CONNECTED",
    14: "LOGISTIC", 16: "LSTM", 17: "MAX_POOL_2D", 18: "MUL",
    19: "RELU", 21: "RELU6", 22: "RESHAPE", 25: "SOFTMAX", 28: "TANH",
    34: "PAD", 36: "GATHER", 39: "TRANSPOSE", 40: "MEAN", 41: "SUB",
    42: "DIV", 43: "SQUEEZE", 44: "UNIDIRECTIONAL_SEQUENCE_LSTM",
    45: "STRIDED_SLICE", 53: "CAST", 55: "MAXIMUM", 57: "MINIMUM",
    65: "SLICE", 70: "EXPAND_DIMS", 74: "SUM", 75: "SQRT",
    76: "RSQRT", 77: "SHAPE", 78: "POW", 81: "REDUCE_PROD",
    82: "REDUCE_MAX", 83: "PACK", 88: "UNPACK", 92: "SQUARE",
    98: "LEAKY_RELU", 99: "SQUARED_DIFFERENCE", 101: "ABS",
    102: "SPLIT_V", 106: "ADD_N", 107: "GATHER_ND", 114: "QUANTIZE",
    117: "HARD_SWISH", 118: "IF", 119: "WHILE", 125: "SEGMENT_SUM",
    126: "BATCH_MATMUL", 128: "CUMSUM", 129: "CALL_ONCE",
    130: "BROADCAST_TO", 140: "REDUCE_ALL", 142: "VAR_HANDLE",
    143: "READ_VARIABLE", 144: "ASSIGN_VARIABLE",
}


def parse_tflite(buf: bytes) -> dict:
    fb = FB(buf)
    model = fb.root()
    # Model fields: 0 version, 1 operator_codes, 2 subgraphs,
    # 3 description, 4 buffers
    version = fb.scalar(model, 0, "<I")
    opcodes = []
    for t in fb.vec_tables(model, 1):
        dep = fb.scalar(t, 0, "<b")  # deprecated_builtin_code int8
        new = fb.scalar(t, 3, "<i", default=None) if fb.field(t, 3) else None
        code = new if new not in (None, 0) else dep
        opcodes.append(BUILTIN_OPS.get(code, f"OP_{code}"))
    buffers = []
    for t in fb.vec_tables(model, 4):
        buffers.append(fb.vec_bytes(t, 0))
    graphs = []
    for g in fb.vec_tables(model, 2):
        tensors = []
        for tt in fb.vec_tables(g, 0):
            # Tensor: 0 shape, 1 type, 2 buffer, 3 name, 4 quantization
            quant = None
            qtab = fb.indirect(tt, 4)
            if qtab is not None:
                scale = fb.vec_f32(qtab, 2)
                zp = fb.vec_i64(qtab, 3)
                if scale or zp:
                    quant = {"scale": scale, "zero_point": zp}
            tensors.append(
                {
                    "shape": fb.vec_i32(tt, 0) or [],
                    "dtype": TENSOR_TYPES.get(
                        fb.scalar(tt, 1, "<b"), "unknown"
                    ),
                    "buffer": fb.scalar(tt, 2, "<I"),
                    "name": fb.string(tt, 3),
                    "quant": quant,
                }
            )
        ops = []
        for ot in fb.vec_tables(g, 3):
            op = {
                "op": opcodes[fb.scalar(ot, 0, "<I")],
                "inputs": fb.vec_i32(ot, 1) or [],
                "outputs": fb.vec_i32(ot, 2) or [],
            }
            # Operator field 4 = builtin_options (union table); the
            # fused_activation_function enum (0 NONE, 1 RELU, 2 RELU_N1,
            # 3 RELU6, 4 TANH) sits at field 0 of FullyConnectedOptions
            # and field 3 of Conv2DOptions
            opts = fb.indirect(ot, 4)
            if opts is not None:
                if op["op"] == "FULLY_CONNECTED":
                    op["fused_activation"] = fb.scalar(opts, 0, "<b")
                elif op["op"] in ("CONV_2D", "DEPTHWISE_CONV_2D"):
                    op["padding"] = fb.scalar(opts, 0, "<b")
                    op["fused_activation"] = fb.scalar(opts, 3, "<b")
                elif op["op"] == "SOFTMAX":
                    op["beta"] = fb.scalar(opts, 0, "<f", default=1.0)
            ops.append(op)
        graphs.append(
            {
                "tensors": tensors,
                "inputs": fb.vec_i32(g, 1) or [],
                "outputs": fb.vec_i32(g, 2) or [],
                "operators": ops,
                "name": fb.string(g, 4),
            }
        )
    return {"version": version, "opcodes": opcodes, "buffers": buffers, "subgraphs": graphs}


T2_PATH = (
    "/root/reference/fink_science/data/models/"
    "quantized-model-GR-noZ-28341-1654269564-0.5.1.dev73+g70f85f8"
    "-LL0.836.tflite"
)

# checkpoint name -> unique substring of the flatbuffer tensor name
T2_TENSORS = {
    "conv_w": "conv_embedding/conv1d/Conv1D",  # [32,1,1,2] f32
    "conv_b": "conv_embedding/conv1d/BiasAdd",
    "pos": "Const",  # [1,100,32] positional encoding
    "wq": "attention/dense/Tensordot/MatMul",  # int8 [32,32]
    "bq": "attention/dense/BiasAdd",
    "wk": "attention/dense_1/Tensordot/MatMul",
    "bk": "attention/dense_1/BiasAdd",
    "wv": "attention/dense_2/Tensordot/MatMul",
    "bv": "attention/dense_2/BiasAdd",
    "wo": "attention/dense_3/Tensordot/MatMul",
    "bo": "attention/dense_3/BiasAdd",
    "ln1_gamma": "layer_normalization/batchnorm/mul/ReadVariable",
    "ln1_beta": "layer_normalization/batchnorm/ReadVariableOp",
    "ln2_gamma": "layer_normalization_1/batchnorm/mul/ReadVariab",
    "ln2_beta": "layer_normalization_1/batchnorm/ReadVariableOp",
    "w_ffn1": "dense_4/Tensordot/MatMul",  # int8 [128,32]
    "b_ffn1": "dense_4/BiasAdd",
    "w_ffn2": "dense_5/Tensordot/MatMul",  # int8 [32,128]
    "b_ffn2": "dense_5/BiasAdd",
    "w_out": "cluster_dense_6/MatMul",  # f32 [14,32] (clustered)
    "b_out": "cluster_dense_6/BiasAdd",
    "attn_scale": "truediv",  # 1/sqrt(head_dim)
    "ln_eps": "layer_normalization/batchnorm/add/y",
}


def to_checkpoint(m: dict) -> dict:
    """The T2 weights + structure as the engine checkpoint (int8
    tensors dequantized at transcription time with their per-tensor
    symmetric scales — zero_point 0 verified)."""
    import numpy as np

    g = m["subgraphs"][0]

    def find(sub: str):
        hits = [
            t
            for t in g["tensors"]
            if t["name"]
            and sub in t["name"]
            and m["buffers"][t["buffer"]]
        ]
        if len(hits) > 1:  # disambiguate: exact suffix wins
            exact = [t for t in hits if t["name"].endswith(sub)]
            hits = exact or hits
        if sub == "Const":  # several names contain it; want exact
            hits = [t for t in hits if t["name"] == "Const"]
        assert len(hits) == 1, (sub, [t["name"] for t in hits])
        t = hits[0]
        raw = m["buffers"][t["buffer"]]
        if t["dtype"] == "float32":
            arr = np.frombuffer(raw, dtype="<f4").astype(np.float64)
        elif t["dtype"] == "int8":
            q = t["quant"]
            assert q and len(q["scale"]) == 1
            assert not q["zero_point"] or set(q["zero_point"]) == {0}
            arr = np.frombuffer(raw, dtype=np.int8).astype(
                np.float64
            ) * float(q["scale"][0])
        else:
            raise ValueError(t["dtype"])
        return arr.reshape(t["shape"] or []).tolist()

    ckpt = {
        "kind": "t2_transformer",
        "source": T2_PATH.rsplit("/", 1)[-1],
        "n_classes": 14,
        "seq_len": 100,
        "embed_dim": 32,
        "num_heads": 16,
        "head_dim": 2,
        "ffn_dim": 128,
    }
    for k, sub in T2_TENSORS.items():
        ckpt[k] = find(sub)
    return ckpt


if __name__ == "__main__":
    import gzip
    import json
    import sys

    path = sys.argv[1] if len(sys.argv) > 1 else T2_PATH
    with open(path, "rb") as f:
        m = parse_tflite(f.read())
    g = m["subgraphs"][0]
    print("version:", m["version"], "subgraphs:", len(m["subgraphs"]))
    print("ops:", [o["op"] for o in g["operators"]])
    print("inputs:", [(g['tensors'][i]['name'], g['tensors'][i]['shape'], g['tensors'][i]['dtype']) for i in g["inputs"]])
    print("outputs:", [(g['tensors'][i]['name'], g['tensors'][i]['shape'], g['tensors'][i]['dtype']) for i in g["outputs"]])
    n_weights = sum(1 for t in g["tensors"] if m["buffers"][t["buffer"]])
    total = sum(len(m["buffers"][t["buffer"]] or b"") for t in g["tensors"])
    print(f"{len(g['tensors'])} tensors, {n_weights} with weight data, {total} weight bytes")
    ckpt = to_checkpoint(m)
    out = "/root/repo/fink_science_spark/data/t2_tflite.json.gz"
    with gzip.open(out, "wt") as f:
        json.dump(ckpt, f)
    print("wrote", out)
