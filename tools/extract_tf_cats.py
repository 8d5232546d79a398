"""Transcribe the reference's CATS TensorFlow SavedModel weights into an
engine checkpoint — with NO tensorflow import.

The artifact (data/models/cats_models/cats_small_nometa_serial_219_
savedmodel, loaded by rubin/cats/processor.py:36-38 via TFSMLayer) is a
TF2 SavedModel: weights live in a TensorBundle (variables.index is a
leveldb-style SSTable of BundleEntryProto records; variables.data holds
the raw little-endian tensors) and the architecture is the Keras model
config JSON embedded in keras_metadata.pb. All three formats are public:

* SSTable: prefix-compressed records, restart array, 48-byte footer
  with varint BlockHandles and the 0xdb4775248b80fb57 magic.
* BundleEntryProto: dtype/shape/shard/offset/size fields, varint-tagged.
* The checkpoint object graph (the `_CHECKPOINTABLE_OBJECT_GRAPH` string
  tensor, a TrackableObjectGraph proto) maps every checkpoint key to its
  canonical variable name (e.g. `bidirectional_4/forward_lstm_4/
  lstm_cell/kernel`) — so the forward/backward LSTM weight assignment is
  read off the artifact, not guessed.

Architecture (from keras_metadata.pb, verified against weight shapes):
input (395, 4) ->
  conv branch: 3 x [Conv1D(k=2, same) -> BatchNorm(eps 1e-3) -> swish ->
               SE block (GlobalAvgPool -> Dense r relu -> Dense C sigmoid
               -> Multiply)] with C = 64, 128, 256 -> GlobalMaxPool -> 256
  recurrent branch: biLSTM(50, seq) -> biLSTM(150) -> 300
  concat [lstm 300, conv 256] -> Dense(176) -> LeakyReLU(0.3) ->
  Dense(5, softmax)

Usage: python tools/extract_tf_cats.py [savedmodel_dir] [out_json_gz]
"""

from __future__ import annotations

import base64
import collections
import gzip
import json
import os
import struct
import sys

import numpy as np

MODEL_DIR = (
    "/root/reference/fink_science/data/models/cats_models/"
    "cats_small_nometa_serial_219_savedmodel"
)
OUT = os.path.join(
    os.path.dirname(__file__),
    "..",
    "fink_science_spark",
    "data",
    "cats_model.json.gz",
)

SSTABLE_MAGIC = 0xDB4775248B80FB57


def _rv(buf, pos):
    r = 0
    s = 0
    while True:
        b = buf[pos]
        pos += 1
        r |= (b & 0x7F) << s
        if not b & 0x80:
            return r, pos
        s += 7


def _fields(buf):
    """Minimal protobuf walker: yields (field, value) — int for varint /
    fixed, bytes for length-delimited."""
    if not isinstance(buf, (bytes, memoryview)):
        return
    pos = 0
    while pos < len(buf):
        tag, pos = _rv(buf, pos)
        f, wt = tag >> 3, tag & 7
        if wt == 0:
            v, pos = _rv(buf, pos)
            yield f, v
        elif wt == 2:
            ln, pos = _rv(buf, pos)
            yield f, buf[pos : pos + ln]
            pos += ln
        elif wt == 5:
            yield f, struct.unpack("<I", buf[pos : pos + 4])[0]
            pos += 4
        elif wt == 1:
            yield f, struct.unpack("<Q", buf[pos : pos + 8])[0]
            pos += 8
        else:
            raise ValueError(f"wire type {wt}")


def _sstable_entries(d: bytes) -> dict[bytes, bytes]:
    """All key->value records of a (single-level) SSTable index file."""
    assert struct.unpack("<Q", d[-8:])[0] == SSTABLE_MAGIC
    fo = len(d) - 48
    _mo, p = _rv(d, fo)
    _ms, p = _rv(d, p)
    io_, p = _rv(d, p)
    isz, p = _rv(d, p)

    def records(blk):
        nrest = struct.unpack("<I", blk[-4:])[0]
        end = len(blk) - 4 * (nrest + 1)
        pos = 0
        prev = b""
        out = []
        while pos < end:
            sh, pos = _rv(blk, pos)
            nsh, pos = _rv(blk, pos)
            vl, pos = _rv(blk, pos)
            key = prev[:sh] + blk[pos : pos + nsh]
            pos += nsh
            out.append((key, blk[pos : pos + vl]))
            pos += vl
            prev = key
        return out

    entries: dict[bytes, bytes] = {}
    for key, val in records(d[io_ : io_ + isz]):
        o, pp = _rv(val, 0)
        s, pp = _rv(val, pp)
        entries.update(records(d[o : o + s]))
    return entries


def _bundle_entry(v: bytes):
    dt = None
    shape = []
    off = 0
    size = 0
    for f, val in _fields(v):
        if f == 1:
            dt = val
        elif f == 2:
            for f2, v2 in _fields(val):
                if f2 == 2:
                    for f3, v3 in _fields(v2):
                        if f3 == 1:
                            shape.append(v3)
        elif f == 4:
            off = val
        elif f == 5:
            size = val
    return dt, shape, off, size


def _object_graph_names(entries, data) -> dict[str, str]:
    """checkpoint key -> canonical variable full_name, from the
    TrackableObjectGraph stored as a string tensor."""
    dt, _shape, off, size = _bundle_entry(
        entries[b"_CHECKPOINTABLE_OBJECT_GRAPH"]
    )
    raw = data[off : off + size]
    ln, pos = _rv(raw, 0)
    og = raw[pos + 4 : pos + 4 + ln]  # 4-byte crc32c of lengths, then bytes
    nodes = [v for f, v in _fields(og) if f == 1]
    keymap = {}
    for n in nodes:
        for f, v in _fields(n):
            if f == 2 and isinstance(v, bytes):
                fn = ck = None
                for f2, v2 in _fields(v):
                    if f2 == 2 and isinstance(v2, bytes):
                        fn = v2.decode()
                    elif f2 == 3 and isinstance(v2, bytes):
                        ck = v2.decode()
                if ck and fn:
                    keymap[ck] = fn
    return keymap


def load_savedmodel_weights(model_dir: str) -> dict[str, np.ndarray]:
    """full_name (or layer_with_weights path) -> float32 array."""
    idx = open(
        os.path.join(model_dir, "variables", "variables.index"), "rb"
    ).read()
    data = open(
        os.path.join(model_dir, "variables", "variables.data-00000-of-00001"),
        "rb",
    ).read()
    entries = _sstable_entries(idx)
    names = _object_graph_names(entries, data)
    out = {}
    for k, v in entries.items():
        key = k.decode()
        if key in ("", "_CHECKPOINTABLE_OBJECT_GRAPH"):
            continue
        dt, shape, off, size = _bundle_entry(v)
        if dt != 1:  # float32 tensors only (the model has nothing else)
            continue
        arr = np.frombuffer(data[off : off + size], dtype="<f4").reshape(shape)
        name = names.get(key, key.replace("/.ATTRIBUTES/VARIABLE_VALUE", ""))
        out[name] = arr
    return out


# variable full_name (canonical Keras layer name, from the checkpoint
# object graph) -> checkpoint alias; layer roles per the functional
# config in keras_metadata.pb (inbound_nodes connectivity).
LAYER_MAP = {
    "conv1": "conv1d_7",
    "bn1": "batch_normalization_7",
    "se1_reduce": "dense_17",
    "se1_expand": "dense_18",
    "conv2": "conv1d_8",
    "bn2": "batch_normalization_8",
    "se2_reduce": "dense_19",
    "se2_expand": "dense_20",
    "conv3": "conv1d_9",
    "bn3": "batch_normalization_9",
    "se3_reduce": "dense_21",
    "se3_expand": "dense_22",
    "head": "dense_23",
    "out": "dense_24",
}
LSTM_MAP = {
    "lstm1_fwd": "bidirectional_4/forward_lstm_4/lstm_cell",
    "lstm1_bwd": "bidirectional_4/backward_lstm_4/lstm_cell",
    "lstm2_fwd": "bidirectional_5/forward_lstm_5/lstm_cell",
    "lstm2_bwd": "bidirectional_5/backward_lstm_5/lstm_cell",
}


def main(model_dir: str = MODEL_DIR, out: str = OUT):
    raw = load_savedmodel_weights(model_dir)

    def b64(a):
        return {
            "shape": list(a.shape),
            "dtype": str(a.dtype),
            "b64": base64.b64encode(np.ascontiguousarray(a).tobytes()).decode(),
        }

    tensors = {}
    for alias, path in LAYER_MAP.items():
        for attr in ("kernel", "bias", "gamma", "beta", "moving_mean",
                     "moving_variance"):
            k = f"{path}/{attr}"
            if k in raw:
                tensors[f"{alias}/{attr}"] = b64(raw[k])
    for alias, path in LSTM_MAP.items():
        for attr in ("kernel", "recurrent_kernel", "bias"):
            tensors[f"{alias}/{attr}"] = b64(raw[f"{path}/{attr}"])
    # shape sanity (the architecture contract the kernel relies on)
    expect = {
        "conv1/kernel": [2, 4, 64],
        "conv2/kernel": [2, 64, 128],
        "conv3/kernel": [2, 128, 256],
        "se3_reduce/kernel": [256, 16],
        "lstm1_fwd/kernel": [4, 200],
        "lstm2_fwd/kernel": [100, 600],
        "head/kernel": [556, 176],
        "out/kernel": [176, 5],
    }
    for k, shp in expect.items():
        assert tensors[k]["shape"] == shp, (k, tensors[k]["shape"])
    art = {
        "source": (
            "transcribed from the public fink-science reference artifact "
            "data/models/cats_models/cats_small_nometa_serial_219_"
            "savedmodel (rubin/cats/processor.py:36-38); TensorBundle + "
            "TrackableObjectGraph + keras_metadata.pb read with stdlib "
            "struct/numpy"
        ),
        "arch": {
            "input": [395, 4],
            "conv_blocks": [
                {"filters": 64, "se": 4},
                {"filters": 128, "se": 8},
                {"filters": 256, "se": 16},
            ],
            "kernel_size": 2,
            "padding": "same",
            "bn_eps": 0.001,
            "conv_activation": "swish",
            "lstm_units": [50, 150],
            "lstm_activation": "tanh",
            "lstm_recurrent_activation": "sigmoid",
            "concat_order": ["lstm", "conv_maxpool"],
            "head_units": 176,
            "leaky_relu_alpha": 0.30000001192092896,
            "classes": [
                "SN-like",
                "Fast",
                "Long",
                "Periodic",
                "non-Periodic (AGN)",
            ],
        },
        "tensors": tensors,
    }
    out = os.path.normpath(out)
    with gzip.open(out, "wt") as f:
        json.dump(art, f)
    n = sum(int(np.prod(t["shape"])) for t in tensors.values())
    print(f"wrote {out}: {len(tensors)} tensors, {n} params "
          f"({os.path.getsize(out)//1024} KB)")


if __name__ == "__main__":
    main(*sys.argv[1:])
