"""Transcribe the reference's REAL SuperNNova LSTM weights into the
engine's checkpoint artifact.

The reference scores `snn_snia_vs_nonia` with a trained torch model
(ztf/snn/processor.py:84-210, artifact
data/models/snn_models/snn_snia_vs_nonia/model.pt). The .pt file is the
LEGACY torch serialization format (not the zip container): four pickle
streams (magic, protocol, sys_info, the object) followed by a pickled
list of storage keys and, per key, an int64 element count plus the raw
little-endian storage bytes. Nothing in it needs torch: a stdlib
`pickle.Unpickler` with `persistent_load` + `find_class` shims and
`numpy.frombuffer` reads it bit-exactly (the layout is public torch
serialization behavior).

The object inside is a plain `state_dict` (OrderedDict of tensor refs):
a 2-layer bidirectional LSTM, hidden 32, input 8, plus a Linear(64, 2)
head — SuperNNova's vanilla RNN for the snia-vs-nonia task
(cli_args.json: layer_type=lstm, hidden_dim=32, num_layers=2,
bidirectional=true, rnn_output_option=mean, redshift=none).

Output: fink_science_spark/data/snn_snia_vs_nonia_lstm.json with each
tensor as {shape, dtype, base64(little-endian bytes)} — bit-exact and
diffable — alongside the model's data_norm.json constants verbatim.

Usage: python tools/extract_snn_weights.py [model_dir] [out_json]
"""

from __future__ import annotations

import base64
import json
import os
import pickle
import struct
import sys

import numpy as np

DEFAULT_MODEL_DIR = (
    "/root/reference/fink_science/data/models/snn_models/snn_snia_vs_nonia"
)
DEFAULT_OUT = os.path.join(
    os.path.dirname(__file__),
    "..",
    "fink_science_spark",
    "data",
    "snn_snia_vs_nonia_lstm.json",
)

_STORAGE_DTYPES = {
    "FloatStorage": "<f4",
    "DoubleStorage": "<f8",
    "HalfStorage": "<f2",
    "LongStorage": "<i8",
    "IntStorage": "<i4",
    "ShortStorage": "<i2",
    "CharStorage": "<i1",
    "ByteStorage": "<u1",
    "BoolStorage": "<u1",
}


class _StorageRef:
    def __init__(self, key: str, dtype: str, numel: int):
        self.key, self.dtype, self.numel = key, dtype, numel


class _TensorRef:
    def __init__(self, storage, offset, size, stride):
        self.storage = storage
        self.offset = offset
        self.size = tuple(size)
        self.stride = tuple(stride)


def _rebuild_tensor_v2(storage, offset, size, stride, *ignored):
    return _TensorRef(storage, offset, size, stride)


def load_torch_legacy(path: str) -> dict[str, np.ndarray]:
    """Read a legacy (non-zip) torch checkpoint holding a state_dict,
    with stdlib pickle + numpy only. Returns name -> contiguous ndarray."""
    with open(path, "rb") as f:

        class _U(pickle.Unpickler):
            def find_class(self, mod, name):
                if mod == "collections" and name == "OrderedDict":
                    import collections

                    return collections.OrderedDict
                if name == "_rebuild_tensor_v2":
                    return _rebuild_tensor_v2
                if name in _STORAGE_DTYPES:
                    return name  # dtype marker delivered to persistent_load
                # inert shim for anything else (e.g. _rebuild_parameter)
                return type(
                    name,
                    (object,),
                    {
                        "__init__": lambda s, *a, **k: None,
                        "__setstate__": lambda s, st: None,
                    },
                )

            def persistent_load(self, pid):
                tag, styp, key, _loc, numel = pid[0], pid[1], pid[2], pid[3], pid[4]
                assert tag == "storage", pid
                tname = styp if isinstance(styp, str) else type(styp).__name__
                return _StorageRef(key, _STORAGE_DTYPES[tname], numel)

        for _ in range(3):  # magic number, protocol version, sys_info
            _U(f).load()
        sd = _U(f).load()
        keys = _U(f).load()
        dtype_of = {t.storage.key: t.storage.dtype for t in sd.values()}
        arrays: dict[str, np.ndarray] = {}
        for k in keys:
            (numel,) = struct.unpack("<q", f.read(8))
            dt = np.dtype(dtype_of[k])
            arrays[k] = np.frombuffer(f.read(numel * dt.itemsize), dtype=dt)
        assert f.read() == b"", "trailing bytes after storage section"
    out = {}
    for name, t in sd.items():
        a = arrays[t.storage.key]
        v = np.lib.stride_tricks.as_strided(
            a[t.offset :],
            shape=t.size,
            strides=tuple(s * a.itemsize for s in t.stride),
        )
        out[name] = np.ascontiguousarray(v)
    return out


def main(model_dir: str = DEFAULT_MODEL_DIR, out_json: str = DEFAULT_OUT):
    tensors = load_torch_legacy(os.path.join(model_dir, "model.pt"))
    with open(os.path.join(model_dir, "data_norm.json")) as f:
        data_norm = json.load(f)
    art = {
        "source": (
            "transcribed from the public fink-science reference artifact "
            "data/models/snn_models/snn_snia_vs_nonia/{model.pt,"
            "data_norm.json} (ztf/snn/processor.py:84-210); legacy torch "
            "format read with stdlib pickle + numpy"
        ),
        "arch": {
            "layer_type": "lstm",
            "input_dim": 8,
            "hidden_dim": 32,
            "num_layers": 2,
            "bidirectional": True,
            "rnn_output_option": "mean",
            "nb_classes": 2,
            "features": [
                "FLUXCAL_g",
                "FLUXCAL_r",
                "FLUXCALERR_g",
                "FLUXCALERR_r",
                "delta_time",
                "g",
                "gr",
                "r",
            ],
        },
        "data_norm": data_norm,
        "tensors": {
            name: {
                "shape": list(a.shape),
                "dtype": str(a.dtype),
                "b64": base64.b64encode(
                    np.ascontiguousarray(a, dtype=a.dtype).tobytes()
                ).decode("ascii"),
            }
            for name, a in tensors.items()
        },
    }
    out_json = os.path.normpath(out_json)
    with open(out_json, "w") as f:
        json.dump(art, f, indent=1, sort_keys=True)
    print(f"wrote {out_json}: {len(tensors)} tensors, "
          f"{sum(a.size for a in tensors.values())} params")


if __name__ == "__main__":
    main(*sys.argv[1:])
