"""Transcribe the reference's XGBoost joblib artifact into an engine
checkpoint — NO xgboost/joblib/sklearn import.

The superluminous classifier (reference ztf/superluminous/kernel.py:21,
processor.py:226-233) is an ``XGBClassifier`` pickled by joblib. The
pickle itself stub-unpickles with tools/extract_sklearn_models.py; the
booster rides inside it as ``_Booster.handle`` — the bytes of
``Booster.save_raw()`` in XGBoost's public UBJSON model format
(https://xgboost.readthedocs.io/en/stable/tutorials/saving_model.html;
UBJSON spec: https://ubjson.org). This module decodes that format with
stdlib struct only and emits the engine checkpoint: per-tree arrays
(split feature, float32 threshold, left/right children, default-left
routing for missing values, leaf values in split_conditions at leaves),
the learner base_score, objective, feature names, and the pickled
estimator's custom ``optimal_threshold``.
"""

from __future__ import annotations

import struct
import sys


def ubjson_decode(buf: bytes, pos: int = 0):
    """Minimal UBJSON decoder (spec draft 12, the subset XGBoost emits:
    i U I l L d D C S T F Z { [ with $-type / #-count optimizations)."""
    val, pos = _decode(buf, pos)
    return val


_INT_FMT = {
    ord("i"): ("b", 1),
    ord("U"): ("B", 1),
    ord("I"): (">h", 2),
    ord("l"): (">i", 4),
    ord("L"): (">q", 8),
}


def _decode_int(buf: bytes, pos: int):
    m = buf[pos]
    fmt, size = _INT_FMT[m]
    return struct.unpack_from(fmt, buf, pos + 1)[0], pos + 1 + size


def _decode(buf: bytes, pos: int, marker: int | None = None):
    if marker is None:
        marker = buf[pos]
        pos += 1
    if marker in _INT_FMT:
        fmt, size = _INT_FMT[marker]
        return struct.unpack_from(fmt, buf, pos)[0], pos + size
    if marker == ord("d"):
        return struct.unpack_from(">f", buf, pos)[0], pos + 4
    if marker == ord("D"):
        return struct.unpack_from(">d", buf, pos)[0], pos + 8
    if marker == ord("C"):
        return chr(buf[pos]), pos + 1
    if marker == ord("S"):
        n, pos = _decode_int(buf, pos)
        return buf[pos : pos + n].decode("utf-8"), pos + n
    if marker == ord("T"):
        return True, pos
    if marker == ord("F"):
        return False, pos
    if marker == ord("Z"):
        return None, pos
    if marker == ord("["):
        return _decode_array(buf, pos)
    if marker == ord("{"):
        return _decode_object(buf, pos)
    raise ValueError(f"ubjson: unknown marker {chr(marker)!r} at {pos - 1}")


def _container_header(buf: bytes, pos: int):
    elem_type = None
    count = None
    if buf[pos] == ord("$"):
        elem_type = buf[pos + 1]
        pos += 2
    if buf[pos] == ord("#"):
        count, pos = _decode_int(buf, pos + 1)
    elif elem_type is not None:
        raise ValueError("ubjson: $ without #")
    return elem_type, count, pos


def _decode_array(buf: bytes, pos: int):
    elem_type, count, pos = _container_header(buf, pos)
    out = []
    if count is not None:
        # fast path for typed numeric arrays (the bulk of the model)
        if elem_type in _INT_FMT or elem_type in (ord("d"), ord("D")):
            if elem_type in _INT_FMT:
                fmt, size = _INT_FMT[elem_type]
                ch = fmt[-1]
            elif elem_type == ord("d"):
                ch, size = "f", 4
            else:
                ch, size = "d", 8
            vals = struct.unpack_from(">" + ch * count, buf, pos)
            return list(vals), pos + size * count
        for _ in range(count):
            v, pos = _decode(buf, pos, elem_type)
            out.append(v)
        return out, pos
    while buf[pos] != ord("]"):
        v, pos = _decode(buf, pos)
        out.append(v)
    return out, pos + 1


def _decode_object(buf: bytes, pos: int):
    elem_type, count, pos = _container_header(buf, pos)
    out = {}
    if count is not None:
        for _ in range(count):
            n, pos = _decode_int(buf, pos)
            key = buf[pos : pos + n].decode("utf-8")
            pos += n
            v, pos = _decode(buf, pos, elem_type)
            out[key] = v
        return out, pos
    while buf[pos] != ord("}"):
        n, pos = _decode_int(buf, pos)
        key = buf[pos : pos + n].decode("utf-8")
        pos += n
        v, pos = _decode(buf, pos)
        out[key] = v
    return out, pos + 1


def load_xgb_joblib(path: str) -> dict:
    """Stub-unpickle the joblib, decode the UBJSON booster, return the
    engine checkpoint dict."""
    sys.path.insert(0, "/root/repo/tools")
    from extract_sklearn_models import load_sklearn_pickle

    clf = load_sklearn_pickle(path)
    raw = bytes(clf.__dict__["_Booster"].__dict__["handle"].__dict__["_args"][0])
    model = ubjson_decode(raw)
    # Booster.__getstate__ wraps {"Config": ..., "Model": <save_raw>}
    # in recent xgboost; save_raw itself is {"learner": ..., "version": ...}
    if "Model" in model:
        learner = ubjson_decode(bytes(model["Model"]))["learner"] if isinstance(model["Model"], (bytes, bytearray)) else model["Model"]["learner"]
    else:
        learner = model["learner"]
    gbm = learner["gradient_booster"]["model"]
    trees = []
    for t in gbm["trees"]:
        trees.append(
            {
                "feature": [int(v) for v in t["split_indices"]],
                "threshold": [float(v) for v in t["split_conditions"]],
                "left": [int(v) for v in t["left_children"]],
                "right": [int(v) for v in t["right_children"]],
                "default_left": [int(v) for v in t["default_left"]],
            }
        )
    lmp = learner["learner_model_param"]
    return {
        "kind": "xgb_binary_logistic",
        "source": path.rsplit("/", 1)[-1],
        "objective": learner["objective"]["name"],
        "base_score": float(lmp["base_score"]),
        "n_features": int(lmp["num_feature"]),
        "feature_names": list(learner.get("feature_names") or []),
        "optimal_threshold": float(clf.__dict__["optimal_threshold"]),
        "trees": trees,
    }


if __name__ == "__main__":
    import gzip
    import json

    src = (
        "/root/reference/fink_science/data/models/"
        "superluminous_classifier.joblib"
    )
    ckpt = load_xgb_joblib(src)
    print(
        "objective:", ckpt["objective"],
        "base_score:", ckpt["base_score"],
        "n_features:", ckpt["n_features"],
        "n_trees:", len(ckpt["trees"]),
        "opt_thr:", ckpt["optimal_threshold"],
    )
    print("feature_names:", ckpt["feature_names"])
    out = "/root/repo/fink_science_spark/data/superluminous_xgb.json.gz"
    with gzip.open(out, "wt") as f:
        json.dump(ckpt, f)
    print("wrote", out)
