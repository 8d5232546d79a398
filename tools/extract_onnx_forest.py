"""Transcribe the reference's ONNX anomaly-detection forests into engine
checkpoints — with NO onnx import.

The artifacts (data/models/anomaly_detection/anomaly_detection_forest_
AAD_beta.zip -> forest_{g,r}_AAD_beta.onnx; consumed by
ztf/anomaly_detection/processor.py:92-133 via onnxruntime) are ONNX
ModelProto messages whose graph holds ONE ai.onnx.ml
TreeEnsembleRegressor node. Protobuf wire format is public and simple —
varint tags, length-delimited submessages — and the tree ensemble is
just parallel attribute arrays (nodes_treeids / nodes_nodeids /
nodes_featureids / nodes_values / nodes_modes / nodes_truenodeids /
nodes_falsenodeids, target_* leaf weights). A ~100-line walker extracts
everything bit-exactly; no tensor data is involved.

Output checkpoint (gzipped JSON): per tree the same flat layout the
sklearn checkpoints use — left=true-branch (BRANCH_LEQ: x <= threshold),
right=false-branch, feature (-2 at leaves), threshold, value = leaf
target weight — plus the ensemble's aggregate (SUM) and base score.

Usage: python tools/extract_onnx_forest.py [zip_path] [out_dir]
"""

from __future__ import annotations

import gzip
import io
import json
import os
import struct
import sys
import zipfile

import numpy as np

ZIP_PATH = (
    "/root/reference/fink_science/data/models/anomaly_detection/"
    "anomaly_detection_forest_AAD_beta.zip"
)
OUT_DIR = os.path.join(
    os.path.dirname(__file__), "..", "fink_science_spark", "data"
)


def _read_varint(buf: memoryview, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def iter_fields(buf: memoryview):
    """Yield (field_number, wire_type, value) over one message.
    value: int for varint/fixed, memoryview for length-delimited."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wt = tag >> 3, tag & 7
        if wt == 0:
            v, pos = _read_varint(buf, pos)
            yield field, wt, v
        elif wt == 1:
            yield field, wt, struct.unpack("<q", buf[pos : pos + 8])[0]
            pos += 8
        elif wt == 2:
            ln, pos = _read_varint(buf, pos)
            yield field, wt, buf[pos : pos + ln]
            pos += ln
        elif wt == 5:
            yield field, wt, struct.unpack("<I", buf[pos : pos + 4])[0]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")


def parse_attribute(buf: memoryview) -> tuple[str, object]:
    """AttributeProto: name=1, f=2, i=3, s=4, floats=7, ints=8, strings=9.
    Repeated scalar fields may be packed or unpacked."""
    name = None
    f = None
    i = None
    s = None
    floats: list[float] = []
    ints: list[int] = []
    strings: list[str] = []
    for field, wt, v in iter_fields(buf):
        if field == 1:
            name = bytes(v).decode()
        elif field == 2:
            f = struct.unpack("<f", struct.pack("<I", v))[0]
        elif field == 3:
            i = v
        elif field == 4:
            s = bytes(v).decode()
        elif field == 7:
            if wt == 5:
                floats.append(struct.unpack("<f", struct.pack("<I", v))[0])
            else:  # packed
                floats.extend(np.frombuffer(bytes(v), dtype="<f4").tolist())
        elif field == 8:
            if wt == 0:
                ints.append(v)
            else:  # packed varints
                mv = memoryview(v)
                p = 0
                while p < len(mv):
                    val, p = _read_varint(mv, p)
                    ints.append(val)
        elif field == 9:
            strings.append(bytes(v).decode())
    for cand in (floats, ints, strings):
        if cand:
            return name, cand
    for cand in (f, i, s):
        if cand is not None:
            return name, cand
    return name, None


def extract_tree_ensemble(model_bytes: bytes) -> dict:
    """ModelProto -> graph(7) -> node(1) -> attributes(5)."""
    graph = None
    for field, _wt, v in iter_fields(memoryview(model_bytes)):
        if field == 7:
            graph = v
    assert graph is not None, "no GraphProto"
    attrs = {}
    op_type = None
    for field, _wt, v in iter_fields(graph):
        if field != 1:
            continue
        for nf, _nwt, nv in iter_fields(v):
            if nf == 4:
                op_type = bytes(nv).decode()
            elif nf == 5:
                name, val = parse_attribute(nv)
                attrs[name] = val
        if op_type and "TreeEnsemble" in op_type:
            break
    assert op_type and "TreeEnsemble" in op_type, op_type
    return attrs


def to_checkpoint(attrs: dict, source: str) -> dict:
    treeids = np.asarray(attrs["nodes_treeids"], dtype=np.int64)
    nodeids = np.asarray(attrs["nodes_nodeids"], dtype=np.int64)
    featureids = np.asarray(attrs["nodes_featureids"], dtype=np.int64)
    values = np.asarray(attrs["nodes_values"], dtype=np.float64)
    modes = attrs["nodes_modes"]
    true_ids = np.asarray(attrs["nodes_truenodeids"], dtype=np.int64)
    false_ids = np.asarray(attrs["nodes_falsenodeids"], dtype=np.int64)
    t_tree = np.asarray(attrs["target_treeids"], dtype=np.int64)
    t_node = np.asarray(attrs["target_nodeids"], dtype=np.int64)
    t_w = np.asarray(attrs["target_weights"], dtype=np.float64)
    assert set(modes) <= {"BRANCH_LEQ", "LEAF"}, set(modes)
    assert attrs.get("post_transform", "NONE") in (None, "NONE")
    trees = []
    for tid in np.unique(treeids):
        sel = treeids == tid
        nid = nodeids[sel]
        order = np.argsort(nid)  # node arrays indexed by nodeid
        assert np.array_equal(nid[order], np.arange(len(nid)))
        is_leaf = np.asarray(
            [modes[k] == "LEAF" for k in np.flatnonzero(sel)]
        )[order]
        feat = np.where(is_leaf, -2, featureids[sel][order])
        thr = values[sel][order]
        leafw = np.zeros(len(nid))
        tsel = t_tree == tid
        leafw[t_node[tsel]] = t_w[tsel]
        trees.append(
            {
                "left": true_ids[sel][order].astype(int).tolist(),
                "right": false_ids[sel][order].astype(int).tolist(),
                "feature": feat.astype(int).tolist(),
                "threshold": [float(x) for x in np.where(is_leaf, 0.0, thr)],
                # leaf weight in column 0 (value also 0 at internals)
                "value": [[float(x)] for x in np.where(is_leaf, leafw, 0.0)],
            }
        )
    base = attrs.get("base_values") or [0.0]
    return {
        "kind": "onnx_tree_ensemble_sum",
        "source": source,
        "n_features": int(featureids.max()) + 1,
        "base": float(base[0]),
        "trees": trees,
    }


def main(zip_path: str = ZIP_PATH, out_dir: str = OUT_DIR):
    z = zipfile.ZipFile(zip_path)
    for band in ("g", "r"):
        name = f"forest_{band}_AAD_beta.onnx"
        attrs = extract_tree_ensemble(z.read(name))
        ckpt = to_checkpoint(attrs, name)
        p = os.path.normpath(
            os.path.join(out_dir, f"anomaly_forest_{band}.json.gz")
        )
        with gzip.open(p, "wt") as f:
            json.dump(ckpt, f)
        nn = sum(len(t["left"]) for t in ckpt["trees"])
        print(
            f"wrote {p}: {len(ckpt['trees'])} trees, {nn} nodes, "
            f"{ckpt['n_features']} features ({os.path.getsize(p)//1024} KB)"
        )


if __name__ == "__main__":
    main(*sys.argv[1:])
