"""Transcribe the reference's sklearn/joblib model artifacts into engine
checkpoints — with NO sklearn/joblib import.

A sklearn pickle only needs (a) real numpy callables (installed) and
(b) inert stand-ins for sklearn classes that capture constructor args +
``__setstate__`` payloads. ``sklearn.tree._tree.Tree``'s state dict
carries the complete decision structure as plain numpy arrays
(``nodes`` structured array + ``values``), which is exactly what a
vectorized re-implementation needs. joblib pickles additionally stream
array bytes after NumpyArrayWrapper BUILD ops (object arrays are nested
pickle streams) — replicated here on the pure-python Unpickler.

Extracted artifacts (reference paths cited per checkpoint):
* rf.sav + pca.sav     -> mulens_rf / mulens_pca
  (ztf/microlensing/classifier.py:61 — LIA RandomForest + PCA)
* KN_model_1PC.pkl     -> kn_rf_1pc (RobustScaler + RandomForest
  pipeline; the PCA components themselves landed in round 5 via
  operators/kn_pca.py)
* kilonova_model.pkl   -> kilonova_rf
* model_orphans.pkl    -> orphans_gbt (GradientBoostingClassifier,
  rubin/orphans/classifier.py:137)

Checkpoints are gzipped JSON: trees as flat parallel arrays
(left/right/feature/threshold/value), thresholds as exact f64 reprs.

Usage: python tools/extract_sklearn_models.py [models_dir] [out_dir]
"""

from __future__ import annotations

import gzip
import json
import os
import pickle
import struct
import sys

import numpy as np

MODELS_DIR = "/root/reference/fink_science/data/models"
OUT_DIR = os.path.join(
    os.path.dirname(__file__), "..", "fink_science_spark", "data"
)


class Stub:
    def __init__(self, *a, **k):
        self._args = a

    def __setstate__(self, st):
        if isinstance(st, dict):
            self.__dict__.update(st)
        else:
            self._state = st


_made: dict = {}


def _mk(mod, name):
    if (mod, name) not in _made:
        _made[(mod, name)] = type(
            name, (Stub,), {"_sk_mod": mod, "_sk_name": name}
        )
    return _made[(mod, name)]


class NumpyArrayWrapper(Stub):
    """joblib's array placeholder: payload bytes follow in the stream."""

    def read_array(self, fh, unpickler_cls):
        dt = (
            self.dtype
            if isinstance(self.dtype, np.dtype)
            else np.dtype(self.dtype)
        )
        if dt.hasobject:
            return unpickler_cls(fh).load()  # nested pickle stream
        if getattr(self, "numpy_array_alignment_bytes", None):
            (pad,) = struct.unpack("B", fh.read(1))
            fh.read(pad)
        count = int(np.prod(self.shape)) if len(self.shape) else 1
        data = fh.read(int(count) * dt.itemsize)
        return np.frombuffer(data, dtype=dt).reshape(
            self.shape, order=getattr(self, "order", "C")
        )


class StubUnpickler(pickle._Unpickler):
    """Pure-python unpickler (C impl can't hook BUILD): numpy resolves
    for real, everything else becomes a state-capturing stub."""

    def __init__(self, fh):
        super().__init__(fh)
        self.fh = fh

    def find_class(self, mod, name):
        if mod.startswith("numpy"):
            import importlib

            try:
                return getattr(importlib.import_module(mod), name)
            except Exception:
                return _mk(mod, name)
        if name == "NumpyArrayWrapper":
            return NumpyArrayWrapper
        return _mk(mod, name)

    def load_build(self):
        super().load_build()
        obj = self.stack[-1]
        if isinstance(obj, NumpyArrayWrapper):
            self.stack[-1] = obj.read_array(self.fh, StubUnpickler)

    dispatch = pickle._Unpickler.dispatch.copy()
    dispatch[pickle.BUILD[0]] = load_build


def load_sklearn_pickle(path: str):
    with open(path, "rb") as f:
        return StubUnpickler(f).load()


def tree_to_json(tree_stub) -> dict:
    st = tree_stub.__dict__
    nodes, values = st["nodes"], st["values"]
    return {
        "left": nodes["left_child"].astype(int).tolist(),
        "right": nodes["right_child"].astype(int).tolist(),
        "feature": nodes["feature"].astype(int).tolist(),
        "threshold": [float(t) for t in nodes["threshold"]],
        # (node_count, n_outputs=1, k) -> (node_count, k)
        "value": np.asarray(values)[:, 0, :].tolist(),
    }


def rf_to_json(rf, name: str) -> dict:
    return {
        "kind": "rf_classifier",
        "source": name,
        "classes": [str(c) for c in rf.classes_],
        "n_features": int(
            getattr(rf, "n_features_", 0) or getattr(rf, "n_features_in_", 0)
        ),
        "trees": [tree_to_json(e.tree_) for e in rf.estimators_],
    }


def main(models_dir: str = MODELS_DIR, out_dir: str = OUT_DIR):
    out_dir = os.path.normpath(out_dir)

    def dump(name, obj):
        p = os.path.join(out_dir, name)
        with gzip.open(p, "wt") as f:
            json.dump(obj, f)
        print(f"wrote {p} ({os.path.getsize(p) // 1024} KB)")

    # --- microlensing RF + PCA (ztf/microlensing/classifier.py:61) ---
    rf = load_sklearn_pickle(os.path.join(models_dir, "rf.sav"))
    dump("mulens_rf.json.gz", rf_to_json(rf, "rf.sav"))
    pca = load_sklearn_pickle(os.path.join(models_dir, "pca.sav"))
    dump(
        "mulens_pca.json.gz",
        {
            "kind": "pca",
            "source": "pca.sav",
            "components": np.asarray(pca.components_).tolist(),
            "mean": np.asarray(pca.mean_).tolist(),
            "whiten": bool(getattr(pca, "whiten", False)),
            "explained_variance": np.asarray(
                pca.explained_variance_
            ).tolist(),
        },
    )

    # --- kilonova pipeline: RobustScaler + RF (KN_model_1PC.pkl) ---
    kn = load_sklearn_pickle(os.path.join(models_dir, "KN_model_1PC.pkl"))
    steps = dict(kn.steps) if hasattr(kn, "steps") else {}
    art = {"kind": "pipeline", "source": "KN_model_1PC.pkl", "steps": []}
    for sname, step in kn.steps if hasattr(kn, "steps") else []:
        if hasattr(step, "center_"):
            art["steps"].append(
                {
                    "kind": "robust_scaler",
                    "name": sname,
                    "center": np.asarray(step.center_).tolist()
                    if step.center_ is not None
                    else None,
                    "scale": np.asarray(step.scale_).tolist()
                    if step.scale_ is not None
                    else None,
                }
            )
        elif hasattr(step, "estimators_"):
            art["steps"].append(
                {"name": sname, **rf_to_json(step, "KN_model_1PC.pkl")}
            )
    dump("kn_rf_1pc.json.gz", art)

    # --- kilonova standalone RF (kilonova_model.pkl) ---
    krf = load_sklearn_pickle(os.path.join(models_dir, "kilonova_model.pkl"))
    dump("kilonova_rf.json.gz", rf_to_json(krf, "kilonova_model.pkl"))

    # --- orphans GradientBoosting (rubin/orphans/classifier.py:137) ---
    gbt = load_sklearn_pickle(os.path.join(models_dir, "model_orphans.pkl"))
    prior = np.asarray(gbt.init_.class_prior_, dtype=np.float64)
    dump(
        "orphans_gbt.json.gz",
        {
            "kind": "gbt_binary_classifier",
            "source": "model_orphans.pkl",
            "classes": [str(c) for c in gbt.classes_],
            "n_features": int(gbt.n_features_in_),
            "learning_rate": float(gbt.learning_rate),
            # log-odds init from the DummyClassifier prior (sklearn's
            # LogOddsEstimator for binary log_loss)
            "init_raw": float(np.log(prior[1] / prior[0])),
            "trees": [tree_to_json(e.tree_) for e in gbt.estimators_[:, 0]],
        },
    )


if __name__ == "__main__":
    main(*sys.argv[1:])
