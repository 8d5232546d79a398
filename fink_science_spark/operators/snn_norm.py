"""Real SuperNNova normalization constants — value-level parity for the
SNN feature-prep step.

The reference's SNN modules (ztf/snn/processor.py:84-210, rubin twin
rubin/snn/processor.py:35-157) format light curves as SNANA FLUXCAL rows
and hand them to SuperNNova's ``classify_lcs``, which standardizes every
feature with the constants shipped in the model directory's
``data_norm.json``: SuperNNova's log-standardization

    x' = (ln(x - min + 1e-5) - mean) / std

with per-feature ``{mean, min, std}`` computed on the log-transformed
training set (FLUXCAL_g/r, FLUXCALERR_g/r, delta_time).

This module carries the REAL constants through the engine's checkpoint
seam (same artifact pattern as operators/kn_pca.py and models.py):
``tools/extract_snn_norm.py`` transcribes the reference JSON verbatim into
``fink_science_spark/data/snn_data_norm.json`` (committed — the repo is
standalone), :func:`load_snn_norm` resolves env override → explicit path →
packaged artifact on the DRIVER, and the normalization itself is native
column algebra with an exact DuckDB twin (ln is libm but continuous, and
|x - min| stays well away from 0 relative to the 1e-5 floor except at
dt = 0, where both engines evaluate ln(1e-5) of identical doubles).

The ``greatest(x - min, 0)`` clamp guards inference-time values below the
training minimum (SuperNNova trains with x >= min by construction; an
unguarded ln would return NaN there).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

_DEFAULT_JSON = os.path.join(
    os.path.dirname(__file__), "..", "data", "snn_data_norm.json"
)

_CACHE: dict[str, dict] = {}


def checkpoint_path() -> str:
    """Driver-side artifact resolution: env SPARK_GRAFT_SNN_NORM overrides
    the packaged JSON (same seam as models.checkpoint_path)."""
    return os.environ.get("SPARK_GRAFT_SNN_NORM") or os.path.normpath(
        _DEFAULT_JSON
    )


def load_snn_norm(path: str | None = None) -> dict[str, dict[str, float]]:
    """Feature → {mean, min, std}, memoized per path.  Loaded once on the
    driver; the constants embed in the plan as literals."""
    p = path or checkpoint_path()
    if p not in _CACHE:
        with open(p) as f:
            art = json.load(f)
        feats = art["features"]
        for feat, st in feats.items():
            assert set(st) == {"mean", "min", "std"}, feat
            assert st["std"] > 0.0, feat
        _CACHE[p] = feats
    return _CACHE[p]


def snn_norm_col(x: F.Column, stats: dict[str, float]) -> F.Column:
    """SuperNNova log-standardization of a column with one feature's real
    constants: (ln(greatest(x - min, 0) + 1e-5) - mean) / std."""
    return (
        F.log(
            F.greatest(x - F.lit(stats["min"]), F.lit(0.0)) + F.lit(1e-5)
        )
        - F.lit(stats["mean"])
    ) / F.lit(stats["std"])


def snn_norm_sql(x_expr: str, stats: dict[str, float]) -> str:
    """The identical standardization as a DuckDB scalar expression (repr
    literals — bit-identical parse — and the same operation order)."""
    return (
        f"((ln(greatest(({x_expr}) - ({stats['min']!r}), 0.0) + 1e-5)"
        f" - ({stats['mean']!r})) / ({stats['std']!r}))"
    )
