"""Real kilonova PCA components — value-level model parity with the
reference's kndetect feature step.

The reference's kilonova module (ztf/kilonova/processor.py:37-186) projects
each max-normalized, PEAK-ALIGNED light curve onto principal components
loaded from ``data/models/KN_PC_all_bands.npy`` (``load_pcs()`` at :165,
used by ``extract_features_all_lightcurves(pcs=pcs)`` at :171-176), then
feeds the per-band coefficients to a random forest.  The npy is a plain
dict of 6 bands × (10, 51) float64 matrices: 10 components sampled on a
51-point time grid centred on the flux peak.

This module carries those REAL components through the engine's checkpoint
seam (the same artifact pattern as :mod:`fink_science_spark.operators
.models`): ``tools/extract_kn_pcs.py`` transcribes the npy bit-exactly into
``fink_science_spark/data/kn_pcs.json`` (committed, so the repo is
standalone), and :func:`load_kn_pcs` resolves env override → explicit path
→ packaged artifact on the DRIVER.  The projection itself is native column
algebra — the component values become plan literals (via ``repr``, which
round-trips float64 bit-exactly into both Spark and DuckDB), so the scoring
query needs no Python at execution time and gets an exact SQL oracle.

Projection semantics (kndetect's feature step, re-expressed relationally):
take the first ``GRID`` points of the curve, normalize by the curve max,
align the max at grid slot ``PEAK_SLOT`` (kndetect fits curves on a grid
centred at peak flux), and dot with the component:

    coef = Σ_{j=1..51}  v[j - shift]/m · pc[j],   shift = PEAK_SLOT - argmax

Terms are summed left-to-right in grid order in BOTH engines — required
because the downstream frozen forest is discontinuous at its thresholds
(see operators/models.py), so the features must be bit-identical.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

#: number of grid samples each component carries (kndetect's time grid)
GRID = 51
#: 1-based grid slot the curve maximum is aligned to (grid centre)
PEAK_SLOT = 26

_DEFAULT_JSON = os.path.join(os.path.dirname(__file__), "..", "data", "kn_pcs.json")

_CACHE: dict[str, dict] = {}


def checkpoint_path() -> str:
    """Driver-side artifact resolution: env SPARK_GRAFT_KN_CHECKPOINT
    overrides the packaged JSON (same seam as models.checkpoint_path)."""
    return os.environ.get("SPARK_GRAFT_KN_CHECKPOINT") or os.path.normpath(
        _DEFAULT_JSON
    )


def load_kn_pcs(path: str | None = None) -> dict[str, list[list[float]]]:
    """Band → 10×51 component rows, memoized per path.  Loaded once on the
    driver; values embed in the plan as literals (no executor I/O)."""
    p = path or checkpoint_path()
    if p not in _CACHE:
        with open(p) as f:
            art = json.load(f)
        bands = art["bands"]
        for band, mat in bands.items():
            assert len(mat) == art["n_components"], band
            assert all(len(row) == art["grid_points"] for row in mat), band
        _CACHE[p] = bands
    return _CACHE[p]


def save_kn_checkpoint(path: str, bands: dict[str, list[list[float]]]) -> None:
    """Serialize components in the artifact format (the writer half of the
    seam; tools/extract_kn_pcs.py uses the same layout)."""
    with open(path, "w") as f:
        json.dump(
            {
                "source": "user checkpoint",
                "n_components": len(next(iter(bands.values()))),
                "grid_points": GRID,
                "bands": bands,
            },
            f,
        )


# --------------------------------------------------------------------------
# Peak-aligned projection — engine column + SQL twin.  Callers first
# materialize three named helper columns per band (slice, max, shift) so the
# unrolled terms reference them by name instead of recomputing array_max 51
# times per coefficient.
# --------------------------------------------------------------------------


def kn_prep_cols(arr: str, prefix: str) -> list[F.Column]:
    """Helper columns for one band: ``{prefix}_s`` = first-GRID slice,
    ``{prefix}_m`` = guarded curve max, ``{prefix}_sh`` = peak-align shift."""
    s = F.slice(F.col(arr), 1, GRID)
    mx = F.array_max(s)
    return [
        s.alias(f"{prefix}_s"),
        F.greatest(mx, F.lit(1e-9)).alias(f"{prefix}_m"),
        (F.lit(PEAK_SLOT) - F.array_position(s, mx).cast("int")).alias(
            f"{prefix}_sh"
        ),
    ]


def kn_prep_sql(arr: str) -> tuple[str, str, str]:
    """DuckDB twins of :func:`kn_prep_cols` as (slice, max, shift) exprs."""
    s = f"{arr}[1:{GRID}]"
    mx = f"list_max({s})"
    return (
        s,
        f"greatest({mx}, 1e-9)",
        f"({PEAK_SLOT} - list_position({s}, {mx}))",
    )


def _dlit(v: float) -> str:
    """Spark-SQL DOUBLE literal that round-trips the float64 bit-exactly:
    exponent notation always lexes as DOUBLE (a bare decimal literal would
    parse as DECIMAL), and 17 significant digits are lossless."""
    return f"{float(v):.17e}"


def kn_coef_col(s: str, m: str, sh: str, pc: list[float], gain: float) -> F.Column:
    """Peak-aligned projection Σ v[j-shift]/m · pc[j] · gain, unrolled in
    grid order (left-to-right — exact-IEEE contract with the SQL twin).
    ``s``/``m``/``sh`` name the :func:`kn_prep_cols` helper columns.

    The index guard is explicit (``j - shift >= 1``) because element_at
    with a NEGATIVE index counts from the END of the array in both Spark
    and DuckDB — an out-of-window grid slot must contribute 0, not wrap.

    Built as ONE ``F.expr`` over a generated Spark-SQL string, not as a
    Python Column fold: the 51-term tree costs ~2000 Py4J round-trips per
    coefficient to assemble operator-by-operator (~2.6 s of DRIVER time
    per kn_score invocation, measured — 5x the query's executor time),
    while a string parse is a single gateway call. Identical analyzed
    plan either way."""
    terms = []
    for j in range(1, GRID + 1):
        idx = f"({j} - {sh})"
        val = (
            f"CASE WHEN {idx} >= 1 THEN "
            f"coalesce(try_element_at({s}, {idx}), 0.0D) ELSE 0.0D END"
        )
        terms.append(f"{val} / {m} * {_dlit(pc[j - 1])}")
    return F.expr(f"({' + '.join(terms)}) * {_dlit(gain)}")


def kn_coef_sql(s: str, m: str, sh: str, pc: list[float], gain: float) -> str:
    """The identical projection as a DuckDB scalar expression (same literals
    via repr, same term order, same index guard)."""
    terms = []
    for j in range(1, GRID + 1):
        idx = f"({j} - {sh})"
        val = (
            f"CASE WHEN {idx} >= 1 THEN coalesce(({s})[{idx}], 0.0) "
            f"ELSE 0.0 END"
        )
        terms.append(f"{val} / ({m}) * ({pc[j - 1]!r})")
    return f"(({' + '.join(terms)}) * {gain!r})"
