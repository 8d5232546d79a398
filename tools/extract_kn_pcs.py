#!/usr/bin/env python3
"""Extract the reference's real kilonova PCA components into the engine's
JSON checkpoint artifact.

The reference ships ``data/models/KN_PC_all_bands.npy`` — a pickled dict of
6 photometric bands (u g r i z Y) each holding a (10, 51) float64 matrix:
10 principal components sampled on the 51-point peak-aligned time grid the
kndetect feature extractor projects light curves onto
(reference: ztf/kilonova/processor.py:165-176, ``load_pcs()`` +
``extract_features_all_lightcurves(pcs=pcs)``).

This tool transcribes those arrays VERBATIM (``repr`` of each float64, which
round-trips bit-exactly) into ``fink_science_spark/data/kn_pcs.json`` so the
engine repo stays standalone: at runtime :mod:`fink_science_spark.operators
.kn_pca` loads the JSON, never the npy.  Re-run after a reference model
update:

    python tools/extract_kn_pcs.py [npy_path] [json_path]
"""

from __future__ import annotations

import json
import sys

DEFAULT_NPY = "/root/reference/fink_science/data/models/KN_PC_all_bands.npy"
DEFAULT_JSON = "fink_science_spark/data/kn_pcs.json"


def extract(npy_path: str) -> dict:
    import numpy as np

    raw = np.load(npy_path, allow_pickle=True).item()
    bands = {}
    for band, mat in raw.items():
        mat = np.asarray(mat, dtype=np.float64)
        assert mat.shape == (10, 51), (band, mat.shape)
        bands[str(band)] = [[float(x) for x in row] for row in mat]
    return {
        "source": "fink-science data/models/KN_PC_all_bands.npy",
        "n_components": 10,
        "grid_points": 51,
        "bands": bands,
    }


def main() -> None:
    npy = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_NPY
    out = sys.argv[2] if len(sys.argv) > 2 else DEFAULT_JSON
    art = extract(npy)
    with open(out, "w") as f:
        json.dump(art, f)
    print(f"wrote {out}: bands={sorted(art['bands'])}")


if __name__ == "__main__":
    main()
