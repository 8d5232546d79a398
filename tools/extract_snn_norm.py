#!/usr/bin/env python3
"""Extract the reference's real SuperNNova normalization constants into the
engine's JSON checkpoint artifact.

The reference ships ``data/models/snn_models/<model>/data_norm.json`` —
per-feature ``{mean, min, std}`` of the LOG-transformed training features
(SuperNNova's log-standardization: ``(ln(x - min + 1e-5) - mean) / std``),
consumed inside ``classify_lcs`` (reference: ztf/snn/processor.py:84-210,
model dir resolution at :196).  This tool transcribes the constants
VERBATIM into ``fink_science_spark/data/snn_data_norm.json`` so the engine
repo stays standalone.  Re-run after a reference model update:

    python tools/extract_snn_norm.py [src_json] [dst_json]
"""

from __future__ import annotations

import json
import sys

DEFAULT_SRC = (
    "/root/reference/fink_science/data/models/snn_models/"
    "snn_sn_vs_all/data_norm.json"
)
DEFAULT_DST = "fink_science_spark/data/snn_data_norm.json"


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SRC
    dst = sys.argv[2] if len(sys.argv) > 2 else DEFAULT_DST
    with open(src) as f:
        stats = json.load(f)
    for feat, st in stats.items():
        assert set(st) == {"mean", "min", "std"}, feat
    with open(dst, "w") as f:
        json.dump(
            {
                "source": "fink-science data/models/snn_models/"
                "snn_sn_vs_all/data_norm.json",
                "features": stats,
            },
            f,
        )
    print(f"wrote {dst}: features={sorted(stats)}")


if __name__ == "__main__":
    main()
