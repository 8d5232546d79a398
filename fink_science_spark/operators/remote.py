"""Remote-service crossmatch — the cdsxmatch pipeline shape.

The reference POSTs alert positions to the CDS xmatch service from inside
a pandas UDF (ztf/xmatch/processor.py:124-195): batch the positions,
receive candidate matches, keep the minimum-distance match per object,
left-join back, fill "Unknown" for unmatched (the tri-state contract of
rubin/xmatch/processor.py:69-74). That is a *per-partition external RPC*
— the one operator whose latency is bounded by a remote service, not the
cluster.

Engine form: the transport is INJECTABLE. Production passes an HTTP POST
callable; tests and the correctness oracle pass a deterministic local
resolver (so the whole pipeline — batching, arg-min dedup, left join,
sentinel fill — is oracle-checkable without a network). Any reference
table the resolver needs is loaded once per Python worker through
:class:`~fink_science_spark.operators.enrich.ExecutorRegistry`, replacing
the reference's in-UDF file loads.

At 100 TB: the RPC batch size bounds request fan-out; the match table
that comes back is tiny relative to the stream; everything after the
transport is ordinary broadcast-join-shaped work.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fink_science_spark.operators.dedup import argmin_dedup

Transport = Callable[[pd.DataFrame], pd.DataFrame]
# Transport contract: input one batch of (id, *coords); output candidate
# matches (id, match_name string, dist double) — zero or more per input id.


def service_xmatch(
    df: DataFrame,
    id_col: str,
    coord_cols: list[str],
    transport: Transport,
    out_col: str = "xmatch",
    unmatched: str | None = "Unknown",
) -> DataFrame:
    """cdsxmatch semantics: per-partition RPC → best (min-dist) match per
    id with deterministic ties on match_name → left join back onto the
    full frame → ``unmatched`` sentinel where the service returned nothing
    (reference: min-angDist idxmin at ztf/xmatch/processor.py:167-169,
    left merge at :171, Unknown fill at :184-190). ``unmatched=None``
    keeps NULL — the Rubin null-semantics variant of the tri-state
    contract (rubin/xmatch/processor.py:69-74).

    Returns the input frame + [out_col string, {out_col}_dist double]."""
    positions = df.select(id_col, *coord_cols)

    def call(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = transport(pdf)
            if len(out):
                yield out

    matches = positions.mapInPandas(
        call, schema=f"{id_col} long, match_name string, dist double"
    )
    best = argmin_dedup(
        matches, [id_col], [F.col("dist").asc(), F.col("match_name").asc()]
    )
    joined = df.join(best, id_col, "left")
    fill = (
        F.coalesce("match_name", F.lit(unmatched))
        if unmatched is not None
        else F.col("match_name")
    )
    return (
        joined.withColumn(out_col, fill)
        .withColumnRenamed("dist", f"{out_col}_dist")
        .drop("match_name")
    )


def local_table_resolver(
    table_loader: Callable[[], pd.DataFrame],
    registry_key: str,
    coord_col: str,
    name_col: str,
    ref_coord_col: str,
    radius: float,
) -> Transport:
    """A deterministic in-process 'service': match each position against a
    reference table on |coord − ref_coord| ≤ radius (1-D here; the 2-D sky
    form swaps the distance kernel). The table loads once per Python
    worker via ExecutorRegistry — the reference's module-global model-load
    pattern (rubin/cats/processor.py:34-38) done properly."""
    def transport(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        from fink_science_spark.operators.enrich import ExecutorRegistry

        ref = ExecutorRegistry.get(registry_key, table_loader)
        ids, names, dists = [], [], []
        rc = ref[ref_coord_col].to_numpy(dtype=np.float64)
        rn = ref[name_col].to_numpy()
        id_col = pdf.columns[0]
        for rid, c in zip(pdf[id_col].to_numpy(), pdf[coord_col].to_numpy()):
            d = np.abs(rc - float(c))
            hit = d <= radius
            k = int(hit.sum())
            if k:
                ids.extend([rid] * k)
                names.extend(str(x) for x in rn[hit])
                dists.extend(float(x) for x in d[hit])
        return pd.DataFrame(
            {id_col: ids, "match_name": names, "dist": dists}
        ).astype({id_col: "int64", "match_name": "string", "dist": "float64"})

    return transport
