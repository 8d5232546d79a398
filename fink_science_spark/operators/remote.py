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


def http_post_transport(
    url: str,
    ra_col: str = "ra",
    dec_col: str = "dec",
    *,
    radius_arcsec: float = 1.0,
    catalog: str = "simbad",
    name_col: str = "main_type",
    max_batch: int = 10_000,
    max_retries: int = 3,
    retry_delay: float = 0.5,
    timeout: float = 10.0,
    post: Callable | None = None,
) -> Transport:
    """Real HTTP transport for :func:`service_xmatch` — the CDS sync-xmatch
    wire protocol (reference: ztf/xmatch/processor.py:136-156): positions
    go up as a ``cat1`` CSV upload with the xmatch form fields, candidate
    matches come back as CSV ``(objectId, angDist, <name_col>)``. Retry
    semantics follow ``_post_request_with_retry``
    (ztf/blazar_extreme_state/utils.py:209-250): up to ``max_retries``
    attempts, ``retry_delay`` sleep between them; connection errors and
    timeouts count as failed attempts rather than aborting the batch.

    A chunk that still fails after retries emits ``"Fail <status>"``
    sentinel rows at +inf distance (reference: the ``Fail {status_code}``
    fill at processor.py:152-153) — +inf so a real match from any other
    chunk always wins the downstream arg-min, preserving the reference's
    tri-state contract (match / Unknown / Fail) in the joined frame.
    NaN names in a 200 response become "Unknown" (processor.py:178-180).

    ``max_batch`` bounds each request's row count — the RPC fan-out bound
    that keeps a 100 TB scan from assembling one giant POST body; at scale
    the request count is rows/max_batch per task, independent of total
    data size. ``post`` is injectable for tests and defaults to
    ``requests.post`` resolved lazily on the executor."""

    def transport(pdf: pd.DataFrame) -> pd.DataFrame:
        import io
        import time

        if post is None:
            import requests

            do_post = requests.post
            exc_types: tuple = (
                requests.exceptions.RequestException,
                ConnectionError,
                TimeoutError,
                OSError,
            )
        else:
            do_post = post
            exc_types = (ConnectionError, TimeoutError, OSError)

        id_col = pdf.columns[0]
        empty = pd.DataFrame(
            {
                id_col: pd.Series(dtype="int64"),
                "match_name": pd.Series(dtype="string"),
                "dist": pd.Series(dtype="float64"),
            }
        )
        frames = []
        for lo in range(0, len(pdf), max_batch):
            chunk = pdf.iloc[lo : lo + max_batch]
            body = "ra_in,dec_in,objectId\n" + "".join(
                f"{ra},{dec},{oid}\n"
                for ra, dec, oid in zip(
                    chunk[ra_col], chunk[dec_col], chunk[id_col]
                )
            )
            resp, status = None, "conn"
            for attempt in range(max_retries):
                try:
                    r = do_post(
                        url,
                        data={
                            "request": "xmatch",
                            "distMaxArcsec": radius_arcsec,
                            "selection": "all",
                            "RESPONSEFORMAT": "csv",
                            "cat2": catalog,
                            "cols2": name_col,
                            "colRA1": "ra_in",
                            "colDec1": "dec_in",
                        },
                        files={"cat1": body},
                        timeout=timeout,
                    )
                except exc_types:
                    r = None
                if r is not None and r.status_code == 200:
                    resp = r
                    break
                status = "conn" if r is None else str(r.status_code)
                if attempt + 1 < max_retries:
                    time.sleep(retry_delay)
            if resp is None:
                frames.append(
                    pd.DataFrame(
                        {
                            id_col: chunk[id_col].to_numpy(dtype="int64"),
                            "match_name": f"Fail {status}",
                            "dist": float("inf"),
                        }
                    )
                )
                continue
            try:
                got = pd.read_csv(io.BytesIO(resp.content))
            except ValueError:  # EmptyDataError — no candidates at all
                continue
            if len(got) == 0 or "objectId" not in got.columns:
                continue
            if name_col not in got.columns or "angDist" not in got.columns:
                # a 200 with a malformed table (error page, changed
                # schema) is a degraded response, not a crash: the
                # tri-state contract turns it into Fail sentinels
                frames.append(
                    pd.DataFrame(
                        {
                            id_col: chunk[id_col].to_numpy(dtype="int64"),
                            "match_name": "Fail parse",
                            "dist": float("inf"),
                        }
                    )
                )
                continue
            frames.append(
                pd.DataFrame(
                    {
                        id_col: got["objectId"].astype("int64"),
                        "match_name": got[name_col]
                        .astype("string")
                        .fillna("Unknown"),
                        "dist": got["angDist"].astype("float64"),
                    }
                )
            )
        if not frames:
            return empty
        return pd.concat(frames, ignore_index=True).astype(
            {id_col: "int64", "match_name": "string", "dist": "float64"}
        )

    return transport


def http_get_json_transport(
    url: str,
    param_cols: dict[str, str],
    *,
    extra_params: dict | None = None,
    parse=None,
    max_retries: int = 3,
    retry_delay: float = 0.5,
    timeout: float = 10.0,
    get: Callable | None = None,
) -> Transport:
    """REST-JSON transport for :func:`service_xmatch` — the per-object
    GET shape of the reference's SNAD-DR / Fink-API / SDSS photo-z
    lookups (ztf/blazar_extreme_state/utils.py:209-250 and :253-319;
    ztf/superluminous/processor.py:345-360). One request per input row:
    ``param_cols`` maps request parameter names to batch columns,
    ``extra_params`` adds constants (radius, format, ...).

    Retry semantics follow ``_post_request_with_retry`` EXACTLY: a non-200
    response sleeps ``retry_delay`` and retries up to ``max_retries``
    times; a connection error / timeout gives up on that row immediately
    (the reference returns None there, no retry). A failed row simply
    yields no matches — downstream fills the ``unmatched`` sentinel, so
    service degradation degrades answers to "Unknown", never crashes the
    scan.

    ``parse(row_id, payload) -> [(id, match_name, dist), ...]`` maps one
    JSON response to candidate matches; the default expects a list of
    ``{"name": ..., "dist": ...}`` objects. ``get`` is injectable for
    tests (defaults to requests.get resolved lazily on the executor)."""

    def default_parse(rid, payload):
        return [
            (rid, str(m["name"]), float(m.get("dist", 0.0)))
            for m in (payload or [])
        ]

    parse_fn = parse or default_parse

    def transport(pdf: pd.DataFrame) -> pd.DataFrame:
        import time

        if get is None:
            import requests

            do_get = requests.get
            conn_exc: tuple = (
                requests.exceptions.ConnectionError,
                requests.exceptions.ReadTimeout,
                requests.exceptions.HTTPError,
                ConnectionError,
                TimeoutError,
                OSError,
            )
        else:
            do_get = get
            conn_exc = (ConnectionError, TimeoutError, OSError)

        id_col = pdf.columns[0]
        ids, names, dists = [], [], []
        for row in pdf.itertuples(index=False):
            rowd = row._asdict()
            params = {p: rowd[c] for p, c in param_cols.items()}
            if extra_params:
                params.update(extra_params)
            payload = None
            for attempt in range(max_retries):
                try:
                    r = do_get(url, params=params, timeout=timeout)
                except conn_exc:
                    break  # reference: connection errors are not retried
                if r.status_code == 200:
                    try:
                        payload = r.json()
                    except ValueError:
                        # 200 with a non-JSON body (proxy error page):
                        # degraded response → this row yields no matches,
                        # never a task crash
                        pass
                    break
                if attempt + 1 < max_retries:
                    time.sleep(retry_delay)
            if payload is None:
                continue
            for rid, name, dist in parse_fn(rowd[id_col], payload):
                ids.append(rid)
                names.append(name)
                dists.append(dist)
        return pd.DataFrame(
            {id_col: ids, "match_name": names, "dist": dists}
        ).astype({id_col: "int64", "match_name": "string", "dist": "float64"})

    return transport


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
