"""Socket-level tests for the real HTTP xmatch transport.

A stdlib ThreadingHTTPServer on 127.0.0.1 implements the CDS sync-xmatch
wire shape (multipart ``cat1`` CSV upload in, ``objectId,angDist,name``
CSV out), so the requests-based transport is exercised over a real TCP
socket — request encoding, multipart body, retry loop, failure sentinels —
with zero external network (reference protocol:
ztf/xmatch/processor.py:136-156; retry semantics:
ztf/blazar_extreme_state/utils.py:209-250).
"""

from __future__ import annotations

import threading
from email.parser import BytesParser
from email.policy import default as email_default
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pandas as pd
import pytest

from fink_science_spark.operators.remote import (
    http_post_transport,
    service_xmatch,
)

# tiny "remote catalog": name → (ra, dec); match radius 1 arcsec
_CATALOG = {
    "StarA": (10.0, -5.0),
    "StarB": (20.0, 15.0),
    "StarC": (20.0001, 15.00001),  # within 1" of StarB's position
}
_RADIUS_DEG = 1.0 / 3600.0


def _parse_multipart(content_type: str, body: bytes) -> dict[str, bytes]:
    msg = BytesParser(policy=email_default).parsebytes(
        b"Content-Type: " + content_type.encode() + b"\r\n\r\n" + body
    )
    parts = {}
    for part in msg.iter_parts():
        name = part.get_param("name", header="content-disposition")
        parts[name] = part.get_payload(decode=True)
    return parts


class _XmatchHandler(BaseHTTPRequestHandler):
    fail_first = 0  # set per-server: first N requests get a 500

    def log_message(self, *a):  # keep test output clean
        pass

    def do_POST(self):
        srv = self.server
        srv.request_count += 1
        if srv.request_count <= type(self).fail_first:
            self.send_response(500)
            self.end_headers()
            return
        body = self.rfile.read(int(self.headers["Content-Length"]))
        parts = _parse_multipart(self.headers["Content-Type"], body)
        srv.seen_batches.append(parts["cat1"].decode())
        lines = parts["cat1"].decode().strip().splitlines()[1:]  # skip header
        out = ["objectId,angDist,main_type"]
        for line in lines:
            ra_s, dec_s, oid = line.split(",")
            ra, dec = float(ra_s), float(dec_s)
            for name, (cra, cdec) in _CATALOG.items():
                d = ((ra - cra) ** 2 + (dec - cdec) ** 2) ** 0.5
                if d <= _RADIUS_DEG:
                    out.append(f"{oid},{d * 3600.0:.6f},{name}")
        payload = ("\n".join(out) + "\n").encode() if len(out) > 1 else b""
        self.send_response(200)
        self.send_header("Content-Type", "text/csv")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)


@pytest.fixture
def xmatch_server():
    """Yields (url, server); handler class is fresh per test so
    fail_first doesn't leak between tests."""
    handler = type("H", (_XmatchHandler,), {})
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    srv.request_count = 0
    srv.seen_batches = []
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_address[1]}/xmatch", srv
    finally:
        srv.shutdown()
        srv.server_close()


def _positions():
    return pd.DataFrame(
        {
            "id": pd.Series([1, 2, 3], dtype="int64"),
            "ra": [10.0, 20.0, 50.0],
            "dec": [-5.0, 15.0, 50.0],
        }
    )


def test_http_transport_roundtrip(xmatch_server):
    url, srv = xmatch_server
    tr = http_post_transport(url, "ra", "dec", retry_delay=0.01)
    out = tr(_positions())
    # id=1 → StarA exact; id=2 → StarB exact + StarC near; id=3 → nothing
    got = {
        (int(r.id), r.match_name)
        for r in out.itertuples()
    }
    assert (1, "StarA") in got
    assert (2, "StarB") in got and (2, "StarC") in got
    assert not any(i == 3 for i, _ in got)
    # exact match rows come back at distance 0
    assert float(out[out.match_name == "StarA"].dist.iloc[0]) == 0.0
    assert srv.request_count == 1


def test_http_transport_batch_bound(xmatch_server):
    url, srv = xmatch_server
    tr = http_post_transport(url, "ra", "dec", max_batch=2, retry_delay=0.01)
    tr(_positions())  # 3 rows, max_batch=2 → 2 requests
    assert srv.request_count == 2
    sizes = [len(b.strip().splitlines()) - 1 for b in srv.seen_batches]
    assert sizes == [2, 1]


def test_http_transport_retry_then_success(xmatch_server):
    url, srv = xmatch_server
    srv.RequestHandlerClass.fail_first = 2
    tr = http_post_transport(url, "ra", "dec", max_retries=3, retry_delay=0.01)
    out = tr(_positions())
    assert srv.request_count == 3  # 2 × 500 + 1 × 200
    assert (out.match_name == "StarA").any()
    assert not out.match_name.str.startswith("Fail").any()


def test_http_transport_fail_sentinel_after_retries(xmatch_server):
    url, srv = xmatch_server
    srv.RequestHandlerClass.fail_first = 99
    tr = http_post_transport(url, "ra", "dec", max_retries=3, retry_delay=0.01)
    out = tr(_positions())
    assert srv.request_count == 3  # exactly max_retries attempts
    assert list(out.match_name.unique()) == ["Fail 500"]
    assert len(out) == 3 and (out.dist == float("inf")).all()


def test_http_transport_connection_refused():
    # closed port → every attempt raises ConnectionError → "Fail conn"
    tr = http_post_transport(
        "http://127.0.0.1:9", "ra", "dec", max_retries=2, retry_delay=0.01,
        timeout=0.5,
    )
    out = tr(_positions())
    assert list(out.match_name.unique()) == ["Fail conn"]


def test_service_xmatch_over_http_end_to_end(spark, xmatch_server):
    """The full operator through Spark with executors POSTing to the local
    server: batching in mapInPandas, arg-min dedup (StarB at 0" beats
    StarC), left join, Unknown fill."""
    url, _ = xmatch_server
    df = spark.createDataFrame(
        [(1, 10.0, -5.0), (2, 20.0, 15.0), (3, 50.0, 50.0)],
        "id long, ra double, dec double",
    )
    tr = http_post_transport(url, "ra", "dec", retry_delay=0.01)
    out = service_xmatch(df, "id", ["ra", "dec"], tr, out_col="xmatch")
    rows = {r["id"]: r["xmatch"] for r in out.collect()}
    assert rows == {1: "StarA", 2: "StarB", 3: "Unknown"}


class _JsonHandler(BaseHTTPRequestHandler):
    """GET endpoint: ?ra=&dec= → JSON candidate list from _CATALOG."""

    fail_first = 0

    def log_message(self, *a):
        pass

    def do_GET(self):
        import json
        from urllib.parse import parse_qs, urlparse

        srv = self.server
        srv.request_count += 1
        if srv.request_count <= type(self).fail_first:
            self.send_response(500)
            self.end_headers()
            return
        q = parse_qs(urlparse(self.path).query)
        ra, dec = float(q["ra"][0]), float(q["dec"][0])
        out = []
        for name, (cra, cdec) in _CATALOG.items():
            d = ((ra - cra) ** 2 + (dec - cdec) ** 2) ** 0.5
            if d <= _RADIUS_DEG:
                out.append({"name": name, "dist": round(d * 3600.0, 6)})
        payload = json.dumps(out).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)


@pytest.fixture
def json_server():
    handler = type("J", (_JsonHandler,), {})
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    srv.request_count = 0
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_address[1]}/conesearch", srv
    finally:
        srv.shutdown()
        srv.server_close()


def test_json_transport_per_row_requests(json_server):
    from fink_science_spark.operators.remote import http_get_json_transport

    url, srv = json_server
    tr = http_get_json_transport(
        url, {"ra": "ra", "dec": "dec"}, retry_delay=0.01
    )
    out = tr(_positions())
    got = {(int(r.id), r.match_name) for r in out.itertuples()}
    assert (1, "StarA") in got and (2, "StarB") in got
    assert not any(i == 3 for i, _ in got)  # no match → no rows
    assert srv.request_count == 3  # one GET per input row


def test_json_transport_retry_on_500_not_on_conn(json_server):
    from fink_science_spark.operators.remote import http_get_json_transport

    url, srv = json_server
    srv.RequestHandlerClass.fail_first = 2
    tr = http_get_json_transport(
        url, {"ra": "ra", "dec": "dec"}, max_retries=3, retry_delay=0.01
    )
    out = tr(_positions().head(1))  # single row: 2×500 then 200
    assert srv.request_count == 3
    assert (out.match_name == "StarA").any()
    # connection refused: gives up per row immediately (reference
    # semantics), rows yield no matches, no exception
    tr2 = http_get_json_transport(
        "http://127.0.0.1:9", {"ra": "ra", "dec": "dec"},
        max_retries=3, retry_delay=0.01, timeout=0.5,
    )
    assert len(tr2(_positions())) == 0


def test_json_transport_through_service_xmatch(spark, json_server):
    from fink_science_spark.operators.remote import (
        http_get_json_transport,
        service_xmatch,
    )

    url, _ = json_server
    df = spark.createDataFrame(
        [(1, 10.0, -5.0), (2, 20.0, 15.0), (3, 50.0, 50.0)],
        "id long, ra double, dec double",
    )
    tr = http_get_json_transport(url, {"ra": "ra", "dec": "dec"},
                                 retry_delay=0.01)
    out = service_xmatch(df, "id", ["ra", "dec"], tr, out_col="xmatch")
    rows = {r["id"]: r["xmatch"] for r in out.collect()}
    assert rows == {1: "StarA", 2: "StarB", 3: "Unknown"}
