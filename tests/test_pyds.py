"""Python Data Source tests (S3 as a native Spark 4 source) against a
real in-process HTTP server: partition-parallel batch reads, retry on
transient 5xx, 404 page-stop, and the streaming offset walk.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from streaming_data_spark.sources import pyds

PAGE_SIZE = 5
N_PAGES = 7  # 35 rows total
DDL = "id BIGINT, name STRING, score DOUBLE"


def _page_rows(page: int) -> list[dict]:
    return [
        {"id": page * PAGE_SIZE + i, "name": f"row{page}_{i}", "score": page + i / 10.0}
        for i in range(PAGE_SIZE)
    ]


class _PagesHandler(BaseHTTPRequestHandler):
    def do_GET(self) -> None:  # noqa: N802 — http.server API
        srv = self.server
        q = parse_qs(urlparse(self.path).query)
        page = int(q["page"][0])
        with srv.lock:  # type: ignore[attr-defined]
            srv.hits.append(page)  # type: ignore[attr-defined]
            if srv.fail_budget > 0:  # type: ignore[attr-defined]
                srv.fail_budget -= 1  # type: ignore[attr-defined]
                self.send_response(503)
                self.end_headers()
                return
            visible = srv.visible_pages  # type: ignore[attr-defined]
        if page >= visible:
            self.send_response(404)
            self.end_headers()
            return
        body = json.dumps(_page_rows(page)).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *args) -> None:
        pass


@pytest.fixture()
def page_server():
    srv = HTTPServer(("127.0.0.1", 0), _PagesHandler)
    srv.hits = []  # type: ignore[attr-defined]
    srv.fail_budget = 0  # type: ignore[attr-defined]
    srv.visible_pages = N_PAGES  # type: ignore[attr-defined]
    srv.lock = threading.Lock()  # type: ignore[attr-defined]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()
    srv.server_close()


def _url(srv) -> str:
    return f"http://127.0.0.1:{srv.server_address[1]}/data?page={{page}}"


def test_batch_read_is_partition_parallel_and_complete(spark, page_server):
    pyds.register(spark)
    df = (
        spark.read.format("rest_pages")
        .schema(DDL)
        .option("url", _url(page_server))
        .option("pages", N_PAGES)
        .option("pages_per_partition", 2)
        .load()
    )
    # ceil(7/2) = 4 independent fetch partitions
    assert df.rdd.getNumPartitions() == 4
    rows = df.collect()
    assert len(rows) == N_PAGES * PAGE_SIZE
    got = {(r.id, r.name, r.score) for r in rows}
    want = {
        (rec["id"], rec["name"], rec["score"])
        for p in range(N_PAGES)
        for rec in _page_rows(p)
    }
    assert got == want


def test_batch_read_retries_transient_errors(spark, page_server):
    page_server.fail_budget = 2  # first two GETs 503 then recover
    pyds.register(spark)
    df = (
        spark.read.format("rest_pages")
        .schema(DDL)
        .option("url", _url(page_server))
        .option("pages", N_PAGES)
        .option("backoff_base", "0.01")
        .load()
    )
    assert df.count() == N_PAGES * PAGE_SIZE


def test_stream_reads_pages_as_they_appear(spark, page_server, tmp_path):
    """Offsets are page numbers: batch 1 drains the 3 visible pages,
    more pages 'arrive', batch 2 picks up exactly the delta."""
    page_server.visible_pages = 3
    pyds.register(spark)
    stream = (
        spark.readStream.format("rest_pages")
        .schema(DDL)
        .option("url", _url(page_server))
        .load()
    )
    writer = stream.writeStream.format("memory").queryName("rest_stream")
    query = writer.start()
    try:
        query.processAllAvailable()
        assert spark.sql("SELECT count(*) c FROM rest_stream").first().c == 3 * PAGE_SIZE

        with page_server.lock:
            page_server.visible_pages = N_PAGES
        query.processAllAvailable()
        assert (
            spark.sql("SELECT count(*) c FROM rest_stream").first().c
            == N_PAGES * PAGE_SIZE
        )
        ids = [r.id for r in spark.sql("SELECT id FROM rest_stream").collect()]
        assert sorted(ids) == list(range(N_PAGES * PAGE_SIZE))  # no dups, no gaps
    finally:
        query.stop()


def test_pushdown_prunes_page_requests(spark, page_server):
    """A range predicate on the declared monotonic field must prune
    whole pages BEFORE any HTTP request — and results stay exact
    because Spark re-applies every filter post-scan."""
    pyds.register(spark)
    reader = (
        spark.read.format("rest_pages")
        .schema(DDL)
        .option("url", _url(page_server))
        .option("pages", N_PAGES)
        .option("pages_per_partition", 1)
        .option("monotonic_field", "id")
        .option("rows_per_page", PAGE_SIZE)
    )
    df = reader.load().filter("id >= 21 AND id < 31")  # rows in pages 4..6
    rows = df.collect()
    assert sorted(r.id for r in rows) == list(range(21, 31))
    with page_server.lock:
        hit_pages = set(page_server.hits)
    assert hit_pages == {4, 5, 6}, hit_pages  # pages 0-3 never requested

    # contradictory bound: zero requests, zero rows
    with page_server.lock:
        page_server.hits.clear()
    assert reader.load().filter("id < 0").count() == 0
    with page_server.lock:
        assert page_server.hits == []
