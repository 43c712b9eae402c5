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
                self.send_response(srv.fail_code)  # type: ignore[attr-defined]
                self.end_headers()
                return
            if srv.junk_budget > 0:  # type: ignore[attr-defined]
                srv.junk_budget -= 1  # type: ignore[attr-defined]
                body = json.dumps({"error": "maintenance"}).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
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
    srv.fail_code = 503  # type: ignore[attr-defined]
    srv.junk_budget = 0  # type: ignore[attr-defined]
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


def test_pushdown_with_nonzero_start_page(spark, page_server):
    """monotonic_field ids are ABSOLUTE (id = page*rows_per_page + i),
    so pruning must map id bounds straight to absolute page numbers
    even when the scan window starts at start_page != 0 — the round-2
    arithmetic would have shifted the window and silently dropped
    matching pages."""
    pyds.register(spark)
    reader = (
        spark.read.format("rest_pages")
        .schema(DDL)
        .option("url", _url(page_server))
        .option("start_page", 2)
        .option("pages", N_PAGES - 2)  # window = pages 2..6
        .option("pages_per_partition", 1)
        .option("monotonic_field", "id")
        .option("rows_per_page", PAGE_SIZE)
    )
    df = reader.load().filter("id >= 21 AND id < 31")  # rows in pages 4..6
    assert sorted(r.id for r in df.collect()) == list(range(21, 31))
    with page_server.lock:
        hit_pages = set(page_server.hits)
    assert hit_pages == {4, 5, 6}, hit_pages

    # bounds below the window clamp to it: nothing outside 2..6 is hit
    with page_server.lock:
        page_server.hits.clear()
    got = sorted(r.id for r in reader.load().filter("id < 18").collect())
    assert got == list(range(10, 18))  # window starts at page 2 → id 10
    with page_server.lock:
        assert set(page_server.hits) == {2, 3}


def test_nonlist_200_body_is_retried_not_dropped(spark, page_server):
    """A 200 whose JSON body is an {"error": ...} object must NOT be
    coerced to [] (that would silently drop the page); it is retried
    and the full dataset still arrives."""
    page_server.junk_budget = 2
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


def test_permanent_4xx_fails_fast(page_server):
    """401 must raise immediately — exactly one request, no backoff
    walk through the retry budget."""
    page_server.fail_budget = 10 ** 6
    page_server.fail_code = 401
    with pytest.raises(Exception) as exc_info:
        pyds._fetch_page(_url(page_server), 0, max_retries=5, base=10.0, cap=3600.0)
    assert "401" in str(exc_info.value)
    with page_server.lock:
        assert page_server.hits == [0]  # no retries burned
