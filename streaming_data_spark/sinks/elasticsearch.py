"""Elasticsearch bulk sink (SURVEY §2.2 K5-ES / §3.2 Logstash output).

The reference ships events to Elasticsearch through Logstash outputs —
a static index (docker-elk/logstash/pipeline/instagram-profiles.conf:61-67)
and a date-stamped one (container-logs.conf:20-27,
``index => "container-logs-%{+YYYY.MM.dd}"``) with basic auth. No
es-hadoop connector ships in this container, so the sink speaks the
public ``/_bulk`` NDJSON HTTP protocol directly with stdlib urllib —
which is also the honest 100 TB design:

- serialization stays JVM-side: ``to_json(struct(*))`` builds each
  document, and the per-row index name (event-date-stamped, so replays
  are deterministic — Logstash uses processing time) is a column too;
  the Python side of ``foreachPartition`` only concatenates strings
  and POSTs.
- each of the N partitions opens its own connection and sends
  ``chunk_docs``-sized bulk requests — no driver collect, no global
  choke point; parallelism = input partitions, exactly how es-hadoop
  distributes writes.
- optional ``id_col`` becomes the bulk action ``_id``: ES then
  overwrites instead of duplicating, making at-least-once replays
  idempotent (the K1/K2 contract, same reason the reference's
  Postgres load uses ON CONFLICT DO NOTHING).
- 429/5xx responses retry with capped exponential backoff (F17's
  min(base·2^n, cap) policy, upbit_data_pipeline.py:54-55).
"""

from __future__ import annotations

import json
from typing import Iterator

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.streaming import DataStreamWriter


def date_stamped_index(prefix: str, ts_col: str | Column) -> Column:
    """Per-row index name ``{prefix}-YYYY.MM.dd`` from an event-time
    column — the container-logs.conf:23 naming, but deterministic
    under replay because it stamps event time, not arrival time."""
    ts = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    return F.concat(F.lit(prefix + "-"), F.date_format(ts, "yyyy.MM.dd"))


def bulk_lines(index: str, doc_json: str, doc_id: str | None = None) -> str:
    """One bulk action pair (action line + source line), NDJSON."""
    action: dict[str, dict[str, str]] = {"index": {"_index": index}}
    if doc_id is not None:
        action["index"]["_id"] = doc_id
    return json.dumps(action, separators=(",", ":")) + "\n" + doc_json + "\n"


def _post_bulk(
    url: str,
    body: str,
    auth_header: str | None,
    max_retries: int,
    backoff_base: float,
    backoff_cap: float,
) -> None:
    import time
    import urllib.error
    import urllib.request

    headers = {"Content-Type": "application/x-ndjson"}
    if auth_header:
        headers["Authorization"] = auth_header
    attempt = 0
    while True:
        req = urllib.request.Request(
            url, data=body.encode("utf-8"), headers=headers, method="POST"
        )
        try:
            with urllib.request.urlopen(req, timeout=60) as resp:
                payload = json.loads(resp.read().decode("utf-8") or "{}")
            if payload.get("errors"):
                raise RuntimeError(f"bulk response reported item errors: {payload}")
            return
        except urllib.error.HTTPError as exc:
            retryable = exc.code == 429 or exc.code >= 500
            if not retryable or attempt >= max_retries:
                raise
        except urllib.error.URLError:
            if attempt >= max_retries:
                raise
        time.sleep(min(backoff_base * (2**attempt), backoff_cap))
        attempt += 1


def write_es_bulk(
    df: DataFrame,
    es_url: str,
    index: str | Column,
    id_col: str | None = None,
    chunk_docs: int = 500,
    user: str | None = None,
    password: str | None = None,
    max_retries: int = 3,
    backoff_base: float = 0.5,
    backoff_cap: float = 30.0,
) -> None:
    """Batch bulk-index ``df`` into Elasticsearch.

    ``index`` is either a fixed name or a per-row Column (e.g.
    ``date_stamped_index("container-logs", "ts")``). Rows are shipped
    partition-parallel in ``chunk_docs``-sized ``/_bulk`` requests.
    """
    idx = F.lit(index) if isinstance(index, str) else index
    cols = [
        idx.cast("string").alias("_sds_index"),
        F.to_json(F.struct(*df.columns)).alias("_sds_doc"),
    ]
    if id_col is not None:
        cols.append(F.col(id_col).cast("string").alias("_sds_id"))
    shipped = df.select(*cols)

    bulk_url = es_url.rstrip("/") + "/_bulk"
    auth_header: str | None = None
    if user is not None:
        import base64

        token = base64.b64encode(f"{user}:{password or ''}".encode()).decode()
        auth_header = f"Basic {token}"
    has_id = id_col is not None

    def _ship(rows: Iterator) -> None:
        buf: list[str] = []
        for row in rows:
            buf.append(
                bulk_lines(
                    row["_sds_index"],
                    row["_sds_doc"],
                    row["_sds_id"] if has_id else None,
                )
            )
            if len(buf) >= chunk_docs:
                _post_bulk(
                    bulk_url, "".join(buf), auth_header,
                    max_retries, backoff_base, backoff_cap,
                )
                buf = []
        if buf:
            _post_bulk(
                bulk_url, "".join(buf), auth_header,
                max_retries, backoff_base, backoff_cap,
            )

    shipped.foreachPartition(_ship)


def es_stream_sink(
    df: DataFrame,
    es_url: str,
    index: str | Column,
    checkpoint: str,
    id_col: str | None = None,
    chunk_docs: int = 500,
    user: str | None = None,
    password: str | None = None,
) -> DataStreamWriter:
    """Streaming ES sink: foreachBatch → ``write_es_bulk``. With
    ``id_col`` set, checkpoint replays overwrite instead of duplicate
    (at-least-once transport, exactly-once-observable index)."""

    def _write(batch: DataFrame, epoch_id: int) -> None:
        write_es_bulk(
            batch, es_url, index, id_col=id_col, chunk_docs=chunk_docs,
            user=user, password=password,
        )

    return df.writeStream.foreachBatch(_write).option("checkpointLocation", checkpoint)
