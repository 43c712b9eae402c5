"""[EXT] Document chunking and sequence packing (SURVEY.md §2.11 X3
adjacents — the steps between a cleaned corpus and a training batch).

- ``chunk_documents`` — split each document into fixed-size token
  windows with overlap (context-window carving). Pure JVM array ops:
  tokenize once, then each chunk is a ``slice`` of the token array —
  no Python in the row path, cost linear in document length.
- ``pack_sequences`` — greedy first-fit packing of chunks into
  training sequences of a max token budget. Packing is inherently
  sequential WITHIN a bin stream, so it runs per hash-bucket via
  ``applyInPandas`` (buckets are independent → embarrassingly
  parallel); determinism comes from packing in (doc_id, chunk_id)
  order inside each bucket.

Scale: chunking is a narrow map + explode (no shuffle at all — chunks
inherit the parent's partition). Packing shuffles once on the bucket
key; bucket count is the parallelism knob and each bucket's state is
one integer (current fill), so memory is flat regardless of corpus
size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """Carve each document into windows of ``chunk_tokens`` whitespace
    tokens advancing by ``chunk_tokens - overlap``; the final partial
    window is kept (training pipelines pad it). Returns
    (id, chunk_id, n_tokens, chunk_text); a document shorter than one
    stride yields exactly one chunk.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f"need 0 <= overlap < chunk_tokens, got {overlap}")
    stride = chunk_tokens - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    # number of windows: ceil(max(ntok - overlap, 1) / stride)
    n_chunks = F.ceil(
        F.greatest(F.size(toks) - overlap, F.lit(1)) / F.lit(stride)
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice(toks, i * stride + 1, chunk_tokens),
    )
    return (
        df.select(F.col(id_col), F.posexplode(chunks).alias("chunk_id", "_ctoks"))
        .select(
            id_col,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.size("_ctoks").cast("long").alias("n_tokens"),
            F.concat_ws(" ", "_ctoks").alias("chunk_text"),
        )
    )


def pack_sequences(
    chunks: DataFrame,
    id_col: str = "doc_id",
    chunk_col: str = "chunk_id",
    size_col: str = "n_tokens",
    max_tokens: int = 128,
    n_buckets: int = 8,
    bucket_expr: F.Column | None = None,
) -> DataFrame:
    """Greedy in-order first-fit packing: within each hash bucket,
    walk chunks in (id, chunk_id) order and open a new sequence
    whenever adding the next chunk would exceed ``max_tokens``.
    Returns the input plus (bucket, seq_id, seq_fill) where seq_id
    numbers sequences within a bucket and seq_fill is the running
    token count after placing the chunk.

    A chunk longer than ``max_tokens`` gets a sequence of its own
    (never dropped — the caller decides whether to truncate).

    ``bucket_expr`` overrides the bucket assignment (default
    ``pmod(xxhash64(id), n_buckets)``); pass a plain-SQL-expressible
    form (e.g. ``pmod(id, n)``) when cross-engine determinism matters
    more than hash mixing.
    """
    import pandas as pd  # noqa: F401 — applyInPandas dependency

    if bucket_expr is None:
        bucket_expr = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets))
    bucketed = chunks.withColumn("bucket", bucket_expr.cast("int"))

    def _pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values([id_col, chunk_col]).reset_index(drop=True)
        seq_ids, fills = [], []
        seq, fill = 0, 0
        for s in pdf[size_col]:
            s = int(s)
            if fill > 0 and fill + s > max_tokens:
                seq += 1
                fill = 0
            fill += s
            seq_ids.append(seq)
            fills.append(fill)
        pdf["seq_id"] = seq_ids
        pdf["seq_fill"] = fills
        return pdf

    in_fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in bucketed.schema)
    out_schema = f"{in_fields}, seq_id long, seq_fill long"
    return bucketed.groupBy("bucket").applyInPandas(_pack, schema=out_schema)
