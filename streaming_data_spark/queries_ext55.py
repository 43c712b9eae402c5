"""Fifty-fifth query wave — chunk-grain dedup, inequality, tokenizer
planning, rate spikes:

- x81_chunk_dedup: duplicate detection at CHUNK granularity —
  non-overlapping 32-token chunks hashed corpus-wide; a chunk
  instance is a duplicate when a smaller (doc_id, chunk_id) already
  carries the same digest. Emits per-doc chunk counts and the dup
  fraction: the paragraph-level redundancy signal (doc-level exact
  dedup misses partially copied documents; x2's shingle Jaccard
  finds near-dup PAIRS — this measures how much of each doc is
  literal re-used text).
- a61_revenue_gini: Gini coefficient of customer revenue — the
  inequality readout behind x61's top-k concentration (one number a
  capacity/abuse model consumes directly). Σi·x_i over equal values
  is tie-order-invariant, so the (revenue, custkey) sort is
  deterministic cross-engine.
- x82_vocab_coverage: token-mass coverage of the top-{10,100,1000}
  vocabulary — the tokenizer-budget planning curve (how big a vocab
  buys how much of the corpus).
- a64_burst_ratio: per-user minute-grain burst factor — max over
  mean events per ACTIVE minute; the rate-limit/abuse screening
  profile.

Scale shapes: x81 = chunk explode + digest-keyed min + doc re-agg
(the x66 shape at chunk grain); a61 = customer-grain agg + ONE
sanctioned partition-less window over it (same class as a38/x61) +
1-row broadcast; x82 = vocab groupBy + TakeOrderedAndProject(1000)
+ a window over the bounded 1000-row slice + 1-row total broadcast;
a64 = (user, minute) groupBy folded into a user-grain agg.

[EXT]-classic per SURVEY.md §2.11 scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streaming_data_spark.operators import chunking
from streaming_data_spark.queries import _t

DEDUP_CHUNK_TOKENS = 32
VOCAB_KS = (10, 100, 1000)


def q_x81_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_chunks, n_dup_chunks, dup_frac): share of each doc's
    non-overlapping 32-token chunks whose text already occurs at a
    smaller (doc_id, chunk_id)."""
    docs = _t(spark, sf_dir, "documents")
    # two consumers (first-occurrence groupBy + the scoring join) —
    # ONE chunk explode, materialized at (doc, chunk, digest) grain
    # (r16 opt; the x63/x66 fix — the digest projection drops
    # chunk_text BEFORE the checkpoint so the materialized bytes are
    # ids + one md5 per chunk, not the chunk text)
    chunks = chunking.chunk_documents(
        docs, "doc_id", "text",
        chunk_tokens=DEDUP_CHUNK_TOKENS, overlap=0,
    ).select(
        "doc_id", "chunk_id", F.md5("chunk_text").alias("digest")
    ).localCheckpoint(eager=True)
    first = chunks.groupBy("digest").agg(
        F.min(F.struct("doc_id", "chunk_id")).alias("keep")
    )
    return (
        chunks.join(first, "digest")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(
                F.when(
                    (F.col("keep.doc_id") != F.col("doc_id"))
                    | (F.col("keep.chunk_id") != F.col("chunk_id")),
                    1,
                ).otherwise(0)
            ).alias("n_dup_chunks"),
        )
        .select(
            "doc_id",
            "n_chunks",
            "n_dup_chunks",
            F.round(F.col("n_dup_chunks") / F.col("n_chunks"), 6).alias(
                "dup_frac"
            ),
        )
    )


SQL_X81 = rf"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
), nums AS (
  SELECT doc_id, t,
         ceil(greatest(len(t), 1) / {float(DEDUP_CHUNK_TOKENS)})::BIGINT AS nc
  FROM toks
), c AS (
  SELECT doc_id, t, unnest(range(0, nc)) AS chunk_id FROM nums
), chunks AS (
  SELECT doc_id, chunk_id,
         md5(array_to_string(list_slice(t, chunk_id * {DEDUP_CHUNK_TOKENS} + 1,
                 chunk_id * {DEDUP_CHUNK_TOKENS} + {DEDUP_CHUNK_TOKENS}), ' '))
           AS digest
  FROM c
), first AS (
  SELECT digest, min(ROW(doc_id, chunk_id)) AS keep FROM chunks GROUP BY digest
)
SELECT ch.doc_id,
       count(*) AS n_chunks,
       CAST(sum(CASE WHEN f.keep <> ROW(ch.doc_id, ch.chunk_id)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
       round(sum(CASE WHEN f.keep <> ROW(ch.doc_id, ch.chunk_id)
                 THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS dup_frac
FROM chunks ch JOIN first f USING (digest)
GROUP BY ch.doc_id
"""


def q_a61_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_customers, total_revenue, gini): Gini coefficient of
    per-customer order revenue."""
    orders = _t(spark, sf_dir, "orders")
    cust = orders.groupBy("o_custkey").agg(
        F.sum("o_totalprice").alias("rev")
    )
    # customer-grain aggregate: the partition-less rank is sanctioned
    # (a38/x61 class); Σi·x over equal x is tie-order-invariant
    w = Window.orderBy(F.asc("rev"), F.asc("o_custkey"))
    ranked = cust.withColumn("i", F.row_number().over(w))
    return ranked.agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum("rev"), 2).alias("total_revenue"),
        F.round(
            2 * F.sum(F.col("i") * F.col("rev"))
            / (F.count(F.lit(1)) * F.sum("rev"))
            - (F.count(F.lit(1)) + 1) / F.count(F.lit(1)),
            6,
        ).alias("gini"),
    )


SQL_A61 = """
WITH cust AS (
  SELECT o_custkey, sum(o_totalprice) AS rev FROM orders GROUP BY o_custkey
), ranked AS (
  SELECT rev, row_number() OVER (ORDER BY rev ASC, o_custkey ASC) AS i
  FROM cust
)
SELECT count(*) AS n_customers,
       round(sum(rev), 2) AS total_revenue,
       round(2 * sum(i * rev) / (count(*) * sum(rev))
             - (count(*) + 1.0) / count(*), 6) AS gini
FROM ranked
"""


def q_x82_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(k, covered, total_tokens, coverage): corpus token mass covered
    by the top-k vocabulary, k in {10, 100, 1000}."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok")
    )
    vocab = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total_tokens"))
    top = vocab.orderBy(F.desc("cnt"), F.asc("tok")).limit(max(VOCAB_KS))
    # the rank window runs over the bounded top-1000 slice only
    ranked = top.withColumn(
        "rk",
        F.row_number().over(Window.orderBy(F.desc("cnt"), F.asc("tok"))),
    )
    sums = ranked.agg(
        *[
            F.sum(F.when(F.col("rk") <= k, F.col("cnt")).otherwise(0)).alias(
                f"c{k}"
            )
            for k in VOCAB_KS
        ]
    )
    stacked = sums.select(
        F.expr(
            "stack("
            + str(len(VOCAB_KS))
            + ", "
            + ", ".join(f"{k}, c{k}" for k in VOCAB_KS)
            + ") as (k, covered)"
        )
    )
    return stacked.crossJoin(F.broadcast(total)).select(
        "k",
        "covered",
        "total_tokens",
        F.round(F.col("covered") / F.col("total_tokens"), 6).alias(
            "coverage"
        ),
    )


SQL_X82 = rf"""
WITH tok AS (
  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
  FROM documents
), vocab AS (
  SELECT tok, count(*) AS cnt FROM tok GROUP BY tok
), total AS (SELECT CAST(sum(cnt) AS BIGINT) AS total_tokens FROM vocab),
ranked AS (
  SELECT cnt, row_number() OVER (ORDER BY cnt DESC, tok ASC) AS rk
  FROM vocab
  ORDER BY cnt DESC, tok ASC LIMIT {max(VOCAB_KS)}
), ks AS (SELECT unnest([{", ".join(str(k) for k in VOCAB_KS)}]) AS k)
SELECT ks.k,
       (SELECT CAST(sum(CASE WHEN r.rk <= ks.k THEN r.cnt ELSE 0 END)
                    AS BIGINT)
        FROM ranked r) AS covered,
       t.total_tokens,
       round((SELECT sum(CASE WHEN r.rk <= ks.k THEN r.cnt ELSE 0 END)
              FROM ranked r) * 1.0 / t.total_tokens, 6) AS coverage
FROM ks CROSS JOIN total t
"""


def q_a64_burst_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, n_active_minutes, max_per_min, mean_per_min, burst):
    per-user peak-to-mean events per active minute."""
    ev = _t(spark, sf_dir, "events")
    cells = ev.groupBy(
        "user_id", F.date_trunc("minute", F.col("ts")).alias("minute")
    ).agg(F.count(F.lit(1)).alias("c"))
    return cells.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_active_minutes"),
        F.max("c").alias("max_per_min"),
        F.round(F.avg("c"), 6).alias("mean_per_min"),
        F.round(F.max("c") / F.avg("c"), 6).alias("burst"),
    )


SQL_A64 = """
WITH cells AS (
  SELECT user_id, date_trunc('minute', ts) AS minute, count(*) AS c
  FROM events GROUP BY 1, 2
)
SELECT user_id,
       count(*) AS n_active_minutes,
       max(c) AS max_per_min,
       round(avg(c), 6) AS mean_per_min,
       round(max(c) / avg(c), 6) AS burst
FROM cells
GROUP BY user_id
"""


EXT55_QUERIES = {
    "x81_chunk_dedup": q_x81_chunk_dedup,
    "a61_revenue_gini": q_a61_revenue_gini,
    "x82_vocab_coverage": q_x82_vocab_coverage,
    "a64_burst_ratio": q_a64_burst_ratio,
}

EXT55_ORACLES = {
    "x81_chunk_dedup": SQL_X81,
    "a61_revenue_gini": SQL_A61,
    "x82_vocab_coverage": SQL_X82,
    "a64_burst_ratio": SQL_A64,
}
