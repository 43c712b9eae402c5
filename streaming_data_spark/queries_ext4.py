"""Fourth query wave — the remaining BASELINE.json training-data
operators (embedding-cosine near-dup, IVF ANN) and the multi-way
regional-revenue join that exercises the full join pipeline shape
(fact⋈fact shuffle + broadcast dim chain) at benchmark scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_data_spark.operators import multimodal, similarity, skew
from streaming_data_spark.queries import _t

# SQL fragment: deterministic left-fold double dot product, identical
# evaluation order to similarity._dot so both engines agree pre-round.
_DOT = (
    "list_sum(list_transform(range(1, len({a})+1), "
    "i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE))"
)


def _cos(a: str, b: str) -> str:
    return (
        f"{_DOT.format(a=a, b=b)} / "
        f"(sqrt({_DOT.format(a=a, b=a)}) * sqrt({_DOT.format(a=b, b=b)}))"
    )


# --------------------------------------------------------------------------
# X7 — embedding-cosine near-duplicate pairs (dedup family)
# --------------------------------------------------------------------------

NEAR_DUP_THRESHOLD = 0.45  # testdata embeddings are near-orthogonal; max pair ~0.51


def q_x7_cosine_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs form — the correctness baseline the LSH-blocked
    scale path is measured against."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.cosine_near_dup(emb, threshold=NEAR_DUP_THRESHOLD)


# Mirrors similarity.cosine_near_dup exactly: normalize once, then a
# single left-fold dot per pair — same op order, bit-identical doubles.
SQL_X7 = f"""
WITH units AS (
  SELECT vec_id,
         list_transform(embedding, x -> x::DOUBLE /
           sqrt(list_sum(list_transform(embedding, y -> y::DOUBLE * y::DOUBLE)))) AS u
  FROM embeddings
), pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         list_sum(list_transform(range(1, len(a.u)+1), i -> a.u[i] * b.u[i])) AS cosine_raw
  FROM units a, units b
  WHERE a.vec_id < b.vec_id
)
SELECT id_a, id_b, round(cosine_raw, 6) AS cosine
FROM pairs
WHERE cosine_raw >= {NEAR_DUP_THRESHOLD}
"""


def q_x7_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-blocked scale path. Exactly oracle-checkable despite being
    approximate: the multiprobe bucket-join emits pair (a, b) iff
    hamming(sign_bucket(a), sign_bucket(b)) <= 1 — b's home bucket is
    in a's probe set {home} ∪ {home^2^p} (or symmetrically) exactly
    when the two home buckets differ in at most one bit. The sign
    buckets use frozen md5-derived hyperplanes (similarity.py:82-87),
    so DuckDB reproduces them bit-for-bit; the subset/recall property
    vs the exact form remains asserted in tests/test_ext_operators.py."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.cosine_near_dup(emb, threshold=NEAR_DUP_THRESHOLD, n_planes=4)


def _x7_lsh_sql(n_planes: int = 4) -> str:
    from streaming_data_spark.queries_ext import sign_bucket_sql

    return f"""
WITH units AS (
  SELECT vec_id,
         list_transform(embedding, x -> x::DOUBLE /
           sqrt(list_sum(list_transform(embedding, y -> y::DOUBLE * y::DOUBLE)))) AS u,
         {sign_bucket_sql("embedding", n_planes)} AS bucket
  FROM embeddings
), pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         list_sum(list_transform(range(1, len(a.u)+1), i -> a.u[i] * b.u[i])) AS cosine_raw
  FROM units a JOIN units b
    ON a.vec_id < b.vec_id AND bit_count(xor(a.bucket, b.bucket)) <= 1
)
SELECT id_a, id_b, round(cosine_raw, 6) AS cosine
FROM pairs
WHERE cosine_raw >= {NEAR_DUP_THRESHOLD}
"""


SQL_X7_LSH = _x7_lsh_sql()


# --------------------------------------------------------------------------
# X8 — IVF-bucketed approximate top-k (deterministic coarse quantizer)
# --------------------------------------------------------------------------

def q_x8_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    return similarity.ivf_topk(emb, queries, k=5, n_cells=8)


SQL_X8 = f"""
WITH cents AS (
  SELECT vec_id AS cid, embedding AS c_vec
  FROM embeddings ORDER BY vec_id ASC LIMIT 8
), scored_assign AS (
  SELECT e.vec_id, e.embedding, c.cid,
         {_cos("e.embedding", "c.c_vec")} AS c_sim
  FROM embeddings e CROSS JOIN cents c
), assigned AS (
  SELECT vec_id, embedding, cid AS cell,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY c_sim DESC, cid ASC) AS c_rank
  FROM scored_assign
), cells AS (
  SELECT vec_id, embedding, cell FROM assigned WHERE c_rank = 1
), q AS (
  SELECT vec_id AS query_id, embedding AS q_vec, cell
  FROM cells WHERE vec_id < 3
), scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         {_cos("q.q_vec", "c.embedding")} AS cosine_raw
  FROM cells c JOIN q ON c.cell = q.cell AND c.vec_id <> q.query_id
), ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine_raw DESC, neighbor_id ASC) AS rank,
         round(cosine_raw, 6) AS cosine
  FROM scored
)
SELECT query_id, neighbor_id, rank, cosine FROM ranked WHERE rank <= 5
"""

# --------------------------------------------------------------------------
# Q5 shape — regional supplier revenue (5-way join + agg)
# --------------------------------------------------------------------------

def q_q5_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per nation for orders placed in 1996 where customer and
    supplier share a nation, ASIA only (TPC-H Q5 shape).

    Plan at scale: the date filter pushes to the orders scan; the two
    fact⋈fact joins (lineitem⋈orders on orderkey, ⋈customer on
    custkey) shuffle on their keys and AQE sizes them; nation⋈region
    is broadcast into supplier, and the supplier side joins with the
    compound (suppkey, nationkey) condition. No global sort until the
    final ~25-row result.
    """
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    lineitem = _t(spark, sf_dir, "lineitem")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    supplier = _t(spark, sf_dir, "supplier").join(
        F.broadcast(asia_nations),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_nationkey", "n_name")

    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # Join ORDER (r16, guide §2.3/§2.4): orders⋈customer FIRST — that
    # shuffle moves the date-filtered orders (~1/7 of the table, 2
    # narrow columns out) and customer, instead of the previous
    # (lineitem⋈orders)⋈customer order whose second exchange re-shuffled
    # the WIDE joined-lineitem intermediate on custkey. lineitem-derived
    # bytes now cross exactly one exchange. Inner-join reordering;
    # result identical (same oracle).
    orders_cust = orders.join(
        customer, F.col("o_custkey") == F.col("c_custkey")
    ).select("o_orderkey", "c_nationkey")
    return (
        lineitem.join(orders_cust, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.round(F.sum(revenue), 2).alias("revenue"))
    )


SQL_Q5 = """
SELECT n_name AS nation,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


# --------------------------------------------------------------------------
# Skew mitigation — salted forms must be value-identical to unsalted SQL
# --------------------------------------------------------------------------

def q_j_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact⋈dim join: physically spreads each supplier key over
    16 buckets; logically identical to the plain join (the oracle)."""
    lineitem = _t(spark, sf_dir, "lineitem")
    supplier = _t(spark, sf_dir, "supplier").withColumnRenamed("s_suppkey", "l_suppkey")
    return skew.salted_join(
        lineitem.select("l_orderkey", "l_linenumber", "l_suppkey", "l_quantity"),
        supplier.select("l_suppkey", "s_name"),
        on=["l_suppkey"],
    )


SQL_SALTED_JOIN = """
SELECT l_orderkey, l_linenumber, l_suppkey, l_quantity, s_name
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
"""


def q_a_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation — reduce side of each key split
    across 16 tasks; same totals as the direct GROUP BY."""
    lineitem = _t(spark, sf_dir, "lineitem")
    out = skew.salted_agg(
        lineitem, ["l_suppkey"], {"l_quantity": "sum", "l_orderkey": "count"}
    )
    return out.select(
        "l_suppkey",
        F.round("sum_l_quantity", 2).alias("sum_qty"),
        F.col("count_l_orderkey").alias("n_items"),
    )


SQL_SALTED_AGG = """
SELECT l_suppkey,
       round(sum(l_quantity), 2) AS sum_qty,
       count(l_orderkey) AS n_items
FROM lineitem
GROUP BY l_suppkey
"""


# --------------------------------------------------------------------------
# X9 — multimodal feature-extraction pipeline (X4 plumbing, end to end)
# --------------------------------------------------------------------------

def q_x9_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column pipeline: documents.text → opaque binary payload →
    Arrow-batched mapInPandas decode (the stubbed-fake kernel) →
    per-item feature columns. The oracle replicates the sha256-seeded
    fake decoder exactly — including the float32 leg — proving the
    plumbing (schema, batching, UDF signature) end to end."""
    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
    )
    feats = multimodal.extract_features(media, decoder="fake")
    return feats.select(
        "media_id",
        "n_bytes",
        *[
            F.round(F.element_at("features", j + 1).cast("double"), 6).alias(f"f{j}")
            for j in range(4)
        ],
    )


def _x9_sql() -> str:
    cols = ",\n       ".join(
        f"round((('0x' || substr(sha256(text), {2 * j + 1}, 2))::INT / 255.0)::REAL::DOUBLE, 6) AS f{j}"
        for j in range(4)
    )
    return f"""
SELECT doc_id AS media_id,
       octet_length(encode(text)) AS n_bytes,
       {cols}
FROM documents
"""


SQL_X9 = _x9_sql()


EXT4_QUERIES = {
    "x7_cosine_near_dup": q_x7_cosine_near_dup,
    "x7_near_dup_lsh": q_x7_near_dup_lsh,
    "x8_ivf_topk": q_x8_ivf_topk,
    "q5_regional_revenue": q_q5_regional_revenue,
    "j_salted_join": q_j_salted_join,
    "a_salted_agg": q_a_salted_agg,
    "x9_media_features": q_x9_media_features,
}

EXT4_ORACLES = {
    "x7_cosine_near_dup": SQL_X7,
    "x7_near_dup_lsh": SQL_X7_LSH,
    "x8_ivf_topk": SQL_X8,
    "q5_regional_revenue": SQL_Q5,
    "j_salted_join": SQL_SALTED_JOIN,
    "a_salted_agg": SQL_SALTED_AGG,
    "x9_media_features": SQL_X9,
}
