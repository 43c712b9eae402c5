"""Sixty-fourth query wave — graded ranking eval, ANN hubness
diagnostics, customer decile migration:

- x102_ndcg_eval: NDCG@10 of the multiprobe sign-LSH top-k tier
  against the exact-cosine ground truth — the GRADED complement to
  the binary recall trilogy (x71/x80/x90): a tier that finds 9 of
  10 neighbors but puts the best one last scores the same recall
  yet much lower NDCG. Gains are linear (rel = 11 − gt_rank, 0 if
  outside the gt list) and the discount uses natural log (the
  ln-DCG variant) so both engines share the one libm function the
  suite already trusts; IDCG is a Python-computed constant
  interpolated into BOTH engines verbatim.
- x103_hubness_koccurrence: the k-occurrence histogram (how many
  vectors appear in exactly n other vectors' cosine top-10) over a
  bounded sample — the classic high-dimensional HUBNESS diagnostic
  (Radovanović et al. JMLR 2010, public): a heavy right tail means
  a few "hub" vectors dominate every neighbor list and ANN-based
  dedup/retrieval quality silently degrades. Includes the
  never-referenced count at k_occurrence = 0 (antihubs) via an
  anti-join side.
- a81_decile_migration: the year-over-year revenue-decile
  transition matrix — customers ntile(10)-ranked within 1995 and
  1996 order revenue, counted per (decile_from, decile_to) cell.
  The retention/churn mobility table every CRM review starts from;
  ties broken (rounded revenue, custkey) so bucket assignment is
  deterministic in any engine.

Scale shapes: x102 = both ranking legs ride the existing
bounded-query plans (8 broadcast queries each; the LSH leg scans
(n_planes+1)/2^n_planes of the corpus), joined on (query, neighbor)
≤ 80 rows, per-query agg; x103 = the exact all-pairs leg is
O(sample²) by definition, so it runs on the ABSOLUTELY bounded x45
sample (no-op at test SFs, a cap at 100×) — then one neighbor-keyed
groupBy + one ≤|sample|-row histogram groupBy; a81 = two
customer-grain year aggs, per-year ntile windows over
customer-grain rows, one keyed self-join folded into a ≤100-cell
groupBy.

[EXT]-classic per SURVEY.md §2.11 scope.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streaming_data_spark.operators import similarity
from streaming_data_spark.queries import _t
from streaming_data_spark.queries_ext import sign_bucket_sql

NDCG_K = 10
NDCG_QUERIES = 8
NDCG_PLANES = 4
# IDCG@10 with linear gains, ln discount — one Python constant shipped
# to BOTH engines as the same literal (no cross-engine summation)
IDCG = sum(float(NDCG_K - r + 1) / math.log(1.0 + r) for r in range(1, NDCG_K + 1))

HUB_SAMPLE_CAP = 1000
HUB_K = 10

MIG_YEAR_FROM, MIG_YEAR_TO = 1995, 1996
MIG_DECILES = 10


# --------------------------------------------------------------------------
# x102 — NDCG@10 of the sign-LSH tier vs exact cosine
# --------------------------------------------------------------------------

def q_x102_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, n_hits, dcg, ndcg): graded quality of the multiprobe
    sign-LSH top-10 against exact-cosine ground truth, per query."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < NDCG_QUERIES)
    gt = similarity.cosine_topk(emb, queries, k=NDCG_K).select(
        "query_id", "neighbor_id", F.col("rank").alias("gt_rank")
    )
    approx = similarity.signlsh_topk(
        emb, queries, k=NDCG_K, n_planes=NDCG_PLANES
    ).select("query_id", "neighbor_id", F.col("rank").alias("apx_rank"))
    joined = approx.join(gt, ["query_id", "neighbor_id"], "left")
    rel = F.coalesce(
        F.lit(NDCG_K + 1) - F.col("gt_rank"), F.lit(0)
    ).cast("double")
    term = rel / F.log(F.lit(1.0) + F.col("apx_rank"))
    return (
        joined.groupBy("query_id")
        .agg(
            F.sum(F.when(F.col("gt_rank").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_hits"),
            F.sum(term).alias("_dcg_raw"),
        )
        .select(
            "query_id",
            "n_hits",
            F.round("_dcg_raw", 6).alias("dcg"),
            F.round(F.col("_dcg_raw") / F.lit(IDCG), 6).alias("ndcg"),
        )
    )


_COS_SQL = (
    "list_sum(list_transform(range(1, len(q.q_vec)+1),"
    " i -> q.q_vec[i]::DOUBLE * e.embedding[i]::DOUBLE))"
    " / (sqrt(list_sum(list_transform(range(1, len(q.q_vec)+1),"
    " i -> q.q_vec[i]::DOUBLE * q.q_vec[i]::DOUBLE)))"
    " * sqrt(list_sum(list_transform(range(1, len(e.embedding)+1),"
    " i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE))))"
)

_PROBE_LIST = ", ".join(
    ["home"] + [f"xor(home, {2 ** p})" for p in range(NDCG_PLANES)]
)

SQL_X102 = f"""
WITH b AS (
  SELECT vec_id, embedding,
         {sign_bucket_sql("embedding", NDCG_PLANES)} AS bucket
  FROM embeddings
), q0 AS (
  SELECT vec_id AS query_id, embedding AS q_vec, bucket AS home
  FROM b WHERE vec_id < {NDCG_QUERIES}
), probes AS (
  SELECT query_id, unnest([{_PROBE_LIST}]) AS bucket FROM q0
), cand AS (
  SELECT DISTINCT p.query_id, c.vec_id AS neighbor_id
  FROM b c JOIN probes p ON c.bucket = p.bucket AND c.vec_id <> p.query_id
), apx_scored AS (
  SELECT cand.query_id, cand.neighbor_id, {_COS_SQL} AS cosine_raw
  FROM cand
  JOIN q0 q ON q.query_id = cand.query_id
  JOIN embeddings e ON e.vec_id = cand.neighbor_id
), apx AS (
  SELECT query_id, neighbor_id,
    row_number() OVER (PARTITION BY query_id
                       ORDER BY cosine_raw DESC, neighbor_id ASC) AS apx_rank
  FROM apx_scored
), gt_scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, {_COS_SQL} AS cosine_raw
  FROM embeddings e, q0 q
  WHERE e.vec_id <> q.query_id
), gt AS (
  SELECT query_id, neighbor_id,
    row_number() OVER (PARTITION BY query_id
                       ORDER BY cosine_raw DESC, neighbor_id ASC) AS gt_rank
  FROM gt_scored
), joined AS (
  SELECT a.query_id,
         COALESCE({NDCG_K + 1} - g.gt_rank, 0)::DOUBLE
           / ln(1.0 + a.apx_rank) AS term,
         CASE WHEN g.gt_rank IS NOT NULL THEN 1 ELSE 0 END AS hit
  FROM (SELECT * FROM apx WHERE apx_rank <= {NDCG_K}) a
  LEFT JOIN (SELECT * FROM gt WHERE gt_rank <= {NDCG_K}) g
    ON a.query_id = g.query_id AND a.neighbor_id = g.neighbor_id
)
SELECT query_id, CAST(sum(hit) AS BIGINT) AS n_hits,
       round(sum(term), 6) AS dcg,
       round(sum(term) / {IDCG!r}, 6) AS ndcg
FROM joined GROUP BY query_id
"""


# --------------------------------------------------------------------------
# x103 — hubness: k-occurrence histogram over a bounded sample
# --------------------------------------------------------------------------

def q_x103_hubness_koccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(k_occurrence, n_vectors): how many sample vectors appear in
    exactly k other sample vectors' cosine top-10 (0-bucket = antihubs
    never referenced by anyone)."""
    emb = _t(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < HUB_SAMPLE_CAP
    )
    # the capped sample reads as ONE parquet split, which would put
    # the whole |sample|² scoring loop on a single task — spread the
    # corpus side first (2000-row shuffle, fixed cost) so the O(N²)
    # work parallelizes
    corpus = emb.repartition(64)
    topk = similarity.cosine_topk(corpus, emb, k=HUB_K)
    occ = topk.groupBy("neighbor_id").agg(
        F.count(F.lit(1)).alias("k_occurrence")
    )
    with_zero = (
        emb.select(F.col("vec_id").alias("neighbor_id"))
        .join(occ, "neighbor_id", "left")
        .select(
            F.coalesce(F.col("k_occurrence"), F.lit(0).cast("long")).alias(
                "k_occurrence"
            )
        )
    )
    return with_zero.groupBy("k_occurrence").agg(
        F.count(F.lit(1)).alias("n_vectors")
    )


SQL_X103 = f"""
WITH samp AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id < {HUB_SAMPLE_CAP}
), q0 AS (
  SELECT vec_id AS query_id, embedding AS q_vec FROM samp
), scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, {_COS_SQL} AS cosine_raw
  FROM samp e, q0 q
  WHERE e.vec_id <> q.query_id
), ranked AS (
  SELECT query_id, neighbor_id,
    row_number() OVER (PARTITION BY query_id
                       ORDER BY cosine_raw DESC, neighbor_id ASC) AS rank
  FROM scored
), occ AS (
  SELECT neighbor_id, count(*) AS k_occurrence
  FROM ranked WHERE rank <= {HUB_K}
  GROUP BY neighbor_id
), with_zero AS (
  SELECT COALESCE(o.k_occurrence, 0) AS k_occurrence
  FROM samp s LEFT JOIN occ o ON s.vec_id = o.neighbor_id
)
SELECT CAST(k_occurrence AS BIGINT) AS k_occurrence,
       CAST(count(*) AS BIGINT) AS n_vectors
FROM with_zero GROUP BY k_occurrence
"""


# --------------------------------------------------------------------------
# a81 — year-over-year revenue decile migration matrix
# --------------------------------------------------------------------------

def q_a81_decile_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(decile_from, decile_to, n_customers): 1995→1996 revenue-decile
    transition cells for customers active in both years. ONE scan:
    both years aggregate in the same pass and the ntile window is
    keyed by year (customer-grain partitions, never fact-grain)."""
    orders = _t(spark, sf_dir, "orders")
    rev = (
        orders.withColumn("yr", F.year("o_orderdate"))
        .filter(F.col("yr").isin(MIG_YEAR_FROM, MIG_YEAR_TO))
        .groupBy("yr", "o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 6).alias("rev"))
    )
    w = Window.partitionBy("yr").orderBy(F.asc("rev"), F.asc("o_custkey"))
    deciled = rev.select(
        "yr", "o_custkey", F.ntile(MIG_DECILES).over(w).alias("decile")
    )
    d_from = deciled.filter(F.col("yr") == MIG_YEAR_FROM).select(
        "o_custkey", F.col("decile").alias("decile_from")
    )
    d_to = deciled.filter(F.col("yr") == MIG_YEAR_TO).select(
        "o_custkey", F.col("decile").alias("decile_to")
    )
    return (
        d_from.join(d_to, "o_custkey")
        .groupBy("decile_from", "decile_to")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


SQL_A81 = f"""
WITH rev AS (
  SELECT year(o_orderdate) AS yr, o_custkey,
         round(sum(o_totalprice), 6) AS rev
  FROM orders
  WHERE year(o_orderdate) IN ({MIG_YEAR_FROM}, {MIG_YEAR_TO})
  GROUP BY 1, 2
), deciled AS (
  SELECT yr, o_custkey,
         ntile({MIG_DECILES}) OVER (PARTITION BY yr
                                    ORDER BY rev ASC, o_custkey ASC) AS decile
  FROM rev
)
SELECT f.decile AS decile_from, t.decile AS decile_to,
       CAST(count(*) AS BIGINT) AS n_customers
FROM deciled f JOIN deciled t ON f.o_custkey = t.o_custkey
WHERE f.yr = {MIG_YEAR_FROM} AND t.yr = {MIG_YEAR_TO}
GROUP BY 1, 2
"""


EXT64_QUERIES = {
    "x102_ndcg_eval": q_x102_ndcg_eval,
    "x103_hubness_koccurrence": q_x103_hubness_koccurrence,
    "a81_decile_migration": q_a81_decile_migration,
}

EXT64_ORACLES = {
    "x102_ndcg_eval": SQL_X102,
    "x103_hubness_koccurrence": SQL_X103,
    "a81_decile_migration": SQL_A81,
}
