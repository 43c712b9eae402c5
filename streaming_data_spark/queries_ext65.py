"""Sixty-fifth query wave — quantization retrieval impact, k-NN graph
reciprocity, promotion lift:

- x104_quantized_recall: recall@10 of int8-quantized cosine retrieval
  against full-precision cosine — the eval that tells you whether the
  4× memory/bandwidth win of int8 embeddings costs retrieval quality
  (the production question behind every vector-store quantization
  knob; complements x24's pure reconstruction-error view). Symmetric
  per-vector quantization q_i = clamp(floor(v_i/scale + 0.5), ±127),
  scale = max|v|/127 — floor(x+0.5) instead of round() because
  HALF_UP rounding is NOT engine-portable at binary boundaries while
  floor on exact IEEE sums is. All quantized dot products are sums
  of ≤64 integer products < 2^53, so they are EXACT doubles in any
  summation order — the one place a multi-term float sum needs no
  rounding contract at all.
- x105_knn_reciprocity: per-rank mutuality of the cosine top-10
  graph over the x45-bounded sample — what fraction of "b is a's
  rank-r neighbor" edges are reciprocated at any rank? Rank-1 edges
  reciprocate far more than rank-10 edges in healthy embeddings;
  a flat curve is the hubness pathology x103 measures from the
  other side.
- a82_promo_lift_curve: quantity and discounted-revenue response per
  discount level (the 0–10% grid), with lift vs the zero-discount
  baseline — the "did the promo actually move volume" table.
  Discount keys land on an exact integer grid via floor(d·100+0.5),
  never a double groupBy key.

Scale shapes: x104 = two 8-broadcast-query ranking legs (corpus
quantization is a per-row map) joined k-bounded; x105 = the bounded
O(sample²) leg spread round-robin (x103 discipline) + one
self-join on reversed pairs + a ≤k-row groupBy; a82 = ONE map-side
agg to the ≤11-row discount grid + a 1-row broadcast baseline join.

[EXT]-classic per SURVEY.md §2.11 scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_data_spark.operators import similarity
from streaming_data_spark.operators.similarity import _topk_ranked
from streaming_data_spark.queries import _t

QR_K = 10
QR_QUERIES = 8
QR_LEVELS = 127

REC_SAMPLE_CAP = 1000
REC_K = 10


# --------------------------------------------------------------------------
# x104 — int8 quantization impact on top-k recall
# --------------------------------------------------------------------------

def _quantize(vec):
    """int8 symmetric quantization as a DOUBLE array (values are exact
    small integers; floor(x+0.5) is the engine-portable rounding)."""
    maxabs = F.aggregate(
        vec,
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
    )
    scale = maxabs / F.lit(float(QR_LEVELS))
    return F.transform(
        vec,
        lambda x: F.greatest(
            F.lit(-float(QR_LEVELS)),
            F.least(
                F.lit(float(QR_LEVELS)),
                F.floor(x.cast("double") / scale + F.lit(0.5)).cast("double"),
            ),
        ),
    )


def _int_dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def q_x104_quantized_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, n_common, recall): overlap of int8-quantized cosine
    top-10 with full-precision cosine top-10, per query."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < QR_QUERIES)
    exact = similarity.cosine_topk(emb, queries, k=QR_K).select(
        "query_id", "neighbor_id", F.lit(True).alias("_e")
    )
    qcorpus = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        _quantize(F.col("embedding")).alias("c_q"),
    )
    qqueries = F.broadcast(
        queries.select(
            F.col("vec_id").alias("query_id"),
            _quantize(F.col("embedding")).alias("q_q"),
        )
    )
    scored = (
        qcorpus.crossJoin(qqueries)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                _int_dot(F.col("q_q"), F.col("c_q"))
                / (
                    F.sqrt(_int_dot(F.col("q_q"), F.col("q_q")))
                    * F.sqrt(_int_dot(F.col("c_q"), F.col("c_q")))
                )
            ).alias("cosine_raw"),
        )
    )
    quant = _topk_ranked(scored, QR_K).select(
        "query_id", "neighbor_id", F.lit(True).alias("_q")
    )
    return (
        exact.join(quant, ["query_id", "neighbor_id"], "inner")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .select(
            "query_id",
            "n_common",
            (F.col("n_common") / F.lit(float(QR_K))).alias("recall"),
        )
    )


_QVEC = (
    "list_transform(embedding, x -> greatest(-127.0, least(127.0,"
    " floor(x::DOUBLE / (list_max(list_transform(embedding,"
    " v -> abs(v::DOUBLE))) / 127.0) + 0.5))))"
)

_COS_SQL = (
    "list_sum(list_transform(range(1, len(q.q_vec)+1),"
    " i -> q.q_vec[i]::DOUBLE * e.embedding[i]::DOUBLE))"
    " / (sqrt(list_sum(list_transform(range(1, len(q.q_vec)+1),"
    " i -> q.q_vec[i]::DOUBLE * q.q_vec[i]::DOUBLE)))"
    " * sqrt(list_sum(list_transform(range(1, len(e.embedding)+1),"
    " i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE))))"
)

_COS_Q_SQL = (
    "list_sum(list_transform(range(1, len(q.q_q)+1),"
    " i -> q.q_q[i] * e.c_q[i]))"
    " / (sqrt(list_sum(list_transform(range(1, len(q.q_q)+1),"
    " i -> q.q_q[i] * q.q_q[i])))"
    " * sqrt(list_sum(list_transform(range(1, len(e.c_q)+1),"
    " i -> e.c_q[i] * e.c_q[i]))))"
)

SQL_X104 = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS q_vec FROM embeddings
  WHERE vec_id < {QR_QUERIES}
), ex_scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, {_COS_SQL} AS cosine_raw
  FROM embeddings e, q WHERE e.vec_id <> q.query_id
), ex AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
      row_number() OVER (PARTITION BY query_id
                         ORDER BY cosine_raw DESC, neighbor_id ASC) AS rank
    FROM ex_scored
  ) WHERE rank <= {QR_K}
), qc AS (
  SELECT vec_id AS neighbor_id, {_QVEC} AS c_q FROM embeddings
), qq AS (
  SELECT vec_id AS query_id, {_QVEC} AS q_q FROM embeddings
  WHERE vec_id < {QR_QUERIES}
), qt_scored AS (
  SELECT q.query_id, e.neighbor_id, {_COS_Q_SQL} AS cosine_raw
  FROM qc e, qq q WHERE e.neighbor_id <> q.query_id
), qt AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
      row_number() OVER (PARTITION BY query_id
                         ORDER BY cosine_raw DESC, neighbor_id ASC) AS rank
    FROM qt_scored
  ) WHERE rank <= {QR_K}
)
SELECT query_id, CAST(count(*) AS BIGINT) AS n_common,
       count(*) / {float(QR_K)!r} AS recall
FROM ex JOIN qt USING (query_id, neighbor_id)
GROUP BY query_id
"""


# --------------------------------------------------------------------------
# x105 — k-NN graph reciprocity by rank
# --------------------------------------------------------------------------

def q_x105_knn_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(rank, n_edges, n_mutual, frac_mutual): per-rank reciprocation
    of the cosine top-10 graph over the bounded sample."""
    emb = _t(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < REC_SAMPLE_CAP
    )
    corpus = emb.repartition(64)  # spread the O(sample²) scoring
    edges = similarity.cosine_topk(corpus, emb, k=REC_K).select(
        "query_id", "neighbor_id", "rank"
    )
    rev = edges.select(
        F.col("neighbor_id").alias("query_id"),
        F.col("query_id").alias("neighbor_id"),
        F.lit(True).alias("_mutual"),
    ).drop("rank")
    marked = edges.join(rev, ["query_id", "neighbor_id"], "left")
    return (
        marked.groupBy("rank")
        .agg(
            F.count(F.lit(1)).alias("n_edges"),
            F.sum(F.when(F.col("_mutual"), 1).otherwise(0))
            .cast("long")
            .alias("n_mutual"),
        )
        .select(
            "rank",
            "n_edges",
            "n_mutual",
            (F.col("n_mutual") / F.col("n_edges")).alias("frac_mutual"),
        )
    )


SQL_X105 = f"""
WITH samp AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id < {REC_SAMPLE_CAP}
), q AS (
  SELECT vec_id AS query_id, embedding AS q_vec FROM samp
), scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, {_COS_SQL} AS cosine_raw
  FROM samp e, q WHERE e.vec_id <> q.query_id
), edges AS (
  SELECT query_id, neighbor_id, rank FROM (
    SELECT query_id, neighbor_id,
      row_number() OVER (PARTITION BY query_id
                         ORDER BY cosine_raw DESC, neighbor_id ASC) AS rank
    FROM scored
  ) WHERE rank <= {REC_K}
)
SELECT e.rank AS rank, CAST(count(*) AS BIGINT) AS n_edges,
       CAST(sum(CASE WHEN m.query_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_mutual,
       sum(CASE WHEN m.query_id IS NOT NULL THEN 1 ELSE 0 END) * 1.0
         / count(*) AS frac_mutual
FROM edges e
LEFT JOIN edges m
  ON m.query_id = e.neighbor_id AND m.neighbor_id = e.query_id
GROUP BY e.rank
"""


# --------------------------------------------------------------------------
# a82 — promotion lift curve over the discount grid
# --------------------------------------------------------------------------

def q_a82_promo_lift_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(discount_pct, n_items, avg_qty, avg_disc_rev, qty_lift):
    volume/revenue response per discount level vs the 0% baseline."""
    li = _t(spark, sf_dir, "lineitem")
    grid = (
        li.select(
            F.floor(F.col("l_discount") * 100 + F.lit(0.5))
            .cast("int")
            .alias("discount_pct"),
            "l_quantity",
            (F.col("l_extendedprice") * (1.0 - F.col("l_discount"))).alias(
                "disc_rev"
            ),
        )
        .groupBy("discount_pct")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("disc_rev"), 6).alias("avg_disc_rev"),
        )
    )
    base = F.broadcast(
        grid.filter(F.col("discount_pct") == 0).select(
            F.col("avg_qty").alias("_base_qty")
        )
    )
    return grid.crossJoin(base).select(
        "discount_pct",
        "n_items",
        "avg_qty",
        "avg_disc_rev",
        F.round(F.col("avg_qty") / F.col("_base_qty"), 6).alias("qty_lift"),
    )


SQL_A82 = """
WITH grid AS (
  SELECT CAST(floor(l_discount * 100 + 0.5) AS INTEGER) AS discount_pct,
         CAST(count(*) AS BIGINT) AS n_items,
         round(avg(l_quantity), 6) AS avg_qty,
         round(avg(l_extendedprice * (1.0 - l_discount)), 6) AS avg_disc_rev
  FROM lineitem GROUP BY 1
)
SELECT discount_pct, n_items, avg_qty, avg_disc_rev,
       round(avg_qty / (SELECT avg_qty FROM grid WHERE discount_pct = 0), 6)
         AS qty_lift
FROM grid
"""


EXT65_QUERIES = {
    "x104_quantized_recall": q_x104_quantized_recall,
    "x105_knn_reciprocity": q_x105_knn_reciprocity,
    "a82_promo_lift_curve": q_a82_promo_lift_curve,
}

EXT65_ORACLES = {
    "x104_quantized_recall": SQL_X104,
    "x105_knn_reciprocity": SQL_X105,
    "a82_promo_lift_curve": SQL_A82,
}
