"""Fortieth query wave — dataset-preparation sampling + contrastive
mining, the split/balance/pair-mining steps a training-data pipeline
runs after curation:

- x43_stratified_split: deterministic 80/10/10 train/val/test split
  PER STRATUM (event_type), ordered by md5 of the row id — exact
  proportions per class (the hash-threshold sampler x19 is the
  approximate tier; this one is the exact-count tier reproducible
  across engines and re-runs).
- x44_class_balance: downsample every label to the minority class's
  count (deterministic md5 order) — the class-balancing step before
  classifier training; output is the kept rows.
- x45_hard_negatives: per query vector, the top-3 most-cosine-similar
  vectors with a DIFFERENT label (contrastive/triplet mining, public
  SimCLR/SBERT practice) — label filter BEFORE ranking.

Scale shapes: x43/x44 are one keyed window each (strata are
dimension-bounded; the md5 sort is per-stratum, disk-spillable);
x45 inherits cosine_topk's broadcast-bounded-queries + single corpus
scan + JVM higher-order folds (IVF/LSH tiers for corpus-scale query
sets). Determinism: md5-of-id ordering has no ties (ids unique) and
both engines produce identical lowercase hex.

[EXT]-classic per SURVEY.md §2.11 scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streaming_data_spark.operators import similarity
from streaming_data_spark.queries import _t

TRAIN_FRAC = 0.8
VAL_FRAC = 0.9  # cumulative


def q_x43_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_id, event_type, split): exact 80/10/10 per event_type,
    md5(event_id) order."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.md5(F.col("event_id").cast("string")).asc()
    )
    wn = Window.partitionBy("event_type")
    return (
        ev.select("event_id", "event_type")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wn))
        .select(
            "event_id",
            "event_type",
            F.when(F.col("rn") <= TRAIN_FRAC * F.col("n"), "train")
            .when(F.col("rn") <= VAL_FRAC * F.col("n"), "val")
            .otherwise("test")
            .alias("split"),
        )
    )


SQL_X43 = f"""
WITH ranked AS (
  SELECT event_id, event_type,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY md5(CAST(event_id AS VARCHAR)) ASC) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT event_id, event_type,
       CASE WHEN rn <= {TRAIN_FRAC} * n THEN 'train'
            WHEN rn <= {VAL_FRAC} * n THEN 'val'
            ELSE 'test' END AS split
FROM ranked
"""


def q_x44_class_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, label): every label downsampled to the minority
    class's count, deterministic md5 order."""
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "label")
    counts = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    m = counts.agg(F.min("n").alias("m"))
    w = Window.partitionBy("label").orderBy(
        F.md5(F.col("vec_id").cast("string")).asc()
    )
    return (
        emb.withColumn("rn", F.row_number().over(w))
        .crossJoin(F.broadcast(m))
        .filter(F.col("rn") <= F.col("m"))
        .select("vec_id", "label")
    )


SQL_X44 = """
WITH m AS (
  SELECT min(n) AS m FROM (
    SELECT label, count(*) AS n FROM embeddings GROUP BY label)
),
ranked AS (
  SELECT vec_id, label,
         row_number() OVER (PARTITION BY label
                            ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC) AS rn
  FROM embeddings
)
SELECT vec_id, label FROM ranked, m WHERE rn <= m.m
"""


def q_x45_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 different-label cosine neighbors for the BOUNDED query
    batch (vec_id % 40 == 0 AND vec_id < 4000 — an absolute cap, the
    x5 convention: the brute-force tier's cost is |queries|·|corpus|,
    so the probe batch must not grow with the corpus; corpus-scale
    query sets take the IVF/LSH bucketed tiers)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter((F.col("vec_id") % 40 == 0) & (F.col("vec_id") < 4000))
    return similarity.hard_negatives(emb, queries, k=3)


SQL_X45 = """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS q_vec, label AS q_label
  FROM embeddings WHERE vec_id % 40 = 0 AND vec_id < 4000
), scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, e.label AS n_label,
    list_sum(list_transform(range(1, len(e.embedding) + 1),
      i -> q.q_vec[i]::DOUBLE * e.embedding[i]::DOUBLE))
    / (sqrt(list_sum(list_transform(range(1, len(q.q_vec) + 1),
        i -> q.q_vec[i]::DOUBLE * q.q_vec[i]::DOUBLE)))
     * sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
        i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE)))) AS cosine_raw
  FROM embeddings e, q
  WHERE e.label <> q.q_label
), ranked AS (
  SELECT query_id, neighbor_id, n_label,
    row_number() OVER (PARTITION BY query_id
                       ORDER BY cosine_raw DESC, neighbor_id ASC) AS rank,
    round(cosine_raw, 6) AS cosine
  FROM scored
)
SELECT query_id, neighbor_id, n_label, rank, cosine FROM ranked WHERE rank <= 3
"""


EXT40_QUERIES = {
    "x43_stratified_split": q_x43_stratified_split,
    "x44_class_balance": q_x44_class_balance,
    "x45_hard_negatives": q_x45_hard_negatives,
}

EXT40_ORACLES = {
    "x43_stratified_split": SQL_X43,
    "x44_class_balance": SQL_X44,
    "x45_hard_negatives": SQL_X45,
}
