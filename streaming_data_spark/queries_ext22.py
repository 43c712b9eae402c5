"""Twenty-second query wave — embedding-space label QA:

- x33_centroid_classify: nearest-centroid classification of every
  embedding against its dataset's own per-label mean vectors, reported
  as a confusion matrix. The off-diagonal mass IS the label-noise
  signal — the standard first-pass mislabel audit a training-data
  pipeline runs before spending compute on a model (vectors closer to
  another class's centroid than their own are review candidates).

Shape: one posexplode to (vec, pos, x) rows; centroids are a
(labels × dims) aggregate (tiny); classification joins the exploded
vectors to centroids on the position key and reduces n·k candidate
distances per vector with a deterministic (distance, label)
struct-min. Cost is n·d·k — the brute-force tier; at corpus scale the
IVF/sign-LSH paths (operators/similarity.py) are the sub-linear
candidate generators and this exact form becomes the re-rank stage.

[EXT] per SURVEY.md §2.11 scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_data_spark.queries import _t


def q_x33_centroid_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of nearest-centroid classification:
    (true_label, pred_label, n_vectors). Ties on distance break by
    smaller label in BOTH engines (struct-min here, ordered
    row_number in the oracle) so the argmin is total."""
    emb = _t(spark, sf_dir, "embeddings")
    pos = emb.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("pos", "x"),
    )
    cent = pos.groupBy(F.col("label").alias("clabel"), "pos").agg(
        F.avg("x").alias("c")
    )
    dist = (
        pos.join(cent, "pos")
        .groupBy("vec_id", "label", "clabel")
        .agg(F.sum((F.col("x") - F.col("c")) ** 2).alias("d2"))
    )
    pred = dist.groupBy("vec_id", "label").agg(
        F.min(F.struct(F.col("d2"), F.col("clabel"))).alias("best")
    )
    return (
        pred.select(
            F.col("label").alias("true_label"),
            F.col("best.clabel").alias("pred_label"),
        )
        .groupBy("true_label", "pred_label")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )


SQL_X33 = """
WITH pos AS (
  SELECT vec_id, label, i AS pos, embedding[i] AS x
  FROM embeddings,
       unnest(generate_series(1, len(embedding))) AS g(i)
),
cent AS (
  SELECT label AS clabel, pos, avg(x) AS c
  FROM pos GROUP BY label, pos
),
dist AS (
  SELECT p.vec_id, p.label, c.clabel,
         sum((p.x - c.c) * (p.x - c.c)) AS d2
  FROM pos p JOIN cent c USING (pos)
  GROUP BY p.vec_id, p.label, c.clabel
),
ranked AS (
  SELECT vec_id, label, clabel,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY d2 ASC, clabel ASC) AS rk
  FROM dist
)
SELECT label AS true_label, clabel AS pred_label,
       CAST(count(*) AS BIGINT) AS n_vectors
FROM ranked WHERE rk = 1
GROUP BY label, clabel
"""


EXT22_QUERIES = {
    "x33_centroid_classify": q_x33_centroid_classify,
}

EXT22_ORACLES = {
    "x33_centroid_classify": SQL_X33,
}
