"""Fifty-eighth query wave — completing the eval trilogy, variance
decomposition, LTV triangle, threshold tuning:

- x90_ivf_recall_eval: recall@5 of the IVF (nprobe=1) ANN tier
  against exact cosine top-5 over a bounded probe batch — the third
  arm of the measured-tier-switching trilogy (x71 sign-LSH pairs,
  x80 MinHash pairs, now the cell-probed top-k path). Emits one row
  (n_queries, mean_recall) — IVF's nprobe=1 recall loss is exactly
  what this number prices.
- a69_seasonality_strength: per event type, the share of `value`
  variance explained by hour-of-day (the classical eta² / correlation
  ratio) — "does this metric even HAVE a daily cycle" before anyone
  fits a seasonal model. Between-group and total sums of squares from
  ONE (type, hour) cell pass + a types-bounded rollup.
- a70_ltv_cohort_triangle: the customer-LTV triangle — revenue per
  (first-order cohort month × months-since-first-order), the
  longitudinal value readout behind cohort_retention's activity view.
- x91_threshold_sweep: near-dup pair counts at Jaccard thresholds
  {0.7, 0.8, 0.9} from ONE prefix-tier pair pass (lossless down to
  the lowest threshold) — the tuning table a dedup rollout decides
  its knob on.

Scale shapes: x90 = two bounded-probe top-k plans joined on
(query, neighbor) + a 1-row agg; a69 = one fact cell groupBy +
types-bounded rollup; a70 = customer-grain first-order groupBy +
keyed join back + months²-bounded matrix; x91 = one prefix pair pass
+ a 3-row conditional agg.

[EXT]-classic per SURVEY.md §2.11 scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_data_spark.operators import dedup, similarity
from streaming_data_spark.queries import _t

IVF_EVAL_K = 5
IVF_EVAL_CELLS = 8
SWEEP_THRESHOLDS = (0.7, 0.8, 0.9)
X91_SAMPLE_CAP = 10_000


def q_x90_ivf_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_queries, k, mean_recall): recall@5 of IVF nprobe=1 vs exact
    cosine top-5 on the x58 bounded probe batch."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(
        (F.col("vec_id") % 25 == 0) & (F.col("vec_id") < 2000)
    )
    exact = similarity.cosine_topk(emb, queries, k=IVF_EVAL_K).select(
        "query_id", "neighbor_id", F.lit(True).alias("_e")
    )
    ivf = similarity.ivf_topk(
        emb, queries, k=IVF_EVAL_K, n_cells=IVF_EVAL_CELLS
    ).select("query_id", "neighbor_id", F.lit(True).alias("_i"))
    hits = (
        exact.join(ivf, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            (
                F.sum(F.when(F.col("_i"), 1).otherwise(0))
                / F.count(F.lit(1))
            ).alias("recall")
        )
    )
    return hits.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.lit(IVF_EVAL_K).alias("k"),
        F.round(F.avg("recall"), 6).alias("mean_recall"),
    )


def _x90_sql() -> str:
    from streaming_data_spark.queries_ext4 import _cos

    probe = "vec_id % 25 = 0 AND vec_id < 2000"
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS q_vec
  FROM embeddings WHERE {probe}
), exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY {_cos("q.q_vec", "e.embedding")} DESC,
                                       e.vec_id ASC) AS rank
    FROM embeddings e, q
    WHERE e.vec_id <> q.query_id
  ) WHERE rank <= {IVF_EVAL_K}
), cents AS (
  SELECT vec_id AS cid, embedding AS c_vec
  FROM embeddings ORDER BY vec_id ASC LIMIT {IVF_EVAL_CELLS}
), cells AS (
  SELECT vec_id, embedding, cell FROM (
    SELECT e.vec_id, e.embedding, c.cid AS cell,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_cos("e.embedding", "c.c_vec")} DESC,
                                       c.cid ASC) AS c_rank
    FROM embeddings e CROSS JOIN cents c
  ) WHERE c_rank = 1
), iq AS (
  SELECT vec_id AS query_id, embedding AS q_vec, cell
  FROM cells WHERE {probe.replace("vec_id", "vec_id")}
), ivf AS (
  SELECT query_id, neighbor_id FROM (
    SELECT iq.query_id, c.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY iq.query_id
                              ORDER BY {_cos("iq.q_vec", "c.embedding")} DESC,
                                       c.vec_id ASC) AS rank
    FROM cells c JOIN iq ON c.cell = iq.cell AND c.vec_id <> iq.query_id
  ) WHERE rank <= {IVF_EVAL_K}
), per_q AS (
  SELECT e.query_id,
         sum(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) * 1.0
           / count(*) AS recall
  FROM exact e LEFT JOIN ivf i USING (query_id, neighbor_id)
  GROUP BY e.query_id
)
SELECT count(*) AS n_queries, {IVF_EVAL_K} AS k,
       round(avg(recall), 6) AS mean_recall
FROM per_q
"""


SQL_X90 = _x90_sql()


def q_a69_seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n, eta2): share of value variance explained by
    hour-of-day, from one cell pass."""
    ev = _t(spark, sf_dir, "events")
    cells = ev.groupBy("event_type", F.hour("ts").alias("hr")).agg(
        F.count(F.lit(1)).cast("double").alias("c"),
        F.sum("value").alias("s"),
        F.sum(F.col("value") * F.col("value")).alias("ss"),
    )
    # SS_between = Σ_h c_h·(mean_h − mean)² ; SS_total = Σ x² − n·mean²
    # — both from the (type, hour) cells, identical algebra in SQL
    return (
        cells.groupBy("event_type")
        .agg(
            F.sum("c").alias("n"),
            F.sum("s").alias("st"),
            F.sum("ss").alias("sst"),
            F.sum(F.col("s") * F.col("s") / F.col("c")).alias("sb"),
        )
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.round(
                (F.col("sb") - F.col("st") * F.col("st") / F.col("n"))
                / (F.col("sst") - F.col("st") * F.col("st") / F.col("n")),
                6,
            ).alias("eta2"),
        )
    )


SQL_A69 = """
WITH cells AS (
  SELECT event_type, extract(hour FROM ts) AS hr,
         CAST(count(*) AS DOUBLE) AS c,
         sum(value) AS s,
         sum(value * value) AS ss
  FROM events GROUP BY 1, 2
), rolled AS (
  SELECT event_type, sum(c) AS n, sum(s) AS st, sum(ss) AS sst,
         sum(s * s / c) AS sb
  FROM cells GROUP BY event_type
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       round((sb - st * st / n) / (sst - st * st / n), 6) AS eta2
FROM rolled
"""


def q_a70_ltv_cohort_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cohort_month, months_since, n_customers, revenue): the LTV
    triangle — revenue of each first-order cohort by order age."""
    orders = _t(spark, sf_dir, "orders")
    first = orders.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("cohort_month")
    )
    aged = orders.join(first, "o_custkey").withColumn(
        "months_since",
        (F.year("o_orderdate") - F.year("cohort_month")) * 12
        + (F.month("o_orderdate") - F.month("cohort_month")),
    )
    return aged.groupBy("cohort_month", "months_since").agg(
        F.count_distinct("o_custkey").alias("n_customers"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )


SQL_A70 = """
WITH first AS (
  SELECT o_custkey, date_trunc('month', min(o_orderdate)) AS cohort_month
  FROM orders GROUP BY o_custkey
), aged AS (
  SELECT o.o_custkey, o.o_totalprice, f.cohort_month,
         (year(o.o_orderdate) - year(f.cohort_month)) * 12
         + (month(o.o_orderdate) - month(f.cohort_month)) AS months_since
  FROM orders o JOIN first f USING (o_custkey)
)
SELECT cohort_month, months_since,
       count(DISTINCT o_custkey) AS n_customers,
       round(sum(o_totalprice), 2) AS revenue
FROM aged
GROUP BY cohort_month, months_since
"""


def q_x91_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(threshold, n_pairs): near-dup pair counts at each candidate
    Jaccard threshold, from one lossless pair pass at the lowest.

    Runs on a bounded doc sample (the x80/x45 rule): threshold tuning
    is a sampled activity — the knob is chosen from a sub-corpus
    sweep, then applied corpus-wide. No-op at every test SF."""
    docs = _t(spark, sf_dir, "documents").filter(
        F.col("doc_id") < X91_SAMPLE_CAP
    )
    # NOT the shared pair memo (dedup.py): the sweep needs pairs at the
    # LOWEST candidate threshold over the sampled sub-corpus — a strict
    # superset of (and thus a different set from) the shared 0.8
    # full-corpus tier; no other query consumes it, so no memo.
    pairs = dedup.ngram_jaccard_pairs_prefix(
        docs, "doc_id", "text", n=3, threshold=min(SWEEP_THRESHOLDS)
    )
    sums = pairs.agg(
        *[
            F.sum(
                F.when(F.col("jaccard") >= t, 1).otherwise(0)
            ).alias(f"c{int(t * 100)}")
            for t in SWEEP_THRESHOLDS
        ]
    )
    return sums.select(
        F.expr(
            "stack("
            + str(len(SWEEP_THRESHOLDS))
            + ", "
            + ", ".join(
                f"CAST({t} AS DOUBLE), c{int(t * 100)}"
                for t in SWEEP_THRESHOLDS
            )
            + ") as (threshold, n_pairs)"
        )
    )


SQL_X91 = rf"""
WITH doc_sample AS (
  SELECT * FROM documents WHERE doc_id < {X91_SAMPLE_CAP}
), toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM doc_sample
), sh AS (
  SELECT doc_id, unnest(list_distinct(
    list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
  )) AS s
  FROM toks
), sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), jac AS (
  SELECT round(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 6) AS j
  FROM inter
  JOIN sizes sa ON id_a = sa.doc_id
  JOIN sizes sb ON id_b = sb.doc_id
  WHERE round(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 6)
        >= {min(SWEEP_THRESHOLDS)}
), ks AS (
  SELECT unnest([{", ".join(f"CAST({t} AS DOUBLE)" for t in SWEEP_THRESHOLDS)}])
    AS threshold
)
SELECT ks.threshold,
       (SELECT CAST(sum(CASE WHEN j.j >= ks.threshold THEN 1 ELSE 0 END)
                    AS BIGINT)
        FROM jac j) AS n_pairs
FROM ks
"""


EXT58_QUERIES = {
    "x90_ivf_recall_eval": q_x90_ivf_recall_eval,
    "a69_seasonality_strength": q_a69_seasonality_strength,
    "a70_ltv_cohort_triangle": q_a70_ltv_cohort_triangle,
    "x91_threshold_sweep": q_x91_threshold_sweep,
}

EXT58_ORACLES = {
    "x90_ivf_recall_eval": SQL_X90,
    "a69_seasonality_strength": SQL_A69,
    "a70_ltv_cohort_triangle": SQL_A70,
    "x91_threshold_sweep": SQL_X91,
}
