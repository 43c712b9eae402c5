"""Forty-fifth query wave — customer scoring + model-eval metrics:

- a38_rfm_segments: classic RFM segmentation over orders — per
  customer recency (days since last order vs corpus max date),
  frequency (order count) and monetary (revenue), each quartiled
  with ntile(4) and concatenated into the marketing segment code.
  The analytics-mart counterpart of the reference's per-user rollup
  jobs (upbit_data_pipeline.py aggregation DAG, re-keyed to
  customers). All three ntiles run over the CUSTOMER-GRAIN aggregate
  (|customers| rows, never fact volume) — sanctioned global windows,
  see tests/test_plans.py::_SANCTIONED_GLOBAL_WINDOWS.
- x54_auc: ROC AUC of a score column against a binary label via the
  rank-sum (Mann–Whitney) identity with proper tie handling:
  AUC = Σ_s pos_s · (cum_neg_below_s + neg_s/2) / (n_pos·n_neg).
  Scored on documents: score = n_chars, label = (lang = 'en') — the
  "does length predict English" sanity eval a curation pipeline runs
  on every new quality signal. Every numerator term is an integer or
  an exact half (k/2 is exact in IEEE), so the Σ is bit-exact in any
  summation order; the single division rounds to 6 on both sides.
- x55_winsorize: per-event-type 5% winsorization — count-based
  order-statistic bounds (the (k+1)-th smallest/largest via keyed
  row_number, NO percentile interpolation, so the bound selection is
  integer-exact and engine-portable), clip, and the trimmed mean.
  The outlier-robust feature-scaling step of a training-data
  pipeline. All windows are keyed by event_type; bounds join back
  via a broadcast of |types| rows.

[EXT]-classic per SURVEY.md §2.5 / §2.11 scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streaming_data_spark.queries import _t

TRIM_FRAC = 0.05


def q_a38_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(c_custkey, recency_days, freq, monetary, r_score, f_score,
    m_score, segment): RFM quartile segmentation of all customers."""
    orders = _t(spark, sf_dir, "orders")
    ref = orders.agg(F.max("o_orderdate").alias("_ref"))
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("_last"),
            F.count(F.lit(1)).alias("freq"),
            F.round(F.sum("o_totalprice"), 2).alias("monetary"),
        )
        .crossJoin(F.broadcast(ref))
        .select(
            F.col("o_custkey").alias("c_custkey"),
            F.datediff(F.col("_ref"), F.col("_last")).alias("recency_days"),
            "freq",
            "monetary",
        )
    )
    # Customer-grain input: the three partition-less ntiles move
    # |customers| aggregate rows, not fact rows (sanctioned site).
    # Tie-breaks on c_custkey make every ntile deterministic.
    w_r = Window.orderBy(F.asc("recency_days"), F.asc("c_custkey"))
    w_f = Window.orderBy(F.desc("freq"), F.asc("c_custkey"))
    w_m = Window.orderBy(F.desc("monetary"), F.asc("c_custkey"))
    return per_cust.select(
        "c_custkey",
        "recency_days",
        "freq",
        "monetary",
        F.ntile(4).over(w_r).alias("r_score"),
        F.ntile(4).over(w_f).alias("f_score"),
        F.ntile(4).over(w_m).alias("m_score"),
    ).withColumn(
        "segment",
        F.concat_ws(
            "-",
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ),
    )


SQL_A38 = """
WITH ref AS (SELECT max(o_orderdate) AS ref_date FROM orders),
per_cust AS (
  SELECT o_custkey AS c_custkey,
         date_diff('day', max(o_orderdate), (SELECT ref_date FROM ref))
           AS recency_days,
         count(*) AS freq,
         round(sum(o_totalprice), 2) AS monetary
  FROM orders
  GROUP BY o_custkey
)
SELECT c_custkey,
       CAST(recency_days AS INT) AS recency_days,
       CAST(freq AS BIGINT) AS freq,
       monetary,
       CAST(ntile(4) OVER (ORDER BY recency_days ASC, c_custkey ASC) AS INT)
         AS r_score,
       CAST(ntile(4) OVER (ORDER BY freq DESC, c_custkey ASC) AS INT)
         AS f_score,
       CAST(ntile(4) OVER (ORDER BY monetary DESC, c_custkey ASC) AS INT)
         AS m_score,
       CAST(ntile(4) OVER (ORDER BY recency_days ASC, c_custkey ASC) AS VARCHAR)
         || '-' ||
       CAST(ntile(4) OVER (ORDER BY freq DESC, c_custkey ASC) AS VARCHAR)
         || '-' ||
       CAST(ntile(4) OVER (ORDER BY monetary DESC, c_custkey ASC) AS VARCHAR)
         AS segment
FROM per_cust
"""


def q_x54_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row (n_pos, n_neg, auc): rank-sum ROC AUC of n_chars as a
    predictor of lang='en', ties counted at half credit."""
    docs = _t(spark, sf_dir, "documents")
    by_score = docs.groupBy(F.col("n_chars").alias("score")).agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("pos_c"),
        F.sum(F.when(F.col("lang") == "en", 0).otherwise(1)).alias("neg_c"),
    )
    # Distinct-score histogram (313 rows at sf0.01): the ordered
    # cumulative runs over score cardinality, not documents — same
    # aggregate-sized-input argument as a18's equi-depth ntile.
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    return (
        by_score.withColumn(
            "cum_neg_below", F.coalesce(F.sum("neg_c").over(w), F.lit(0))
        )
        .groupBy()
        .agg(
            F.sum("pos_c").alias("n_pos"),
            F.sum("neg_c").alias("n_neg"),
            F.round(
                F.sum(
                    F.col("pos_c")
                    * (F.col("cum_neg_below") + F.col("neg_c") / F.lit(2.0))
                )
                / (F.sum("pos_c") * F.sum("neg_c")),
                6,
            ).alias("auc"),
        )
    )


SQL_X54 = """
WITH by_score AS (
  SELECT n_chars AS score,
         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS pos_c,
         sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS neg_c
  FROM documents
  GROUP BY n_chars
),
cum AS (
  SELECT score, pos_c, neg_c,
         coalesce(sum(neg_c) OVER (ORDER BY score
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_neg_below
  FROM by_score
)
SELECT CAST(sum(pos_c) AS BIGINT) AS n_pos,
       CAST(sum(neg_c) AS BIGINT) AS n_neg,
       round(sum(pos_c * (cum_neg_below + neg_c / 2.0))
             / (sum(pos_c) * sum(neg_c)), 6) AS auc
FROM cum
"""


def q_x55_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n, k, lo, hi, w_mean): 5% count-based winsorized
    bounds and trimmed mean of `value` per event type."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w_asc = Window.partitionBy("event_type").orderBy(
        F.asc("value"), F.asc("event_id")
    )
    w_desc = Window.partitionBy("event_type").orderBy(
        F.desc("value"), F.desc("event_id")
    )
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(w_asc).alias("rn_a"),
        F.row_number().over(w_desc).alias("rn_d"),
    )
    # lo = (k+1)-th smallest (min of what survives dropping the k
    # smallest); hi = (k+1)-th largest symmetric — count-based order
    # statistics, no interpolation. n rides a keyed count window so k
    # is available row-wise without a second scan.
    kept = ranked.withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("event_type"))
    ).withColumn("k", F.floor(F.col("n") * F.lit(TRIM_FRAC)))
    per_type = kept.groupBy("event_type", "n", "k").agg(
        F.min(F.when(F.col("rn_a") > F.col("k"), F.col("value"))).alias("lo"),
        F.max(F.when(F.col("rn_d") > F.col("k"), F.col("value"))).alias("hi"),
    )
    clipped = kept.join(
        F.broadcast(per_type.select("event_type", "lo", "hi")), "event_type"
    ).select(
        "event_type",
        F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi")).alias(
            "clipped"
        ),
    )
    return (
        clipped.groupBy("event_type")
        .agg(F.round(F.avg("clipped"), 6).alias("w_mean"))
        .join(F.broadcast(per_type), "event_type")
        .select(
            "event_type",
            "n",
            "k",
            F.round(F.col("lo"), 6).alias("lo"),
            F.round(F.col("hi"), 6).alias("hi"),
            "w_mean",
        )
    )


SQL_X55 = f"""
WITH ev AS (
  SELECT event_id, event_type, value FROM events WHERE value IS NOT NULL
),
ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value ASC, event_id ASC) AS rn_a,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value DESC, event_id DESC) AS rn_d,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM ev
),
kept AS (
  SELECT *, CAST(floor(n * {TRIM_FRAC!r}) AS BIGINT) AS k FROM ranked
),
per_type AS (
  SELECT event_type, max(n) AS n, max(k) AS k,
         min(CASE WHEN rn_a > k THEN value END) AS lo,
         max(CASE WHEN rn_d > k THEN value END) AS hi
  FROM kept
  GROUP BY event_type
)
SELECT p.event_type,
       CAST(p.n AS BIGINT) AS n,
       CAST(p.k AS BIGINT) AS k,
       round(p.lo, 6) AS lo,
       round(p.hi, 6) AS hi,
       round(avg(least(greatest(r.value, p.lo), p.hi)), 6) AS w_mean
FROM kept r JOIN per_type p USING (event_type)
GROUP BY p.event_type, p.n, p.k, p.lo, p.hi
"""


EXT45_QUERIES = {
    "a38_rfm_segments": q_a38_rfm_segments,
    "x54_auc": q_x54_auc,
    "x55_winsorize": q_x55_winsorize,
}

EXT45_ORACLES = {
    "a38_rfm_segments": SQL_A38,
    "x54_auc": SQL_X54,
    "x55_winsorize": SQL_X55,
}
