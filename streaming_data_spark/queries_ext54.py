"""Fifty-fourth query wave — forward as-of join, MinHash tier eval,
revenue decomposition, return cohorts:

- j8_asof_forward: the look-ahead mirror of the as-of join family —
  for each 'view' event, the next 'error' of the same user within 1
  hour (direction='forward' + tolerance, the incident-attribution
  shape: "did this page view lead into an error?"). Completes §2.4:
  backward as-of, interval, temporal, salted, and now forward as-of.
- x80_minhash_recall_eval: the measured-tier-switching harness for
  the TEXT near-dup family (x71 covered embeddings): MinHash-LSH
  candidates at est-Jaccard >= 0.7 vs the exact n-gram Jaccard >= 0.7
  ground truth (prefix tier — lossless, so it IS the exact set).
  Unlike sign-LSH (a candidate restriction, precision 1), MinHash has
  false positives AND negatives — both error arms measured here.
- a59_discount_waterfall: per order year, the revenue decomposition
  gross → −discount → +tax → net with component shares — the finance
  waterfall over one fact pass.
- a60_return_cohort: return rate per order-month cohort — the
  longitudinal quality readout (a rising cohort return rate flags a
  supplier/process regression months before totals move).

Scale shapes: j8 = one keyed shuffle (union + following-frame
window, no range probe); x80 = two bounded pair sets full-outer
joined + 1-row agg; a59 = ONE lineitem⋈orders pass folded into a
years-bounded agg; a60 = same join folded into a months-bounded agg.

[EXT]-classic per SURVEY.md §2.4/§2.11 scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_data_spark.operators import dedup, joins
from streaming_data_spark.queries import _t

ASOF_FWD_TOLERANCE_S = 3600
MINHASH_EVAL_THRESHOLD = 0.7
X80_SAMPLE_CAP = 10_000


def q_j8_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_id, user_id, ts, value, next_error_value): each view
    event with the value of the user's next error within 1 hour."""
    events = _t(spark, sf_dir, "events")
    views = events.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts", "value"
    )
    errors = events.filter(F.col("event_type") == "error").select(
        "user_id", "ts", F.col("value").alias("next_error_value")
    )
    out = joins.asof_join_forward(
        views,
        errors,
        key="user_id",
        ts="ts",
        value_cols=["next_error_value"],
        tolerance_seconds=ASOF_FWD_TOLERANCE_S,
    )
    return out.select("event_id", "user_id", "ts", "value", "next_error_value")


SQL_J8 = f"""
SELECT v.event_id, v.user_id, v.ts, v.value,
       CASE WHEN e.ts <= v.ts + INTERVAL {ASOF_FWD_TOLERANCE_S} SECONDS
            THEN e.next_error_value END AS next_error_value
FROM (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'view'
) v
ASOF LEFT JOIN (
  SELECT user_id, ts, value AS next_error_value
  FROM events WHERE event_type = 'error'
) e ON v.user_id = e.user_id AND e.ts >= v.ts
"""


def q_x80_minhash_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_true, n_pred, n_hit, precision, recall): MinHash-LSH
    candidate pairs at est-Jaccard >= 0.7 against the exact Jaccard
    >= 0.7 pair set."""
    from streaming_data_spark.queries_ext import _BANDS, _K

    # Bounded eval sample (the x71/x45 rule): the exact ground-truth
    # side is the expensive baseline by definition — recall/precision
    # are estimated on a fixed sub-corpus at scale. No-op at test SFs.
    docs = _t(spark, sf_dir, "documents").filter(
        F.col("doc_id") < X80_SAMPLE_CAP
    )
    # NOT the shared pair memo (dedup.py): this truth set is built at
    # threshold 0.7 over the SAMPLED sub-corpus — a different pair set
    # from the 0.8 full-corpus one the x41/x70/... tier shares, and no
    # other query consumes it, so memoizing would checkpoint dead data.
    true = dedup.ngram_jaccard_pairs_prefix(
        docs, "doc_id", "text", n=3, threshold=MINHASH_EVAL_THRESHOLD
    ).select("id_a", "id_b", F.lit(True).alias("_t"))
    pred = dedup.minhash_lsh_pairs(
        docs, "doc_id", "text",
        n=3, k=_K, bands=_BANDS, threshold=MINHASH_EVAL_THRESHOLD,
    ).select("id_a", "id_b", F.lit(True).alias("_p"))
    both = true.join(pred, ["id_a", "id_b"], "full_outer")
    return both.agg(
        F.sum(F.when(F.col("_t"), 1).otherwise(0)).alias("n_true"),
        F.sum(F.when(F.col("_p"), 1).otherwise(0)).alias("n_pred"),
        F.sum(F.when(F.col("_t") & F.col("_p"), 1).otherwise(0)).alias(
            "n_hit"
        ),
    ).select(
        "n_true",
        "n_pred",
        "n_hit",
        (F.col("n_hit") / F.col("n_pred")).alias("precision"),
        (F.col("n_hit") / F.col("n_true")).alias("recall"),
    )


def _x80_sql() -> str:
    # Both sub-oracles read `FROM documents` at exactly ONE site each
    # (asserted in tests) — swap onto the bounded sample CTE.
    from streaming_data_spark.queries_ext import SQL_X2_MINHASH

    minhash_sampled = SQL_X2_MINHASH.replace("FROM documents", "FROM doc_sample")
    exact = rf"""
WITH toks AS (
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
)
SELECT id_a, id_b
FROM inter
JOIN sizes sa ON id_a = sa.doc_id
JOIN sizes sb ON id_b = sb.doc_id
WHERE round(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 6)
      >= {MINHASH_EVAL_THRESHOLD}
"""
    return f"""
WITH doc_sample AS (
  SELECT * FROM documents WHERE doc_id < {X80_SAMPLE_CAP}
),
t AS (SELECT id_a, id_b FROM ({exact}) ),
p AS (SELECT id_a, id_b FROM ({minhash_sampled}) ),
j AS (
  SELECT (t.id_a IS NOT NULL) AS in_t, (p.id_a IS NOT NULL) AS in_p
  FROM t FULL OUTER JOIN p USING (id_a, id_b)
)
SELECT CAST(sum(CASE WHEN in_t THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
       CAST(sum(CASE WHEN in_p THEN 1 ELSE 0 END) AS BIGINT) AS n_pred,
       CAST(sum(CASE WHEN in_t AND in_p THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hit,
       sum(CASE WHEN in_t AND in_p THEN 1 ELSE 0 END) * 1.0
         / sum(CASE WHEN in_p THEN 1 ELSE 0 END) AS precision,
       sum(CASE WHEN in_t AND in_p THEN 1 ELSE 0 END) * 1.0
         / sum(CASE WHEN in_t THEN 1 ELSE 0 END) AS recall
FROM j
"""


SQL_X80 = _x80_sql()


def q_a59_discount_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(year, gross, discount_amt, tax_amt, net, discount_share): the
    revenue waterfall per order year, one fact pass."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    j = li.join(
        orders.select("o_orderkey", F.year("o_orderdate").alias("year")),
        li.l_orderkey == F.col("o_orderkey"),
    )
    gross = F.sum("l_extendedprice")
    disc = F.sum(F.col("l_extendedprice") * F.col("l_discount"))
    tax = F.sum(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.col("l_tax")
    )
    net = F.sum(
        F.col("l_extendedprice")
        * (1 - F.col("l_discount"))
        * (1 + F.col("l_tax"))
    )
    return j.groupBy("year").agg(
        F.round(gross, 6).alias("gross"),
        F.round(disc, 6).alias("discount_amt"),
        F.round(tax, 6).alias("tax_amt"),
        F.round(net, 6).alias("net"),
        F.round(disc / gross, 6).alias("discount_share"),
    )


SQL_A59 = """
SELECT year(o.o_orderdate) AS year,
       round(sum(l.l_extendedprice), 6) AS gross,
       round(sum(l.l_extendedprice * l.l_discount), 6) AS discount_amt,
       round(sum(l.l_extendedprice * (1 - l.l_discount) * l.l_tax), 6) AS tax_amt,
       round(sum(l.l_extendedprice * (1 - l.l_discount) * (1 + l.l_tax)), 6) AS net,
       round(sum(l.l_extendedprice * l.l_discount)
             / sum(l.l_extendedprice), 6) AS discount_share
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY year(o.o_orderdate)
"""


def q_a60_return_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cohort_month, n_lines, n_returned, return_rate): lineitem
    return rate per order-month cohort."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    j = li.join(
        orders.select(
            "o_orderkey",
            F.date_trunc("month", F.col("o_orderdate")).alias("cohort_month"),
        ),
        li.l_orderkey == F.col("o_orderkey"),
    )
    return j.groupBy("cohort_month").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias(
            "n_returned"
        ),
        F.round(
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            / F.count(F.lit(1)),
            6,
        ).alias("return_rate"),
    )


SQL_A60 = """
SELECT date_trunc('month', o.o_orderdate) AS cohort_month,
       count(*) AS n_lines,
       CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_returned,
       round(sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) * 1.0
             / count(*), 6) AS return_rate
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY date_trunc('month', o.o_orderdate)
"""


EXT54_QUERIES = {
    "j8_asof_forward": q_j8_asof_forward,
    "x80_minhash_recall_eval": q_x80_minhash_recall_eval,
    "a59_discount_waterfall": q_a59_discount_waterfall,
    "a60_return_cohort": q_a60_return_cohort,
}

EXT54_ORACLES = {
    "j8_asof_forward": SQL_J8,
    "x80_minhash_recall_eval": SQL_X80,
    "a59_discount_waterfall": SQL_A59,
    "a60_return_cohort": SQL_A60,
}
