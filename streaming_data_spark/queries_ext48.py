"""Forty-eighth query wave — experiment stats + data-quality audits:

- a41_ab_welch: Welch's unequal-variance t-test between every pair of
  event types on `value` — the A/B-experiment read-out (difference of
  means, standard error, t statistic, Welch–Satterthwaite dof). The
  x52 determinism recipe: the two order-dependent raw sums (Σx, Σx²)
  are rounded to 6 on BOTH sides, then every downstream expression is
  the identical closed-form IEEE sequence — outputs exact, unrounded.
- x60_benford: Benford's-law first-digit audit of o_totalprice —
  observed digit counts vs n·log10(1+1/d) expectations and the χ²
  contribution per digit plus the total. First digit is extracted
  from the INTEGER part as a string (portable; log10-based extraction
  would lean on libm rounding that engines need not share). The
  log10 constants are repr()-interpolated Python doubles. The
  fraud/entry-error screen of a financial DQ suite.
- x61_key_concentration: supplier-key concentration diagnostic on
  lineitem — Gini coefficient (rank formula over the key-count
  aggregate), Herfindahl–Hirschman index, top-1/top-10 key shares.
  THE skew report that tells you whether a join/agg on this key needs
  salting (operators/skew.py) before it straggles one reducer. The
  rank window runs over the supplier-grain count table — sanctioned
  global window, dim-bounded.

Scale shapes: a41 is one fact groupBy to a |types| stat table and a
broadcast pair self-join; x60 is one fact groupBy onto ≤9 digit cells
(+ the sanctioned one-row scalar broadcast); x61 is one fact groupBy
to the key-grain table and one ordered pass over it.

[EXT]-classic per SURVEY.md §2.5 / §2.11 scope.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streaming_data_spark.queries import _t

TOPK_SHARE = 10


def q_a41_ab_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(type_a, type_b, n_a, n_b, mean_a, mean_b, t_stat, dof):
    pairwise Welch t-tests over event-type value distributions."""
    ev = _t(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 6).alias("s1"),
        F.round(F.sum(F.col("value") * F.col("value")), 6).alias("s2"),
    )
    a = stats.select(
        F.col("event_type").alias("type_a"),
        F.col("n").alias("n_a"),
        F.col("s1").alias("s1_a"),
        F.col("s2").alias("s2_a"),
    )
    b = stats.select(
        F.col("event_type").alias("type_b"),
        F.col("n").alias("n_b"),
        F.col("s1").alias("s1_b"),
        F.col("s2").alias("s2_b"),
    )
    pairs = a.crossJoin(F.broadcast(b)).filter(
        F.col("type_a") < F.col("type_b")
    )
    m_a = F.col("s1_a") / F.col("n_a")
    m_b = F.col("s1_b") / F.col("n_b")
    v_a = (F.col("s2_a") - F.col("n_a") * m_a * m_a) / (F.col("n_a") - 1)
    v_b = (F.col("s2_b") - F.col("n_b") * m_b * m_b) / (F.col("n_b") - 1)
    se_a = v_a / F.col("n_a")
    se_b = v_b / F.col("n_b")
    se = se_a + se_b
    return pairs.select(
        "type_a",
        "type_b",
        "n_a",
        "n_b",
        m_a.alias("mean_a"),
        m_b.alias("mean_b"),
        ((m_a - m_b) / F.sqrt(se)).alias("t_stat"),
        (
            (se * se)
            / (
                se_a * se_a / (F.col("n_a") - 1)
                + se_b * se_b / (F.col("n_b") - 1)
            )
        ).alias("dof"),
    )


SQL_A41 = """
WITH stats AS (
  SELECT event_type, count(*) AS n,
         round(sum(value), 6) AS s1,
         round(sum(value * value), 6) AS s2
  FROM events GROUP BY event_type
),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         a.n AS n_a, b.n AS n_b,
         a.s1 / a.n AS m_a, b.s1 / b.n AS m_b,
         (a.s2 - a.n * (a.s1 / a.n) * (a.s1 / a.n)) / (a.n - 1) / a.n AS se_a,
         (b.s2 - b.n * (b.s1 / b.n) * (b.s1 / b.n)) / (b.n - 1) / b.n AS se_b
  FROM stats a JOIN stats b ON a.event_type < b.event_type
)
SELECT type_a, type_b,
       CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       m_a AS mean_a, m_b AS mean_b,
       (m_a - m_b) / sqrt(se_a + se_b) AS t_stat,
       ((se_a + se_b) * (se_a + se_b))
         / (se_a * se_a / (n_a - 1) + se_b * se_b / (n_b - 1)) AS dof
FROM pairs
"""


# Benford expectations as Python doubles, pasted verbatim into BOTH
# engines (libm log10 evaluated once, on the driver).
_BENFORD_P = {d: repr(math.log10(1.0 + 1.0 / d)) for d in range(1, 10)}


def q_x60_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(digit, n_obs, exp_n, contrib, chi2): Benford first-digit audit
    of order totals."""
    orders = _t(spark, sf_dir, "orders")
    # floor, NOT a bare double→bigint cast: Spark's cast truncates
    # toward zero but DuckDB's rounds to nearest, shifting 1999.7 into
    # digit 2 on one side only. floor() is the same op in both.
    digit = F.substring(
        F.floor("o_totalprice").cast("string"), 1, 1
    ).cast("int")
    # ≤9 rows after the one fact-sized groupBy; materialize so the
    # scalar-total / chi2 / output branches don't re-scan the fact.
    cells = (
        orders.select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
        .localCheckpoint(eager=True)
    )
    expr = F.when(F.col("digit") == 1, F.lit(float(_BENFORD_P[1])))
    for d in range(2, 10):
        expr = expr.when(F.col("digit") == d, F.lit(float(_BENFORD_P[d])))
    total = cells.agg(F.sum("n_obs").alias("n_total"))
    scored = (
        cells.crossJoin(F.broadcast(total))
        .withColumn("exp_n", F.col("n_total") * expr)
        .withColumn(
            "contrib",
            (F.col("n_obs") - F.col("exp_n"))
            * (F.col("n_obs") - F.col("exp_n"))
            / F.col("exp_n"),
        )
        .localCheckpoint(eager=True)
    )
    chi2 = scored.agg(F.round(F.sum("contrib"), 6).alias("chi2"))
    return (
        scored.crossJoin(F.broadcast(chi2))
        .select(
            "digit",
            "n_obs",
            F.round("exp_n", 6).alias("exp_n"),
            F.round("contrib", 6).alias("contrib"),
            "chi2",
        )
    )


def _benford_sql() -> str:
    cases = " ".join(
        f"WHEN {d} THEN {_BENFORD_P[d]}" for d in range(1, 10)
    )
    return f"""
WITH cells AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
              AS INT) AS digit,
         count(*) AS n_obs
  FROM orders GROUP BY 1
),
-- DuckDB sums BIGINT into DECIMAL(38,0) and the chi2 square then
-- overflows DECIMAL multiplication — force the scalar into DOUBLE,
-- which is also what Spark's long-sum-times-double arithmetic uses
tot AS (SELECT CAST(sum(n_obs) AS DOUBLE) AS n_total FROM cells),
scored AS (
  SELECT digit, n_obs,
         n_total * (CASE digit {cases} END) AS exp_n
  FROM cells, tot
),
contribs AS (
  SELECT digit, n_obs, exp_n,
         (n_obs - exp_n) * (n_obs - exp_n) / exp_n AS contrib
  FROM scored
),
chi AS (SELECT round(sum(contrib), 6) AS chi2 FROM contribs)
SELECT digit, CAST(n_obs AS BIGINT) AS n_obs,
       round(exp_n, 6) AS exp_n,
       round(contrib, 6) AS contrib,
       chi.chi2
FROM contribs, chi
"""


SQL_X60 = _benford_sql()


def q_x61_key_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row (n_keys, n_rows, gini, hhi, top1_share, top10_share):
    how concentrated lineitem volume is on l_suppkey."""
    li = _t(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("cnt"))
    # Supplier-grain aggregate: the two global orderings move |keys|
    # rows through one task (sanctioned; see test_plans).
    w_asc = Window.orderBy(F.asc("cnt"), F.asc("l_suppkey"))
    w_desc = Window.orderBy(F.desc("cnt"), F.desc("l_suppkey"))
    ranked = counts.select(
        "cnt",
        F.row_number().over(w_asc).alias("rk"),
        F.row_number().over(w_desc).alias("rk_top"),
    )
    return ranked.groupBy().agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.round(
            (F.lit(2.0) * F.sum(F.col("rk") * F.col("cnt")))
            / (F.count(F.lit(1)) * F.sum("cnt"))
            - (F.count(F.lit(1)) + F.lit(1.0)) / F.count(F.lit(1)),
            6,
        ).alias("gini"),
        F.round(
            F.sum(
                (F.col("cnt") * F.col("cnt"))
            ) / (F.sum("cnt") * F.sum("cnt")),
            6,
        ).alias("hhi"),
        F.round(
            F.sum(F.when(F.col("rk_top") == 1, F.col("cnt")).otherwise(0))
            / F.sum("cnt"),
            6,
        ).alias("top1_share"),
        F.round(
            F.sum(
                F.when(F.col("rk_top") <= TOPK_SHARE, F.col("cnt")).otherwise(0)
            )
            / F.sum("cnt"),
            6,
        ).alias("top10_share"),
    )


SQL_X61 = f"""
WITH counts AS (
  SELECT l_suppkey, count(*) AS cnt FROM lineitem GROUP BY l_suppkey
),
ranked AS (
  SELECT cnt,
         row_number() OVER (ORDER BY cnt ASC, l_suppkey ASC) AS rk,
         row_number() OVER (ORDER BY cnt DESC, l_suppkey DESC) AS rk_top
  FROM counts
)
SELECT CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(cnt) AS BIGINT) AS n_rows,
       round((2.0 * sum(rk * cnt)) / (count(*) * sum(cnt))
             - (count(*) + 1.0) / count(*), 6) AS gini,
       round(sum(cnt * cnt) / (sum(cnt) * sum(cnt)), 6) AS hhi,
       round(sum(CASE WHEN rk_top = 1 THEN cnt ELSE 0 END) / sum(cnt), 6)
         AS top1_share,
       round(sum(CASE WHEN rk_top <= {TOPK_SHARE} THEN cnt ELSE 0 END)
             / sum(cnt), 6) AS top10_share
FROM ranked
"""


EXT48_QUERIES = {
    "a41_ab_welch": q_a41_ab_welch,
    "x60_benford": q_x60_benford,
    "x61_key_concentration": q_x61_key_concentration,
}

EXT48_ORACLES = {
    "a41_ab_welch": SQL_A41,
    "x60_benford": SQL_X60,
    "x61_key_concentration": SQL_X61,
}
