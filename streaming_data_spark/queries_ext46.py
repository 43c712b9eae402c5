"""Forty-sixth query wave — market-basket rules, graph triangles,
calendar seasonality:

- x56_assoc_rules: association rules over the order basket (distinct
  parts per order): for every part pair co-ordered in ≥2 orders, both
  directed rules with support, confidence and lift. All three metrics
  are a SINGLE IEEE division of exact integer counts (numerator
  products stay in int64), so no rounding is needed anywhere — the
  values are bit-identical across engines. The co-occurrence layer
  a24 counts is here promoted to the full Agrawal-style rule metrics
  a recommender/affinity job actually consumes.
- x57_triangles: triangle enumeration over the Jaccard≥0.8 near-dup
  graph (operators/graph.py::triangles) — the local-clustering signal
  that separates a mirrored-document CLIQUE (template spam) from a
  star of partial copies around one hub; complements x42's PageRank
  on the same edge set. Integer ids only — exact.
- a39_seasonal_dow: day-of-week seasonal profile of `value` per event
  type — cell mean and the seasonal index vs the type's overall mean
  (the classical seasonal-decomposition index; dow = Monday 0 in BOTH
  engines: Spark `weekday`, DuckDB `isodow - 1`). Means are
  order-dependent sums → round 6 on both sides.

Scale shapes: x56's self-join keys on l_orderkey (basket size is
bounded by order width, ≤7 lines in TPC-H — pair fan-out is O(width²)
per order, never cross-order); part-count joins are dim-sized. x57's
wedge volume is bounded by forward degree over an already-blocked
pair set. a39 is one fact groupBy onto a |types|×7 cell table with a
keyed margin window.

[EXT]-classic per SURVEY.md §2.5 / §2.11 scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streaming_data_spark.operators import dedup, graph
from streaming_data_spark.queries import _t
from streaming_data_spark.queries_ext9 import _EDGE_SQL

MIN_PAIR_ORDERS = 2
# ~2M parts x ~16B/row of (key, count) ~= 32 MB broadcast — the safe
# ceiling for forcing the item-count side map-side in x56.
PART_BROADCAST_CAP = 2_000_000


def q_x56_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(ant, cons, cnt_pair, cnt_ant, cnt_cons, support, confidence,
    lift): directed association rules with pair support >= 2 orders."""
    li = _t(spark, sf_dir, "lineitem")
    # The distinct basket feeds four branches (scalar total, both
    # sides of the pair self-join, the item counts) — materialize the
    # one fact-sized distinct instead of shuffling it four times.
    items = li.select("l_orderkey", "l_partkey").distinct().localCheckpoint(
        eager=True
    )
    n_orders = items.agg(
        F.countDistinct("l_orderkey").alias("n_orders")
    )
    a = items.select("l_orderkey", F.col("l_partkey").alias("pa"))
    b = items.select("l_orderkey", F.col("l_partkey").alias("pb"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("cnt_pair"))
        .filter(F.col("cnt_pair") >= MIN_PAIR_ORDERS)
    )
    directed = pairs.select(
        F.col("pa").alias("ant"), F.col("pb").alias("cons"), "cnt_pair"
    ).unionAll(
        pairs.select(
            F.col("pb").alias("ant"), F.col("pa").alias("cons"), "cnt_pair"
        )
    )
    item_cnt = items.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # The item-count side is bounded by the part CATALOG, not the fact
    # table — dim-sized at TPC-H shapes but it grows with the catalog
    # at 100x. Gate the broadcast hint behind a cardinality check
    # (bounded metadata-cheap count on the dimension): under the cap
    # the hint saves two shuffles; over it, hint-free lets AQE decide
    # from the runtime size instead of forcing an OOM-risk broadcast.
    small_catalog = (
        _t(spark, sf_dir, "part").count() <= PART_BROADCAST_CAP
    )
    _hint = F.broadcast if small_catalog else (lambda df: df)
    return (
        directed.join(
            _hint(item_cnt.select(
                F.col("l_partkey").alias("ant"), F.col("cnt").alias("cnt_ant")
            )),
            "ant",
        )
        .join(
            _hint(item_cnt.select(
                F.col("l_partkey").alias("cons"), F.col("cnt").alias("cnt_cons")
            )),
            "cons",
        )
        .crossJoin(F.broadcast(n_orders))
        .select(
            "ant",
            "cons",
            "cnt_pair",
            "cnt_ant",
            "cnt_cons",
            (F.col("cnt_pair") / F.col("n_orders")).alias("support"),
            (F.col("cnt_pair") / F.col("cnt_ant")).alias("confidence"),
            (
                (F.col("cnt_pair") * F.col("n_orders"))
                / (F.col("cnt_ant") * F.col("cnt_cons"))
            ).alias("lift"),
        )
    )


SQL_X56 = f"""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM items),
pairs AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS cnt_pair
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= {MIN_PAIR_ORDERS}
),
directed AS (
  SELECT pa AS ant, pb AS cons, cnt_pair FROM pairs
  UNION ALL
  SELECT pb AS ant, pa AS cons, cnt_pair FROM pairs
),
item_cnt AS (
  SELECT l_partkey, count(*) AS cnt FROM items GROUP BY l_partkey
)
SELECT d.ant, d.cons,
       CAST(d.cnt_pair AS BIGINT) AS cnt_pair,
       CAST(ia.cnt AS BIGINT) AS cnt_ant,
       CAST(ic.cnt AS BIGINT) AS cnt_cons,
       d.cnt_pair / n.n_orders AS support,
       d.cnt_pair / ia.cnt AS confidence,
       (d.cnt_pair * n.n_orders) / (ia.cnt * ic.cnt) AS lift
FROM directed d
JOIN item_cnt ia ON ia.l_partkey = d.ant
JOIN item_cnt ic ON ic.l_partkey = d.cons
CROSS JOIN n
"""


def q_x57_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(id_a, id_b, id_c): every triangle in the near-dup graph."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.8
    )
    return graph.triangles(pairs, "id_a", "id_b")


SQL_X57 = f"""
WITH {_EDGE_SQL}
SELECT e1.id_a, e1.id_b AS id_b, e2.id_b AS id_c
FROM edges e1
JOIN edges e2 ON e1.id_b = e2.id_a
JOIN edges e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b
"""


def q_a39_seasonal_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, dow, n, dow_avg, seasonal_idx): Monday-0 weekday
    seasonality of value per event type."""
    ev = _t(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type", F.weekday("ts").alias("dow")
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("_sv"))
    w_t = Window.partitionBy("event_type")
    return cells.select(
        "event_type",
        "dow",
        "n",
        F.round(F.col("_sv") / F.col("n"), 6).alias("dow_avg"),
        F.round(
            (F.col("_sv") / F.col("n"))
            / (F.sum("_sv").over(w_t) / F.sum("n").over(w_t)),
            6,
        ).alias("seasonal_idx"),
    )


SQL_A39 = """
WITH cells AS (
  SELECT event_type, isodow(ts) - 1 AS dow,
         count(*) AS n, sum(value) AS sv
  FROM events
  GROUP BY event_type, isodow(ts) - 1
)
SELECT event_type,
       CAST(dow AS INT) AS dow,
       CAST(n AS BIGINT) AS n,
       round(sv / n, 6) AS dow_avg,
       round((sv / n) /
             (sum(sv) OVER (PARTITION BY event_type)
              / sum(n) OVER (PARTITION BY event_type)), 6) AS seasonal_idx
FROM cells
"""


EXT46_QUERIES = {
    "x56_assoc_rules": q_x56_assoc_rules,
    "x57_triangles": q_x57_triangles,
    "a39_seasonal_dow": q_a39_seasonal_dow,
}

EXT46_ORACLES = {
    "x56_assoc_rules": SQL_X56,
    "x57_triangles": SQL_X57,
    "a39_seasonal_dow": SQL_A39,
}
