"""Fourteenth query wave — the last classic decision-support shapes
(TPC-H Q2/Q12/Q20/Q21 analogs), adapted to the driver testdata schema
(no partsupp table, no l_shipmode / l_commitdate / l_receiptdate —
each query keeps its ancestor's PLAN SHAPE, which is what the engine
is exercised on, using the columns that exist).

Shapes this wave adds that no earlier query covers:
- q2:  decorrelated min-per-group join — the per-part minimum unit
       price computed once, equi-joined back on (key, min) so ties
       survive; a correlated scalar subquery flattened into a join.
- q12: dual conditional aggregation over a join — one pass, two
       CASE-sums splitting the same measure by a dimension predicate
       (the classic "high/low priority line count by category").
- q20: nested semi-join chain — an aggregated subquery threshold
       feeding an IN feeding another IN (part filter → per-(supp,
       part) quantity rollup → supplier semi join → nation filter).
- q21: EXISTS + NOT EXISTS self-joins on the fact — suppliers that
       were the sole returner on multi-supplier orders; the only
       query with two correlated self-anti/semi joins on one table.

Reference anchor: the reference's relational engine executes exactly
these SQL shapes server-side in Postgres (SURVEY.md §2.4-§2.5; the
join at upbit_data_pipeline.py:171-176 and the per-key min/max scans
of upbit_daily_candels.py). [EXT]-classic per SURVEY.md §2.11 scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_data_spark.queries import _t


# --------------------------------------------------------------------------
# Q2 shape — min-cost supplier per part (decorrelated min + tie join)
# --------------------------------------------------------------------------

Q2_PART_SIZE = 15


def q_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every size-15 part, the supplier(s) that shipped it at the
    minimum unit price (l_extendedprice / l_quantity), with nation.

    Plan shape (TPC-H Q2's correlated `ps_supplycost = (SELECT min…)`
    decorrelated): one shuffle groups lineitem by partkey for the min;
    the min is joined back on (partkey, unit_price) equality — ties
    all surface. The part filter broadcasts and prunes both sides;
    supplier⋈nation broadcast for the name lookup. The fact shuffles
    once (on l_partkey) and that exchange is reused by both branches
    under AQE.

    unit_price is deliberately NOT rounded: IEEE division of identical
    doubles is bit-deterministic in every engine, so the EXACT value
    is the engine-agnostic join key — whereas round(x, 4) on DOUBLE
    diverges at boundary values (Spark rounds the shortest decimal
    representation HALF_UP; DuckDB multiplies by 1e4 in binary first,
    which can carry the product across the .5 line; observed:
    26.2412 vs 26.2413 at sf0.001). min() of exact doubles is exact.
    """
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") == Q2_PART_SIZE)
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    priced = (
        _t(spark, sf_dir, "lineitem")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "l_partkey",
            "l_suppkey",
            (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
        )
    )
    # distinct output names on the agg side — self-derived joins are
    # ambiguous if both sides still carry the lineage of l_partkey
    min_price = priced.groupBy(F.col("l_partkey").alias("mp_partkey")).agg(
        F.min("unit_price").alias("min_price")
    )
    return (
        priced.join(
            min_price,
            on=[
                F.col("l_partkey") == F.col("mp_partkey"),
                F.col("unit_price") == F.col("min_price"),
            ],
        )
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("s_name").alias("s_name"),
            F.col("n_name").alias("n_name"),
            F.col("min_price").alias("min_price"),
        )
        .distinct()  # a supplier may hit the min on several lines of one part
    )


SQL_Q2 = f"""
WITH priced AS (
  SELECT l_partkey, l_suppkey,
         l_extendedprice / l_quantity AS unit_price
  FROM lineitem
  JOIN part ON l_partkey = p_partkey AND p_size = {Q2_PART_SIZE}
)
SELECT DISTINCT priced.l_partkey AS partkey, s_name, n_name, m.min_price
FROM priced
JOIN (SELECT l_partkey, min(unit_price) AS min_price
      FROM priced GROUP BY l_partkey) m
  ON priced.l_partkey = m.l_partkey AND priced.unit_price = m.min_price
JOIN supplier ON priced.l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
"""


# --------------------------------------------------------------------------
# Q12 shape — dual conditional aggregation over a fact⋈fact join
# --------------------------------------------------------------------------

Q12_START = "1996-01-01"
Q12_END = "1997-01-01"


def q_q12_priority_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per line status (the shipmode stand-in), how many 1996-shipped
    lines belong to urgent/high-priority orders vs everything else —
    TPC-H Q12's two CASE-sums in ONE aggregation pass.

    Plan: shipdate range pushes to the lineitem scan; one shuffle on
    l_orderkey joins orders (fact⋈fact, too big to broadcast at real
    scale — this is the wave's only non-broadcast join, intentionally);
    the group-by on l_linestatus then aggregates both CASE branches in
    the same partial/final pass (no second scan, no second shuffle of
    the joined rows beyond the 2-group rollup).
    """
    lineitem = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= Q12_START) & (F.col("l_shipdate") < Q12_END)
    )
    orders = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("l_linestatus").alias("linestatus"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


SQL_Q12 = f"""
SELECT l_linestatus AS linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '{Q12_START}'
  AND l_shipdate < TIMESTAMP '{Q12_END}'
GROUP BY l_linestatus
"""


# --------------------------------------------------------------------------
# Q20 shape — nested semi-join chain with an aggregated threshold
# --------------------------------------------------------------------------

Q20_NAME_FRAG = "forest"  # part-name fragment, per TPC-H Q20's 'forest%'
Q20_START = "1996-01-01"
Q20_END = "1997-01-01"
Q20_MIN_QTY = 50.0  # stands in for Q20's "half of availqty" threshold


def q_q20_heavy_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers in an ASIA-region nation that shipped more than
    Q20_MIN_QTY total quantity of any 'forest'-named part in 1996 —
    TPC-H Q20's IN(IN(agg-subquery)) chain as layered semi joins.

    Plan: the innermost filter (p_name LIKE) broadcasts into the fact;
    one shuffle rolls up (suppkey, partkey) quantity; the HAVING
    filters that rollup; the supplier table is then LEFT SEMI joined
    against the surviving suppkeys (dedup for free, no row
    multiplication — exactly what IN means); nation filter broadcast.
    """
    part = _t(spark, sf_dir, "part").filter(
        F.lower(F.col("p_name")).contains(Q20_NAME_FRAG)
    )
    lineitem = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= Q20_START) & (F.col("l_shipdate") < Q20_END)
    )
    heavy_supps = (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > Q20_MIN_QTY)
        .select("l_suppkey")
    )
    nation = _t(spark, sf_dir, "nation")
    supplier = _t(spark, sf_dir, "supplier")
    return (
        supplier.join(
            heavy_supps,
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("s_name"),
            F.col("n_name").alias("n_name"),
        )
    )


SQL_Q20 = f"""
SELECT s_suppkey AS suppkey, s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (
          SELECT p_partkey FROM part
          WHERE lower(p_name) LIKE '%{Q20_NAME_FRAG}%')
    AND l_shipdate >= TIMESTAMP '{Q20_START}'
    AND l_shipdate < TIMESTAMP '{Q20_END}'
  GROUP BY l_suppkey, l_partkey
  HAVING sum(l_quantity) > {Q20_MIN_QTY}
)
"""


# --------------------------------------------------------------------------
# Q21 shape — EXISTS + NOT EXISTS correlated self-joins on the fact
# --------------------------------------------------------------------------


def q_q21_sole_returner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers whose returned lines ('R') sit on finished ('F')
    multi-supplier orders where NO other supplier's line was returned
    — i.e. the order's sole returner. TPC-H Q21's signature EXISTS +
    NOT EXISTS self-join pair, with l_returnflag standing in for the
    receipt-after-commit lateness predicate.

    Plan: three scans of lineitem (base returned lines; other-supplier
    existence; other-supplier-returned anti). All three shuffle on
    l_orderkey — AQE reuses the exchange across branches. The semi
    join keeps orders with ANY other supplier; the anti join then
    removes orders where any OTHER supplier also returned. The final
    count groups by supplier (tiny shuffle). No broadcast of the fact
    sides — at 100 TB every branch stays a shuffle hash join on the
    same key, which is the co-partitioned ideal.
    """
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supplier = _t(spark, sf_dir, "supplier")

    l1 = (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(orders.select("o_orderkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .select("l_orderkey", "l_suppkey")
    )
    l2 = lineitem.select(
        F.col("l_orderkey").alias("o2_orderkey"),
        F.col("l_suppkey").alias("o2_suppkey"),
    )
    l3 = lineitem.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("o3_orderkey"),
        F.col("l_suppkey").alias("o3_suppkey"),
    )
    exists_other = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("o2_orderkey"))
        & (F.col("l_suppkey") != F.col("o2_suppkey")),
        "left_semi",
    )
    sole_returner = exists_other.join(
        l3,
        (F.col("l_orderkey") == F.col("o3_orderkey"))
        & (F.col("l_suppkey") != F.col("o3_suppkey")),
        "left_anti",
    )
    return (
        sole_returner.select("l_orderkey", "l_suppkey")
        .distinct()  # several returned lines by one supp on one order = one wait
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("s_name").alias("s_name"))
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


SQL_Q21 = """
SELECT s_name, count(*) AS numwait
FROM (
  SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
  FROM lineitem l1
  JOIN orders ON l1.l_orderkey = o_orderkey AND o_orderstatus = 'F'
  WHERE l1.l_returnflag = 'R'
    AND EXISTS (SELECT 1 FROM lineitem l2
                WHERE l2.l_orderkey = l1.l_orderkey
                  AND l2.l_suppkey <> l1.l_suppkey)
    AND NOT EXISTS (SELECT 1 FROM lineitem l3
                    WHERE l3.l_orderkey = l1.l_orderkey
                      AND l3.l_suppkey <> l1.l_suppkey
                      AND l3.l_returnflag = 'R')
) waits
JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name
"""


EXT14_QUERIES = {
    "q2_min_cost_supplier": q_q2_min_cost_supplier,
    "q12_priority_split": q_q12_priority_split,
    "q20_heavy_suppliers": q_q20_heavy_suppliers,
    "q21_sole_returner": q_q21_sole_returner,
}

EXT14_ORACLES = {
    "q2_min_cost_supplier": SQL_Q2,
    "q12_priority_split": SQL_Q12,
    "q20_heavy_suppliers": SQL_Q20,
    "q21_sole_returner": SQL_Q21,
}
