"""Sixth query wave — deeper decision-support shapes over the full
table set. These generalize the reference's analytical layer (its
hand-written Postgres CTAS joins and rollups,
upbit_data_pipeline.py:142-176) to the multi-way join + conditional
aggregation + correlated-filter patterns a user of a complete engine
runs daily. Q-numbers name the classic TPC-H shape each one exercises;
the testdata lacks partsupp/phone/receiptdate so Q2/Q12/Q21/Q22 appear
as the nearest expressible variant.

Every query is scale-planned: selective filters sit on the scan side
(pushdown), dims broadcast after filtering, facts shuffle only on
their join keys, conditional sums replace self-joins, and final sorts
are top-k (TakeOrderedAndProject), never global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_data_spark.queries import _t

# --------------------------------------------------------------------------
# Q7 shape — volume shipping between two nations, by year
# --------------------------------------------------------------------------

def q_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue shipped between (supplier-nation, customer-nation) pairs
    in either direction for two named nations, split by ship year.

    Plan: nation is a 25-row broadcast on BOTH legs (supplier side and
    customer side); the date filter pushes into the lineitem scan; the
    only shuffles are lineitem⋈orders (orderkey) and ⋈customer
    (custkey). The nation-pair predicate is applied after the cheap
    broadcast joins — no fact⋈fact blowup beyond the required two.
    """
    n1, n2 = "NATION_3", "NATION_7"
    lineitem = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    supp_n = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust_n = customer.join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))

    return (
        lineitem.join(F.broadcast(supp_n), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust_n, F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            ((F.col("supp_nation") == n1) & (F.col("cust_nation") == n2))
            | ((F.col("supp_nation") == n2) & (F.col("cust_nation") == n1))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


SQL_Q7 = """
SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l_shipdate) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
    AND l_shipdate >= TIMESTAMP '1995-01-01'
    AND l_shipdate <  TIMESTAMP '1997-01-01'
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""

# --------------------------------------------------------------------------
# Q8 shape — national market share within a region, by year
# --------------------------------------------------------------------------

def q_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One nation's share of AMERICA-region revenue for one part type, by
    order year — the conditional-sum-over-group pattern (a self-join
    in naive form; here one pass: sum(when)/sum).

    Plan: part filtered on p_type THEN broadcast into lineitem (the
    most selective reducer first); region⋈nation broadcast chain onto
    the customer leg; supplier-nation broadcast for the numerator
    label. Facts shuffle on orderkey/custkey only.
    """
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    america_nations = nation.join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("am_nationkey"))
    supp_nation = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "supp_nation")
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(america_nations),
            F.col("c_nationkey") == F.col("am_nationkey"),
        )
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_5", volume).otherwise(F.lit(0.0)))
                / F.sum(volume),
                6,
            ).alias("mkt_share")
        )
    )


SQL_Q8 = """
SELECT o_year,
       round(sum(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0 END)
             / sum(volume), 6) AS mkt_share
FROM (
  SELECT year(o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS supp_nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region    ON n1.n_regionkey = r_regionkey
  JOIN supplier  ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'AMERICA'
    AND p_type = 'STANDARD'
    AND o_orderdate >= TIMESTAMP '1995-01-01'
    AND o_orderdate <  TIMESTAMP '1997-01-01'
) all_nations
GROUP BY o_year
"""

# --------------------------------------------------------------------------
# Q10 shape — top-20 customers by returned-revenue in a quarter
# --------------------------------------------------------------------------

def q_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lost revenue from returned lineitems for orders of one quarter,
    per customer, top 20.

    Plan: both selective filters (return flag, quarter) push into
    their scans; orders⋈lineitem shuffles on orderkey, the grouped
    customer aggregate shuffles on custkey, nation broadcasts, and the
    final ordering is TakeOrderedAndProject(20) — no global sort.
    """
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-10-01") & (F.col("o_orderdate") < "1996-01-01")
    )
    lineitem = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = _t(spark, sf_dir, "nation")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("lost_revenue")
        )
        .orderBy(F.desc("lost_revenue"), F.asc("c_custkey"))
        .limit(20)
    )


SQL_Q10 = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS lost_revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1995-10-01'
  AND o_orderdate <  TIMESTAMP '1996-01-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY lost_revenue DESC, c_custkey ASC
LIMIT 20
"""

# --------------------------------------------------------------------------
# Q18 shape — large-volume orders (group-HAVING then join back)
# --------------------------------------------------------------------------

Q18_MIN_QTY = 150


def q_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders whose total lineitem quantity exceeds a threshold, with
    customer context — the aggregate-then-semi-join decorrelation of
    ``o_orderkey IN (SELECT ... HAVING sum > N)``.

    Plan: ONE shuffle of lineitem on orderkey produces the HAVING set;
    that (small) set joins orders on the same key — AQE turns it into
    a broadcast once its size is known. Customer joins on custkey.
    Never materializes the IN-list on the driver.
    """
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > Q18_MIN_QTY)
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey", "c_name", "o_orderkey",
            F.col("o_orderdate").alias("orderdate"),
            F.col("o_totalprice").alias("totalprice"),
            "total_qty",
        )
    )


SQL_Q18 = f"""
SELECT c_custkey, c_name, o_orderkey,
       o_orderdate AS orderdate, o_totalprice AS totalprice,
       round(big.total_qty, 2) AS total_qty
FROM orders
JOIN (
  SELECT l_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING round(sum(l_quantity), 2) > {Q18_MIN_QTY}
) big ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
"""

# --------------------------------------------------------------------------
# Q22 shape — well-funded customers with no orders (anti-join + scalar
# subquery; testdata has no phone column, so the cohort is acctbal-based)
# --------------------------------------------------------------------------

Q22_LAPSE_CUTOFF = "2000-01-01"


def q_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation count and balance of customers whose account balance
    beats the positive-balance average but who have placed no order
    since the cutoff (every testdata customer has SOME order, so the
    lapse window is what makes the cohort non-trivial — 55 rows at
    sf0.01).

    Plan: the scalar average is ONE tiny aggregate broadcast into the
    filter (no correlated re-scan); the lapse test is a left-anti join
    on custkey against date-filtered orders (the filter pushes to the
    scan; never duplicates, never materializes an IN-list); final
    rollup shuffles 25 nation keys.
    """
    customer = _t(spark, sf_dir, "customer")
    recent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= Q22_LAPSE_CUTOFF
    )
    avg_bal = customer.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


SQL_Q22 = f"""
SELECT c_nationkey AS nationkey,
       count(*) AS n_custs,
       round(sum(c_acctbal), 2) AS total_bal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '{Q22_LAPSE_CUTOFF}')
GROUP BY c_nationkey
"""


EXT6_QUERIES = {
    "q7_nation_volume": q_q7_nation_volume,
    "q8_market_share": q_q8_market_share,
    "q10_returned_items": q_q10_returned_items,
    "q18_large_orders": q_q18_large_orders,
    "q22_idle_customers": q_q22_idle_customers,
}

EXT6_ORACLES = {
    "q7_nation_volume": SQL_Q7,
    "q8_market_share": SQL_Q8,
    "q10_returned_items": SQL_Q10,
    "q18_large_orders": SQL_Q18,
    "q22_idle_customers": SQL_Q22,
}
