"""Fifteenth query wave — iterative ML training and warehouse history:

- x25_kmeans_assign: distributed Lloyd's k-means over the embeddings
  table (the trainer for the IVF coarse quantizer, similarity.py
  ivf_topk). The ONE genuinely iterative algorithm in the registry —
  made oracle-testable by a deterministic contract (lowest-id init,
  fixed assignment count, lowest-index tie-break, 6-dp-rounded
  centroid means) so the DuckDB oracle can unroll the same two
  assignment passes in SQL.
- scd2_history: slowly-changing-dimension type-2 build over the
  events stream — every (user, event_type) version with its effective
  date range and a current flag. The warehouse materialization of the
  reference's rewrite-current-row upsert (upbit_data_pipeline.py:
  95-117 UPDATEs the live row; SCD2 keeps all versions).

Both [EXT] per SURVEY.md §2.11 scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from streaming_data_spark.operators import aggregates as agg
from streaming_data_spark.operators import similarity
from streaming_data_spark.queries import _t

KMEANS_K = 4
KMEANS_ASSIGN = 2  # assign → update → assign


def q_x25_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.kmeans_lloyd(
        _t(spark, sf_dir, "embeddings"),
        id_col="vec_id",
        vec_col="embedding",
        k=KMEANS_K,
        n_assign=KMEANS_ASSIGN,
    )


# The SQL unrolls exactly the engine's two assignment passes: c0 = the
# k lowest-id vectors; a1 = argmin of the left-fold squared L2 (ties
# to lowest cluster); c1 = element-wise means rounded to 6 dp; final
# assignment against c1. list_sum(list_transform(...)) is the same
# sequential double fold as Spark's F.aggregate(zip_with(...)).
SQL_X25 = f"""
WITH c0 AS (
  SELECT row_number() OVER (ORDER BY vec_id ASC) - 1 AS cl, embedding AS c_vec
  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id ASC LIMIT {KMEANS_K})
),
d1 AS (
  SELECT e.vec_id, c0.cl,
         list_sum(list_transform(range(1, len(e.embedding) + 1),
           i -> (e.embedding[i]::DOUBLE - c0.c_vec[i]::DOUBLE)
              * (e.embedding[i]::DOUBLE - c0.c_vec[i]::DOUBLE))) AS d2
  FROM embeddings e, c0
),
a1 AS (
  SELECT vec_id, cl FROM (
    SELECT vec_id, cl,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cl ASC) AS rn
    FROM d1) WHERE rn = 1
),
comp AS (
  SELECT a1.cl,
         unnest(range(1, len(e.embedding) + 1)) AS pos,
         unnest(e.embedding) AS v
  FROM a1 JOIN embeddings e USING (vec_id)
),
c1 AS (
  SELECT cl, list(val ORDER BY pos ASC) AS c_vec
  FROM (SELECT cl, pos, round(avg(v::DOUBLE), 6) AS val
        FROM comp GROUP BY cl, pos)
  GROUP BY cl
),
d2t AS (
  SELECT e.vec_id, c1.cl,
         list_sum(list_transform(range(1, len(e.embedding) + 1),
           i -> (e.embedding[i]::DOUBLE - c1.c_vec[i])
              * (e.embedding[i]::DOUBLE - c1.c_vec[i]))) AS d2
  FROM embeddings e, c1
)
SELECT vec_id, cl AS cluster FROM (
  SELECT vec_id, cl,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cl ASC) AS rn
  FROM d2t) WHERE rn = 1
"""


def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    return agg.scd2_history(
        _t(spark, sf_dir, "events"),
        key="user_id",
        order_col="ts",
        tracked="event_type",
        tiebreak="event_id",
    )


SQL_SCD2 = """
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts ASC, event_id ASC) AS prev
  FROM events
),
changes AS (
  SELECT user_id, event_type, ts, event_id FROM ordered
  WHERE prev IS NULL OR prev <> event_type
)
SELECT user_id, event_type, ts AS effective_from,
       lead(ts) OVER (PARTITION BY user_id
                      ORDER BY ts ASC, event_id ASC) AS effective_to,
       lead(ts) OVER (PARTITION BY user_id
                      ORDER BY ts ASC, event_id ASC) IS NULL AS is_current
FROM changes
"""


def q_dq_audit_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint audit of the orders table: the reference's DDL-level
    guarantees (PK, FK, enum codes — upbit_data_pipeline.py:25-31,
    68-93) re-expressed as explicit checks, since Spark enforces none
    of them. One scan answers every row-local rule + uniqueness; the
    FK rule adds one broadcast anti-join against customer."""
    from streaming_data_spark.operators.quality import Rule, dq_audit

    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    return dq_audit(
        orders,
        [
            Rule(name="orderkey_not_null", kind="not_null", col="o_orderkey"),
            Rule(name="orderkey_unique", kind="unique", cols=("o_orderkey",)),
            Rule(name="totalprice_positive", kind="in_range", col="o_totalprice", lo=0.0),
            Rule(name="status_in_enum", kind="in_set", col="o_orderstatus", values=("O", "F", "P")),
            Rule(name="priority_format", kind="matches", col="o_orderpriority", pattern="^[1-5]-"),
            Rule(name="custkey_fk_customer", kind="ref_integrity", col="o_custkey", ref=customer, ref_col="c_custkey"),
        ],
    )


SQL_DQ_AUDIT = """
WITH base AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_null,
         CAST(count(DISTINCT o_orderkey) AS BIGINT) AS u_key,
         CAST(sum(CASE WHEN o_totalprice IS NULL OR o_totalprice < 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS v_range,
         CAST(sum(CASE WHEN o_orderstatus IS NULL
                         OR o_orderstatus NOT IN ('O', 'F', 'P')
                       THEN 1 ELSE 0 END) AS BIGINT) AS v_set,
         CAST(sum(CASE WHEN o_orderpriority IS NULL
                         OR NOT regexp_matches(o_orderpriority, '^[1-5]-')
                       THEN 1 ELSE 0 END) AS BIGINT) AS v_re
  FROM orders
),
fk AS (
  SELECT CAST(count(*) AS BIGINT) AS v_fk FROM orders
  WHERE o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_custkey IS NOT NULL)
)
SELECT rule, n_rows, n_violations, n_violations = 0 AS passed FROM (
  SELECT 'orderkey_not_null' AS rule, n AS n_rows, v_null AS n_violations FROM base
  UNION ALL SELECT 'totalprice_positive', n, v_range FROM base
  UNION ALL SELECT 'status_in_enum', n, v_set FROM base
  UNION ALL SELECT 'priority_format', n, v_re FROM base
  UNION ALL SELECT 'orderkey_unique', n, n - u_key FROM base
  UNION ALL SELECT 'custkey_fk_customer', n, v_fk FROM base, fk
)
"""


EXT15_QUERIES = {
    "x25_kmeans_assign": q_x25_kmeans_assign,
    "scd2_history": q_scd2_history,
    "dq_audit_orders": q_dq_audit_orders,
}

EXT15_ORACLES = {
    "x25_kmeans_assign": SQL_X25,
    "scd2_history": SQL_SCD2,
    "dq_audit_orders": SQL_DQ_AUDIT,
}
