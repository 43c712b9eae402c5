"""Thirty-ninth query wave — centrality over the duplicate graph:

- x42_pagerank: PageRank (d=0.85, 5 fixed iterations) over the
  Jaccard≥0.8 near-dup edges — the centrality signal that ranks the
  hub copy of a mirrored document above its leaf copies, the
  iterative-graph-algorithm representative next to X13's connected
  components. See operators/graph.py for the distributed shape.

Oracle: the SAME recurrence UNROLLED 5 times in DuckDB (aggregation
inside a recursive CTE term is not portable SQL; a fixed iteration
count makes unrolling exact). Both engines compute
(1-d)/N + d·Σ rank/deg with identical expressions; the Σ is the one
order-dependent float sum → final round to 6 on both sides.

[EXT]-classic per SURVEY.md §2.11 scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from streaming_data_spark.operators import dedup, graph
from streaming_data_spark.queries import _t
from streaming_data_spark.queries_ext9 import _EDGE_SQL

PR_ITERS = 5
PR_DAMPING = 0.85


def q_x42_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(id, pagerank) over the documents near-dup graph."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.8)
    return graph.pagerank(pairs, "id_a", "id_b", iters=PR_ITERS, damping=PR_DAMPING)


def _pagerank_sql() -> str:
    d = PR_DAMPING
    # The Spark side bakes base = (1.0 - damping)/n from PYTHON float
    # arithmetic; writing `(1.0 - 0.85)` in SQL would evaluate in
    # DuckDB DECIMAL (exact 0.15, one ulp BELOW Python's
    # 0.15000000000000002) and drift the recurrence — interpolate the
    # Python-computed constant so both engines divide the same double.
    one_minus_d = repr(1.0 - d)
    steps = []
    prev = "r0"
    for k in range(1, PR_ITERS + 1):
        steps.append(f"""r{k} AS (
  SELECT n.id,
         {one_minus_d} / nn.n + {d} * coalesce(c.s, 0.0) AS rank
  FROM nodes n
  LEFT JOIN (
    SELECT e.v AS id, sum(p.rank / dg.deg) AS s
    FROM {prev} p
    JOIN sym e ON e.u = p.id
    JOIN nodes dg ON dg.id = p.id
    GROUP BY e.v
  ) c USING (id), nn
)""")
        prev = f"r{k}"
    chain = ",\n".join(steps)
    return rf"""
WITH {_EDGE_SQL}, sym AS (
  SELECT id_a AS u, id_b AS v FROM edges
  UNION
  SELECT id_b AS u, id_a AS v FROM edges
), nodes AS (
  SELECT u AS id, count(*) AS deg FROM sym GROUP BY u
), nn AS (SELECT count(*) AS n FROM nodes),
r0 AS (
  SELECT id, 1.0 / nn.n AS rank FROM nodes, nn
),
{chain}
SELECT id, round(rank, 6) AS pagerank FROM {prev}
"""


SQL_X42 = _pagerank_sql()


EXT39_QUERIES = {
    "x42_pagerank": q_x42_pagerank,
}

EXT39_ORACLES = {
    "x42_pagerank": SQL_X42,
}
