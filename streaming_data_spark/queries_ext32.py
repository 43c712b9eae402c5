"""Thirty-second query wave — bounded-memory heavy hitters:

- x36_heavy_hitters: every token whose corpus frequency exceeds
  n/(k+1), with exact counts, computed WITHOUT a full-vocabulary
  groupBy: per-partition Misra-Gries summaries (≤ k counters per
  task) nominate candidates, a broadcast semi-join + count verifies
  them exactly (operators/sketches.heavy_hitters). The exact-tier
  twin is x18_vocab_top_tokens (full groupBy + rank); this is the
  100 TB tier where vocabulary no longer fits a shuffle — the only
  full-width pass keeps O(k) state per task, and the counting pass
  shuffles candidate rows only.

The final answer is DETERMINISTIC (independent of partitioning):
MG guarantees every global heavy hitter survives into the candidate
set, and the exact verify filter discards everything else — so the
DuckDB HAVING-threshold oracle matches hash-for-hash even though the
intermediate sketch contents vary with partition boundaries.

[EXT] per SURVEY.md §2.11 scope (vocab heavy-hitters, sketch tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_data_spark.operators import sketches
from streaming_data_spark.queries import _t

HH_K = 100


def q_x36_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(token, n_item) for tokens with count > n_total/(k+1)."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.trim("text"), r"\s+")).alias("token")
    )
    return sketches.heavy_hitters(toks, "token", k=HH_K)


SQL_X36 = f"""
WITH tok AS (
  SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
  FROM documents
),
tot AS (SELECT count(*) AS n_total FROM tok)
SELECT token, count(*) AS n_item
FROM tok
GROUP BY token
HAVING count(*) > (SELECT n_total FROM tot) / {float(HH_K + 1)}
"""


EXT32_QUERIES = {
    "x36_heavy_hitters": q_x36_heavy_hitters,
}

EXT32_ORACLES = {
    "x36_heavy_hitters": SQL_X36,
}
