"""Thirty-fifth query wave — the x30 production tier (round-6 judge
ask #2): an inverted index whose aggregation state is provably
bounded, closing the one scale-design weakness of
``x30_inverted_index`` (queries_ext19.py).

- x30_inverted_index_capped: same output contract as x30 (token, df,
  tf, first-K postings) but with two structural guards:

  1. **Hot-token drop** (CCNet/stopword rule): tokens appearing in
     more than ``MAX_DF_RATIO`` of all documents are dropped — they
     carry no retrieval signal, and they are exactly the tokens whose
     posting lists grow with the corpus. The hot set is BOUNDED by
     pigeonhole: a token with df > r·N implies ≤ L/r such tokens
     (L = average doc length in tokens), independent of corpus row
     count — so it broadcast-anti-joins against the pair stream and
     no hot key ever enters a downstream shuffle.
  2. **Bounded posting state**: instead of ``collect_set`` (an
     in-memory aggregation buffer holding EVERY doc_id of a token),
     postings come from ``row_number`` over (token, doc_id) — a
     streaming O(1)-memory window over a sort-based (disk-spillable)
     shuffle — filtered to rn ≤ K BEFORE the ``collect_list``, whose
     state is therefore ≤ K elements per token by construction.

  The exact tier (x30) is kept for the oracle/parity contract; this
  tier is the one a 100 TB corpus runs. Reference ancestor: the same
  search-index pass as x30 (review-corpus indexing,
  crawling_code/get_best_item_review.py:34-36).

[EXT]-classic per SURVEY.md §2.11 scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streaming_data_spark.queries import _t

POSTINGS_K = 10
MAX_DF_RATIO = 0.79  # drop tokens present in > 79% of documents


def q_x30_inverted_index_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production inverted index: df/tf per kept token + first-K
    postings, with hot tokens (df > MAX_DF_RATIO·n_docs) dropped and
    all per-token state bounded (see module docstring).

    Plan shape (pinned in tests/test_plans.py): one explode, one
    map-side-combinable stats aggregate, a broadcast LEFT ANTI join
    against the bounded hot set, one window (sort-spillable,
    streaming rank), and a ≤K-element collect_list. No collect_set
    anywhere.
    """
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim("text"), r"\s+")).alias("token"),
    )
    # r16: ONE (token, doc_id) grouped pass feeds BOTH branches. The
    # old shape ran the explode twice — once through countDistinct's
    # two-phase distinct-aggregate rewrite for stats, once through
    # toks.distinct() for the postings stream — as structurally
    # different subtrees Spark could not share (and plain
    # exchange-reuse can't either: column pruning drops `_c` from the
    # postings branch, so the two exchanges never canonicalize equal
    # — verified in plans/r16). The eager localCheckpoint is what
    # actually makes it ONE corpus explode+shuffle: downstream stats
    # and postings both read the materialized (token, doc_id) table,
    # which is the dedup'd postings stream — the same
    # bounded-intermediate grain the prefix-pair build checkpoints
    # (dedup.py dictsh). Aggregation state stays bounded: counts
    # only, no collect over unbounded sets.
    pairs = (
        toks.groupBy("token", "doc_id")
        .agg(F.count(F.lit(1)).alias("_c"))
        .localCheckpoint(eager=True)
    )
    stats = pairs.groupBy("token").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("_c").alias("tf"),
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    stats = stats.crossJoin(F.broadcast(n_docs))
    hot = stats.filter(F.col("df") > MAX_DF_RATIO * F.col("n_docs")).select("token")
    kept = stats.filter(F.col("df") <= MAX_DF_RATIO * F.col("n_docs"))
    cold_pairs = pairs.select("token", "doc_id").join(
        F.broadcast(hot), "token", "left_anti"
    )
    w = Window.partitionBy("token").orderBy(F.col("doc_id").asc())
    ranked = (
        cold_pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= POSTINGS_K)
    )
    postings = ranked.groupBy("token").agg(
        F.array_join(F.sort_array(F.collect_list("doc_id")), ",").alias("postings")
    )
    return kept.join(postings, "token").select("token", "df", "tf", "postings")


SQL_X30_CAPPED = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
  FROM documents
),
stats AS (
  SELECT token, count(DISTINCT doc_id) AS df, count(*) AS tf
  FROM toks GROUP BY token
),
n AS (SELECT count(*) AS n_docs FROM documents),
pairs AS (SELECT DISTINCT token, doc_id FROM toks),
ranked AS (
  SELECT token, doc_id,
         row_number() OVER (PARTITION BY token ORDER BY doc_id ASC) AS rn
  FROM pairs
),
post AS (
  SELECT token, array_to_string(list(doc_id ORDER BY doc_id), ',') AS postings
  FROM ranked WHERE rn <= {POSTINGS_K} GROUP BY token
)
SELECT s.token, CAST(s.df AS BIGINT) AS df, CAST(s.tf AS BIGINT) AS tf,
       p.postings
FROM stats s JOIN post p USING (token), n
WHERE s.df <= {MAX_DF_RATIO} * n.n_docs
"""


EXT35_QUERIES = {
    "x30_inverted_index_capped": q_x30_inverted_index_capped,
}

EXT35_ORACLES = {
    "x30_inverted_index_capped": SQL_X30_CAPPED,
}
