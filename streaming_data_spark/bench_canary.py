"""The bench's shared_pair_build canary, defined ONCE.

Three sites measure the same pair build — bench.py times it,
tools/floor_probe.py floors it, tools/plan_fps.py fingerprints it —
and until r14 each hand-copied the spec (documents table, doc_id /
text, n=3, threshold=0.8). A one-site edit (say the bench moving to
n=4) would silently leave the fingerprint and floor probing a
DIFFERENT plan, so flap triage would judge the timed build against
the wrong reference with no test failing. All three sites now import
from here.

The spec itself mirrors the shared-pair consumers' registry config
(the x2/x41/x59/x63/x70/x75 tier all build this exact pair set via
``cache_token=sf_dir``), which is why the bench times it as its own
line: only whichever consumer runs first pays the build.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CANARY_TABLE = "documents"
CANARY_ID_COL = "doc_id"
CANARY_TEXT_COL = "text"
CANARY_N = 3
CANARY_THRESHOLD = 0.8


def canary_input(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streaming_data_spark.queries import _t

    return _t(spark, sf_dir, CANARY_TABLE)


def build_lazy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UN-memoized builder — the deterministic analyzed plan
    tools/plan_fps.py fingerprints (the memoizing wrapper returns a
    checkpointed LogicalRDD whose plan string is session-dependent)."""
    from streaming_data_spark.operators import dedup

    return dedup.ngram_jaccard_pairs_prefix(
        canary_input(spark, sf_dir), CANARY_ID_COL, CANARY_TEXT_COL,
        n=CANARY_N, threshold=CANARY_THRESHOLD,
    )


def build_memoized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The memoizing build bench.py/floor_probe.py TIME (clear
    ``dedup._PREFIX_PAIR_CACHE`` first or the call is a cache hit)."""
    from streaming_data_spark.operators import dedup

    return dedup.ngram_jaccard_pairs_prefix_shared(
        canary_input(spark, sf_dir), CANARY_ID_COL, CANARY_TEXT_COL,
        n=CANARY_N, threshold=CANARY_THRESHOLD, cache_token=sf_dir,
    )
