"""[EXT] Embedding similarity search (SURVEY.md §2.11 X2/X4).

Two tiers, per the PAPERS.md top-k-similarity line of work:

- ``cosine_topk`` — brute-force exact top-k: the query set is tiny and
  BROADCAST; the corpus streams through one narrow map (dot product in
  JVM higher-order functions, no Python) and a per-query top-k window.
  At 100 TB the corpus scan dominates and parallelizes linearly; no
  shuffle of the corpus, only of (n_queries × k) candidate rows.
- ``signlsh_topk`` — LSH-bucketed approximate variant: random-
  hyperplane sign bits bucket the corpus; each query probes only its
  bucket (and optionally neighbors). The hyperplanes are frozen
  constants so results are deterministic and testable.

Embeddings are array<float>; math is done in double (cast first) with
left-fold summation so Spark and the DuckDB oracle agree bit-for-bit
before rounding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Left-fold double-precision dot product (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    include_self: bool = False,
) -> DataFrame:
    """Exact brute-force cosine top-k per query vector.

    Returns (query_id, neighbor_id, rank, cosine) with deterministic
    (cosine desc, neighbor_id asc) ranking.
    """
    q = F.broadcast(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    pairs = c.crossJoin(q)
    if not include_self:
        pairs = pairs.filter(F.col("neighbor_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        (_dot(F.col("q_vec"), F.col("c_vec"))
         / (_norm(F.col("q_vec")) * _norm(F.col("c_vec")))).alias("cosine_raw"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_raw"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cosine_raw", 6).alias("cosine"))
    )


# 8 frozen pseudo-random hyperplanes for 64-dim embeddings would be 512
# constants; instead derive hyperplane components deterministically from
# md5 of (plane, dim) — portable to SQL and stable forever.
N_PLANES = 8


def _plane_component(plane: int, dim_index: Column) -> Column:
    """Deterministic pseudo-random component in [-1, 1): from the first
    7 md5 hex chars of 'p{plane}:{dim}'."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"p{plane}:"), dim_index.cast("string"))), 1, 7),
        16, 10,
    ).cast("long")
    return (h.cast("double") / F.lit(float(16 ** 7)) ) * 2.0 - 1.0


def sign_bucket(vec: Column, n_planes: int = N_PLANES) -> Column:
    """Random-hyperplane sign bucket id (0 .. 2^n_planes-1)."""
    dims = F.sequence(F.lit(0), F.size(vec) - 1)
    bucket = None
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(vec, dims, lambda x, i: x.cast("double") * _plane_component(p, i)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bit = F.when(proj >= 0, F.lit(2 ** p).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bit if bucket is None else bucket + bit
    return bucket


def signlsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = N_PLANES,
    multiprobe: int = 1,
) -> DataFrame:
    """Approximate cosine top-k: probe the query's sign-LSH bucket plus
    (multiprobe=1) every bucket one bit-flip away — the standard
    multi-probe trade: (n_planes+1)/2^n_planes of the corpus scanned
    instead of all of it, recovering the neighbors that sit just
    across one hyperplane.

    The scale path — the corpus is bucketed ONCE (writable as a
    partitioned table); each query joins its probe set instead of the
    whole corpus. Recall < 1 by construction; measured in tests
    against cosine_topk.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        sign_bucket(F.col(vec_col), n_planes).alias("bucket"),
    )
    q_base = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        sign_bucket(F.col(vec_col), n_planes).alias("home"),
    )
    if multiprobe >= 1:
        probes = F.array(
            F.col("home"),
            *[F.col("home").bitwiseXOR(F.lit(2 ** p)) for p in range(n_planes)],
        )
    else:
        probes = F.array(F.col("home"))
    q = F.broadcast(
        q_base.select("query_id", "q_vec", F.explode(probes).alias("bucket"))
    )
    pairs = (
        c.join(q, "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        (_dot(F.col("q_vec"), F.col("c_vec"))
         / (_norm(F.col("q_vec")) * _norm(F.col("c_vec")))).alias("cosine_raw"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_raw"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cosine_raw", 6).alias("cosine"))
    )
