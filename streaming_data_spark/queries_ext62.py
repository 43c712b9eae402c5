"""Sixty-second query wave — containment dedup, hybrid-retrieval
fusion, interval-stabbing ops analytics:

- x98_containment_pairs: ASYMMETRIC shingle containment
  C(A→B) = |A∩B|/|A| ≥ 0.9 — the "smaller doc is contained in the
  bigger one" detector (quote inclusion, boilerplate wrapping,
  excerpt pages) that symmetric Jaccard misses: a 40-shingle doc
  embedded verbatim inside a 400-shingle page has Jaccard ≈ 0.1 but
  containment 1.0. Candidate generation is the PPJoin-family prefix
  filter specialised to containment: A may miss at most
  |A| − ceil(t·|A|) of its own shingles in any qualifying partner,
  so A-side prefixes (rarest-first) join against the FULL shingle
  table losslessly — hot shingles sort last and never enter a
  prefix, so the candidate join is bounded by rare-shingle document
  frequency, never set×set.
- x99_rrf_fusion: reciprocal rank fusion (Cormack et al. SIGIR'09,
  public) of a LEXICAL ranking (distinct-token Jaccard to the query
  doc) and a DENSE ranking (embedding cosine) — the standard hybrid
  retrieval combiner. score = Σ_lists 1/(60+rank), missing-from-list
  contributes 0. Every term is a quotient of small integers and the
  two-term sum is a single IEEE addition — bit-exact in any engine,
  no rounding anywhere.
- a77_open_order_backlog: daily open-order backlog via interval
  stabbing turned into ±1 delta events — an order is open from
  o_orderdate through its last lineitem shipdate; +1 at open, −1
  the day after close; the backlog is the running sum over the
  day-grain delta table. The classic ops "how many orders are
  in-flight right now" series without ever materializing
  order×day rows.

Scale shapes: x98 = one df groupBy + one per-doc rank window + a
prefix⋈full-shingle candidate join + exact-verify joins — the known
x2-prefix family with a one-sided prefix; x99 = query side is 3
broadcast rows for BOTH lists (token join hits only query-doc
tokens; cosine is a broadcast nested loop), per-query top-k windows
over |queries| partitions, RRF itself is a k-bounded full-outer
join; a77 = one fact-fact keyed join (order → last shipdate) into a
day-grain delta agg, then the sanctioned cumulative window runs
over ≤ calendar-days rows.

[EXT]-classic per SURVEY.md §2.11 scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streaming_data_spark.operators import dedup, similarity
from streaming_data_spark.queries import _t

CONTAIN_T = 0.9
RRF_K = 60
FUSE_TOPK = 10
N_QUERY_DOCS = 3


# --------------------------------------------------------------------------
# x98 — asymmetric containment pairs
# --------------------------------------------------------------------------

def q_x98_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(id_a, id_b, n_a, n_b, containment): 3-gram shingle containment
    |A∩B|/|A| ≥ 0.9 with A the smaller side ((n_a, id_a) < (n_b, id_b)
    lexicographically, so each unordered pair appears once in its
    subset-direction)."""
    docs = _t(spark, sf_dir, "documents")
    # Hash-encoded, filter-pruned build (r16 ported the
    # ngram_jaccard_pairs_prefix treatments to the one-sided
    # containment join; r17 swapped the string-keyed dictionary for
    # the collision-guarded xxhash64 encoding — see
    # dedup.ranked_encoded_shingles for the guard construction, the
    # determinism fix and the order-invariance argument): the prefix
    # rank (_rk) and per-doc set size (n_sh) ride the encoded table,
    # eagerly checkpointed so every downstream branch (A-prefix,
    # candidate b-side, both exact-verify sides) reads the SAME
    # materialized int-keyed rows, and the ~40-byte shingle string
    # dies at the post-explode projection without crossing any
    # exchange (the x300 lesson: the string-keyed jaccard build
    # spilled ~49 GB).
    ranked = dedup.ranked_encoded_shingles(
        docs, "doc_id", "text", n=3
    ).localCheckpoint(eager=True)
    # A-side prefix: |A| - ceil(t_eff*|A|) + 1 rarest shingles. Exact
    # ceil via the 1e-9 nudge, and t_eff = CONTAIN_T - 1e-6 because
    # the output contract is round(o/n_a, 6) >= t (admits o as low as
    # (t - 5e-7)*n_a) — same rationale and same tested-SF inertness as
    # ngram_jaccard_pairs_prefix's `needed` (dedup.py).
    needed = F.ceil(
        (F.lit(CONTAIN_T) - F.lit(1e-6)) * F.col("n_sh") - F.lit(1e-9)
    )
    pref_a = ranked.filter(
        F.col("_rk") <= F.col("n_sh") - needed + 1
    ).select(
        F.col("doc_id").alias("id_a"),
        "_sid",
        F.col("_rk").alias("_rk_a"),
        F.col("n_sh").alias("n_a"),
    )
    b_full = ranked.select(
        F.col("doc_id").alias("id_b"), "_sid", F.col("n_sh").alias("n_b")
    )
    # Per-instance ORIENTATION and POSITIONAL filters before the
    # candidate dedup (lossless; measured 133,273 → 69,064 candidate
    # pairs at sf0.1):
    # - orientation is the output's own (n_a,id_a) < (n_b,id_b)
    #   subset-direction predicate, evaluated early — an instance
    #   failing it can never reach the output.
    # - positional (PPJoin adapted to containment): at A's FIRST
    #   common element (rank p_a) every earlier A-element is
    #   non-shared, so o ≤ 1 + n_a − p_a; a qualifying pair has
    #   o ≥ (t − 5e−7)·n_a (round(o/n_a, 6) ≥ t), so its first-common
    #   instance always passes `1 + n_a − p_a ≥ (t − 1e−6)·n_a` and
    #   `distinct()` needs only one surviving instance per pair. The
    #   −1e−9 nudge guards integer-boundary products, as in `needed`.
    orient = (F.col("n_a") < F.col("n_b")) | (
        (F.col("n_a") == F.col("n_b")) & (F.col("id_a") < F.col("id_b"))
    )
    cand = (
        pref_a.join(b_full, "_sid")
        .filter(F.col("id_a") != F.col("id_b"))
        .filter(orient)
        .filter(
            F.lit(1) + (F.col("n_a") - F.col("_rk_a"))
            >= (F.lit(CONTAIN_T) - F.lit(1e-6)) * F.col("n_a") - F.lit(1e-9)
        )
        .select("id_a", "id_b")
        .distinct()
    )
    a_full = ranked.select(
        F.col("doc_id").alias("id_a"), "_sid", F.col("n_sh").alias("n_a")
    )
    # exact verification, int-keyed; n_a/n_b ride the verify joins as
    # group constants (max) — the two doc-keyed size joins of the HEAD
    # shape are gone (the shared_pair_build trick).
    inter = (
        cand.join(a_full, "id_a")
        .join(b_full, ["id_b", "_sid"])
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("n_inter"),
            F.max("n_a").alias("n_a"),
            F.max("n_b").alias("n_b"),
        )
    )
    return (
        inter.withColumn(
            "containment", F.round(F.col("n_inter") / F.col("n_a"), 6)
        )
        .filter(
            (F.col("containment") >= CONTAIN_T)
            & (
                (F.col("n_a") < F.col("n_b"))
                | ((F.col("n_a") == F.col("n_b")) & (F.col("id_a") < F.col("id_b")))
            )
        )
        .select("id_a", "id_b", "n_a", "n_b", "containment")
    )


SQL_X98 = rf"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
), sh AS (
  SELECT doc_id, unnest(list_distinct(
    list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
  )) AS s
  FROM toks
), sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       CAST(sa.n_sh AS BIGINT) AS n_a, CAST(sb.n_sh AS BIGINT) AS n_b,
       round(n_inter * 1.0 / sa.n_sh, 6) AS containment
FROM inter
JOIN sizes sa ON id_a = sa.doc_id
JOIN sizes sb ON id_b = sb.doc_id
WHERE round(n_inter * 1.0 / sa.n_sh, 6) >= {CONTAIN_T}
  AND (sa.n_sh < sb.n_sh OR (sa.n_sh = sb.n_sh AND id_a < id_b))
"""


# --------------------------------------------------------------------------
# x99 — reciprocal rank fusion of lexical + dense rankings
# --------------------------------------------------------------------------

def q_x99_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, neighbor_id, lex_rank, dense_rank, rrf, rank):
    fused top-10 per query doc (doc_id < 3) over the embedded corpus
    (docs that have an embedding row), RRF k=60."""
    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    # candidate universe = docs with an embedding (doc_id == vec_id by
    # construction of the testdata corpus; at sf0.1 only a prefix of
    # docs is embedded, so the semi-join matters)
    universe = docs.join(
        emb.select(F.col("vec_id").alias("doc_id")), "doc_id", "semi"
    )
    toks = universe.select(
        "doc_id", F.explode(F.array_distinct(F.split(F.trim("text"), r"\s+"))).alias("tok")
    )
    tok_sizes = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tok"))
    q_toks = F.broadcast(
        toks.filter(F.col("doc_id") < N_QUERY_DOCS).select(
            F.col("doc_id").alias("query_id"), "tok"
        )
    )
    q_sizes = F.broadcast(
        tok_sizes.filter(F.col("doc_id") < N_QUERY_DOCS).select(
            F.col("doc_id").alias("query_id"), F.col("n_tok").alias("n_q")
        )
    )
    overlap = (
        toks.join(q_toks, "tok")
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    lex = (
        overlap.join(q_sizes, "query_id")
        .join(tok_sizes, "doc_id")
        .select(
            "query_id",
            F.col("doc_id").alias("neighbor_id"),
            (
                F.col("n_inter")
                / (F.col("n_q") + F.col("n_tok") - F.col("n_inter"))
            ).alias("jac"),
        )
        .withColumn(
            "lex_rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("jac"), F.asc("neighbor_id")
                )
            ),
        )
        .filter(F.col("lex_rank") <= FUSE_TOPK)
        .select("query_id", "neighbor_id", "lex_rank")
    )
    dense = similarity.cosine_topk(
        emb, emb.filter(F.col("vec_id") < N_QUERY_DOCS), k=FUSE_TOPK
    ).select("query_id", "neighbor_id", F.col("rank").alias("dense_rank"))
    fused = (
        lex.join(dense, ["query_id", "neighbor_id"], "full_outer")
        .withColumn(
            "rrf",
            F.coalesce(1.0 / (F.lit(RRF_K) + F.col("lex_rank")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(RRF_K) + F.col("dense_rank")), F.lit(0.0)),
        )
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("rrf"), F.asc("neighbor_id")
                )
            ),
        )
        .filter(F.col("rank") <= FUSE_TOPK)
    )
    return fused.select(
        "query_id", "neighbor_id", "lex_rank", "dense_rank", "rrf", "rank"
    )


SQL_X99 = rf"""
WITH universe AS (
  SELECT d.* FROM documents d
  WHERE EXISTS (SELECT 1 FROM embeddings e WHERE e.vec_id = d.doc_id)
), toks AS (
  SELECT doc_id, unnest(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS tok
  FROM universe
), tok_sizes AS (
  SELECT doc_id, count(*) AS n_tok FROM toks GROUP BY doc_id
), overlap AS (
  SELECT q.doc_id AS query_id, c.doc_id, count(*) AS n_inter
  FROM toks q JOIN toks c ON q.tok = c.tok AND c.doc_id <> q.doc_id
  WHERE q.doc_id < {N_QUERY_DOCS}
  GROUP BY 1, 2
), lex AS (
  SELECT query_id, overlap.doc_id AS neighbor_id,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY n_inter * 1.0 / (sq.n_tok + sc.n_tok - n_inter) DESC,
                    overlap.doc_id ASC
         ) AS lex_rank
  FROM overlap
  JOIN tok_sizes sq ON sq.doc_id = overlap.query_id
  JOIN tok_sizes sc ON sc.doc_id = overlap.doc_id
), lex_top AS (
  SELECT * FROM lex WHERE lex_rank <= {FUSE_TOPK}
), q AS (
  SELECT vec_id AS query_id, embedding AS q_vec FROM embeddings
  WHERE vec_id < {N_QUERY_DOCS}
), scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
    list_sum(list_transform(range(1, len(e.embedding) + 1),
      i -> q.q_vec[i]::DOUBLE * e.embedding[i]::DOUBLE))
    / (sqrt(list_sum(list_transform(range(1, len(q.q_vec) + 1),
        i -> q.q_vec[i]::DOUBLE * q.q_vec[i]::DOUBLE)))
     * sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
        i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE)))) AS cosine_raw
  FROM embeddings e, q
  WHERE e.vec_id <> q.query_id
), dense AS (
  SELECT query_id, neighbor_id,
    row_number() OVER (PARTITION BY query_id
                       ORDER BY cosine_raw DESC, neighbor_id ASC) AS dense_rank
  FROM scored
), dense_top AS (
  SELECT * FROM dense WHERE dense_rank <= {FUSE_TOPK}
), fused AS (
  SELECT COALESCE(l.query_id, d.query_id) AS query_id,
         COALESCE(l.neighbor_id, d.neighbor_id) AS neighbor_id,
         l.lex_rank, d.dense_rank,
         COALESCE(1.0 / ({RRF_K} + l.lex_rank), 0.0)
           + COALESCE(1.0 / ({RRF_K} + d.dense_rank), 0.0) AS rrf
  FROM lex_top l
  FULL OUTER JOIN dense_top d
    ON l.query_id = d.query_id AND l.neighbor_id = d.neighbor_id
)
SELECT query_id, neighbor_id, CAST(lex_rank AS INTEGER) AS lex_rank,
       CAST(dense_rank AS INTEGER) AS dense_rank, rrf,
       CAST(rank AS INTEGER) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY rrf DESC, neighbor_id ASC) AS rank
  FROM fused
)
WHERE rank <= {FUSE_TOPK}
"""


# --------------------------------------------------------------------------
# a77 — daily open-order backlog (interval stabbing via ±1 deltas)
# --------------------------------------------------------------------------

def q_a77_open_order_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(d, n_opened, n_closed, backlog): orders open from o_orderdate
    through their last lineitem shipdate; backlog is the running open
    count, emitted on every day the delta set changes."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    close = li.groupBy("l_orderkey").agg(
        F.max(F.to_date("l_shipdate")).alias("close_d")
    )
    spans = orders.select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.to_date("o_orderdate").alias("open_d"),
    ).join(close, "l_orderkey")
    deltas = (
        spans.select(F.col("open_d").alias("d"), F.lit(1).alias("opened"), F.lit(0).alias("closed"))
        .unionAll(
            spans.select(
                F.date_add("close_d", 1).alias("d"),
                F.lit(0).alias("opened"),
                F.lit(1).alias("closed"),
            )
        )
        .groupBy("d")
        .agg(
            F.sum("opened").alias("n_opened"),
            F.sum("closed").alias("n_closed"),
        )
    )
    # sanctioned cumulative: the delta table is day-grain (≤ calendar
    # span rows at ANY scale factor)
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return deltas.select(
        "d",
        "n_opened",
        "n_closed",
        F.sum(F.col("n_opened") - F.col("n_closed")).over(w).alias("backlog"),
    )


SQL_A77 = """
WITH close AS (
  SELECT l_orderkey, max(CAST(l_shipdate AS DATE)) AS close_d
  FROM lineitem GROUP BY l_orderkey
), spans AS (
  SELECT CAST(o_orderdate AS DATE) AS open_d, close_d
  FROM orders JOIN close ON o_orderkey = l_orderkey
), deltas AS (
  SELECT d, CAST(sum(opened) AS BIGINT) AS n_opened,
         CAST(sum(closed) AS BIGINT) AS n_closed
  FROM (
    SELECT open_d AS d, 1 AS opened, 0 AS closed FROM spans
    UNION ALL
    SELECT close_d + 1, 0, 1 FROM spans
  )
  GROUP BY d
)
SELECT d, n_opened, n_closed,
       CAST(sum(n_opened - n_closed)
            OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS BIGINT) AS backlog
FROM deltas
"""


EXT62_QUERIES = {
    "x98_containment_pairs": q_x98_containment_pairs,
    "x99_rrf_fusion": q_x99_rrf_fusion,
    "a77_open_order_backlog": q_a77_open_order_backlog,
}

EXT62_ORACLES = {
    "x98_containment_pairs": SQL_X98,
    "x99_rrf_fusion": SQL_X99,
    "a77_open_order_backlog": SQL_A77,
}
