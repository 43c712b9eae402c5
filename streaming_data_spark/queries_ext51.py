"""Fifty-first query wave — session quality, corpus novelty, lexical
stats, behavior patterns, curation impact:

- a47_entry_bounce: gap-based sessions (the `sessionization` 30-min
  convention) classified by their ENTRY event type — per entry type:
  sessions, single-event bounces, bounce rate. The landing-page
  quality readout of the session layer.
- x66_ngram_novelty: per-document novelty — the fraction of a doc's
  distinct 3-gram shingles first introduced BY that doc (shingle's
  minimum doc_id = this doc). The corpus-redundancy growth curve a
  curation pipeline watches while ingesting: novelty collapsing
  toward 0 means new data is re-crawl, not new content.
- x67_lexical_richness: per-document type-token ratio and within-doc
  hapax fraction (tokens occurring exactly once) — the classic
  lexical-diversity quality signals next to x6's surface heuristics.
- a49_event_trigrams: top-20 3-event behavior sequences across user
  timelines ((ts, event_id)-ordered double lag) — the pattern-mining
  readout over the same ordering contract as a32's transitions.
- x69_dedup_impact: per-source exact-duplicate impact report — doc
  count, dups (same sha-256 content as a smaller doc_id), dup
  fraction, mean chars of kept vs duplicate docs. The per-source
  scorecard that decides which feeds are worth re-crawling.

Scale shapes: a47 = one keyed window pass + session groupBy +
|types|-bounded output; x66 = shingle explode + shingle-keyed min +
keyed join back (the x63 shape with min instead of df-threshold);
x67 = token explode + two keyed groupBys; a49 = one keyed window
pass + a |types|^3-bounded groupBy + TakeOrderedAndProject (never a
global sort); x69 = one digest groupBy + keyed join back + a
|sources|-bounded report.

[EXT]-classic per SURVEY.md §2.11 scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streaming_data_spark.operators import dedup
from streaming_data_spark.queries import _t

SESSION_GAP_US = 30 * 60 * 1_000_000
TRIGRAM_TOP_K = 20


def q_a47_entry_bounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(entry_type, n_sessions, n_bounces, bounce_rate): gap-based
    sessions grouped by their first event's type."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    sess = (
        ev.withColumn(
            "new_session",
            F.when(gap.isNull() | (gap > SESSION_GAP_US), 1).otherwise(0),
        )
        .withColumn(
            "session_seq",
            F.sum("new_session").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    ws = Window.partitionBy("user_id", "session_seq").orderBy(
        "ts", "event_id"
    )
    per_session = (
        sess.withColumn("rn", F.row_number().over(ws))
        .groupBy("user_id", "session_seq")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("event_type"))).alias(
                "entry_type"
            ),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    return per_session.groupBy("entry_type").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0)).alias(
            "n_bounces"
        ),
        F.round(
            F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
            / F.count(F.lit(1)),
            6,
        ).alias("bounce_rate"),
    )


SQL_A47 = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                OR date_diff('microsecond', lag(ts) OVER w, ts)
                   > {SESSION_GAP_US} THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
), sess AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id
                                   ORDER BY ts ASC, event_id ASC
                                   ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flagged
), per_session AS (
  SELECT user_id, session_seq,
         max(CASE WHEN rn = 1 THEN event_type END) AS entry_type,
         count(*) AS n_events
  FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id, session_seq
                                 ORDER BY ts ASC, event_id ASC) AS rn
    FROM sess
  )
  GROUP BY user_id, session_seq
)
SELECT entry_type,
       count(*) AS n_sessions,
       CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bounces,
       round(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1.0
             / count(*), 6) AS bounce_rate
FROM per_session
GROUP BY entry_type
"""


def q_x66_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_shingles, n_novel, novelty): share of each doc's
    distinct 3-gram shingles whose minimum corpus doc_id is this doc."""
    docs = _t(spark, sf_dir, "documents")
    # ONE corpus explode, materialized (r16 opt; the x63 fix, A/B'd
    # there at −38%). r17 (r16 advice item 3 + guide §2.4): the
    # checkpoint materializes (doc_id, _sid=xxhash64(shingle), _chk)
    # — ~20 B/row instead of the raw shingle string — and first-seen
    # becomes min(doc_id) OVER the _sid partition instead of a
    # vocab-grain groupBy joined back onto the corpus: the old shape
    # paid groupBy(shingle) + both SMJ sides of the join (3
    # corpus/vocab-scale string-keyed exchanges at 100 TB, where the
    # first table is NOT broadcastable); the window pays exactly ONE
    # int-keyed exchange. Collision-GUARDED like
    # dedup.ranked_encoded_shingles (a merged _sid would fake novelty):
    # min(_chk) != max(_chk) inside an _sid partition aborts via
    # raise_error; the window sees every shingle, so the guard is
    # corpus-complete.
    enc = (
        dedup.shingles(docs, "doc_id", "text", n=3)
        .select(
            "doc_id",
            F.xxhash64("shingle").alias("_sid"),
            F.hash("shingle").alias("_chk"),
        )
        .localCheckpoint(eager=True)
    )
    w_sid = Window.partitionBy("_sid")
    first_doc = F.when(
        F.min("_chk").over(w_sid) == F.max("_chk").over(w_sid),
        F.min("doc_id").over(w_sid),
    ).otherwise(F.raise_error(F.lit(
        "xxhash64 shingle-id collision detected in x66; rerun with a "
        "string-keyed build"
    )))
    return (
        enc.withColumn("first_doc", first_doc)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            ).alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_novel",
            F.round(F.col("n_novel") / F.col("n_shingles"), 6).alias(
                "novelty"
            ),
        )
    )


SQL_X66 = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
), sh AS (
  SELECT doc_id, unnest(list_distinct(
    list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
  )) AS s
  FROM toks
), first AS (
  SELECT s, min(doc_id) AS first_doc FROM sh GROUP BY s
)
SELECT sh.doc_id,
       count(*) AS n_shingles,
       CAST(sum(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_novel,
       round(sum(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END) * 1.0
             / count(*), 6) AS novelty
FROM sh JOIN first f USING (s)
GROUP BY sh.doc_id
"""


def q_x67_lexical_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens, n_distinct, ttr, hapax_frac): type-token
    ratio and within-doc single-occurrence token share."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"),
    )
    per_tok = tok.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        per_tok.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("n_hapax"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_distinct",
            F.round(F.col("n_distinct") / F.col("n_tokens"), 6).alias("ttr"),
            F.round(F.col("n_hapax") / F.col("n_tokens"), 6).alias(
                "hapax_frac"
            ),
        )
    )


SQL_X67 = r"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
  FROM documents
), per_tok AS (
  SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY doc_id, tok
)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_tokens,
       count(*) AS n_distinct,
       round(count(*) * 1.0 / sum(c), 6) AS ttr,
       round(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1.0 / sum(c), 6)
         AS hapax_frac
FROM per_tok
GROUP BY doc_id
"""


def q_a49_event_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(t1, t2, t3, cnt): the 20 most frequent 3-event sequences over
    (ts, event_id)-ordered user timelines; (cnt desc, lexicographic)
    tiebreak."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = (
        ev.withColumn("t1", F.lag("event_type", 2).over(w))
        .withColumn("t2", F.lag("event_type", 1).over(w))
        .filter(F.col("t1").isNotNull())
        .select("t1", "t2", F.col("event_type").alias("t3"))
    )
    return (
        tri.groupBy("t1", "t2", "t3")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("t1"), F.asc("t2"), F.asc("t3"))
        .limit(TRIGRAM_TOP_K)
    )


SQL_A49 = f"""
WITH tri AS (
  SELECT lag(event_type, 2) OVER w AS t1,
         lag(event_type, 1) OVER w AS t2,
         event_type AS t3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
)
SELECT t1, t2, t3, count(*) AS cnt
FROM tri WHERE t1 IS NOT NULL
GROUP BY t1, t2, t3
ORDER BY cnt DESC, t1 ASC, t2 ASC, t3 ASC
LIMIT {TRIGRAM_TOP_K}
"""


def q_x69_dedup_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, n_dups, dup_frac, avg_chars_kept,
    avg_chars_dup): per-source exact-duplicate scorecard; a dup is a
    doc sharing its content digest with a smaller doc_id."""
    docs = _t(spark, sf_dir, "documents")
    tagged = docs.select(
        "doc_id", "source", "n_chars",
        dedup.content_digest(text="text").alias("digest"),
    )
    keeper = tagged.groupBy("digest").agg(F.min("doc_id").alias("keep_id"))
    flagged = tagged.join(keeper, "digest").withColumn(
        "is_dup", F.col("doc_id") != F.col("keep_id")
    )
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("is_dup"), 1).otherwise(0)).alias("n_dups"),
        F.round(
            F.sum(F.when(F.col("is_dup"), 1).otherwise(0))
            / F.count(F.lit(1)),
            6,
        ).alias("dup_frac"),
        F.round(
            F.avg(F.when(~F.col("is_dup"), F.col("n_chars"))), 6
        ).alias("avg_chars_kept"),
        F.round(
            F.avg(F.when(F.col("is_dup"), F.col("n_chars"))), 6
        ).alias("avg_chars_dup"),
    )


SQL_X69 = """
WITH tagged AS (
  SELECT doc_id, source, n_chars, sha256(text) AS digest FROM documents
), keeper AS (
  SELECT digest, min(doc_id) AS keep_id FROM tagged GROUP BY digest
), flagged AS (
  SELECT t.source, t.n_chars, (t.doc_id <> k.keep_id) AS is_dup
  FROM tagged t JOIN keeper k USING (digest)
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dups,
       round(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
         AS dup_frac,
       round(avg(CASE WHEN NOT is_dup THEN n_chars END), 6) AS avg_chars_kept,
       round(avg(CASE WHEN is_dup THEN n_chars END), 6) AS avg_chars_dup
FROM flagged
GROUP BY source
"""


EXT51_QUERIES = {
    "a47_entry_bounce": q_a47_entry_bounce,
    "x66_ngram_novelty": q_x66_ngram_novelty,
    "x67_lexical_richness": q_x67_lexical_richness,
    "a49_event_trigrams": q_a49_event_trigrams,
    "x69_dedup_impact": q_x69_dedup_impact,
}

EXT51_ORACLES = {
    "a47_entry_bounce": SQL_A47,
    "x66_ngram_novelty": SQL_X66,
    "x67_lexical_richness": SQL_X67,
    "a49_event_trigrams": SQL_A49,
    "x69_dedup_impact": SQL_X69,
}
