"""Fifty-third query wave — sparse-vector similarity, source forensics,
SLA and peak-load analytics:

- x75_tfidf_topk_pairs: top-5 most similar documents per document by
  TF-IDF cosine over shared terms — the SPARSE similarity engine next
  to the dense-embedding family (x5/x7/x8): term-keyed equi-joins,
  never a vector cross product. Terms above a document-frequency cap
  are dropped before pairing (the X42 bounded-state practice: a
  stopword term pairs every doc with every doc — df-capping bounds
  per-term fan-out at DF_CAP^2 and is applied identically in the
  oracle, so the gate stays exact). tf*idf weights and norms are
  computed over the KEPT vocabulary, keeping the metric
  self-consistent.
- x79_source_overlap: content-overlap matrix between sources —
  per source pair, shared distinct 3-gram shingles and the Jaccard
  of their shingle sets (inclusion-exclusion denominator). The
  mirror-feed detector: two crawls of the same site light up here
  before per-doc dedup even runs. Per-shingle pair fan-out is
  bounded by |sources|^2, not corpus size.
- a54_priority_sla: per order priority, the fraction of lineitems
  shipped within 30 days of the order date — the SLA compliance
  readout over the a52 lead-time layer.
- a58_daily_peak_hour: per day, the peak traffic hour and its share
  of the day's events ((cnt desc, hour asc) tiebreak) — the
  capacity-planning profile.

Scale shapes: x75 = token-cell groupBys + a df-capped term self-join
+ per-doc top-k window (doc-keyed); x79 = three shingle/source
groupBys + a |sources|-bounded count join (20-row broadcast); a54 =
one keyed fact-fact join folded into a |priorities|-bounded agg;
a58 = (day, hour) groupBy + day-keyed ranking window.

[EXT]-classic per SURVEY.md §2.11 scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streaming_data_spark.queries import _t

TFIDF_DF_CAP = 50
TFIDF_TOP_K = 5
SLA_DAYS = 30


def q_x75_tfidf_topk_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, neighbor_id, rank, cosine): per-doc top-5 TF-IDF
    cosine neighbors over df-capped shared terms."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term"),
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    df_t = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= TFIDF_DF_CAP)
    )
    # the weight table feeds BOTH pair-join sides — materialize it
    # once or the tf/df chains replay per consumer (20 exchanges -> 6;
    # the x56/x59 reuse rule). r16 optimization round: the per-doc
    # NORM is attached here, BEFORE the checkpoint (one doc-keyed
    # window exchange at construction), and carried through the pair
    # join as a group constant folded with max() — the shared_pair_
    # build n_a/n_b trick. The previous shape recomputed the norms
    # aggregate in TWO post-checkpoint branches and joined them back
    # onto the pair table by da then db: at scale that re-shuffles the
    # (da, db)-keyed PAIR table twice by doc keys; locally it ran two
    # redundant norm subtrees (plan: 4 -> 3 real exchanges, the two
    # norm-branch exchanges and both post-dots joins gone, one
    # doc-keyed window exchange added before the checkpoint).
    w = (
        tf.join(df_t, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            (
                F.col("tf")
                * F.log(F.col("n_docs") / F.col("df"))
            ).alias("w"),
        )
        .withColumn(
            "norm",
            F.sqrt(
                F.sum(F.col("w") * F.col("w")).over(Window.partitionBy("doc_id"))
            ),
        )
        .localCheckpoint(eager=True)
    )
    a = w.select(
        "term", F.col("doc_id").alias("da"), F.col("w").alias("wa"),
        F.col("norm").alias("na"),
    )
    b = w.select(
        "term", F.col("doc_id").alias("db"), F.col("w").alias("wb"),
        F.col("norm").alias("nb"),
    )
    dots = (
        a.join(b, "term")
        .filter(F.col("da") != F.col("db"))
        .groupBy("da", "db")
        .agg(
            F.sum(F.col("wa") * F.col("wb")).alias("dot"),
            F.max("na").alias("na"),
            F.max("nb").alias("nb"),
        )
    )
    cos = dots.select(
        F.col("da").alias("doc_id"),
        F.col("db").alias("neighbor_id"),
        (F.col("dot") / (F.col("na") * F.col("nb"))).alias("cos_raw"),
    )
    rk = Window.partitionBy("doc_id").orderBy(
        F.desc("cos_raw"), F.asc("neighbor_id")
    )
    return (
        cos.withColumn("rank", F.row_number().over(rk))
        .filter(F.col("rank") <= TFIDF_TOP_K)
        .select(
            "doc_id", "neighbor_id", "rank",
            F.round("cos_raw", 6).alias("cosine"),
        )
    )


SQL_X75 = rf"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term
), n AS (SELECT count(*) AS n_docs FROM documents),
df_t AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
  HAVING count(*) <= {TFIDF_DF_CAP}
), w AS (
  SELECT tf.doc_id, tf.term, tf.tf * ln(n.n_docs * 1.0 / d.df) AS w
  FROM tf JOIN df_t d USING (term) CROSS JOIN n
), norms AS (
  SELECT doc_id, sqrt(sum(w * w)) AS norm FROM w GROUP BY doc_id
), dots AS (
  SELECT a.doc_id AS da, b.doc_id AS db, sum(a.w * b.w) AS dot
  FROM w a JOIN w b ON a.term = b.term AND a.doc_id <> b.doc_id
  GROUP BY 1, 2
), cos AS (
  SELECT d.da AS doc_id, d.db AS neighbor_id,
         d.dot / (na.norm * nb.norm) AS cos_raw
  FROM dots d
  JOIN norms na ON d.da = na.doc_id
  JOIN norms nb ON d.db = nb.doc_id
)
SELECT doc_id, neighbor_id, rank, round(cos_raw, 6) AS cosine
FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY cos_raw DESC, neighbor_id ASC) AS rank
  FROM cos
)
WHERE rank <= {TFIDF_TOP_K}
"""


def q_x79_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source_a, source_b, n_shared, n_a, n_b, jaccard): distinct
    3-gram shingle overlap between every co-occurring source pair."""
    from streaming_data_spark.operators import dedup

    docs = _t(spark, sf_dir, "documents")
    # three consumers (counts + both pair-join sides) — materialize
    ss = (
        dedup.shingles(docs, "doc_id", "text", n=3)
        .join(docs.select("doc_id", "source"), "doc_id")
        .select("source", "shingle")
        .distinct()
        .localCheckpoint(eager=True)
    )
    counts = ss.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = ss.select("shingle", F.col("source").alias("source_a"))
    b = ss.select("shingle", F.col("source").alias("source_b"))
    shared = (
        a.join(b, "shingle")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        shared.join(
            F.broadcast(
                counts.select(
                    F.col("source").alias("source_a"), F.col("n").alias("n_a")
                )
            ),
            "source_a",
        )
        .join(
            F.broadcast(
                counts.select(
                    F.col("source").alias("source_b"), F.col("n").alias("n_b")
                )
            ),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "n_shared",
            "n_a",
            "n_b",
            F.round(
                F.col("n_shared")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
                6,
            ).alias("jaccard"),
        )
    )


SQL_X79 = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
), sh AS (
  SELECT doc_id, unnest(list_distinct(
    list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
  )) AS s
  FROM toks
), ss AS (
  SELECT DISTINCT d.source, sh.s
  FROM sh JOIN documents d USING (doc_id)
), counts AS (
  SELECT source, count(*) AS n FROM ss GROUP BY source
), shared AS (
  SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_shared
  FROM ss a JOIN ss b ON a.s = b.s AND a.source < b.source
  GROUP BY 1, 2
)
SELECT sh.source_a, sh.source_b, sh.n_shared, ca.n AS n_a, cb.n AS n_b,
       round(sh.n_shared * 1.0 / (ca.n + cb.n - sh.n_shared), 6) AS jaccard
FROM shared sh
JOIN counts ca ON sh.source_a = ca.source
JOIN counts cb ON sh.source_b = cb.source
"""


def q_a54_priority_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(o_orderpriority, n_lines, n_within, sla_rate): share of lines
    shipped within 30 days of the order date, per priority."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    lead = li.join(
        orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
        li.l_orderkey == F.col("o_orderkey"),
    ).select(
        "o_orderpriority",
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).alias("lead"),
    )
    return lead.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.when(F.col("lead") <= SLA_DAYS, 1).otherwise(0)).alias(
            "n_within"
        ),
        F.round(
            F.sum(F.when(F.col("lead") <= SLA_DAYS, 1).otherwise(0))
            / F.count(F.lit(1)),
            6,
        ).alias("sla_rate"),
    )


SQL_A54 = f"""
WITH lead AS (
  SELECT o.o_orderpriority,
         date_diff('day', o.o_orderdate, l.l_shipdate) AS lead
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT o_orderpriority,
       count(*) AS n_lines,
       CAST(sum(CASE WHEN lead <= {SLA_DAYS} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_within,
       round(sum(CASE WHEN lead <= {SLA_DAYS} THEN 1 ELSE 0 END) * 1.0
             / count(*), 6) AS sla_rate
FROM lead
GROUP BY o_orderpriority
"""


def q_a58_daily_peak_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day, n_day, peak_hour, n_peak, peak_share): the busiest hour
    per day with its traffic share; (cnt desc, hour asc) tiebreak."""
    ev = _t(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.hour("ts").alias("hour"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("day").orderBy(F.desc("cnt"), F.asc("hour"))
    totals = cells.groupBy("day").agg(F.sum("cnt").alias("n_day"))
    return (
        cells.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .join(totals, "day")
        .select(
            "day",
            "n_day",
            F.col("hour").alias("peak_hour"),
            F.col("cnt").alias("n_peak"),
            F.round(F.col("cnt") / F.col("n_day"), 6).alias("peak_share"),
        )
    )


SQL_A58 = """
WITH cells AS (
  SELECT date_trunc('day', ts) AS day, extract(hour FROM ts) AS hour,
         count(*) AS cnt
  FROM events GROUP BY 1, 2
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY day
                               ORDER BY cnt DESC, hour ASC) AS rk
  FROM cells
), totals AS (
  SELECT day, CAST(sum(cnt) AS BIGINT) AS n_day FROM cells GROUP BY day
)
SELECT r.day, t.n_day, CAST(r.hour AS INT) AS peak_hour,
       r.cnt AS n_peak,
       round(r.cnt * 1.0 / t.n_day, 6) AS peak_share
FROM ranked r JOIN totals t USING (day)
WHERE r.rk = 1
"""


EXT53_QUERIES = {
    "x75_tfidf_topk_pairs": q_x75_tfidf_topk_pairs,
    "x79_source_overlap": q_x79_source_overlap,
    "a54_priority_sla": q_a54_priority_sla,
    "a58_daily_peak_hour": q_a58_daily_peak_hour,
}

EXT53_ORACLES = {
    "x75_tfidf_topk_pairs": SQL_X75,
    "x79_source_overlap": SQL_X79,
    "a54_priority_sla": SQL_A54,
    "a58_daily_peak_hour": SQL_A58,
}
