"""Fiftieth query wave — pipeline QA + conversion analytics:

- a42_time_to_convert: per-user conversion latency — first 'view'
  event to the first 'purchase' at-or-after it, in seconds. The
  canonical activation-funnel latency metric next to
  funnel_conversion (which counts stages; this measures the clock).
- a44_order_total_audit: referential/arithmetic audit of the orders
  fact against its lineitems — recompute each order's total as
  sum(extprice * (1-disc) * (1+tax)), emit (stored, computed, diff,
  status) with status ∈ {ok, mismatch, no_lines}. The data-quality
  gate a warehouse load runs before publishing a snapshot (the
  reference's validation step in its load scripts re-expressed as a
  set-based audit instead of a row loop).
- x63_boilerplate_ngrams: per-document boilerplate score — the
  fraction of a doc's distinct 3-gram shingles that occur in more
  than BOILER_FRAC of all documents (corpus-frequent shingles =
  navigation chrome / license headers / template text). The
  C4/RefinedWeb-style boilerplate signal on the same shingle layer
  the dedup tiers use.
- a46_interevent_gaps: per event type, the distribution of per-user
  inter-event gaps (count / mean / p50 / p95 seconds) — the
  traffic-cadence profile that sizes watermarks and session gap
  thresholds from data instead of folklore.
- x64_embedding_outliers: embedding-space QA — vectors whose squared
  distance to their OWN label centroid is > 2 label-level standard
  deviations (mislabeled / corrupted embeddings surface here before
  they poison nearest-centroid classifiers or SemDeDup clusters).

Scale shapes: a42 = two pushed-filter fact passes + one keyed join
(conversion users <= users, AQE decides the build side); a44 = one
fact groupBy + keyed join on the order key; x63 = shingle explode
(linear), shingle-keyed df groupBy, and a semi-style boiler-marker
join on the shingle key — the hot-shingle set is bounded by the df
threshold itself (<= 1/frac distinct shingles can exceed it... per
the pigeonhole, <= n_docs/(frac*n_docs) = 1/frac of the df mass);
a46 = partition-keyed lag window + |types|-bounded stats groupBy;
x64 = the x59 centroid assignment restricted to the own label + a
|labels|-row stats broadcast back.

[EXT]-classic per SURVEY.md §2.11 scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streaming_data_spark.operators import dedup
from streaming_data_spark.queries import _t

AUDIT_TOLERANCE = 1.0  # dollars; float-noise-proof on 2-decimal prices
BOILER_FRAC = 0.10  # shingle document-frequency share marking boilerplate
OUTLIER_Z = 2.0


def q_a42_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, first_view, first_purchase, secs): conversion latency
    for users whose first 'view' is followed by a 'purchase'."""
    ev = _t(spark, sf_dir, "events")
    fv = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .join(fv, "user_id")
        .filter(F.col("ts") >= F.col("first_view"))
        .groupBy("user_id", "first_view")
        .agg(F.min("ts").alias("first_purchase"))
    )
    # integer microsecond difference / 1e6 is ONE IEEE division on
    # exact integers — bit-identical across engines, no rounding
    return conv.select(
        "user_id",
        "first_view",
        "first_purchase",
        (
            (F.unix_micros("first_purchase") - F.unix_micros("first_view"))
            / F.lit(1_000_000.0)
        ).alias("secs"),
    )


SQL_A42 = """
WITH fv AS (
  SELECT user_id, min(ts) AS first_view
  FROM events WHERE event_type = 'view' GROUP BY user_id
), conv AS (
  SELECT e.user_id, f.first_view, min(e.ts) AS first_purchase
  FROM events e JOIN fv f USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts >= f.first_view
  GROUP BY e.user_id, f.first_view
)
SELECT user_id, first_view, first_purchase,
       date_diff('microsecond', first_view, first_purchase) / 1000000.0 AS secs
FROM conv
"""


def q_a44_order_total_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(o_orderkey, o_totalprice, computed, diff, status): every order
    with its lineitem-recomputed total; status classifies exact-ish
    match / arithmetic mismatch / orphan order with no lines."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    # Each term is a product of 2-decimal grid values — decimal-exact
    # at SIX decimals — so the order-dependent sum rounded at 6 lands
    # ON the decimal grid in both engines (round-at-2 sits a cent off
    # at .005 accumulation boundaries; the r3 lesson). Classification
    # uses the ROUNDED diff so both engines compare identical doubles.
    comp = li.groupBy("l_orderkey").agg(
        F.round(
            F.sum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
            ),
            6,
        ).alias("computed")
    )
    joined = orders.join(
        comp, orders.o_orderkey == comp.l_orderkey, "left"
    ).withColumn(
        "diff", F.round(F.col("computed") - F.col("o_totalprice"), 6)
    )
    return joined.select(
        "o_orderkey",
        "o_totalprice",
        "computed",
        "diff",
        F.when(F.col("computed").isNull(), F.lit("no_lines"))
        .when(F.abs(F.col("diff")) <= AUDIT_TOLERANCE, F.lit("ok"))
        .otherwise(F.lit("mismatch"))
        .alias("status"),
    )


SQL_A44 = f"""
WITH comp AS (
  SELECT l_orderkey,
         round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 6) AS computed
  FROM lineitem GROUP BY l_orderkey
), j AS (
  SELECT o.o_orderkey, o.o_totalprice, c.computed,
         round(c.computed - o.o_totalprice, 6) AS diff
  FROM orders o LEFT JOIN comp c ON o.o_orderkey = c.l_orderkey
)
SELECT o_orderkey, o_totalprice, computed, diff,
       CASE WHEN computed IS NULL THEN 'no_lines'
            WHEN abs(diff) <= {AUDIT_TOLERANCE} THEN 'ok'
            ELSE 'mismatch' END AS status
FROM j
"""


def q_x63_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_shingles, n_boiler, boiler_score): share of each
    doc's distinct 3-gram shingles that are corpus-boilerplate
    (document frequency > BOILER_FRAC of all docs)."""
    docs = _t(spark, sf_dir, "documents")
    # Materialize the exploded shingle table ONCE (r16 opt, guide
    # §1.2/§2.4): both the df-count branch and the scoring join
    # consume it, and the previous shape re-ran the tokenize/shingle/
    # explode pipeline over the whole corpus for each. (A/B'd against
    # a row-local rewrite — per-doc array_intersect with a broadcast
    # boiler array — which was SLOWER: the per-row rebuild of the
    # boiler hash set costs more than the explode it saves.)
    # r17 (r16 advice item 3): the checkpoint materializes
    # (doc_id, _sid=xxhash64(shingle), _chk) — ~20 B/row instead of
    # the raw ~50-byte shingle string, so executor-local storage no
    # longer holds a multiple of the corpus text and both branches
    # shuffle 8-byte ids. Collision-GUARDED like
    # dedup.ranked_encoded_shingles (x63 has no exact-verification
    # stage to absorb a merged df): min(_chk) != max(_chk) inside an
    # _sid group proves two distinct shingles collided on xxhash64
    # and raise_error aborts instead of emitting a wrong boiler set;
    # the df branch sees every shingle, so its guard covers the
    # scoring join's key too.
    enc = (
        dedup.shingles(docs, "doc_id", "text", n=3)
        .select(
            "doc_id",
            F.xxhash64("shingle").alias("_sid"),
            F.hash("shingle").alias("_chk"),
        )
        .localCheckpoint(eager=True)
    )
    # 1-row corpus size rides a broadcast — no driver round-trip
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    df_counts = (
        enc.groupBy("_sid")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.min("_chk").alias("_lo"),
            F.max("_chk").alias("_hi"),
        )
        .select(
            "_sid",
            F.when(F.col("_lo") == F.col("_hi"), F.col("_n"))
            .otherwise(F.raise_error(F.lit(
                "xxhash64 shingle-id collision detected in x63; rerun "
                "with a string-keyed build"
            )))
            .alias("df"),
        )
    )
    boiler = (
        df_counts.crossJoin(F.broadcast(n_docs))
        .filter(F.col("df") > BOILER_FRAC * F.col("n_docs"))
        .select("_sid", F.lit(True).alias("_b"))
    )
    # broadcast is SAFE at any corpus size (r16): boilerplate shingles
    # are those with df > BOILER_FRAC·n_docs, so by pigeonhole there
    # are at most avg_shingles_per_doc / BOILER_FRAC of them —
    # bounded by document length, independent of corpus rows. The
    # explicit hint pins the plan (no estimate-driven SMJ fallback of
    # the corpus-sized left side at scale).
    return (
        enc.join(F.broadcast(boiler), "_sid", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(
                F.when(F.col("_b"), 1).otherwise(0)
            ).alias("n_boiler"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_boiler",
            F.round(F.col("n_boiler") / F.col("n_shingles"), 6).alias(
                "boiler_score"
            ),
        )
    )


SQL_X63 = rf"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
), sh AS (
  SELECT doc_id, unnest(list_distinct(
    list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
  )) AS s
  FROM toks
), n AS (SELECT count(*) AS n_docs FROM documents),
boiler AS (
  SELECT s FROM sh CROSS JOIN n
  GROUP BY s, n.n_docs HAVING count(*) > {BOILER_FRAC} * n.n_docs
)
SELECT doc_id,
       count(*) AS n_shingles,
       CAST(sum(CASE WHEN b.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
       round(sum(CASE WHEN b.s IS NOT NULL THEN 1 ELSE 0 END) * 1.0
             / count(*), 6) AS boiler_score
FROM sh LEFT JOIN boiler b USING (s)
GROUP BY doc_id
"""


def q_a46_interevent_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n_gaps, mean_gap, p50_gap, p95_gap): per-type
    distribution of per-user consecutive-event gaps in seconds."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.asc("ts"), F.asc("event_id")
    )
    gaps = (
        ev.withColumn("prev_ts", F.lag("ts").over(w))
        .filter(F.col("prev_ts").isNotNull())
        .select(
            "event_type",
            (
                (F.unix_micros("ts") - F.unix_micros("prev_ts"))
                / F.lit(1_000_000.0)
            ).alias("gap"),
        )
    )
    return gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.round(F.avg("gap"), 6).alias("mean_gap"),
        F.round(F.expr("percentile(gap, 0.5)"), 6).alias("p50_gap"),
        F.round(F.expr("percentile(gap, 0.95)"), 6).alias("p95_gap"),
    )


SQL_A46 = """
WITH gaps AS (
  SELECT event_type,
         date_diff('microsecond',
                   lag(ts) OVER (PARTITION BY user_id, event_type
                                 ORDER BY ts ASC, event_id ASC),
                   ts) / 1000000.0 AS gap
  FROM events
)
SELECT event_type,
       count(*) AS n_gaps,
       round(avg(gap), 6) AS mean_gap,
       round(quantile_cont(gap, 0.5), 6) AS p50_gap,
       round(quantile_cont(gap, 0.95), 6) AS p95_gap
FROM gaps WHERE gap IS NOT NULL
GROUP BY event_type
"""


def q_x64_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, label, d2, z): vectors > OUTLIER_Z label-level stddevs
    from their own label centroid (squared euclidean)."""
    emb = _t(spark, sf_dir, "embeddings")
    pos = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "x")
    )
    cent = pos.groupBy("label", "pos").agg(F.avg("x").alias("c"))
    d2 = (
        pos.join(cent, ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(F.sum((F.col("x") - F.col("c")) ** 2).alias("d2"))
    )
    # |labels| rows — a genuinely bounded dimension, hint is safe
    stats = d2.groupBy("label").agg(
        F.avg("d2").alias("mu"), F.stddev_samp("d2").alias("sd")
    )
    return (
        d2.join(F.broadcast(stats), "label")
        .withColumn("z", (F.col("d2") - F.col("mu")) / F.col("sd"))
        .filter(F.col("z") > OUTLIER_Z)
        .select(
            "vec_id",
            "label",
            F.round("d2", 6).alias("d2"),
            F.round("z", 6).alias("z"),
        )
    )


SQL_X64 = f"""
WITH pos AS (
  SELECT vec_id, label, i AS pos, embedding[i]::DOUBLE AS x
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS g(i)
), cent AS (
  SELECT label, pos, avg(x) AS c FROM pos GROUP BY label, pos
), d AS (
  SELECT p.vec_id, p.label, sum((p.x - c.c) * (p.x - c.c)) AS d2
  FROM pos p JOIN cent c ON p.label = c.label AND p.pos = c.pos
  GROUP BY p.vec_id, p.label
), st AS (
  SELECT label, avg(d2) AS mu, stddev_samp(d2) AS sd FROM d GROUP BY label
)
SELECT d.vec_id, d.label, round(d.d2, 6) AS d2,
       round((d.d2 - st.mu) / st.sd, 6) AS z
FROM d JOIN st USING (label)
WHERE (d.d2 - st.mu) / st.sd > {OUTLIER_Z}
"""


EXT50_QUERIES = {
    "a42_time_to_convert": q_a42_time_to_convert,
    "a44_order_total_audit": q_a44_order_total_audit,
    "x63_boilerplate_ngrams": q_x63_boilerplate_ngrams,
    "a46_interevent_gaps": q_a46_interevent_gaps,
    "x64_embedding_outliers": q_x64_embedding_outliers,
}

EXT50_ORACLES = {
    "a42_time_to_convert": SQL_A42,
    "a44_order_total_audit": SQL_A44,
    "x63_boilerplate_ngrams": SQL_X63,
    "a46_interevent_gaps": SQL_A46,
    "x64_embedding_outliers": SQL_X64,
}
