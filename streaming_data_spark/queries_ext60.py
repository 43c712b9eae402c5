"""Sixtieth query wave — sequence prediction, clamped ledgers,
readability, rank correlation, categorical association:

- a75_markov_accuracy: a first-order Markov next-event predictor
  trained on the first 80% of the event timeline and scored on the
  rest — the honest temporal split (train strictly precedes test) of
  the baseline every sequence model must beat. Emits one row of
  counts + coverage + accuracy.
- a76_capped_balance: a per-supplier monthly inventory ledger —
  returns restock (+qty), shipments draw down (-qty), and the running
  balance clamps at [0, cap]. Clamping destroys prefix-sum structure,
  so this is the `clamped_balance` sequential fold (mapInPandas,
  state across Arrow batches) with a recursive-CTE oracle repeating
  the identical IEEE op order; integer-grid quantities make every
  step exact.
- x93_readability: per-source LIX readability (words-per-sentence +
  100·long-word share) plus average word length — the doc-quality
  signal filters like Gopher/C4 gate on, computed entirely with
  JVM-side array higher-order functions (no explode, no UDF).
- x94_spearman_supplier: Spearman rank correlation between supplier
  revenue rank and supplier volume rank, via the exact integer
  Σd² formula (ranks are row_numbers with a deterministic key
  tie-break, d² sums in BIGINT — bit-exact in any engine at any
  scale, no floating accumulation at all).
- x95_cramers_v: Cramér's V between document source and language —
  the chi²-based association strength for two categorical columns
  (the "is my corpus mix confounded?" check), over the
  |sources|×|langs|-bounded contingency table.

Scale shapes: a75 = one keyed lead window + a (is_train, cur, nxt)
groupBy whose model side is event-vocabulary-bounded (broadcast is
safe by construction) + one 1-row agg; a76 = fact-scale map-side
monthly agg, then the fold runs over keys×months rows; x93 = one
map-side pass with per-row array ops folded into a |sources|-bounded
agg; x94 = supplier-grain aggs + two sanctioned global row_numbers
over the supplier-grain table + 1-row agg; x95 = one cells groupBy,
then everything downstream is dimension-bounded.

[EXT]-classic per SURVEY.md §2.11 scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streaming_data_spark.operators import indicators as ind
from streaming_data_spark.queries import _t

TRAIN_FRAC = 0.8
BAL_START, BAL_CAP = 250.0, 500.0
LONG_WORD_CHARS = 6


def q_a75_markov_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_train, n_test, n_covered, n_correct, coverage, accuracy):
    argmax next-event predictor, temporal 80/20 split."""
    ev = _t(spark, sf_dir, "events")
    cut = ev.agg(
        F.min(F.to_date("ts")).alias("dmin"),
        F.max(F.to_date("ts")).alias("dmax"),
    ).select(
        F.date_add(
            F.col("dmin"),
            F.floor(F.lit(TRAIN_FRAC) * F.datediff("dmax", "dmin")).cast(
                "int"
            ),
        ).alias("cutoff")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    labeled = (
        ev.select(
            F.to_date("ts").alias("d"),
            F.col("event_type").alias("cur"),
            F.lead("event_type").over(w).alias("nxt"),
        )
        .filter(F.col("nxt").isNotNull())
        .crossJoin(F.broadcast(cut))
        .withColumn("is_train", F.col("d") <= F.col("cutoff"))
    )
    # ONE fact-scale pass: both the model and the scoring only need
    # (is_train, cur, nxt) counts, and that table is event-vocabulary-
    # bounded — everything downstream is broadcast-safe by construction
    counts = labeled.groupBy("is_train", "cur", "nxt").agg(
        F.count(F.lit(1)).alias("c")
    )
    train = counts.filter("is_train")
    rk = Window.partitionBy("cur").orderBy(F.desc("c"), F.asc("nxt"))
    model = (
        train.withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") == 1)
        .select("cur", F.col("nxt").alias("pred"))
    )
    train_n = train.agg(F.sum("c").cast("long").alias("n_train"))
    scored = counts.filter(~F.col("is_train")).join(
        F.broadcast(model), "cur", "left"
    )
    return (
        scored.agg(
            F.sum("c").cast("long").alias("n_test"),
            F.sum(F.when(F.col("pred").isNotNull(), F.col("c")).otherwise(0))
            .cast("long")
            .alias("n_covered"),
            F.sum(
                F.when(F.col("pred") == F.col("nxt"), F.col("c")).otherwise(0)
            )
            .cast("long")
            .alias("n_correct"),
        )
        .crossJoin(F.broadcast(train_n))
        .select(
            "n_train",
            "n_test",
            "n_covered",
            "n_correct",
            F.round(F.col("n_covered") / F.col("n_test"), 6).alias(
                "coverage"
            ),
            F.round(F.col("n_correct") / F.col("n_test"), 6).alias(
                "accuracy"
            ),
        )
    )


SQL_A75 = f"""
WITH bounds AS (
  SELECT min(CAST(ts AS DATE)) AS dmin, max(CAST(ts AS DATE)) AS dmax
  FROM events
), cut AS (
  SELECT dmin + CAST(floor({TRAIN_FRAC} * date_diff('day', dmin, dmax))
                      AS INTEGER) AS cutoff
  FROM bounds
), labeled AS (
  SELECT t.cur, t.nxt, t.d <= c.cutoff AS is_train
  FROM (
    SELECT CAST(ts AS DATE) AS d, event_type AS cur,
           lead(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts ASC, event_id ASC) AS nxt
    FROM events
  ) t CROSS JOIN cut c
  WHERE t.nxt IS NOT NULL
), counts AS (
  SELECT is_train, cur, nxt, count(*) AS c FROM labeled GROUP BY 1, 2, 3
), model AS (
  SELECT cur, nxt AS pred FROM (
    SELECT cur, nxt,
           row_number() OVER (PARTITION BY cur
                              ORDER BY c DESC, nxt ASC) AS rk
    FROM counts WHERE is_train
  ) WHERE rk = 1
)
SELECT (SELECT CAST(sum(c) AS BIGINT) FROM counts WHERE is_train)
         AS n_train,
       CAST(sum(t.c) AS BIGINT) AS n_test,
       CAST(sum(CASE WHEN m.pred IS NOT NULL THEN t.c ELSE 0 END) AS BIGINT)
         AS n_covered,
       CAST(sum(CASE WHEN m.pred = t.nxt THEN t.c ELSE 0 END) AS BIGINT)
         AS n_correct,
       round(sum(CASE WHEN m.pred IS NOT NULL THEN t.c ELSE 0 END) * 1.0
             / sum(t.c), 6) AS coverage,
       round(sum(CASE WHEN m.pred = t.nxt THEN t.c ELSE 0 END) * 1.0
             / sum(t.c), 6) AS accuracy
FROM counts t LEFT JOIN model m ON t.cur = m.cur
WHERE NOT t.is_train
"""


def q_a76_capped_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(l_suppkey, n_periods, final_balance, n_stockouts,
    n_overflows): monthly clamped inventory ledger per supplier."""
    li = _t(spark, sf_dir, "lineitem")
    monthly = (
        li.groupBy(
            "l_suppkey",
            F.trunc(F.to_date("l_shipdate"), "month").alias("month"),
        )
        .agg(
            F.sum(
                F.when(
                    F.col("l_returnflag") == "R", F.col("l_quantity")
                ).otherwise(-F.col("l_quantity"))
            ).alias("delta")
        )
    )
    folded = ind.clamped_balance(
        monthly, key="l_suppkey", seq_col="month", delta_col="delta",
        start=BAL_START, cap=BAL_CAP,
    )
    return folded.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n_periods"),
        F.max_by("balance", "month").alias("final_balance"),
        F.sum(F.when(F.col("clamp") == -1, 1).otherwise(0))
        .cast("long")
        .alias("n_stockouts"),
        F.sum(F.when(F.col("clamp") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_overflows"),
    )


SQL_A76 = f"""
WITH RECURSIVE monthly AS (
  SELECT l_suppkey AS sk, date_trunc('month', l_shipdate) AS month,
         sum(CASE WHEN l_returnflag = 'R' THEN l_quantity
                  ELSE -l_quantity END) AS delta
  FROM lineitem GROUP BY 1, 2
), numbered AS (
  SELECT sk, month, delta,
         row_number() OVER (PARTITION BY sk ORDER BY month) AS rn
  FROM monthly
), r AS (
  SELECT sk, rn,
         CAST(LEAST({BAL_CAP}, GREATEST(0.0, {BAL_START} + delta))
              AS DOUBLE) AS balance,
         CAST(CASE WHEN {BAL_START} + delta < 0.0 THEN -1
                   WHEN {BAL_START} + delta > {BAL_CAP} THEN 1
                   ELSE 0 END AS INTEGER) AS clamp
  FROM numbered WHERE rn = 1
  UNION ALL
  -- EXACTLY the engine's fold: prev + delta, then floor/ceiling clamp
  SELECT n.sk, n.rn,
         LEAST({BAL_CAP}, GREATEST(0.0, r.balance + n.delta)),
         CASE WHEN r.balance + n.delta < 0.0 THEN -1
              WHEN r.balance + n.delta > {BAL_CAP} THEN 1
              ELSE 0 END
  FROM numbered n JOIN r ON n.sk = r.sk AND n.rn = r.rn + 1
)
SELECT sk AS l_suppkey, count(*) AS n_periods,
       arg_max(balance, rn) AS final_balance,
       CAST(sum(CASE WHEN clamp = -1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_stockouts,
       CAST(sum(CASE WHEN clamp = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_overflows
FROM r GROUP BY sk
"""


def q_x93_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, avg_wps, avg_word_len, avg_long_frac,
    avg_lix): per-source readability profile."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    per_doc = docs.select(
        "source",
        F.size(toks).alias("w"),
        F.greatest(
            F.lit(1), F.regexp_count(F.col("text"), F.lit(r"[.!?]+"))
        ).alias("s"),
        F.size(
            F.filter(toks, lambda x: F.length(x) > LONG_WORD_CHARS)
        ).alias("lw"),
        F.aggregate(
            F.transform(toks, lambda x: F.length(x)),
            F.lit(0),
            lambda acc, x: acc + x,
        ).alias("chars"),
    ).select(
        "source",
        (F.col("w") / F.col("s")).alias("wps"),
        (F.col("chars") / F.col("w")).alias("awl"),
        (F.col("lw") / F.col("w")).alias("long_frac"),
    )
    per_doc = per_doc.withColumn(
        "lix", F.col("wps") + 100.0 * F.col("long_frac")
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("wps"), 6).alias("avg_wps"),
        F.round(F.avg("awl"), 6).alias("avg_word_len"),
        F.round(F.avg("long_frac"), 6).alias("avg_long_frac"),
        F.round(F.avg("lix"), 6).alias("avg_lix"),
    )


SQL_X93 = rf"""
WITH per_doc AS (
  SELECT source,
         len(t) AS w,
         GREATEST(1, len(regexp_extract_all(text, '[.!?]+'))) AS s,
         len(list_filter(t, x -> length(x) > {LONG_WORD_CHARS})) AS lw,
         CAST(list_sum(list_transform(t, x -> length(x))) AS BIGINT)
           AS chars
  FROM (SELECT source, text,
               regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents)
), metrics AS (
  SELECT source,
         w * 1.0 / s AS wps,
         chars * 1.0 / w AS awl,
         lw * 1.0 / w AS long_frac,
         w * 1.0 / s + 100.0 * (lw * 1.0 / w) AS lix
  FROM per_doc
)
SELECT source, count(*) AS n_docs,
       round(avg(wps), 6) AS avg_wps,
       round(avg(awl), 6) AS avg_word_len,
       round(avg(long_frac), 6) AS avg_long_frac,
       round(avg(lix), 6) AS avg_lix
FROM metrics GROUP BY source
"""


def q_x94_spearman_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_suppliers, sum_d2, rho): Spearman rank correlation between
    supplier revenue rank and volume rank, exact integer Σd² form."""
    li = _t(spark, sf_dir, "lineitem")
    sup = li.groupBy("l_suppkey").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
        ).alias("rev"),
        F.sum("l_quantity").alias("qty"),
    )
    # sanctioned: two global row_numbers over the supplier-grain
    # aggregate (|suppliers| rows), deterministic key tie-break
    ranked = sup.withColumn(
        "r_rev",
        F.row_number().over(Window.orderBy(F.desc("rev"), F.asc("l_suppkey"))),
    ).withColumn(
        "r_qty",
        F.row_number().over(Window.orderBy(F.desc("qty"), F.asc("l_suppkey"))),
    )
    d2 = (F.col("r_rev") - F.col("r_qty")) * (
        F.col("r_rev") - F.col("r_qty")
    )
    n = F.col("n_suppliers").cast("double")
    return (
        ranked.agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum(d2).cast("long").alias("sum_d2"),
        )
        .select(
            "n_suppliers",
            "sum_d2",
            F.round(
                1.0 - 6.0 * F.col("sum_d2") / (n * (n * n - 1.0)), 6
            ).alias("rho"),
        )
    )


SQL_X94 = """
WITH sup AS (
  SELECT l_suppkey,
         round(sum(l_extendedprice * (1 - l_discount)), 6) AS rev,
         sum(l_quantity) AS qty
  FROM lineitem GROUP BY l_suppkey
), ranked AS (
  SELECT l_suppkey,
         row_number() OVER (ORDER BY rev DESC, l_suppkey ASC) AS r_rev,
         row_number() OVER (ORDER BY qty DESC, l_suppkey ASC) AS r_qty
  FROM sup
), sums AS (
  SELECT count(*) AS n_suppliers,
         CAST(sum((r_rev - r_qty) * (r_rev - r_qty)) AS BIGINT) AS sum_d2
  FROM ranked
)
SELECT n_suppliers, sum_d2,
       round(1.0 - 6.0 * sum_d2
             / (CAST(n_suppliers AS DOUBLE)
                * (CAST(n_suppliers AS DOUBLE)
                   * CAST(n_suppliers AS DOUBLE) - 1.0)), 6) AS rho
FROM sums
"""


def q_x95_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n, n_sources, n_langs, chi2, cramers_v): source×lang
    categorical association strength."""
    docs = _t(spark, sf_dir, "documents")
    cells = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("c")
    )
    # margins and the total are dimension-vocabulary-bounded —
    # broadcast by construction
    rowt = cells.groupBy("source").agg(F.sum("c").alias("rs"))
    colt = cells.groupBy("lang").agg(F.sum("c").alias("cs"))
    tot = cells.agg(F.sum("c").alias("n"))
    e = (F.col("rs") * F.col("cs") / F.col("n")).alias("e")
    terms = (
        cells.join(F.broadcast(rowt), "source")
        .join(F.broadcast(colt), "lang")
        .crossJoin(F.broadcast(tot))
        .select(
            "n",
            "source",
            "lang",
            ((F.col("c") - e) * (F.col("c") - e) / e).alias("term"),
        )
    )
    agg = terms.agg(
        F.max("n").cast("long").alias("n"),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct("lang").alias("n_langs"),
        F.round(F.sum("term"), 6).alias("chi2"),
    )
    return agg.select(
        "n",
        "n_sources",
        "n_langs",
        "chi2",
        F.round(
            F.sqrt(
                F.col("chi2")
                / (
                    F.col("n")
                    * (F.least("n_sources", "n_langs").cast("double") - 1.0)
                )
            ),
            6,
        ).alias("cramers_v"),
    )


SQL_X95 = """
WITH cells AS (
  SELECT source, lang, count(*) AS c FROM documents GROUP BY 1, 2
), rowt AS (SELECT source, sum(c) AS rs FROM cells GROUP BY source),
colt AS (SELECT lang, sum(c) AS cs FROM cells GROUP BY lang),
tot AS (SELECT sum(c) AS n FROM cells),
terms AS (
  SELECT t.n, ce.source, ce.lang,
         (ce.c - r.rs * co.cs / t.n) * (ce.c - r.rs * co.cs / t.n)
           / (r.rs * co.cs / t.n) AS term
  FROM cells ce
  JOIN rowt r ON ce.source = r.source
  JOIN colt co ON ce.lang = co.lang
  CROSS JOIN tot t
), agg AS (
  SELECT CAST(max(n) AS BIGINT) AS n,
         count(DISTINCT source) AS n_sources,
         count(DISTINCT lang) AS n_langs,
         round(sum(term), 6) AS chi2
  FROM terms
)
SELECT n, n_sources, n_langs, chi2,
       round(sqrt(chi2 / (n * (CAST(LEAST(n_sources, n_langs) AS DOUBLE)
                               - 1.0))), 6) AS cramers_v
FROM agg
"""


EXT60_QUERIES = {
    "a75_markov_accuracy": q_a75_markov_accuracy,
    "a76_capped_balance": q_a76_capped_balance,
    "x93_readability": q_x93_readability,
    "x94_spearman_supplier": q_x94_spearman_supplier,
    "x95_cramers_v": q_x95_cramers_v,
}

EXT60_ORACLES = {
    "a75_markov_accuracy": SQL_A75,
    "a76_capped_balance": SQL_A76,
    "x93_readability": SQL_X93,
    "x94_spearman_supplier": SQL_X94,
    "x95_cramers_v": SQL_X95,
}
