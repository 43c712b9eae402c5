"""Forty-third query wave — corpus-vocabulary statistics, the two
computations a tokenizer-training pipeline runs over a raw corpus
before any model sees it:

- x51_bpe_pairs: one byte-pair-encoding induction step — the count of
  every adjacent CHARACTER pair, weighted by word frequency (the
  argmax of this table is the merge BPE would perform next). The
  trick that makes it 100 TB-shaped: pair explosion runs over the
  DISTINCT-word vocabulary (bounded by language, not corpus size)
  carrying the word's count as a weight — the corpus-sized pass is
  only the word-count groupBy (map-side combinable). Integer-exact:
  no float contract anywhere.
- x52_zipf_slope: the Zipf log-log slope of the token frequency
  distribution per language (a well-formed natural-language corpus
  has slope ≈ −1; a drifting scrape pipeline shows up here before it
  shows up in loss curves). Deterministic ranks (count desc, token
  asc tiebreak in BOTH engines); the four regression sums (Σx, Σy,
  Σxy, Σx²) are each rounded to 6 on both sides, after which the
  closed-form slope arithmetic is bit-identical.

Tokenization matches the x35/x17/x18 contract:
regexp_split_to_array(trim(text), '\\s+') == F.split(F.trim, r'\\s+').

[EXT]-LLM-pipeline per SURVEY.md §2.11 scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streaming_data_spark.queries import _t


def q_x51_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(left_ch, right_ch, pair_count): frequency-weighted adjacent
    character pairs over the corpus vocabulary."""
    docs = _t(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(F.split(F.trim("text"), r"\s+")).alias("w")
        )
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.length("w") >= 2)
    )
    pairs = words.select(
        "c",
        F.explode(
            F.expr(
                "transform(sequence(1, length(w) - 1),"
                " i -> struct(substring(w, i, 1) AS left_ch,"
                "             substring(w, i + 1, 1) AS right_ch))"
            )
        ).alias("p"),
    ).select("c", "p.left_ch", "p.right_ch")
    return pairs.groupBy("left_ch", "right_ch").agg(
        F.sum("c").alias("pair_count")
    )


SQL_X51 = """
WITH words AS (
  SELECT w, count(*) AS c FROM (
    SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
    FROM documents)
  WHERE length(w) > 0 GROUP BY w
),
pairs AS (
  SELECT substr(w, i, 1) AS left_ch, substr(w, i + 1, 1) AS right_ch, c
  FROM words, unnest(generate_series(1, length(w) - 1)) AS g(i)
  WHERE length(w) >= 2
)
SELECT left_ch, right_ch, CAST(sum(c) AS BIGINT) AS pair_count
FROM pairs GROUP BY left_ch, right_ch
"""


def q_x52_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang, n_types, slope): least-squares slope of ln(count) vs
    ln(rank) over each language's token frequency table."""
    docs = _t(spark, sf_dir, "documents")
    vocab = (
        docs.select(
            "lang", F.explode(F.split(F.trim("text"), r"\s+")).alias("w")
        )
        .filter(F.length("w") > 0)
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w_rank = Window.partitionBy("lang").orderBy(
        F.col("c").desc(), F.col("w").asc()
    )
    xy = vocab.select(
        "lang",
        F.log(F.row_number().over(w_rank).cast("double")).alias("x"),
        F.log(F.col("c").cast("double")).alias("y"),
    )
    sums = xy.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_types"),
        F.round(F.sum("x"), 6).alias("sx"),
        F.round(F.sum("y"), 6).alias("sy"),
        F.round(F.sum(F.col("x") * F.col("y")), 6).alias("sxy"),
        F.round(F.sum(F.col("x") * F.col("x")), 6).alias("sxx"),
    )
    n = F.col("n_types").cast("double")
    return sums.select(
        "lang",
        "n_types",
        F.round(
            (n * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (n * F.col("sxx") - F.col("sx") * F.col("sx")),
            6,
        ).alias("slope"),
    )


SQL_X52 = """
WITH vocab AS (
  SELECT lang, w, count(*) AS c FROM (
    SELECT lang, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
    FROM documents)
  WHERE length(w) > 0 GROUP BY lang, w
),
xy AS (
  SELECT lang,
         ln(CAST(row_number() OVER (PARTITION BY lang
                                    ORDER BY c DESC, w ASC) AS DOUBLE)) AS x,
         ln(CAST(c AS DOUBLE)) AS y
  FROM vocab
),
sums AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_types,
         round(sum(x), 6) AS sx, round(sum(y), 6) AS sy,
         round(sum(x * y), 6) AS sxy, round(sum(x * x), 6) AS sxx
  FROM xy GROUP BY lang
)
SELECT lang, n_types,
       round((CAST(n_types AS DOUBLE) * sxy - sx * sy)
             / (CAST(n_types AS DOUBLE) * sxx - sx * sx), 6) AS slope
FROM sums
"""


EXT43_QUERIES = {
    "x51_bpe_pairs": q_x51_bpe_pairs,
    "x52_zipf_slope": q_x52_zipf_slope,
}

EXT43_ORACLES = {
    "x51_bpe_pairs": SQL_X51,
    "x52_zipf_slope": SQL_X52,
}
