"""Twenty-fifth query wave — quality-weighted corpus sampling:

- x34_weighted_sample: deterministic Bernoulli sampling with
  per-document KEEP PROBABILITY proportional to a quality score —
  importance downsampling, the data-mixing step that keeps more of
  the good text without hard-dropping the tail (Brown et al. 2020
  §2.2-style quality-weighted mixing, public). Differs from
  x19_stratified_sample (fixed rate per stratum) in that the rate is
  a CONTINUOUS function of each row.

  Determinism discipline: the coin is the same portable md5-bucket
  uniform used by the split/sampling family (first 7 md5 hex chars /
  16^7 ∈ [0,1)) — reproducible across runs, engines, partitionings;
  pushdown-friendly (pure column function, no RNG state). The
  acceptance test `u < p` uses EXACT doubles on both sides: p is a
  ratio of single-op arithmetic on grid values (no rounding — the q2
  boundary rule).

[EXT] per SURVEY.md §2.11 scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_data_spark.queries import _t

# p(keep) = clamp(n_chars / _FULL_KEEP_CHARS, _P_FLOOR, 1.0):
# longer docs (a cheap quality proxy here; any score column works)
# keep with probability up to 1, short ones at the floor
_FULL_KEEP_CHARS = 400.0
_P_FLOOR = 0.15


def q_x34_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kept documents under quality-weighted Bernoulli sampling:
    (doc_id, lang, p_keep) for rows whose deterministic uniform falls
    under their keep probability, plus per-row p_keep for audit."""
    docs = _t(spark, sf_dir, "documents")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 7), 16, 10)
        .cast("double") / F.lit(float(16 ** 7))
    )
    p = F.least(
        F.lit(1.0),
        F.greatest(F.lit(_P_FLOOR), F.col("n_chars") / F.lit(_FULL_KEEP_CHARS)),
    )
    return (
        docs.withColumn("p_keep", p)
        .filter(u < F.col("p_keep"))
        .select("doc_id", "lang", "p_keep")
    )


SQL_X34 = f"""
SELECT doc_id, lang,
       least(1.0, greatest({_P_FLOOR}, n_chars / {_FULL_KEEP_CHARS})) AS p_keep
FROM documents
WHERE (CAST(('0x' || substr(md5(doc_id::VARCHAR), 1, 7))::BIGINT AS DOUBLE)
       / {float(16 ** 7)})
      < least(1.0, greatest({_P_FLOOR}, n_chars / {_FULL_KEEP_CHARS}))
"""


EXT25_QUERIES = {
    "x34_weighted_sample": q_x34_weighted_sample,
}

EXT25_ORACLES = {
    "x34_weighted_sample": SQL_X34,
}
