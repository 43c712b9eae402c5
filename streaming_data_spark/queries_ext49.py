"""Forty-ninth query wave — distributed linear algebra:

- x62_pca_power: top principal component of the embedding corpus via
  5 power-iteration steps over the covariance matrix — the PCA
  projection step of an embedding-pipeline (whitening, drift-of-
  subspace monitoring, dimensionality audit). Emits one row per
  dimension: the sign-normalized component, the dominant eigenvalue
  and its explained-variance share.

Determinism recipe (this is the third iterative-numerics query after
x42 PageRank and a37 Holt, but the first with VECTOR state):
  1. The only order-dependent reductions — the covariance moment sums
     — are rounded to 6; both engines then hold the IDENTICAL d×d
     matrix.
  2. Every subsequent reduction is an ORDERED LEFT FOLD over an
     index-sorted array (Spark `aggregate`/`zip_with`, DuckDB
     `list_sum(list_transform(...))` — the exact pairing x5/x7/x8
     proved bit-compatible for dot products), so matrix·vector
     products, norms and the trace are the same IEEE op sequence on
     both sides. Outputs are exact and unrounded.
  3. The eigenvector sign is fixed by the final un-normalized
     iterate's first element (>= 0), making the answer unique.

Scale shape: moments are one self-join keyed on vec_id (fan-out d per
row) into a d²-cell groupBy — the d²-bounded cell table then drives
everything; each iteration is a broadcast of the CURRENT d-vector
(one row) against the d-row matrix — the fact-sized corpus is
touched exactly twice (μ and S). At 100 TB the moment pass is the
standard map-side-combinable outer-product accumulation; d² cells
(64² here) stay tiny. The matrix rows frame is checkpointed once.

[EXT]-classic per SURVEY.md §2.11 scope (ML featurization family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_data_spark.operators.similarity import _dot
from streaming_data_spark.queries import _t

PCA_ITERS = 5


def _fold_sq(arr):
    """Σ x² as the same ordered left fold both engines run."""
    return _dot(arr, arr)


def q_x62_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(pos, component, eigenvalue, explained_share): top PC of the
    embedding covariance after 5 power iterations."""
    emb = _t(spark, sf_dir, "embeddings")
    pos = emb.select(
        "vec_id", F.posexplode("embedding").alias("j", "x")
    ).select("vec_id", "j", F.col("x").cast("double").alias("x"))
    n = emb.agg(F.count(F.lit(1)).alias("n"))
    mu = (
        pos.groupBy("j")
        .agg(F.sum("x").alias("sx"))
        .crossJoin(F.broadcast(n))
        .select("j", F.round(F.col("sx") / F.col("n"), 6).alias("mu"))
    )
    a = pos.select(F.col("j").alias("i"), F.col("x").alias("xa"), "vec_id")
    b = pos.select(F.col("j").alias("jj"), F.col("x").alias("xb"), "vec_id")
    s = (
        a.join(b, "vec_id")
        .groupBy("i", "jj")
        .agg(F.sum(F.col("xa") * F.col("xb")).alias("s"))
    )
    cov = (
        s.crossJoin(F.broadcast(n))
        .join(F.broadcast(mu.select(F.col("j").alias("i"), F.col("mu").alias("mu_i"))), "i")
        .join(F.broadcast(mu.select(F.col("j").alias("jj"), F.col("mu").alias("mu_j"))), "jj")
        .select(
            "i",
            "jj",
            F.round(
                F.col("s") / F.col("n") - F.col("mu_i") * F.col("mu_j"), 6
            ).alias("cov"),
        )
    )
    rows = (
        cov.groupBy("i")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("jj", "cov"))),
                lambda st: st["cov"],
            ).alias("row")
        )
        .localCheckpoint(eager=True)
    )
    # v0 = normalized all-ones (1/sqrt(d) is exact for d=64; the
    # sqrt+division are single IEEE ops for any d)
    v = rows.filter(F.col("i") == 0).select(
        F.transform(
            F.col("row"),
            lambda _: F.lit(1.0) / F.sqrt(F.size(F.col("row")).cast("double")),
        ).alias("v")
    )
    wv = None
    for _ in range(PCA_ITERS):
        wk = rows.crossJoin(F.broadcast(v)).select(
            "i", _dot(F.col("row"), F.col("v")).alias("w")
        )
        wv = wk.agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "w"))),
                lambda st: st["w"],
            ).alias("warr")
        )
        v = wv.select(
            F.transform(
                F.col("warr"),
                lambda x: x / F.sqrt(_fold_sq(F.col("warr"))),
            ).alias("v")
        )
    diag = rows.select(
        "i", F.element_at(F.col("row"), F.col("i") + 1).alias("d")
    ).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "d"))),
            lambda st: st["d"],
        ).alias("darr")
    )
    final = (
        wv.crossJoin(F.broadcast(diag))
        .select(
            F.col("warr"),
            F.sqrt(_fold_sq(F.col("warr"))).alias("lam"),
            F.aggregate(
                F.col("darr"), F.lit(0.0), lambda acc, x: acc + x
            ).alias("trace"),
        )
        .select(
            "warr",
            "lam",
            "trace",
            F.when(F.element_at(F.col("warr"), 1) < 0, F.lit(-1.0))
            .otherwise(F.lit(1.0))
            .alias("sgn"),
        )
    )
    return final.select(
        F.posexplode(
            F.transform(
                F.col("warr"),
                lambda x: x / F.col("lam") * F.col("sgn"),
            )
        ).alias("pos", "component"),
        F.col("lam").alias("eigenvalue"),
        (F.col("lam") / F.col("trace")).alias("explained_share"),
    ).select("pos", "component", "eigenvalue", "explained_share")


def _pca_sql(iters: int = PCA_ITERS) -> str:
    dot = (
        "list_sum(list_transform(range(1, len(r.row)+1),"
        " idx -> r.row[idx] * v.v[idx]))"
    )
    chain = []
    prev_v = "v0"
    for k in range(1, iters + 1):
        chain.append(f"""w{k} AS (
  SELECT r.i, {dot} AS w FROM rows r, {prev_v} v
),
wv{k} AS (SELECT list(w ORDER BY i) AS warr FROM w{k}),
v{k} AS (
  SELECT list_transform(warr,
    x -> x / sqrt(list_sum(list_transform(warr, y -> y * y)))) AS v
  FROM wv{k}
)""")
        prev_v = f"v{k}"
    steps = ",\n".join(chain)
    return f"""
WITH pos AS (
  SELECT vec_id, i - 1 AS j, embedding[i]::DOUBLE AS x
  FROM embeddings,
       unnest(generate_series(1, len(embedding))) AS g(i)
),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM embeddings),
mu AS (
  SELECT j, round(sum(x) / (SELECT n FROM n), 6) AS mu
  FROM pos GROUP BY j
),
s AS (
  SELECT a.j AS i, b.j AS jj, sum(a.x * b.x) AS s
  FROM pos a JOIN pos b USING (vec_id)
  GROUP BY a.j, b.j
),
cov AS (
  SELECT s.i, s.jj,
         round(s.s / (SELECT n FROM n) - mi.mu * mj.mu, 6) AS cov
  FROM s
  JOIN mu mi ON mi.j = s.i
  JOIN mu mj ON mj.j = s.jj
),
rows AS (
  SELECT i, list(cov ORDER BY jj) AS row FROM cov GROUP BY i
),
v0 AS (
  SELECT list_transform(row, x -> 1.0 / sqrt(CAST(len(row) AS DOUBLE))) AS v
  FROM rows WHERE i = 0
),
{steps},
diag AS (
  SELECT list(row[i + 1] ORDER BY i) AS darr FROM rows
),
final AS (
  SELECT warr,
         sqrt(list_sum(list_transform(warr, y -> y * y))) AS lam,
         list_sum(darr) AS trace,
         CASE WHEN warr[1] < 0 THEN -1.0 ELSE 1.0 END AS sgn
  FROM wv{iters}, diag
)
SELECT CAST(idx - 1 AS INT) AS pos,
       warr[idx] / lam * sgn AS component,
       lam AS eigenvalue,
       lam / trace AS explained_share
FROM final, unnest(generate_series(1, len(warr))) AS g(idx)
"""


SQL_X62 = _pca_sql()


EXT49_QUERIES = {
    "x62_pca_power": q_x62_pca_power,
}

EXT49_ORACLES = {
    "x62_pca_power": SQL_X62,
}
