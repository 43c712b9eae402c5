"""Scale probe: replicate the sf0.1 testdata 10× into /tmp and time
the heavy headline queries at both scales.

Purpose (VERDICT r1 item 10): make shuffle-path scale cliffs visible
before 100×. A healthy distributed plan should scale ≲ linearly in
rows (fixed overheads amortize); anything superlinear is a red flag —
a global window, an unbounded join fan-out, a driver bottleneck.

Replication is FK-consistent: fact keys (orderkey, event_id, doc_id,
vec_id) are offset per copy; dimension keys (custkey, suppkey,
partkey, user_id) are left in range so each copy joins the same dims —
i.e. 10× fact rows against the same dimensional universe, which is how
real warehouses grow. Document text is suffix-perturbed per copy so
near-dup pair structure grows linearly (10 exact copies of every doc
would inflate pair counts instead).

Writes /tmp/sfx10 once (reused if present); prints one JSON line.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = os.environ.get("SPARK_GRAFT_X10_DIR", "/tmp/sfx10")
COPIES = 10
OFF = 10_000_000  # key offset per copy — far above any base key


def _replicate(spark: SparkSession) -> None:
    plain = ["region", "nation", "customer", "supplier", "part"]
    for t in plain:  # dims: single copy
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(f"{DST}/{t}.parquet")

    def fan(df: DataFrame, build) -> DataFrame:
        out = None
        for i in range(COPIES):
            c = build(df, i)
            out = c if out is None else out.unionByName(c)
        return out

    orders = spark.read.parquet(f"{SRC}/orders.parquet")
    fan(orders, lambda d, i: d.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * OFF))) \
        .write.mode("overwrite").parquet(f"{DST}/orders.parquet")

    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    fan(li, lambda d, i: d.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * OFF))) \
        .write.mode("overwrite").parquet(f"{DST}/lineitem.parquet")

    # events stores ts as TIMESTAMP(NANOS); copy it at the raw-long
    # level so load_table's nanos handling applies identically to DST
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        ev = spark.read.parquet(f"{SRC}/events.parquet")
        fan(ev, lambda d, i: d.withColumn("event_id", F.col("event_id") + F.lit(i * OFF))) \
            .write.mode("overwrite").parquet(f"{DST}/events.parquet")
    finally:
        spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    fan(docs, lambda d, i: d
        .withColumn("doc_id", F.col("doc_id") + F.lit(i * OFF))
        .withColumn("text", F.regexp_replace("text", r"(\S+)", rf"$1c{i}"))) \
        .write.mode("overwrite").parquet(f"{DST}/documents.parquet")

    # Embeddings fan with a PER-COPY ORTHOGONAL TRANSFORM (cyclic
    # coordinate shift + copy-dependent sign pattern): preserves every
    # within-copy cosine exactly while making cross-copy similarities
    # generic, so near-dup candidate volume grows LINEARLY in copies.
    # A raw vec_id-offset fan (the pre-r11 version) made every vector
    # an exact duplicate of its 9 twins — quadratic cross-copy
    # candidate volume, the dishonest shape (the text fan's
    # suffix-perturbation solves the same problem for shingles).
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    first = emb.select("embedding").first()
    if first is None or first[0] is None:
        raise SystemExit(
            f"embeddings table at {SRC} is empty — cannot derive the "
            "transform dimension; regenerate the testdata"
        )
    dim = len(first[0])
    # Copies i and i' collide (identical shift+sign => exact
    # duplicates, reintroducing the quadratic cross-copy candidate
    # volume this transform exists to prevent) when i = i' mod
    # lcm(dim, 3). Safe for the shipped dim=64 (lcm 192), but guard
    # against a shrunken embeddings dataset (r11 advice).
    if math.lcm(dim, 3) <= COPIES:
        raise SystemExit(
            f"embedding dim {dim}: lcm(dim, 3) = {math.lcm(dim, 3)} "
            f"<= {COPIES} copies — per-copy transforms would repeat "
            "and produce exact cross-copy duplicates"
        )

    def _rot(d: DataFrame, i: int) -> DataFrame:
        if i == 0:
            c = d  # copy 0 is the untouched base
        else:
            c = d.withColumn("embedding", F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda j: F.element_at(
                    "embedding", ((j + F.lit(i)) % dim + 1).cast("int")
                ) * F.when((j + F.lit(i)) % 3 == 0, -1.0).otherwise(1.0),
            ))
        return c.withColumn("vec_id", F.col("vec_id") + F.lit(i * OFF))

    fan(emb, _rot).write.mode("overwrite").parquet(f"{DST}/embeddings.parquet")


HEAVY = [
    "q1_pricing_summary", "q3_shipping_priority", "q5_regional_revenue",
    "a3_ohlcv", "a4_rolling_24h", "x1_exact_dedup", "x2_minhash_lsh",
    "q18_large_orders", "q10_returned_items",
    # round-2 additions: scan-pushdown, broadcast-disjunction,
    # distinct-agg, shingle-join, and explode-heavy shapes
    "q6_forecast_revenue", "q19_disjunctive_revenue", "q16_supplier_cnt",
    "x16_decontaminate", "x17_tfidf_terms",
    # round-4 additions: star-join rollup, outer-join histogram,
    # double-scan share filter, winnowing fp join, regex-heavy scrub
    "q9_profit_by_nation_year", "q13_order_count_distribution",
    "q11_heavy_parts", "x21_winnow_overlap", "x22_repetition",
    "x23_pii_scrub",
    # round-4 wave 14/15: triple-self-join exists chain, decorrelated
    # min join, fact-fact conditional agg, iterative k-means, SCD2
    "q21_sole_returner", "q2_min_cost_supplier", "q12_priority_split",
    "x25_kmeans_assign", "scd2_history",
    # round-4 wave 17/18: one-pass funnel, keyed retention join,
    # two-quantile-pass robust stats, trailing window frames,
    # explode-into-windows rolling distinct, bit-interleave projection
    "funnel_conversion", "cohort_retention", "a15_robust_stats",
    "a16_rolling_zscore", "a17_rolling_distinct", "x26_zorder_curve",
    # round-4 wave 19/20: blocked fuzzy join, explode-heavy index
    # build and bigram counting, global-sort ntile, temporal range
    # join, Expand-based unpivot, partial-merge rollup
    "x29_fuzzy_match", "x30_inverted_index", "x31_bigram_lm",
    "a18_equidepth_hist", "j7_temporal_join", "p14_unpivot",
    "incremental_rollup",
    # round-4 wave 21 + lossless-pruning jaccard tier
    "a19_activity_streaks", "a20_rolling_corr", "x2_ngram_jaccard_prefix",
    # round-4 wave 22: position-keyed centroid distance join
    "x33_centroid_classify",
    # round-4 wave 23: full-outer snapshot diff, two-level candle cascade
    "cdc_snapshot_diff", "a21_candle_resample",
    # round-4 waves 24/25: VARIANT probe-per-path, shuffle-free weighted sample
    "f_variant_json", "x34_weighted_sample",
    # round-4 wave 26: BI reporting shapes
    "a22_wow_growth", "a23_topn_others", "a24_cooccurrence",
    # round-4 wave 27: session-scoped funnel (two window passes + funnel agg)
    "funnel_in_session",
    # round-4 wave 28: sorted-frame exact rolling median
    "a25_rolling_median",
    # round-5 wave 29: tumbling-window exact median
    "a26_window_median",
    # round-5 wave 30: technical indicators (fact-sized daily groupBy;
    # a29's per-key Arrow fold is the sequential-recursion shape)
    "a27_sma_crossover", "a29_ewma", "a30_max_drawdown",
    # round-5 wave 31: instance-level LM scoring (3 shuffles on bigram
    # instances; vocabulary grows with the corpus in the x10 replica)
    "x35_lm_score",
    # round-5 wave 32: MG candidates + exact verify (bounded-state
    # heavy hitters; verify pass shuffles candidates only)
    "x36_heavy_hitters",
    # round-5 wave 33: ML featurization (partition-only LOO window;
    # explode + md5-bucket groupBy)
    "a31_target_encode", "x37_feature_hash",
    # round-5 wave 34: one window pass + dimension-bounded groupBys
    "a32_event_transitions",
    # round-6 waves 35-40: bounded-state index, indicator quartet,
    # PMI margins, char histogram, BM25 chain, quality-canonical
    # dedup (pair-gen + CC), PageRank iterations, sampling windows,
    # label-filtered cosine top-k
    "x30_inverted_index_capped",
    "a33_atr", "a34_rsi", "a35_stochastic", "a36_obv",
    "x38_pmi_collocations", "x39_char_entropy", "x40_bm25",
    "x41_canonical_by_quality", "x42_pagerank",
    "x43_stratified_split", "x44_class_balance", "x45_hard_negatives",
    # round-6 waves 45-47: customer-grain ntiles, distinct-score
    # cumulative, keyed order-statistic clip, basket self-join rules,
    # wedge-join triangles, dow cells, probe-broadcast kNN,
    # cluster-blocked semantic dedup, double keyed-median anomalies
    "a38_rfm_segments", "x54_auc", "x55_winsorize",
    "x56_assoc_rules", "x57_triangles", "a39_seasonal_dow",
    "x58_knn_classify", "x59_semdedup", "a40_anomaly_mad",
]


def main() -> None:
    from streaming_data_spark.session import get_session
    import __spark_entry__ as entry

    spark = get_session(app_name="scale-probe",
                        )
    if not os.path.exists(f"{DST}/lineitem.parquet"):
        t0 = time.time()
        _replicate(spark)
        print(f"replicated 10x in {time.time()-t0:.1f}s", file=sys.stderr)

    from streaming_data_spark.operators import dedup as _dedup

    qs = entry.queries()
    names = sys.argv[1:] or HEAVY  # optional subset for targeted runs
    result: dict[str, dict[str, float]] = {}
    for name in names:
        fn = qs[name]
        times = {}
        for label, d in (("sf0.1", SRC), ("x10", DST)):
            best = float("inf")
            for _ in range(2):
                # the probe measures each query's FULL standalone cost:
                # the r8 shared pair memo must not let a later query
                # ride an earlier query's materialized pair set here
                _dedup._PREFIX_PAIR_CACHE.clear()
                t0 = time.time()
                df = fn(spark, d)
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            times[label] = round(best, 3)
        times["ratio"] = round(times["x10"] / times["sf0.1"], 2)
        result[name] = times
        print(name, times, file=sys.stderr)

    print(json.dumps({"probe": "x10_scaling", "queries": result}))
    spark.stop()


if __name__ == "__main__":
    main()
