"""30× scale probe for the three worst x10 ratios (VERDICT r5 item 7):
``x2_ngram_jaccard_prefix`` (3.46× at 10×), ``x35_lm_score`` (3.09×),
``q21_sole_returner`` (2.73×). The question a 10× probe cannot answer:
is the sublinearity a latency-floor artifact, or does the trend hold
another 3×? A quadratic term that hides at 10× (t = a·n + b·n²/big)
shows at 30× as a ratio bending ABOVE 3× the x10 ratio.

Replication is the same FK-consistent fan-out as tools/scale_probe.py
(fact keys offset per copy, dims shared, document text
suffix-perturbed per copy so vocabulary grows with the corpus — the
honest shape for the two text queries). Only the tables these three
queries read are replicated (documents / lineitem / orders — dims are
copied 1×).

Staged for the 600 s shell cap:
    python tools/scale_probe_30x.py replicate
    python tools/scale_probe_30x.py run x2_ngram_jaccard_prefix
    python tools/scale_probe_30x.py run x35_lm_score
    python tools/scale_probe_30x.py run q21_sole_returner
Each ``run`` prints one JSON line: times at sf0.1 / x10 / x30 and the
ratios (min-of-2 per scale, noop sink).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
X10 = os.environ.get("SPARK_GRAFT_X10_DIR", "/tmp/sfx10")
X30 = os.environ.get("SPARK_GRAFT_X30_DIR", "/tmp/sfx30")
COPIES = 30
OFF = 10_000_000

NEEDED_DIMS = ["region", "nation", "customer", "supplier", "part", "embeddings"]


def _replicate(spark: SparkSession) -> None:
    for t in NEEDED_DIMS:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{X30}/{t}.parquet"
        )

    def fan(df: DataFrame, build) -> DataFrame:
        out = None
        for i in range(COPIES):
            c = build(df, i)
            out = c if out is None else out.unionByName(c)
        return out

    orders = spark.read.parquet(f"{SRC}/orders.parquet")
    fan(orders, lambda d, i: d.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * OFF))) \
        .write.mode("overwrite").parquet(f"{X30}/orders.parquet")

    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    fan(li, lambda d, i: d.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * OFF))) \
        .write.mode("overwrite").parquet(f"{X30}/lineitem.parquet")

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    fan(docs, lambda d, i: d
        .withColumn("doc_id", F.col("doc_id") + F.lit(i * OFF))
        .withColumn("text", F.regexp_replace("text", r"(\S+)", rf"$1c{i}"))) \
        .write.mode("overwrite").parquet(f"{X30}/documents.parquet")

    _replicate_embeddings(spark)
    _replicate_events(spark)


def _replicate_events(spark: SparkSession) -> None:
    """Fan events 30× — same raw-long nanos handling as
    tools/scale_probe.py so load_table's ts logic applies identically
    to the replica. event_id offset per copy; user/session dimensions
    stay in range (30× events against the same user universe, the
    honest growth shape for a behavioral log)."""
    def fan(df: DataFrame, build) -> DataFrame:
        out = None
        for i in range(COPIES):
            c = build(df, i)
            out = c if out is None else out.unionByName(c)
        return out

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        ev = spark.read.parquet(f"{SRC}/events.parquet")
        fan(ev, lambda d, i: d.withColumn(
            "event_id", F.col("event_id") + F.lit(i * OFF))) \
            .write.mode("overwrite").parquet(f"{X30}/events.parquet")
    finally:
        spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")


def _replicate_embeddings(spark: SparkSession) -> None:
    """Fan embeddings 30× with a PER-COPY ORTHOGONAL TRANSFORM
    (cyclic coordinate shift by the copy index + a copy-dependent
    ±1 sign pattern). Orthogonality preserves every WITHIN-copy
    cosine exactly — each copy is a faithful replica of the base
    similarity structure — while cross-copy similarities become
    generic (a permuted-and-sign-flipped vector is uncorrelated with
    its source for non-degenerate data), so near-dup pair volume
    grows LINEARLY with copies. A raw vec_id-offset fan would instead
    make every vector an EXACT duplicate of 29 twins and near-dup
    candidate volume quadratic in copies — the dishonest shape (the
    text fan's suffix-perturbation solves the same problem for
    shingles). vec_id offsets match the documents fan so doc⋈embedding
    joins stay aligned per copy."""
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
    out = None
    for i in range(COPIES):
        if i == 0:
            c = emb  # copy 0 is the untouched base
        else:
            rotated = F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda j: F.element_at(
                    "embedding", ((j + F.lit(i)) % dim + 1).cast("int")
                ) * F.when((j + F.lit(i)) % 3 == 0, -1.0).otherwise(1.0),
            )
            c = emb.withColumn("embedding", rotated)
        c = c.withColumn("vec_id", F.col("vec_id") + F.lit(i * OFF))
        out = c if out is None else out.unionByName(c)
    out.write.mode("overwrite").parquet(f"{X30}/embeddings.parquet")


def main() -> None:
    from streaming_data_spark.session import get_session
    import __spark_entry__ as entry

    spark = get_session(
        app_name="scale-probe-30x",
        # shuffle partitions: session default (4x cores, AQE coalesces)
        # unless SPARK_GRAFT_SHUFFLE_PARTITIONS pins it via autosize.
    )
    stage = sys.argv[1] if len(sys.argv) > 1 else "run"
    if stage == "replicate":
        t0 = time.time()
        _replicate(spark)
        print(json.dumps({"replicated": "x30", "sec": round(time.time() - t0, 1)}))
        spark.stop()
        return
    if stage == "embeddings":  # regenerate only the embeddings fan
        t0 = time.time()
        _replicate_embeddings(spark)
        print(json.dumps({"replicated": "x30-embeddings",
                          "sec": round(time.time() - t0, 1)}))
        spark.stop()
        return
    if stage == "events":  # regenerate only the events fan
        t0 = time.time()
        _replicate_events(spark)
        print(json.dumps({"replicated": "x30-events",
                          "sec": round(time.time() - t0, 1)}))
        spark.stop()
        return

    from streaming_data_spark.operators import dedup as _dedup

    names = sys.argv[2:]
    qs = entry.queries()
    result: dict[str, dict[str, float]] = {}
    for name in names:
        fn = qs[name]
        times: dict[str, float] = {}
        for label, d in (("sf0.1", SRC), ("x10", X10), ("x30", X30)):
            if not os.path.isdir(d):
                print(f"{label} dir {d} missing — run the replicate "
                      "stage first; skipping that scale", file=sys.stderr)
                continue
            best = float("inf")
            for _ in range(2):
                # Standalone cost per rep: the shared prefix-pair memo
                # would otherwise make rep 2 (and every same-scale
                # consumer) a warm cache hit — same protocol as
                # bench.py's shared_pair_build line and scale_probe.py.
                _dedup._PREFIX_PAIR_CACHE.clear()
                t0 = time.time()
                fn(spark, d).write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            times[label] = round(best, 3)
        if "x10" in times and "sf0.1" in times:
            times["ratio_x10"] = round(times["x10"] / times["sf0.1"], 2)
        if "x30" in times and "sf0.1" in times:
            times["ratio_x30"] = round(times["x30"] / times["sf0.1"], 2)
        result[name] = times
        print(name, times, file=sys.stderr)
    print(json.dumps({"probe": "x30_scaling", "queries": result}))
    spark.stop()


if __name__ == "__main__":
    main()
