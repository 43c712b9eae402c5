"""100× scale probe — the rubric's stated scale-up factor, measured
directly instead of extrapolated from x30.

Reuses tools/scale_probe_30x.py's FK-consistent fan machinery
(fact keys offset per copy, dims shared 1×, document text
suffix-perturbed per copy so vocabulary grows with the corpus,
embeddings fanned with per-copy orthogonal transforms so near-dup
pair volume stays linear) with the copy count parameterized, and
builds BOTH the x10 and the x100 replica with the same code — so the
two decade segments (1×→10×, 10×→100×) are construction-identical
and a super-linear bend between them is a property of the PLAN, not
of the replica.

Staged for the shell cap (one process per stage; one process per
query in the run stage so a heavy pair build's GC/JIT state cannot
contaminate the next query's timing — the r12 x41 protocol):

    python tools/scale_probe_100x.py replicate 10
    python tools/scale_probe_100x.py replicate 100
    python tools/scale_probe_100x.py run <query> [<query> ...]
    python tools/scale_probe_100x.py autoplanes

Each ``run`` prints one JSON line: min-of-2 wall at sf0.1 / x10 /
x100 (noop sink, shared pair memo cleared per rep), ratio_x10,
ratio_x100, and seg_x100 = x100/x10 (per-decade cost growth on the
second segment). ``autoplanes`` times
``cosine_near_dup(n_planes="auto")`` at the three scales — the
public scale path for the sign-LSH family, whose registry pin
(n_planes=4) is the frozen quadratic oracle config and is therefore
excluded here, same as the exact all-pairs baseline.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import scale_probe_30x as base  # noqa: E402  (tools/ sibling)

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
X10 = os.environ.get("SPARK_GRAFT_X10_DIR", "/tmp/sfx10")
X100 = os.environ.get("SPARK_GRAFT_X100_DIR", "/tmp/sfx100")
X1000 = os.environ.get("SPARK_GRAFT_X1000_DIR", "/tmp/sfx1000")
# Per-copy key offset: 100 copies * 10M < 2^31 even stacked on the
# base keys, and identical to the 30x tool's offset so any replica
# can be cross-checked against another. The x1000 second-stage fan
# uses a 1e9 stride, safely above stage 1's 99 * 10M ceiling.
SCALES = (("sf0.1", SRC), ("x10", X10), ("x100", X100), ("x1000", X1000))


def _session():
    from streaming_data_spark.session import get_session

    return get_session(
        app_name="scale-probe-100x",
        # shuffle partitions: session default (4x cores, AQE coalesces)
        # unless SPARK_GRAFT_SHUFFLE_PARTITIONS pins it via autosize.
    )


def _replicate(copies: int) -> None:
    out = {10: X10, 100: X100}[copies]
    base.COPIES = copies
    base.X30 = out  # the 30x module writes to its X30 global
    spark = _session()
    t0 = time.time()
    base._replicate(spark)
    print(json.dumps({"replicated": f"x{copies}", "dir": out,
                      "sec": round(time.time() - t0, 1)}))
    spark.stop()


def _replicate_1000() -> None:
    """Third decade: fan the x100 replica 10x (two-stage, so Catalyst
    never sees a 1000-child union). Only the fact/doc tables the
    x1000 spot-check reads are fanned; dims and embeddings are copied
    1x (the embeddings orthogonal-transform family does not compose
    collision-free across stages, and no embedding query is probed at
    this scale). Stage-2 key stride 1e9 clears stage 1's 99*10M
    ceiling; document text gains a second per-copy suffix so
    vocabulary keeps growing with the corpus."""
    from pyspark.sql import functions as F

    spark = _session()
    t0 = time.time()
    copy_once = ["region", "nation", "customer", "supplier", "part",
                 "embeddings"]
    for t in copy_once:
        spark.read.parquet(f"{X100}/{t}.parquet").write.mode(
            "overwrite").parquet(f"{X1000}/{t}.parquet")

    def fan(df, build):
        out = None
        for i in range(10):
            c = build(df, i)
            out = c if out is None else out.unionByName(c)
        return out

    stride = 1_000_000_000
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        for tbl, key in (("orders", "o_orderkey"),
                         ("lineitem", "l_orderkey"),
                         ("events", "event_id")):
            df = spark.read.parquet(f"{X100}/{tbl}.parquet")
            fan(df, lambda d, i, k=key: d.withColumn(
                k, F.col(k) + F.lit(i * stride))) \
                .write.mode("overwrite").parquet(f"{X1000}/{tbl}.parquet")
    finally:
        spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")

    docs = spark.read.parquet(f"{X100}/documents.parquet")
    fan(docs, lambda d, i: d
        .withColumn("doc_id", F.col("doc_id") + F.lit(i * stride))
        .withColumn("text", F.regexp_replace("text", r"(\S+)", rf"$1d{i}"))) \
        .write.mode("overwrite").parquet(f"{X1000}/documents.parquet")
    print(json.dumps({"replicated": "x1000", "dir": X1000,
                      "sec": round(time.time() - t0, 1)}))
    spark.stop()


_X1000_SAFE_CACHE: dict[str, bool] = {}


def _x1000_safe(name, fn, spark) -> bool:
    """The x1000 replica fans orders/lineitem/events/documents only;
    embeddings are a 1x copy of the x100 replica, so a query whose
    plan scans embeddings.parquet would report a meaningless x1000
    ratio. Until r14 this exclusion lived only in docstrings (r13
    ADVICE); now it is detected from the query's own scan set, not a
    hand list — a query that fails to build is conservatively
    unsafe."""
    if name not in _X1000_SAFE_CACHE:
        try:
            from streaming_data_spark import plans

            _X1000_SAFE_CACHE[name] = (
                "embeddings.parquet" not in plans.explain_str(fn(spark, SRC))
            )
        except Exception:
            _X1000_SAFE_CACHE[name] = False
    return _X1000_SAFE_CACHE[name]


def _run(names: list[str]) -> None:
    import __spark_entry__ as entry
    from streaming_data_spark.operators import dedup as _dedup
    from streaming_data_spark.session import autosize_shuffle_partitions

    spark = _session()
    qs = entry.queries()
    result: dict[str, dict[str, float]] = {}
    for name in names:
        fn = qs[name]
        times: dict[str, float] = {}
        for label, d in SCALES:
            if not os.path.isdir(d):
                print(f"{label} dir {d} missing — run replicate first",
                      file=sys.stderr)
                continue
            if label == "x1000" and not _x1000_safe(name, fn, spark):
                # The x1000 replica fans only the fact/doc tables;
                # embeddings stay at x100 size, so an embedding-
                # dependent query would yield a misleading ratio.
                print(f"{name}: skipping x1000 (reads a table the "
                      "x1000 replica does not fan)", file=sys.stderr)
                continue
            # r14 (r13 verdict item 3): initial shuffle partitions
            # auto-sized from the scale dir's bytes — the hand-set
            # SPARK_GRAFT_SHUFFLE_PARTITIONS knob the r13 x1000
            # finding needed is now the automatic default.  AQE
            # coalesces the small scales back down.
            parts = autosize_shuffle_partitions(spark, d)
            best = float("inf")
            for _ in range(2):
                _dedup._PREFIX_PAIR_CACHE.clear()
                t0 = time.time()
                fn(spark, d).write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            times[label] = round(best, 3)
            times[f"parts_{label}"] = parts
        if "x10" in times and "sf0.1" in times:
            times["ratio_x10"] = round(times["x10"] / times["sf0.1"], 2)
        if "x100" in times and "sf0.1" in times:
            times["ratio_x100"] = round(times["x100"] / times["sf0.1"], 2)
        if "x100" in times and "x10" in times:
            times["seg_x100"] = round(times["x100"] / times["x10"], 2)
        if "x1000" in times and "sf0.1" in times:
            times["ratio_x1000"] = round(times["x1000"] / times["sf0.1"], 2)
        if "x1000" in times and "x100" in times:
            times["seg_x1000"] = round(times["x1000"] / times["x100"], 2)
        result[name] = times
        print(name, times, file=sys.stderr)
    print(json.dumps({"probe": "x100_scaling", "queries": result}))
    spark.stop()


def _autoplanes() -> None:
    """cosine_near_dup(n_planes='auto') at 1x/10x/100x — the public
    scale path (r12 measured x30 = 1.46x through this API)."""
    from streaming_data_spark.operators import similarity

    spark = _session()
    times: dict[str, float] = {}
    planes: dict[str, int] = {}
    pairs: dict[str, int] = {}
    # x1000 excluded: its embeddings table is the x100 copy (the
    # orthogonal-transform fan does not compose collision-free
    # across the two replication stages).
    for label, d in SCALES[:3]:
        if not os.path.isdir(d):
            continue
        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        n = emb.count()
        planes[label] = similarity.auto_n_planes(n)
        best = float("inf")
        out_rows = None
        for _ in range(2):
            t0 = time.time()
            res = similarity.cosine_near_dup(
                emb, threshold=0.9, n_planes="auto")
            out_rows = res.count()
            best = min(best, time.time() - t0)
        times[label] = round(best, 3)
        pairs[label] = out_rows
        print(label, {"sec": times[label], "planes": planes[label],
                      "pairs": out_rows, "rows": n}, file=sys.stderr)
    rpt: dict[str, object] = {"probe": "x100_autoplanes", "sec": times,
                              "planes": planes, "pairs": pairs}
    if "x100" in times and "sf0.1" in times:
        rpt["ratio_x100"] = round(times["x100"] / times["sf0.1"], 2)
    if "x100" in times and "x10" in times:
        rpt["seg_x100"] = round(times["x100"] / times["x10"], 2)
    print(json.dumps(rpt))
    spark.stop()


def main() -> None:
    stage = sys.argv[1] if len(sys.argv) > 1 else "run"
    if stage == "replicate":
        n = int(sys.argv[2])
        _replicate_1000() if n == 1000 else _replicate(n)
    elif stage == "autoplanes":
        _autoplanes()
    else:
        _run(sys.argv[2:] if stage == "run" else sys.argv[1:])


if __name__ == "__main__":
    main()
