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
    python tools/scale_probe_100x.py replicate 1000
    python tools/scale_probe_100x.py embeddings1000   # true x1000 embeddings fan
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

    extra = {}
    codec = os.environ.get("SPARK_GRAFT_IO_CODEC")
    if codec:
        # Probe-level shuffle/spill codec override. The x1000 doc-graph
        # legs (5M docs: shared pair build) spill ~2x the sandbox's
        # ~60 GB free disk under the lz4 default; zstd roughly halves
        # spill bytes on text and is the knob a real cluster would turn
        # for this workload. Plan-invariant (codec is not part of any
        # plan fingerprint), so probe numbers remain plan-comparable;
        # the env var keeps the product default untouched.
        extra["spark.io.compression.codec"] = codec
    return get_session(
        app_name="scale-probe-100x",
        # shuffle partitions: session default (4x cores, AQE coalesces)
        # unless SPARK_GRAFT_SHUFFLE_PARTITIONS pins it via autosize.
        extra_conf=extra,
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


def _replicate_stage2(copies: int, out: str) -> None:
    """Stage-2 fan of the x100 replica (two-stage, so Catalyst never
    sees a 1000-child union). copies=10 -> the x1000 third decade;
    copies=3 -> the x300 half-decade point for the doc-graph tier
    (whose x1000 pair-build spill exceeds this sandbox's ~60 GB free
    disk — the x300 point keeps the tier's growth curve measured
    instead of extrapolated). Fact/doc tables fan; dims and
    embeddings are copied 1x (embeddings can be upgraded to a true
    fan afterwards by the embeddings1000 stage). Stage-2 key stride
    1e9 clears stage 1's 99*10M ceiling; document text gains a second
    per-copy suffix so vocabulary keeps growing with the corpus."""
    from pyspark.sql import functions as F

    spark = _session()
    t0 = time.time()
    copy_once = ["region", "nation", "customer", "supplier", "part",
                 "embeddings"]
    for t in copy_once:
        spark.read.parquet(f"{X100}/{t}.parquet").write.mode(
            "overwrite").parquet(f"{out}/{t}.parquet")
    # this stage writes a 1x embeddings copy — a marker left behind by
    # a previous embeddings1000 fan would now be a lie
    marker = os.path.join(out, EMB_FAN_MARKER)
    if os.path.exists(marker):
        os.unlink(marker)
    _X1000_SAFE_CACHE.clear()

    def fan(df, build):
        acc = None
        for i in range(copies):
            c = build(df, i)
            acc = c if acc is None else acc.unionByName(c)
        return acc

    stride = 1_000_000_000
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        for tbl, key in (("orders", "o_orderkey"),
                         ("lineitem", "l_orderkey"),
                         ("events", "event_id")):
            df = spark.read.parquet(f"{X100}/{tbl}.parquet")
            fan(df, lambda d, i, k=key: d.withColumn(
                k, F.col(k) + F.lit(i * stride))) \
                .write.mode("overwrite").parquet(f"{out}/{tbl}.parquet")
    finally:
        spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")

    docs = spark.read.parquet(f"{X100}/documents.parquet")
    fan(docs, lambda d, i: d
        .withColumn("doc_id", F.col("doc_id") + F.lit(i * stride))
        .withColumn("text", F.regexp_replace("text", r"(\S+)", rf"$1d{i}"))) \
        .write.mode("overwrite").parquet(f"{out}/documents.parquet")
    print(json.dumps({"replicated": f"x{copies * 100}", "dir": out,
                      "sec": round(time.time() - t0, 1)}))
    spark.stop()


def _replicate_1000() -> None:
    _replicate_stage2(10, X1000)


_X1000_SAFE_CACHE: dict[str, bool] = {}
# Sidecar written by the embeddings1000 stage: its presence means the
# x1000 dir's embeddings table is a TRUE x1000 fan (Walsh signed-
# permutation family, see _replicate_embeddings_1000), lifting the
# embedding-query exclusion below.
EMB_FAN_MARKER = "EMBEDDINGS_X1000_FANNED.json"


def _x1000_safe(name, fn, spark) -> bool:
    """The x1000 replica fans orders/lineitem/events/documents in the
    base stages; embeddings start as a 1x copy of the x100 replica, so
    a query whose plan scans embeddings.parquet would report a
    meaningless x1000 ratio — UNLESS the embeddings1000 stage has
    since replaced that copy with a true fan (marker sidecar). Until
    r14 this exclusion lived only in docstrings (r13 ADVICE); now it
    is detected from the query's own scan set, not a hand list — a
    query that fails to build is conservatively unsafe."""
    if name not in _X1000_SAFE_CACHE:
        try:
            from streaming_data_spark import plans

            _X1000_SAFE_CACHE[name] = (
                os.path.exists(os.path.join(X1000, EMB_FAN_MARKER))
                or "embeddings.parquet"
                not in plans.explain_str(fn(spark, SRC))
            )
        except Exception:
            _X1000_SAFE_CACHE[name] = False
    return _X1000_SAFE_CACHE[name]


def _replicate_embeddings_1000() -> None:
    """True x1000 embeddings fan, built in ONE stage from the BASE
    table with a 1024-member signed-permutation family — the 30x
    tool's cyclic-shift+mod-3-sign family caps at lcm(dim, 3) = 192
    distinct copies (dim 64), which is why the two-stage fact fan left
    embeddings at 1x (orthogonal transforms there don't compose
    collision-free across stages).

    Copy i -> shift s = i % dim composed with Walsh sign mask
    q = i // dim:  T_i(v)[j] = v[k] * (-1)^popcount(q & k) with
    k = (j + s) % dim.  Every T_i is a signed permutation (orthogonal:
    within-copy cosines preserved EXACTLY, so each copy replicates the
    base similarity structure).  Two copies share a transform only at
    identical (s, q) — i.e. never for i != i' < dim * dim.  For equal
    shifts and q != q', the pointwise sign product is the Walsh
    function W_{q xor q'}, balanced over [0, dim) (q xor q' < dim), so
    cross-copy cosines are Walsh-modulated correlations ~= 0 and
    near-dup pair volume grows LINEARLY with copies — the same honesty
    requirement the 30x family meets for its 30/100 copies.

    vec_id offsets mirror the documents two-stage fan exactly
    (a * 10M for a = i % 100, b * 1e9 for b = i // 100), so
    doc⋈embedding joins stay aligned per copy."""
    from pyspark.sql import functions as F

    spark = _session()
    t0 = time.time()
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    first = emb.select("embedding").first()
    if first is None or first[0] is None:
        raise SystemExit(f"embeddings table at {SRC} is empty")
    dim = len(first[0])
    copies = 1000
    if dim * dim < copies or (copies + dim - 1) // dim > dim:
        raise SystemExit(
            f"embedding dim {dim}: Walsh family supports dim^2 = "
            f"{dim * dim} copies < {copies}")
    cp = F.col("copy")
    s = (cp % dim).cast("int")
    q = (cp / dim).cast("int")
    j = F.sequence(F.lit(0), F.lit(dim - 1))

    def _elem(jj):
        k = ((jj + s) % dim).cast("int")
        sign = F.when(F.bit_count(q.bitwiseAND(k)) % 2 == 1,
                      F.lit(-1.0)).otherwise(F.lit(1.0))
        return F.element_at("embedding", k + 1) * sign

    fanned = (
        emb.crossJoin(F.broadcast(
            spark.range(copies).select(F.col("id").alias("copy"))))
        .withColumn("vec_id",
                    F.col("vec_id")
                    + (cp % 100) * F.lit(10_000_000)
                    + (cp / 100).cast("long") * F.lit(1_000_000_000))
        .withColumn("embedding",
                    F.transform(j, _elem).cast("array<float>"))
        .drop("copy")
    )
    fanned.write.mode("overwrite").parquet(f"{X1000}/embeddings.parquet")
    meta = {"family": "walsh_signed_permutation", "copies": copies,
            "dim": dim, "source": SRC,
            "vec_id_strides": [10_000_000, 1_000_000_000]}
    with open(os.path.join(X1000, EMB_FAN_MARKER), "w") as fh:
        json.dump(meta, fh, indent=1)
    _X1000_SAFE_CACHE.clear()
    print(json.dumps({"replicated": "x1000-embeddings", "dir": X1000,
                      "sec": round(time.time() - t0, 1), **meta}))
    spark.stop()


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
            print(f"{name} @{label}: {times[label]}s (parts={parts})",
                  file=sys.stderr, flush=True)
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
        if n == 1000:
            _replicate_1000()
        elif n == 300:
            _replicate_stage2(3, os.environ.get(
                "SPARK_GRAFT_X300_DIR", "/tmp/sfx300"))
        else:
            _replicate(n)
    elif stage == "embeddings1000":
        _replicate_embeddings_1000()
    elif stage == "autoplanes":
        _autoplanes()
    else:
        _run(sys.argv[2:] if stage == "run" else sys.argv[1:])


if __name__ == "__main__":
    main()
