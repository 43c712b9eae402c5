"""Sectioned x30 attribution of x41_canonical_by_quality (r11 verdict
item 3): the heaviest remaining query in the x30 probe (52.9 s at
x30, overall ratio 6.05, top segment 2.66x per 3x data). x42 and x13
were sectioned the same way in r11 and the sectioning found the
edge-replay bug; this asks the same question of x41's three stages —
is any of them superlinear once the OTHERS are materialized away?

Sections (each timed over eagerly-materialized inputs, so a section's
number is ITS cost alone, never a replay of its upstream):

  pair_build        — the shared prefix-filtered pair tier on a
                      cleared memo (identical protocol to bench.py's
                      shared_pair_build line),
  star_cc           — connected_components_star over the ALREADY
                      materialized pair set (built untimed first),
  quality_canonical — quality scoring + left join + per-cluster
                      window over a materialized component table,
  full_query        — the registry query end-to-end (cleared memo),
                      for cross-checking section sums.

PROTOCOL — one PROCESS per (scale, section, rep), min across reps:
a first same-session sweep showed ±50% order-dependence at x30 (the
pair section read 58.7 s in a session that had just run the x10
block, 36.1 s fresh; the full query read 38.9 s after three sections
had checkpointed their inputs, 57.2 s fresh) — accumulated
localCheckpoint blocks + grown-heap GC make in-session numbers
measure the session history, not the section. Subprocess isolation
makes every rep a cold, identical JVM; timing starts after the
session is up, so startup is excluded.

Uses the SAME x10/x30 replicas as tools/scale_probe_30x.py (run its
``replicate`` stage first).

    python tools/section_probe_x41.py                # orchestrate all
    python tools/section_probe_x41.py one x30 pair_build   # one rep

Orchestrator prints one JSON line: per-scale section times and
x10->x30 segment ratios.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
X10 = os.environ.get("SPARK_GRAFT_X10_DIR", "/tmp/sfx10")
X30 = os.environ.get("SPARK_GRAFT_X30_DIR", "/tmp/sfx30")
SCALES = {"sf0.1": SRC, "x10": X10, "x30": X30}
SECTIONS = ["pair_build", "star_cc", "quality_canonical", "full_query"]
REPS = 2


def run_one(label: str, section: str) -> None:
    """One cold-JVM rep: set up untimed inputs, time the section,
    print the seconds as the last stdout line."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from streaming_data_spark.operators import dedup, text
    from streaming_data_spark.queries import _t
    from streaming_data_spark.session import get_session
    import __spark_entry__ as entry

    d = SCALES[label]
    spark = get_session(
        app_name=f"section-x41-{label}-{section}",
        # shuffle partitions: session default (4x cores, AQE coalesces)
        # unless SPARK_GRAFT_SHUFFLE_PARTITIONS pins it via autosize.
    )
    docs = _t(spark, d, "documents")

    def build_pairs():
        return dedup.ngram_jaccard_pairs_prefix_shared(
            docs, "doc_id", "text", n=3, threshold=0.8, cache_token=d
        )  # memoized form eagerly localCheckpoints — this IS the build

    if section == "pair_build":
        t0 = time.time()
        build_pairs()
        dt = time.time() - t0
    elif section == "star_cc":
        pairs = build_pairs()  # untimed upstream, materialized
        t0 = time.time()
        dedup.connected_components_star(pairs, "id_a", "id_b").write.format(
            "noop"
        ).mode("overwrite").save()
        dt = time.time() - t0
    elif section == "quality_canonical":
        pairs = build_pairs()
        comps_m = (
            dedup.connected_components_star(pairs, "id_a", "id_b")
            .withColumnRenamed("id", "doc_id")
            .localCheckpoint(eager=True)
        )  # untimed upstream, materialized
        t0 = time.time()
        scored = docs.select(
            "doc_id", F.round(text.quality_score("text"), 6).alias("quality")
        )
        labeled = scored.join(comps_m, "doc_id", "left").withColumn(
            "cluster_id", F.coalesce("cluster_id", F.col("doc_id"))
        )
        w = Window.partitionBy("cluster_id").orderBy(
            F.col("quality").desc(), F.col("doc_id").asc()
        )
        labeled.withColumn("keep", F.row_number().over(w) == 1).select(
            "doc_id", "cluster_id", "quality", "keep"
        ).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
    elif section == "full_query":
        fn = entry.queries()["x41_canonical_by_quality"]
        t0 = time.time()
        fn(spark, d).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
    else:  # pragma: no cover
        raise SystemExit(f"unknown section {section}")
    print(round(dt, 3))
    spark.stop()


def main() -> None:
    if len(sys.argv) >= 2 and sys.argv[1] == "one":
        run_one(sys.argv[2], sys.argv[3])
        return

    want = sys.argv[1:] or list(SCALES)
    here = os.path.abspath(__file__)
    result: dict[str, dict[str, float]] = {}
    for label in want:
        if not os.path.isdir(SCALES[label]):
            print(f"{label} dir {SCALES[label]} missing — run "
                  "scale_probe_30x.py replicate first", file=sys.stderr)
            continue
        sec: dict[str, float] = {}
        for section in SECTIONS:
            best = float("inf")
            for _ in range(REPS):
                out = subprocess.run(
                    [sys.executable, here, "one", label, section],
                    capture_output=True, text=True, check=True,
                )
                best = min(best, float(out.stdout.strip().splitlines()[-1]))
            sec[section] = best
        sec["section_sum"] = round(
            sec["pair_build"] + sec["star_cc"] + sec["quality_canonical"], 3
        )
        result[label] = sec
        print(label, sec, file=sys.stderr)

    if "x10" in result and "x30" in result:
        result["segment_ratio_x10_to_x30"] = {
            s: round(result["x30"][s] / result["x10"][s], 2)
            for s in SECTIONS
            if result["x10"].get(s)
        }
    print(json.dumps({"probe": "x41_sections", "scales": result}))


if __name__ == "__main__":
    main()
