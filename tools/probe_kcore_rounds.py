"""k-core round-decay probe (r13 verdict item 6).

x70_kcore was the r13 x100 sweep's only near-linear row (seg_x100
9.12 vs linear = 10). This probe separates the two components of that
number at each scale and measures the quantity the round-bound
argument rests on — the per-round surviving-edge counts:

  - build_sec: the shared prefix pair build (memo cleared first), the
    part x70 shares with the whole near-dup tier (its own x100 seg is
    4.78, measured in r13);
  - per round r: |E_r| (edges surviving round r) and the round's wall
    — each round is one degree groupBy + two semi-joins on a graph
    that only SHRINKS, localCheckpoint-truncated, so round cost is
    proportional to |E_{r-1}| and total peel cost is bounded by
    (rounds+1) x |E_0| edge-traversals regardless of scale;
  - peel_sec: the four rounds + final degree emit, timed end-to-end.

x1000 is intentionally NOT probed: the x1000 replica fans documents
to 5M and the pair build there is the known quadratic-pressure trap
(see memory/SCALE.md Round-13); the round-bound argument plus the
measured decay curve is the scale story — peel cost is a small
bounded multiple of the edge volume, and the edge volume's own
scaling is the near-dup tier's (sublinear, bucketed).

Usage (quiet box, one process):
    python tools/probe_kcore_rounds.py
Prints one JSON line:
  {"probe": "kcore_rounds", "scales": {label: {"build_sec": ...,
   "edges_round0": N, "rounds": [{"edges": N, "sec": s}, ...],
   "peel_sec": ..., "survivors": N}}}
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
X10 = os.environ.get("SPARK_GRAFT_X10_DIR", "/tmp/sfx10")
X100 = os.environ.get("SPARK_GRAFT_X100_DIR", "/tmp/sfx100")
SCALES = (("sf0.1", SRC), ("x10", X10), ("x100", X100))

K = 2
ROUNDS = 4


def main() -> None:
    from streaming_data_spark.operators import dedup
    from streaming_data_spark.queries import _t
    from streaming_data_spark.session import (
        autosize_shuffle_partitions,
        get_session,
    )

    spark = get_session(app_name="probe-kcore-rounds")
    spark.sparkContext.setLogLevel("ERROR")
    report: dict[str, dict] = {}
    for label, d in SCALES:
        if not os.path.isdir(d):
            continue
        autosize_shuffle_partitions(spark, d)
        dedup._PREFIX_PAIR_CACHE.clear()
        docs = _t(spark, d, "documents")
        t0 = time.time()
        pairs = dedup.ngram_jaccard_pairs_prefix_shared(
            docs, "doc_id", "text", n=3, threshold=0.8, cache_token=d
        )
        build_sec = round(time.time() - t0, 3)

        # The peel, instrumented per round — same ops as
        # graph.kcore_peel (kept in lockstep by the survivors
        # cross-check below), with a count per round.
        t0 = time.time()
        e = (
            pairs.filter(F.col("id_a") != F.col("id_b"))
            .select(
                F.least("id_a", "id_b").alias("a"),
                F.greatest("id_a", "id_b").alias("b"),
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        rounds_out = []
        n0 = e.count()
        for _ in range(ROUNDS):
            r0 = time.time()
            sym = e.select(F.col("a").alias("id")).union(
                e.select(F.col("b").alias("id"))
            )
            deg = sym.groupBy("id").agg(F.count(F.lit(1)).alias("deg"))
            survivors = deg.filter(F.col("deg") >= K).select("id")
            e = (
                e.join(
                    survivors.withColumnRenamed("id", "a"), "a", "left_semi"
                )
                .join(
                    survivors.withColumnRenamed("id", "b"), "b", "left_semi"
                )
                .select("a", "b")
                .localCheckpoint(eager=True)
            )
            rounds_out.append(
                {"edges": e.count(), "sec": round(time.time() - r0, 3)}
            )
        sym = e.select(F.col("a").alias("id")).union(
            e.select(F.col("b").alias("id"))
        )
        n_surv = sym.groupBy("id").agg(
            F.count(F.lit(1)).alias("degree")
        ).count()
        peel_sec = round(time.time() - t0, 3)

        # Cross-check against the real operator so the instrumented
        # copy can never drift from what x70_kcore ships.
        from streaming_data_spark.operators import graph

        assert graph.kcore_peel(pairs, k=K, rounds=ROUNDS).count() == n_surv

        report[label] = {
            "build_sec": build_sec,
            "edges_round0": n0,
            "rounds": rounds_out,
            "peel_sec": peel_sec,
            "survivors": n_surv,
        }
        print(label, report[label], file=sys.stderr)
    print(json.dumps({"probe": "kcore_rounds", "k": K,
                      "n_rounds": ROUNDS, "scales": report}))
    spark.stop()


if __name__ == "__main__":
    main()
