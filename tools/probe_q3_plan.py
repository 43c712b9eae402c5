"""Diagnose the q3/q5 x100 second-decade bend seen in the r13 x100
probe: per-decade wall grew ~2x in per-row terms on the 10x->100x
segment. Hypotheses: (a) a join-strategy TRANSITION (the orders side
fits the 10 MB broadcast threshold at 1x/10x but not at 100x, so the
plan flips broadcast-hash -> sort-merge and pays a 60M-row sort), or
(b) fixed 32 shuffle partitions binding at 60M rows.

Prints, per scale: the physical join node names and the min-of-2 wall
at the session default partitions AND (x100 only) at 4x partitions —
if (b) were the cause, 4x partitions would move the wall; if (a), the
node list flips between scales and the wall tracks the strategy.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from streaming_data_spark.session import get_session  # noqa: E402
import __spark_entry__ as entry  # noqa: E402

SCALES = (("sf0.1", "/root/testdata/sf0.1"), ("x10", "/tmp/sfx10"),
          ("x100", "/tmp/sfx100"))
JOIN_RE = re.compile(
    r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
    r"BroadcastNestedLoopJoin|CartesianProduct)")


def main() -> None:
    name = sys.argv[1] if len(sys.argv) > 1 else "q3_shipping_priority"
    spark = get_session(app_name="probe-q3-plan",
                        shuffle_partitions=int(os.environ.get(
                            "SPARK_GRAFT_CPUS", "32")))
    fn = entry.queries()[name]
    report: dict[str, dict] = {}
    for label, d in SCALES:
        if not os.path.isdir(d):
            continue
        df = fn(spark, d)
        # Final AQE-decided plan requires execution; read the initial
        # plan's strategies (cost-model decision) from explain.
        plan = df._jdf.queryExecution().executedPlan().toString()
        joins = JOIN_RE.findall(plan)
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        report[label] = {"joins": joins, "sec": round(best, 3)}
        print(label, report[label], file=sys.stderr)
    # Partition-count sensitivity at x100 only.
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(int(old) * 4))
    try:
        df = fn(spark, "/tmp/sfx100")
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        report["x100_4xparts"] = {"sec": round(best, 3)}
        print("x100_4xparts", report["x100_4xparts"], file=sys.stderr)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    print(json.dumps({"probe": f"{name}_plan_transition", "scales": report}))
    spark.stop()


if __name__ == "__main__":
    main()
