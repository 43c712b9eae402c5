"""Per-query plan fingerprints (r9 verdict item 2).

The driver-window rotation fronts queries whose PHYSICAL BEHAVIOUR
changed after their last driver row. Until r10 that judgment was made
by hand each round ("which operators did this round's commits touch,
and who consumes them?") — the one remaining human input to the
otherwise-generated rotation. This tool makes it mechanical:

  python tools/plan_fps.py --repo <code tree> --round N \
      --out PLAN_FPS_rNN.json

builds every registry query at sf0.001 and records, per query,

  - ``plan_sha``: sha256 of the ANALYZED logical plan string with
    expression ids normalized (``#123`` -> ``#``) — exprId allocation
    order is session-dependent, everything else in the analyzed plan
    is deterministic for this engine (all rand()/shuffle sites are
    seeded; the one uuid() helper is not used by any registry query);
  - ``jobs``: the number of Spark jobs the query CONSTRUCTION runs
    (job-group counted). Most queries are fully lazy (0); the
    iterative/collect-driven ones (connected components, k-means
    centroids, hot-key detection, memoized pair builds) do driver-side
    work whose shape an analyzed-plan hash alone cannot see — r9's
    star-contraction count-carry changed ONLY this (one fewer count
    job per CC round; the returned plan is identical), which is
    exactly the class of change that must still front a query.

``fp = "<plan_sha[:16]>:j<jobs>"``. Each query is built ``--reps``
times (default 3) in-session and the MAJORITY observation wins: the
heaviest iterative builds (x41: 40+ jobs) sporadically read one
phantom extra job even on a quiet box (scheduler artifact measured in
r10 — 7 consecutive quiet reps dead-stable, then a lone +1 in a later
session), and a single phantom must not veto comparability. No
majority -> ``stable: false`` and `freshness.py --front auto` excludes
the query from diffing (an unstable fingerprint can only produce false
fronts); all distinct observations are recorded under ``observed``.
The shared prefix-pair memo is cleared before every build so ``jobs``
is order-independent (same reasoning as bench.py's shared_pair_build
line).

Historical backfill: the tool takes ``--repo`` so it can run against a
git worktree of a past round-close commit (the code state that round's
driver actually checked) — `PLAN_FPS_r04..r09.json` were produced that
way in r10. The session config is PINNED HERE, identical for every
round, so fingerprint diffs can only come from query code, never from
session.py drift between rounds.

PROTOCOL: run ONE instance at a time on a quiet box. Measured in r10:
six concurrent instances produced phantom +1/-1 job counts on the
heavy iterative queries (x41 read 44-45 under contention vs a
dead-stable 43 across 7 quiet reps) — scheduler contention, not query
nondeterminism. Sequential quiet runs are reproducible to the job.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import re
import sys
from collections import Counter

_EXPR_ID = re.compile(r"#\d+")
# Higher-order-function lambda variables carry a globally-incrementing
# allocation counter ("lambda x_12#L" one build, "lambda x_19#L" the
# next) — same session-dependence as exprIds, same normalization.
_LAMBDA_ID = re.compile(r"\blambda ([A-Za-z]+)_\d+#")


def normalize_plan(plan: str) -> str:
    """Strip session-dependent expression ids from an analyzed-plan
    string. Everything else is deterministic for this repo's queries
    (seeded rand, fixed paths, seeded samples)."""
    return _EXPR_ID.sub("#", _LAMBDA_ID.sub(r"lambda \1_#", plan))


def fingerprint(plan_sha: str, jobs: int) -> str:
    return f"{plan_sha[:16]}:j{jobs}"


def _pinned_session(cpus: int):
    """One fixed config for every fingerprint run, past or present —
    NOT the repo's get_session (session.py may drift between rounds;
    fingerprints must only see query-code changes)."""
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.appName("plan-fps")
        .master(f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", "16g")
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def _clear_memos() -> None:
    """Reset the shared pair memo (the repo's only module-level memo)
    so every build pays its own jobs — order-independence, same as
    bench.py. Tolerates its absence (pre-r8 code has no memo)."""
    mod = sys.modules.get("streaming_data_spark.operators.dedup")
    cache = getattr(mod, "_PREFIX_PAIR_CACHE", None)
    if isinstance(cache, dict):
        cache.clear()


def compute(repo: str, sf_dir: str, reps: int, cpus: int,
            only: set[str] | None = None) -> dict:
    sys.path.insert(0, repo)
    import __spark_entry__ as entry_mod

    spark = _pinned_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    tracker = spark.sparkContext.statusTracker()
    registry = entry_mod.queries()

    out: dict[str, dict] = {}
    for name, fn in registry.items():
        if only is not None and name not in only:
            continue
        seen: list[tuple[str, int]] = []
        err = None
        # rep -1 is a discarded warm-up: the FIRST build of a query in
        # a session can pay one extra job (cold file-listing / parquet
        # footer read) that no later build repeats — measuring it would
        # mark every cold query "unstable".
        for rep in range(-1, reps):
            _clear_memos()
            group = f"fp-{name}-{rep}"
            spark.sparkContext.setJobGroup(group, f"plan_fps {name}")
            try:
                df = fn(spark, sf_dir)
                plan = df._jdf.queryExecution().analyzed().toString()
                sha = hashlib.sha256(
                    normalize_plan(plan).encode()
                ).hexdigest()
                jobs = len(tracker.getJobIdsForGroup(group))
                if rep >= 0:
                    seen.append((sha, jobs))
            except Exception as exc:  # noqa: BLE001 — record, continue
                err = f"{type(exc).__name__}: {exc}"[:300]
                break
        if err is not None:
            out[name] = {"err": err}
        else:
            counts = Counter(seen)
            (sha, jobs), votes = counts.most_common(1)[0]
            rec = {
                "fp": fingerprint(sha, jobs),
                "plan_sha": sha,
                "jobs": jobs,
                # majority-of-reps: one phantom job can't veto
                # comparability, a genuine flip-flop still does
                "stable": votes > len(seen) // 2,
            }
            if len(counts) > 1:
                rec["observed"] = sorted(
                    f"{s[:8]}:j{j}" for s, j in counts
                )
            out[name] = rec
    spark.stop()
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--repo", default=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))),
        help="code tree to import __spark_entry__ from (a git worktree "
             "of a round-close commit for historical backfill)")
    ap.add_argument("--round", type=int, required=True,
                    help="round number this code state closed")
    ap.add_argument("--out", required=True)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--only", default="",
                    help="comma-separated query names (debug)")
    args = ap.parse_args()

    only = {q for q in args.only.split(",") if q} or None
    queries = compute(args.repo, args.sf_dir, args.reps, args.cpus, only)
    payload = {
        "_meta": {
            "round": args.round,
            "repo": args.repo,
            "sf_dir": args.sf_dir,
            "reps": args.reps,
            "cpus": args.cpus,
            "n_queries": len(queries),
            "n_unstable": sum(
                1 for v in queries.values() if v.get("stable") is False
            ),
            "n_err": sum(1 for v in queries.values() if "err" in v),
        },
        "queries": queries,
    }
    with open(args.out, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps(payload["_meta"]))


if __name__ == "__main__":
    main()
