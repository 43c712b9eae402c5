"""Driver-window freshness generator (r8 verdict item 7).

The grading driver oracle-checks the FIRST 50 entries of
``__spark_entry__.queries()`` each round, so the window literal in
``__spark_entry__.py`` is the rotation that keeps every registry
query's driver row fresh.  Until r9 that literal was hand-ordered each
round — the one remaining way the oldest-first invariant could be
silently violated.  This tool derives it mechanically:

  python tools/freshness.py                  # staleness report
  python tools/freshness.py --window 50 \
      --front x41_canonical_by_quality,...   # emit the window literal
  python tools/freshness.py --window 50 --front auto   # r10+

Ordering rule: a query's freshness is the LATEST round in which any
``CORRECTNESS_r*.json`` contains a row for it; ties (same round) keep
that round's file order, which is the window order the driver actually
ran.  ``--front`` pins queries that must jump the queue (a plan
changed after the last driver row) ahead of the oldest-first body;
fronted queries are removed from the body so the window never
double-counts a slot.  ``--front auto`` (r9 verdict item 2) derives
that list mechanically by diffing the per-round plan fingerprints in
``PLAN_FPS_r*.json`` (see tools/plan_fps.py) — the last human input
to the rotation.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def latest_rows(repo: str = HERE, upto: int | None = None) -> dict[str, tuple[int, int]]:
    """query -> (latest round with a driver row, position in that round's file).

    ``upto`` ignores rounds after it — lets a test pin "the r9 window
    is what this tool emits from r1..r8 data" without breaking when
    the r9 CORRECTNESS file lands.
    """
    latest: dict[str, tuple[int, int]] = {}
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        if upto is not None and rnd > upto:
            continue
        with open(path) as fh:
            rows = json.load(fh)
        for pos, name in enumerate(rows):
            # Keep the NUMERICALLY latest round — file sort order is
            # not trustworthy (an unpadded "r10" sorts before "r2").
            if name not in latest or (rnd, pos) >= latest[name]:
                latest[name] = (rnd, pos)
    return latest


def registry_names() -> list[str]:
    sys.path.insert(0, HERE)
    import __spark_entry__ as entry_mod

    return list(entry_mod.queries())


def oldest_first(repo: str = HERE, upto: int | None = None) -> list[tuple[str, int]]:
    """All registry queries, stalest first: (name, latest_round)."""
    latest = latest_rows(repo, upto)
    names = registry_names()
    # Never-checked queries sort before everything (round 0).
    keyed = [(latest.get(n, (0, 0)), n) for n in names]
    keyed.sort(key=lambda t: (t[0][0], t[0][1]))
    return [(n, k[0]) for k, n in keyed]


def plan_fp_rounds(repo: str = HERE, upto: int | None = None) -> dict[int, dict]:
    """round -> {query -> fingerprint record} from PLAN_FPS_r*.json
    (written by tools/plan_fps.py against each round-close code
    state; r4-r8 were backfilled from git worktrees in r10)."""
    return {rnd: payload["queries"]
            for rnd, payload in _plan_fp_payloads(repo, upto).items()}


def _plan_fp_payloads(repo: str = HERE, upto: int | None = None
                      ) -> dict[int, dict]:
    out: dict[int, dict] = {}
    for path in glob.glob(os.path.join(repo, "PLAN_FPS_r*.json")):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        if upto is not None and rnd > upto:
            continue
        with open(path) as fh:
            out[rnd] = json.load(fh)
    return out


def auto_front(repo: str = HERE, upto: int | None = None
               ) -> tuple[list[str], list[str]]:
    """Mechanical `--front` (r9 verdict item 2): queries whose plan
    fingerprint at the CURRENT code state (the newest PLAN_FPS round
    <= ``upto``) differs from their fingerprint at the round of their
    last driver row. Those rows were green against a plan that no
    longer exists, so they jump the queue.

    Returns ``(front, uncomparable)``. ``front`` is in staleness
    order (the same order the window body uses). ``uncomparable``
    lists stale-round queries that could not be diffed — missing
    snapshot/entry, build error, or an unstable fingerprint in either
    round — which need the old human judgment; the pytest pins this
    list so it can only shrink deliberately.
    """
    payloads = _plan_fp_payloads(repo, upto)
    fps = {rnd: p["queries"] for rnd, p in payloads.items()}
    if not fps:
        raise SystemExit("no PLAN_FPS_r*.json snapshots found — run "
                         "tools/plan_fps.py first")
    cur_round = max(fps)
    cur = fps[cur_round]
    # Engine-identity guard (r10 advice): a pyspark upgrade between
    # rounds changes analyzed-plan strings wholesale — a cross-version
    # fp diff would front swaths of the registry and attribute it to
    # "query code changed". Warn loudly; the diffs still run (the
    # operator must then judge the fronts by hand).
    def _engine(rnd: int):
        return payloads.get(rnd, {}).get("_meta", {}).get("engine")

    cur_engine = _engine(cur_round)
    if cur_engine is not None:
        # only rounds some stale query actually diffs against — a
        # mismatched snapshot nothing maps to cannot mis-front anyone
        used = {rnd for _, rnd in oldest_first(repo, upto)
                if rnd < cur_round and rnd in fps}
        mismatched = sorted(
            rnd for rnd in used
            if _engine(rnd) is not None and _engine(rnd) != cur_engine
        )
        if mismatched:
            print(
                f"# WARNING: PLAN_FPS_r{cur_round} was taken under engine "
                f"{cur_engine} but rounds {mismatched} were not — "
                "fingerprint diffs against those rounds may reflect the "
                "engine upgrade, not query-code changes; judge any "
                "resulting fronts by hand", file=sys.stderr)
    latest = latest_rows(repo, upto)
    front: list[str] = []
    uncomparable: list[str] = []
    for name, rnd in oldest_first(repo, upto):
        if rnd >= cur_round:
            continue  # driver row already postdates the current code
        if rnd == 0:
            # Never driver-checked (newly wired, e.g. the r14 EXT65
            # wiring): there is no prior driver row for a plan change
            # to invalidate, and round-0 staleness already puts the
            # query at the head of the window body — no diff needed,
            # and no human judgment either.
            continue
        then = fps.get(rnd, {}).get(name)
        now = cur.get(name)
        if (not then or not now or "err" in then or "err" in now
                or not then.get("stable") or not now.get("stable")):
            uncomparable.append(name)
            continue
        if then["fp"] != now["fp"]:
            front.append(name)
    return front, uncomparable


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--window", type=int, default=0,
                    help="emit a Python window literal of this size")
    ap.add_argument("--front", default="",
                    help="comma-separated queries pinned to the window "
                         "head, or 'auto' to diff PLAN_FPS_r*.json "
                         "fingerprints against each query's last "
                         "driver-checked round")
    ap.add_argument("--upto", type=int, default=None,
                    help="only consider CORRECTNESS files up to this round")
    args = ap.parse_args()

    order = oldest_first(upto=args.upto)
    if args.front == "auto":
        front, uncomparable = auto_front(upto=args.upto)
        print(f"# auto-front: {front}", file=sys.stderr)
        if uncomparable:
            print(f"# NOT auto-comparable (human judgment still "
                  f"required): {uncomparable}", file=sys.stderr)
    else:
        front = [q for q in args.front.split(",") if q]
    known = {n for n, _ in order}
    unknown = [q for q in front if q not in known]
    if unknown:
        raise SystemExit(f"--front names not in registry: {unknown}")

    if not args.window:
        by_round: dict[int, int] = {}
        for _, rnd in order:
            by_round[rnd] = by_round.get(rnd, 0) + 1
        print("staleness (latest driver round -> #queries):",
              dict(sorted(by_round.items())))
        for name, rnd in order[:60]:
            print(f"  r{rnd}  {name}")
        return

    if len(front) > args.window:
        raise SystemExit(
            f"--front has {len(front)} queries but --window is only "
            f"{args.window}: a negative body slice would silently emit "
            "a wrong-sized window — shrink the front or grow the window")
    body = [n for n, _ in order if n not in front]
    window = front + body[: args.window - len(front)]
    tail = body[args.window - len(front):][: args.window]
    print("_WINDOW = [")
    for name in window:
        print(f'    "{name}",')
    print("]")
    print("_TAIL = [")
    for name in tail:
        print(f'    "{name}",')
    print("]")


if __name__ == "__main__":
    main()
