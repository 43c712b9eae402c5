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

Ordering rule: a query's freshness is the LATEST round in which any
``CORRECTNESS_r*.json`` contains a row for it; ties (same round) keep
that round's file order, which is the window order the driver actually
ran.  ``--front`` pins queries that must jump the queue (e.g. a plan
changed after the last driver row) ahead of the oldest-first body;
fronted queries are removed from the body so the window never
double-counts a slot.
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
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        if upto is not None and rnd > upto:
            continue
        with open(path) as fh:
            rows = json.load(fh)
        for pos, name in enumerate(rows):
            latest[name] = (rnd, pos)  # later files overwrite: latest wins
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


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--window", type=int, default=0,
                    help="emit a Python window literal of this size")
    ap.add_argument("--front", default="",
                    help="comma-separated queries pinned to the window head")
    ap.add_argument("--upto", type=int, default=None,
                    help="only consider CORRECTNESS files up to this round")
    args = ap.parse_args()

    order = oldest_first(upto=args.upto)
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
