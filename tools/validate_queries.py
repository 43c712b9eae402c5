"""Tri-scale oracle validation for registry queries (the r5 rule:
every NEW query is validated at sf0.001 / sf0.01 / sf0.1 under a
hostile session timezone, from OUTSIDE the repo, before it merges
into the driver registry).

Usage:
    cd /tmp && TZ=Asia/Seoul python /root/repo/tools/validate_queries.py q1 q2 ...
    # no args = the full registry (slow)
    # SCALES=sf0.01 restricts the sweep

Prints one line per (query, scale) and a final JSON summary; exit 1 on
any failure. Reuses tests/oracle.py — the same tightened compare gate
(exact float equality, NULL≠0.0) the pytest tier uses.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from __spark_entry__ import oracle_sql, queries  # noqa: E402
from tests.oracle import compare, duckdb_conn, run_oracle  # noqa: E402


def main() -> int:
    names = sys.argv[1:] or list(queries().keys())
    scales = os.environ.get("SCALES", "sf0.001,sf0.01,sf0.1").split(",")
    qs, oracles = queries(), oracle_sql()
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    from streaming_data_spark.session import get_session

    spark = get_session("validate-queries")
    results: dict[str, dict[str, str]] = {}
    failed = 0
    for scale in scales:
        sf_dir = f"/root/testdata/{scale}"
        con = duckdb_conn(sf_dir)
        for name in names:
            t0 = time.time()
            try:
                got = qs[name](spark, sf_dir)
                if name in oracles:
                    want = run_oracle(con, oracles[name], name=name)
                    compare(got, want, name=f"{name}@{scale}")
                    status = "ok"
                else:
                    n = got.count()
                    status = f"rows-only:{n}"
            except Exception:
                status = "FAIL"
                failed += 1
                traceback.print_exc()
            dt = time.time() - t0
            print(f"{name}@{scale}: {status} ({dt:.2f}s)", flush=True)
            results.setdefault(name, {})[scale] = status
        con.close()
    print(json.dumps({"failed": failed, "results": results}))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
