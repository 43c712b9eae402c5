"""bench.py contract pins — no SparkSession needed.

bench.main() silently skips a suite name that is missing from the
registry (per-query failure isolation must not abort the run), which
means a renamed registry query would silently drop out of the suite
and the headline total would read as a phantom speedup. Pin every
suite name to the registry here so the rename fails in CI instead.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import bench
import __spark_entry__ as entry_mod


def test_every_bench_suite_name_resolves_in_registry():
    registry = entry_mod.queries()
    missing = [n for n in bench.HEADLINE if n not in registry]
    missing += [n for n in bench.EXT_HEADLINE if n not in registry]
    assert not missing, f"bench suite names not in registry: {missing}"


def test_suites_do_not_overlap_and_headline_is_r1_comparable():
    """The headline set must stay the r1 set (cross-round comparability
    is the whole point of the anchor guard); ext must not double-time a
    headline query."""
    assert len(bench.HEADLINE) == 11
    assert not set(bench.HEADLINE) & set(bench.EXT_HEADLINE)


def test_every_oracle_key_has_a_query():
    """oracle_sql() may be a subset of queries() (rows-only checks) but
    never a superset — an orphan oracle is a typo'd key the driver
    would never exercise."""
    qs = set(entry_mod.queries())
    orphans = set(entry_mod.oracle_sql()) - qs
    assert not orphans, f"oracles without a query: {sorted(orphans)}"
