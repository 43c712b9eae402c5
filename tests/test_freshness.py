"""The driver-window rotation is generated, not hand-ordered (r8
verdict item 7): ``tools/freshness.py`` derives the oldest-first
order from the CORRECTNESS_r*.json history, and the literal pasted
into ``__spark_entry__.py`` must be exactly what the generator emits.
No SparkSession needed — this is pure bookkeeping."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import __spark_entry__ as entry_mod
from freshness import latest_rows, oldest_first

# The five shared-pair-tier consumers whose plans changed in r8 after
# their last driver rows — the r8 verdict pins them to the r9 head.
R9_FRONT = [
    "x41_canonical_by_quality",
    "x70_kcore",
    "x92_dup_clustering_coeff",
    "x96_adamic_adar",
    "x97_degree_assortativity",
]


def test_r9_window_is_generator_output_from_r8_data():
    """_R9_WINDOW == front + oldest-first body computed from r1..r8
    driver history; _R9_TAIL is the next block of that same order."""
    order = [n for n, _ in oldest_first(upto=8)]
    body = [n for n in order if n not in R9_FRONT]
    expect_window = R9_FRONT + body[: 50 - len(R9_FRONT)]
    assert entry_mod._R9_WINDOW == expect_window
    n_body = 50 - len(R9_FRONT)
    assert entry_mod._R9_TAIL == body[n_body : n_body + len(entry_mod._R9_TAIL)]


def test_window_covers_registry_and_leads_queries():
    """Window/tail names are real registry queries, the window is the
    driver-checked size (50), and queries() iteration order leads with
    the window (the driver checks the FIRST 50 entries)."""
    names = list(entry_mod.queries())
    assert len(entry_mod._R9_WINDOW) == 50
    assert names[:50] == entry_mod._R9_WINDOW
    assert set(entry_mod._R9_TAIL) <= set(names)
    assert len(set(entry_mod._R9_WINDOW)) == 50  # no double-counted slots


def test_staleness_accounting_matches_registry():
    """Every registry query has a driver row by r8 (the r8 verdict's
    cumulative-green claim) and the per-round staleness histogram is
    internally consistent."""
    latest = latest_rows(upto=8)
    names = set(entry_mod.queries())
    assert names <= set(latest), sorted(names - set(latest))
    rounds = [latest[n][0] for n in names]
    assert len(rounds) == 221
    assert min(rounds) >= 4  # nothing older than r4 entering r9
