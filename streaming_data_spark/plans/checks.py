"""Executed-plan introspection helpers (text-level, version-tolerant)."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The .explain() text without printing to stdout."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every file scan in the plan."""
    text = explain_str(df)
    out: list[str] = []
    for match in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        entry = match.group(1).strip()
        if entry:
            out.extend(p.strip() for p in entry.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each file scan (ReadSchema)."""
    text = explain_str(df)
    schemas: list[list[str]] = []
    for match in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        body = match.group(1)
        cols = [part.split(":")[0].strip() for part in body.split(",") if ":" in part]
        schemas.append(cols)
    return schemas


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def broadcast_hint_count(df: DataFrame) -> int:
    """Number of explicit broadcast HINTS (F.broadcast / /*+ BROADCAST */)
    in the analyzed logical plan. Distinct from has_broadcast_join: a
    hint-free plan may still broadcast adaptively when the runtime size
    fits — that's healthy; a hint FORCES the broadcast regardless of
    size, which on a corpus-proportional side is an OOM cliff at 100x."""
    text = explain_str(df, mode="extended")
    return len(re.findall(r"ResolvedHint \(strategy=broadcast", text))


def has_whole_stage_codegen(df: DataFrame) -> bool:
    """Whether the FINAL plan runs inside whole-stage codegen.

    With AQE on, codegen stages only materialize once the adaptive
    plan finalizes — so this EXECUTES the plan (test-sized inputs
    only) and then reads the '*(n)' markers."""
    df.foreach(lambda _: None)  # execute via df's own QueryExecution
    return bool(re.search(r"\*\(\d+\)", explain_str(df, mode="simple")))


def global_window_count(df: DataFrame) -> int:
    """Number of Window operators with NO partition spec — each one
    funnels its whole input through a single task (the WindowExec
    "No Partition Defined" warning). Benign on aggregate-sized inputs,
    fatal on a fact table; the sanctioned-sites test pins which
    registry queries may carry one. Text-level: the node renders
    `Window [exprs], [partition?], [ordering?]` with EMPTY specs
    omitted, so one trailing group that is an ORDER spec (top-level
    ASC/DESC markers) — or no trailing group at all — means the
    partition spec is empty. A lone partition group (window with no
    ordering, e.g. a per-key running avg) is NOT global."""
    text = explain_str(df, mode="simple")
    n = 0
    for line in text.splitlines():
        if not re.search(r"\bWindow \[", line):
            continue
        seps = line.count("], [")
        if seps == 0:
            n += 1  # `Window [exprs]` — neither partition nor order
        elif seps == 1:
            last = line.rsplit("], [", 1)[1]
            if re.search(r"\b(ASC|DESC) NULLS", last):
                n += 1  # the only spec group is an ordering
    return n


def shuffle_count(df: DataFrame) -> int:
    """Number of Exchange operators in the physical plan (each is a
    full shuffle of its input at scale — the thing to minimize).
    Broadcast exchanges don't count — they ship only the small side."""
    text = explain_str(df, mode="simple")
    return len(re.findall(r"\bExchange (?:hashpartitioning|rangepartitioning|SinglePartition|RoundRobinPartitioning)", text))
