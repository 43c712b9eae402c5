"""[EXT] Declarative data-quality audit (constraint validation).

The reference enforces constraints server-side — PRIMARY KEY /
composite-PK / FK DDL at upbit_data_pipeline.py:25-31,68-93 and
insert_csv_to_postgres.py:30-42 — and monitors failures after the
fact (monitor_errors.py). Spark tables enforce nothing, so a 100 TB
training pipeline needs the audit as an explicit operator: evaluate a
rule set against a DataFrame and emit one row per rule with violation
counts, CI-gateable.

Scale design: every ROW-LOCAL rule (not_null / in_range / in_set /
matches) compiles into ONE aggregation pass — a single scan, one
conditional sum per rule, no shuffle beyond the 1-row final agg.
Uniqueness rides the same pass as count(*) - count(distinct struct),
and referential integrity is a broadcast anti-join count against the
dimension (dims are broadcast-sized by definition; a fact-sized FK
target would use the same code path with the broadcast hint dropped).
The result is rule-count rows — driver-sized by construction.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One audit rule. ``kind`` ∈ not_null | in_range | in_set |
    matches | unique | ref_integrity."""

    name: str
    kind: str
    col: str = ""
    cols: Sequence[str] = field(default_factory=tuple)
    lo: Optional[float] = None
    hi: Optional[float] = None
    values: Sequence[str] = field(default_factory=tuple)
    pattern: str = ""
    ref: Optional[DataFrame] = None
    ref_col: str = ""


def _violation(rule: Rule) -> Column:
    """Row-local violation predicate (NULL-safe: a NULL never passes a
    value rule — not_null is the rule that tolerates nothing)."""
    c = F.col(rule.col)
    if rule.kind == "not_null":
        return c.isNull()
    if rule.kind == "in_range":
        ok = c.isNotNull()
        if rule.lo is not None:
            ok = ok & (c >= rule.lo)
        if rule.hi is not None:
            ok = ok & (c <= rule.hi)
        return ~ok
    if rule.kind == "in_set":
        return c.isNull() | ~c.isin(*rule.values)
    if rule.kind == "matches":
        return c.isNull() | ~c.rlike(rule.pattern)
    raise ValueError(f"not a row-local rule kind: {rule.kind!r}")


def dq_audit(df: DataFrame, rules: Sequence[Rule]) -> DataFrame:
    """Evaluate ``rules`` against ``df`` → (rule, n_rows,
    n_violations, passed), one row per rule in a deterministic order.

    All row-local rules + uniqueness share ONE aggregation job over a
    single scan; each ref_integrity rule adds one anti-join count.
    """
    row_local = [r for r in rules if r.kind in ("not_null", "in_range", "in_set", "matches")]
    uniques = [r for r in rules if r.kind == "unique"]
    refs = [r for r in rules if r.kind == "ref_integrity"]
    unknown = {r.kind for r in rules} - {"not_null", "in_range", "in_set", "matches", "unique", "ref_integrity"}
    if unknown:
        raise ValueError(f"unknown rule kinds: {sorted(unknown)}")

    aggs = [F.count(F.lit(1)).cast("long").alias("_n")]
    for i, r in enumerate(row_local):
        aggs.append(
            F.sum(F.when(_violation(r), 1).otherwise(0)).cast("long").alias(f"_v{i}")
        )
    for i, r in enumerate(uniques):
        key = F.struct(*[F.col(c) for c in (r.cols or (r.col,))])
        aggs.append(F.count_distinct(key).cast("long").alias(f"_u{i}"))
    one = df.agg(*aggs)

    # Unpivot the 1-row agg via inline(array(struct...)) — one physical
    # scan for ALL row-local + uniqueness rules by construction (a
    # union of selects over `one` would duplicate the agg subtree and
    # lean on exchange reuse to dedupe it).
    entries = []
    for i, r in enumerate(row_local):
        entries.append(
            F.struct(
                F.lit(r.name).alias("rule"),
                F.col("_n").alias("n_rows"),
                F.col(f"_v{i}").alias("n_violations"),
            )
        )
    for i, r in enumerate(uniques):
        entries.append(
            F.struct(
                F.lit(r.name).alias("rule"),
                F.col("_n").alias("n_rows"),
                (F.col("_n") - F.col(f"_u{i}")).alias("n_violations"),
            )
        )
    # FK rules: one anti-join count each, crossJoined (1-row × 1-row)
    # onto the SAME agg row so n_rows is read once — total scans of
    # the audited table = 1 + len(refs), never more.
    combined = one
    for j, r in enumerate(refs):
        assert r.ref is not None, r.name
        orphan_cnt = df.join(
            F.broadcast(r.ref.select(F.col(r.ref_col).alias("_k")).distinct()),
            F.col(r.col) == F.col("_k"),
            "left_anti",
        ).agg(F.count(F.lit(1)).cast("long").alias(f"_fk{j}"))
        combined = combined.crossJoin(F.broadcast(orphan_cnt))
        entries.append(
            F.struct(
                F.lit(r.name).alias("rule"),
                F.col("_n").alias("n_rows"),
                F.col(f"_fk{j}").alias("n_violations"),
            )
        )

    out = combined.select(F.inline(F.array(*entries)))
    return out.withColumn("passed", F.col("n_violations") == 0)
