"""Skew mitigation (SURVEY.md §4.1 parallelism row; 100 TB design).

AQE's skew-join handling (``spark.sql.adaptive.skewJoin``) splits
oversized sort-merge partitions automatically — that's the first line
of defense and is ON in our session factory. Salting is the explicit
fallback for the shapes AQE can't fix: a shuffle-hash/broadcast-
ineligible join against one hot key, or a stateful/streaming groupBy
where one key's state won't fit an executor.

Both operators preserve exact semantics — results are identical to the
unsalted form (asserted in tests and by the oracle gate) — they only
change the physical key distribution.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join where the (large, possibly skewed) left side spreads
    each key over ``salt`` shuffle buckets and the right side is
    replicated ``salt`` times.

    Cost model: right side shuffles salt× its size — use when
    |right| ≪ |left| and a single left key overflows one task. The
    salt assignment is random per left row; correctness never depends
    on it (every replica of the right row carries every salt value).

    Only left-preserving joins are valid: the right side is replicated
    ``salt`` times, so right/full-outer would emit each unmatched
    right row ``salt`` times — those shapes raise ValueError (salt the
    other side instead).
    """
    how_norm = how.replace("_", "").lower()
    if how_norm not in {"inner", "left", "leftouter", "leftsemi", "semi", "leftanti", "anti"}:
        raise ValueError(
            f"salted_join supports left-preserving joins only, got how={how!r}; "
            "right/full joins would duplicate unmatched right rows salt times"
        )
    on = list(on)
    left_s = left.withColumn(SALT_COL, F.floor(F.rand(seed=42) * salt).cast("int"))
    right_s = right.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return left_s.join(right_s, on + [SALT_COL], how).drop(SALT_COL)


def skew_split_inner_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    is_hot: str,
    salt: int = 16,
    validate: bool = False,
) -> DataFrame:
    """Inner equi-join robust to power-law keys, in ONE pass over the
    (large) left side.

    ``right`` carries a boolean column ``is_hot`` marking the rows
    whose key is above the skew threshold — the caller guarantees that
    set is BOUNDED (e.g. by pigeonhole: share ≥ f ⇒ ≤ 1/f keys). The
    plan then:

    1. broadcast-LEFT-joins the hot slice onto ``left`` (no shuffle;
       hot matches resolve map-side, tagged with a hit marker);
    2. assigns the shuffle salt: hot-hit rows get a RANDOM salt (their
       key cannot exist on the cold side, so they match nothing there
       and any salt is correct), cold rows get salt 0 to meet the
       cold slice (also salt 0);
    3. equi-joins the cold slice on (keys + salt) — by construction NO
       key above the threshold ever enters this shuffle as a single
       reducer's load;
    4. coalesces the hot/cold payloads and keeps inner semantics
       (rows matched on neither side drop).

    CALLER CONTRACT: ``is_hot`` must be CONSISTENT per key — every
    right-side row of a given key carries the same flag (it marks the
    KEY as hot, not the row). A mixed-flag key silently returns wrong
    results: its hot-tagged left rows get a random salt, so they
    nondeterministically miss the key's cold-slice rows (which sit at
    salt 0). Flags derived from a per-key aggregate (share, count —
    every call site in this repo) satisfy this by construction; pass
    ``validate=True`` to assert it with one bounded job over the
    right side's DISTINCT mixed keys (cheap relative to the join, but
    still a driver-blocking action — leave it off in production
    pipelines and on in tests).

    Identical results to ``left.join(right.drop(is_hot), on)`` for any
    right-side multiplicity — hot/cold key sets are disjoint, so each
    output row's payload comes from exactly one side. Unlike
    ``salted_join`` (which replicates the whole right side salt×),
    only the bounded hot slice is broadcast and the cold slice ships
    once — this is the shape for a right side too big to replicate
    (e.g. an n-gram probability table).
    """
    on = list(on)
    if validate:
        mixed = (
            right.groupBy(*on)
            .agg(F.count_distinct(F.col(is_hot)).alias("_nf"))
            .filter(F.col("_nf") > 1)
            .limit(5)
            .collect()
        )
        if mixed:
            raise ValueError(
                f"skew_split_inner_join: {is_hot!r} is not per-key "
                f"consistent — mixed-flag keys (first 5): "
                f"{[tuple(r[c] for c in on) for r in mixed]}"
            )
    payload = [c for c in right.columns if c not in on and c != is_hot]
    hot = right.filter(F.col(is_hot)).select(
        *on,
        F.lit(True).alias("__hot_hit"),
        *[F.col(c).alias(f"__hot_{c}") for c in payload],
    )
    # The cold salt is ALWAYS 0 — but written as floor(rand()) ∈ {0}
    # rather than lit(0): a literal is constant-folded by Catalyst and
    # dropped from the partitioning keys, which silently collapses the
    # co-partitioning to the raw (unsalted) keys and defeats the whole
    # operator. A non-deterministic zero keeps __salt a clustering key.
    cold = right.filter(~F.col(is_hot)).select(
        *on,
        F.floor(F.rand(seed=43)).cast("int").alias(SALT_COL),
        F.lit(True).alias("__cold_hit"),
        *payload,
    )
    tagged = left.join(F.broadcast(hot), on, "left").withColumn(
        SALT_COL,
        F.when(
            F.coalesce(F.col("__hot_hit"), F.lit(False)),
            F.floor(F.rand(seed=42) * salt),
        )
        .otherwise(0)
        .cast("int"),
    )
    joined = tagged.join(cold, on + [SALT_COL], "left")
    left_cols = [c for c in left.columns]
    return (
        joined.filter(
            F.coalesce("__hot_hit", F.lit(False))
            | F.coalesce("__cold_hit", F.lit(False))
        )
        .select(
            *left_cols,
            *[
                F.coalesce(F.col(f"__hot_{c}"), F.col(c)).alias(c)
                for c in payload
            ],
        )
    )


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, str],
    salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation with an explicit salt: partial-aggregate
    by (keys, salt), then final-aggregate by keys.

    Spark's hash aggregate already does map-side partials; the explicit
    salt additionally splits the *reduce* side of one hot key across
    ``salt`` tasks — the streaming/stateful analog of AQE skew split.
    ``aggs`` maps column -> 'sum'|'count'|'max'|'min' (the
    re-aggregatable functions; avg must be decomposed by the caller).
    """
    keys = list(keys)
    refold = {"sum": F.sum, "count": F.sum, "max": F.max, "min": F.min}
    first = {"sum": F.sum, "count": F.count, "max": F.max, "min": F.min}
    salted = df.withColumn(SALT_COL, F.floor(F.rand(seed=42) * salt).cast("int"))
    partial = salted.groupBy(*keys, SALT_COL).agg(
        *[first[fn](c).alias(f"_p_{c}") for c, fn in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[refold[fn](f"_p_{c}").alias(f"{fn}_{c}") for c, fn in aggs.items()]
    )
