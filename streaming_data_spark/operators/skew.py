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
