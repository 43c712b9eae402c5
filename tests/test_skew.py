"""Salting must be invisible to semantics: salted forms equal their
unsalted counterparts row-for-row."""

from __future__ import annotations

from pyspark.sql import functions as F

from streaming_data_spark.operators import skew
from streaming_data_spark.schemas import load_table


def test_salted_join_equals_plain_join(spark, sf_oracle):
    lineitem = load_table(spark, sf_oracle, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_suppkey", "l_quantity"
    )
    supplier = (
        load_table(spark, sf_oracle, "supplier")
        .withColumnRenamed("s_suppkey", "l_suppkey")
        .select("l_suppkey", "s_name")
    )
    plain = lineitem.join(supplier, "l_suppkey")
    salted = skew.salted_join(lineitem, supplier, on=["l_suppkey"])
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain.select(*salted.columns)).count() == 0
    assert plain.select(*salted.columns).exceptAll(salted).count() == 0


def _skewed_pair(spark):
    """Synthetic power-law shape: one key ('hot') carries 5000 of 5600
    left rows; right side has multi-row keys, NULL payloads, and a key
    with no left match — every edge the operator must preserve."""
    left = spark.range(5600).select(
        F.when(F.col("id") < 5000, "hot")
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 37).cast("string")))
        .alias("k"),
        F.col("id").alias("lid"),
    )
    right = spark.createDataFrame(
        [("hot", 1.0), ("hot", 2.0), ("k3", 3.0), ("k3", None),
         ("k5", 5.0), ("unmatched", 9.0)],
        "k string, payload double",
    )
    return left, right


def test_skew_split_inner_join_equals_plain_join(spark):
    left, right = _skewed_pair(spark)
    marked = right.withColumn("__is_hot", F.col("k") == "hot")
    split = skew.skew_split_inner_join(left, marked, ["k"], is_hot="__is_hot")
    plain = left.join(right, "k")
    assert split.count() == plain.count()
    assert split.exceptAll(plain.select(*split.columns)).count() == 0
    assert plain.select(*split.columns).exceptAll(split).count() == 0


def test_skew_split_inner_join_hot_side_spreads_salt(spark):
    """The hot key's rows must actually leave under MANY salt values
    (the whole point), while cold rows all carry salt 0 — asserted on
    the physical plan (broadcast + salted exchange) and on the salt
    distribution itself."""
    from streaming_data_spark import plans

    left, right = _skewed_pair(spark)
    marked = right.withColumn("__is_hot", F.col("k") == "hot")
    split = skew.skew_split_inner_join(left, marked, ["k"], is_hot="__is_hot", salt=16)
    text = plans.explain_str(split)
    assert "BroadcastHashJoin" in text, text
    assert skew.SALT_COL in text, text
    # rebuild the salted intermediate to observe the salt spread
    hot = marked.filter("__is_hot").select(
        "k", F.lit(True).alias("__hot_hit")
    )
    tagged = left.join(F.broadcast(hot.dropDuplicates(["k"])), "k", "left").withColumn(
        skew.SALT_COL,
        F.when(
            F.coalesce(F.col("__hot_hit"), F.lit(False)),
            F.floor(F.rand(seed=42) * 16),
        ).otherwise(0).cast("int"),
    )
    spread = tagged.filter("__hot_hit").select(skew.SALT_COL).distinct().count()
    assert spread >= 12, spread  # 5000 rows over 16 buckets
    cold_salts = tagged.filter(F.col("__hot_hit").isNull()).select(
        skew.SALT_COL
    ).distinct().collect()
    assert [r[0] for r in cold_salts] == [0]


def test_lm_scores_split_equals_unsplit_on_skewed_corpus(spark):
    """x35's salted path vs the plain join on a corpus where one
    bigram ('a a') dominates — forcing the hot branch locally (the
    auto threshold is 4/32 = 12.5% share; 'a a' here is ~50%)."""
    from streaming_data_spark.operators.text import lm_scores

    rows = [(i, "a " * 40) for i in range(50)] + [
        (100 + i, f"w{i % 7} x{i % 5} y{i % 3} z{i % 11}") for i in range(200)
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    split = lm_scores(docs)  # auto: 'a a' crosses the fair-share bar
    plain = lm_scores(docs, hot_frac=None)
    assert split.count() == plain.count() == 250
    assert split.exceptAll(plain.select(*split.columns)).count() == 0
    assert plain.select(*split.columns).exceptAll(split).count() == 0


def test_salted_agg_equals_plain_groupby(spark, sf_oracle):
    lineitem = load_table(spark, sf_oracle, "lineitem")
    salted = skew.salted_agg(
        lineitem, ["l_suppkey"], {"l_quantity": "sum", "l_orderkey": "count"}
    )
    plain = lineitem.groupBy("l_suppkey").agg(
        F.sum("l_quantity").alias("sum_l_quantity"),
        F.count("l_orderkey").alias("count_l_orderkey"),
    )
    diff = salted.exceptAll(plain.select(*salted.columns)).count()
    assert diff == 0 and salted.count() == plain.count()


def test_skew_split_validate_rejects_mixed_flag_key(spark):
    """ADVICE r6: is_hot marks a KEY, not a row — a key carrying both
    flag values would make hot-tagged left rows (random salt) miss the
    key's cold-slice rows (salt 0) nondeterministically. validate=True
    asserts the contract up front and names the offenders."""
    import pytest

    left = spark.createDataFrame([(1, "l1"), (2, "l2")], "k int, lv string")
    ok = spark.createDataFrame(
        [(1, True, "a"), (1, True, "b"), (2, False, "c")],
        "k int, hot boolean, rv string",
    )
    out = skew.skew_split_inner_join(left, ok, ["k"], "hot", validate=True)
    assert out.count() == 3  # k=1 matches twice, k=2 once

    mixed = spark.createDataFrame(
        [(1, True, "a"), (1, False, "b"), (2, False, "c")],
        "k int, hot boolean, rv string",
    )
    with pytest.raises(ValueError, match="not per-key consistent"):
        skew.skew_split_inner_join(left, mixed, ["k"], "hot", validate=True)


def test_asof_forward_crafted_edges(spark):
    """Forward as-of: equal-ts right rows MATCH (>= inclusive), the
    nearest following row wins, and tolerance drops matches further
    ahead — pinned on crafted rows where each case is unambiguous."""
    from streaming_data_spark.operators.joins import asof_join_forward

    left = spark.createDataFrame(
        [(1, "u", "2024-01-01 00:00:10"), (2, "u", "2024-01-01 00:05:00"),
         (3, "u", "2024-01-01 06:00:00")],
        "id int, k string, ts_s string",
    ).select("id", "k", F.col("ts_s").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [("u", "2024-01-01 00:00:10", 1.0),   # equal-ts: matches id=1
         ("u", "2024-01-01 00:30:00", 2.0),   # next for id=2
         ("u", "2024-01-01 00:00:00", 9.0)],  # BEFORE id=1 - never forward
        "k string, ts_s string, rv double",
    ).select("k", F.col("ts_s").cast("timestamp").alias("ts"), "rv")
    out = asof_join_forward(
        left, right, key="k", ts="ts", value_cols=["rv"],
        tolerance_seconds=3600,
    )
    got = {r["id"]: r["rv"] for r in out.collect()}
    assert got == {1: 1.0, 2: 2.0, 3: None}  # id=3: nothing within 1h ahead
