"""Bucketed tables must make same-key joins and aggregations
exchange-free — the pay-shuffle-once contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from streaming_data_spark import plans
from streaming_data_spark.schemas import load_table
from streaming_data_spark.sinks.writers import write_bucketed


def test_bucketed_join_has_no_exchange(spark, sf_small):
    orders = load_table(spark, sf_small, "orders")
    lineitem = load_table(spark, sf_small, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "b_orders", ["o_orderkey"], n_buckets=8)
    write_bucketed(lineitem, "b_lineitem", ["o_orderkey"], n_buckets=8)
    try:
        joined = spark.table("b_lineitem").join(spark.table("b_orders"), "o_orderkey")
        n_rows = joined.count()
        want = lineitem.join(orders, "o_orderkey").count()
        assert n_rows == want
        assert plans.shuffle_count(joined) == 0, plans.explain_str(joined)
        # aggregation on the bucket key is exchange-free too
        agg = spark.table("b_lineitem").groupBy("o_orderkey").agg(
            F.sum("l_quantity").alias("s")
        )
        assert plans.shuffle_count(agg) == 0, plans.explain_str(agg)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
