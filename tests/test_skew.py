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
