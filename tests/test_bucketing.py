"""Bucketed co-located join: prove the exchange disappears.

The value-level half checks the join result equals the unbucketed join;
the plan half checks the property bucketing exists for — ZERO shuffle
exchanges for a fact⋈fact equi-join on the bucket key, versus ≥2 for the
same join over plain parquet."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline__s3_to_postgres_s3_spark import plans
from data_pipeline__s3_to_postgres_s3_spark.catalog import load_table
from data_pipeline__s3_to_postgres_s3_spark.sources.bucketing import (
    colocated_join,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_small):
    orders = load_table(spark, sf_small, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    li = load_table(spark, sf_small, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    write_bucketed(orders, "bt_orders", "o_orderkey")
    write_bucketed(li, "bt_lineitem", "o_orderkey")
    yield "bt_orders", "bt_lineitem"
    spark.sql("DROP TABLE IF EXISTS bt_orders")
    spark.sql("DROP TABLE IF EXISTS bt_lineitem")


def test_bucketed_join_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    joined = colocated_join(spark, lt, rt, "o_orderkey")
    assert plans.exchange_count(joined) == 0
    assert plans.sortmerge_join_count(joined) == 1


def test_unbucketed_twin_does_shuffle(spark, sf_small):
    """Control: the same join over plain parquet shuffles both sides."""
    orders = load_table(spark, sf_small, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    li = load_table(spark, sf_small, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    joined = orders.join(li.hint("MERGE"), "o_orderkey")
    assert plans.exchange_count(joined) >= 2


def test_bucketed_join_values_match_plain(spark, sf_small, bucketed_tables):
    lt, rt = bucketed_tables
    bucketed = colocated_join(spark, lt, rt, "o_orderkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("long")).alias("q"),
    )
    orders = load_table(spark, sf_small, "orders").select("o_orderkey")
    li = load_table(spark, sf_small, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    plain = orders.join(li, "o_orderkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("long")).alias("q"),
    )
    assert bucketed.collect() == plain.collect()
