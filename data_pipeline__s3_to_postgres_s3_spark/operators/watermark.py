"""Incremental-load watermark operators.

Reference: the max-PK high-watermark load
(/root/reference/airflow/dags/extract_load_transform_data_pipeline.py.py:82-107)
keeps source rows whose PK exceeds the destination's MAX(pk) (operators S3,
A7, P8, J7). Here the "already loaded destination" is simulated
deterministically as the orders with ``order_id < cfg.watermark_seed`` so the
logic is oracle-checkable without a live JDBC target; sources/jdbc.py applies
the same plan against a real destination.

Scale: the watermark is a 1-row broadcast (scalar aggregate), so the filter
``order_id > wm`` stays a pushed-down predicate on the source scan — no
shuffle at all. The anti-join generalization (for sources whose keys are not
monotone) is a broadcast/shuffled LEFT ANTI join on the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, ref_orders
from ..config import DEFAULT_CONFIG, EngineConfig


def incremental_load_watermark(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Rows the incremental load would append: source orders with
    order_id > COALESCE(MAX(order_id) of already-loaded subset, 0).

    The watermark is READ FIRST (a 1-row scalar aggregate collected to the
    driver — exactly what the reference's MAX(pk) query does over JDBC) so
    the source filter is a LITERAL comparison that pushes down to the scan.
    The broadcast-join-the-scalar alternative keeps one lazy plan but the
    predicate then compares a column and cannot push — at 100 TB that is
    the difference between reading the delta and reading the world
    (pinned by tests/test_plans.py::test_watermark_filter_pushed)."""
    src = ref_orders(spark, sf_dir, cfg)
    target = src.where(F.col("order_id") < cfg.watermark_seed)
    wm = target.agg(
        F.coalesce(F.max("order_id"), F.lit(0)).alias("wm")
    ).collect()[0]["wm"]
    return src.where(F.col("order_id") > F.lit(wm))


def orders_without_lineitems_anti(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """General upsert-style anti-join (SURVEY.md J7): source rows whose key
    is absent from the destination — here orders with no lineitem."""
    orders = ref_orders(spark, sf_dir, cfg)
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("order_id")
    )
    return orders.join(li, "order_id", "left_anti")


def orders_with_lineitems_semi(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """LEFT SEMI complement of the anti-join (SURVEY.md §2.3 extension)."""
    orders = ref_orders(spark, sf_dir, cfg)
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("order_id")
    )
    return orders.join(li, "order_id", "left_semi")
