"""agg_public_holiday — 12-way conditional-SUM pivot over orders ⋈ dim_dates.

Reference: /root/reference/sql/transformation.sql:18-44 (operators A1, J1,
P3, P4; quirk Q1: "public holiday" = weekday AND working_day='false' AND a
fixed year; metric is SUM(quantity), not order count; LEFT JOIN is nullified
by the WHERE on right-side columns, so Catalyst rewrites it to inner).

Scale: dim_dates is a few-thousand-row generated dimension → explicit
``broadcast()``; orders-side scan reads only (o_orderkey, o_orderdate) after
pruning; single global aggregate with map-side partial aggregation — the
only shuffle is the 1-row final combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import dim_dates, ref_orders
from ..config import DEFAULT_CONFIG, EngineConfig

MONTHS = (
    "jan", "feb", "mar", "apr", "may", "jun",
    "jul", "aug", "sep", "oct", "nov", "dec",
)


def agg_public_holiday(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    return agg_public_holiday_from_tables(spark, ref_orders(spark, sf_dir, cfg), cfg)


def agg_public_holiday_from_tables(
    spark: SparkSession, orders: DataFrame, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Core logic over a raw orders frame — used both by the oracle-checked
    query above and the ELT pipeline's transform stage. dim_dates is generated
    (implied warehouse dim, SURVEY.md §1.3) and always broadcast."""
    dates = dim_dates(spark, cfg)

    joined = orders.join(
        F.broadcast(dates),
        orders["order_date"] == dates["calendar_dt"],
        "left",
    ).where(
        (F.col("year_num") == cfg.holiday_year)
        & F.col("day_of_the_week_num").between(1, 5)
        & (F.col("working_day") == "false")
    )

    aggs = [
        F.sum(
            F.when(F.col("month_of_the_year_num") == m, F.col("quantity")).otherwise(0)
        )
        .cast("int")
        .alias(f"tt_order_hol_{name}")
        for m, name in enumerate(MONTHS, start=1)
    ]
    return joined.agg(*aggs).select(
        F.lit(cfg.run_date).alias("ingestion_date"), "*"
    )
