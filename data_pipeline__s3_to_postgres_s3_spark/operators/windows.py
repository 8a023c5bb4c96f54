"""Window-function surface: lag/lead gaps, sessionization, running totals,
tumbling-window rollups over the events table.

The reference's only window is one ROW_NUMBER (SURVEY.md §2.5); the engine
exposes the full pyspark.sql.Window surface. Sessionization is the classic
two-window composition: lag() to detect gaps, then a running SUM of
new-session flags to assign session ids — one shuffle on user_id, both
windows share the same partitioning.

Scale: windows partition by user_id — high-cardinality, well-distributed
key, so the sort within each partition is local and bounded. The tumbling
rollup is a plain groupBy on a derived time bucket (the batch twin of the
Structured Streaming window in streaming/events.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_events, load_table
from ..config import DEFAULT_CONFIG, EngineConfig
from ..functions.numeric import cents, portable_round

SESSION_GAP_MINUTES = 30


def events_sessionized(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Per-user session stats with a 30-minute inactivity gap."""
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_sec = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    with_flag = ev.withColumn(
        "new_session",
        F.when(
            gap_sec.isNull() | (gap_sec > SESSION_GAP_MINUTES * 60), 1
        ).otherwise(0),
    )
    with_session = with_flag.withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        with_session.groupBy("user_id")
        .agg(
            F.max("session_id").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(cents(F.col("value"))) / 100.0).alias("total_value"),
        )
    )


def events_running_totals(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Running per-user cumulative value (frame-spec window, exact cents)."""
    ev = load_events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        (F.sum(cents(F.col("value"))).over(w) / 100.0).alias("running_value"),
    )


def event_type_hourly(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Tumbling 1-hour rollup by event type (batch twin of the streaming
    windowed aggregation)."""
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("hour_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(cents(F.col("value"))) / 100.0).alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def monthly_revenue_growth(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Month-over-month revenue: lag() for the previous month's total,
    growth percentage, and a trailing 3-month moving average — the
    lag/lead + frame-spec window surface over a calendar series.

    Scale note: the window is UNPARTITIONED by design — it runs on the
    POST-AGGREGATE frame (one row per month, dozens of rows at any data
    scale), so the single-partition sort is a constant-size driver of the
    plan, not a bottleneck. The heavy input (orders) is reduced by the
    groupBy's map-side partial aggregation first; revenue accumulates as
    integer cents so the doubles that reach the window are exact."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month")
    ).agg(F.sum(cents(F.col("o_totalprice"))).alias("rev_c"))
    w = Window.orderBy("month")
    frame3 = w.rowsBetween(-2, Window.currentRow)
    prev = F.lag("rev_c").over(w)
    return monthly.select(
        "month",
        (F.col("rev_c") / 100.0).alias("revenue"),
        (prev / 100.0).alias("prev_revenue"),
        portable_round(
            (F.col("rev_c") - prev) * 100.0 / prev, 4
        ).alias("growth_pct"),
        portable_round(
            F.sum("rev_c").over(frame3) / F.count(F.lit(1)).over(frame3) / 100.0,
            2,
        ).alias("trailing_3mo_avg"),
    )


def scd2_user_event_history(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Slowly-changing-dimension type 2 from a change log: each user's
    event_type history as versioned validity intervals — (user_id,
    event_type, version, valid_from, valid_to, is_current).

    The warehouse pattern the reference's full-refresh dims sidestep
    (SURVEY.md §2.1 S9): instead of overwriting a dimension, keep one row
    per attribute VALUE EPISODE. Built from the raw log with two windows
    over the same (user_id → ts, event_id) partitioning — detect change
    points with lag(), then lead() the next change's start into valid_to
    (NULL = still current). ONE shuffle on user_id; both windows and the
    change filter share it, and user_id is high-cardinality so the
    per-partition sorts stay bounded at 100 TB."""
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changed = (
        F.lag("event_type").over(w).isNull()
        | (F.lag("event_type").over(w) != F.col("event_type"))
    )
    points = ev.withColumn("is_change", changed).where("is_change")
    wc = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return points.select(
        "user_id",
        "event_type",
        F.row_number().over(wc).alias("version"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(wc).alias("valid_to"),
        F.lead("ts").over(wc).isNull().alias("is_current"),
    )
