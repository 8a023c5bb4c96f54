"""tripdata_monthly_metrics — monthly Saturday/Sunday diluted means.

Reference: /root/reference/airflow/dags/tripdata_monthly_metrics.py:63-77
(operators A6, P1, P2, F8-F11, O3; quirk Q8: the means are ZERO-DILUTED over
all rows in the month — ``avg(CASE WHEN dow=7 THEN x ELSE 0 END)`` — not
conditional means over Saturdays only; reproduced exactly, including
ROUND(…, 2) and DAYOFWEEK's 1=Sunday convention).

Minute durations use floor(epoch-diff / 60) to match ClickHouse's
TIMESTAMPDIFF(MINUTE, …) truncation (SURVEY.md F11).

Scale: one shuffle on year_month with map-side partial aggregation; the
month key is low-cardinality but value-heavy → AQE coalesces the
post-shuffle partitions. Input projection is 4 columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import tripdata
from ..config import DEFAULT_CONFIG, EngineConfig
from ..functions.numeric import cents, portable_round

WINDOW_START = "2024-01-01"
WINDOW_END = "2026-12-31"


def tripdata_monthly_metrics(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    return monthly_metrics_from_trips(tripdata(spark, sf_dir))


def monthly_metrics_from_trips(
    trips: DataFrame,
    window_start: str = WINDOW_START,
    window_end: str = WINDOW_END,
) -> DataFrame:
    """Core metric logic over any trip-shaped frame (pickup_date,
    pickup_datetime, dropoff_datetime, fare_amount) — used by the sf-mapped
    query above and by the golden diff against the reference's default.db
    (tests/test_golden_tripdata.py), which pins the 2014-2016 window the
    reference queried (tripdata_monthly_metrics.py:66)."""
    trips = trips.where(F.col("pickup_date").between(window_start, window_end))

    dow = F.dayofweek("pickup_date")  # 1=Sunday .. 7=Saturday
    minutes = F.floor(
        (
            F.unix_timestamp("dropoff_datetime")
            - F.unix_timestamp("pickup_datetime")
        )
        / 60
    )

    # Diluted mean = SUM(zero-filled metric)/COUNT(*). Fares accumulate as
    # exact integer cents (functions/numeric.py) so the pre-round double is
    # bit-identical regardless of partial-aggregation order, then rounded
    # with the engine-portable half-up formula.
    n = F.count(F.lit(1))

    def diluted_count(day: int, name: str):
        s = F.sum(F.when(dow == day, 1).otherwise(0))
        return portable_round(s.cast("double") / n, 2).alias(name)

    def diluted_fare(day: int, name: str):
        s = F.sum(F.when(dow == day, cents(F.col("fare_amount"))).otherwise(0))
        return portable_round(s / 100.0 / n, 2).alias(name)

    def diluted_minutes(day: int, name: str):
        s = F.sum(F.when(dow == day, minutes).otherwise(0))
        return portable_round(s.cast("double") / n, 2).alias(name)

    return (
        trips.groupBy(F.date_format("pickup_date", "yyyy-MM").alias("year_month"))
        .agg(
            diluted_count(7, "sat_mean_trip_count"),
            diluted_fare(7, "sat_mean_fare_per_trip"),
            diluted_minutes(7, "sat_mean_duration_per_trip_in_minutes"),
            diluted_count(1, "sun_mean_trip_count"),
            diluted_fare(1, "sun_mean_fare_per_trip"),
            diluted_minutes(1, "sun_mean_duration_per_trip_in_minutes"),
        )
        .orderBy("year_month")
    )
