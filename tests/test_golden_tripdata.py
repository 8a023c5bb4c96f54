"""Golden diff against the reference's ONLY golden output: default.db.

/root/reference/default.db holds tripdata_monthly_metrics — 36 rows
(2014-01..2016-12) produced by test_dag.py:59-77 from ClickHouse's public
NYC-taxi demo dataset. That source is unreachable here, but the metrics
are zero-diluted means rounded to 2 decimals (quirk Q8), which makes them
EXACTLY invertible: for each month, a 100-trip fixture with integer fares
(cents) and whole-minute durations can be constructed whose diluted means
land on the golden numbers with no rounding slack. Running the engine's
metric operator over that fixture must reproduce the golden table
bit-for-bit — closing the loop the CSV-parity suite can't (the tripdata
golden values were otherwise unchecked).

Fixture construction per golden row (year_month, sat_*, sun_*):
- 100 trips: s = sat_mean_trip_count*100 on the month's first Saturday,
  u = sun_mean_trip_count*100 on the first Sunday, the rest on the first
  Monday (weekdays contribute zeros to every metric but count in the
  denominators).
- Saturday fares sum to sat_mean_fare_per_trip*10000 cents, distributed as
  integers; durations sum to sat_mean_duration*100 whole minutes. Same for
  Sunday. All sums are exact in double arithmetic, so the engine's
  portable half-up round reproduces the 2-decimal golden values exactly.
"""

from __future__ import annotations

import datetime as dt
import os
import sqlite3

import pytest

from data_pipeline__s3_to_postgres_s3_spark.operators.tripdata import (
    monthly_metrics_from_trips,
)

GOLDEN_DB = "/root/reference/default.db"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(GOLDEN_DB), reason="reference golden db not available"
)


def _golden_rows():
    con = sqlite3.connect(GOLDEN_DB)
    try:
        return con.execute(
            "SELECT year_month, sat_mean_trip_count, sat_mean_fare_per_trip,"
            " sat_mean_duration_per_trip_in_minutes, sun_mean_trip_count,"
            " sun_mean_fare_per_trip, sun_mean_duration_per_trip_in_minutes"
            " FROM tripdata_monthly_metrics ORDER BY year_month"
        ).fetchall()
    finally:
        con.close()


def _first_dow(year: int, month: int, iso_dow: int) -> dt.date:
    """First date in the month with ISO weekday `iso_dow` (1=Mon..7=Sun)."""
    d = dt.date(year, month, 1)
    return d + dt.timedelta(days=(iso_dow - d.isoweekday()) % 7)


def _split(total: int, n: int) -> list[int]:
    """n non-negative integers summing to total (first takes the slack)."""
    base, rem = divmod(total, n)
    return [base + rem] + [base] * (n - 1)


def _month_trips(row):
    ym, sat_n, sat_fare, sat_min, sun_n, sun_fare, sun_min = row
    year, month = int(ym[:4]), int(ym[5:])
    s, u = round(sat_n * 100), round(sun_n * 100)
    assert 0 < s + u <= 100
    trips = []

    def emit(day: dt.date, count: int, fare_total_cents: int, minutes_total: int):
        fares = _split(fare_total_cents, count)
        mins = _split(minutes_total, count)
        for fare_c, m in zip(fares, mins):
            pickup = dt.datetime(day.year, day.month, day.day, 12, 0, 0)
            trips.append(
                (
                    day,
                    pickup,
                    pickup + dt.timedelta(minutes=m),
                    fare_c / 100.0,
                )
            )

    emit(_first_dow(year, month, 6), s, round(sat_fare * 10000), round(sat_min * 100))
    emit(_first_dow(year, month, 7), u, round(sun_fare * 10000), round(sun_min * 100))
    emit(_first_dow(year, month, 1), 100 - s - u, 0, 0)
    return trips


def test_engine_reproduces_golden_tripdata_metrics(spark):
    golden = _golden_rows()
    assert len(golden) == 36  # 2014-01 .. 2016-12

    rows = [t for row in golden for t in _month_trips(row)]
    trips = spark.createDataFrame(
        rows,
        "pickup_date date, pickup_datetime timestamp, "
        "dropoff_datetime timestamp, fare_amount double",
    )
    got = monthly_metrics_from_trips(
        trips, window_start="2014-01-01", window_end="2016-12-31"
    ).collect()

    assert len(got) == 36
    for g_row, spark_row in zip(golden, got):
        assert spark_row["year_month"] == g_row[0]
        got_vals = (
            spark_row["sat_mean_trip_count"],
            spark_row["sat_mean_fare_per_trip"],
            spark_row["sat_mean_duration_per_trip_in_minutes"],
            spark_row["sun_mean_trip_count"],
            spark_row["sun_mean_fare_per_trip"],
            spark_row["sun_mean_duration_per_trip_in_minutes"],
        )
        assert got_vals == tuple(g_row[1:]), g_row[0]
