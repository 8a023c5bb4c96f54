"""Non-finite / extreme events.value axis (r12): the differential gate
must stay green when a corrupted feed carries NaN / ±Inf / ±1e300 /
1e-300 values. The probe (tools/probe_extreme_values.py) found 17 of 34
events-family queries red in two classes:

- the universal integer-money discipline (cents() = CAST(ROUND(v·100)
  AS BIGINT)) ABORTS under ANSI on NaN/Inf/1e300 — batch and streaming,
  and DuckDB's cast errors identically, so the feed was un-processable
  on both engines;
- where no cast fires, NaN/Inf rank positions and percentile/MAD
  medians diverge engine-arbitrarily.

The contract (the r10 embeddings non-finite precedent): values outside
the representable range go NULL at the load chokepoint
(catalog.normalize_event_value — NaN, ±Inf, |v| > EVENT_VALUE_ABS_MAX)
while the ROW survives (a broken value must not delete the event from
sessions/funnels/counts); the NULL then flows through the r6 NULL-value
discipline already mirrored in every oracle. The oracle twin is the
registry-level rewrite of every `FROM events` reference through
_EVENTS_VALUE_NORM — one chokepoint per side, no per-query drift.
"""

from __future__ import annotations

import datetime as dt
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_pipeline__s3_to_postgres_s3_spark.catalog import TABLES
from data_pipeline__s3_to_postgres_s3_spark.registry import ORACLES, QUERIES

from .oracle_harness import compare, duckdb_connection

QUERIES_UNDER_TEST = [
    "event_props_extract",
    "events_sessionized",
    "event_type_hourly",
    "events_running_totals",
    "events_rolling_zscore",
    "value_percentiles",
    "funnel_conversion",
    "retention_cohorts",
    "conversion_latency_stats",
    "event_transition_matrix",
    "active_users_rolling",
    "user_value_mad",
    "events_ohlc",
    "events_gapfill_locf",
    "top_session_paths",
    "item_cooccurrence",
    "item_triangles",
    "item_pagerank",
    "value_histogram",
    "purchase_last_view_asof",
    "error_bursts_range",
    "scd2_user_event_history",
    "stream_hourly_rollup",
    "stream_sliding_value",
    "stream_session_stats",
    "stream_dedup_events",
    "stream_user_running_max",
    "stream_view_purchase_join",
    "stream_static_enrich",
    "stream_rolling_zscore",
    "stream_funnel_stage",
    "stream_ohlc",
    "stream_distinct_users",
    "stream_heavy_hitters",
]


@pytest.fixture(scope="module")
def extreme_events_dir(sf_small, tmp_path_factory):
    d = tmp_path_factory.mktemp("extreme_events")
    for t in TABLES:
        if t != "events":
            shutil.copy(f"{sf_small}/{t}.parquet", str(d / f"{t}.parquet"))
    base = dt.datetime(2024, 1, 1)
    specials = [
        float("nan"),
        float("inf"),
        float("-inf"),
        1e300,
        -1e300,
        1e-300,
    ]
    rows = []
    for i in range(80):
        v = float(i)
        if i % 9 == 4:
            v = specials[(i // 9) % len(specials)]
        rows.append(
            (
                i,
                base + dt.timedelta(minutes=7 * i),
                100 + i % 4,
                ["view", "purchase", "click", "signup"][i % 4],
                v,
                '{"k": %d}' % (i % 9),
            )
        )
    cols = list(zip(*rows))
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(cols[0], pa.int64()),
                "ts": pa.array(cols[1], pa.timestamp("us")),
                "user_id": pa.array(cols[2], pa.int64()),
                "event_type": pa.array(cols[3], pa.string()),
                "value": pa.array(cols[4], pa.float64()),
                "props": pa.array(cols[5], pa.string()),
            }
        ),
        str(d / "events.parquet"),
    )
    return str(d)


@pytest.mark.parametrize("name", QUERIES_UNDER_TEST)
def test_oracle_gate_green_under_extreme_values(
    spark, extreme_events_dir, name
):
    con = duckdb_connection(extreme_events_dir)
    try:
        report = compare(
            QUERIES[name](spark, extreme_events_dir), con, ORACLES[name]
        )
        assert report["ok"], f"{name} under extreme values: {report}"
    finally:
        con.close()


def test_value_normalization_is_noop_on_sane_values(spark, sf_small):
    """The chokepoint must be invisible on a healthy corpus: the gated
    load equals the raw load bit-for-bit."""
    from pyspark.sql import functions as F

    from data_pipeline__s3_to_postgres_s3_spark.catalog import load_events

    ev = load_events(spark, sf_small)
    raw = spark.read.parquet(f"{sf_small}/events.parquet")
    assert ev.count() == raw.count()
    changed = ev.select("event_id", "value").exceptAll(
        spark.read.parquet(f"{sf_small}/events.parquet").select(
            "event_id", F.col("value").cast("double")
        )
    )
    assert changed.count() == 0
