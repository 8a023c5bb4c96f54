"""Date-encoding invariance for orders/lineitem date columns — the same
driver-re-encode hazard class as events.ts (round-3 post-mortem), applied
to the OTHER temporal columns. The driver regenerates testdata between
rounds and may change physical encodings; dates are midnight-aligned
timestamps today and could legally become date32 or tz-adjusted
timestamps tomorrow.

The pin here is the DRIVER-FAITHFUL form of invariance: for every
encoding, the Spark query and its DuckDB oracle read the SAME parquet —
so the contract is not "results never change" (a date column in the
output legitimately changes type with the encoding, on both sides at
once) but "the differential gate stays green under every encoding"."""

from __future__ import annotations

import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_pipeline__s3_to_postgres_s3_spark.catalog import TABLES
from data_pipeline__s3_to_postgres_s3_spark.registry import ORACLES, QUERIES

from .oracle_harness import compare, duckdb_connection
from .matrix_budget import subset  # noqa: E402

ENCODINGS = ("micros_naive", "date32", "micros_utc")
DATE_COLS = {"orders": ["o_orderdate"], "lineitem": ["l_shipdate"]}
QUERIES_UNDER_TEST = [
    "pricing_summary",         # pushdown filter on l_shipdate
    "shipping_priority",       # date-literal comparisons both tables
    "ship_priority_counts",    # r9c: Q12 shape, shipdate range filter
    "monthly_revenue_growth",  # date_trunc on o_orderdate
    "order_priority_lateness", # o_orderdate bucketing
    "large_volume_orders",     # DATE-typed o_orderdate in the output
    "agg_public_holiday",      # flagship: ref view to_date mapping
    "promo_revenue_share",     # date_trunc month on l_shipdate (r5)
    "order_to_ship_lag_stats", # datediff across both tables' dates (r5)
    "zorder_manifest",         # datediff grid + DATE extents (r7)
    # r8c TPC-H shapes: quarter-window date-literal filters on
    # l_shipdate / o_orderdate must push down under every encoding.
    "top_supplier_by_revenue",
    "returned_item_report",
    # r14: month-partition rollup groups on date_trunc(o_orderdate) —
    # the month key must form identically under every date encoding.
    "partition_stats_rollup",
]


@pytest.fixture(scope="module")
def encoded_dirs(sf_small, tmp_path_factory):
    base = tmp_path_factory.mktemp("date_encodings")
    dirs = {}
    for enc in ENCODINGS:
        d = base / enc
        d.mkdir()
        for t in TABLES:
            src = f"{sf_small}/{t}.parquet"
            if t not in DATE_COLS:
                shutil.copy(src, str(d / f"{t}.parquet"))
                continue
            table = pq.read_table(src)
            for col in DATE_COLS[t]:
                i = table.schema.get_field_index(col)
                arr = table.column(i).cast(pa.timestamp("us"))
                if enc == "date32":
                    arr = arr.cast(pa.date32())
                elif enc == "micros_utc":
                    arr = arr.cast(pa.timestamp("us", tz="UTC"))
                table = table.set_column(i, col, arr)
            pq.write_table(table, str(d / f"{t}.parquet"))
        dirs[enc] = str(d)
    return dirs


@pytest.mark.parametrize("name", subset(QUERIES_UNDER_TEST, keep=('partition_stats_rollup',), k=3))
@pytest.mark.parametrize("enc", ENCODINGS)
def test_oracle_gate_green_under_encoding(spark, encoded_dirs, enc, name):
    d = encoded_dirs[enc]
    con = duckdb_connection(d)
    try:
        report = compare(QUERIES[name](spark, d), con, ORACLES[name])
        assert report["ok"], f"{name} under {enc}: {report}"
    finally:
        con.close()


# --- events: the same driver-faithful gate over ts re-encodings -----------
# test_ts_encoding pins that SPARK results are invariant across encodings;
# this closes the loop on the ORACLE side — the differential gate itself
# must stay green under every encoding (DuckDB reads nanos/NTZ/UTC parquet
# natively; the harness pins its session tz to UTC like the Spark side).

EVENT_QUERIES_UNDER_TEST = [
    "events_sessionized",
    "event_type_hourly",
    "scd2_user_event_history",
    "profile_events",
    "funnel_conversion",
    "retention_cohorts",
    "stream_funnel_stage",
]


@pytest.fixture(scope="module")
def event_encoded_dirs(spark, sf_small, tmp_path_factory):
    import pandas as pd  # noqa: F401  (kept with the ts-encoding twin)

    from data_pipeline__s3_to_postgres_s3_spark.catalog import load_events

    pdf = load_events(spark, sf_small).toPandas()
    naive = pdf["ts"]
    variants = {
        # The r3 encoding was TIMESTAMP(NANOS)-ANNOTATED int64 (Spark
        # needs the nanosAsLong legacy conf; DuckDB reads TIMESTAMP_NS
        # natively) — not a bare unannotated int64 column.
        "nanos_ts": pa.array(
            naive.astype("datetime64[ns]"), type=pa.timestamp("ns")
        ),
        "micros_ntz": pa.array(naive.astype("datetime64[us]")),
        "micros_utc": pa.array(
            naive.dt.tz_localize("UTC"), type=pa.timestamp("us", tz="UTC")
        ),
    }
    base = tmp_path_factory.mktemp("event_gate_encodings")
    dirs = {}
    for name, ts_arr in variants.items():
        d = base / name
        d.mkdir()
        for t in TABLES:
            if t != "events":
                shutil.copy(f"{sf_small}/{t}.parquet", str(d / f"{t}.parquet"))
        cols = {c: pa.array(pdf[c]) for c in pdf.columns if c != "ts"}
        table = pa.table({**cols, "ts": ts_arr}).select(list(pdf.columns))
        pq.write_table(table, str(d / "events.parquet"))
        dirs[name] = str(d)
    return dirs


@pytest.mark.parametrize("name", subset(EVENT_QUERIES_UNDER_TEST, keep=(), k=2))
@pytest.mark.parametrize("enc", ["nanos_ts", "micros_ntz", "micros_utc"])
def test_events_oracle_gate_green_under_encoding(
    spark, event_encoded_dirs, enc, name
):
    d = event_encoded_dirs[enc]
    con = duckdb_connection(d)
    try:
        report = compare(QUERIES[name](spark, d), con, ORACLES[name])
        assert report["ok"], f"{name} under {enc}: {report}"
    finally:
        con.close()
