"""r12 probe: NON-FINITE / extreme events.value (the embeddings r10
non-finite axis applied to the fact stream): NaN, +/-Inf, 1e300,
-1e300, 1e-300 on strides. Full events-family replay."""
from __future__ import annotations

import datetime as dt
import shutil
import sys
import tempfile
import traceback

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from pyspark.sql import SparkSession

from data_pipeline__s3_to_postgres_s3_spark.catalog import TABLES
from data_pipeline__s3_to_postgres_s3_spark.registry import ORACLES, QUERIES

from oracle_harness import compare, duckdb_connection

SF = "/root/testdata/sf0.001"
NAMES = [
    "event_props_extract", "events_sessionized", "event_type_hourly",
    "events_running_totals", "events_rolling_zscore", "value_percentiles",
    "funnel_conversion", "retention_cohorts", "conversion_latency_stats",
    "event_transition_matrix", "active_users_rolling", "user_value_mad",
    "events_ohlc", "events_gapfill_locf", "top_session_paths",
    "item_cooccurrence", "item_triangles", "item_pagerank",
    "value_histogram", "purchase_last_view_asof", "error_bursts_range",
    "scd2_user_event_history", "stream_hourly_rollup",
    "stream_sliding_value", "stream_session_stats", "stream_dedup_events",
    "stream_user_running_max", "stream_view_purchase_join",
    "stream_static_enrich", "stream_rolling_zscore", "stream_funnel_stage",
    "stream_ohlc", "stream_distinct_users", "stream_heavy_hitters",
]


def build(d: str) -> None:
    for t in TABLES:
        if t != "events":
            shutil.copy(f"{SF}/{t}.parquet", f"{d}/{t}.parquet")
    base = dt.datetime(2024, 1, 1)
    rows = []
    specials = [float("nan"), float("inf"), float("-inf"), 1e300, -1e300,
                1e-300]
    for i in range(80):
        v = float(i)
        if i % 9 == 4:
            v = specials[(i // 9) % len(specials)]
        rows.append((i, base + dt.timedelta(minutes=7 * i), 100 + i % 4,
                     ["view", "purchase", "click", "signup"][i % 4], v,
                     '{"k": %d}' % (i % 9)))
    cols = list(zip(*rows))
    pq.write_table(
        pa.table({
            "event_id": pa.array(cols[0], pa.int64()),
            "ts": pa.array(cols[1], pa.timestamp("us")),
            "user_id": pa.array(cols[2], pa.int64()),
            "event_type": pa.array(cols[3], pa.string()),
            "value": pa.array(cols[4], pa.float64()),
            "props": pa.array(cols[5], pa.string()),
        }),
        f"{d}/events.parquet",
    )


def main() -> None:
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    d = tempfile.mkdtemp(prefix="xval_")
    build(d)
    reds = []
    for name in NAMES:
        try:
            con = duckdb_connection(d)
            try:
                rep = compare(QUERIES[name](spark, d), con, ORACLES[name])
            finally:
                con.close()
            if not rep["ok"]:
                reds.append(name)
                print(f"RED  {name}: { {k: v for k, v in rep.items() if k != 'ok'} }", flush=True)
        except Exception as e:  # noqa: BLE001
            reds.append(name)
            print(f"ERR  {name}: "
                  f"{''.join(traceback.format_exception_only(type(e), e)).strip()[:300]}",
                  flush=True)
    print(f"\n{len(reds)} red: {reds}")


if __name__ == "__main__":
    main()
