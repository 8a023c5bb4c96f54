"""r13 probe: EXTREME / DEGENERATE / TIED event timestamps — the time
axis itself (r12 VERDICT #5). Planted classes, all on strides of one
corpus so every consumer sees every hazard:

- pre-epoch ts (1969-12-31, 1901-06-15 — negative epoch values);
- far-future ts (9999-06-01, 2260-01-01 — the year-9999 class that
  overflows date_add/month arithmetic under ANSI and explodes
  min-to-max gapfill grids);
- sub-second ties (same second, distinct microseconds);
- MANY events at the IDENTICAL (user, ts) with distinct event_ids —
  the engine-arbitrary rank-order class for every sessionization /
  OHLC / as-of / LOCF / path consumer.

Replays every registry query whose oracle references the events table
(mechanically derived), with the driver-faithful comparator.
"""
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


def names() -> list[str]:
    return [n for n, sql in ORACLES.items() if "events" in sql]


def build(d: str) -> None:
    for t in TABLES:
        if t != "events":
            shutil.copy(f"{SF}/{t}.parquet", f"{d}/{t}.parquet")
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0

    def add(ts, user, etype, value, props='{"k": 1}'):
        nonlocal eid
        rows.append((eid, ts, user, etype, float(value), props))
        eid += 1

    types = ["view", "purchase", "click", "signup", "error"]
    for i in range(120):
        ts = base + dt.timedelta(minutes=11 * i)
        if i % 11 == 3:
            ts = dt.datetime(1969, 12, 31, 23, 50) if i % 2 else dt.datetime(
                1901, 6, 15, 12, 0
            )
        elif i % 13 == 5:
            ts = dt.datetime(9999, 6, 1, 0, 0) if i % 2 else dt.datetime(
                2260, 1, 2, 3, 4
            )
        elif i % 7 == 2:
            # sub-second tie cluster: same second, distinct micros
            ts = base + dt.timedelta(minutes=11 * i, microseconds=i % 3)
        add(ts, 100 + i % 5, types[i % 5], i)
    # identical (user, ts) pileups: 6 events each, distinct event_ids,
    # mixed types so funnels/paths/OHLC all see the tie
    for k in range(4):
        ts = base + dt.timedelta(hours=3 * k, minutes=17)
        for j in range(6):
            add(ts, 200 + k, types[j % 5], 1000 + j)
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
        f"{d}/events.parquet",
    )


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    d = tempfile.mkdtemp(prefix="xts_")
    build(d)
    target = names()
    print(f"{len(target)} events-reading oracles under probe")
    reds = []
    for name in target:
        try:
            con = duckdb_connection(d)
            try:
                rep = compare(QUERIES[name](spark, d), con, ORACLES[name])
            finally:
                con.close()
            if not rep["ok"]:
                reds.append(name)
                print(
                    f"RED  {name}: "
                    f"{ {k: v for k, v in rep.items() if k != 'ok'} }",
                    flush=True,
                )
        except Exception as e:  # noqa: BLE001
            reds.append(name)
            print(
                f"ERR  {name}: "
                f"{''.join(traceback.format_exception_only(type(e), e)).strip()[:300]}",
                flush=True,
            )
    print(f"\n{len(reds)} red: {reds}")


if __name__ == "__main__":
    main()
