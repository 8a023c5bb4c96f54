"""r13 second probe: EXTREME dates on the RELATIONAL side — the events
ts gate (catalog.normalize_event_ts) covers the fact stream; this
plants pre-epoch (1901) and far-future (9999) values into
orders.o_orderdate and lineitem.l_shipdate on strides and replays every
oracle that references either table. Hazard classes hunted: ANSI
add_months/date_add overflow near year 9999 (Spark aborts where DuckDB
wraps into year 10000+), dim_dates-range joins, and month-grain window
arithmetic."""
from __future__ import annotations

import shutil
import sys
import tempfile
import traceback

import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from pyspark.sql import SparkSession

from data_pipeline__s3_to_postgres_s3_spark.catalog import TABLES
from data_pipeline__s3_to_postgres_s3_spark.registry import ORACLES, QUERIES

from oracle_harness import compare, duckdb_connection

SF = "/root/testdata/sf0.001"
import datetime as dt

SPECIALS = [
    dt.datetime(1901, 6, 15),
    dt.datetime(1969, 12, 31, 23, 50),
    dt.datetime(9999, 6, 1),
    dt.datetime(2260, 1, 2),
]


def _plant(table: pa.Table, col: str, stride: int) -> pa.Table:
    vals = table.column(col).to_pylist()
    for i in range(len(vals)):
        if vals[i] is not None and i % stride == 3:
            vals[i] = SPECIALS[(i // stride) % len(SPECIALS)]
    idx = table.schema.get_field_index(col)
    return table.set_column(
        idx, table.schema.field(idx), pa.array(vals, table.schema.field(idx).type)
    )


def build(d: str) -> None:
    for t in TABLES:
        if t in ("orders", "lineitem"):
            continue
        shutil.copy(f"{SF}/{t}.parquet", f"{d}/{t}.parquet")
    o = pq.read_table(f"{SF}/orders.parquet")
    pq.write_table(_plant(o, "o_orderdate", 17), f"{d}/orders.parquet")
    li = pq.read_table(f"{SF}/lineitem.parquet")
    pq.write_table(_plant(li, "l_shipdate", 23), f"{d}/lineitem.parquet")


def names() -> list[str]:
    return [
        n
        for n, sql in ORACLES.items()
        if "orders" in sql or "lineitem" in sql
    ]


def main() -> None:
    only = sys.argv[1:]
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    d = tempfile.mkdtemp(prefix="xdate_")
    build(d)
    target = only or names()
    print(f"{len(target)} orders/lineitem-reading oracles under probe")
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
