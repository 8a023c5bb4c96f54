"""Extreme RELATIONAL dates axis (r13 second probe,
tools/probe_extreme_dates.py): pre-epoch (1901/1969) and far-future
(2260/9999) values planted into orders.o_orderdate and
lineitem.l_shipdate on strides, replayed over all 52 orders/lineitem-
reading oracles — ZERO reds. Why the surface holds without a gate (vs
the events ts axis, which needed one): the reference-parity queries
filter to literal year windows (extremes drop out identically on both
engines), the month/date-grain groupings (date_trunc, year()) are
total functions that agree at year 9999, and NOTHING on the relational
side derives a min-to-max grid from the date span (the gapfill
explosion class is events-only). This matrix keeps those properties
true: if a future operator adds unguarded add_months arithmetic or a
span-derived sequence over order dates, it reds here first.
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

SPECIALS = [
    dt.datetime(1901, 6, 15),
    dt.datetime(1969, 12, 31, 23, 50),
    dt.datetime(9999, 6, 1),
    dt.datetime(2260, 1, 2),
]

# Date-arithmetic-heavy representatives of every family the probe
# cleared (the full 52 ran in the probe; these pin it in the suite).
QUERIES_UNDER_TEST = [
    "agg_public_holiday",          # expr-key join into generated dim_dates
    "best_performing_product",     # cast-both date-key join chain
    "monthly_revenue_growth",      # unfiltered month-grain lag window
    "order_to_ship_lag_stats",     # datediff distribution
    "order_priority_lateness",     # date comparisons
    "supplier_nation_profit",      # year() in the grouping key
    "grouping_sets_orders",        # year-grain grouping sets
    "zorder_manifest",             # date-derived z-order cells
    "returned_item_report",        # date-window filter (Q10 shape)
    "large_order_customers",
    "min_cost_supplier",
    "incremental_load_watermark",  # MAX-date watermark
    "scd2_user_event_history",     # orders-side SCD2 ranges
    "customer_rfm_segments",       # recency from MAX(o_orderdate)
]


@pytest.fixture(scope="module")
def extreme_date_dir(sf_small, tmp_path_factory):
    d = tmp_path_factory.mktemp("extreme_dates")
    for t in TABLES:
        if t in ("orders", "lineitem"):
            continue
        shutil.copy(f"{sf_small}/{t}.parquet", str(d / f"{t}.parquet"))

    def plant(table: pa.Table, col: str, stride: int) -> pa.Table:
        vals = table.column(col).to_pylist()
        for i in range(len(vals)):
            if vals[i] is not None and i % stride == 3:
                vals[i] = SPECIALS[(i // stride) % len(SPECIALS)]
        idx = table.schema.get_field_index(col)
        return table.set_column(
            idx,
            table.schema.field(idx),
            pa.array(vals, table.schema.field(idx).type),
        )

    o = pq.read_table(f"{sf_small}/orders.parquet")
    pq.write_table(plant(o, "o_orderdate", 17), str(d / "orders.parquet"))
    li = pq.read_table(f"{sf_small}/lineitem.parquet")
    pq.write_table(plant(li, "l_shipdate", 23), str(d / "lineitem.parquet"))
    return str(d)


def test_fixture_fires_the_extremes(extreme_date_dir):
    o = pq.read_table(f"{extreme_date_dir}/orders.parquet")
    years = {x.year for x in o.column("o_orderdate").to_pylist() if x}
    assert any(y < 1970 for y in years) and any(y >= 9999 for y in years)
    li = pq.read_table(f"{extreme_date_dir}/lineitem.parquet")
    years = {x.year for x in li.column("l_shipdate").to_pylist() if x}
    assert any(y < 1970 for y in years) and any(y >= 9999 for y in years)


@pytest.mark.parametrize("name", QUERIES_UNDER_TEST)
def test_oracle_gate_green_under_extreme_dates(spark, extreme_date_dir, name):
    con = duckdb_connection(extreme_date_dir)
    try:
        report = compare(
            QUERIES[name](spark, extreme_date_dir), con, ORACLES[name]
        )
        assert report["ok"], f"{name} under extreme dates: {report}"
    finally:
        con.close()
