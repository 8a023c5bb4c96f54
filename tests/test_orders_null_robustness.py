"""Orders-side NULL axis of the driver robustness matrix (round 6):
NULL o_orderdate / o_totalprice / o_custkey / o_orderstatus /
o_orderpriority rows through the relational family. Unlike the events
axis (seven hazards) this probed GREEN with no changes — the
cents/COALESCE/group-by-null discipline already agrees across engines —
so the pin is pure regression insurance for the cheapest class of
future edit to break it (a new window ordering or ratio without a
null/zero guard).
"""

from __future__ import annotations

import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from data_pipeline__s3_to_postgres_s3_spark.catalog import TABLES
from data_pipeline__s3_to_postgres_s3_spark.registry import ORACLES, QUERIES

from .oracle_harness import compare, duckdb_connection
from .matrix_budget import subset  # noqa: E402

QUERIES_UNDER_TEST = [
    "pricing_summary",
    "rollup_orders",
    "cube_orders",
    # r9: explicit GROUPING SETS + grouping_id — gid disambiguates a
    # subtotal row from a genuine NULL key under the null probe.
    "grouping_sets_orders",
    "order_status_pivot",
    "order_status_unpivot",
    "customer_order_distribution",
    "top_revenue_customers_per_region",
    "customer_revenue_deciles",
    "customer_nation_value_rank",
    "monthly_revenue_growth",
    "dormant_high_value_customers",
    "customer_rfm_segments",
    "promo_revenue_share",
    "order_to_ship_lag_stats",
    "order_priority_lateness",
    "large_volume_orders",
    # r9: Q18 shape — the top-100 cut orders by cents(o_totalprice)
    # DESC; NULL totalprice must sort identically (both engines default
    # NULLS LAST under DESC) and NULL custkey drops at the join.
    "large_order_customers",
    # r9c: Q12 shape — NULL o_orderpriority must land in NEITHER bucket
    # (IN / NOT IN both NULL → ELSE 0) on both engines.
    "ship_priority_counts",
    "customer_churn_reconciliation",
    "incremental_load_watermark",
    "orders_without_lineitems_anti",
    "agg_public_holiday",
    "most_ordered_product_date",
    "best_performing_product",
    "cdc_merge_customers",
    "profile_orders",
    # r9c: NULL o_custkey is this op's core semantics — it must count as
    # null_fk_rows, never as an orphan, on both engines.
    "referential_integrity_report",
    # r7: NULL-key rows must land in sentinel file -1 on both engines.
    "zorder_manifest",
]

_NULL_PLAN = (
    ("o_orderdate", 17, 3),
    ("o_totalprice", 13, 5),
    ("o_custkey", 23, 7),
    ("o_orderstatus", 19, 2),
    ("o_orderpriority", 29, 4),
)


@pytest.fixture(scope="module")
def nullish_orders_dir(sf_small, tmp_path_factory):
    d = tmp_path_factory.mktemp("null_orders")
    for t in TABLES:
        if t != "orders":
            shutil.copy(f"{sf_small}/{t}.parquet", str(d / f"{t}.parquet"))
    table = pq.read_table(f"{sf_small}/orders.parquet")
    n = table.num_rows
    for name, mod, r in _NULL_PLAN:
        i = table.schema.get_field_index(name)
        col = table.column(i)
        mask = pa.array([j % mod == r for j in range(n)])
        table = table.set_column(
            i,
            table.schema.field(i),
            pc.if_else(mask, pa.nulls(n, col.type), col),
        )
    pq.write_table(table, str(d / "orders.parquet"))
    return str(d)


@pytest.mark.parametrize("name", subset(QUERIES_UNDER_TEST, keep=(), k=3))
def test_oracle_gate_green_under_null_orders(spark, nullish_orders_dir, name):
    con = duckdb_connection(nullish_orders_dir)
    try:
        report = compare(
            QUERIES[name](spark, nullish_orders_dir), con, ORACLES[name]
        )
        assert report["ok"], f"{name} under NULL order fields: {report}"
    finally:
        con.close()
