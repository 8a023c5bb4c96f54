"""Dimension-table NULL axis of the driver robustness matrix (r9):
NULL customer/supplier/nation/region attributes through the dim-ranking
consumers the r8/r9 Q-shapes added after the original r6 throwaway
probe.

r9 full-registry probe (all ~160 batch oracles against this null plan
at sf0.001): ZERO reds — the group-by-null / join-drop / cents-COALESCE
discipline holds everywhere, including the DESC/top-N cuts over dim
attributes (revenue sums group per entity and cannot go all-NULL where
a rank consumes them). This gate pins the ten heaviest dim-ranking
reps so a future edit that lets a NULL dim attribute reach a rank
window fails here first (the min_cost_supplier lesson from the
lineitem axis, test_lineitem_null_robustness.py).
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
    "returned_item_report",  # top-20 DESC cut carrying c_acctbal/c_name
    "top_revenue_customers_per_region",
    "customer_nation_value_rank",
    "dormant_high_value_customers",
    "regional_market_share",
    "supplier_nation_profit",
    "top_supplier_by_revenue",
    "nation_trade_volume",
    "customer_set_ops",
    "referential_integrity_report",  # NULL c/s_nationkey, n_regionkey
]

NULL_PLANS = {
    "customer": (
        ("c_name", 7, 2),
        ("c_nationkey", 11, 3),
        ("c_acctbal", 13, 5),
        ("c_mktsegment", 17, 7),
    ),
    "supplier": (("s_name", 7, 3), ("s_nationkey", 11, 4), ("s_acctbal", 13, 6)),
    "nation": (("n_name", 5, 1), ("n_regionkey", 7, 2)),
    "region": (("r_name", 3, 1),),
}


@pytest.fixture(scope="module")
def nullish_dim_dir(sf_small, tmp_path_factory):
    d = tmp_path_factory.mktemp("null_dims")
    for t in TABLES:
        if t not in NULL_PLANS:
            shutil.copy(f"{sf_small}/{t}.parquet", str(d / f"{t}.parquet"))
    for t, plan in NULL_PLANS.items():
        table = pq.read_table(f"{sf_small}/{t}.parquet")
        n = table.num_rows
        for name, mod, r in plan:
            i = table.schema.get_field_index(name)
            col = table.column(i)
            mask = pa.array([j % mod == r for j in range(n)])
            table = table.set_column(
                i,
                table.schema.field(i),
                pc.if_else(mask, pa.nulls(n, col.type), col),
            )
        pq.write_table(table, str(d / f"{t}.parquet"))
    return str(d)


@pytest.mark.parametrize("name", subset(QUERIES_UNDER_TEST, keep=(), k=3))
def test_oracle_gate_green_under_null_dims(spark, nullish_dim_dir, name):
    con = duckdb_connection(nullish_dim_dir)
    try:
        report = compare(
            QUERIES[name](spark, nullish_dim_dir), con, ORACLES[name]
        )
        assert report["ok"], f"{name} under NULL dim fields: {report}"
    finally:
        con.close()
