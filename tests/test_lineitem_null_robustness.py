"""Fact-table NULL axis of the driver robustness matrix (round 9):
NULL lineitem measures/keys/flags/dates and NULL part attributes through
every heavy lineitem/part consumer.

The r9 probe (all ~160 batch oracles against this exact null plan at
sf0.001) found ONE real divergence: min_cost_supplier let NULL unit
prices / NULL suppkeys reach its rank window, whose ASC NULL position
differs cross-engine (Spark NULLS FIRST vs DuckDB NULLS LAST — the
pinned class from the events matrix). Fixed with a mirrored
cannot-offer-a-price filter (no-op on the clean corpus) that also closes
the quantity divide-by-zero class. Everything else was already mirrored:
SUM/AVG/MIN/MAX skip NULLs identically, NULL group keys group together
on both engines, NULL join keys drop on both, and comparison predicates
reject NULLs on both.
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
    # conditional-sum pivots / pricing over nullable measures and flags
    "pricing_summary",
    "small_quantity_revenue",
    "promo_revenue_share",
    "brand_band_revenue",
    "value_histogram",
    # Q-shapes: joins, HAVING, scalar subqueries, windows over the fact
    "min_cost_supplier",  # the probe's one real divergence — now guarded
    "part_revenue_concentration",
    "large_order_customers",
    "top_supplier_by_revenue",
    "returned_item_report",
    "supplier_nation_profit",
    "regional_market_share",
    "ship_priority_counts",
    "shipping_priority",
    "local_supplier_volume",
    "nation_trade_volume",
    "parts_supplier_stats",
    "large_volume_orders",
    "suppliers_kept_waiting",
    "order_priority_lateness",
    "order_to_ship_lag_stats",
    # skew-remedy query (NULL partkey drops at the salted inner join)
    "salted_brand_revenue",
    # FK audit: NULL l_partkey / l_suppkey must count as null_fk_rows
    "referential_integrity_report",
    # watermark semi/anti twins over nullable l_orderkey
    "orders_without_lineitems_anti",
    "orders_with_lineitems_semi",
]

# (column, modulus, remainder) — co-prime moduli so every combination of
# NULL fields occurs, including rows with several NULLs at once.
LI_NULL_PLAN = (
    ("l_quantity", 13, 3),
    ("l_extendedprice", 17, 5),
    ("l_discount", 19, 7),
    ("l_tax", 23, 11),
    ("l_returnflag", 29, 2),
    ("l_linestatus", 31, 4),
    ("l_shipdate", 37, 6),
    ("l_partkey", 41, 8),
    ("l_suppkey", 43, 9),
)
P_NULL_PLAN = (
    ("p_brand", 7, 2),
    ("p_type", 11, 3),
    ("p_size", 13, 5),
    ("p_retailprice", 17, 7),
    ("p_name", 19, 11),
)


def _nullify(src: str, plan, out: str) -> None:
    table = pq.read_table(src)
    n = table.num_rows
    for name, mod, r in plan:
        i = table.schema.get_field_index(name)
        col = table.column(i)
        mask = pa.array([j % mod == r for j in range(n)])
        table = table.set_column(
            i, table.schema.field(i), pc.if_else(mask, pa.nulls(n, col.type), col)
        )
    pq.write_table(table, out)


@pytest.fixture(scope="module")
def nullish_lineitem_dir(sf_small, tmp_path_factory):
    d = tmp_path_factory.mktemp("null_lineitem")
    for t in TABLES:
        if t not in ("lineitem", "part"):
            shutil.copy(f"{sf_small}/{t}.parquet", str(d / f"{t}.parquet"))
    _nullify(f"{sf_small}/lineitem.parquet", LI_NULL_PLAN, str(d / "lineitem.parquet"))
    _nullify(f"{sf_small}/part.parquet", P_NULL_PLAN, str(d / "part.parquet"))
    return str(d)


@pytest.mark.parametrize("name", subset(QUERIES_UNDER_TEST, keep=('min_cost_supplier',), k=3))
def test_oracle_gate_green_under_null_lineitem(
    spark, nullish_lineitem_dir, name
):
    con = duckdb_connection(nullish_lineitem_dir)
    try:
        report = compare(
            QUERIES[name](spark, nullish_lineitem_dir), con, ORACLES[name]
        )
        assert report["ok"], f"{name} under NULL lineitem/part fields: {report}"
    finally:
        con.close()


def test_min_cost_supplier_guard_is_noop_on_clean_corpus(spark, sf_small):
    """The r9c cannot-offer-a-price filter must not change the clean-corpus
    result: every line there has positive quantity and non-NULL
    price/part/supplier, so the guarded frame equals the unguarded one."""
    import duckdb

    con = duckdb.connect()
    bad = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{sf_small}/lineitem.parquet') "
        "WHERE NOT (l_quantity > 0) OR l_extendedprice IS NULL "
        "OR l_partkey IS NULL OR l_suppkey IS NULL"
    ).fetchone()[0]
    assert bad == 0
