"""Money-column encoding: the differential gate must stay green when the
driver re-encodes prices as DECIMAL(12,2) — the TPC-H-spec layout — instead
of today's double. Same driver-re-encode hazard class as events.ts
(round 3) and the date columns (test_date_encoding), applied to the money
axis.

Two halves make the gate hold:
- ``catalog._normalize_decimals`` casts decimal columns to DOUBLE at the
  single load chokepoint, so Spark-side arithmetic is identical under
  either layout (decimal→double recovers the exact same double: these are
  2-decimal values well inside the 53-bit mantissa).
- The oracles' cents discipline (ROUND(x*100)::BIGINT before any SUM)
  makes the DuckDB side exact under BOTH layouts — a DECIMAL(_,2) scaled
  by 100 is an integer DuckDB recovers exactly, and the double layout was
  already pinned green every round.
"""

from __future__ import annotations

import re
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_pipeline__s3_to_postgres_s3_spark.catalog import TABLES
from data_pipeline__s3_to_postgres_s3_spark.registry import ORACLES, QUERIES

from .oracle_harness import compare, duckdb_connection
from .matrix_budget import subset  # noqa: E402

MONEY_COLS = {
    "lineitem": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    "orders": ["o_totalprice"],
    "part": ["p_retailprice"],
    "customer": ["c_acctbal"],
    "supplier": ["s_acctbal"],
}

# Auto-derived membership: EVERY oracle whose SQL touches a money column
# is pinned, so a future money query joins the matrix by existing.
_MONEY_RE = "|".join(sorted({c for cols in MONEY_COLS.values() for c in cols}))
QUERIES_UNDER_TEST = sorted(
    name
    for name, sql in ORACLES.items()
    if name in QUERIES and re.search(_MONEY_RE, sql)
)


@pytest.fixture(scope="module")
def decimal_dir(sf_small, tmp_path_factory):
    d = tmp_path_factory.mktemp("money_encoding") / "decimal"
    d.mkdir()
    for t in TABLES:
        src = f"{sf_small}/{t}.parquet"
        if t not in MONEY_COLS:
            shutil.copy(src, str(d / f"{t}.parquet"))
            continue
        table = pq.read_table(src)
        for col in MONEY_COLS[t]:
            i = table.schema.get_field_index(col)
            table = table.set_column(
                i,
                pa.field(col, pa.decimal128(12, 2)),
                table.column(i).cast(pa.decimal128(12, 2)),
            )
        pq.write_table(table, str(d / f"{t}.parquet"))
    return str(d)


def test_decimal_layout_reaches_spark_as_double(spark, decimal_dir):
    """The normalization chokepoint itself: decimal parquet loads as
    DOUBLE with values identical to the double layout."""
    from data_pipeline__s3_to_postgres_s3_spark.catalog import load_table

    df = load_table(spark, decimal_dir, "lineitem")
    assert dict(df.dtypes)["l_extendedprice"] == "double"
    assert dict(df.dtypes)["l_discount"] == "double"


@pytest.mark.parametrize("name", subset(QUERIES_UNDER_TEST, keep=(), k=3))
def test_oracle_gate_green_under_decimal_money(spark, decimal_dir, name):
    con = duckdb_connection(decimal_dir)
    try:
        report = compare(QUERIES[name](spark, decimal_dir), con, ORACLES[name])
        assert report["ok"], f"{name} under decimal money: {report}"
    finally:
        con.close()
