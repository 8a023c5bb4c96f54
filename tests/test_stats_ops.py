"""r14 second census pair: join_skew_report (the salting/AQE-remediation
trigger) and partition_stats_rollup (the incremental stats-maintenance
merge receipt).

The rollup's contract is ALGEBRAIC: the scope='total' row is derived by
folding the month partials (counts/sums add, min/max fold), never by a
second table scan — so the hand check below compares it against an
independently computed direct whole-table aggregate. If the merge
algebra ever drifted from the direct semantics, this is the test that
says so (the oracle mirrors the same fold, so a shared mistake would
hash-green; the independent DuckDB direct scan here cannot).
"""

from __future__ import annotations

import shutil

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_pipeline__s3_to_postgres_s3_spark.catalog import TABLES
from data_pipeline__s3_to_postgres_s3_spark.registry import ORACLES, QUERIES

from .oracle_harness import compare, duckdb_connection


def test_rollup_total_equals_independent_direct_scan(spark, sf_small):
    rows = QUERIES["partition_stats_rollup"](spark, sf_small).collect()
    total = [r for r in rows if r["scope"] == "total"]
    months = [r for r in rows if r["scope"] == "month"]
    assert len(total) == 1 and months
    t = total[0]
    con = duckdb.connect()
    direct = con.execute(
        "SELECT COUNT(*), COUNT(o_totalprice), "
        "COALESCE(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)), 0), "
        "MIN(CAST(o_totalprice AS DOUBLE)), "
        "MAX(CAST(o_totalprice AS DOUBLE)) "
        f"FROM read_parquet('{sf_small}/orders.parquet')"
    ).fetchone()
    con.close()
    assert (
        t["n_rows"],
        t["n_priced"],
        t["sum_cents"],
        t["min_value"],
        t["max_value"],
    ) == direct
    # and the fold really is the month partials' fold
    assert t["n_rows"] == sum(m["n_rows"] for m in months)
    assert t["sum_cents"] == sum(m["sum_cents"] for m in months)
    assert t["min_value"] == min(m["min_value"] for m in months)
    assert t["max_value"] == max(m["max_value"] for m in months)


@pytest.fixture(scope="module")
def hotkey_dir(sf_small, tmp_path_factory):
    """sf0.001 with a planted hot customer: every 3rd order re-keyed to
    custkey 7 — a ~33% hot key, far past any natural multiplicity."""
    d = str(tmp_path_factory.mktemp("hotkey"))
    for t in TABLES:
        if t != "orders":
            shutil.copy(f"{sf_small}/{t}.parquet", f"{d}/{t}.parquet")
    src = pq.read_table(f"{sf_small}/orders.parquet")
    vals = src.column("o_custkey").to_pylist()
    for i in range(0, len(vals), 3):
        vals[i] = 7
    idx = src.schema.get_field_index("o_custkey")
    out = src.set_column(
        idx, src.schema.field(idx), pa.array(vals, src.schema.field(idx).type)
    )
    pq.write_table(out, f"{d}/orders.parquet")
    return d


def test_join_skew_flags_planted_hot_key_and_stays_oracle_green(
    spark, hotkey_dir
):
    rows = {
        r["relationship"]: r
        for r in QUERIES["join_skew_report"](spark, hotkey_dir).collect()
    }
    r = rows["orders.o_custkey->customer.c_custkey"]
    n = pq.read_metadata(f"{hotkey_dir}/orders.parquet").num_rows
    expected_hot = len(range(0, n, 3))
    assert r["hot_key"] == 7.0
    assert r["max_key_rows"] >= expected_hot
    assert r["skew_ratio"] is not None and r["skew_ratio"] > 5.0
    con = duckdb_connection(hotkey_dir)
    try:
        rep = compare(
            QUERIES["join_skew_report"](spark, hotkey_dir),
            con,
            ORACLES["join_skew_report"],
        )
        assert rep["ok"], rep
    finally:
        con.close()


def test_join_skew_clean_corpus_shape(spark, sf_small):
    rows = QUERIES["join_skew_report"](spark, sf_small).collect()
    from data_pipeline__s3_to_postgres_s3_spark.operators.profiling import (
        FK_RELATIONSHIPS,
    )

    assert {r["relationship"] for r in rows} == {
        f[0] for f in FK_RELATIONSHIPS
    }
    for r in rows:
        if r["n_keys"]:
            assert r["max_key_rows"] >= 1
            assert r["skew_ratio"] >= 1.0  # max >= avg always
