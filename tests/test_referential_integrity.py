"""Synthetic-orphan pins for referential_integrity_report.

The graded sf corpora are referentially CLEAN (verified r9: zero orphans
and zero NULL FKs across all seven relationships at sf0.01), so the
oracle differential only ever hashes the all-zero orphan columns. These
tests plant real orphans and NULL FKs and pin (a) the exact counts the
operator must report and (b) cross-engine agreement on a corpus where
the orphan path actually fires — the synthetic-corpus pattern of
test_sampling/test_curation/test_span_dedup (CLAUDE.md).
"""

from __future__ import annotations

import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from data_pipeline__s3_to_postgres_s3_spark.catalog import TABLES
from data_pipeline__s3_to_postgres_s3_spark.operators.profiling import (
    referential_integrity_report,
)
from data_pipeline__s3_to_postgres_s3_spark.registry import ORACLES, QUERIES

from .oracle_harness import compare, duckdb_connection

# Plant plan over sf0.001 orders (every 13th custkey → orphan 99_999_999,
# every 17th → NULL) and nation (one regionkey orphaned to 999).
ORPHAN_KEY = 99_999_999
ORDERS_ORPHAN_MOD = 13
ORDERS_NULL_MOD = 17


@pytest.fixture(scope="module")
def orphan_dir(sf_small, tmp_path_factory):
    d = tmp_path_factory.mktemp("ref_integrity")
    for t in TABLES:
        if t not in ("orders", "nation"):
            shutil.copy(f"{sf_small}/{t}.parquet", str(d / f"{t}.parquet"))

    orders = pq.read_table(f"{sf_small}/orders.parquet")
    n = orders.num_rows
    i = orders.schema.get_field_index("o_custkey")
    col = orders.column(i)
    orphan_mask = pa.array([j % ORDERS_ORPHAN_MOD == 0 for j in range(n)])
    null_mask = pa.array(
        [j % ORDERS_ORPHAN_MOD != 0 and j % ORDERS_NULL_MOD == 0 for j in range(n)]
    )
    col = pc.if_else(orphan_mask, pa.scalar(ORPHAN_KEY, col.type), col)
    col = pc.if_else(null_mask, pa.nulls(n, col.type), col)
    orders = orders.set_column(i, orders.schema.field(i), col)
    pq.write_table(orders, str(d / "orders.parquet"))

    nation = pq.read_table(f"{sf_small}/nation.parquet")
    i = nation.schema.get_field_index("n_regionkey")
    rcol = nation.column(i)
    first = pa.array([j == 0 for j in range(nation.num_rows)])
    rcol = pc.if_else(first, pa.scalar(999, rcol.type), rcol)
    nation = nation.set_column(i, nation.schema.field(i), rcol)
    pq.write_table(nation, str(d / "nation.parquet"))
    return str(d), n


def test_planted_orphans_reported_exactly(spark, orphan_dir):
    d, n = orphan_dir
    rows = {
        r["relationship"]: r
        for r in (
            x.asDict()
            for x in referential_integrity_report(spark, d).collect()
        )
    }
    expect_orphans = sum(1 for j in range(n) if j % ORDERS_ORPHAN_MOD == 0)
    expect_nulls = sum(
        1
        for j in range(n)
        if j % ORDERS_ORPHAN_MOD != 0 and j % ORDERS_NULL_MOD == 0
    )
    oc = rows["orders.o_custkey->customer.c_custkey"]
    assert oc["child_rows"] == n
    assert oc["orphan_rows"] == expect_orphans
    assert oc["null_fk_rows"] == expect_nulls
    nr = rows["nation.n_regionkey->region.r_regionkey"]
    assert nr["orphan_rows"] == 1
    assert nr["null_fk_rows"] == 0
    # untouched relationships stay clean
    li = rows["lineitem.l_orderkey->orders.o_orderkey"]
    assert li["orphan_rows"] == 0 and li["null_fk_rows"] == 0


def test_oracle_gate_green_with_planted_orphans(spark, orphan_dir):
    """Cross-engine agreement on a corpus where the orphan and NULL-FK
    paths actually fire (the graded corpus is clean, so the driver hash
    never exercises them)."""
    d, _ = orphan_dir
    con = duckdb_connection(d)
    try:
        name = "referential_integrity_report"
        report = compare(QUERIES[name](spark, d), con, ORACLES[name])
        assert report["ok"], f"{name} with planted orphans: {report}"
    finally:
        con.close()


def test_clean_corpus_is_all_zero(spark, sf_small):
    """Precondition pin (the bloom-justification pattern): the moment the
    driver regenerates testdata WITH orphans, this fails loudly and the
    synthetic plant above stops being the only meaningful-row coverage."""
    out = referential_integrity_report(spark, sf_small).collect()
    assert len(out) == 7
    assert all(r["orphan_rows"] == 0 and r["null_fk_rows"] == 0 for r in out)
    assert all(r["orphan_pct"] == 0.0 for r in out)
    assert all(r["child_rows"] > 0 for r in out)
