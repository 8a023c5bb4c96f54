"""Differential tests: every registered query vs its DuckDB oracle at sf0.01.

This mirrors the driver's t2 correctness gate, so a green run here predicts a
green CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import pytest

from data_pipeline__s3_to_postgres_s3_spark.registry import ORACLES, QUERIES

from .oracle_harness import compare, duckdb_connection


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connection(sf_dir)
    yield c
    c.close()


ORACLE_CHECKED = sorted(set(QUERIES) & set(ORACLES))
ROWS_ONLY = sorted(set(QUERIES) - set(ORACLES))

# Suite budget (r15): the default run keeps the driver's ~50-entry
# oracle WINDOW (the prefix of registry.QUERIES — exactly what
# CORRECTNESS_r{N}.json hashes) plus a deterministic stride of the
# rest; SPARK_GRAFT_FULL_MATRIX=1 sweeps all. Full-registry replay
# stays available as `tools/verify_window.py --all`.
from .matrix_budget import subset  # noqa: E402

_WINDOW = [n for n in list(QUERIES)[:50] if n in ORACLES]
ORACLE_CHECKED_RUN = subset(ORACLE_CHECKED, keep=_WINDOW, k=4)


@pytest.mark.parametrize("name", ORACLE_CHECKED_RUN)
def test_query_matches_oracle(spark, sf_dir, con, name):
    df = QUERIES[name](spark, sf_dir)
    report = compare(df, con, ORACLES[name])
    assert report["ok"], f"{name}: {report}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
