"""Repo-wide oracle dtype sweep (round-4 post-mortem: corpus_stats).

The grading driver hashes the pandas/Arrow materialization of the DuckDB
oracle result. DuckDB types that pandas cannot represent losslessly —
HUGEINT (what SUM(BIGINT) returns) widens to float64 — hash-diverge from
the Spark engine's int64 even when every value is numerically equal and
fetchall() returns exact Python ints. That artifact shipped corpus_stats
driver-red in round 4 while 346 local tests were green.

This sweep is pure-DuckDB (no Spark session): it plans every registered
oracle and asserts no output column carries a pandas-lossy type. Types
are data-independent, so the smallest scale factor is enough, and the
whole sweep runs in seconds — it is the cheap structural guard; the
driver-faithful value/dtype comparator in oracle_harness.compare() is
the per-query behavioral one.
"""

from __future__ import annotations

import pytest

from data_pipeline__s3_to_postgres_s3_spark.registry import ORACLES

from .conftest import SF_SMALL
from .oracle_harness import duckdb_connection

# DuckDB output types pandas/Arrow materializes lossily or widened.
# DECIMAL is included: duckdb .df() converts it to float64, while the
# Spark side would emit either double (different arithmetic) or
# Decimal — either way not the hash the driver computes from int64.
_LOSSY = ("HUGEINT", "UHUGEINT", "DECIMAL", "UBIGINT")


@pytest.fixture(scope="module")
def con():
    c = duckdb_connection(SF_SMALL)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_output_types_are_pandas_faithful(name, con):
    rel = con.sql(ORACLES[name])
    bad = [
        f"{col}: {dtype}"
        for col, dtype in zip(rel.columns, rel.types)
        if any(str(dtype).upper().startswith(t) for t in _LOSSY)
    ]
    assert not bad, (
        f"oracle '{name}' has pandas-lossy output column types {bad}; "
        "cast integer SUM()s back to BIGINT (see oracles/sampling.py)"
    )
