"""Approximate-aggregate accuracy: the sketches must land near their exact
twins — HLL++ distinct counts within the configured 2% standard error
(allow 3σ) and t-digest percentiles within a small relative band. There is
no cross-engine oracle for engine-specific sketches; THIS is their gate."""

from __future__ import annotations

from data_pipeline__s3_to_postgres_s3_spark.operators.relational import (
    approx_aggregates,
    value_percentiles,
)


def test_approx_close_to_exact(spark, sf_dir):
    exact = {r["event_type"]: r for r in value_percentiles(spark, sf_dir).collect()}
    approx = {r["event_type"]: r for r in approx_aggregates(spark, sf_dir).collect()}
    assert exact.keys() == approx.keys()
    for et in exact:
        e, a = exact[et], approx[et]
        assert abs(a["approx_users"] - e["n_users"]) <= 0.06 * e["n_users"] + 1
        assert abs(a["approx_p50"] - e["p50"]) <= 0.05 * abs(e["p50"]) + 0.5
        assert abs(a["approx_p99"] - e["p99"]) <= 0.05 * abs(e["p99"]) + 0.5
