"""Scale invariance: every query must run at sf0.001 and produce the SAME
schema as at sf0.01 — catches mapping constants or plans that accidentally
depend on data volume (the driver smoke-checks entry() at sf0.001 while
the correctness gate runs sf0.01; a query that drifts between them fails
one or the other confusingly — this pins the contract locally).

Schema comparison is analysis-time for batch queries (no execution);
streaming queries execute on construction, so they are checked at the
small scale factor only for run-ability."""

from __future__ import annotations

import pytest

from data_pipeline__s3_to_postgres_s3_spark.registry import QUERIES

STREAMING = sorted(n for n in QUERIES if n.startswith("stream_"))
BATCH = sorted(n for n in QUERIES if not n.startswith("stream_"))

# Suite budget (r15): schema stability is a per-query STRUCTURAL
# property — a stride catches the class (a mapping constant that
# drifts with sf) without paying two plan-analyses for all ~180
# batch queries every run; SPARK_GRAFT_FULL_MATRIX=1 sweeps all.
from .matrix_budget import subset  # noqa: E402

BATCH_RUN = subset(BATCH, k=4)
STREAMING_RUN = subset(STREAMING, k=2)


@pytest.mark.parametrize("name", BATCH_RUN)
def test_batch_schema_stable_across_sf(spark, sf_dir, sf_small, name):
    small = QUERIES[name](spark, sf_small).schema
    big = QUERIES[name](spark, sf_dir).schema
    assert small == big


@pytest.mark.parametrize("name", STREAMING_RUN)
def test_streaming_runs_at_smallest_sf(spark, sf_small, name):
    df = QUERIES[name](spark, sf_small)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
