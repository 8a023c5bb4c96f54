"""Semantic + plan pins for the temporal joins (operators/temporal.py).

Oracle parity (incl. DuckDB's native ASOF JOIN) lives in the correctness
gate; here we pin the semantics on crafted frames and the plan shapes
that make both operators scale: the as-of join must contain NO join node
(one keyed window), the range join ONE equi-join and no cartesian
product."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from data_pipeline__s3_to_postgres_s3_spark import plans
from data_pipeline__s3_to_postgres_s3_spark.operators.temporal import (
    asof_join,
    error_bursts_range,
    purchase_last_view_asof,
)


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 12, minute, 0)


def test_asof_join_semantics(spark):
    probe = spark.createDataFrame(
        [(1, _ts(10), "p1"), (1, _ts(30), "p2"), (2, _ts(5), "p3")],
        "user_id long, ts timestamp, tag string",
    )
    build = spark.createDataFrame(
        [(1, _ts(10), 100.0), (1, _ts(20), 200.0), (2, _ts(6), 300.0)],
        "user_id long, ts timestamp, value double",
    )
    out = {
        r["tag"]: (r["build_ts"], r["build_value"])
        for r in asof_join(
            probe, build, by="user_id", ts="ts",
            build_cols={"ts": "build_ts", "value": "build_value"},
        ).collect()
    }
    assert out["p1"] == (_ts(10), 100.0)  # equal timestamp matches (<=)
    assert out["p2"] == (_ts(20), 200.0)  # latest prior, not first
    assert out["p3"] == (None, None)  # no prior build row → left semantics


def test_asof_plan_has_no_join(spark, sf_dir):
    df = purchase_last_view_asof(spark, sf_dir)
    assert plans.sortmerge_join_count(df) == 0
    assert plans.broadcast_join_count(df) == 0
    assert plans.exchange_count(df) <= 2  # one keyed window (+AQE read)


def test_range_join_single_equijoin_no_cartesian(spark, sf_dir):
    df = error_bursts_range(spark, sf_dir)
    assert "CartesianProduct" not in plans.formatted_plan(df)
    assert plans.sortmerge_join_count(df) + plans.broadcast_join_count(df) == 1


def test_range_join_no_duplicate_pairs(spark, sf_dir):
    """Bucket probing {k, k+1} must yield every qualifying pair EXACTLY
    once — duplicates would mean the adjacency reasoning is wrong."""
    df = error_bursts_range(spark, sf_dir)
    total = df.count()
    distinct = df.select("event_a", "event_b").distinct().count()
    assert total == distinct
    assert (
        df.where(
            (F.col("gap_us") <= 0) | (F.col("gap_us") > 21_600 * 1_000_000)
        ).count()
        == 0
    )
