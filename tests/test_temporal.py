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


def test_events_gapfill_locf_semantics(spark, tmp_path):
    """Pin the gap-fill contract on a hand-built feed: one row per hour of
    each user's own span, zero-count gaps, the value carried forward from
    the LAST observed bucket, and NULL before a user's first observation
    can't occur (spans start at the first observed hour)."""
    import datetime as ddt

    from data_pipeline__s3_to_postgres_s3_spark.operators.temporal import (
        events_gapfill_locf,
    )

    def t(h, m=0):
        return ddt.datetime(2024, 3, 1, h, m)

    rows = [
        # user 1: hours 10 (two events) and 13 — gaps at 11, 12.
        (1, t(10, 5), 1, "view", 2.50, "{}"),
        (2, t(10, 40), 1, "view", 1.25, "{}"),
        (3, t(13, 1), 1, "purchase", 4.00, "{}"),
        # user 2: single hour — no gaps at all.
        (4, t(22), 2, "view", 9.99, "{}"),
    ]
    spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    got = {
        (r["user_id"], r["bucket_ts"].hour): r
        for r in events_gapfill_locf(spark, str(tmp_path)).collect()
    }
    assert set(got) == {(1, 10), (1, 11), (1, 12), (1, 13), (2, 22)}
    assert got[(1, 10)]["n_events"] == 2 and not got[(1, 10)]["is_gap"]
    assert got[(1, 10)]["value_locf"] == 3.75
    for h in (11, 12):
        assert got[(1, h)]["n_events"] == 0 and got[(1, h)]["is_gap"]
        assert got[(1, h)]["value_locf"] == 3.75  # carried forward
    assert got[(1, 13)]["value_locf"] == 4.00
    assert got[(2, 22)]["n_events"] == 1 and not got[(2, 22)]["is_gap"]


def test_events_gapfill_reuses_hourly_subtree(spark, sf_dir):
    """The hourly rollup feeds two consumers (span aggregate + scaffold
    join); the localCheckpoint keeps it from re-executing per consumer —
    pinned by the plan containing at most one events scan."""
    from data_pipeline__s3_to_postgres_s3_spark.operators.temporal import (
        events_gapfill_locf,
    )

    df = events_gapfill_locf(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.lower().count("events.parquet") <= 1


def test_purchases_pit_stage_exactly_one_version_per_purchase(spark, sf_dir):
    """Interval containment must land every purchase in exactly one SCD2
    episode, and the matched episode must actually contain the purchase
    timestamp."""
    from data_pipeline__s3_to_postgres_s3_spark.catalog import load_events
    from data_pipeline__s3_to_postgres_s3_spark.operators.temporal import (
        purchases_pit_stage,
    )
    from pyspark.sql import functions as F

    ev = load_events(spark, sf_dir)
    n_purchases = ev.where(F.col("event_type") == "purchase").count()
    rows = purchases_pit_stage(spark, sf_dir).collect()
    assert len(rows) == n_purchases
    assert len({r["event_id"] for r in rows}) == n_purchases
    assert all(r["stage_since"] <= r["ts"] for r in rows)
