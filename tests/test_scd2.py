"""SCD2 semantics (operators/windows.scd2_user_event_history): value-parity
runs in test_correctness_oracle; here the type-2 invariants a dimension
consumer relies on."""

from __future__ import annotations

from data_pipeline__s3_to_postgres_s3_spark.operators.windows import (
    scd2_user_event_history,
)


def test_scd2_episode_invariants(spark, sf_dir):
    rows = scd2_user_event_history(spark, sf_dir).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)

    for user, eps in by_user.items():
        eps.sort(key=lambda r: r["version"])
        # versions are 1..n dense
        assert [e["version"] for e in eps] == list(range(1, len(eps) + 1))
        # exactly one open (current) episode per user, and it is the last
        assert sum(e["is_current"] for e in eps) == 1
        assert eps[-1]["is_current"] and eps[-1]["valid_to"] is None
        for prev, nxt in zip(eps, eps[1:]):
            # episodes tile the timeline with no gaps or overlaps
            assert prev["valid_to"] == nxt["valid_from"]
            assert prev["valid_from"] <= prev["valid_to"]
            # consecutive episodes differ in the tracked attribute
            assert prev["event_type"] != nxt["event_type"]


def test_scd2_current_matches_latest_event(spark, sf_dir):
    """The open episode's event_type == the user's latest event in the log
    (deterministic (ts, event_id) order)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    latest = {
        r["user_id"]: r["event_type"]
        for r in ev.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .collect()
    }
    current = {
        r["user_id"]: r["event_type"]
        for r in scd2_user_event_history(spark, sf_dir)
        .where("is_current")
        .collect()
    }
    assert current == latest
