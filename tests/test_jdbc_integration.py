"""Live JDBC round-trip for sources/jdbc.py — embedded Apache Derby.

The reference writes staging tables to Postgres with a max-PK watermark
(extract_load_transform_data_pipeline.py.py:82-107) and full-replaces a
SQLite metrics table (tripdata_monthly_metrics.py:102-117). No Postgres/
SQLite JDBC driver ships here, but Spark bundles Derby (its Hive-metastore
backend), whose embedded driver needs no server — so the watermark read,
incremental append, append-only and truncate-overwrite paths all get a
real end-to-end JDBC exercise instead of plan-construction-only coverage.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from data_pipeline__s3_to_postgres_s3_spark.sources.jdbc import (
    JdbcTarget,
    append_all,
    append_incremental,
    overwrite_table,
    read_watermark,
)

_SPARK_HOME = os.environ.get("SPARK_HOME", "/opt/spark")
pytestmark = pytest.mark.skipif(
    not glob.glob(os.path.join(_SPARK_HOME, "jars", "derby-*.jar")),
    reason="Derby JDBC jars not available",
)

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _target(tmp_path, table: str) -> JdbcTarget:
    return JdbcTarget(
        url=f"jdbc:derby:{tmp_path}/warehouse;create=true",
        table=table,
        properties={"driver": DRIVER},
        num_partitions=2,
    )


def _orders(spark, lo: int, hi: int):
    return spark.range(lo, hi).select(
        F.col("id").alias("order_id"),
        (F.col("id") % 7).alias("customer_id"),
        (F.col("id") * 10).alias("total_price"),
    )


def test_watermark_append_is_incremental_and_idempotent(spark, tmp_path):
    target = _target(tmp_path, "staging_orders")
    append_all(_orders(spark, 0, 100), target)  # first load creates the table

    assert read_watermark(spark, target, "order_id") == 99

    # Overlapping batch: only rows above the watermark may land.
    append_incremental(spark, _orders(spark, 50, 150), target, "order_id")
    df = spark.read.format("jdbc").options(**target.options()).load()
    assert df.count() == 150
    assert df.select(F.countDistinct("order_id")).collect()[0][0] == 150

    # Same batch again: nothing new above the watermark → no duplicates.
    append_incremental(spark, _orders(spark, 50, 150), target, "order_id")
    assert spark.read.format("jdbc").options(**target.options()).load().count() == 150


def test_overwrite_table_full_replace(spark, tmp_path):
    target = _target(tmp_path, "metrics")
    append_all(_orders(spark, 0, 10), target)
    overwrite_table(_orders(spark, 500, 503), target)
    df = spark.read.format("jdbc").options(**target.options()).load()
    assert df.count() == 3
    assert df.agg(F.min("order_id")).collect()[0][0] == 500
    # Replace again — truncate path must be repeatable.
    overwrite_table(_orders(spark, 600, 602), target)
    assert (
        spark.read.format("jdbc").options(**target.options()).load().count() == 2
    )


def test_read_watermark_rejects_bad_identifiers(spark, tmp_path):
    target = _target(tmp_path, "t; DROP TABLE x")
    with pytest.raises(ValueError, match="identifier"):
        read_watermark(spark, target, "order_id")


def test_stream_upsert_foreachbatch_merge(spark, tmp_path):
    """Streaming update-mode aggregation upserted into Derby via
    foreachBatch staging+MERGE: final table == batch aggregate, and
    replaying the whole stream (fresh checkpoint) is idempotent."""
    import tempfile

    from data_pipeline__s3_to_postgres_s3_spark.streaming.events import (
        read_events_stream,
    )
    from data_pipeline__s3_to_postgres_s3_spark.streaming.sinks import (
        jdbc_upsert_writer,
    )

    sf_small = "/root/testdata/sf0.001"
    target = _target(tmp_path, "user_counts")
    staging = _target(tmp_path, "user_counts_stg")

    agg = (
        read_events_stream(spark, sf_small)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("value").alias("max_value"),
        )
    )
    # Pre-create the target with the right (quoted) schema, empty.
    empty = agg.sparkSession.createDataFrame(
        [], "user_id bigint, n_events bigint, max_value double"
    )
    empty.write.format("jdbc").options(**target.options()).mode("overwrite").save()

    def run_once():
        with tempfile.TemporaryDirectory(prefix="ckpt_up_") as ckpt:
            q = (
                agg.writeStream.outputMode("update")
                .foreachBatch(jdbc_upsert_writer(target, staging, "user_id"))
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

    run_once()
    got = spark.read.format("jdbc").options(**target.options()).load()
    from data_pipeline__s3_to_postgres_s3_spark.catalog import load_events

    want = (
        load_events(spark, sf_small)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.max("value").alias("max_value"))
    )
    key = lambda df: sorted(
        (r["user_id"], r["n_events"], r["max_value"]) for r in df.collect()
    )
    assert key(got) == key(want)

    # Replay from scratch: MERGE makes it idempotent (no dup keys, same rows)
    run_once()
    got2 = spark.read.format("jdbc").options(**target.options()).load()
    assert key(got2) == key(want)


def test_read_partitioned_parallel_and_complete(spark, tmp_path):
    """Range-partitioned JDBC read against live Derby: the scan must come
    back in the requested number of partitions (parallel connections) and
    reproduce every row exactly once — including boundary keys."""
    from data_pipeline__s3_to_postgres_s3_spark.sources.jdbc import (
        read_partitioned,
    )

    target = _target(tmp_path, "po")
    src = _orders(spark, 1, 97)  # awkward size: uneven stride splits
    src.write.format("jdbc").options(**target.options()).mode(
        "errorifexists"
    ).save()

    got = read_partitioned(spark, target, "order_id", num_partitions=4)
    assert got.rdd.getNumPartitions() == 4
    want = sorted(tuple(r) for r in src.collect())
    have = sorted(tuple(r) for r in got.collect())
    assert have == want
