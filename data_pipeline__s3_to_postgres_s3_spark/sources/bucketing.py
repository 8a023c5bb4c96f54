"""Bucketed (pre-partitioned) tables: the co-located join path.

A join between two tables bucketed by the join key with the SAME bucket
count needs NO shuffle exchange — each task reads matching bucket files
from both sides. At 100 TB this converts the nightly fact⋈fact join from
the cluster's largest shuffle into a scan: you pay one bucketed write when
data lands, and every subsequent join on that key is exchange-free (sorted
buckets also skip the sort of the sort-merge join).

Requires a session catalog (saveAsTable) — session.py points the Derby
metastore and warehouse at /tmp. Bucket-pruning and exchange elimination
are asserted in tests/test_bucketing.py via plans.exchange_count.

The reference stages everything through unbucketed Postgres heaps and
re-joins from scratch each run (SURVEY.md §4 'no partitioning anywhere');
bucketed staging is the Spark-native replacement for that pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_BUCKETS = 8


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = DEFAULT_BUCKETS,
    sort: bool = True,
) -> None:
    """Persist df as a bucketed (and bucket-sorted) managed table."""
    writer = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two identically-bucketed tables. hint('MERGE') pins sort-merge
    so the plan demonstrates the exchange-free bucket path even when one
    side is small enough to broadcast (broadcast would also be
    exchange-free, but proves nothing about the bucketing)."""
    left = spark.table(left_table)
    right = spark.table(right_table).hint("MERGE")
    return left.join(right, on, how)
