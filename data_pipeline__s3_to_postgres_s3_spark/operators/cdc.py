"""CDC merge (MERGE INTO semantics) as a batch operator.

The reference ships two loading modes: full-replace (SQLite sink,
write_to_sqlite_db.py.py — SURVEY.md S8) and append-only incremental
(max-PK watermark, extract_load_transform_data_pipeline.py.py:42-63 —
S3/S4). The third mode a warehouse needs — keyed upsert with deletes, what
`MERGE INTO` does on engines that have it — is expressed here with plain
DataFrame operators so it runs on any Spark without a table format:

    kept     = base ANTI-JOIN deletes            (one keyed join)
    updated  = kept LEFT-JOIN updates, COALESCE  (same key, same shuffle)
    merged   = updated UNION ALL inserts         (no shuffle)

Scale shape: both joins are equi-joins on the merge key; with AQE they
share one exchange of base and one of the (much smaller) change feed —
never a cross product, never a collect. A skewed merge key is the usual
salting candidate. Deletes win over updates for the same key (the
Debezium/CDC convention: the last event for a key in a batch is the
verdict, and a delete tombstone supersedes).

The change feed is derived DETERMINISTICALLY from the customer table
(key arithmetic, below) so the DuckDB oracle replicates it exactly —
the same fixture philosophy as FIXTURES.md §C.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..config import DEFAULT_CONFIG, EngineConfig

# Deterministic synthetic CDC feed over customer:
#   updates: c_custkey % 7 == 0  → acctbal += 100.00, segment re-coded
#   deletes: c_custkey % 13 == 0 → tombstone (wins over a same-key update)
#   inserts: c_custkey % 11 == 0 → new row under key -c_custkey (negative
#            keys are guaranteed absent from the base snapshot)
CDC_UPDATE_MOD = 7
CDC_DELETE_MOD = 13
CDC_INSERT_MOD = 11


def cdc_merge_customers(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Post-merge customer snapshot: (custkey, name, acctbal, mktsegment,
    cdc_op) where cdc_op ∈ {kept, updated, inserted} records the merge
    verdict per surviving row."""
    base = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").cast("double").alias("acctbal"),
        F.col("c_mktsegment").alias("mktsegment"),
    )

    deletes = base.where(F.col("custkey") % CDC_DELETE_MOD == 0).select("custkey")
    updates = base.where(
        (F.col("custkey") % CDC_UPDATE_MOD == 0)
        & (F.col("custkey") % CDC_DELETE_MOD != 0)
    ).select(
        "custkey",
        (F.col("acctbal") + F.lit(100.0)).alias("u_acctbal"),
        F.lit("REACTIVATED").alias("u_mktsegment"),
    )
    inserts = base.where(F.col("custkey") % CDC_INSERT_MOD == 0).select(
        (-F.col("custkey")).alias("custkey"),
        F.concat(F.lit("NEW "), F.col("name")).alias("name"),
        F.lit(0.0).alias("acctbal"),
        F.col("mktsegment"),
        F.lit("inserted").alias("cdc_op"),
    )

    survivors = base.join(deletes, "custkey", "left_anti")
    merged = survivors.join(updates, "custkey", "left").select(
        "custkey",
        "name",
        F.coalesce("u_acctbal", "acctbal").alias("acctbal"),
        F.coalesce("u_mktsegment", "mktsegment").alias("mktsegment"),
        F.when(F.col("u_acctbal").isNotNull(), F.lit("updated"))
        .otherwise(F.lit("kept"))
        .alias("cdc_op"),
    )
    return merged.unionByName(inserts)
