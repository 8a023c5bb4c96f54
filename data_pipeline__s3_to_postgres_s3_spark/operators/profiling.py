"""Data-quality profiling: per-column null and cardinality accounting.

The pre-load validation pass a warehouse pipeline runs before trusting a
feed (the reference trusts pandas inference and loads blind —
extract_load_transform_data_pipeline.py.py:52-63; this is the check that
pipeline lacks): row count, non-null count, and exact distinct count for
every column, as ROWS so downstream rules can join/threshold them.

Scale shape: ONE scan. All per-column aggregates run in a single
aggregation (Spark plans the multi-COUNT(DISTINCT) via EXPAND — one pass
over the data, rows multiplied by #distinct-aggregates map-side, then a
partially-aggregated shuffle); the 1-row result unpivots to per-column
rows with stack() — driver never loops over columns issuing scans. At
production scale swap exact distincts for approx_count_distinct and keep
the same surface.

Exact-distinct note: COUNT(DISTINCT) over doubles compares exact binary
values in both engines, so the oracle (UNION ALL over the same 1-row
aggregate subquery) matches bit-for-bit without any rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..config import DEFAULT_CONFIG, EngineConfig

# Pinned column list (shared with the oracle builder) — profiling output
# must be stable even if the physical parquet gains columns.
PROFILE_ORDERS_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)


def profile_table(df: DataFrame, cols: tuple[str, ...]) -> DataFrame:
    """(column_name, n_rows, n_nonnull, n_distinct) per column, one scan."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.count(c).alias(f"nn_{c}"))
        aggs.append(F.countDistinct(c).alias(f"nd_{c}"))
    one = df.agg(*aggs)
    stacked = ", ".join(f"'{c}', nn_{c}, nd_{c}" for c in cols)
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stacked}) AS (column_name, n_nonnull, n_distinct)"
        ),
        "n_rows",
    ).select("column_name", "n_rows", "n_nonnull", "n_distinct")


PROFILE_DOCUMENTS_COLS = ("doc_id", "text", "lang", "source", "n_chars")
PROFILE_EVENTS_COLS = ("event_id", "ts", "user_id", "event_type", "value")


def profile_orders(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Profile of the orders feed — the registry-exposed instance."""
    o = load_table(spark, sf_dir, "orders").select(*PROFILE_ORDERS_COLS)
    return profile_table(o, PROFILE_ORDERS_COLS)


def profile_documents(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Profile of the documents corpus feed."""
    d = load_table(spark, sf_dir, "documents").select(*PROFILE_DOCUMENTS_COLS)
    return profile_table(d, PROFILE_DOCUMENTS_COLS)


def profile_events(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Profile of the events feed (ts normalized first, so the profile is
    encoding-invariant like every other events consumer)."""
    from ..catalog import load_events

    ev = load_events(spark, sf_dir).select(*PROFILE_EVENTS_COLS)
    return profile_table(ev, PROFILE_EVENTS_COLS)
