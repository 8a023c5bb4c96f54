"""JDBC sink/source with the reference's incremental-load semantics.

Reference behavior being re-expressed (SURVEY.md S3/S4/S8, A7, J7):
- max-PK high-watermark append (extract_load_transform_data_pipeline.py.py:
  82-107): read MAX(pk) from the destination, keep source rows above it,
  append. The watermark read is pushed down as a 1-row aggregate query; the
  source filter is a pushed predicate — no full-table reads anywhere.
- append-only load for keyless tables (reviews, ibid. :109-113).
- full-replace sink (tripdata_monthly_metrics.py:102-117) → mode(overwrite)
  with truncate=true so the table is truncated, not dropped (keeps grants).

At scale, JDBC writes go through numPartitions concurrent connections with
batchsize'd inserts; the general upsert (non-monotone keys) is the
anti-join variant (operators/watermark.py) followed by append.

No JDBC driver jar ships in this environment, so everything network-facing
is parameterized and the pure logic (watermark filter plan construction) is
unit-tested against in-memory frames.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Identifiers reaching the watermark subquery are interpolated into SQL, so
# they must be plain (optionally schema-qualified) names — never arbitrary
# strings. Matches `orders`, `staging.orders`; rejects quotes/spaces/
# semicolons outright.
_IDENTIFIER = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*)?$")


def _check_identifier(name: str, what: str) -> str:
    if not _IDENTIFIER.match(name):
        raise ValueError(f"{what} {name!r} is not a valid SQL identifier")
    return name


@dataclass(frozen=True)
class JdbcTarget:
    url: str  # e.g. jdbc:postgresql://host:5432/db
    table: str  # e.g. staging.orders
    properties: dict = field(default_factory=dict)
    num_partitions: int = 8
    batch_size: int = 10_000

    def options(self) -> dict[str, str]:
        return {
            "url": self.url,
            "dbtable": self.table,
            "numPartitions": str(self.num_partitions),
            "batchsize": str(self.batch_size),
            **{k: str(v) for k, v in self.properties.items()},
        }


def read_watermark(spark: SparkSession, target: JdbcTarget, pk: str) -> int:
    """COALESCE(MAX(pk), 0) from the destination — pushed down as a 1-row
    subquery, mirroring extract_load_transform_data_pipeline.py.py:95-98.

    Deliberate departures from the reference: CAST AS BIGINT (the
    reference's `CAST(... AS INT)` silently truncates 64-bit keys — at
    100 TB order_id is bigint-scale, and a truncated watermark re-appends
    duplicate rows), and both identifiers are validated before
    interpolation (no raw-string SQL injection path)."""
    pk = _check_identifier(pk, "primary key column")
    table = _check_identifier(target.table, "table")
    # ANSI-quote the column: Spark's JDBC writer creates columns QUOTED
    # (case-sensitive in Derby/Postgres/Oracle), so an unquoted reference
    # would case-fold past them. The table name stays unquoted — Spark
    # embeds `dbtable` verbatim when creating, so round-trips symmetric.
    subq = (
        f'(SELECT COALESCE(MAX(CAST("{pk}" AS BIGINT)), 0) AS wm '
        f"FROM {table}) AS wm_sub"
    )
    df = spark.read.format("jdbc").options(**{**target.options(), "dbtable": subq}).load()
    # Positional: result-column casing is driver-dependent (Derby: WM).
    return df.collect()[0][0]


def filter_above_watermark(source: DataFrame, pk: str, watermark: int) -> DataFrame:
    """The incremental slice (pushed-down predicate on the source scan)."""
    return source.where(F.col(pk) > F.lit(watermark))


def append_incremental(
    spark: SparkSession, source: DataFrame, target: JdbcTarget, pk: str
) -> None:
    wm = read_watermark(spark, target, pk)
    (
        filter_above_watermark(source, pk, wm)
        .write.format("jdbc")
        .options(**target.options())
        .mode("append")
        .save()
    )


def append_all(source: DataFrame, target: JdbcTarget) -> None:
    """Keyless append-only load (reviews semantics — duplicates allowed)."""
    source.write.format("jdbc").options(**target.options()).mode("append").save()


def overwrite_table(source: DataFrame, target: JdbcTarget) -> None:
    """Full-replace sink (reference S8); truncate keeps DDL/grants."""
    (
        source.write.format("jdbc")
        .options(**{**target.options(), "truncate": "true"})
        .mode("overwrite")
        .save()
    )


def read_partitioned(
    spark: SparkSession,
    target: JdbcTarget,
    pk: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Range-partitioned parallel JDBC read — the scale path the
    reference's single-cursor extract lacks (its pandas read pulls the
    whole table through one connection,
    extract_load_transform_data_pipeline.py.py:73 /
    tripdata_monthly_metrics.py:79): Spark opens numPartitions
    connections, each scanning one pk range, so ingest parallelism and
    memory are bounded per executor instead of per job.

    The bounds come from a pushed-down 1-row MIN/MAX subquery (same shape
    as read_watermark). Spark's stride split assigns every row to exactly
    one partition — rows below lowerBound land in the first and above
    upperBound in the last, so the read is complete even if the table
    grows between the bounds query and the scan (new higher keys fold
    into the last range). Skewed keys skew ranges; for non-uniform pks a
    production deployment partitions on a hashed or derived column
    instead — the option plumbing is identical."""
    pk = _check_identifier(pk, "primary key column")
    table = _check_identifier(target.table, "table")
    bounds_q = (
        f'(SELECT COALESCE(MIN(CAST("{pk}" AS BIGINT)), 0) AS lo, '
        f'COALESCE(MAX(CAST("{pk}" AS BIGINT)), 0) AS hi '
        f"FROM {table}) AS b_sub"
    )
    lo, hi = (
        spark.read.format("jdbc")
        .options(**{**target.options(), "dbtable": bounds_q})
        .load()
        .collect()[0]
    )
    n = num_partitions or target.num_partitions
    return (
        spark.read.format("jdbc")
        .options(
            **{
                **target.options(),
                "partitionColumn": f'"{pk}"',
                "lowerBound": str(lo),
                "upperBound": str(max(hi, lo + 1)),
                "numPartitions": str(n),
            }
        )
        .load()
    )
