"""Data-layout optimization: Z-order (Morton) clustering manifest.

At 100 TB the cheapest query is the one that never reads the file: a
scan with a predicate on o_custkey OR o_orderdate skips every file whose
min/max range excludes the value — but only if the layout co-clusters
BOTH dimensions. Linear ordering by one column gives perfect pruning on
it and none on the other; interleaving the bits of both (the Morton /
Z-order curve — the same layout Delta's OPTIMIZE ZORDER BY and
Hudi/Iceberg clustering write) gives near-√ pruning on each.

``zorder_manifest`` computes the layout plan: normalize each dimension
to a 16-bit integer grid (min/max census → two broadcast scalar
literals, the watermark-read precedent), interleave the bits into a
32-bit Morton key with pure integer shift/mask expressions (whole-stage
codegen, zero Python), shard the curve into Z_FILES files by the key's
TOP bits (a fixed-width range split of the curve — zero-shuffle file
assignment), and emit the per-file manifest: row count + min/max of
both dimensions — exactly the footer stats a reader's data-skipping
consults. ``write_zordered`` is the physical step: repartitionByRange
on the same key + sortWithinPartitions, a standard distributed sort.

Everything is integer arithmetic until the output (dates surface as
DATE), so the DuckDB oracle is bit-identical by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..config import DEFAULT_CONFIG, EngineConfig

Z_BITS = 16  # per-dimension grid resolution
Z_FILES_LOG2 = 4  # 16 files: split the curve on the key's top 4 bits
# Date anchor for day-integer coordinates; any fixed date works (the
# min/max census re-centers), epoch keeps both engines' datediff trivial.
Z_EPOCH = "1970-01-01"


def _morton_sql(x: str, y: str) -> str:
    """32-bit Morton interleave of two Z_BITS-bit ints: x in odd bit
    positions (dominant), y in even — identical token stream in Spark SQL
    and DuckDB (both support >> & << on bigints). Inputs are forced to
    BIGINT inside: an INT operand would make Spark evaluate the shifts in
    32 bits and wrap the top bit (z 0xFFFFFFFF → -1)."""
    xb, yb = f"CAST({x} AS BIGINT)", f"CAST({y} AS BIGINT)"
    terms = []
    for i in range(Z_BITS):
        terms.append(f"((({xb} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({yb} >> {i}) & 1) << {2 * i})")
    return " + ".join(terms)


def zorder_manifest(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Z-order layout manifest for orders clustered on
    (o_custkey, o_orderdate): per-file row counts and min/max extents of
    both dimensions after sharding the Morton curve into Z_FILES files.

    The narrow per-file ranges on BOTH columns are the deliverable — they
    are what makes a predicate on either column skip ~(1 - 1/√F) of the
    files, vs. no skipping at all on the non-sort column of a linear
    layout."""
    orders = load_table(spark, sf_dir, "orders")
    # datediff yields INT; the grid product (span · 65535) overflows
    # int32 for multi-century spans under ANSI — stay in bigint.
    day = F.datediff(F.to_date("o_orderdate"), F.lit(Z_EPOCH)).cast("long")
    base = orders.select(
        F.col("o_custkey").alias("ck"),
        day.alias("dy"),
        F.to_date("o_orderdate").alias("od"),
    )
    # Min/max census → four scalar literals (watermark-read precedent):
    # the normalization grid must be corpus-derived, never hardcoded, so
    # the operator survives a driver data regeneration and real key
    # ranges alike.
    mm = base.agg(
        F.min("ck").alias("ck_min"),
        F.max("ck").alias("ck_max"),
        F.min("dy").alias("dy_min"),
        F.max("dy").alias("dy_max"),
    ).collect()[0]
    ck_span = max(int(mm["ck_max"]) - int(mm["ck_min"]), 1)
    dy_span = max(int(mm["dy_max"]) - int(mm["dy_min"]), 1)
    grid = (1 << Z_BITS) - 1
    x = f"((ck - {int(mm['ck_min'])}) * {grid}) div {ck_span}"
    y = f"((dy - {int(mm['dy_min'])}) * {grid}) div {dy_span}"
    z = F.expr(_morton_sql(f"({x})", f"({y})"))
    # NULL-key rows (orders-NULL robustness axis) have no place on the
    # curve: z NULL-propagates and they land in sentinel file -1 — the
    # "stats unavailable, never skip" file a real reader treats as
    # always-scan. Extents mirror-coalesce to sentinels so no engine
    # materializes a NULL aggregate (NaN-hash trap).
    file_id = F.coalesce(
        F.shiftright(F.col("z"), 2 * Z_BITS - Z_FILES_LOG2).cast("int"),
        F.lit(-1),
    )
    return (
        base.withColumn("z", z)
        .select(file_id.alias("file_id"), "ck", "od", "z")
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.coalesce(F.min("ck"), F.lit(-1)).alias("min_custkey"),
            F.coalesce(F.max("ck"), F.lit(-1)).alias("max_custkey"),
            F.coalesce(
                F.min("od"), F.to_date(F.lit(Z_EPOCH))
            ).alias("min_orderdate"),
            F.coalesce(
                F.max("od"), F.to_date(F.lit(Z_EPOCH))
            ).alias("max_orderdate"),
            F.coalesce(F.min("z"), F.lit(-1)).alias("min_z"),
            F.coalesce(F.max("z"), F.lit(-1)).alias("max_z"),
        )
    )


def write_zordered(
    spark: SparkSession,
    sf_dir: str,
    out_path: str,
    n_files: int = 1 << Z_FILES_LOG2,
) -> None:
    """Physically write orders in Z-order: the layout step itself.

    repartitionByRange(n_files, z) is Spark's distributed equal-frequency
    range split (sample-based boundaries — a standard total-sort exchange,
    no single-partition stage at any scale) and sortWithinPartitions(z)
    makes every row-group footer's min/max tight, so a reader's
    data-skipping gets the pruning the manifest predicts. The z key is
    computed by the same census + Morton expressions as zorder_manifest
    and dropped from the written schema — layout is physical, the table
    stays the table."""
    orders = load_table(spark, sf_dir, "orders")
    day = F.datediff(F.to_date("o_orderdate"), F.lit(Z_EPOCH)).cast("long")
    keyed = orders.withColumn("_ck", F.col("o_custkey")).withColumn(
        "_dy", day
    )
    mm = keyed.agg(
        F.min("_ck").alias("ck_min"),
        F.max("_ck").alias("ck_max"),
        F.min("_dy").alias("dy_min"),
        F.max("_dy").alias("dy_max"),
    ).collect()[0]
    ck_span = max(int(mm["ck_max"]) - int(mm["ck_min"]), 1)
    dy_span = max(int(mm["dy_max"]) - int(mm["dy_min"]), 1)
    grid = (1 << Z_BITS) - 1
    x = f"((_ck - {int(mm['ck_min'])}) * {grid}) div {ck_span}"
    y = f"((_dy - {int(mm['dy_min'])}) * {grid}) div {dy_span}"
    z = F.expr(_morton_sql(f"({x})", f"({y})"))
    (
        keyed.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_ck", "_dy", "_z")
        .write.mode("overwrite")
        .parquet(out_path)
    )
