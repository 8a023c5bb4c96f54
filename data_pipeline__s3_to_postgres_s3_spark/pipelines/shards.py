"""Training-shard output stage: the sink at the end of the curation funnel.

A training job wants shards that are (a) partitioned by (split, lang) so a
mixture sampler can open exactly the files it needs, (b) bounded in size so
no reader deserializes a monster file, and (c) internally ordered so runs
are reproducible. `write_training_shards` produces that layout from the
quality-gated corpus; `shard_manifest` is the queryable twin — the per-
(split, lang) accounting a training launcher reads BEFORE touching data.

Scale notes (100 TB):
- One repartition on (split, lang) co-locates each output partition's rows
  into one task, so partitionBy doesn't fan every task out into every
  directory (the classic small-files explosion: tasks × partitions files).
  With skewed languages, raise the partition count via a salt column and
  accept a few files per directory — the knob is `shard_tasks`.
- sortWithinPartitions costs a per-task sort, no extra shuffle; combined
  with maxRecordsPerFile it yields deterministic, doc_id-ordered,
  bounded files.
- shard_manifest is the same single-scan gate projection as quality_gate
  plus one partial-aggregated groupBy — no join against a second scan of
  the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..config import DEFAULT_CONFIG, EngineConfig
from ..operators.curation import quality_gate
from ..operators.sampling import (
    SPLIT_BUCKETS,
    TRAIN_UPTO,
    VAL_UPTO,
    split_hash,
)

SHARD_MAX_RECORDS = 200  # per-file record cap (tiny for the harness corpus)


def _split_col() -> F.Column:
    b = split_hash(F.col("doc_id")) % SPLIT_BUCKETS
    return (
        F.when(b < TRAIN_UPTO, "train").when(b < VAL_UPTO, "val").otherwise("test")
    )


def _kept_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    keep = quality_gate(spark, sf_dir).where("keep").select("doc_id")
    return docs.join(keep, "doc_id").withColumn("split", _split_col())


def write_training_shards(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    max_records_per_file: int = SHARD_MAX_RECORDS,
    shard_tasks: int | None = None,
) -> None:
    """Write the quality-gated corpus as out_dir/split=…/lang=…/*.parquet,
    doc_id-ordered within every file, ≤ max_records_per_file rows each."""
    kept = _kept_docs(spark, sf_dir)
    if shard_tasks:
        kept = kept.repartition(shard_tasks, "split", "lang")
    else:
        kept = kept.repartition("split", "lang")
    (
        kept.sortWithinPartitions("split", "lang", "doc_id")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", str(max_records_per_file))
        .partitionBy("split", "lang")
        .parquet(out_dir)
    )


def shard_manifest(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Per-(split, lang) accounting of the kept corpus: doc/token/char
    totals — what a training launcher reads to budget a mixture."""
    kept = _kept_docs(spark, sf_dir)
    n_tokens = F.array_size(F.split(F.col("text"), " ")).cast("long")
    return kept.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tokens).alias("total_tokens"),
        F.sum(F.length("text").cast("long")).alias("total_chars"),
    )


# ---------------------------------------------------------------------------
# Compaction: the OPTIMIZE half of the layout family. An incrementally-
# appended table accumulates small files (every micro-batch / daily append
# writes its own); a reader then pays per-file open + footer costs that
# dwarf the data. compact_manifest PLANS the merge (which files bin
# together, what comes out); compact_shards performs the physical rewrite.

# Target output size for merged files. Files at or above it are already
# healthy and are kept as-is (rewriting them would be pure write
# amplification — the thing a real OPTIMIZE avoids most).
COMPACT_TARGET_BYTES = 256_000
# Physical rewrite's record bound (5× the shard writer's cap: merge ~5
# appends per output file at the harness corpus shape).
COMPACT_MAX_RECORDS = 1_000


def _pack_files(files: DataFrame, target_bytes: int = COMPACT_TARGET_BYTES) -> DataFrame:
    """Bin-pack a file census into compaction bins, NEXT-FIT in file
    order: small files (< target) merge with their neighbours — the bin
    closes when the running byte total crosses a target multiple — and
    large files are kept untouched as singleton bins.

    Next-fit-in-order rather than best-fit-by-size is deliberate: input
    files are doc_id-contiguous (the shard writer sorts), so contiguous
    bins PRESERVE the clustering — compaction never destroys the
    zone-map locality the layout family bought. It is also the packing
    a window cumsum expresses exactly, so the DuckDB oracle is
    bit-identical (first/best-fit need a sequential loop).

    Input census schema: (split, lang, file_idx, fn_docs, fbytes,
    fdoc_min, fdoc_max). Scale shape: one window per (split, lang)
    partition over FILE rows (the census is metadata — millions of
    files, not rows), then a groupBy on the bin key."""
    small = files.where(F.col("fbytes") < target_bytes)
    pack_w = (
        Window.partitionBy("split", "lang")
        .orderBy("file_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_prev = F.coalesce(
        F.sum("fbytes").over(pack_w), F.lit(0).cast("long")
    )
    merged = small.select(
        "split",
        "lang",
        "file_idx",
        "fn_docs",
        "fbytes",
        "fdoc_min",
        "fdoc_max",
        cum_prev.cast("long").alias("_cum_prev"),
    )
    merged = merged.select(
        "*",
        F.expr(f"_cum_prev div {target_bytes}").alias("bin_id"),
        F.lit("merge").alias("action"),
    ).drop("_cum_prev")
    kept_as_is = files.where(F.col("fbytes") >= target_bytes).select(
        "*",
        F.col("file_idx").alias("bin_id"),
        F.lit("keep").alias("action"),
    )
    binned = merged.unionByName(kept_as_is)
    return binned.groupBy("split", "lang", "action", "bin_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum("fn_docs").cast("long").alias("n_docs"),
        F.sum("fbytes").cast("long").alias("est_bytes"),
        F.min("fdoc_min").alias("first_doc"),
        F.max("fdoc_max").alias("last_doc"),
    )


def compact_manifest(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Compaction plan over the incremental shard layout: the file census
    write_training_shards produces (per-(split, lang) doc_id-ordered
    chunks of SHARD_MAX_RECORDS docs — each append's file), bin-packed by
    byte size into merge bins / kept-as-is files (see _pack_files). One
    row per OUTPUT file of the compacted layout: its input file count,
    docs, bytes, and doc_id range.

    Scale shape: everything from the census on operates on FILE rows —
    metadata, not data — and at production scale the census itself comes
    from metadata too: a real table's file list (parquet footers /
    catalog manifest) goes straight into ``_pack_files``, which is the
    actual planning entrypoint and never sees a document. The per-doc
    row_number window below exists only to DERIVE that census from raw
    docs in the harness (where no standing file manifest exists); its
    per-(split, lang) sort would be the skewed-partition bottleneck at
    100 TB precisely because it recomputes what the writer's manifest
    already knows — the dispatch is: have a manifest, skip the window."""
    kept = _kept_docs(spark, sf_dir)
    doc_w = Window.partitionBy("split", "lang").orderBy("doc_id")
    per_doc = kept.select(
        "split",
        "lang",
        "doc_id",
        F.length("text").cast("long").alias("nb"),
        (F.row_number().over(doc_w).cast("long") - F.lit(1)).alias("_rn0"),
    ).select(
        "split",
        "lang",
        "doc_id",
        "nb",
        F.expr(f"_rn0 div {SHARD_MAX_RECORDS}").alias("file_idx"),
    )
    files = per_doc.groupBy("split", "lang", "file_idx").agg(
        F.count(F.lit(1)).cast("long").alias("fn_docs"),
        F.sum("nb").cast("long").alias("fbytes"),
        F.min("doc_id").alias("fdoc_min"),
        F.max("doc_id").alias("fdoc_max"),
    )
    return _pack_files(files)


def compact_shards(
    spark: SparkSession,
    shard_dir: str,
    out_dir: str,
    max_records_per_file: int = COMPACT_MAX_RECORDS,
) -> None:
    """Physical compaction: rewrite a small-files shard tree (as produced
    by write_training_shards) into merged, bounded, doc_id-ordered files
    under the same split=…/lang=… layout. One repartition on the
    partition keys (each directory's rows co-locate into one task — no
    tasks×partitions file explosion) + an in-task sort; maxRecordsPerFile
    re-splits only what exceeds the bound."""
    df = spark.read.parquet(shard_dir)
    (
        df.repartition("split", "lang")
        .sortWithinPartitions("split", "lang", "doc_id")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", str(max_records_per_file))
        .partitionBy("split", "lang")
        .parquet(out_dir)
    )
