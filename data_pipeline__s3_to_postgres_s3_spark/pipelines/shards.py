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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..config import DEFAULT_CONFIG, EngineConfig
from ..operators.curation import quality_gate
from ..operators.sampling import (
    HASH_MOD,
    HASH_MULT,
    SPLIT_BUCKETS,
    TRAIN_UPTO,
    VAL_UPTO,
)

SHARD_MAX_RECORDS = 200  # per-file record cap (tiny for the harness corpus)


def _split_col() -> F.Column:
    b = (F.col("doc_id") * HASH_MULT) % HASH_MOD % SPLIT_BUCKETS
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
