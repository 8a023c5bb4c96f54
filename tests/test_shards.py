"""Training-shard writer (pipelines/shards.py): layout, bounds, ordering.

shard_manifest's value-parity runs in test_correctness_oracle; these tests
pin the SINK properties a training launcher depends on: hive-partitioned
directories, per-file record caps, doc_id order inside every file, and
agreement between what was written and what the manifest promised.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq

from data_pipeline__s3_to_postgres_s3_spark.pipelines.shards import (
    shard_manifest,
    write_training_shards,
)


def test_shard_layout_bounds_order_and_manifest_agreement(
    spark, sf_dir, tmp_path
):
    out = str(tmp_path / "shards")
    cap = 50
    write_training_shards(spark, sf_dir, out, max_records_per_file=cap)

    # Hive-partitioned split=/lang= layout.
    part_dirs = sorted(
        os.path.relpath(p, out)
        for p in glob.glob(f"{out}/split=*/lang=*")
    )
    assert part_dirs and all(
        d.startswith("split=") and "/lang=" in d for d in part_dirs
    )

    files = glob.glob(f"{out}/split=*/lang=*/*.parquet")
    written = 0
    for f in files:
        t = pq.read_table(f, columns=["doc_id"])
        assert t.num_rows <= cap  # maxRecordsPerFile respected
        ids = t.column("doc_id").to_pylist()
        assert ids == sorted(ids)  # doc_id-ordered within the file
        written += t.num_rows

    manifest = {
        (r["split"], r["lang"]): r["n_docs"]
        for r in shard_manifest(spark, sf_dir).collect()
    }
    assert written == sum(manifest.values())
    # Directory set == manifest key set.
    assert {
        (d.split("/")[0][6:], d.split("/")[1][5:]) for d in part_dirs
    } == set(manifest)

    # Round-trip read: partition columns come back, corpus is the kept set.
    back = spark.read.parquet(out)
    assert back.count() == written
    assert {"split", "lang", "doc_id", "text"} <= set(back.columns)


def test_manifest_agrees_with_split_and_gate_operators(spark, sf_dir):
    """shard_manifest duplicates the split arithmetic (pipelines/shards
    _split_col) and the keep predicate (curation.quality_gate) for its
    single-scan plan — pin its totals against a recomputation THROUGH the
    registry operators themselves, so either side drifting (new split
    constants, a changed gate threshold, a partitioning rework) breaks
    loudly here instead of silently skewing training mixtures."""
    from pyspark.sql import functions as F

    from data_pipeline__s3_to_postgres_s3_spark.catalog import load_table
    from data_pipeline__s3_to_postgres_s3_spark.operators.curation import (
        quality_gate,
    )
    from data_pipeline__s3_to_postgres_s3_spark.operators.sampling import (
        dataset_split,
    )

    docs = load_table(spark, sf_dir, "documents")
    kept = quality_gate(spark, sf_dir).where("keep").select("doc_id")
    splits = dataset_split(spark, sf_dir).select("doc_id", "split")
    n_tokens = F.array_size(F.split(F.col("text"), " ")).cast("long")
    expected = (
        docs.join(kept, "doc_id")
        .join(splits, "doc_id")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(n_tokens).alias("total_tokens"),
            F.sum(F.length("text").cast("long")).alias("total_chars"),
        )
    )

    def as_map(df):
        return {
            (r["split"], r["lang"]): (
                r["n_docs"], r["total_tokens"], r["total_chars"]
            )
            for r in df.collect()
        }

    actual = as_map(shard_manifest(spark, sf_dir))
    assert actual == as_map(expected)
    assert sum(v[0] for v in actual.values()) > 0
