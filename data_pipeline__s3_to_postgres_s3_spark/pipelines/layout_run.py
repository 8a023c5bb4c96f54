"""Composed table-maintenance run: the OPTIMIZE job a lakehouse scheduler
fires nightly, as ONE call — Z-order the orders table for bi-dimensional
scan pruning and compact the training-shard tree back to healthy file
sizes, returning the accounting a maintenance dashboard ingests.

Composition, not re-implementation (run_curation precedent): the physical
steps ARE operators.layout.write_zordered and pipelines.shards
.compact_shards, and the report rows ARE the oracle-checked
zorder_manifest / compact_manifest queries — the planned layout and the
written layout can never drift because they share the cell-assignment and
bin-packing expressions verbatim.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import SparkSession

from ..operators.layout import write_zordered, zorder_manifest
from .shards import (
    COMPACT_MAX_RECORDS,
    compact_manifest,
    compact_shards,
    shard_manifest,
    write_training_shards,
)


def _tree_file_count(root: str) -> int:
    return len(
        [
            f
            for f in glob.glob(
                os.path.join(root, "**", "part-*.parquet"), recursive=True
            )
        ]
    )


def run_layout_maintenance(
    spark: SparkSession,
    sf_dir: str,
    out_root: str,
    shard_max_records: int = 200,
    compact_max_records: int = COMPACT_MAX_RECORDS,
) -> dict:
    """One maintenance pass: write the Z-ordered orders layout, write the
    (deliberately fragmented) training shards, compact them, and return
    the accounting: the Z-order manifest rows, the compaction plan rows,
    and before/after physical file counts.

    Scale shape: three independent write jobs (zorder = one shuffle into
    |cells| partitions + in-task sort; shards = one repartition on the
    partition keys; compact = the same on the written tree) plus two
    metadata-sized report queries — nothing here adds a pass over the
    data beyond the writes themselves."""
    orders_z = os.path.join(out_root, "orders_zordered")
    shards_raw = os.path.join(out_root, "shards")
    shards_compact = os.path.join(out_root, "shards_compacted")

    write_zordered(spark, sf_dir, orders_z)
    write_training_shards(
        spark, sf_dir, shards_raw, max_records_per_file=shard_max_records
    )
    files_before = _tree_file_count(shards_raw)
    compact_shards(
        spark, shards_raw, shards_compact,
        max_records_per_file=compact_max_records,
    )
    files_after = _tree_file_count(shards_compact)

    return {
        "zorder_manifest": sorted(
            (r.asDict() for r in zorder_manifest(spark, sf_dir).collect()),
            key=lambda r: r["file_id"],
        ),
        "compact_plan": sorted(
            (r.asDict() for r in compact_manifest(spark, sf_dir).collect()),
            key=lambda r: (r["split"], r["lang"], r["action"], r["bin_id"]),
        ),
        "shard_totals": sorted(
            (r.asDict() for r in shard_manifest(spark, sf_dir).collect()),
            key=lambda r: (r["split"], r["lang"]),
        ),
        "shard_files_before": files_before,
        "shard_files_after": files_after,
        "paths": {
            "orders_zordered": orders_z,
            "shards": shards_raw,
            "shards_compacted": shards_compact,
        },
    }
