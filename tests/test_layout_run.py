"""Composed layout-maintenance pipeline (pipelines/layout_run.py):
one call writes the Z-ordered orders layout + compacts the shard tree
and reports the accounting; every number must reconcile with the
standalone oracle-checked queries it composes.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from data_pipeline__s3_to_postgres_s3_spark.pipelines.layout_run import (
    run_layout_maintenance,
)


def test_run_layout_maintenance_end_to_end(spark, sf_dir, tmp_path):
    # Fragment hard (50-doc shards) so compaction has real work at sf.
    rep = run_layout_maintenance(
        spark, sf_dir, str(tmp_path), shard_max_records=50
    )
    # Compaction really compacted.
    assert 0 < rep["shard_files_after"] < rep["shard_files_before"]
    # Plan-vs-totals reconciliation: the compact plan accounts for every
    # kept doc the shard totals report, per (split, lang).
    totals = {
        (r["split"], r["lang"]): r["n_docs"] for r in rep["shard_totals"]
    }
    planned: dict = {}
    for r in rep["compact_plan"]:
        k = (r["split"], r["lang"])
        planned[k] = planned.get(k, 0) + r["n_docs"]
    assert planned == totals
    # The physical Z-order write matches its manifest: one non-empty file
    # per populated cell, total rows conserved.
    z_files = [
        f
        for f in glob.glob(rep["paths"]["orders_zordered"] + "/part-*.parquet")
        if pq.ParquetFile(f).metadata.num_rows > 0
    ]
    manifest = rep["zorder_manifest"]
    assert len(z_files) == len(manifest)
    n_manifest = sum(r["n_rows"] for r in manifest)
    n_files = sum(pq.ParquetFile(f).metadata.num_rows for f in z_files)
    assert n_files == n_manifest
    # Compacted shards are doc_id-ordered and bounded (spot-check one dir).
    some = sorted(
        glob.glob(
            rep["paths"]["shards_compacted"] + "/split=*/lang=*/part-*.parquet"
        )
    )[:3]
    for f in some:
        t = pq.read_table(f, columns=["doc_id"])
        ids = t.column("doc_id").to_pylist()
        assert ids == sorted(ids)
