"""End-to-end pin for pipelines/curation_run.run_curation: the composed
funnel must reconcile exactly with the standalone operators it reuses,
and the written shards must match the returned metrics."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline__s3_to_postgres_s3_spark.operators.curation import quality_gate
from data_pipeline__s3_to_postgres_s3_spark.operators.dedup import dedup_exact
from data_pipeline__s3_to_postgres_s3_spark.operators.sampling import (
    chunk_documents,
    dataset_split,
)
from data_pipeline__s3_to_postgres_s3_spark.pipelines.curation_run import (
    run_curation,
)


def test_curation_run_reconciles_with_standalone_ops(spark, sf_dir, tmp_path):
    out = str(tmp_path / "shards")
    m = run_curation(spark, sf_dir, out)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert m["n_docs_total"] == docs.count()

    gated = {r["doc_id"] for r in quality_gate(spark, sf_dir).where("keep").select("doc_id").collect()}
    assert m["n_docs_gated"] == len(gated)

    canonical = {
        r["canonical_doc_id"] for r in dedup_exact(spark, sf_dir).collect()
    }
    written_expected = gated & canonical
    assert m["n_docs_written"] == len(written_expected)

    # Shards on disk == metrics, and every chunk belongs to a written doc
    # in its hash-assigned split partition.
    shards = spark.read.parquet(out)
    assert shards.count() == m["n_chunks"]
    split_of = {
        r["doc_id"]: r["split"] for r in dataset_split(spark, sf_dir).collect()
    }
    rows = shards.select("doc_id", "split", "chunk_idx").collect()
    assert {r["doc_id"] for r in rows} == written_expected
    for r in rows:
        assert split_of[r["doc_id"]] == r["split"]

    # Chunk rows agree with the standalone chunker restricted to kept docs.
    standalone = (
        chunk_documents(spark, sf_dir)
        .where(F.col("doc_id").isin(list(written_expected)))
        .count()
    )
    assert standalone == m["n_chunks"]

    # Funnel is monotone and the per-split sections re-add to the totals.
    assert m["n_docs_total"] >= m["n_docs_gated"] >= m["n_docs_written"]
    assert sum(v["n_chunks"] for v in m["per_split"].values()) == m["n_chunks"]
    assert sum(v["n_tokens"] for v in m["per_split"].values()) == m["n_tokens"]


def test_incremental_curation_equals_full_rerun(spark, sf_dir, tmp_path):
    """Bootstrap on the old half (doc_id ≤ median), then incremental over
    the new half, must produce EXACTLY the shards of a full run over the
    whole corpus — the idempotent-equivalence property that makes the
    watermark pattern safe for a growing corpus (row gates are
    subset-invariant; cross-boundary dedup via the history hash
    anti-join replicates the global canonical election)."""
    from data_pipeline__s3_to_postgres_s3_spark.pipelines.curation_run import (
        run_curation_incremental,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    watermark = ids[len(ids) // 2]

    out_full = str(tmp_path / "full")
    run_curation(spark, sf_dir, out_full)

    # Bootstrap: a corpus dir holding only the history slice.
    old_dir = tmp_path / "old_corpus"
    old_dir.mkdir()
    docs.where(F.col("doc_id") <= watermark).write.parquet(
        str(old_dir / "documents.parquet")
    )
    out_staged = str(tmp_path / "staged")
    run_curation(spark, str(old_dir), out_staged)
    inc = run_curation_incremental(
        spark, sf_dir, out_staged, watermark_doc_id=watermark
    )
    assert inc["n_docs_written"] >= 1  # the increment did real work

    full_rows = sorted(map(tuple, spark.read.parquet(out_full).collect()))
    staged_rows = sorted(map(tuple, spark.read.parquet(out_staged).collect()))
    assert full_rows == staged_rows


def test_run_curation_gopher_gate_composes(spark, sf_dir, tmp_path):
    """apply_gopher=True must AND the Gopher verdicts into the funnel:
    written docs ⊆ the default run's docs, and the count equals the
    intersection of quality_gate keeps, gopher passes, and canonical ids
    (all three surfaces recomputed independently here)."""
    from data_pipeline__s3_to_postgres_s3_spark.operators.curation import (
        gopher_quality,
        quality_gate,
    )
    from data_pipeline__s3_to_postgres_s3_spark.operators.dedup import (
        dedup_exact,
    )
    from data_pipeline__s3_to_postgres_s3_spark.pipelines.curation_run import (
        run_curation,
    )

    base = run_curation(spark, sf_dir, str(tmp_path / "base"))
    gated = run_curation(
        spark, sf_dir, str(tmp_path / "gopher"), apply_gopher=True
    )
    assert gated["n_docs_written"] <= base["n_docs_written"]

    keeps = {
        r["doc_id"] for r in quality_gate(spark, sf_dir).where("keep").collect()
    }
    passes = {
        r["doc_id"]
        for r in gopher_quality(spark, sf_dir).where("gopher_pass").collect()
    }
    canon = {
        r["canonical_doc_id"] for r in dedup_exact(spark, sf_dir).collect()
    }
    assert gated["n_docs_written"] == len(keeps & passes & canon)
    assert base["n_docs_written"] == len(keeps & canon)
