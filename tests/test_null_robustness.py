"""Null-value axis of the driver re-encode/robustness matrix (round 6):
the differential gate must stay green when the regenerated documents
table carries NULL text / lang / source / n_chars rows. The probe that
built this test caught two real divergences: Spark null-propagates
bigram counts where DuckDB's greatest() ignores the NULL operand and
yields 0 (doc_repetition), and DuckDB's unnest of a NULL token list
emits zero rows, silently dropping the doc from the oracle
(ccnet_quality_buckets) — both fixed with a mirrored
coalesce(text, '') so NULL text means the empty document on BOTH
engines.
"""

from __future__ import annotations

import pytest

from data_pipeline__s3_to_postgres_s3_spark.registry import ORACLES, QUERIES

from .oracle_harness import compare, duckdb_connection
from .matrix_budget import subset  # noqa: E402

QUERIES_UNDER_TEST = [
    "dedup_exact",
    # r11: the re-ingest repair under NULL fields — NULL doc_id rows
    # quarantine (mirrored), NULL payload fields group as equal rows on
    # both engines.
    "repair_documents_reingest",
    # r9: NULL text = zero tokens via the mirrored coalesce; the CMS
    # census and probe must agree on the empty-token drop.
    "heavy_hitters_cms",
    "stream_heavy_hitters",
    "corpus_stats",
    "dataset_card",
    "per_source_report",
    "doc_repetition",
    "text_quality",
    "gopher_quality",
    "gopher_repetition",
    "ccnet_quality_buckets",
    "line_dedup",
    "chunk_documents",
    "dedup_minhash_lsh",
    "exact_span_dedup",
    # r7: nests quality_gate (NULL text = empty doc) + the BM25 channel.
    "curation_funnel",
    "rrf_hybrid_topk",
    # r8: NULL text must still count toward the batch doc census
    # (keep_empty pass) / contribute zero pre-tokens (coalesce).
    "ngram_novelty_timeline",
    "bpe_merge_census",
    # r8: nests the quality gate's kept corpus — NULL-text docs are
    # gate-dropped on both engines before the file census.
    "compact_manifest",
    # r8: NULL text through the STREAM reader and the row gates.
    "stream_quality_gate",
    # r8b: NULL text/source rows must still land in a gate bucket.
    "source_quality_matrix",
    # r8c: NULL text = empty doc = no bigrams — the doc must vanish from
    # the report identically on both engines (mirrored coalesce).
    "ngram_lm_perplexity",
    "bigram_pmi_topk",
    # r8c: NULL source must fold into the '' group, not vanish.
    "source_unigram_kl",
]


@pytest.fixture(scope="module")
def nullish_docs_dir(spark, sf_small, tmp_path_factory):
    import shutil

    from data_pipeline__s3_to_postgres_s3_spark.catalog import TABLES

    d = tmp_path_factory.mktemp("null_docs")
    for t in TABLES:
        if t != "documents":
            shutil.copy(f"{sf_small}/{t}.parquet", str(d / f"{t}.parquet"))
    rows = [
        (1, "alpha beta gamma delta epsilon", "en", "web", 30),
        (2, None, "en", "web", 0),          # NULL text
        (3, "x y z", None, None, 5),        # NULL lang/source
        (4, None, None, None, None),        # everything NULL
        (5, "", "de", "books", 0),          # empty (distinct from NULL)
        (6, "alpha beta gamma delta epsilon", "en", "web", 30),  # dup
    ]
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = list(zip(*rows))
    table = pa.table(
        {
            "doc_id": pa.array(cols[0], pa.int64()),
            "text": pa.array(cols[1], pa.string()),
            "lang": pa.array(cols[2], pa.string()),
            "source": pa.array(cols[3], pa.string()),
            "n_chars": pa.array(cols[4], pa.int64()),
        }
    )
    pq.write_table(table, str(d / "documents.parquet"))
    return str(d)


@pytest.mark.parametrize("name", subset(QUERIES_UNDER_TEST, keep=(), k=3))
def test_oracle_gate_green_under_null_documents(spark, nullish_docs_dir, name):
    con = duckdb_connection(nullish_docs_dir)
    try:
        report = compare(
            QUERIES[name](spark, nullish_docs_dir), con, ORACLES[name]
        )
        assert report["ok"], f"{name} under NULL document fields: {report}"
    finally:
        con.close()


def test_media_features_runs_under_null_documents(spark, nullish_docs_dir):
    """media_features is rows-only (no SQL oracle), so the matrix pins
    run-ability: a NULL-text source doc becomes a NULL payload, which
    must decode as the empty asset instead of aborting the Arrow worker
    (bytes(None) — r6 probe)."""
    from data_pipeline__s3_to_postgres_s3_spark.registry import QUERIES

    rows = {r["doc_id"]: r for r in QUERIES["media_features"](
        spark, nullish_docs_dir).collect()}
    assert len(rows) == 6
    for d in (2, 4):  # the NULL-text docs
        assert rows[d]["n_bytes"] == 0
        assert rows[d]["mean_byte"] == 0.0
