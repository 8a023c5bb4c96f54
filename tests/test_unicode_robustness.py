"""Unicode axis of the driver robustness matrix (round 6): the
differential gate must stay green when the regenerated documents carry
non-ASCII text — accented Latin, CJK, and non-BMP emoji. The hazards
this sweeps: codepoint-vs-code-unit string indexing (length/substring/
split('')), md5-over-UTF-8-bytes equality, and regex classes on
non-ASCII input. Probed green across the whole family (r6); this pins
it so a Spark or DuckDB upgrade that changes string semantics surfaces
here instead of in the driver.
"""

from __future__ import annotations

import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_pipeline__s3_to_postgres_s3_spark.catalog import TABLES
from data_pipeline__s3_to_postgres_s3_spark.registry import ORACLES, QUERIES

from .oracle_harness import compare, duckdb_connection
from .matrix_budget import subset  # noqa: E402

QUERIES_UNDER_TEST = [
    "dedup_exact",
    "heavy_hitters_cms",
    "stream_heavy_hitters",
    "corpus_stats",
    "text_quality",
    "gopher_quality",
    "gopher_repetition",
    "char_ngram_diversity",  # split('') — the sharpest codepoint probe
    "dataset_card",
    "doc_repetition",
    "chunk_documents",
    "ccnet_quality_buckets",
    "line_dedup",
    "dedup_minhash_lsh",
    "exact_span_dedup",
    "normalize_text",
    "doc_fingerprint",
    "lang_id",
    "pack_sequences",
    # r8: substring pair extraction must never split a codepoint (the
    # BPE pre-tokenizer classes multibyte chars as length-1 tokens) and
    # shingle identity must agree across engines on non-ASCII text.
    "bpe_merge_census",
    "ngram_novelty_timeline",
    # r8c: bigram join keys are raw tokens — cross-engine string
    # equality on non-ASCII tokens is the whole correctness story.
    "ngram_lm_perplexity",
    "bigram_pmi_topk",
    "source_unigram_kl",
]

_TEXTS = [
    "café naïve déjà vu über straße",
    "中文 文本 处理 测试 中文 文本",
    "emoji 😀 test 😀😀 party 🎉 done",
    "mixed café 中文 😀 ascii end",
    "plain ascii words only here",
    "café naïve déjà vu über straße",  # exact dup of doc 1
]


@pytest.fixture(scope="module")
def unicode_docs_dir(sf_small, tmp_path_factory):
    d = tmp_path_factory.mktemp("unicode_docs")
    for t in TABLES:
        if t != "documents":
            shutil.copy(f"{sf_small}/{t}.parquet", str(d / f"{t}.parquet"))
    table = pa.table(
        {
            "doc_id": pa.array(list(range(1, len(_TEXTS) + 1)), pa.int64()),
            "text": pa.array(_TEXTS, pa.string()),
            "lang": pa.array(["fr", "zh", "en", "en", "en", "fr"]),
            "source": pa.array(["web"] * len(_TEXTS)),
            "n_chars": pa.array([len(t) for t in _TEXTS], pa.int64()),
        }
    )
    pq.write_table(table, str(d / "documents.parquet"))
    return str(d)


@pytest.mark.parametrize("name", subset(QUERIES_UNDER_TEST, keep=(), k=3))
def test_oracle_gate_green_under_unicode_documents(
    spark, unicode_docs_dir, name
):
    con = duckdb_connection(unicode_docs_dir)
    try:
        report = compare(
            QUERIES[name](spark, unicode_docs_dir), con, ORACLES[name]
        )
        assert report["ok"], f"{name} under unicode documents: {report}"
    finally:
        con.close()
