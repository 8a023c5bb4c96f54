"""Multi-line / whitespace-rich documents axis of the driver
re-encode matrix (round 10): the sf corpora are single-line word-soup
docs, so every newline-sensitive path (line splits, whitespace-class
tokenizers, trim/normalize mirrors) runs against '\n'-free text in the
driver gate. A regenerated corpus with REAL multi-line documents is the
plausible change the matrix didn't cover. The r10 full-registry probe
(183/183 green on a mutated sf0.01 corpus — newline mid-text, leading/
trailing whitespace + trailing newline, tabs + double spaces) found no
divergence; this module pins the axis against regression over one
representative per text-consuming family.

The mirrors this exercises: literal-space split (Spark split(text, ' ')
vs DuckDB string_split — a '\n'-glued token stays ONE token on both),
the '\n' line split (line_dedup / gopher line-shape rules, which only
fire on multi-line docs), the whitespace-CLASS tokenizer
(gopher_quality's [ \\t\\n\\r\\f]+), the BPE pre-token regex ([^..\\s]),
and PII/regex scans where '.' must not match '\n' on either engine.
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
    # line splits fire for real on multi-line docs
    "line_dedup",
    "gopher_quality",
    "gopher_repetition",
    "doc_repetition",
    # literal-space tokenizers see '\n'/'\t'-glued tokens
    "corpus_stats",
    "token_budget_report",
    "vocab_oov_report",
    "ngram_lm_perplexity",
    # hash / shingle pipelines over the mutated text
    "dedup_exact",
    "dedup_minhash_lsh",
    "winnow_fingerprints",
    "chunk_documents",
    # gate ladder + regex scans
    "quality_gate",
    "curation_funnel",
    "pii_source_report",
    # BPE pre-token \s class
    "bpe_merge_census",
    # file-stream reader + gate verdicts over multi-line text
    "stream_quality_gate",
]


def _multiline_documents(src: str, dst: str) -> None:
    table = pq.read_table(src)
    texts = table.column("text").to_pylist()
    for i, t in enumerate(texts):
        if t is None:
            continue
        w = t.split(" ")
        if i % 7 == 3 and len(w) > 4:
            k = len(w) // 2
            texts[i] = " ".join(w[:k]) + "\n" + " ".join(w[k:])
        elif i % 11 == 5:
            texts[i] = "  " + t + " \n"
        elif i % 13 == 7 and len(w) > 2:
            texts[i] = w[0] + "\t" + w[1] + "  " + " ".join(w[2:])
    cols = {name: table.column(name) for name in table.column_names}
    cols["text"] = pa.array(texts, pa.string())
    cols["n_chars"] = pa.array(
        [len(t) if t is not None else None for t in texts], pa.int64()
    )
    pq.write_table(pa.table(cols), dst)


@pytest.fixture(scope="module")
def multiline_dir(sf_small, tmp_path_factory):
    d = tmp_path_factory.mktemp("multiline_docs")
    for t in TABLES:
        src = f"{sf_small}/{t}.parquet"
        if t != "documents":
            shutil.copy(src, str(d / f"{t}.parquet"))
            continue
        _multiline_documents(src, str(d / f"{t}.parquet"))
    return str(d)


def test_mutation_produces_multiline_docs(multiline_dir):
    """Precondition: the fixture must actually create newline/tab docs —
    if the generator's moduli ever stop matching the corpus size this
    fails loudly instead of the matrix silently testing nothing."""
    texts = pq.read_table(f"{multiline_dir}/documents.parquet").column(
        "text"
    ).to_pylist()
    assert any(t and "\n" in t for t in texts)
    assert any(t and "\t" in t for t in texts)
    assert any(t and t != t.strip() for t in texts)


@pytest.mark.parametrize("name", subset(QUERIES_UNDER_TEST, keep=(), k=3))
def test_oracle_gate_green_under_multiline_documents(
    spark, multiline_dir, name
):
    con = duckdb_connection(multiline_dir)
    try:
        report = compare(
            QUERIES[name](spark, multiline_dir), con, ORACLES[name]
        )
        assert report["ok"], f"{name} under multi-line documents: {report}"
    finally:
        con.close()
