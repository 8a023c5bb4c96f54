"""Long multi-paragraph documents axis of the driver re-encode matrix
(round 11): the sf corpora are short single-line word-soup docs
(~300 chars), so the paths that only fire on REAL documents — multi-
chunk splits (chunk_documents emits exactly 1 chunk/doc at sf),
cross-document boilerplate line removal (line_dedup's df >= 3 census
never matches), Gopher line-shape/duplicate-line rules, span-dedup
partial overlaps, multi-sequence packing — run against inputs that
never exercise them in the driver gate.

The r11 full-registry probe (verify_window --all against a mutated
sf0.01 corpus: every 3rd doc expanded to 12 paragraphs with a SHARED
boilerplate footer line, every 3rd+1 doc 8x longer single-paragraph;
max 6.5k chars) came back 187/187 GREEN — the token/line/span/chunk
mirrors all hold on long documents. This module pins the axis with one
representative per newly-firing path plus preconditions that prove the
paths actually fire (a vacuous matrix is worse than none)."""

from __future__ import annotations

import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_pipeline__s3_to_postgres_s3_spark.catalog import TABLES
from data_pipeline__s3_to_postgres_s3_spark.registry import ORACLES, QUERIES

from .oracle_harness import compare, duckdb_connection
from .matrix_budget import subset  # noqa: E402

FOOTER = "shared boilerplate footer line"

QUERIES_UNDER_TEST = [
    # multi-chunk + packing paths
    "chunk_documents",
    "pack_sequences",
    # cross-doc boilerplate census fires (df >= 3 footer)
    "line_dedup",
    # line-shape / duplicate-line / repeated-gram rules fire
    "gopher_quality",
    "gopher_repetition",
    "doc_repetition",
    # span/shingle pipelines over genuinely long texts
    "exact_span_dedup",
    "winnow_fingerprints",
    "dedup_minhash_lsh",
    # token accounting over 10x token volumes
    "token_budget_report",
    "corpus_stats",
]


@pytest.fixture(scope="module")
def longdoc_dir(sf_small, tmp_path_factory):
    d = tmp_path_factory.mktemp("longdocs")
    for t in TABLES:
        src = f"{sf_small}/{t}.parquet"
        if t != "documents":
            shutil.copy(src, str(d / f"{t}.parquet"))
            continue
        tb = pq.read_table(src)
        rows = tb.to_pylist()
        for i, r in enumerate(rows):
            t_ = r["text"]
            if t_ is None:
                continue
            if i % 3 == 0:
                paras = [t_] * 12
                r["text"] = (
                    "\n".join(paras[:6])
                    + f"\n\n{FOOTER}\n"
                    + "\n".join(paras[6:])
                )
            elif i % 3 == 1:
                r["text"] = " ".join([t_] * 8)
            r["n_chars"] = len(r["text"])
        pq.write_table(
            pa.Table.from_pylist(rows, schema=tb.schema),
            str(d / "documents.parquet"),
        )
    return str(d)


def test_longdoc_paths_actually_fire(spark, longdoc_dir, sf_small):
    """Preconditions: the mutation must make the dormant paths fire —
    multi-chunk docs exist, and the boilerplate footer clears the
    line_dedup df >= 3 census."""
    texts = pq.read_table(f"{longdoc_dir}/documents.parquet").column(
        "text"
    ).to_pylist()
    assert sum(1 for t in texts if t and FOOTER in t) >= 3
    assert max(len(t) for t in texts if t) > 5000

    n_docs = len(texts)
    n_chunks = QUERIES["chunk_documents"](spark, longdoc_dir).count()
    assert n_chunks > n_docs  # multi-chunk split fires
    # at sf the same query is exactly 1 chunk/doc — the dormant shape
    assert QUERIES["chunk_documents"](spark, sf_small).count() == 500


@pytest.mark.parametrize("name", subset(QUERIES_UNDER_TEST, keep=(), k=3))
def test_oracle_gate_green_under_long_documents(spark, longdoc_dir, name):
    con = duckdb_connection(longdoc_dir)
    try:
        report = compare(
            QUERIES[name](spark, longdoc_dir), con, ORACLES[name]
        )
        assert report["ok"], f"{name} under long documents: {report}"
    finally:
        con.close()
