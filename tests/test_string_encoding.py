"""String-encoding axis of the driver re-encode matrix (round 6): the
differential gate must stay green when the driver re-encodes the
documents table's string columns as Arrow ``large_string`` and/or
dictionary-encodes the low-cardinality ``lang``/``source`` columns —
both plausible outputs of a pyarrow-based generator. Completes the
matrix beside ts (test_ts_encoding), dates (test_date_encoding),
embeddings (test_embedding_encoding), money (test_money_encoding) and
int widths (test_int_encoding).

No chokepoint is needed for this class IF Spark's vectorized parquet
reader and DuckDB both decode large_string/dictionary back to plain
utf8 semantics — which is exactly what this module pins, over one
representative per doc-consuming family now in the driver window:
hashing (dedup_exact), regex+split metrics (gopher_quality), grouping
on a dictionary column (corpus_stats / per_source_report), shingle
pipelines (dedup_minhash_lsh), and the declared-StringType file-stream
reader (stream_minhash_dedup).
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
    # r9: whitespace token census + md5 hashing read the re-encodable
    # text column directly.
    "heavy_hitters_cms",
    # r9: streaming CMS twin — the doc file-stream reader must absorb
    # re-encoded text like stream_minhash_dedup does.
    "stream_heavy_hitters",
    "gopher_quality",
    "gopher_repetition",
    "corpus_stats",
    "per_source_report",
    "dedup_minhash_lsh",
    "chunk_documents",
    # Streaming: the doc file-stream declares StringType against the
    # large_string/dictionary parquet — the reader must absorb it.
    "stream_minhash_dedup",
    # r7: documents-text consumers — BM25 channel and the gate ladder.
    "rrf_hybrid_topk",
    "curation_funnel",
    # r8: text-heavy newcomers — shingle timeline and the BPE pre-token
    # regex both read the re-encodable text column directly; the stream
    # gate's file-stream reader must absorb the re-encoded text too.
    "ngram_novelty_timeline",
    "bpe_merge_census",
    "stream_quality_gate",
    # r8b: groups by the dictionary-encodable source column + gate text.
    "source_quality_matrix",
    # r8c: bigram-LM / PMI joins key on token strings read straight off
    # the re-encodable text column.
    "ngram_lm_perplexity",
    "bigram_pmi_topk",
    "source_unigram_kl",
]


def _reencode_documents(src: str, dst: str, dict_encode: bool) -> None:
    table = pq.read_table(src)
    for col in ("text", "lang", "source"):
        i = table.schema.get_field_index(col)
        typ = pa.large_string()
        if dict_encode and col in ("lang", "source"):
            typ = pa.dictionary(pa.int32(), pa.string())
        table = table.set_column(
            i, pa.field(col, typ), table.column(i).cast(typ)
        )
    pq.write_table(table, dst)


@pytest.fixture(scope="module", params=[False, True], ids=["large", "dict"])
def restring_dir(request, sf_small, tmp_path_factory):
    d = tmp_path_factory.mktemp("string_encoding") / (
        "dict" if request.param else "large"
    )
    d.mkdir()
    for t in TABLES:
        src = f"{sf_small}/{t}.parquet"
        if t != "documents":
            shutil.copy(src, str(d / f"{t}.parquet"))
            continue
        _reencode_documents(src, str(d / f"{t}.parquet"), request.param)
    return str(d)


@pytest.mark.parametrize("name", subset(QUERIES_UNDER_TEST, keep=(), k=3))
def test_oracle_gate_green_under_restrung_documents(spark, restring_dir, name):
    con = duckdb_connection(restring_dir)
    try:
        report = compare(QUERIES[name](spark, restring_dir), con, ORACLES[name])
        assert report["ok"], f"{name} under re-strung documents: {report}"
    finally:
        con.close()
