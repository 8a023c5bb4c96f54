"""Embedding-encoding invariance: every embeddings consumer must return
IDENTICAL results whether the producer wrote ``embedding`` as list<float>
(today's layout) or list<double> (a legal driver re-encode — the same
breakage class as round 3's events.ts nanos→micros flip, pinned for the
similarity family here before it can happen).

Why exact equality is the right bar: float→double widening is value-exact,
and the engine never does float arithmetic on the column — `similarity._DOT`
casts each element to DOUBLE inside zip_with, so both encodings feed
bit-identical doubles into identical expression trees. A future edit that
multiplies raw float elements (result type float, different rounding) would
break this matrix before it could split engine from oracle under the
driver's hash (DuckDB reads the same parquet and always computes in double).
"""

from __future__ import annotations

import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_pipeline__s3_to_postgres_s3_spark.catalog import TABLES
from data_pipeline__s3_to_postgres_s3_spark.registry import ORACLES, QUERIES
from data_pipeline__s3_to_postgres_s3_spark.operators.similarity import (
    embedding_kmeans,
    embedding_neardup_pairs,
    embedding_quantize,
    semantic_dedup,
    similarity_bruteforce_topk,
    similarity_ivf_topk,
    similarity_lsh_topk,
)

ENCODINGS = ("float32", "float64")


@pytest.fixture(scope="module")
def emb_dirs(sf_small, tmp_path_factory):
    """The sf0.001 embeddings table in both element encodings, one
    directory each (consumers take an sf_dir containing the parquet)."""
    src = pq.read_table(f"{sf_small}/embeddings.parquet")
    idx = src.schema.get_field_index("embedding")
    widened = src.set_column(
        idx,
        pa.field("embedding", pa.list_(pa.float64())),
        src.column(idx).cast(pa.list_(pa.float64())),
    )
    base = tmp_path_factory.mktemp("emb_encodings")
    dirs: dict[str, str] = {}
    for name, table in {"float32": src, "float64": widened}.items():
        d = base / name
        d.mkdir()
        pq.write_table(table, str(d / "embeddings.parquet"))
        # Every other table alongside, unchanged — consumers join doc
        # metadata, and the oracle harness creates a view per table.
        for t in TABLES:
            if t != "embeddings":
                shutil.copy(f"{sf_small}/{t}.parquet", str(d / f"{t}.parquet"))
        dirs[name] = str(d)
    return dirs


def _rows(df):
    return sorted(tuple(str(v) for v in row) for row in df.collect())


@pytest.mark.parametrize(
    "query",
    [
        similarity_bruteforce_topk,
        similarity_lsh_topk,
        similarity_ivf_topk,
        embedding_neardup_pairs,
        embedding_kmeans,
        embedding_quantize,
        semantic_dedup,
    ],
    ids=lambda q: q.__name__,
)
def test_embedding_consumers_encoding_invariant(spark, emb_dirs, query):
    results = {
        name: _rows(query(spark, sf_dir)) for name, sf_dir in emb_dirs.items()
    }
    baseline = results[ENCODINGS[0]]
    assert baseline, f"{query.__name__}: empty result can't pin invariance"
    for name in ENCODINGS[1:]:
        assert results[name] == baseline, (
            f"{query.__name__} diverges under {name} encoding"
        )


# --- driver-faithful form: the differential gate itself must stay green
# under the widened layout (DuckDB reads the same float64 parquet — its
# list-lambda arithmetic must agree with Spark's double expressions on
# widened inputs exactly as it does on float32 today).

GATE_QUERIES = sorted(
    name
    for name in (
        "similarity_bruteforce_topk",
        "similarity_lsh_topk",
        "similarity_ivf_topk",
        "embedding_neardup_pairs",
        "embedding_kmeans",
        "embedding_quantize",
        "semantic_dedup",
        "rrf_hybrid_topk",
        # r8: the recall report nests all three top-K definitions, the
        # centroid report the rounded-avg/fixed-order-fold path.
        "similarity_recall_report",
        "embedding_norm_profile",
        "embedding_centroid_report",
        # r9c: per-dimension census — the 1e-4 grid quantization must be
        # invariant to the physical element width.
        "embedding_dim_stats",
        # r9c: PQ codebooks/codes/ADC must be element-width-invariant
        # (every fold casts to DOUBLE on both engines).
        "similarity_pq_topk",
    )
    if name in ORACLES and name in QUERIES
)


@pytest.mark.parametrize("name", GATE_QUERIES)
def test_oracle_gate_green_under_float64_embeddings(spark, emb_dirs, name):
    from .oracle_harness import compare, duckdb_connection

    d = emb_dirs["float64"]
    con = duckdb_connection(d)
    try:
        report = compare(QUERIES[name](spark, d), con, ORACLES[name])
        assert report["ok"], f"{name} under float64 embeddings: {report}"
    finally:
        con.close()
