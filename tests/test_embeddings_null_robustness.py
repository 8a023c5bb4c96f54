"""Embeddings-side degenerate-vector axis of the driver robustness
matrix (round 6): NULL vectors, EMPTY vectors, RAGGED (short) vectors,
and NULL labels through the whole similarity family. The probe caught
four hazard classes:

- zero norms from null/empty vectors → ANSI divide-by-zero in every
  cosine;
- empty arrays → element_at out-of-bounds in the sign-LSH buckets;
- ragged dims → a FUNDAMENTAL fold divergence (Spark's aggregate()
  null-propagates the padded zip where DuckDB's list_sum skips NULLs —
  partial dot products can never agree);
- NULL labels → an unsortable None cell in the IVF literal index.

Fixes: the `_embeddings` validity chokepoint (keep only vectors whose
length equals the table's max dimension — a 1-row scalar, so the rule
survives a driver dimension change; mirrored in every similarity
oracle) and NULL-label exclusion from IVF centroid training (mirrored).

Round-10 probe additions: NON-FINITE elements (NaN/±Inf — un-mirrorable
via NaN rank ordering, ANSI integer-grid overflow in the quantizers,
and SQ divide-by-zero; dropped by the chokepoint's finite filter,
mirrored) and the SHORT-DIMENSIONALITY axis (a 37-dim corpus crashed
the fixed-dim-range sign-hash tables — Spark element_at throws past the
end where DuckDB's list index returns NULL; fixed by _fitting_tables +
the oracles' dimlen guard).
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
    "similarity_bruteforce_topk",
    "similarity_lsh_topk",
    "similarity_ivf_topk",
    "embedding_neardup_pairs",
    "embedding_kmeans",
    "embedding_quantize",
    "semantic_dedup",
    "semantic_decontaminate",
    "hard_negative_mining",
    "rrf_hybrid_topk",  # r7: dense channel rides the _embeddings chokepoint
    # r8: both ride the _embeddings chokepoint; the recall report nests
    # all three top-K definitions, the centroid report the avg/fold path.
    "similarity_recall_report",
    "embedding_centroid_report",
    # r8c: quantized ADC ranking rides the same chokepoint; codes for
    # NULL/empty/ragged vectors must never be built at all.
    "similarity_sq_topk",
    # r9: per-label norm profile — degenerate vectors must never
    # contribute a quantized norm.
    "embedding_norm_profile",
    # r9c: per-dimension census — NULL/empty/ragged/NULL-element vectors
    # must never contribute a grid cell (posexplode of a dropped vector
    # is a dropped row on both engines).
    "embedding_dim_stats",
    # r9c: PQ — degenerate vectors must never train a codebook, take a
    # code, or enter the ADC shortlist (the _embeddings chokepoint).
    "similarity_pq_topk",
    # r10: IVF routing over PQ codes — degenerate vectors must neither
    # train the coarse quantizer nor file a code in any cell; the L2
    # recall report nests both definitions plus the exact-L2 baseline
    # (all three ride the chokepoint + the interior-NULL drop).
    "ivf_pq_topk",
    "pq_recall_report",
    # r10: cross-dimension redundancy audit — degenerate vectors must
    # never contribute a pair cell (quantization happens after the
    # chokepoint on both engines).
    "embedding_corr_topk",
    # r11: the persisted index — degenerate vectors must never land in
    # the artifact (build manifest counts/checksums mirror the retrained
    # oracle) nor be served from it.
    "ann_index_build",
    "ann_index_topk",
    # r12: the append lifecycle — degenerate vectors must neither move
    # the watermark, take a delta code, nor contribute a drift moment.
    "ann_index_append",
    "embedding_drift_report",
    # r13: the segment serve and the compaction — degenerate vectors
    # appear in no segment, no retired count, no rebuilt artifact.
    "ann_index_topk_segments",
    "ann_compact_rebuild",
]


@pytest.fixture(scope="module")
def degenerate_embeddings_dir(sf_small, tmp_path_factory):
    d = tmp_path_factory.mktemp("null_embeddings")
    for t in TABLES:
        if t != "embeddings":
            shutil.copy(f"{sf_small}/{t}.parquet", str(d / f"{t}.parquet"))
    src = pq.read_table(f"{sf_small}/embeddings.parquet")
    emb = src.column("embedding").to_pylist()
    labels = src.column("label").to_pylist()
    vids = src.column("vec_id").to_pylist()
    for i in range(len(emb)):
        if i % 29 == 5:
            emb[i] = None
        elif i % 31 == 7:
            emb[i] = []
        elif i % 37 == 11:
            emb[i] = emb[i][:8]  # ragged: short vector
        elif i % 41 == 13:
            # r9 (ADVICE): interior NULL element — full-length vector, so
            # it survives the max-dim filter; only the interior-NULL drop
            # in the _embeddings chokepoint keeps the engines mirrored
            # (Spark aggregate() null-propagates, DuckDB list_* skips).
            emb[i] = list(emb[i])
            emb[i][3] = None
        elif i % 43 == 17:
            # r10: non-finite elements (a broken encoder's output) — the
            # probe showed NaN/Inf are un-mirrorable three ways (NaN rank
            # ordering, ANSI integer-grid overflow in the quantizers,
            # SQ divide-by-zero); the chokepoint's finite filter drops
            # them on both engines.
            emb[i] = list(emb[i])
            emb[i][5] = float("nan")
        elif i % 47 == 19:
            emb[i] = list(emb[i])
            emb[i][9] = float("inf")
        elif i % 53 == 21:
            emb[i] = list(emb[i])
            emb[i][2] = float("-inf")
        if i % 23 == 3:
            labels[i] = None
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(vids, pa.int64()),
                "embedding": pa.array(emb, pa.list_(pa.float32())),
                "label": pa.array(labels, pa.int32()),
            }
        ),
        str(d / "embeddings.parquet"),
    )
    return str(d)


@pytest.mark.parametrize("name", subset(QUERIES_UNDER_TEST, keep=('similarity_bruteforce_topk', 'ann_index_build'), k=3))
def test_oracle_gate_green_under_degenerate_vectors(
    spark, degenerate_embeddings_dir, name
):
    con = duckdb_connection(degenerate_embeddings_dir)
    try:
        report = compare(
            QUERIES[name](spark, degenerate_embeddings_dir),
            con,
            ORACLES[name],
        )
        assert report["ok"], f"{name} under degenerate vectors: {report}"
    finally:
        con.close()


def test_degenerate_fixture_contains_nonfinite_reps(degenerate_embeddings_dir):
    """Precondition (r10): the mutation moduli must actually plant NaN,
    +Inf, and -Inf elements — if the corpus shrinks below the residues
    this fails loudly instead of the matrix silently dropping the axis."""
    import math

    emb = pq.read_table(
        f"{degenerate_embeddings_dir}/embeddings.parquet"
    ).column("embedding").to_pylist()
    flat = [v for vec in emb if vec is not None for v in vec if v is not None]
    assert any(math.isnan(v) for v in flat)
    assert any(v == float("inf") for v in flat)
    assert any(v == float("-inf") for v in flat)


# --- r10 short-dimensionality axis ------------------------------------
# The sign-hash tables read fixed dim ranges (LSH 8×4 bits → dims 1..32,
# near-dup 8×8 → dims 1..64); a regenerated corpus with d below those
# bounds crashed Spark's element_at where DuckDB's list index returns
# NULL (un-mirrorable). _fitting_tables bounds the tables built by the
# corpus dim, mirrored in the oracles via each row's dimlen guard.
SHORTDIM_QUERIES = [
    "similarity_lsh_topk",
    "embedding_neardup_pairs",
    "similarity_recall_report",
    "hard_negative_mining",
    "semantic_decontaminate",
    "similarity_pq_topk",
    "ivf_pq_topk",
    # r11: artifact build + serve under a 37-dim corpus (sub = 37//4 = 9
    # leading dims per subspace; the build must fit the short dim).
    "ann_index_build",
    "ann_index_topk",
    # r13: segment pair + compaction under the short dim.
    "ann_index_topk_segments",
    "ann_compact_rebuild",
]


@pytest.fixture(scope="module")
def shortdim_embeddings_dir(sf_small, tmp_path_factory):
    d = tmp_path_factory.mktemp("shortdim_embeddings")
    for t in TABLES:
        if t != "embeddings":
            shutil.copy(f"{sf_small}/{t}.parquet", str(d / f"{t}.parquet"))
    src = pq.read_table(f"{sf_small}/embeddings.parquet")
    emb = [
        v[:37] if v is not None else None
        for v in src.column("embedding").to_pylist()
    ]
    pq.write_table(
        pa.table(
            {
                "vec_id": src.column("vec_id"),
                "embedding": pa.array(emb, pa.list_(pa.float32())),
                "label": src.column("label"),
            }
        ),
        str(d / "embeddings.parquet"),
    )
    return str(d)


@pytest.mark.parametrize("name", subset(SHORTDIM_QUERIES, keep=(), k=3))
def test_oracle_gate_green_under_short_dim(
    spark, shortdim_embeddings_dir, name
):
    con = duckdb_connection(shortdim_embeddings_dir)
    try:
        report = compare(
            QUERIES[name](spark, shortdim_embeddings_dir),
            con,
            ORACLES[name],
        )
        assert report["ok"], f"{name} under a 37-dim corpus: {report}"
    finally:
        con.close()
