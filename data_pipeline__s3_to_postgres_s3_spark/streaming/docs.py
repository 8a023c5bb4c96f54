"""Structured Streaming over the documents corpus: continuous-ingest
near-duplicate detection.

``stream_minhash_dedup`` is the streaming twin of the batch MinHash LSH
dedup (operators/dedup.py): every arriving document is signed row-locally
(shingle → md5 → 16 affine permutations — array expressions, because a
streaming query cannot put a groupBy aggregation in front of a stateful
operator), banded into 4 LSH buckets, and checked against the bucket's
keyed state, which holds only (doc_id, 16-long signature) per member —
the production-shaped state: 128 bytes per doc per band regardless of
document size, never the text or shingles.

Determinism / oracle: the emitted PAIR SET is arrival-order-INSENSITIVE —
every co-bucket pair is emitted exactly once, when its later member
arrives, and the similarity estimate compares full signatures, which do
not depend on order. The DuckDB oracle is the batch formulation: the
same shingles → signatures → bands → candidate pairs → matching-perms
estimate, filtered at the same threshold. (Contrast with the in-order
ring-buffer ops in streaming/events.py — this one belongs to the
order-insensitive class, like the MIN-state funnel.)

Scale notes: by default state grows with the corpus (it IS the
incremental dedup index — the same standing structure
incremental_dedup_minhash precomputes batch-side). The documented
production bounding is now a constructor option: ``epoch_size`` assigns
each doc the epoch ``doc_id // epoch_size`` (append-only corpus,
monotone ids) and ``ttl_epochs`` evicts bucket members more than that
many epochs older than the arriving doc — bounding state to the active
window while leaving the pair set for in-window docs (epoch gap <=
ttl_epochs) bit-identical to the unbounded run
(tests/test_streaming.py::test_stream_minhash_dedup_state_ttl). The
stateful shuffle is one exchange on (band, band_key) — bucket-local,
exactly like the batch LSH join.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..operators.dedup import (
    MINHASH_A,
    MINHASH_B,
    MINHASH_BAND_ROWS,
    MINHASH_PERMS,
    MINHASH_PRIME,
    _shingle_arrays,
)
from .events import run_to_memory, state_parts

# Emit co-bucket pairs whose signature agreement is at least this — the
# half-agreement floor keeps band-collision noise out of the sink while
# every exact/near dup (est ≈ 1.0) always lands.
STREAM_MINHASH_EST_MIN = 0.5

DOCS_STREAM_SCHEMA = StructType(
    [
        # LongType absorbs an int32-encoded doc_id (pinned behavior for
        # file streams, tests/test_int_encoding.py).
        StructField("doc_id", LongType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("source", StringType(), True),
        StructField("n_chars", LongType(), True),
    ]
)

MINHASH_PAIR_OUTPUT = StructType(
    [
        StructField("doc_a", LongType(), True),
        StructField("doc_b", LongType(), True),
        StructField("n_match", LongType(), True),
    ]
)
# Bucket members: doc ids + their signatures flattened (MINHASH_PERMS
# longs per doc, same order as doc_ids). The TTL-bounded mode adds a
# per-doc epochs array; the unbounded default does NOT carry it (state
# stores are per-run, so the schema can differ per mode — r7 carried
# epochs unconditionally and the r8 A/B measured the difference as
# noise-level, but the narrower default state is strictly less to
# serialize per micro-batch).
MINHASH_BUCKET_STATE = StructType(
    [
        StructField("doc_ids", ArrayType(LongType()), True),
        StructField("sigs", ArrayType(LongType()), True),
    ]
)
MINHASH_BUCKET_STATE_TTL = StructType(
    MINHASH_BUCKET_STATE.fields
    + [StructField("epochs", ArrayType(LongType()), True)]
)


def read_documents_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source documents stream (declared schema — file streams cannot
    infer; the corpus drop-zone shape)."""
    reader = spark.readStream.schema(DOCS_STREAM_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.option("pathGlobFilter", "documents*.parquet").parquet(sf_dir)


def _make_minhash_bucket_fn(ttl_epochs: int | None):
    """Build the per-bucket state fn; ttl_epochs None → unbounded state
    (no epochs array in state, nothing is ever evicted).

    The member-signature comparison is a numpy matrix equality — a hot
    bucket pays C per element, not Python (the r7 draft's per-member
    zip loop was O(members · 16) interpreted per arriving doc).

    TTL eviction uses the ARRIVING doc's epoch as the watermark, so the
    'pairs within the window are bit-identical to the unbounded run'
    guarantee is conditional on epoch-MONOTONE arrival across
    micro-batches (epoch = doc_id // size over an append-only corpus
    with monotone ids — the documented production shape). Under
    cross-batch reordering (e.g. file globbing order changes), a newer
    doc's arrival can evict a member that a late-arriving older doc was
    still within ttl_epochs of, silently dropping that pair; the
    intra-batch sort below cannot repair cross-batch reordering."""
    bounded = ttl_epochs is not None

    def _minhash_bucket_fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: Any
    ) -> Iterator[pd.DataFrame]:
        p = MINHASH_PERMS
        if state.exists:
            st = state.get
            doc_ids = np.asarray(st[0], dtype=np.int64)
            sig_mat = np.asarray(st[1], dtype=np.int64).reshape(-1, p)
            epochs = (
                np.asarray(st[2], dtype=np.int64)
                if bounded
                else np.empty(0, dtype=np.int64)
            )
        else:
            doc_ids = np.empty(0, dtype=np.int64)
            sig_mat = np.empty((0, p), dtype=np.int64)
            epochs = np.empty(0, dtype=np.int64)
        rows: list[tuple[int, int, Any]] = []
        for pdf in pdfs:
            for doc_id, epoch, sig in zip(
                pdf["doc_id"], pdf["epoch"], pdf["sig"]
            ):
                rows.append(
                    (int(doc_id), int(epoch), np.asarray(sig, dtype=np.int64))
                )
        # Intra-batch order is not defined by the source; sort for a stable
        # walk. The emitted pair SET is order-insensitive either way: each
        # unordered pair appears exactly once, via its later-processed
        # member. doc_id order is epoch order (epoch = doc_id // size), so
        # the eviction watermark only advances along the walk.
        rows.sort(key=lambda r: (r[0], r[1]))
        out: list[pd.DataFrame] = []
        for doc_id, epoch, sig in rows:
            if bounded and doc_ids.size:
                keep = epochs >= epoch - ttl_epochs
                if not keep.all():
                    doc_ids = doc_ids[keep]
                    epochs = epochs[keep]
                    sig_mat = sig_mat[keep]
            if doc_ids.size:
                n = (sig_mat == sig).sum(axis=1)
                out.append(
                    pd.DataFrame(
                        {
                            "doc_a": np.minimum(doc_ids, doc_id),
                            "doc_b": np.maximum(doc_ids, doc_id),
                            "n_match": n.astype(np.int64),
                        }
                    )
                )
            doc_ids = np.append(doc_ids, doc_id)
            sig_mat = np.vstack([sig_mat, sig[None, :]])
            if bounded:
                epochs = np.append(epochs, epoch)
        new_state = (doc_ids.tolist(), sig_mat.ravel().tolist())
        if bounded:
            new_state = new_state + (epochs.tolist(),)
        state.update(new_state)
        if out:
            yield pd.concat(out, ignore_index=True)

    return _minhash_bucket_fn


def stream_minhash_dedup(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int | None = None,
    epoch_size: int | None = None,
    ttl_epochs: int | None = None,
) -> DataFrame:
    """Streaming near-dup pairs: (doc_a, doc_b, est_sim) for every
    co-bucket pair with signature agreement ≥ STREAM_MINHASH_EST_MIN.

    epoch_size/ttl_epochs (both or neither) bound the keyed state: a doc
    belongs to epoch doc_id // epoch_size, and bucket members more than
    ttl_epochs epochs older than the arriving doc are evicted before
    pairing — pairs within the window are unaffected, pairs across it are
    deliberately out of the bounded semantics."""
    if (epoch_size is None) != (ttl_epochs is None):
        raise ValueError("epoch_size and ttl_epochs must be set together")
    if epoch_size is not None and epoch_size <= 0:
        raise ValueError("epoch_size must be positive")
    docs = read_documents_stream(spark, sf_dir, max_files_per_trigger)
    arrays = _shingle_arrays(docs)
    hs = F.expr(
        "transform(shingles, s -> "
        "cast(conv(substring(md5(s), 1, 7), 16, 10) as bigint))"
    )
    sig = F.array(
        *[
            F.expr(
                f"array_min(transform(hs, h -> "
                f"(h * {MINHASH_A[bp]}L + {MINHASH_B[bp]}L) % {MINHASH_PRIME}L))"
            )
            for bp in range(MINHASH_PERMS)
        ]
    )
    signed = arrays.select("doc_id", hs.alias("hs")).select(
        "doc_id", sig.alias("sig")
    )
    n_bands = MINHASH_PERMS // MINHASH_BAND_ROWS
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        ",",
                        *[
                            F.element_at("sig", b * MINHASH_BAND_ROWS + i + 1)
                            for i in range(MINHASH_BAND_ROWS)
                        ],
                    )
                ).alias("band_key"),
            )
            for b in range(n_bands)
        ]
    )
    epoch = (
        F.expr(f"doc_id div {epoch_size}")  # integral div — no IEEE detour
        if epoch_size is not None
        else F.lit(0).cast("long")
    )
    banded = signed.select(
        "doc_id", "sig", epoch.alias("epoch"), F.explode(band_structs).alias("bk")
    ).select(
        "doc_id",
        "sig",
        "epoch",
        F.col("bk.band").alias("band"),
        F.col("bk.band_key").alias("band_key"),
    )
    pairs = banded.groupBy("band", "band_key").applyInPandasWithState(
        _make_minhash_bucket_fn(ttl_epochs),
        MINHASH_PAIR_OUTPUT,
        MINHASH_BUCKET_STATE_TTL if ttl_epochs is not None else MINHASH_BUCKET_STATE,
        "append",
        GroupStateTimeout.NoTimeout,
    )
    # State partition sizing (r6 A/B at sf0.1, warm): 4→11.1s, 8→7.1s,
    # 16→5.4s, 32→4.0-5.1s, 64→14s. The events stateful ops size DOWN to
    # key cardinality (1.5k users); here bucket-key cardinality (~4 per
    # doc) far exceeds cores, so the right cap is the core count — and
    # overshooting it pays a Python worker round-trip per empty partition
    # per micro-batch (the 64 collapse).
    # Scale-adaptive (r14): min(32, cores) — the r6 A/B's "cap at the
    # core count" rule expressed against the session's actual core
    # grant instead of the local[32] constant (the driver re-benches at
    # a lower core count; overshooting cores pays a Python round-trip
    # per empty partition per micro-batch).
    sink = run_to_memory(
        pairs, "append", state_partitions=state_parts(spark, 32)
    )
    est = F.col("n_match").cast("double") / MINHASH_PERMS
    return (
        sink.select("doc_a", "doc_b", est.alias("est_sim"))
        .where(F.col("est_sim") >= STREAM_MINHASH_EST_MIN)
        .distinct()
    )


def stream_quality_gate(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Quality screening at INGEST time: the row-local gate verdicts
    (lang_ok / rep_ok / stop_ok, plus the content_hash a downstream
    exact-dedup consumes) computed on the documents stream as each file
    arrives — the production shape where gating happens before anything
    lands in the lake, not as a later batch pass.

    The gates ARE ``operators.curation.row_gates`` (shared expressions —
    the streaming and batch verdicts can never disagree), and row_gates
    is row-LOCAL by construction, so this is a stateless streaming
    projection: no watermark, no state store, no exchange at all — the
    scan parallelism is the whole plan. The corpus-wide canonical
    election deliberately stays batch-side (quality_gate): it is a
    function of the whole corpus, exactly the split the incremental
    curation pipeline documents."""
    from ..operators.curation import row_gates

    docs = read_documents_stream(spark, sf_dir, max_files_per_trigger)
    return run_to_memory(row_gates(docs), "append")


def stream_heavy_hitters(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Count-min sketch maintained over continuously-ingested documents —
    the streaming twin of operators/textops.heavy_hitters_cms: each
    arriving file's tokens increment their 4 CMS cells, and the sink
    holds the live (r, bucket, cell) table a point-frequency consumer
    probes. This is the sketch's reason to exist at ingest time: the
    aggregation state is ≤ CMS_ROWS·CMS_WIDTH = 4096 rows BY
    CONSTRUCTION, no matter how many tokens ever stream past — contrast
    stream_minhash_dedup, whose index state grows with the corpus and
    needs a TTL.

    The cell coordinates ARE textops.cms_entries (shared expression —
    the stream and the batch audit can never disagree on geometry);
    complete mode ⇒ final sink == the batch cells, so the DuckDB oracle
    is the batch formulation. Heavy-hitter probing (the top-K report)
    deliberately stays batch-side: the probe set is a function of the
    whole corpus (the stream_quality_gate split)."""
    from ..operators.textops import cms_entries

    docs = read_documents_stream(spark, sf_dir, max_files_per_trigger)
    cells = (
        docs.select(
            F.explode(
                F.split(F.coalesce(F.col("text"), F.lit("")), " ")
            ).alias("token")
        )
        .where(F.col("token") != "")
        .select(F.explode(cms_entries()).alias("e"))
        .groupBy(F.col("e.r").alias("r"), F.col("e.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cell"))
    )
    # 4096-key aggregation, JVM-native: state partitions sized well under
    # the key space but over the core count is pointless — 8 keeps the
    # state-store shuffle tiny (run_to_memory restores the session conf).
    return run_to_memory(
        cells, "complete", state_partitions=state_parts(spark, 8)
    )
