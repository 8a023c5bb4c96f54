"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Extension surface for an LLM training-data pipeline (BASELINE.json north
star). Media payloads are opaque ``binary`` columns with a typed metadata
struct; everything structural (cataloging, frame sampling, byte chunking)
stays in JVM built-ins, and only the decode/feature step — which genuinely
needs a media library — drops to Arrow-batched ``mapInPandas``.

No image/audio libraries ship in this container, so the decode itself is a
clearly-marked deterministic stand-in (``_decode_stub``): it consumes real
bytes and produces stable features, keeping the Spark-side plumbing (schema,
partitioning, UDF signature, Arrow batch shape) fully real and testable.
Swapping in PIL/librosa later changes only the inner function.

The media table is derived deterministically from ``documents`` (payload =
UTF-8 bytes of the text; metadata from key arithmetic) so every structural
query has an exact DuckDB oracle.

Scale notes: payloads never pass through the driver; ``mapInPandas``
processes Arrow record batches executor-side, and
``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch memory for fat
binary rows (set it low when payloads are MBs). Frame sampling and chunking
are generate-and-explode — row counts grow, but each output row carries only
offsets/slices, never a reassembled payload.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..catalog import load_table
from ..config import DEFAULT_CONFIG, EngineConfig

MEDIA_TYPES = ("image", "audio", "video")
AUDIO_CHUNK_BYTES = 64
FRAME_INTERVAL_MS = 1000


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → media(doc_id, media_type, payload BINARY, meta STRUCT).

    Deterministic derivation: payload is the UTF-8 encoding of the text;
    media_type cycles by doc_id; metadata (dimensions / sample rate /
    duration) from key arithmetic. Stands in for a real ingest of object
    storage blobs + sidecar metadata.
    """
    docs = load_table(spark, sf_dir, "documents")
    mt = F.element_at(F.array(*[F.lit(t) for t in MEDIA_TYPES]), (F.col("doc_id") % 3 + 1).cast("int"))
    return docs.select(
        "doc_id",
        mt.alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("synthetic/v1").alias("format"),
            (F.col("doc_id") % 640 + 16).alias("width"),
            (F.col("doc_id") % 480 + 16).alias("height"),
            F.lit(16000).cast("long").alias("sample_rate"),
            ((F.col("doc_id") % 30 + 1) * 1000).alias("duration_ms"),
        ).alias("meta"),
    )


def media_catalog(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Flattened media inventory with payload fingerprints — pure built-ins
    (md5/octet length on binary), no decode."""
    m = media_table(spark, sf_dir)
    return m.select(
        "doc_id",
        "media_type",
        F.col("meta.format").alias("format"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.duration_ms").alias("duration_ms"),
        F.length("payload").cast("long").alias("payload_bytes"),
        F.md5("payload").alias("payload_md5"),
    )


def frame_sample(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Video frame-sampling plan: one row per sampled frame offset (1 fps),
    computed wholly from metadata with sequence+explode — the actual frame
    DECODE at those offsets is the mapInPandas stage (media_features); the
    sampling plan itself never touches payload bytes."""
    m = media_table(spark, sf_dir).where(F.col("media_type") == "video")
    frames = m.select(
        "doc_id",
        F.col("meta.duration_ms").alias("duration_ms"),
        F.explode(
            F.sequence(
                F.lit(0),
                F.col("meta.duration_ms") - 1,
                F.lit(FRAME_INTERVAL_MS),
            )
        ).alias("frame_offset_ms"),
    )
    return frames.select(
        "doc_id",
        F.expr(f"frame_offset_ms DIV {FRAME_INTERVAL_MS}").alias("frame_idx"),
        "frame_offset_ms",
        "duration_ms",
    )


def audio_chunks(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Fixed-size byte windowing of audio payloads (the pre-step for any
    chunked feature extractor): offsets via sequence+explode, slices via
    substring on binary — all JVM-side, payload sliced not reassembled."""
    m = media_table(spark, sf_dir).where(F.col("media_type") == "audio")
    n = F.length("payload")
    chunks = m.select(
        "doc_id",
        n.cast("long").alias("payload_bytes"),
        "payload",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.expr(f"(length(payload) - 1) DIV {AUDIO_CHUNK_BYTES}"),
                F.lit(1).cast("long"),
            )
        ).alias("chunk_idx"),
    )
    return chunks.select(
        "doc_id",
        "chunk_idx",
        (F.col("chunk_idx") * AUDIO_CHUNK_BYTES).alias("byte_offset"),
        F.least(
            F.lit(AUDIO_CHUNK_BYTES).cast("long"),
            F.col("payload_bytes") - F.col("chunk_idx") * AUDIO_CHUNK_BYTES,
        ).alias("chunk_bytes"),
    )


MEDIA_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("media_type", StringType(), True),
        StructField("n_bytes", IntegerType(), True),
        StructField("mean_byte", DoubleType(), True),
        StructField("byte_entropy", DoubleType(), True),
    ]
)


def _decode_stub(payload: bytes, media_type: str) -> dict:
    """DECODE STAND-IN. A real deployment decodes here (PIL for images,
    soundfile/librosa for audio, pyav frame extraction for video) — none of
    those libraries exist in this container, so this computes deterministic
    byte-level features from the real payload instead. Signature and return
    contract are what a real decoder would use."""
    import math

    n = len(payload)
    if n == 0:
        return {"n_bytes": 0, "mean_byte": 0.0, "byte_entropy": 0.0}
    counts: dict[int, int] = {}
    total = 0
    for b in payload:
        counts[b] = counts.get(b, 0) + 1
        total += b
    entropy = -sum((c / n) * math.log2(c / n) for c in counts.values())
    return {"n_bytes": n, "mean_byte": total / n, "byte_entropy": entropy}


def media_features(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Per-asset decoded features via Arrow-batched mapInPandas — the slow
    path, used ONLY where built-ins genuinely can't reach (inside the
    payload bytes). Batches stream through executors; nothing is collected
    driver-side."""
    import pandas as pd

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            feats = [
                _decode_stub(bytes(p), t)
                for p, t in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "mean_byte": [f["mean_byte"] for f in feats],
                    "byte_entropy": [f["byte_entropy"] for f in feats],
                }
            )

    m = media_table(spark, sf_dir).select("doc_id", "media_type", "payload")
    return m.mapInPandas(extract, MEDIA_FEATURES_SCHEMA)
