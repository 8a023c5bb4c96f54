"""DuckDB oracles for the multimodal structural queries
(operators/multimodal.py). The media table derivation is repeated inline:
payload = UTF-8 bytes of documents.text, so octet_length(encode(text))
equals Spark's length(encode(text,'UTF-8')) and md5(text) equals Spark's
md5 over those same bytes (DuckDB's md5 takes VARCHAR and hashes its UTF-8
encoding). Metadata comes from the same key arithmetic as the Spark side.

DuckDB quirks honored: generate_series with column arguments must go
through unnest() in the select list (the table-function form rejects
lateral column parameters).

media_features (mapInPandas decode stand-in) is intentionally absent —
byte-level entropy is not reasonably SQL-expressible; it gets the driver's
rows-only check plus value-level unit tests in tests/test_multimodal.py.
"""

_MEDIA = """(
    SELECT doc_id,
        ['image','audio','video'][CAST((doc_id % 3 + 3) % 3 AS INT) + 1]
            AS media_type,
        text,
        octet_length(encode(text)) AS payload_bytes,
        (doc_id % 640 + 640) % 640 + 16 AS width,
        (doc_id % 480 + 480) % 480 + 16 AS height,
        ((doc_id % 30 + 30) % 30 + 1) * 1000 AS duration_ms
    FROM documents
)"""

MEDIA_CATALOG = f"""
SELECT doc_id, media_type,
    'synthetic/v1' AS format,
    width, height, duration_ms,
    payload_bytes,
    md5(text) AS payload_md5
FROM {_MEDIA} AS media
"""

FRAME_SAMPLE = f"""
WITH offsets AS (
    SELECT doc_id, duration_ms,
        unnest(generate_series(0, duration_ms - 1, 1000)) AS frame_offset_ms
    FROM {_MEDIA} AS media
    WHERE media_type = 'video'
)
SELECT doc_id,
    frame_offset_ms // 1000 AS frame_idx,
    frame_offset_ms,
    duration_ms
FROM offsets
"""

AUDIO_CHUNKS = f"""
WITH idx AS (
    SELECT doc_id, payload_bytes,
        unnest(generate_series(0, (payload_bytes - 1) // 64, 1)) AS chunk_idx
    FROM {_MEDIA} AS media
    WHERE media_type = 'audio'
)
SELECT doc_id, chunk_idx,
    chunk_idx * 64 AS byte_offset,
    LEAST(64, payload_bytes - chunk_idx * 64) AS chunk_bytes
FROM idx
"""

MULTIMODAL_ORACLES = {
    "media_catalog": MEDIA_CATALOG,
    "frame_sample": FRAME_SAMPLE,
    "audio_chunks": AUDIO_CHUNKS,
}
