"""DuckDB oracle SQL for the dataset-assembly operators
(operators/sampling.py — keep constants and arithmetic in lockstep)."""

from ..functions.numeric import portable_round_sql
from ..operators.sampling import (
    MIXTURE_SALT,
    split_hash_sql,
    MIXTURE_WEIGHTS,
    PACK_SHARD,
    SEQ_LEN,
    SPLIT_BUCKETS,
    TRAIN_UPTO,
    VAL_UPTO,
)

_BUCKET = f"{split_hash_sql()} % {SPLIT_BUCKETS}"

DATASET_SPLIT = f"""
SELECT doc_id, lang, source,
    {_BUCKET} AS bucket,
    CASE WHEN {_BUCKET} < {TRAIN_UPTO} THEN 'train'
         WHEN {_BUCKET} < {VAL_UPTO} THEN 'val'
         ELSE 'test' END AS split
FROM documents
"""

# DuckDB SUM(BIGINT) yields HUGEINT (int128), which pandas/Arrow
# materializes as float64 while Spark emits int64 — the driver hashes the
# pandas form, so every integer SUM in an OUTPUT column must be cast back
# to BIGINT (round-4 driver-red on corpus_stats; same trap as
# events_sessionized / oracles/curation.py). The doubles are
# portable_round-ed at scale 6 on BOTH sides so interpolated percentiles
# can never hash-diverge on future data.
CORPUS_STATS = f"""
WITH per_doc AS (
    SELECT lang,
        len(string_split(text, ' ')) AS n_tokens,
        length(text) AS n_chars
    FROM documents
)
SELECT lang,
    COUNT(*) AS n_docs,
    CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
    CAST(SUM(n_chars) AS BIGINT) AS total_chars,
    {portable_round_sql('CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*)', 6)} AS mean_tokens,
    {portable_round_sql('quantile_cont(n_tokens, 0.5)', 6)} AS p50_tokens,
    {portable_round_sql('quantile_cont(n_tokens, 0.9)', 6)} AS p90_tokens
FROM per_doc
GROUP BY lang
"""

PACK_SEQUENCES = f"""
WITH per_doc AS (
    SELECT doc_id, lang,
        len(string_split(text, ' ')) AS n_tokens,
        doc_id // {PACK_SHARD} AS shard
    FROM documents
)
SELECT doc_id, lang, shard, n_tokens,
    CAST(SUM(n_tokens) OVER w AS BIGINT) AS cum_tokens,
    CAST(FLOOR((SUM(n_tokens) OVER w - n_tokens) / {SEQ_LEN}) AS BIGINT)
        AS bin
FROM per_doc
WINDOW w AS (
    PARTITION BY lang, shard ORDER BY doc_id
    ROWS UNBOUNDED PRECEDING
)
"""

_MIX_BUCKET = f"{split_hash_sql(salt=MIXTURE_SALT)} % {SPLIT_BUCKETS}"
_MIX_RATE = "CASE " + " ".join(
    f"WHEN lang = '{lang}' THEN {pct}"
    for lang, pct in sorted(MIXTURE_WEIGHTS.items())
) + " ELSE 100 END"

MIXTURE_SAMPLE = f"""
SELECT doc_id, lang, source,
    {_MIX_BUCKET} AS bucket,
    {_MIX_RATE} AS keep_pct
FROM documents
WHERE {_MIX_BUCKET} < {_MIX_RATE}
"""

def _stratified_sql() -> str:
    from ..operators.sampling import STRATIFIED_QUOTA_PCT, STRATIFIED_SALT

    h = split_hash_sql(salt=STRATIFIED_SALT)
    pct = (
        "CASE "
        + " ".join(
            f"WHEN lang = '{lang}' THEN {p}"
            for lang, p in sorted(STRATIFIED_QUOTA_PCT.items())
        )
        + " ELSE 100 END"
    )
    return f"""
WITH ranked AS (
    SELECT doc_id, lang, source,
        ROW_NUMBER() OVER (PARTITION BY lang ORDER BY {h}, doc_id) AS rn,
        COUNT(*) OVER (PARTITION BY lang) AS n_lang,
        {pct} AS pct
    FROM documents
)
SELECT doc_id, lang, source, CAST(rn AS INT) AS sample_rank
FROM ranked
WHERE rn <= CAST(FLOOR(n_lang * pct / 100) AS BIGINT)
"""


STRATIFIED_SAMPLE = _stratified_sql()


def _uniform_sample_sql() -> str:
    from ..operators.sampling import UNIFORM_SAMPLE_K, UNIFORM_SAMPLE_SALT

    h = split_hash_sql(salt=UNIFORM_SAMPLE_SALT)
    return f"""
SELECT doc_id, lang, source, {h} AS h
FROM documents
ORDER BY h, doc_id
LIMIT {UNIFORM_SAMPLE_K}
"""


def _group_sample_sql() -> str:
    from ..operators.sampling import GROUP_SAMPLE_K, UNIFORM_SAMPLE_SALT

    h = split_hash_sql(salt=UNIFORM_SAMPLE_SALT)
    return f"""
SELECT doc_id, lang, source, CAST(rn AS INT) AS sample_rank
FROM (
    SELECT doc_id, lang, source,
        ROW_NUMBER() OVER (PARTITION BY lang ORDER BY {h}, doc_id) AS rn
    FROM documents
)
WHERE rn <= {GROUP_SAMPLE_K}
"""


def _chunk_sql() -> str:
    """Stride starts are a prefix of the arithmetic sequence (the keep
    condition is monotone in s), so chunk_idx = (s−1)//stride equals the
    Spark side's posexplode position over the filtered array."""
    from ..operators.sampling import CHUNK_OVERLAP, CHUNK_STRIDE, CHUNK_TOKENS

    return f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
starts AS (
    SELECT doc_id, t, s
    FROM toks, unnest(generate_series(1, len(t), {CHUNK_STRIDE})) AS g(s)
    WHERE s = 1 OR s + {CHUNK_OVERLAP} <= len(t)
)
SELECT doc_id,
    CAST((s - 1) // {CHUNK_STRIDE} AS INT) AS chunk_idx,
    CAST(s AS INT) AS start_token,
    CAST(len(list_slice(t, s, s + {CHUNK_TOKENS - 1})) AS INT)
        AS n_chunk_tokens,
    md5(array_to_string(list_slice(t, s, s + {CHUNK_TOKENS - 1}), ' '))
        AS chunk_hash
FROM starts
"""


def _temperature_sql() -> str:
    """Quota arithmetic is EXACT integers end-to-end (corrected integer
    sqrt, integer Σ, floor-division) — mirrors operators/sampling.py's
    _isqrt_col + (x − x%Σ)/Σ formulation bit-for-bit. quota/SUM(w) are
    HUGEINT-adjacent but never reach the output (filter only)."""
    from ..operators.sampling import TEMPERATURE_SALT, TEMPERATURE_TARGET

    h = split_hash_sql(salt=TEMPERATURE_SALT)
    return f"""
WITH counts AS (
    SELECT source, COUNT(*) AS n_src FROM documents GROUP BY source
),
isq AS (
    SELECT source, n_src,
        CAST(FLOOR(SQRT(CAST(n_src AS DOUBLE))) AS BIGINT) AS s0
    FROM counts
),
w AS (
    SELECT source,
        s0 + (CASE WHEN (s0 + 1) * (s0 + 1) <= n_src THEN 1 ELSE 0 END)
           - (CASE WHEN s0 * s0 > n_src THEN 1 ELSE 0 END) AS w
    FROM isq
),
q AS (
    SELECT source,
        (w * {TEMPERATURE_TARGET}) // (SELECT SUM(w) FROM w) AS quota
    FROM w
),
ranked AS (
    SELECT doc_id, lang, source,
        ROW_NUMBER() OVER (PARTITION BY source ORDER BY {h}, doc_id) AS rn
    FROM documents
)
SELECT r.doc_id, r.lang, r.source, CAST(r.rn AS INT) AS sample_rank
FROM ranked r JOIN q USING (source)
WHERE r.rn <= q.quota
"""


UNIFORM_SAMPLE_K_SQL = _uniform_sample_sql()
SAMPLE_K_PER_GROUP_SQL = _group_sample_sql()
TEMPERATURE_RESAMPLE = _temperature_sql()
CHUNK_DOCUMENTS = _chunk_sql()

SAMPLING_ORACLES = {
    "uniform_sample_k": UNIFORM_SAMPLE_K_SQL,
    "sample_k_per_group": SAMPLE_K_PER_GROUP_SQL,
    "dataset_split": DATASET_SPLIT,
    "corpus_stats": CORPUS_STATS,
    "pack_sequences": PACK_SEQUENCES,
    "mixture_sample": MIXTURE_SAMPLE,
    "stratified_sample": STRATIFIED_SAMPLE,
    "temperature_resample": TEMPERATURE_RESAMPLE,
    "chunk_documents": CHUNK_DOCUMENTS,
}


def _weighted_sample_sql() -> str:
    """Sequential Poisson: identical salted hash and the SAME two-long
    IEEE division (no pow — cross-engine ulp hazard), top-K by
    (priority, doc_id)."""
    from ..operators.sampling import WEIGHTED_SAMPLE_K, WEIGHTED_SAMPLE_SALT

    h = split_hash_sql(salt=WEIGHTED_SAMPLE_SALT)
    return f"""
SELECT doc_id, lang, source,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
    CAST({h} AS DOUBLE) / len(string_split(text, ' ')) AS priority
FROM documents
ORDER BY priority, doc_id
LIMIT {WEIGHTED_SAMPLE_K}
"""


WEIGHTED_SAMPLE_TOKENS = _weighted_sample_sql()
SAMPLING_ORACLES["weighted_sample_tokens"] = WEIGHTED_SAMPLE_TOKENS

# dataset_card: the global one-row twin of CORPUS_STATS — same token/char
# expressions, same portable rounding, HUGEINT sums cast back to BIGINT,
# and the dup counter as COUNT(*) - COUNT(DISTINCT md5(text)) exactly like
# PER_SOURCE_REPORT's per-source form.
DATASET_CARD = f"""
WITH per_doc AS (
    SELECT lang, source, md5(text) AS h,
        len(string_split(text, ' ')) AS n_tokens,
        length(text) AS n_chars
    FROM documents
)
SELECT COUNT(*) AS n_docs,
    COUNT(DISTINCT lang) AS n_langs,
    COUNT(DISTINCT source) AS n_sources,
    CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
    CAST(SUM(n_chars) AS BIGINT) AS total_chars,
    COUNT(*) - COUNT(DISTINCT h) AS n_exact_dups,
    {portable_round_sql(
        'CAST(COUNT(*) - COUNT(DISTINCT h) AS DOUBLE) / COUNT(*)', 6
    )} AS exact_dup_rate,
    {portable_round_sql('CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*)', 6)}
        AS mean_tokens,
    {portable_round_sql('quantile_cont(n_tokens, 0.5)', 6)} AS p50_tokens,
    {portable_round_sql('quantile_cont(n_tokens, 0.9)', 6)} AS p90_tokens,
    CAST(MAX(n_tokens) AS INT) AS max_tokens
FROM per_doc
"""

SAMPLING_ORACLES["dataset_card"] = DATASET_CARD


# pack_efficiency_report: the pack_sequences oracle nested verbatim, bins
# reduced first, per-lang fill stats. Integer overfull test (bin_tokens >
# SEQ_LEN), fill = one division by the SEQ_LEN constant; mean at the
# 1e-6 distributed-avg grid; SUMs cast back from HUGEINT.
PACK_EFFICIENCY_REPORT = f"""
WITH packed AS ({PACK_SEQUENCES}),
bins AS (
    SELECT lang, shard, bin,
        CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
    FROM packed GROUP BY lang, shard, bin
),
v AS (
    SELECT lang, n_docs, bin_tokens,
        CAST(bin_tokens AS DOUBLE) / CAST({SEQ_LEN} AS DOUBLE) AS fill,
        CASE WHEN bin_tokens > {SEQ_LEN} THEN 1 ELSE 0 END AS overfull
    FROM bins
)
SELECT lang,
    CAST(COUNT(*) AS BIGINT) AS n_bins,
    CAST(SUM(n_docs) AS BIGINT) AS n_docs,
    CAST(SUM(bin_tokens) AS BIGINT) AS total_tokens,
    {portable_round_sql('AVG(fill)', 6)} AS mean_fill,
    MIN(fill) AS min_fill,
    MAX(fill) AS max_fill,
    CAST(SUM(overfull) AS BIGINT) AS overfull_bins
FROM v
GROUP BY lang
"""

SAMPLING_ORACLES["pack_efficiency_report"] = PACK_EFFICIENCY_REPORT
