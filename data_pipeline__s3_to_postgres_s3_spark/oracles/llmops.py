"""DuckDB oracles for the LLM-data-pipeline operators (operators/textops.py,
operators/dedup.py, operators/similarity.py).

Portability rules used here:
- md5() is the shared cross-engine hash (both engines produce identical hex).
- hex nibble → int via strpos('0123456789abcdef', c) - 1 (DuckDB lacks conv).
- embedding dot products cast every element to DOUBLE before multiplying —
  DuckDB's list_dot_product accumulates in float32 and is NOT parity-safe.
- cosines are rounded with the portable floor(x·10⁴+0.5)/10⁴ formula before
  ordering/thresholding, matching the Spark side.
"""

from ..functions.numeric import portable_round_sql
from ..operators.dedup import (
    CONTAINMENT_THRESHOLD,
    JACCARD_THRESHOLD,
    MINHASH_A,
    MINHASH_B,
    MINHASH_BAND_ROWS,
    MINHASH_PERMS,
    MINHASH_PRIME,
    NGRAM_DF_CAP,
    SIMHASH_BUCKET_CAP,
    SIMHASH_MAX_HAMMING,
    SIMHASH_SUB_NIBBLES,
)
from ..operators.similarity import (
    IVF_NPROBE,
    KMEANS_ITERS,
    KMEANS_K,
    LSH_BITS,
    LSH_TABLES,
    NEARDUP_BITS,
    NEARDUP_TABLES,
    N_QUERIES,
    NEARDUP_COSINE,
    SEMDEDUP_COSINE,
    TOP_K,
)
from ..operators.textops import BPE_PATTERN, LANG_MARKERS, STOPWORDS

_STOP_LIST = ", ".join(f"'{w}'" for w in STOPWORDS)

TEXT_QUALITY = f"""
WITH base AS (
    SELECT doc_id, lang, text,
        string_split(text, ' ') AS toks,
        length(text) AS n_chars
    FROM documents
)
SELECT doc_id, lang,
    len(toks) AS n_tokens,
    len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
        AS n_bpe_tokens,
    n_chars,
    CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(toks)
        AS avg_token_len,
    CAST(len(list_filter(toks, x -> x IN ({_STOP_LIST}))) AS DOUBLE)
        / len(toks) AS stopword_ratio,
    CASE WHEN n_chars > 0
         THEN CAST(n_chars
                   - length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g'))
                   - (len(toks) - 1) AS DOUBLE) / n_chars
         ELSE 0.0 END AS punct_ratio
FROM base
"""

# Char-trigram diversity: the oracle counts with a plain unnest+GROUP BY
# (the Spark side run-length-encodes inside each row — same counts, zero
# shuffle). Everything is exact integers until one final division, so no
# float rounding is needed anywhere; SUMs cast back to BIGINT (HUGEINT
# trap), MAX stays BIGINT (no widening).
CHAR_NGRAM_DIVERSITY = """
WITH base AS (
    SELECT doc_id, lang, text, length(text) AS L
    FROM documents WHERE length(text) >= 3
),
tri AS (
    SELECT doc_id, lang, substr(text, i, 3) AS tri
    FROM base, unnest(generate_series(1, L - 2)) AS t(i)
),
cnt AS (
    SELECT doc_id, lang, tri, COUNT(*) AS c
    FROM tri GROUP BY doc_id, lang, tri
),
agg AS (
    SELECT doc_id, lang,
        CAST(SUM(c) AS BIGINT) AS n_trigrams,
        COUNT(*) AS n_distinct,
        MAX(c) AS max_c,
        CAST(SUM(c * c) AS BIGINT) AS sum_sq
    FROM cnt GROUP BY doc_id, lang
)
SELECT doc_id, lang, n_trigrams, n_distinct,
    CAST(n_distinct AS DOUBLE) / n_trigrams AS distinct_ratio,
    CAST(max_c AS DOUBLE) / n_trigrams AS max_freq_ratio,
    CAST(n_trigrams * n_trigrams - sum_sq AS DOUBLE)
        / CAST(n_trigrams * n_trigrams AS DOUBLE) AS simpson_index
FROM agg
"""

# (lang, source) token-budget cross-tab; integer SUMs cast back to BIGINT
# (HUGEINT → pandas float64 trap), share_pct portable_round-ed at 1e-6 on
# both sides. The window SUM in the denominator never reaches the output.
TOKEN_BUDGET_REPORT = f"""
WITH per_cell AS (
    SELECT lang, source,
        COUNT(*) AS n_docs,
        CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
        CAST(SUM(len(regexp_extract_all(text,
            '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))) AS BIGINT) AS bpe_tokens
    FROM documents
    GROUP BY lang, source
)
SELECT lang, source, n_docs, ws_tokens, bpe_tokens,
    {portable_round_sql(
        'CAST(bpe_tokens AS DOUBLE) * 100 / (SUM(bpe_tokens) OVER ())', 6
    )} AS share_pct
FROM per_cell
"""

_LANGS = sorted(LANG_MARKERS)
_SCORE_COLS = ", ".join(
    "len(list_filter(string_split(text, ' '), x -> x IN ({}))) AS score_{}".format(
        ", ".join(f"'{w}'" for w in LANG_MARKERS[lang]), lang
    )
    for lang in _LANGS
)
_BEST = "greatest({})".format(", ".join(f"score_{lang}" for lang in _LANGS))
# Same chained argmax as the Spark side: alphabetical-first wins ties.
_PRED = "'und'"
for lang in reversed(_LANGS):
    _PRED = (
        f"CASE WHEN best_score > 0 AND score_{lang} = best_score"
        f" THEN '{lang}' ELSE {_PRED} END"
    )

LANG_ID = f"""
WITH scored AS (
    SELECT doc_id, lang AS actual_lang, {_SCORE_COLS}
    FROM documents
),
with_best AS (
    SELECT *, {_BEST} AS best_score FROM scored
)
SELECT doc_id, actual_lang, {_PRED} AS predicted_lang, best_score
FROM with_best
"""

DOC_FINGERPRINT = """
SELECT doc_id,
    md5(text) AS content_hash,
    md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS normalized_hash,
    substr(md5(text), 1, 4) AS shard_key,
    length(text) AS n_chars
FROM documents
"""

DEDUP_EXACT = """
SELECT md5(text) AS content_hash,
    MIN(doc_id) AS canonical_doc_id,
    COUNT(*) AS n_copies
FROM documents
GROUP BY content_hash
"""

# Hex → int without conv(): Horner chain over the first 7 md5 chars
# (matches Spark's conv(substring(md5, 1, 7), 16, 10)).
_NIBBLE_OF = "(strpos('0123456789abcdef', substr(m, {i}, 1)) - 1)"
_HEX7_TO_INT = _NIBBLE_OF.format(i=1)
for _i in range(2, 8):
    _HEX7_TO_INT = f"({_HEX7_TO_INT} * 16 + {_NIBBLE_OF.format(i=_i)})"

_A_LIST = "[" + ", ".join(str(a) for a in MINHASH_A) + "]"
_B_LIST = "[" + ", ".join(str(b) for b in MINHASH_B) + "]"

# Shared shingle CTE (word 3-grams, 1-based list indexing like element_at).
_SHINGLES = """
toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (
    SELECT DISTINCT doc_id,
        concat_ws(' ', t[i], t[i+1], t[i+2]) AS shingle
    FROM toks, unnest(generate_series(1, len(t) - 2)) AS u(i)
),
cnt AS (SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY doc_id)
"""

def dedup_ngram_jaccard_sql(df_cap: int = NGRAM_DF_CAP) -> str:
    """Replica of operators.dedup.dedup_ngram_jaccard with the SAME high-DF
    posting prune: shingles in more than `df_cap` docs are excluded from
    the intersection index (doc shingle-set sizes stay exact)."""
    return f"""
WITH {_SHINGLES},
df_ok AS (
    SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= {df_cap}
),
shk AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN df_ok USING (shingle)),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
    FROM shk a JOIN shk b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY doc_a, doc_b
)
SELECT doc_a, doc_b,
    CAST(n_inter AS DOUBLE) / (ca.n_shingles + cb.n_shingles - n_inter)
        AS jaccard
FROM inter
JOIN cnt ca ON ca.doc_id = doc_a
JOIN cnt cb ON cb.doc_id = doc_b
WHERE CAST(n_inter AS DOUBLE) / (ca.n_shingles + cb.n_shingles - n_inter)
      >= {JACCARD_THRESHOLD}
"""


DEDUP_NGRAM_JACCARD = dedup_ngram_jaccard_sql()
# Prefix-filtering variant is EXACT (no DF cap): the uncapped index SQL is
# its oracle — prefix filtering is candidate pruning, never result pruning.
DEDUP_JACCARD_PREFIX = dedup_ngram_jaccard_sql(df_cap=10**9)

# Asymmetric containment twin of the Jaccard oracle: same DF-capped
# intersection index, but each undirected (a<b) intersection row emits two
# DIRECTED verdicts with the INNER doc's shingle count as denominator.
DEDUP_CONTAINMENT = f"""
WITH {_SHINGLES},
df_ok AS (
    SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= {NGRAM_DF_CAP}
),
shk AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN df_ok USING (shingle)),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
    FROM shk a JOIN shk b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY doc_a, doc_b
),
sized AS (
    SELECT doc_a, doc_b, n_inter,
        ca.n_shingles AS n_a, cb.n_shingles AS n_b
    FROM inter
    JOIN cnt ca ON ca.doc_id = doc_a
    JOIN cnt cb ON cb.doc_id = doc_b
),
directed AS (
    SELECT doc_a AS inner_doc, doc_b AS outer_doc,
        CAST(n_inter AS DOUBLE) / n_a AS containment
    FROM sized
    UNION ALL
    SELECT doc_b, doc_a, CAST(n_inter AS DOUBLE) / n_b
    FROM sized
)
SELECT inner_doc, outer_doc, containment
FROM directed
WHERE containment >= {CONTAINMENT_THRESHOLD}
"""

DEDUP_MINHASH_LSH = f"""
WITH {_SHINGLES},
hashed AS (
    SELECT doc_id, {_HEX7_TO_INT} AS h
    FROM (SELECT doc_id, md5(shingle) AS m FROM sh)
),
mh AS (
    SELECT doc_id, p,
        MIN((({_A_LIST})[p + 1] * h + ({_B_LIST})[p + 1])
            % {MINHASH_PRIME}) AS minhash
    FROM hashed, unnest(generate_series(0, {MINHASH_PERMS - 1})) AS t(p)
    GROUP BY doc_id, p
),
bands AS (
    SELECT doc_id, p // {MINHASH_BAND_ROWS} AS band,
        md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY p)) AS band_key
    FROM mh GROUP BY doc_id, band
),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a
    JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
                AND a.doc_id < b.doc_id
),
inter AS (
    SELECT doc_a, doc_b, COUNT(*) AS n_inter
    FROM cand
    JOIN sh sa ON sa.doc_id = doc_a
    JOIN sh sb ON sb.doc_id = doc_b AND sb.shingle = sa.shingle
    GROUP BY doc_a, doc_b
)
SELECT doc_a, doc_b,
    CAST(n_inter AS DOUBLE) / (ca.n_shingles + cb.n_shingles - n_inter)
        AS jaccard
FROM inter
JOIN cnt ca ON ca.doc_id = doc_a
JOIN cnt cb ON cb.doc_id = doc_b
WHERE CAST(n_inter AS DOUBLE) / (ca.n_shingles + cb.n_shingles - n_inter)
      >= {JACCARD_THRESHOLD}
"""

def _incremental_minhash_sql() -> str:
    from ..operators.dedup import (
        INCREMENTAL_NEW_FRAC_DEN,
        INCREMENTAL_NEW_FRAC_NUM,
    )

    return f"""
WITH {_SHINGLES},
thr AS (
    SELECT (MAX(doc_id) * {INCREMENTAL_NEW_FRAC_NUM})
           // {INCREMENTAL_NEW_FRAC_DEN} AS t
    FROM documents
),
hashed AS (
    SELECT doc_id, {_HEX7_TO_INT} AS h
    FROM (SELECT doc_id, md5(shingle) AS m FROM sh)
),
mh AS (
    SELECT doc_id, p,
        MIN((({_A_LIST})[p + 1] * h + ({_B_LIST})[p + 1])
            % {MINHASH_PRIME}) AS minhash
    FROM hashed, unnest(generate_series(0, {MINHASH_PERMS - 1})) AS t(p)
    GROUP BY doc_id, p
),
bands AS (
    SELECT doc_id, p // {MINHASH_BAND_ROWS} AS band,
        md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY p)) AS band_key
    FROM mh GROUP BY doc_id, band
),
cand AS (
    SELECT DISTINCT a.doc_id AS corpus_doc_id, b.doc_id AS new_doc_id
    FROM bands a
    JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
    CROSS JOIN thr
    WHERE a.doc_id < thr.t AND b.doc_id >= thr.t
),
inter AS (
    SELECT corpus_doc_id, new_doc_id, COUNT(*) AS n_inter
    FROM cand
    JOIN sh sa ON sa.doc_id = corpus_doc_id
    JOIN sh sb ON sb.doc_id = new_doc_id AND sb.shingle = sa.shingle
    GROUP BY corpus_doc_id, new_doc_id
)
SELECT new_doc_id, corpus_doc_id,
    CAST(n_inter AS DOUBLE) / (ca.n_shingles + cb.n_shingles - n_inter)
        AS jaccard
FROM inter
JOIN cnt ca ON ca.doc_id = corpus_doc_id
JOIN cnt cb ON cb.doc_id = new_doc_id
WHERE CAST(n_inter AS DOUBLE) / (ca.n_shingles + cb.n_shingles - n_inter)
      >= {JACCARD_THRESHOLD}
"""


INCREMENTAL_DEDUP_MINHASH = _incremental_minhash_sql()

# --- SimHash (generated SQL: 64 bit-votes from md5 nibbles) ---------------

_NIB = "strpos('0123456789abcdef', substr(h, {pos}, 1)) - 1"
_VOTE_COLS = ", ".join(
    f"SUM(((({_NIB.format(pos=pos + 1)}) >> {3 - bit}) & 1) * 2 - 1)"
    f" AS s_{pos}_{bit}"
    for pos in range(16)
    for bit in range(4)
)
_HEX_DIGITS = ", ".join(
    "substr('0123456789abcdef', ("
    + " + ".join(
        f"CASE WHEN s_{pos}_{bit} > 0 THEN {1 << (3 - bit)} ELSE 0 END"
        for bit in range(4)
    )
    + f") + 1, 1) AS hx_{pos}"
    for pos in range(16)
)
_SIMHASH_CONCAT = " || ".join(f"hx_{pos}" for pos in range(16))

_SIMHASH_SIG = f"""
tok AS (
    SELECT DISTINCT doc_id, t AS token
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
    WHERE t <> ''
),
hashed AS (SELECT doc_id, md5(token) AS h FROM tok),
votes AS (SELECT doc_id, {_VOTE_COLS} FROM hashed GROUP BY doc_id),
sig AS (
    SELECT doc_id, {_SIMHASH_CONCAT} AS simhash
    FROM (SELECT doc_id, {_HEX_DIGITS} FROM votes)
)
"""

_POPCOUNT_NIBBLE = (
    "((x >> 3) & 1) + ((x >> 2) & 1) + ((x >> 1) & 1) + (x & 1)"
)
_HAMMING = " + ".join(
    _POPCOUNT_NIBBLE.replace(
        "x",
        f"xor(strpos('0123456789abcdef', substr(sim_a, {pos + 1}, 1)) - 1,"
        f" strpos('0123456789abcdef', substr(sim_b, {pos + 1}, 1)) - 1)",
    )
    for pos in range(16)
)

def dedup_simhash_sql(bucket_cap: int = SIMHASH_BUCKET_CAP) -> str:
    """Replica of operators.dedup.dedup_simhash candidate semantics: a band
    whose bucket exceeds `bucket_cap` has its key extended with
    SIMHASH_SUB_NIBBLES extra signature nibbles (next band's leading hex
    chars, cyclic) — both docs of a pair see the same bucket size, so the
    CASE is consistent across the join."""
    return f"""
WITH {_SIMHASH_SIG},
bands AS (
    SELECT doc_id, simhash,
        CAST(i AS VARCHAR) || ':' || substr(simhash, i * 4 + 1, 4) AS band_key,
        substr(simhash, ((i + 1) % 4) * 4 + 1, {SIMHASH_SUB_NIBBLES}) AS sub
    FROM sig, unnest(generate_series(0, 3)) AS t(i)
),
sizes AS (SELECT band_key, COUNT(*) AS n FROM bands GROUP BY band_key),
keyed AS (
    SELECT b.doc_id, b.simhash,
        CASE WHEN s.n > {bucket_cap}
             THEN b.band_key || '|' || b.sub ELSE b.band_key END AS k
    FROM bands b JOIN sizes s USING (band_key)
),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, a.simhash AS sim_a,
                    b.doc_id AS doc_b, b.simhash AS sim_b
    FROM keyed a JOIN keyed b ON a.k = b.k AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST({_HAMMING} AS INTEGER) AS hamming
FROM cand
WHERE {_HAMMING} <= {SIMHASH_MAX_HAMMING}
"""


DEDUP_SIMHASH = dedup_simhash_sql()

# --- Similarity search ----------------------------------------------------

_DOT_SQL = (
    "list_sum(list_transform(list_zip({a}, {b}),"
    " x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
)

_EMB_NORM = f"""
e AS (
    SELECT vec_id, embedding, len(embedding) AS dimlen,
        sqrt({_DOT_SQL.format(a='embedding', b='embedding')}) AS norm
    FROM (SELECT * FROM embeddings WHERE len(embedding) = (SELECT MAX(len(embedding)) FROM embeddings) AND len(list_filter(embedding, v -> v IS NULL)) = 0 AND len(list_filter(embedding, v -> isnan(CAST(v AS DOUBLE)) OR isinf(CAST(v AS DOUBLE)))) = 0 AND vec_id IS NOT NULL AND vec_id >= 0 AND vec_id NOT IN (SELECT vec_id FROM embeddings WHERE vec_id IS NOT NULL GROUP BY vec_id HAVING COUNT(*) > 1)) embeddings
)
"""

def _bucket_sql(table: int, bits: int = LSH_BITS) -> str:
    """Sign-bit bucket for hash table `table` (dims bits*t+1..bits*t+bits)
    — mirrors operators/similarity._sign_bucket."""
    return " || ".join(
        f"CASE WHEN CAST(embedding[{table * bits + i + 1}] AS DOUBLE)"
        " >= 0 THEN '1' ELSE '0' END"
        for i in range(bits)
    )


_BUCKET_COLS = ", ".join(
    f"{_bucket_sql(t)} AS b{t}" for t in range(LSH_TABLES)
)
# Only tables whose whole dim range exists may match — mirrors the Spark
# side's _fitting_tables bound via each row's dimlen (r10 short-dim
# probe: DuckDB's out-of-range list index returns NULL where Spark's
# element_at throws, so an unbounded table here would silently match on
# all-'0' padding buckets the Spark side never builds).
_ANY_TABLE_MATCH = " OR ".join(
    f"({(t + 1) * LSH_BITS} <= q.dimlen AND q.b{t} = e.b{t})"
    for t in range(LSH_TABLES)
)
_ND_BUCKET_COLS = ", ".join(
    f"{_bucket_sql(t, NEARDUP_BITS)} AS b{t}" for t in range(NEARDUP_TABLES)
)
_ANY_TABLE_MATCH_AB = " OR ".join(
    f"({(t + 1) * NEARDUP_BITS} <= a.dimlen AND a.b{t} = b.b{t})"
    for t in range(NEARDUP_TABLES)
)

_COS_AB = (
    f"FLOOR(({_DOT_SQL.format(a='q.embedding', b='e.embedding')}"
    f" / (q.norm * e.norm)) * 10000 + 0.5) / 10000"
)

SIMILARITY_BRUTEFORCE_TOPK = f"""
WITH {_EMB_NORM},
q AS (SELECT * FROM e WHERE vec_id < {N_QUERIES}),
scored AS (
    SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
        {_COS_AB} AS sim
    FROM q, e
    WHERE e.vec_id <> q.vec_id
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY sim DESC, vec_id ASC
    ) AS rank
    FROM scored
)
SELECT query_id, vec_id, sim, rank FROM ranked WHERE rank <= {TOP_K}
"""

# Multi-table LSH: candidate = collides with the query in ANY of the
# LSH_TABLES hash tables (the OR join is the oracle-side equivalent of the
# Spark plan's explode + equi-join + distinct).
SIMILARITY_LSH_TOPK = f"""
WITH {_EMB_NORM},
eb AS (SELECT *, {_BUCKET_COLS} FROM e),
q AS (SELECT * FROM eb WHERE vec_id < {N_QUERIES}),
scored AS (
    SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
        {_COS_AB} AS sim
    FROM q JOIN eb e ON ({_ANY_TABLE_MATCH}) AND e.vec_id <> q.vec_id
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY sim DESC, vec_id ASC
    ) AS rank
    FROM scored
)
SELECT query_id, vec_id, sim, rank FROM ranked WHERE rank <= {TOP_K}
"""

EMBEDDING_NEARDUP_PAIRS = f"""
WITH {_EMB_NORM},
eb AS (SELECT *, {_ND_BUCKET_COLS} FROM e),
scored AS (
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        FLOOR(({_DOT_SQL.format(a='a.embedding', b='b.embedding')}
               / (a.norm * b.norm)) * 10000 + 0.5) / 10000 AS sim
    FROM eb a JOIN eb b ON ({_ANY_TABLE_MATCH_AB}) AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, sim FROM scored WHERE sim >= {NEARDUP_COSINE}
"""

# int8 quantization: the per-element round is the portable FLOOR(x+0.5)
# formula, every aggregate (max, count-nonzero) is order-independent, so
# code vectors and the reconstruction error are bit-identical.
EMBEDDING_QUANTIZE = """
WITH scaled AS (
    SELECT vec_id, embedding,
        list_max(list_transform(embedding,
                 v -> abs(CAST(v AS DOUBLE)))) / 127 AS scale
    FROM (SELECT * FROM embeddings WHERE len(embedding) = (SELECT MAX(len(embedding)) FROM embeddings) AND len(list_filter(embedding, v -> v IS NULL)) = 0 AND len(list_filter(embedding, v -> isnan(CAST(v AS DOUBLE)) OR isinf(CAST(v AS DOUBLE)))) = 0 AND vec_id IS NOT NULL AND vec_id >= 0 AND vec_id NOT IN (SELECT vec_id FROM embeddings WHERE vec_id IS NOT NULL GROUP BY vec_id HAVING COUNT(*) > 1)) embeddings
),
coded AS (
    SELECT vec_id, embedding, scale,
        list_transform(embedding,
            v -> CASE WHEN coalesce(scale, 0) = 0 THEN 0
                 ELSE CAST(FLOOR(CAST(v AS DOUBLE) / scale + 0.5) AS INT)
                 END) AS q
    FROM scaled
)
SELECT vec_id, scale,
    md5(array_to_string(q, ',')) AS q_hash,
    CAST(len(list_filter(q, v -> v != 0)) AS INT) AS n_nonzero,
    list_max(list_transform(list_zip(q, embedding),
        x -> abs(CAST(x[1] AS DOUBLE) * scale - CAST(x[2] AS DOUBLE))))
        AS max_abs_err
FROM coded
"""

# SemDeDup: within-cluster (label partitioner) pairwise cosine; a vector
# with ANY lower-id twin at sim ≥ SEMDEDUP_COSINE is dropped. Cosine
# rounding mirrors the Spark side's portable_round(·, 4) exactly.
SEMANTIC_DEDUP = f"""
WITH e AS (
    SELECT vec_id, CAST(label AS BIGINT) AS cluster, embedding,
        sqrt({_DOT_SQL.format(a='embedding', b='embedding')}) AS norm
    FROM (SELECT * FROM embeddings WHERE len(embedding) = (SELECT MAX(len(embedding)) FROM embeddings) AND len(list_filter(embedding, v -> v IS NULL)) = 0 AND len(list_filter(embedding, v -> isnan(CAST(v AS DOUBLE)) OR isinf(CAST(v AS DOUBLE)))) = 0 AND vec_id IS NOT NULL AND vec_id >= 0 AND vec_id NOT IN (SELECT vec_id FROM embeddings WHERE vec_id IS NOT NULL GROUP BY vec_id HAVING COUNT(*) > 1)) embeddings
),
losers AS (
    SELECT DISTINCT b.vec_id
    FROM e a JOIN e b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
    WHERE FLOOR(({_DOT_SQL.format(a='a.embedding', b='b.embedding')}
                 / (a.norm * b.norm)) * 10000 + 0.5) / 10000
          >= {SEMDEDUP_COSINE}
)
SELECT e.vec_id, e.cluster, l.vec_id IS NULL AS keep
FROM e LEFT JOIN losers l ON l.vec_id = e.vec_id
"""



_D2_SQL = (
    "list_sum(list_transform(list_zip({a}, {b}),"
    " x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))"
    " * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))))"
)

# IVF replica: per-label mean centroids (rounded 1e-6 like the Spark side so
# AVG float-order differences cannot flip a nearest-cell decision), nearest
# cell per vector, nprobe=IVF_NPROBE (4) probing, exact cosine within
# probed cells.
SIMILARITY_IVF_TOPK = f"""
WITH {_EMB_NORM},
flat AS (
    -- NULL-label rows train no centroid (mirrors ivf_centroids).
    SELECT label, unnest(embedding) AS val,
        generate_subscripts(embedding, 1) AS dim
    FROM (SELECT * FROM embeddings WHERE len(embedding) = (SELECT MAX(len(embedding)) FROM embeddings) AND len(list_filter(embedding, v -> v IS NULL)) = 0 AND len(list_filter(embedding, v -> isnan(CAST(v AS DOUBLE)) OR isinf(CAST(v AS DOUBLE)))) = 0 AND vec_id IS NOT NULL AND vec_id >= 0 AND vec_id NOT IN (SELECT vec_id FROM embeddings WHERE vec_id IS NOT NULL GROUP BY vec_id HAVING COUNT(*) > 1)) embeddings
    WHERE label IS NOT NULL
),
cent AS (
    SELECT label AS cell, dim,
        FLOOR(AVG(CAST(val AS DOUBLE)) * 1000000 + 0.5) / 1000000 AS c
    FROM flat GROUP BY label, dim
),
centroids AS (
    SELECT cell, list(c ORDER BY dim) AS centroid FROM cent GROUP BY cell
),
scored AS (
    SELECT e.vec_id, c.cell,
        FLOOR({_D2_SQL.format(a='e.embedding', b='c.centroid')} * 1000000
              + 0.5) / 1000000 AS d2
    FROM e, centroids c
),
assigned AS (
    SELECT vec_id, cell FROM (
        SELECT vec_id, cell, ROW_NUMBER() OVER (
            PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS rn
        FROM scored
    ) WHERE rn = 1
),
probes AS (
    SELECT vec_id AS query_id, cell FROM (
        SELECT vec_id, cell, ROW_NUMBER() OVER (
            PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS rn
        FROM scored WHERE vec_id < {N_QUERIES}
    ) WHERE rn <= {IVF_NPROBE}
),
paired AS (
    SELECT p.query_id, a.vec_id,
        {_COS_AB.replace('e.embedding', 't.embedding').replace('e.norm', 't.norm')} AS sim
    FROM probes p
    JOIN assigned a ON a.cell = p.cell AND a.vec_id <> p.query_id
    JOIN e q ON q.vec_id = p.query_id
    JOIN e t ON t.vec_id = a.vec_id
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY sim DESC, vec_id ASC
    ) AS rank
    FROM paired
)
SELECT query_id, vec_id, sim, rank FROM ranked WHERE rank <= {TOP_K}
"""

# Winnowing fingerprints: same combined (hash << 20 | pos) key and the same
# truncated trailing ROWS frame as the Spark side.
WINNOW_FINGERPRINTS = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
grams AS (
    SELECT doc_id, i - 1 AS pos,
        concat_ws(' ', t[i], t[i+1], t[i+2]) AS gram
    FROM toks, unnest(generate_series(1, len(t) - 2)) AS u(i)
),
hashed AS (
    SELECT doc_id, pos,
        ({_HEX7_TO_INT} * 1048576 + pos) AS key
    FROM (SELECT doc_id, pos, md5(gram) AS m FROM grams)
),
winnowed AS (
    SELECT DISTINCT doc_id,
        MIN(key) OVER (
            PARTITION BY doc_id ORDER BY pos
            ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING
        ) AS fp_key
    FROM hashed
)
SELECT doc_id, fp_key // 1048576 AS fingerprint, fp_key % 1048576 AS pos
FROM winnowed
"""

def _winnow_dup_sql() -> str:
    """Shared-fingerprint pairs over the winnow oracle, with the SAME
    DF cap / min-shared constants as the Spark operator (imported, so the
    two can never drift)."""
    from ..operators.textops import WINNOW_DUP_DF_CAP, WINNOW_DUP_MIN_SHARED

    return f"""
WITH base AS ({WINNOW_FINGERPRINTS}),
fps AS (SELECT DISTINCT doc_id, fingerprint FROM base),
rare AS (
    SELECT fingerprint FROM fps
    GROUP BY fingerprint HAVING COUNT(*) <= {WINNOW_DUP_DF_CAP}
),
kept AS (SELECT doc_id, fingerprint FROM fps JOIN rare USING (fingerprint))
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared_fps
FROM kept a JOIN kept b
  ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING COUNT(*) >= {WINNOW_DUP_MIN_SHARED}
"""


WINNOW_DUP_CANDIDATES = _winnow_dup_sql()

# Near-dup clusters: transitive closure of the MinHash-LSH pairs. The
# recursive CTE computes, for every node, the set of reachable nodes over
# the symmetrized edge list (UNION gives set semantics, so it terminates);
# MIN(reachable) is exactly the Spark side's smallest-member cluster id.
# Docs in no pair fall through the LEFT JOIN as their own singleton.
DEDUP_CLUSTERS = f"""
WITH RECURSIVE pairs AS ({DEDUP_MINHASH_LSH}),
edges AS (
    SELECT doc_a AS src, doc_b AS dst FROM pairs
    UNION
    SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach(node, r) AS (
    SELECT src, src FROM edges
    UNION
    SELECT e.src, reach.r FROM edges e JOIN reach ON reach.node = e.dst
),
cc AS (SELECT node, MIN(r) AS comp FROM reach GROUP BY node),
labeled AS (
    SELECT d.doc_id, COALESCE(cc.comp, d.doc_id) AS cluster_id
    FROM documents d LEFT JOIN cc ON cc.node = d.doc_id
),
sizes AS (
    SELECT cluster_id, COUNT(*) AS cluster_size FROM labeled GROUP BY cluster_id
)
SELECT l.doc_id, l.cluster_id, s.cluster_size,
    l.doc_id = l.cluster_id AS is_canonical
FROM labeled l JOIN sizes s USING (cluster_id)
"""


# Quality-aware cluster collapse: the full clusters oracle nested as a CTE,
# winner = (n_chars DESC, doc_id ASC) per cluster — same window as Spark.
DEDUP_KEEP_BEST = f"""
WITH clusters AS ({DEDUP_CLUSTERS})
SELECT c.doc_id, c.cluster_id, c.cluster_size, d.n_chars,
    ROW_NUMBER() OVER w = 1 AS keep,
    FIRST_VALUE(c.doc_id) OVER w AS kept_doc_id
FROM clusters c JOIN documents d ON c.doc_id = d.doc_id
WINDOW w AS (
    PARTITION BY c.cluster_id ORDER BY d.n_chars DESC, c.doc_id ASC
)
"""


# --- K-means (generated: KMEANS_ITERS unrolled Lloyd rounds) --------------
# Same parity recipe as IVF: centroid components AND squared distances
# rounded floor(x·1e6+0.5)/1e6 so AVG/fold accumulation order cannot flip
# an assignment; ROW_NUMBER tie-break (d2 ASC, cell ASC) == Spark's
# min(struct(d2, cell)).


def _kmeans_oracle() -> str:
    ctes = [
        "flat AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS val,"
        " generate_subscripts(embedding, 1) AS dim FROM (SELECT * FROM embeddings WHERE len(embedding) = (SELECT MAX(len(embedding)) FROM embeddings) AND len(list_filter(embedding, v -> v IS NULL)) = 0 AND len(list_filter(embedding, v -> isnan(CAST(v AS DOUBLE)) OR isinf(CAST(v AS DOUBLE)))) = 0 AND vec_id IS NOT NULL AND vec_id >= 0 AND vec_id NOT IN (SELECT vec_id FROM embeddings WHERE vec_id IS NOT NULL GROUP BY vec_id HAVING COUNT(*) > 1)) embeddings)",
        f"c0 AS (SELECT vec_id AS cell,"
        f" list_transform(embedding, x -> CAST(x AS DOUBLE)) AS centroid"
        f" FROM (SELECT * FROM embeddings WHERE len(embedding) = (SELECT MAX(len(embedding)) FROM embeddings) AND len(list_filter(embedding, v -> v IS NULL)) = 0 AND len(list_filter(embedding, v -> isnan(CAST(v AS DOUBLE)) OR isinf(CAST(v AS DOUBLE)))) = 0 AND vec_id IS NOT NULL AND vec_id >= 0 AND vec_id NOT IN (SELECT vec_id FROM embeddings WHERE vec_id IS NOT NULL GROUP BY vec_id HAVING COUNT(*) > 1)) embeddings WHERE vec_id < {KMEANS_K})",
    ]
    d2 = (
        "FLOOR((" + _D2_SQL.format(a="e.embedding", b="c.centroid")
        + ") * 1000000 + 0.5) / 1000000"
    )
    for i in range(KMEANS_ITERS + 1):
        ctes.append(
            f"s{i} AS (SELECT e.vec_id, c.cell, {d2} AS d2"
            f" FROM (SELECT * FROM embeddings WHERE len(embedding) = (SELECT MAX(len(embedding)) FROM embeddings) AND len(list_filter(embedding, v -> v IS NULL)) = 0 AND len(list_filter(embedding, v -> isnan(CAST(v AS DOUBLE)) OR isinf(CAST(v AS DOUBLE)))) = 0 AND vec_id IS NOT NULL AND vec_id >= 0 AND vec_id NOT IN (SELECT vec_id FROM embeddings WHERE vec_id IS NOT NULL GROUP BY vec_id HAVING COUNT(*) > 1)) e, c{i} c)"
        )
        ctes.append(
            f"a{i} AS (SELECT vec_id, cell, d2 FROM ("
            f" SELECT vec_id, cell, d2, ROW_NUMBER() OVER ("
            f" PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS rn FROM s{i})"
            f" WHERE rn = 1)"
        )
        if i < KMEANS_ITERS:
            ctes.append(
                f"c{i + 1} AS (SELECT cell, list(c ORDER BY dim) AS centroid"
                f" FROM (SELECT a.cell, f.dim,"
                f" FLOOR(AVG(f.val) * 1000000 + 0.5) / 1000000 AS c"
                f" FROM a{i} a JOIN flat f USING (vec_id)"
                f" GROUP BY a.cell, f.dim) GROUP BY cell)"
            )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT vec_id, cell AS cluster, d2 FROM a{KMEANS_ITERS}"
    )


EMBEDDING_KMEANS = _kmeans_oracle()


# TF·IDF: score rounded to 1e-6 BEFORE ranking on both sides so last-ulp
# ln() differences between DuckDB and the JVM can't flip the top-k order
# (the proven k-means/IVF parity recipe).
TFIDF_TOP_TERMS = """
WITH terms AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (
    SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY doc_id, term
),
df AS (
    SELECT term, COUNT(DISTINCT doc_id) AS df FROM terms GROUP BY term
),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
    SELECT doc_id, term, tf, df,
        FLOOR(tf * ln(CAST(n_docs AS DOUBLE) / df) * 1000000 + 0.5)
            / 1000000 AS tfidf
    FROM tf JOIN df USING (term), n
)
SELECT doc_id, CAST(rank AS INT) AS rank, term,
       CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, tfidf
FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY tfidf DESC, term ASC
    ) AS rank
    FROM scored
)
WHERE rank <= 3
"""

TOP_BIGRAMS_PER_LANG = """
WITH toks AS (
    SELECT lang, string_split(text, ' ') AS t FROM documents
),
bigrams AS (
    SELECT lang,
        unnest([t[i] || ' ' || t[i + 1]
                FOR i IN range(1, greatest(len(t), 1))]) AS bigram
    FROM toks
),
counted AS (
    SELECT lang, bigram, COUNT(*) AS n FROM bigrams GROUP BY lang, bigram
)
SELECT lang, CAST(rank AS INT) AS rank, bigram, CAST(n AS BIGINT) AS n
FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY lang ORDER BY n DESC, bigram ASC
    ) AS rank
    FROM counted
)
WHERE rank <= 10
"""

NORMALIZE_TEXT = """
WITH norm AS (
    SELECT doc_id, text,
        trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '',
             'g'), ' +', ' ', 'g')) AS norm_text
    FROM documents
)
SELECT doc_id, norm_text,
    CASE WHEN norm_text = '' THEN 0
         ELSE CAST(len(string_split(norm_text, ' ')) AS INT) END
        AS n_tokens_norm,
    norm_text <> text AS changed
FROM norm
"""

# PII scrub: the IDENTICAL patterns (common Java-regex/RE2 subset) applied
# via DuckDB's RE2 — 'g' flag to match Spark's replace-all semantics.
from ..operators.pii import PII_PATTERNS  # noqa: E402


def _pii_sql() -> str:
    clean = "text"
    for _, pattern, token in PII_PATTERNS:
        clean = f"regexp_replace({clean}, '{pattern}', '{token}', 'g')"
    counts = ",\n        ".join(
        f"len(regexp_extract_all(text, '{pattern}')) AS n_{name}"
        for name, pattern, _ in PII_PATTERNS
    )
    total = " + ".join(f"n_{name}" for name, _, _ in PII_PATTERNS)
    return f"""
WITH scrubbed AS (
    SELECT doc_id,
        {clean} AS clean_text,
        {counts}
    FROM documents
)
SELECT *, ({total}) > 0 AS has_pii FROM scrubbed
"""


PII_SCRUB = _pii_sql()


def _bm25_sql() -> str:
    """BM25 oracle built from the SAME query workload constants as the
    Spark operator (operators/textops.py BM25_QUERIES) so the two can
    never drift. Arithmetic association mirrors the Spark expression tree
    token-for-token; per-term scores quantize to integer micro-units
    before the SUM, making the per-query aggregate order-independent."""
    from ..operators.textops import BM25_B, BM25_K1, BM25_QUERIES, BM25_TOP_K

    all_terms = sorted({t for q in BM25_QUERIES.values() for t in q})
    in_list = ", ".join(f"'{t}'" for t in all_terms)
    qvals = ", ".join(
        f"({qid}, '{t}')" for qid, ts in BM25_QUERIES.items() for t in ts
    )
    return f"""
WITH stats AS (
    SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
           AVG(len(string_split(text, ' '))) AS avgdl
    FROM documents
),
terms AS (
    SELECT doc_id, len(string_split(text, ' ')) AS dl,
           unnest(string_split(text, ' ')) AS term
    FROM documents
),
tf AS (
    SELECT doc_id, term, COUNT(*) AS tf, MAX(dl) AS dl
    FROM terms
    WHERE term IN ({in_list})
    GROUP BY doc_id, term
),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
qmap(query_id, term) AS (VALUES {qvals}),
scored AS (
    SELECT query_id, doc_id,
        SUM(CAST(FLOOR(
            ln(1 + (stats.n_docs - df + 0.5) / (df + 0.5))
            * ((tf * ({BM25_K1} + 1)) /
               (tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl / avgdl)))
            * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0 AS score
    FROM tf JOIN df USING (term) JOIN qmap USING (term), stats
    GROUP BY query_id, doc_id
)
SELECT CAST(query_id AS INT) AS query_id, CAST(rank AS INT) AS rank,
       doc_id, score
FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY score DESC, doc_id ASC
    ) AS rank
    FROM scored
)
WHERE rank <= {BM25_TOP_K}
"""


BM25_TOPK = _bm25_sql()


def _rrf_sql() -> str:
    """Reciprocal-rank-fusion oracle (operators/textops.rrf_hybrid_topk):
    lexical channel = the full BM25 oracle as a nested subquery (the two
    can never drift), dense channel = the bruteforce-cosine formulation
    restricted to the BM25 query ids (vec_id ≡ doc_id). RRF terms are
    written in the Spark expression's token order — lex term + emb term,
    each CAST(1 AS DOUBLE)/(60 + rank) — so scores are bit-identical;
    missed-channel ranks surface as 0, never NULL (nullable ints widen
    to float64 in pandas and hash on NaN)."""
    from ..operators.textops import BM25_QUERIES, RRF_K, RRF_TOP_K

    q_ids = ", ".join(str(q) for q in sorted(BM25_QUERIES))
    return f"""
WITH lex AS (
    SELECT query_id, doc_id, rank AS lex_rank FROM ({BM25_TOPK})
),
{_EMB_NORM},
q AS (SELECT * FROM e WHERE vec_id IN ({q_ids})),
dense0 AS (
    SELECT CAST(q.vec_id AS INT) AS query_id, e.vec_id AS doc_id,
        {_COS_AB} AS sim
    FROM q, e
    WHERE e.vec_id <> q.vec_id
),
dense AS (
    SELECT query_id, doc_id, CAST(rank AS INT) AS emb_rank FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY sim DESC, doc_id ASC
        ) AS rank
        FROM dense0
    )
    WHERE rank <= {RRF_TOP_K}
),
fused AS (
    SELECT query_id, doc_id,
        COALESCE(CAST(1 AS DOUBLE) / ({RRF_K} + lex_rank),
                 CAST(0 AS DOUBLE))
      + COALESCE(CAST(1 AS DOUBLE) / ({RRF_K} + emb_rank),
                 CAST(0 AS DOUBLE)) AS rrf_score,
        COALESCE(lex_rank, 0) AS lex_rank,
        COALESCE(emb_rank, 0) AS emb_rank
    FROM lex FULL OUTER JOIN dense USING (query_id, doc_id)
)
SELECT query_id, CAST(rank AS INT) AS rank, doc_id, rrf_score,
       lex_rank, emb_rank
FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY rrf_score DESC, doc_id ASC
    ) AS rank
    FROM fused
)
WHERE rank <= {RRF_TOP_K}
"""


RRF_HYBRID_TOPK = _rrf_sql()

LLMOPS_ORACLES = {
    "bm25_topk": BM25_TOPK,
    "rrf_hybrid_topk": RRF_HYBRID_TOPK,
    "text_quality": TEXT_QUALITY,
    "lang_id": LANG_ID,
    "doc_fingerprint": DOC_FINGERPRINT,
    "winnow_fingerprints": WINNOW_FINGERPRINTS,
    "winnow_dup_candidates": WINNOW_DUP_CANDIDATES,
    "dedup_exact": DEDUP_EXACT,
    "dedup_ngram_jaccard": DEDUP_NGRAM_JACCARD,
    "dedup_jaccard_prefix": DEDUP_JACCARD_PREFIX,
    "dedup_containment": DEDUP_CONTAINMENT,
    "dedup_minhash_lsh": DEDUP_MINHASH_LSH,
    "incremental_dedup_minhash": INCREMENTAL_DEDUP_MINHASH,
    "dedup_simhash": DEDUP_SIMHASH,
    "dedup_clusters": DEDUP_CLUSTERS,
    "dedup_keep_best": DEDUP_KEEP_BEST,
    "similarity_bruteforce_topk": SIMILARITY_BRUTEFORCE_TOPK,
    "similarity_lsh_topk": SIMILARITY_LSH_TOPK,
    "similarity_ivf_topk": SIMILARITY_IVF_TOPK,
    "embedding_neardup_pairs": EMBEDDING_NEARDUP_PAIRS,
    "embedding_kmeans": EMBEDDING_KMEANS,
    "semantic_dedup": SEMANTIC_DEDUP,
    "embedding_quantize": EMBEDDING_QUANTIZE,
    "token_budget_report": TOKEN_BUDGET_REPORT,
    "char_ngram_diversity": CHAR_NGRAM_DIVERSITY,
    "tfidf_top_terms": TFIDF_TOP_TERMS,
    "top_bigrams_per_lang": TOP_BIGRAMS_PER_LANG,
    "normalize_text": NORMALIZE_TEXT,
    "pii_scrub": PII_SCRUB,
}

# vocab_oov_report: same top-K census (count DESC, token ASC — exact
# deterministic tie-break) and the same single-division ratio; the oracle
# scores via explode + IN (subquery) instead of the literal array, an
# independent formulation of the same membership test.
from ..operators.textops import VOCAB_K

VOCAB_OOV_REPORT = f"""
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
vocab AS (
    SELECT tok FROM toks GROUP BY tok
    ORDER BY COUNT(*) DESC, tok LIMIT {VOCAB_K}
)
SELECT doc_id,
    CAST(COUNT(*) AS INT) AS n_tokens,
    CAST(COUNT(CASE WHEN tok NOT IN (SELECT tok FROM vocab) THEN 1 END)
         AS INT) AS n_oov,
    CAST(COUNT(CASE WHEN tok NOT IN (SELECT tok FROM vocab) THEN 1 END)
         AS DOUBLE) / COUNT(*) AS oov_ratio
FROM toks GROUP BY doc_id
"""

LLMOPS_ORACLES["vocab_oov_report"] = VOCAB_OOV_REPORT

# minhash_estimate_audit: the LSH candidate CTEs verbatim (same signatures,
# same banding), est = matching permutations / PERMS, exact Jaccard from
# the shared intersection form, abs_err of identically-derived doubles.
MINHASH_ESTIMATE_AUDIT = f"""
WITH {_SHINGLES},
hashed AS (
    SELECT doc_id, {_HEX7_TO_INT} AS h
    FROM (SELECT doc_id, md5(shingle) AS m FROM sh)
),
mh AS (
    SELECT doc_id, p,
        MIN((({_A_LIST})[p + 1] * h + ({_B_LIST})[p + 1])
            % {MINHASH_PRIME}) AS minhash
    FROM hashed, unnest(generate_series(0, {MINHASH_PERMS - 1})) AS t(p)
    GROUP BY doc_id, p
),
bands AS (
    SELECT doc_id, p // {MINHASH_BAND_ROWS} AS band,
        md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY p)) AS band_key
    FROM mh GROUP BY doc_id, band
),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a
    JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
                AND a.doc_id < b.doc_id
),
est AS (
    SELECT c.doc_a, c.doc_b,
        COUNT(CASE WHEN ma.minhash = mb.minhash THEN 1 END) AS n_match
    FROM cand c
    JOIN mh ma ON ma.doc_id = c.doc_a
    JOIN mh mb ON mb.doc_id = c.doc_b AND mb.p = ma.p
    GROUP BY c.doc_a, c.doc_b
),
inter AS (
    SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
    FROM cand c
    JOIN sh sa ON sa.doc_id = c.doc_a
    JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
    GROUP BY c.doc_a, c.doc_b
)
SELECT e.doc_a, e.doc_b,
    CAST(e.n_match AS DOUBLE) / {MINHASH_PERMS} AS est_sim,
    CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
        / (ca.n_shingles + cb.n_shingles - COALESCE(i.n_inter, 0))
        AS jaccard,
    ABS(CAST(e.n_match AS DOUBLE) / {MINHASH_PERMS}
        - CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
          / (ca.n_shingles + cb.n_shingles - COALESCE(i.n_inter, 0)))
        AS abs_err
FROM est e
LEFT JOIN inter i ON i.doc_a = e.doc_a AND i.doc_b = e.doc_b
JOIN cnt ca ON ca.doc_id = e.doc_a
JOIN cnt cb ON cb.doc_id = e.doc_b
"""

LLMOPS_ORACLES["minhash_estimate_audit"] = MINHASH_ESTIMATE_AUDIT

# lang_confusion_matrix: nests the lang_id scoring verbatim, rolls up the
# |langs|² cells, row share = one long division windowed over the cells.
LANG_CONFUSION_MATRIX = f"""
WITH scored AS (
    SELECT lang AS actual_lang, {_SCORE_COLS}
    FROM documents
),
with_best AS (
    SELECT *, {_BEST} AS best_score FROM scored
),
pred AS (
    SELECT actual_lang, {_PRED} AS predicted_lang FROM with_best
),
cells AS (
    SELECT actual_lang, predicted_lang, COUNT(*) AS n_docs
    FROM pred GROUP BY actual_lang, predicted_lang
)
SELECT actual_lang, predicted_lang, n_docs,
    CAST(n_docs AS DOUBLE) /
        SUM(n_docs) OVER (PARTITION BY actual_lang) AS row_share
FROM cells
"""

LLMOPS_ORACLES["lang_confusion_matrix"] = LANG_CONFUSION_MATRIX

# exact_span_dedup: mirrors operators/dedup.py:exact_span_dedup — same
# space-split tokens, same element-by-element md5 K-gram keys (md5 is the
# portable cross-engine hash), same DF cap, same diagonal-islands run
# detection (pos - ROW_NUMBER within (pair, diag) — ties impossible since
# (doc, pos) rows are unique). Counts cast back to BIGINT (HUGEINT trap).
from ..operators.dedup import (
    SPAN_GRAM_DF_CAP,
    SPAN_GRAM_TOKENS,
    SPAN_MIN_RUN_GRAMS,
)

_SPAN_CAT = " || ' ' || ".join(
    f"ws[i + {j}]" for j in range(SPAN_GRAM_TOKENS)
)

EXACT_SPAN_DEDUP = f"""
WITH staged AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
grams AS (
    SELECT doc_id, i AS pos, md5({_SPAN_CAT}) AS g
    FROM staged,
        unnest(generate_series(
            1, greatest(len(ws) - {SPAN_GRAM_TOKENS - 1}, 0))) AS t(i)
),
heavy AS (
    SELECT g FROM grams GROUP BY g
    HAVING COUNT(DISTINCT doc_id) > {SPAN_GRAM_DF_CAP}
),
kept AS (SELECT * FROM grams WHERE g NOT IN (SELECT g FROM heavy)),
m AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pa,
        a.pos - b.pos AS diag
    FROM kept a JOIN kept b USING (g)
    WHERE a.doc_id < b.doc_id
),
runs AS (
    SELECT doc_a, doc_b, diag,
        pa - ROW_NUMBER() OVER (
            PARTITION BY doc_a, doc_b, diag ORDER BY pa) AS island
    FROM m
),
runlens AS (
    SELECT doc_a, doc_b, CAST(COUNT(*) AS BIGINT) AS run_len
    FROM runs GROUP BY doc_a, doc_b, diag, island
)
SELECT doc_a, doc_b,
    CAST(SUM(run_len) AS BIGINT) AS n_gram_matches,
    CAST(MAX(run_len) AS BIGINT) AS max_run_grams,
    CAST(MAX(run_len) + {SPAN_GRAM_TOKENS - 1} AS BIGINT)
        AS longest_span_tokens
FROM runlens GROUP BY doc_a, doc_b
HAVING MAX(run_len) >= {SPAN_MIN_RUN_GRAMS}
"""

LLMOPS_ORACLES["exact_span_dedup"] = EXACT_SPAN_DEDUP

# incremental_dedup_bloom: the oracle computes the EXACT incremental
# dedup result with a plain hash join over the same (max*9)//10 boundary —
# the Spark side's Bloom prefilter is pure I/O savings (no false
# negatives), so the verified outputs are identical by construction.
from ..operators.dedup import (
    INCREMENTAL_NEW_FRAC_DEN,
    INCREMENTAL_NEW_FRAC_NUM,
)

INCREMENTAL_DEDUP_BLOOM = f"""
WITH thr AS (
    SELECT (MAX(doc_id) * {INCREMENTAL_NEW_FRAC_NUM})
           // {INCREMENTAL_NEW_FRAC_DEN} AS t
    FROM documents
),
corpus AS (
    SELECT doc_id, md5(text) AS h FROM documents, thr WHERE doc_id < t
),
fresh AS (
    SELECT doc_id, md5(text) AS h FROM documents, thr WHERE doc_id >= t
)
SELECT f.doc_id AS new_doc_id,
    MIN(c.doc_id) AS canonical_corpus_doc_id,
    CAST(COUNT(*) AS BIGINT) AS n_corpus_copies
FROM fresh f JOIN corpus c USING (h)
GROUP BY f.doc_id
"""

LLMOPS_ORACLES["incremental_dedup_bloom"] = INCREMENTAL_DEDUP_BLOOM

# bloom_vocab_novelty: the oracle computes the EXACT per-new-doc token
# novelty with a plain distinct-word anti-join over the same (max*9)//10
# boundary — the Spark side's Bloom filter is pure I/O savings (no false
# negatives; hits pay an exact verification semi-join), so the counts are
# identical by construction. COUNT (never SUM) keeps every column BIGINT
# on both engines; NULL text mirrors the coalesce-to-empty contract, and
# empty tokens from repeated spaces are filtered identically.
BLOOM_VOCAB_NOVELTY = f"""
WITH thr AS (
    SELECT (MAX(doc_id) * {INCREMENTAL_NEW_FRAC_NUM})
           // {INCREMENTAL_NEW_FRAC_DEN} AS t
    FROM documents
),
tok AS (
    SELECT doc_id,
           doc_id >= (SELECT t FROM thr) AS is_new,
           unnest(string_split(coalesce(text, ''), ' ')) AS w
    FROM documents
),
words AS (
    SELECT DISTINCT doc_id, is_new, w FROM tok WHERE w <> ''
),
corpus_vocab AS (
    SELECT DISTINCT w FROM words WHERE NOT is_new
),
new_pairs AS (
    SELECT doc_id, w FROM words WHERE is_new
)
SELECT p.doc_id AS new_doc_id,
       COUNT(*) AS n_distinct_tokens,
       COUNT(cv.w) AS n_seen_tokens,
       COUNT(*) - COUNT(cv.w) AS n_novel_tokens
FROM new_pairs p LEFT JOIN corpus_vocab cv USING (w)
GROUP BY p.doc_id
"""

LLMOPS_ORACLES["bloom_vocab_novelty"] = BLOOM_VOCAB_NOVELTY

# hard_negative_mining: brute-force oracle twin with the label inequality
# in the join predicate — same cosine association and portable rounding as
# SIMILARITY_BRUTEFORCE_TOPK, same (sim DESC, vec_id ASC) total ordering.
HARD_NEGATIVE_MINING = f"""
WITH el AS (
    SELECT vec_id, label, embedding,
        sqrt({_DOT_SQL.format(a='embedding', b='embedding')}) AS norm
    FROM (SELECT * FROM embeddings WHERE len(embedding) = (SELECT MAX(len(embedding)) FROM embeddings) AND len(list_filter(embedding, v -> v IS NULL)) = 0 AND len(list_filter(embedding, v -> isnan(CAST(v AS DOUBLE)) OR isinf(CAST(v AS DOUBLE)))) = 0 AND vec_id IS NOT NULL AND vec_id >= 0 AND vec_id NOT IN (SELECT vec_id FROM embeddings WHERE vec_id IS NOT NULL GROUP BY vec_id HAVING COUNT(*) > 1)) embeddings
),
q AS (SELECT * FROM el WHERE vec_id < {N_QUERIES}),
scored AS (
    SELECT q.vec_id AS query_id, q.label AS query_label,
        e.vec_id AS vec_id, e.label AS neg_label,
        {_COS_AB} AS sim
    FROM q, el e
    WHERE e.label <> q.label
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY sim DESC, vec_id ASC
    ) AS rank
    FROM scored
)
SELECT query_id, query_label, vec_id, neg_label, sim, rank
FROM ranked WHERE rank <= {TOP_K}
"""

LLMOPS_ORACLES["hard_negative_mining"] = HARD_NEGATIVE_MINING

# semantic_decontaminate: same multiplicative-hash split as dataset_split
# (keyed on vec_id — the doc-embedding convention), same cosine fold and
# portable rounding, same (cosine DESC, eval_vec_id ASC) nearest pick.
from ..operators.sampling import (
    SPLIT_BUCKETS as _SD_BUCKETS,
    TRAIN_UPTO as _SD_TRAIN,
    VAL_UPTO as _SD_VAL,
    split_hash_sql as _sd_hash_sql,
)
from ..operators.similarity import SEMDEDUP_COSINE as _SD_COSINE

SEMANTIC_DECONTAMINATE = f"""
WITH e AS (
    SELECT vec_id, embedding,
        sqrt({_DOT_SQL.format(a='embedding', b='embedding')}) AS norm,
        {_sd_hash_sql('vec_id')} % {_SD_BUCKETS} AS bucket
    FROM (SELECT * FROM embeddings WHERE len(embedding) = (SELECT MAX(len(embedding)) FROM embeddings) AND len(list_filter(embedding, v -> v IS NULL)) = 0 AND len(list_filter(embedding, v -> isnan(CAST(v AS DOUBLE)) OR isinf(CAST(v AS DOUBLE)))) = 0 AND vec_id IS NOT NULL AND vec_id >= 0 AND vec_id NOT IN (SELECT vec_id FROM embeddings WHERE vec_id IS NOT NULL GROUP BY vec_id HAVING COUNT(*) > 1)) embeddings
),
train AS (SELECT * FROM e WHERE bucket < {_SD_TRAIN}),
ev AS (SELECT * FROM e WHERE bucket >= {_SD_VAL}),
pairs AS (
    SELECT t.vec_id, ev.vec_id AS eval_vec_id,
        FLOOR(({_DOT_SQL.format(a='t.embedding', b='ev.embedding')}
               / (t.norm * ev.norm)) * 10000 + 0.5) / 10000 AS cosine
    FROM train t, ev
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY vec_id ORDER BY cosine DESC, eval_vec_id ASC) AS rn
    FROM pairs
)
SELECT vec_id, eval_vec_id, cosine,
    cosine >= {_SD_COSINE} AS is_contaminated
FROM ranked WHERE rn = 1
"""

LLMOPS_ORACLES["semantic_decontaminate"] = SEMANTIC_DECONTAMINATE


# ngram_novelty_timeline: the corpus-saturation curve
# (operators/textops.py) — doc-distinct shingles (the dedup-family sh
# CTE shape) bucketed into append-order batches; NEW = first occurrence
# by MIN(batch). All counts BIGINT (COALESCE arms cast; the window
# cumsum casts back from HUGEINT — the curation_funnel trap); the one
# division's ELSE arm is CAST(0 AS DOUBLE), never a DECIMAL literal.


def _novelty_sql() -> str:
    from ..operators.textops import NOVELTY_BATCH_DOCS as _B

    return f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (
    SELECT DISTINCT doc_id,
        concat_ws(' ', t[i], t[i+1], t[i+2]) AS shingle
    FROM toks, unnest(generate_series(1, len(t) - 2)) AS u(i)
),
pb AS (
    SELECT CAST(doc_id AS BIGINT) // {_B} AS batch,
        CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY 1
),
occ AS (
    SELECT CAST(doc_id AS BIGINT) // {_B} AS batch,
        CAST(COUNT(*) AS BIGINT) AS n_occ
    FROM sh GROUP BY 1
),
bs AS (
    SELECT DISTINCT CAST(doc_id AS BIGINT) // {_B} AS batch, shingle FROM sh
),
fb AS (SELECT shingle, MIN(batch) AS first_batch FROM bs GROUP BY shingle),
vb AS (
    SELECT bs.batch,
        CAST(COUNT(*) AS BIGINT) AS n_distinct,
        CAST(SUM(CASE WHEN bs.batch = fb.first_batch THEN 1 ELSE 0 END)
             AS BIGINT) AS n_new
    FROM bs JOIN fb USING (shingle) GROUP BY bs.batch
),
j AS (
    SELECT pb.batch, pb.n_docs,
        CAST(COALESCE(occ.n_occ, 0) AS BIGINT) AS n_shingle_occurrences,
        CAST(COALESCE(vb.n_distinct, 0) AS BIGINT) AS n_distinct_shingles,
        CAST(COALESCE(vb.n_new, 0) AS BIGINT) AS n_new_shingles
    FROM pb LEFT JOIN occ USING (batch) LEFT JOIN vb USING (batch)
)
SELECT batch, n_docs, n_shingle_occurrences, n_distinct_shingles,
    n_new_shingles,
    CAST(SUM(n_new_shingles) OVER (
        ORDER BY batch ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS BIGINT) AS cum_vocab,
    CASE WHEN n_distinct_shingles > 0
         THEN CAST(n_new_shingles AS DOUBLE)
              / CAST(n_distinct_shingles AS DOUBLE)
         ELSE CAST(0 AS DOUBLE) END AS novelty_rate
FROM j
"""


LLMOPS_ORACLES["ngram_novelty_timeline"] = _novelty_sql()


# bpe_merge_census: first BPE merge iteration (operators/textops.py) —
# corpus reduces to the word vocabulary first, pairs explode over vocab
# rows only. SUM(BIGINT) casts back from HUGEINT; (count DESC, pair ASC)
# is a total order because pair is unique, so the LIMIT is deterministic.


def _bpe_census_sql() -> str:
    from ..operators.textops import BPE_PATTERN, BPE_TOPK

    return f"""
WITH words AS (
    SELECT word, CAST(COUNT(*) AS BIGINT) AS wc
    FROM (
        SELECT unnest(regexp_extract_all(coalesce(text, ''),
                                         '{BPE_PATTERN}')) AS word
        FROM documents
    )
    GROUP BY word
),
pairs AS (
    SELECT word, wc, substring(word, i, 2) AS pair
    FROM words, unnest(generate_series(1, length(word) - 1)) AS u(i)
    WHERE length(word) >= 2
)
SELECT pair, CAST(SUM(wc) AS BIGINT) AS pair_count,
    CAST(COUNT(DISTINCT word) AS BIGINT) AS n_distinct_words
FROM pairs GROUP BY pair
ORDER BY pair_count DESC, pair ASC
LIMIT {BPE_TOPK}
"""


LLMOPS_ORACLES["bpe_merge_census"] = _bpe_census_sql()




# embedding_centroid_report: per-label / global centroids as 1e-6-rounded
# per-dim AVGs (the kmeans-centroid cross-engine class), re-assembled into
# ordered lists, cosine via the fixed-order _DOT_SQL fold — never a
# groupBy float sum over dims.
def _centroid_report_sql() -> str:
    from ..functions.numeric import portable_round_sql as _pr

    dot = _DOT_SQL
    return f"""
WITH valid AS (
    SELECT label, embedding FROM embeddings
    WHERE len(embedding) = (SELECT MAX(len(embedding)) FROM embeddings) AND len(list_filter(embedding, v -> v IS NULL)) = 0 AND len(list_filter(embedding, v -> isnan(CAST(v AS DOUBLE)) OR isinf(CAST(v AS DOUBLE)))) = 0 AND vec_id IS NOT NULL AND vec_id >= 0 AND vec_id NOT IN (SELECT vec_id FROM embeddings WHERE vec_id IS NOT NULL GROUP BY vec_id HAVING COUNT(*) > 1)
),
flat AS (
    SELECT label, u.i AS dim, CAST(embedding[u.i] AS DOUBLE) AS val
    FROM valid, unnest(generate_series(1, len(embedding))) AS u(i)
),
lc AS (
    SELECT label, dim, {_pr('AVG(val)', 6)} AS c,
        CAST(COUNT(*) AS BIGINT) AS n
    FROM flat GROUP BY label, dim
),
lcent AS (
    SELECT label, list(c ORDER BY dim) AS centroid,
        MAX(n) AS n_vecs
    FROM lc GROUP BY label
),
gc AS (SELECT dim, {_pr('AVG(val)', 6)} AS c FROM flat GROUP BY dim),
gcent AS (SELECT list(c ORDER BY dim) AS g FROM gc)
SELECT label, n_vecs,
    {_pr(f"sqrt({dot.format(a='centroid', b='centroid')})", 4)}
        AS centroid_norm,
    {_pr(
        f"{dot.format(a='centroid', b='g')}"
        f" / (sqrt({dot.format(a='centroid', b='centroid')})"
        f" * sqrt({dot.format(a='g', b='g')}))",
        4,
    )} AS drift_cosine
FROM lcent, gcent
"""


LLMOPS_ORACLES["embedding_centroid_report"] = _centroid_report_sql()


# dedup_cluster_report: clusters + pairs oracles nested verbatim, member
# stats over the size>1 mass, pair stats keyed by doc_a's cluster. The
# mean is the 1e-6 portable-round distributed-avg class; MIN over exact
# doubles is order-free.
def _cluster_report_sql() -> str:
    from ..functions.numeric import portable_round_sql as _pr

    return f"""
WITH vp AS ({DEDUP_MINHASH_LSH}),
clusters AS ({DEDUP_CLUSTERS}),
multi AS (SELECT * FROM clusters WHERE cluster_size > 1),
mstats AS (
    SELECT m.cluster_id,
        CAST(MIN(m.cluster_size) AS BIGINT) AS cluster_size,
        CAST(COUNT(DISTINCT d.source) AS BIGINT) AS n_sources
    FROM multi m JOIN documents d ON d.doc_id = m.doc_id
    GROUP BY m.cluster_id
),
pstats AS (
    SELECT m.cluster_id,
        CAST(COUNT(*) AS BIGINT) AS n_pairs,
        {_pr('AVG(vp.jaccard)', 6)} AS mean_jaccard,
        MIN(vp.jaccard) AS min_jaccard
    FROM vp JOIN multi m ON m.doc_id = vp.doc_a
    GROUP BY m.cluster_id
)
SELECT s.cluster_id, s.cluster_size, s.n_sources,
    p.n_pairs, p.mean_jaccard, p.min_jaccard
FROM mstats s JOIN pstats p USING (cluster_id)
"""


LLMOPS_ORACLES["dedup_cluster_report"] = _cluster_report_sql()


# minhash_param_planner: the identical S-curve expression string (shared
# _scurve_sql — fixed-association multiplication chains, no libm pow)
# over DuckDB's generate_series grid; j is the same CAST/100 division.
def _param_planner_sql() -> str:
    from ..operators.dedup import JACCARD_THRESHOLD, _scurve_sql

    return f"""
SELECT CAST(i AS BIGINT) AS grid_i,
    CAST(i AS DOUBLE) / 100.0e0 AS j,
    {_scurve_sql().replace('j', '(CAST(i AS DOUBLE) / 100.0e0)')}
        AS p_candidate,
    CAST(i AS DOUBLE) / 100.0e0 >= {JACCARD_THRESHOLD} AS above_verify
FROM generate_series(0, 100) AS t(i)
"""


LLMOPS_ORACLES["minhash_param_planner"] = _param_planner_sql()


# jaccard_threshold_sweep: the same DF-capped pair CTE as the jaccard
# oracles (unthresholded), the same i/100 grid division as the planner
# oracle, and the same shared S-curve string with the threshold column
# substituted — grid LEFT JOINs keep empty thresholds alive exactly like
# the Spark coalesce(0) arm.
def _threshold_sweep_sql() -> str:
    from ..operators.dedup import (
        NGRAM_DF_CAP,
        SWEEP_GRID_HUNDREDTHS,
        _scurve_sql,
    )

    grid_vals = ", ".join(f"({i})" for i in SWEEP_GRID_HUNDREDTHS)
    sc = _scurve_sql().replace("j", "threshold")
    return f"""
WITH {_SHINGLES},
df_ok AS (
    SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= {NGRAM_DF_CAP}
),
shk AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN df_ok USING (shingle)),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
    FROM shk a JOIN shk b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY doc_a, doc_b
),
pairs AS (
    SELECT doc_a, doc_b,
        CAST(n_inter AS DOUBLE) / (ca.n_shingles + cb.n_shingles - n_inter)
            AS jaccard
    FROM inter
    JOIN cnt ca ON ca.doc_id = doc_a
    JOIN cnt cb ON cb.doc_id = doc_b
),
grid AS (
    SELECT CAST(i AS INT) AS grid_i,
        CAST(i AS DOUBLE) / 100.0e0 AS threshold
    FROM (VALUES {grid_vals}) AS g(i)
),
doc_max AS (
    SELECT doc, MAX(jaccard) AS max_jac FROM (
        SELECT doc_a AS doc, jaccard FROM pairs
        UNION ALL
        SELECT doc_b AS doc, jaccard FROM pairs
    ) GROUP BY doc
),
pc AS (
    SELECT grid_i, CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM pairs p JOIN grid g ON p.jaccard >= g.threshold
    GROUP BY grid_i
),
dc AS (
    SELECT grid_i, CAST(COUNT(*) AS BIGINT) AS n_docs_in_pairs
    FROM doc_max d JOIN grid g ON d.max_jac >= g.threshold
    GROUP BY grid_i
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs_total FROM documents)
SELECT grid_i, threshold,
    CAST(COALESCE(n_pairs, 0) AS BIGINT) AS n_pairs,
    CAST(COALESCE(n_docs_in_pairs, 0) AS BIGINT) AS n_docs_in_pairs,
    n_docs_total,
    CAST(COALESCE(n_docs_in_pairs, 0) AS DOUBLE)
        / CAST(n_docs_total AS DOUBLE) AS dup_doc_rate,
    {sc} AS p_lsh_capture
FROM grid
LEFT JOIN pc USING (grid_i)
LEFT JOIN dc USING (grid_i)
CROSS JOIN tot
"""


LLMOPS_ORACLES["jaccard_threshold_sweep"] = _threshold_sweep_sql()


# pii_source_report: the IDENTICAL per-category patterns as pii_scrub
# (shared PII_PATTERNS), NULL text mirrored to the empty doc on both
# sides, per-source conditional sums in the repo's CAST(... AS BIGINT)
# dtype discipline.
def _pii_source_sql() -> str:
    counts = ",\n        ".join(
        f"len(regexp_extract_all(coalesce(text, ''), '{pattern}'))"
        f" AS n_{name}"
        for name, pattern, _ in PII_PATTERNS
    )
    total = " + ".join(f"n_{name}" for name, _, _ in PII_PATTERNS)
    totals = ",\n    ".join(
        f"CAST(SUM(n_{name}) AS BIGINT) AS total_{name}"
        for name, _, _ in PII_PATTERNS
    )
    return f"""
WITH c AS (
    SELECT source,
        {counts}
    FROM documents
)
SELECT source,
    CAST(COUNT(*) AS BIGINT) AS n_docs,
    {totals},
    CAST(SUM(CASE WHEN ({total}) > 0 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_pii_docs,
    CAST(SUM(CASE WHEN ({total}) > 0 THEN 1 ELSE 0 END) AS DOUBLE)
        / CAST(COUNT(*) AS DOUBLE) AS pii_doc_rate
FROM c
GROUP BY source
"""


LLMOPS_ORACLES["pii_source_report"] = _pii_source_sql()


# ngram_lm_perplexity: add-one bigram LM surprisal
# (operators/textops.ngram_lm_perplexity). Mirrors: coalesce(text,'')
# NULL-doc convention, 1-based list indexing (element_at), per-bigram
# micro-nat quantization BEFORE the per-doc sum (ln-ulp insulation),
# every integer SUM cast back from HUGEINT (pandas-dtype lesson), and
# the exact division/round token streams of the Spark side.


def _ngram_lm_sql() -> str:
    from ..operators.textops import LM_NLL_SCALE

    return f"""
WITH toks AS (
    SELECT doc_id, string_split(coalesce(text, ''), ' ') AS t
    FROM documents
),
bg AS (
    SELECT doc_id, t[i] AS w1, t[i + 1] AS w2,
        CAST(COUNT(*) AS BIGINT) AS m
    FROM toks, unnest(generate_series(1, len(t) - 1)) AS u(i)
    GROUP BY doc_id, t[i], t[i + 1]
),
c2 AS (
    SELECT w1, w2, CAST(SUM(m) AS BIGINT) AS c_bg FROM bg GROUP BY w1, w2
),
c1 AS (SELECT w1, CAST(SUM(m) AS BIGINT) AS c_ctx FROM bg GROUP BY w1),
v AS (SELECT CAST(COUNT(DISTINCT w2) AS DOUBLE) AS vocab FROM bg),
sc AS (
    SELECT bg.doc_id, bg.m,
        CAST(FLOOR((- ln((CAST(c_bg AS DOUBLE) + 1.0)
            / (CAST(c_ctx AS DOUBLE) + vocab)))
            * {float(LM_NLL_SCALE)} + 0.5) AS BIGINT) AS nll_micro
    FROM bg
    JOIN c2 USING (w1, w2)
    JOIN c1 USING (w1)
    CROSS JOIN v
),
agg AS (
    SELECT doc_id, CAST(SUM(m) AS BIGINT) AS n_bigrams,
        CAST(SUM(m * nll_micro) AS BIGINT) AS nll_micro_sum
    FROM sc GROUP BY doc_id
),
rounded AS (
    SELECT doc_id, n_bigrams, nll_micro_sum,
        FLOOR(((CAST(nll_micro_sum AS DOUBLE) / 1000000.0)
            / CAST(n_bigrams AS DOUBLE)) * 10000 + 0.5) / 10000 AS avg_nll
    FROM agg
)
SELECT doc_id, n_bigrams, nll_micro_sum, avg_nll,
    FLOOR(exp(avg_nll) * 100 + 0.5) / 100 AS ppl
FROM rounded
"""


LLMOPS_ORACLES["ngram_lm_perplexity"] = _ngram_lm_sql()


# bigram_pmi_topk: collocation census (operators/textops.bigram_pmi_topk).
# Marginals from the FULL pair table, screen only the probe; pmi_micro
# quantized BEFORE ranking so (pmi_micro DESC, w1, w2) is a total order
# and the LIMIT is deterministic on both engines. Integer SUMs cast back
# from HUGEINT.


def _bigram_pmi_sql() -> str:
    from ..operators.textops import (
        LM_NLL_SCALE,
        PMI_MIN_PAIR_COUNT,
        PMI_TOPK,
    )

    return f"""
WITH toks AS (
    SELECT doc_id, string_split(coalesce(text, ''), ' ') AS t
    FROM documents
),
bg AS (
    SELECT t[i] AS w1, t[i + 1] AS w2
    FROM toks, unnest(generate_series(1, len(t) - 1)) AS u(i)
),
pairs AS (
    SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS pair_count
    FROM bg GROUP BY w1, w2
),
lft AS (
    SELECT w1, CAST(SUM(pair_count) AS BIGINT) AS c_left
    FROM pairs GROUP BY w1
),
rgt AS (
    SELECT w2, CAST(SUM(pair_count) AS BIGINT) AS c_right
    FROM pairs GROUP BY w2
),
tot AS (SELECT CAST(SUM(pair_count) AS DOUBLE) AS t FROM pairs),
sc AS (
    SELECT w1, w2, pair_count, c_left, c_right,
        CAST(FLOOR(ln((CAST(pair_count AS DOUBLE) * t)
            / (CAST(c_left AS DOUBLE) * CAST(c_right AS DOUBLE)))
            * {float(LM_NLL_SCALE)} + 0.5) AS BIGINT) AS pmi_micro
    FROM pairs
    JOIN lft USING (w1)
    JOIN rgt USING (w2)
    CROSS JOIN tot
    WHERE pair_count >= {PMI_MIN_PAIR_COUNT}
)
SELECT w1, w2, pair_count, c_left, c_right, pmi_micro,
    CAST(pmi_micro AS DOUBLE) / 1000000.0 AS pmi
FROM sc
ORDER BY pmi_micro DESC, w1 ASC, w2 ASC
LIMIT {PMI_TOPK}
"""


LLMOPS_ORACLES["bigram_pmi_topk"] = _bigram_pmi_sql()


# similarity_sq_topk (operators/similarity.similarity_sq_topk): symmetric
# scalar-quantized ADC ranking — embedding_quantize's exact code grid,
# integer dot/norms (exact, order-free), one IEEE division per pair
# portable-rounded BEFORE the rank; sim_exact recomputed only for the K
# winners from the full-precision vectors (the bruteforce _COS_AB form).
_SQ_CODES = f"""
base AS (
    SELECT vec_id, embedding,
        sqrt({_DOT_SQL.format(a='embedding', b='embedding')}) AS norm,
        list_max(list_transform(embedding,
                 v -> abs(CAST(v AS DOUBLE)))) / 127 AS scale
    FROM (SELECT * FROM embeddings WHERE len(embedding) = (SELECT MAX(len(embedding)) FROM embeddings) AND len(list_filter(embedding, v -> v IS NULL)) = 0 AND len(list_filter(embedding, v -> isnan(CAST(v AS DOUBLE)) OR isinf(CAST(v AS DOUBLE)))) = 0 AND vec_id IS NOT NULL AND vec_id >= 0 AND vec_id NOT IN (SELECT vec_id FROM embeddings WHERE vec_id IS NOT NULL GROUP BY vec_id HAVING COUNT(*) > 1)) embeddings
),
coded AS (
    SELECT vec_id, embedding, norm,
        list_transform(embedding,
            v -> CASE WHEN coalesce(scale, 0) = 0 THEN 0
                 ELSE CAST(FLOOR(CAST(v AS DOUBLE) / scale + 0.5) AS INT)
                 END) AS q
    FROM base
),
en AS (
    SELECT vec_id, embedding, norm, q,
        sqrt(CAST(list_sum(list_transform(q,
            v -> CAST(v * v AS BIGINT))) AS DOUBLE)) AS qnorm
    FROM coded
)
"""

SIMILARITY_SQ_TOPK = f"""
WITH {_SQ_CODES},
qs AS (SELECT * FROM en WHERE vec_id < {N_QUERIES}),
scored AS (
    SELECT qs.vec_id AS query_id, en.vec_id AS vec_id,
        FLOOR((CAST(list_sum(list_transform(list_zip(qs.q, en.q),
                x -> x[1] * x[2])) AS DOUBLE)
            / (qs.qnorm * en.qnorm)) * 10000 + 0.5) / 10000 AS sim_sq
    FROM qs, en
    WHERE en.vec_id <> qs.vec_id
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY sim_sq DESC, vec_id ASC
    ) AS rank
    FROM scored
),
sel AS (SELECT query_id, vec_id, sim_sq, rank FROM ranked WHERE rank <= {TOP_K})
SELECT s.query_id, s.vec_id, s.sim_sq,
    FLOOR(({_DOT_SQL.format(a='qe.embedding', b='ce.embedding')}
        / (qe.norm * ce.norm)) * 10000 + 0.5) / 10000 AS sim_exact,
    s.rank
FROM sel s
JOIN en qe ON qe.vec_id = s.query_id
JOIN en ce ON ce.vec_id = s.vec_id
"""

LLMOPS_ORACLES["similarity_sq_topk"] = SIMILARITY_SQ_TOPK


# similarity_recall_report: the FOUR top-K oracles composed verbatim as
# CTEs (the audited definitions can't drift), intersected per query and
# method (r9: sq channel added — the newest ANN path reports recall@k in
# the same frame; its oracle nests as a sub-WITH). COUNTs cast BIGINT; the recall division is double/double with
# the COALESCE arm cast, mirroring the Spark column order exactly.
SIMILARITY_RECALL_REPORT = f"""
WITH bf AS ({SIMILARITY_BRUTEFORCE_TOPK}),
ivf AS ({SIMILARITY_IVF_TOPK}),
lsh AS ({SIMILARITY_LSH_TOPK}),
sq AS ({SIMILARITY_SQ_TOPK}),
truth AS (
    SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_truth
    FROM bf GROUP BY query_id
),
ivf_hits AS (
    SELECT bf.query_id, CAST(COUNT(*) AS BIGINT) AS n_hits
    FROM bf JOIN ivf ON bf.query_id = ivf.query_id AND bf.vec_id = ivf.vec_id
    GROUP BY bf.query_id
),
lsh_hits AS (
    SELECT bf.query_id, CAST(COUNT(*) AS BIGINT) AS n_hits
    FROM bf JOIN lsh ON bf.query_id = lsh.query_id AND bf.vec_id = lsh.vec_id
    GROUP BY bf.query_id
),
sq_hits AS (
    SELECT bf.query_id, CAST(COUNT(*) AS BIGINT) AS n_hits
    FROM bf JOIN sq ON bf.query_id = sq.query_id AND bf.vec_id = sq.vec_id
    GROUP BY bf.query_id
)
SELECT t.query_id, 'ivf' AS method,
    CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits, t.n_truth,
    CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / CAST(t.n_truth AS DOUBLE)
        AS recall
FROM truth t LEFT JOIN ivf_hits h USING (query_id)
UNION ALL
SELECT t.query_id, 'lsh' AS method,
    CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits, t.n_truth,
    CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / CAST(t.n_truth AS DOUBLE)
        AS recall
FROM truth t LEFT JOIN lsh_hits h USING (query_id)
UNION ALL
SELECT t.query_id, 'sq' AS method,
    CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits, t.n_truth,
    CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / CAST(t.n_truth AS DOUBLE)
        AS recall
FROM truth t LEFT JOIN sq_hits h USING (query_id)
"""

LLMOPS_ORACLES["similarity_recall_report"] = SIMILARITY_RECALL_REPORT


# heavy_hitters_cms (operators/textops.heavy_hitters_cms): count-min
# sketch + exact audit. Same md5-hex7 hash, same (a·h+b) mod P mod W
# family, pure integer arithmetic end-to-end; SUM/MIN cast back to
# BIGINT (HUGEINT trap).
from ..operators.textops import (  # noqa: E402
    CMS_PRIME,
    CMS_ROWS_AB,
    CMS_TOPK,
    CMS_WIDTH,
)

_CMS_PARAMS = ", ".join(
    f"({r}, {a}, {b})" for r, (a, b) in enumerate(CMS_ROWS_AB)
)

HEAVY_HITTERS_CMS = f"""
WITH toks AS (
    SELECT unnest(string_split(coalesce(text, ''), ' ')) AS token
    FROM documents
),
tc AS (
    SELECT token, COUNT(*) AS exact_count
    FROM toks WHERE token <> '' GROUP BY token
),
hx AS (SELECT token, exact_count, md5(token) AS m FROM tc),
hv AS (SELECT token, exact_count, {_HEX7_TO_INT} AS h FROM hx),
params(r, a, b) AS (VALUES {_CMS_PARAMS}),
entries AS (
    SELECT token, exact_count, r,
        (a * h + b) % {CMS_PRIME} % {CMS_WIDTH} AS bucket
    FROM hv, params
),
cells AS (
    SELECT r, bucket, CAST(SUM(exact_count) AS BIGINT) AS cell
    FROM entries GROUP BY r, bucket
),
probe AS (
    SELECT token FROM tc
    ORDER BY exact_count DESC, token ASC LIMIT {CMS_TOPK}
)
SELECT e.token,
    CAST(MAX(e.exact_count) AS BIGINT) AS exact_count,
    CAST(MIN(c.cell) AS BIGINT) AS cms_estimate,
    CAST(MIN(c.cell) - MAX(e.exact_count) AS BIGINT) AS overestimate
FROM entries e
JOIN probe p ON e.token = p.token
JOIN cells c ON e.r = c.r AND e.bucket = c.bucket
GROUP BY e.token
"""

LLMOPS_ORACLES["heavy_hitters_cms"] = HEAVY_HITTERS_CMS


# embedding_norm_profile (operators/similarity.embedding_norm_profile):
# norms quantized to integer micro-units BEFORE any aggregate; mean is
# exact-int-sum / 1e6 / n in the same association as the Column expr;
# median is quantile_cont over integers (value_percentiles bit-match
# precedent).
EMBEDDING_NORM_PROFILE = f"""
WITH v AS (
    SELECT label,
        CAST(FLOOR(sqrt({_DOT_SQL.format(a='embedding', b='embedding')})
             * 1000000 + 0.5) AS BIGINT) AS nq
    FROM (SELECT * FROM embeddings WHERE len(embedding) = (SELECT MAX(len(embedding)) FROM embeddings) AND len(list_filter(embedding, v -> v IS NULL)) = 0 AND len(list_filter(embedding, v -> isnan(CAST(v AS DOUBLE)) OR isinf(CAST(v AS DOUBLE)))) = 0 AND vec_id IS NOT NULL AND vec_id >= 0 AND vec_id NOT IN (SELECT vec_id FROM embeddings WHERE vec_id IS NOT NULL GROUP BY vec_id HAVING COUNT(*) > 1)) embeddings
)
SELECT label,
    CAST(COUNT(*) AS BIGINT) AS n_vecs,
    {portable_round_sql('CAST(SUM(nq) AS DOUBLE) / 1000000.0 / COUNT(*)', 4)}
        AS mean_norm,
    {portable_round_sql('CAST(MIN(nq) AS DOUBLE) / 1000000.0', 4)} AS min_norm,
    {portable_round_sql('CAST(MAX(nq) AS DOUBLE) / 1000000.0', 4)} AS max_norm,
    {portable_round_sql('quantile_cont(nq, 0.5) / 1000000.0', 4)} AS p50_norm
FROM v GROUP BY label
"""

LLMOPS_ORACLES["embedding_norm_profile"] = EMBEDDING_NORM_PROFILE


# stream_heavy_hitters (streaming/docs.stream_heavy_hitters): complete-mode
# final sink == the batch CMS cell table; counted over token OCCURRENCES
# (identical to summing per-token counts — addition is associative).
STREAM_HEAVY_HITTERS = f"""
WITH toks AS (
    SELECT unnest(string_split(coalesce(text, ''), ' ')) AS token
    FROM documents
),
hx AS (SELECT md5(token) AS m FROM toks WHERE token <> ''),
hv AS (SELECT {_HEX7_TO_INT} AS h FROM hx),
params(r, a, b) AS (VALUES {_CMS_PARAMS})
SELECT r, (a * h + b) % {CMS_PRIME} % {CMS_WIDTH} AS bucket,
    CAST(COUNT(*) AS BIGINT) AS cell
FROM hv, params
GROUP BY r, bucket
"""

LLMOPS_ORACLES["stream_heavy_hitters"] = STREAM_HEAVY_HITTERS


# embedding_dim_stats (operators/similarity.embedding_dim_stats): every
# element quantized to the integer 1e-4 grid BEFORE aggregation; mean and
# variance are FIXED single expressions over the exact integer sums in
# the identical association as the Column exprs (ss/1e8/n − (s/1e4/n)²).
EMBEDDING_DIM_STATS = f"""
WITH flat AS (
    SELECT generate_subscripts(embedding, 1) - 1 AS dim,
        CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 10000 + 0.5)
             AS BIGINT) AS q
    FROM (SELECT * FROM embeddings WHERE len(embedding) = (SELECT MAX(len(embedding)) FROM embeddings) AND len(list_filter(embedding, v -> v IS NULL)) = 0 AND len(list_filter(embedding, v -> isnan(CAST(v AS DOUBLE)) OR isinf(CAST(v AS DOUBLE)))) = 0 AND vec_id IS NOT NULL AND vec_id >= 0 AND vec_id NOT IN (SELECT vec_id FROM embeddings WHERE vec_id IS NOT NULL GROUP BY vec_id HAVING COUNT(*) > 1)) embeddings
),
per AS (
    SELECT dim, COUNT(*) AS n, SUM(q) AS s, SUM(q * q) AS ss,
        SUM(CASE WHEN q = 0 THEN 1 ELSE 0 END) AS z,
        MIN(q) AS mn, MAX(q) AS mx
    FROM flat GROUP BY dim
)
SELECT CAST(dim AS INTEGER) AS dim,
    CAST(n AS BIGINT) AS n_vecs,
    {portable_round_sql('CAST(s AS DOUBLE) / 10000.0 / n', 6)} AS mean_val,
    {portable_round_sql(
        'CAST(ss AS DOUBLE) / 100000000.0 / n'
        ' - (CAST(s AS DOUBLE) / 10000.0 / n)'
        ' * (CAST(s AS DOUBLE) / 10000.0 / n)', 8)} AS var_val,
    mn / 10000.0 AS min_val,
    mx / 10000.0 AS max_val,
    {portable_round_sql('CAST(z AS DOUBLE) * 100.0 / n', 4)} AS zero_pct
FROM per
"""

LLMOPS_ORACLES["embedding_dim_stats"] = EMBEDDING_DIM_STATS


# similarity_pq_topk (operators/similarity.similarity_pq_topk): per-
# subspace codebooks via the unrolled deterministic Lloyd recipe (the
# embedding_kmeans CTE chain, keyed by subspace m), ADC terms quantized
# to integer micro-units BEFORE the cross-subspace SUM (exact in any
# combine order), rank by (adcq ASC, vec_id ASC).
def _pq_code_ctes(train_filter: str = "") -> list[str]:
    """The shared PQ-encoding CTE chain (valid / subspaces / Lloyd rounds
    c0..cN / assignments a0..aN / query subvectors / integer ADC distance
    table ``dt``) — composed verbatim by BOTH _pq_sql and _ivf_pq_sql so
    the codebooks the two oracles replicate can never drift.

    ``train_filter`` is a ``{v}``-parameterized predicate appended to the
    TRAINING row set only (the c0 seeds and every f{i} centroid update);
    assignments a0..aN always run over ALL valid rows. The default ""
    keeps the emitted SQL byte-identical to the pre-append oracles;
    _ann_append_sql passes the watermark filter so the codebook trains on
    base rows while the final encode covers base+delta."""
    from ..operators.similarity import (
        IVF_ROUND,
        PQ_DTQ,
        PQ_ITERS,
        PQ_K,
        PQ_M,
    )

    # Grids interpolated from the operator constants (ADVICE r9): RG is
    # the portable_round grid (10**IVF_ROUND), PQ_DTQ the ADC term
    # quantization grid — changing either in similarity.py re-derives the
    # oracle instead of silently desynchronizing it.
    rg = 10**IVF_ROUND
    valid = (
        "SELECT * FROM embeddings WHERE len(embedding) = "
        "(SELECT MAX(len(embedding)) FROM embeddings) AND "
        "len(list_filter(embedding, v -> v IS NULL)) = 0 AND len(list_filter(embedding, v -> isnan(CAST(v AS DOUBLE)) OR isinf(CAST(v AS DOUBLE)))) = 0 AND vec_id IS NOT NULL AND vec_id >= 0 AND vec_id NOT IN (SELECT vec_id FROM embeddings WHERE vec_id IS NOT NULL GROUP BY vec_id HAVING COUNT(*) > 1)"
    )
    d2 = _D2_SQL
    ctes = [
        f"valid AS ({valid})",
        f"d AS (SELECT MAX(len(embedding)) // {PQ_M} AS sub FROM valid)",
        (
            "subs AS (SELECT vec_id, t.m, "
            "embedding[(t.m * sub + 1):((t.m + 1) * sub)] AS sv "
            f"FROM valid, d, unnest(generate_series(0, {PQ_M - 1})) AS t(m))"
        ),
        (
            "c0 AS (SELECT m, vec_id AS cell, "
            "list_transform(sv, x -> CAST(x AS DOUBLE)) AS centroid "
            f"FROM subs WHERE vec_id < {PQ_K}"
            f"{train_filter.format(v='vec_id')})"
        ),
    ]
    for i in range(PQ_ITERS + 1):
        ctes.append(
            f"s{i} AS (SELECT s.vec_id, s.m, c.cell, "
            f"FLOOR(({d2.format(a='s.sv', b='c.centroid')}) * {rg} + 0.5)"
            f" / {rg} AS d2 FROM subs s JOIN c{i} c ON s.m = c.m)"
        )
        ctes.append(
            f"a{i} AS (SELECT vec_id, m, cell FROM ("
            f"SELECT vec_id, m, cell, ROW_NUMBER() OVER ("
            f"PARTITION BY vec_id, m ORDER BY d2 ASC, cell ASC) AS rn "
            f"FROM s{i}) WHERE rn = 1)"
        )
        if i == PQ_ITERS:
            break
        ctes.append(
            f"f{i} AS (SELECT s.m, a.cell, CAST(unnest(s.sv) AS DOUBLE) "
            f"AS val, generate_subscripts(s.sv, 1) AS dim FROM subs s "
            f"JOIN a{i} a ON s.vec_id = a.vec_id AND s.m = a.m"
            + (" WHERE TRUE" + train_filter.format(v="s.vec_id")
               if train_filter else "")
            + ")"
        )
        ctes.append(
            f"c{i + 1} AS (SELECT m, cell, list(c ORDER BY dim) AS centroid "
            f"FROM (SELECT m, cell, dim, "
            f"FLOOR(AVG(val) * {rg} + 0.5) / {rg} AS c "
            f"FROM f{i} GROUP BY m, cell, dim) GROUP BY m, cell)"
        )
    ctes += [
        (
            "qsubs AS (SELECT vec_id AS query_id, m, sv AS q_sv "
            f"FROM subs WHERE vec_id < {N_QUERIES})"
        ),
        (
            "dt AS (SELECT q.query_id, q.m, c.cell, "
            f"CAST(FLOOR(({d2.format(a='q.q_sv', b='c.centroid')})"
            f" * {PQ_DTQ} + 0.5) AS BIGINT) AS dtq "
            f"FROM qsubs q JOIN c{PQ_ITERS} c ON q.m = c.m)"
        ),
    ]
    return ctes


def _pq_tail_ctes() -> list[str]:
    """Shared ADC-shortlist → exact-re-rank tail over an ``adc``
    (query_id, vec_id, adcq) CTE — the self-match exclusion happens
    upstream (_pq_sql filters in ``ranked``; _ivf_pq_sql in ``cand``)."""
    from ..operators.similarity import IVF_ROUND, PQ_DTQ, PQ_SHORTLIST

    rg = 10**IVF_ROUND
    d2 = _D2_SQL
    return [
        f"short AS (SELECT * FROM ranked WHERE srank <= {PQ_SHORTLIST})",
        (
            "sel AS (SELECT s.query_id, s.vec_id, "
            f"s.adcq / {PQ_DTQ}.0 AS d2_adc, "
            f"FLOOR(({d2.format(a='qe.embedding', b='ce.embedding')})"
            f" * {rg} + 0.5) / {rg} AS d2_exact "
            "FROM short s "
            "JOIN valid qe ON qe.vec_id = s.query_id "
            "JOIN valid ce ON ce.vec_id = s.vec_id)"
        ),
    ]


_PQ_FINAL_SELECT = (
    "SELECT query_id, vec_id, d2_adc, d2_exact, rank FROM (\n"
    "    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id\n"
    "        ORDER BY d2_exact ASC, vec_id ASC) AS rank FROM sel\n"
    f") WHERE rank <= {TOP_K}"
)


def _pq_sql() -> str:
    from ..operators.similarity import PQ_ITERS

    ctes = _pq_code_ctes() + [
        (
            "adc AS (SELECT d.query_id, a.vec_id, SUM(d.dtq) AS adcq "
            f"FROM a{PQ_ITERS} a JOIN dt d ON a.m = d.m AND a.cell = d.cell "
            "GROUP BY d.query_id, a.vec_id)"
        ),
        (
            "ranked AS (SELECT query_id, vec_id, adcq, ROW_NUMBER() OVER ("
            "PARTITION BY query_id ORDER BY adcq ASC, vec_id ASC) AS srank "
            "FROM adc WHERE vec_id <> query_id)"
        ),
    ] + _pq_tail_ctes()
    return "WITH " + ",\n".join(ctes) + "\n" + _PQ_FINAL_SELECT


# ivf_pq_topk (operators/similarity.ivf_pq_topk): the SAME codebook /
# distance-table CTEs (composed via _pq_code_ctes so the encodings can't
# drift), plus the proven IVF coarse-quantizer replica (per-label mean
# centroids rounded at the IVF grid, nearest-cell assignment, nprobe
# probing — the SIMILARITY_IVF_TOPK recipe over ``valid``); the ADC sum
# runs only over (query, vector) pairs routed through a probed cell.
def _ivf_cent_ctes(train_filter: str = "") -> list[str]:
    """The IVF coarse-quantizer CTE chain (label-seeded rounded-mean
    centroids → per-vector nearest-cell assignment) — composed verbatim
    by _ivf_pq_sql AND _ann_manifest_sql so the coarse index the two
    oracles replicate can never drift (the _pq_code_ctes precedent).
    ``train_filter`` restricts CENTROID TRAINING rows only (the
    _pq_code_ctes contract); ivfassigned always covers all valid rows."""
    from ..operators.similarity import IVF_ROUND

    rg = 10**IVF_ROUND
    d2 = _D2_SQL
    return [
        (
            "ivfflat AS (SELECT label, unnest(embedding) AS val, "
            "generate_subscripts(embedding, 1) AS dim FROM valid "
            "WHERE label IS NOT NULL"
            + train_filter.format(v="vec_id") + ")"
        ),
        (
            "ivfcent AS (SELECT label AS cell, dim, "
            f"FLOOR(AVG(CAST(val AS DOUBLE)) * {rg} + 0.5) / {rg} AS c "
            "FROM ivfflat GROUP BY label, dim)"
        ),
        (
            "ivfcentroids AS (SELECT cell, list(c ORDER BY dim) AS centroid "
            "FROM ivfcent GROUP BY cell)"
        ),
        (
            "ivfscored AS (SELECT v.vec_id, c.cell, "
            f"FLOOR(({d2.format(a='v.embedding', b='c.centroid')})"
            f" * {rg} + 0.5) / {rg} AS d2 "
            "FROM valid v, ivfcentroids c)"
        ),
        (
            "ivfassigned AS (SELECT vec_id, cell FROM ("
            "SELECT vec_id, cell, ROW_NUMBER() OVER ("
            "PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS rn "
            "FROM ivfscored) WHERE rn = 1)"
        ),
    ]


def _ivf_probe_ctes() -> list[str]:
    """The IVF-PQ serve tail (nprobe probing → routed candidates → ADC →
    shortlist rank) — composed verbatim by _ivf_pq_sql (full-trained
    tables) and _ann_segments_topk_sql (base-trained tables via the
    train_filter) so the probe semantics the two oracles replicate can
    never drift."""
    from ..operators.similarity import IVF_PQ_NPROBE, PQ_ITERS

    return [
        (
            "ivfprobes AS (SELECT vec_id AS query_id, cell FROM ("
            "SELECT vec_id, cell, ROW_NUMBER() OVER ("
            "PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS rn "
            f"FROM ivfscored WHERE vec_id < {N_QUERIES}) "
            f"WHERE rn <= {IVF_PQ_NPROBE})"
        ),
        (
            "cand AS (SELECT p.query_id, a.vec_id FROM ivfprobes p "
            "JOIN ivfassigned a ON a.cell = p.cell "
            "WHERE a.vec_id <> p.query_id)"
        ),
        (
            "adc AS (SELECT n.query_id, n.vec_id, SUM(d.dtq) AS adcq "
            f"FROM cand n JOIN a{PQ_ITERS} a ON a.vec_id = n.vec_id "
            "JOIN dt d ON d.query_id = n.query_id "
            "AND d.m = a.m AND d.cell = a.cell "
            "GROUP BY n.query_id, n.vec_id)"
        ),
        (
            "ranked AS (SELECT query_id, vec_id, adcq, ROW_NUMBER() OVER ("
            "PARTITION BY query_id ORDER BY adcq ASC, vec_id ASC) AS srank "
            "FROM adc)"
        ),
    ]


def _ivf_pq_sql() -> str:
    ctes = (
        _pq_code_ctes() + _ivf_cent_ctes() + _ivf_probe_ctes()
        + _pq_tail_ctes()
    )
    return "WITH " + ",\n".join(ctes) + "\n" + _PQ_FINAL_SELECT


SIMILARITY_PQ_TOPK = _pq_sql()
IVF_PQ_TOPK = _ivf_pq_sql()

LLMOPS_ORACLES["similarity_pq_topk"] = SIMILARITY_PQ_TOPK
LLMOPS_ORACLES["ivf_pq_topk"] = IVF_PQ_TOPK


# ann_index_build (operators/similarity.ann_index_build): retrain the
# IDENTICAL index in SQL (_pq_code_ctes + _ivf_cent_ctes — the no-drift
# composition) and reproduce the persisted artifact's per-component row
# counts and order-free integer checksums; a hash match proves the
# artifact on disk byte-equivalent to an independent retraining. Every
# SUM is CAST(... AS BIGINT) — DuckDB widens bare integer SUMs to
# HUGEINT → pandas float64, the r4 dtype trap.
def _ann_manifest_sql() -> str:
    from ..operators.similarity import IVF_ROUND, PQ_ITERS

    rg = 10**IVF_ROUND
    ctes = _pq_code_ctes() + _ivf_cent_ctes()
    qels = (
        "SELECT CAST(FLOOR(CAST(u AS DOUBLE) * {rg} + 0.5) AS BIGINT) AS q "
        "FROM (SELECT unnest(centroid) AS u FROM {src})"
    )
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT 'pq_codebook' AS component,
    (SELECT CAST(COUNT(*) AS BIGINT) FROM c{PQ_ITERS}) AS n_rows,
    (SELECT CAST(SUM(q) AS BIGINT)
     FROM ({qels.format(rg=rg, src=f'c{PQ_ITERS}')})) AS checksum
UNION ALL
SELECT 'ivf_centroids',
    (SELECT CAST(COUNT(*) AS BIGINT) FROM ivfcentroids),
    (SELECT CAST(SUM(q) AS BIGINT)
     FROM ({qels.format(rg=rg, src='ivfcentroids')}))
UNION ALL
SELECT 'codes_pq',
    (SELECT CAST(COUNT(*) AS BIGINT) FROM a{PQ_ITERS}),
    (SELECT CAST(SUM(cell * (m + 1)) AS BIGINT) FROM a{PQ_ITERS})
UNION ALL
SELECT 'codes_ivf',
    (SELECT CAST(COUNT(*) AS BIGINT) FROM ivfassigned),
    (SELECT CAST(SUM(cell) AS BIGINT) FROM ivfassigned)
"""
    )


ANN_INDEX_BUILD = _ann_manifest_sql()
LLMOPS_ORACLES["ann_index_build"] = ANN_INDEX_BUILD
# ann_index_topk serves ivf_pq_topk's exact result from the persisted
# artifact (value-identical by construction — see the operator); the
# oracle IS the ivf_pq retraining, keeping the served artifact honest.
LLMOPS_ORACLES["ann_index_topk"] = IVF_PQ_TOPK


# ann_index_append (operators/similarity.ann_index_append): retrain the
# BASE index in SQL — the shared CTE chains with the watermark training
# filter (codebook/centroids see only vec_id <= floor(0.9·max)), then
# encode ALL valid rows against those base-trained tables. The six
# manifest rows reproduce the post-append artifact: base-trained table
# stats, base+delta code stats, and the delta segment alone. A driver
# hash proves the persisted base segment PLUS the retrain-free appended
# delta equivalent to an independent base-trained/union-encoded
# computation. Checksums COALESCE to 0 so an empty delta stays exact.
def _ann_append_sql() -> str:
    from ..operators.similarity import APPEND_WM_FRAC, IVF_ROUND, PQ_ITERS

    rg = 10**IVF_ROUND
    wm_cte = (
        f"wm AS (SELECT CAST(FLOOR({APPEND_WM_FRAC} * "
        "CAST(MAX(vec_id) AS DOUBLE)) AS BIGINT) AS w FROM valid)"
    )
    tf = " AND {v} <= (SELECT w FROM wm)"
    pq = _pq_code_ctes(train_filter=tf)
    ctes = pq[:1] + [wm_cte] + pq[1:] + _ivf_cent_ctes(train_filter=tf)
    qels = (
        "SELECT CAST(FLOOR(CAST(u AS DOUBLE) * {rg} + 0.5) AS BIGINT) AS q "
        "FROM (SELECT unnest(centroid) AS u FROM {src})"
    )
    delta = "vec_id > (SELECT w FROM wm)"
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT 'pq_codebook' AS component,
    (SELECT CAST(COUNT(*) AS BIGINT) FROM c{PQ_ITERS}) AS n_rows,
    (SELECT CAST(COALESCE(SUM(q), 0) AS BIGINT)
     FROM ({qels.format(rg=rg, src=f'c{PQ_ITERS}')})) AS checksum
UNION ALL
SELECT 'ivf_centroids',
    (SELECT CAST(COUNT(*) AS BIGINT) FROM ivfcentroids),
    (SELECT CAST(COALESCE(SUM(q), 0) AS BIGINT)
     FROM ({qels.format(rg=rg, src='ivfcentroids')}))
UNION ALL
SELECT 'codes_pq',
    (SELECT CAST(COUNT(*) AS BIGINT) FROM a{PQ_ITERS}),
    (SELECT CAST(COALESCE(SUM(cell * (m + 1)), 0) AS BIGINT)
     FROM a{PQ_ITERS})
UNION ALL
SELECT 'codes_ivf',
    (SELECT CAST(COUNT(*) AS BIGINT) FROM ivfassigned),
    (SELECT CAST(COALESCE(SUM(cell), 0) AS BIGINT) FROM ivfassigned)
UNION ALL
SELECT 'appended_pq',
    (SELECT CAST(COUNT(*) AS BIGINT) FROM a{PQ_ITERS} WHERE {delta}),
    (SELECT CAST(COALESCE(SUM(cell * (m + 1)), 0) AS BIGINT)
     FROM a{PQ_ITERS} WHERE {delta})
UNION ALL
SELECT 'appended_ivf',
    (SELECT CAST(COUNT(*) AS BIGINT) FROM ivfassigned WHERE {delta}),
    (SELECT CAST(COALESCE(SUM(cell), 0) AS BIGINT)
     FROM ivfassigned WHERE {delta})
"""
    )


ANN_INDEX_APPEND = _ann_append_sql()
LLMOPS_ORACLES["ann_index_append"] = ANN_INDEX_APPEND


# ann_index_topk_segments (operators/similarity.ann_index_topk_segments):
# serve top-K from the base artifact ∪ delta segment. The oracle is the
# ivf_pq serve with the append oracle's watermark TRAINING filter:
# codebooks/centroids train on base rows only, assignments/probes/ADC/
# exact re-rank cover ALL valid rows — the independent base-trained/
# union-encoded computation a segment-pair serve must equal (codes are a
# pure function of the trained tables, so base-encoded ∪ delta-encoded
# rows ≡ one full encode pass against the base tables).
def _ann_segments_topk_sql() -> str:
    from ..operators.similarity import APPEND_WM_FRAC

    wm_cte = (
        f"wm AS (SELECT CAST(FLOOR({APPEND_WM_FRAC} * "
        "CAST(MAX(vec_id) AS DOUBLE)) AS BIGINT) AS w FROM valid)"
    )
    tf = " AND {v} <= (SELECT w FROM wm)"
    pq = _pq_code_ctes(train_filter=tf)
    ctes = (
        pq[:1] + [wm_cte] + pq[1:] + _ivf_cent_ctes(train_filter=tf)
        + _ivf_probe_ctes() + _pq_tail_ctes()
    )
    return "WITH " + ",\n".join(ctes) + "\n" + _PQ_FINAL_SELECT


ANN_INDEX_TOPK_SEGMENTS = _ann_segments_topk_sql()
LLMOPS_ORACLES["ann_index_topk_segments"] = ANN_INDEX_TOPK_SEGMENTS


# ann_compact_rebuild (operators/similarity.ann_compact_rebuild): the
# post-merge full-scope artifact must equal a fresh full build — so the
# four component rows ARE the ann_index_build retraining (the full-scope
# _pq_code_ctes/_ivf_cent_ctes chains, no filter), and the two retired-
# segment rows are reproduced from the watermark split of the assigned
# row set (ivfassigned — the same per-vector convention codes_ivf uses),
# proving the retired base+delta pair covered exactly the corpus: no
# vector lost or double-counted across the segment boundary. Σ vec_id is
# the content checksum (exact int64, order-free).
def _compact_manifest_rows(guard: str = "") -> str:
    """The six compact-manifest rows (references the full-scope trained
    CTEs plus ``wm``) — composed by _ann_compact_sql (guard="", bytes
    unchanged from r13) and by _ann_compact_if_drifted_sql, which
    appends the drift-count guard to every row so the oracle emits the
    compacted branch only when the trigger fired."""
    from ..operators.similarity import IVF_ROUND, PQ_ITERS

    rg = 10**IVF_ROUND
    qels = (
        "SELECT CAST(FLOOR(CAST(u AS DOUBLE) * {rg} + 0.5) AS BIGINT) AS q "
        "FROM (SELECT unnest(centroid) AS u FROM {src})"
    )
    base = "vec_id <= (SELECT w FROM wm)"
    delta = "vec_id > (SELECT w FROM wm)"
    return f"""SELECT 'pq_codebook' AS component,
    (SELECT CAST(COUNT(*) AS BIGINT) FROM c{PQ_ITERS}) AS n_rows,
    (SELECT CAST(SUM(q) AS BIGINT)
     FROM ({qels.format(rg=rg, src=f'c{PQ_ITERS}')})) AS checksum{guard}
UNION ALL
SELECT 'ivf_centroids',
    (SELECT CAST(COUNT(*) AS BIGINT) FROM ivfcentroids),
    (SELECT CAST(SUM(q) AS BIGINT)
     FROM ({qels.format(rg=rg, src='ivfcentroids')})){guard}
UNION ALL
SELECT 'codes_pq',
    (SELECT CAST(COUNT(*) AS BIGINT) FROM a{PQ_ITERS}),
    (SELECT CAST(SUM(cell * (m + 1)) AS BIGINT) FROM a{PQ_ITERS}){guard}
UNION ALL
SELECT 'codes_ivf',
    (SELECT CAST(COUNT(*) AS BIGINT) FROM ivfassigned),
    (SELECT CAST(SUM(cell) AS BIGINT) FROM ivfassigned){guard}
UNION ALL
SELECT 'retired_base_codes',
    (SELECT CAST(COUNT(*) AS BIGINT) FROM ivfassigned WHERE {base}),
    (SELECT CAST(COALESCE(SUM(vec_id), 0) AS BIGINT)
     FROM ivfassigned WHERE {base}){guard}
UNION ALL
SELECT 'retired_delta_codes',
    (SELECT CAST(COUNT(*) AS BIGINT) FROM ivfassigned WHERE {delta}),
    (SELECT CAST(COALESCE(SUM(vec_id), 0) AS BIGINT)
     FROM ivfassigned WHERE {delta}){guard}
"""


def _ann_compact_sql() -> str:
    from ..operators.similarity import APPEND_WM_FRAC

    wm_cte = (
        f"wm AS (SELECT CAST(FLOOR({APPEND_WM_FRAC} * "
        "CAST(MAX(vec_id) AS DOUBLE)) AS BIGINT) AS w FROM valid)"
    )
    ctes = _pq_code_ctes() + _ivf_cent_ctes() + [wm_cte]
    return "WITH " + ",\n".join(ctes) + "\n" + _compact_manifest_rows()


ANN_COMPACT_REBUILD = _ann_compact_sql()
LLMOPS_ORACLES["ann_compact_rebuild"] = ANN_COMPACT_REBUILD


# ann_segment_stack_report (operators/similarity.ann_segment_stack_report):
# retrain the BASE index in SQL (watermark training filter), assign ALL
# valid rows, and split the assignments at the stacked watermarks —
# reproducing each on-disk segment's bounds, row count, Σ vec_id
# id-checksum, and position-weighted Σ cell·(m+1) code checksum. A
# driver hash proves the persisted segments partition the corpus at the
# declared bounds AND carry base-trained-encode content. Bounds
# COALESCE to -1 (the operator's "open/absent" sentinel) so the
# columns stay non-null BIGINT on any corpus.
def _ann_stack_report_sql() -> str:
    from ..operators.similarity import (
        APPEND_WM2_FRAC,
        APPEND_WM_FRAC,
        PQ_ITERS,
    )

    wm_cte = (
        f"wm AS (SELECT CAST(FLOOR({APPEND_WM_FRAC} * "
        "CAST(MAX(vec_id) AS DOUBLE)) AS BIGINT) AS w FROM valid)"
    )
    wm2_cte = (
        f"wm2 AS (SELECT CAST(FLOOR({APPEND_WM2_FRAC} * "
        "CAST(MAX(vec_id) AS DOUBLE)) AS BIGINT) AS w FROM valid)"
    )
    mx_cte = "mx AS (SELECT CAST(MAX(vec_id) AS BIGINT) AS m FROM valid)"
    tf = " AND {v} <= (SELECT w FROM wm)"
    pq = _pq_code_ctes(train_filter=tf)
    ctes = (
        pq[:1]
        + [wm_cte, wm2_cte, mx_cte]
        + pq[1:]
        + _ivf_cent_ctes(train_filter=tf)
    )

    def row(name: str, lo: str, hi: str, rng: str) -> str:
        return f"""SELECT '{name}' AS component,
    CAST({lo} AS BIGINT) AS wm_lo,
    CAST({hi} AS BIGINT) AS wm_hi,
    (SELECT CAST(COUNT(*) AS BIGINT) FROM ivfassigned
     WHERE {rng}) AS n_rows,
    (SELECT CAST(COALESCE(SUM(vec_id), 0) AS BIGINT) FROM ivfassigned
     WHERE {rng}) AS id_checksum,
    (SELECT CAST(COALESCE(SUM(cell * (m + 1)), 0) AS BIGINT)
     FROM a{PQ_ITERS} WHERE {rng}) AS code_checksum"""

    w1 = "(SELECT w FROM wm)"
    w2 = "(SELECT w FROM wm2)"
    rows = [
        row("base", "-1", f"COALESCE({w1}, -1)", f"vec_id <= {w1}"),
        row(
            "delta_0001",
            f"COALESCE({w1}, -1)",
            f"COALESCE({w2}, -1)",
            f"vec_id > {w1} AND vec_id <= {w2}",
        ),
        row(
            "delta_0002",
            f"COALESCE({w2}, -1)",
            "COALESCE((SELECT m FROM mx), -1)",
            f"vec_id > {w2}",
        ),
    ]
    return (
        "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(rows)
    )


ANN_SEGMENT_STACK_REPORT = _ann_stack_report_sql()
LLMOPS_ORACLES["ann_segment_stack_report"] = ANN_SEGMENT_STACK_REPORT


# ann_compact_if_drifted (operators/similarity.ann_compact_if_drifted):
# compute the drifted-dimension count from the drift report's
# integer-grid recipe (_drift_core_sql — shared verbatim with
# embedding_drift_report's oracle so the trigger can't drift from the
# report), then emit the matching branch behind count-guarded
# predicates: the decision row always; the six full-scope compact
# manifest rows when any dimension drifted; the three kept-segment
# audit rows (id-level: count + Σ vec_id over the valid corpus's
# watermark split) when none did.
def _ann_compact_if_drifted_sql() -> str:
    from ..operators.similarity import (
        APPEND_WM2_FRAC,
        APPEND_WM_FRAC,
        DRIFT_ABS_THRESHOLD,
    )

    wm_cte = (
        f"wm AS (SELECT CAST(FLOOR({APPEND_WM_FRAC} * "
        "CAST(MAX(vec_id) AS DOUBLE)) AS BIGINT) AS w FROM valid)"
    )
    wm2_cte = (
        f"wm2 AS (SELECT CAST(FLOOR({APPEND_WM2_FRAC} * "
        "CAST(MAX(vec_id) AS DOUBLE)) AS BIGINT) AS w FROM valid)"
    )
    ndrift_cte = (
        "ndrift AS (SELECT CAST(COALESCE(SUM(CASE WHEN mean_shift IS "
        f"NOT NULL AND ABS(mean_shift) > {DRIFT_ABS_THRESHOLD} "
        "THEN 1 ELSE 0 END), 0) AS BIGINT) AS n FROM mid)"
    )
    ctes = (
        _pq_code_ctes()
        + _ivf_cent_ctes()
        + [wm_cte, wm2_cte, _drift_core_sql(), ndrift_cte]
    )
    g_yes = "\n WHERE (SELECT n FROM ndrift) > 0"
    g_no = "\n WHERE (SELECT n FROM ndrift) = 0"
    w1 = "(SELECT w FROM wm)"
    w2 = "(SELECT w FROM wm2)"

    def kept(name: str, rng: str) -> str:
        return f"""SELECT '{name}',
    (SELECT CAST(COUNT(*) AS BIGINT) FROM valid WHERE {rng}),
    (SELECT CAST(COALESCE(SUM(vec_id), 0) AS BIGINT)
     FROM valid WHERE {rng}){g_no}"""

    rows = (
        "SELECT 'drift_decision' AS component,\n"
        "    (SELECT n FROM ndrift) AS n_rows,\n"
        "    CAST(CASE WHEN (SELECT n FROM ndrift) > 0 THEN 1 ELSE 0 "
        "END AS BIGINT) AS checksum\n"
        "UNION ALL\n"
        + _compact_manifest_rows(guard=g_yes).rstrip("\n")
        + "\nUNION ALL\n"
        + "\nUNION ALL\n".join(
            kept(n, r)
            for n, r in [
                ("kept_base_codes", f"vec_id <= {w1}"),
                (
                    "kept_delta_0001",
                    f"vec_id > {w1} AND vec_id <= {w2}",
                ),
                ("kept_delta_0002", f"vec_id > {w2}"),
            ]
        )
    )
    return "WITH " + ",\n".join(ctes) + "\n" + rows



# embedding_drift_report (operators/similarity.embedding_drift_report):
# the embedding_dim_stats integer-grid recipe split across the append
# watermark — conditional int64 sums per side, means/variances/shift as
# FIXED expressions in the identical association, drifted derived from
# the ROUNDED shift (never NULL: no verdict without both sides). Every
# SUM CAST to BIGINT (the HUGEINT dtype trap).
def _drift_core_sql() -> str:
    """The flat/per/mid CTE block of the drift recipe (references
    ``valid`` and ``wm``) — composed verbatim by _embedding_drift_sql
    AND _ann_compact_if_drifted_sql so the drifted-flag definition the
    trigger consumes can never drift from the report (the _pq_code_ctes
    precedent)."""
    mb = "CAST(s_base AS DOUBLE) / 10000.0 / n_base"
    md = "CAST(s_delta AS DOUBLE) / 10000.0 / n_delta"
    vb = f"CAST(ss_base AS DOUBLE) / 100000000.0 / n_base - ({mb}) * ({mb})"
    vd = (
        f"CAST(ss_delta AS DOUBLE) / 100000000.0 / n_delta"
        f" - ({md}) * ({md})"
    )
    return f"""flat AS (
    SELECT CASE WHEN vec_id > (SELECT w FROM wm) THEN 1 ELSE 0 END AS nu,
        generate_subscripts(embedding, 1) - 1 AS dim,
        CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 10000 + 0.5)
             AS BIGINT) AS q
    FROM valid
),
per AS (
    SELECT dim,
        CAST(SUM(CASE WHEN nu = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_base,
        CAST(SUM(CASE WHEN nu = 0 THEN q ELSE 0 END) AS BIGINT) AS s_base,
        CAST(SUM(CASE WHEN nu = 0 THEN q * q ELSE 0 END) AS BIGINT)
            AS ss_base,
        CAST(SUM(CASE WHEN nu = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_delta,
        CAST(SUM(CASE WHEN nu = 1 THEN q ELSE 0 END) AS BIGINT) AS s_delta,
        CAST(SUM(CASE WHEN nu = 1 THEN q * q ELSE 0 END) AS BIGINT)
            AS ss_delta
    FROM flat GROUP BY dim
),
mid AS (
    SELECT CAST(dim AS INTEGER) AS dim, n_base, n_delta,
        CASE WHEN n_base > 0
             THEN {portable_round_sql(mb, 6)} END AS mean_base,
        CASE WHEN n_delta > 0
             THEN {portable_round_sql(md, 6)} END AS mean_delta,
        CASE WHEN n_base > 0 AND n_delta > 0
             THEN {portable_round_sql(f'({md}) - ({mb})', 6)}
        END AS mean_shift,
        CASE WHEN n_base > 0
             THEN {portable_round_sql(vb, 8)} END AS var_base,
        CASE WHEN n_delta > 0
             THEN {portable_round_sql(vd, 8)} END AS var_delta
    FROM per
)"""


def _embedding_drift_sql() -> str:
    from ..operators.similarity import (
        APPEND_WM_FRAC,
        DRIFT_ABS_THRESHOLD,
    )

    valid = (
        "SELECT * FROM embeddings WHERE len(embedding) = "
        "(SELECT MAX(len(embedding)) FROM embeddings) AND "
        "len(list_filter(embedding, v -> v IS NULL)) = 0 AND "
        "len(list_filter(embedding, v -> isnan(CAST(v AS DOUBLE)) "
        "OR isinf(CAST(v AS DOUBLE)))) = 0 AND vec_id IS NOT NULL AND "
        "vec_id >= 0 AND "
        "vec_id NOT IN (SELECT vec_id FROM embeddings WHERE vec_id IS "
        "NOT NULL GROUP BY vec_id HAVING COUNT(*) > 1)"
    )
    return f"""
WITH valid AS ({valid}),
wm AS (SELECT CAST(FLOOR({APPEND_WM_FRAC} *
    CAST(MAX(vec_id) AS DOUBLE)) AS BIGINT) AS w FROM valid),
{_drift_core_sql()}
SELECT *,
    CAST(CASE WHEN mean_shift IS NOT NULL
              AND ABS(mean_shift) > {DRIFT_ABS_THRESHOLD}
         THEN 1 ELSE 0 END AS INTEGER) AS drifted
FROM mid
"""


EMBEDDING_DRIFT_REPORT = _embedding_drift_sql()
LLMOPS_ORACLES["embedding_drift_report"] = EMBEDDING_DRIFT_REPORT

# Registered here (after _drift_core_sql exists) — the builder lives
# beside its compact twin above.
ANN_COMPACT_IF_DRIFTED = _ann_compact_if_drifted_sql()
LLMOPS_ORACLES["ann_compact_if_drifted"] = ANN_COMPACT_IF_DRIFTED

# pq_recall_report (operators/similarity.pq_recall_report): the two
# L2-metric ANN oracles nested VERBATIM as CTEs (the recall-report
# precedent — audited definitions can't drift), intersected per query
# against the exact squared-L2 top-K baseline (same rounding grid and
# vec_id tie-break as the operators' re-rank stage).
def _pq_recall_sql() -> str:
    from ..operators.similarity import IVF_ROUND

    rg = 10**IVF_ROUND
    d2 = _D2_SQL
    return f"""
WITH validq AS (
    SELECT * FROM embeddings WHERE len(embedding) =
        (SELECT MAX(len(embedding)) FROM embeddings) AND
        len(list_filter(embedding, v -> v IS NULL)) = 0 AND len(list_filter(embedding, v -> isnan(CAST(v AS DOUBLE)) OR isinf(CAST(v AS DOUBLE)))) = 0 AND vec_id IS NOT NULL AND vec_id >= 0 AND vec_id NOT IN (SELECT vec_id FROM embeddings WHERE vec_id IS NOT NULL GROUP BY vec_id HAVING COUNT(*) > 1)
),
bf AS (
    SELECT query_id, vec_id FROM (
        SELECT q.vec_id AS query_id, t.vec_id,
            ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                FLOOR(({d2.format(a='q.embedding', b='t.embedding')})
                      * {rg} + 0.5) / {rg} ASC, t.vec_id ASC) AS rank
        FROM validq q, validq t
        WHERE q.vec_id < {N_QUERIES} AND t.vec_id <> q.vec_id
    ) WHERE rank <= {TOP_K}
),
pq AS ({SIMILARITY_PQ_TOPK}),
ivfpq AS ({IVF_PQ_TOPK}),
truth AS (
    SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_truth
    FROM bf GROUP BY query_id
),
pq_hits AS (
    SELECT bf.query_id, CAST(COUNT(*) AS BIGINT) AS n_hits
    FROM bf JOIN pq ON bf.query_id = pq.query_id AND bf.vec_id = pq.vec_id
    GROUP BY bf.query_id
),
ivfpq_hits AS (
    SELECT bf.query_id, CAST(COUNT(*) AS BIGINT) AS n_hits
    FROM bf JOIN ivfpq
        ON bf.query_id = ivfpq.query_id AND bf.vec_id = ivfpq.vec_id
    GROUP BY bf.query_id
)
SELECT t.query_id, 'pq' AS method,
    CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits, t.n_truth,
    CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / CAST(t.n_truth AS DOUBLE)
        AS recall
FROM truth t LEFT JOIN pq_hits h USING (query_id)
UNION ALL
SELECT t.query_id, 'ivf_pq' AS method,
    CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits, t.n_truth,
    CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / CAST(t.n_truth AS DOUBLE)
        AS recall
FROM truth t LEFT JOIN ivfpq_hits h USING (query_id)
"""


PQ_RECALL_REPORT = _pq_recall_sql()
LLMOPS_ORACLES["pq_recall_report"] = PQ_RECALL_REPORT


# embedding_corr_topk (operators/similarity.embedding_corr_topk): same
# 1e-4 integer element grid, exact integer pair sums (combine-order-free
# on both engines), token-identical covariance / correlation expressions,
# mirrored cannot-correlate filter on the ROUNDED variances, rank on
# (rounded |corr| DESC, dim_i, dim_j).
def _corr_topk_sql() -> str:
    from ..operators.similarity import COV_TOP_PAIRS

    return f"""
WITH valid AS (
    SELECT * FROM embeddings WHERE len(embedding) =
        (SELECT MAX(len(embedding)) FROM embeddings) AND
        len(list_filter(embedding, v -> v IS NULL)) = 0 AND len(list_filter(embedding, v -> isnan(CAST(v AS DOUBLE)) OR isinf(CAST(v AS DOUBLE)))) = 0 AND vec_id IS NOT NULL AND vec_id >= 0 AND vec_id NOT IN (SELECT vec_id FROM embeddings WHERE vec_id IS NOT NULL GROUP BY vec_id HAVING COUNT(*) > 1)
),
flat AS (
    SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
        CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 10000 + 0.5)
             AS BIGINT) AS q
    FROM valid
),
g AS (
    SELECT a.dim AS di, b.dim AS dj, COUNT(*) AS n,
        SUM(a.q * b.q) AS sp, SUM(a.q) AS si, SUM(b.q) AS sj,
        SUM(a.q * a.q) AS ssi, SUM(b.q * b.q) AS ssj
    FROM flat a JOIN flat b ON a.vec_id = b.vec_id AND a.dim < b.dim
    GROUP BY a.dim, b.dim
),
scored AS (
    SELECT CAST(di AS INT) AS dim_i, CAST(dj AS INT) AS dim_j,
        CAST(n AS BIGINT) AS n_vecs,
        FLOOR((CAST(sp AS DOUBLE) / 100000000.0 / n
               - (CAST(si AS DOUBLE) / 10000.0 / n)
                 * (CAST(sj AS DOUBLE) / 10000.0 / n))
              * 100000000 + 0.5) / 100000000 AS cov,
        FLOOR(((CAST(sp AS DOUBLE) / 100000000.0 / n
                - (CAST(si AS DOUBLE) / 10000.0 / n)
                  * (CAST(sj AS DOUBLE) / 10000.0 / n))
               / SQRT((CAST(ssi AS DOUBLE) / 100000000.0 / n
                       - (CAST(si AS DOUBLE) / 10000.0 / n)
                         * (CAST(si AS DOUBLE) / 10000.0 / n))
                      * (CAST(ssj AS DOUBLE) / 100000000.0 / n
                         - (CAST(sj AS DOUBLE) / 10000.0 / n)
                           * (CAST(sj AS DOUBLE) / 10000.0 / n))))
              * 1000000 + 0.5) / 1000000 AS corr,
        FLOOR(ABS((CAST(sp AS DOUBLE) / 100000000.0 / n
                   - (CAST(si AS DOUBLE) / 10000.0 / n)
                     * (CAST(sj AS DOUBLE) / 10000.0 / n))
                  / SQRT((CAST(ssi AS DOUBLE) / 100000000.0 / n
                          - (CAST(si AS DOUBLE) / 10000.0 / n)
                            * (CAST(si AS DOUBLE) / 10000.0 / n))
                         * (CAST(ssj AS DOUBLE) / 100000000.0 / n
                            - (CAST(sj AS DOUBLE) / 10000.0 / n)
                              * (CAST(sj AS DOUBLE) / 10000.0 / n))))
              * 1000000 + 0.5) / 1000000 AS abs_corr
    FROM g
    WHERE FLOOR((CAST(ssi AS DOUBLE) / 100000000.0 / n
                 - (CAST(si AS DOUBLE) / 10000.0 / n)
                   * (CAST(si AS DOUBLE) / 10000.0 / n))
                * 100000000 + 0.5) / 100000000 > 0
      AND FLOOR((CAST(ssj AS DOUBLE) / 100000000.0 / n
                 - (CAST(sj AS DOUBLE) / 10000.0 / n)
                   * (CAST(sj AS DOUBLE) / 10000.0 / n))
                * 100000000 + 0.5) / 100000000 > 0
)
SELECT dim_i, dim_j, n_vecs, cov, corr, rank FROM (
    SELECT *, ROW_NUMBER() OVER (
        ORDER BY abs_corr DESC, dim_i ASC, dim_j ASC) AS rank
    FROM scored
) WHERE rank <= {COV_TOP_PAIRS}
"""


EMBEDDING_CORR_TOPK = _corr_topk_sql()
LLMOPS_ORACLES["embedding_corr_topk"] = EMBEDDING_CORR_TOPK


# repair_documents_reingest (operators/dedup.py): deterministic set
# algebra — exact-duplicate full rows collapse (GROUP BY the pinned
# row), conflicting doc_ids (>1 distinct full row) and NULL-id rows
# quarantine. COUNT CAST to BIGINT (the HUGEINT dtype trap); the column
# list comes from the shared DOC_REPAIR_COLS so the row-identity
# definition cannot drift.
def _repair_reingest_sql() -> str:
    from ..operators.dedup import DOC_REPAIR_COLS

    cols = ", ".join(DOC_REPAIR_COLS)
    return f"""
SELECT {cols}, CAST(COUNT(*) AS BIGINT) AS n_copies
FROM (SELECT {cols} FROM documents) _d
WHERE doc_id IS NOT NULL AND doc_id NOT IN (
    SELECT doc_id FROM (
        SELECT doc_id, COUNT(DISTINCT _t) AS nd
        FROM (SELECT {cols} FROM documents) _t
        WHERE doc_id IS NOT NULL GROUP BY doc_id
    ) WHERE nd > 1)
GROUP BY {cols}
"""


REPAIR_DOCUMENTS_REINGEST = _repair_reingest_sql()
LLMOPS_ORACLES["repair_documents_reingest"] = REPAIR_DOCUMENTS_REINGEST
