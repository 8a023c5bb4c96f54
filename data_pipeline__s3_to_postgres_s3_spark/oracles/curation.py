"""DuckDB oracles for operators/curation.py — keep in lockstep.

Reuses the dedup shingle CTE (same distinct word 3-grams) and the
sampling module's multiplicative-hash split so the oracle composes the
surfaces exactly the way the Spark side does.
"""

from ..operators.curation import CONTAM_THRESHOLD
from ..operators.sampling import SPLIT_BUCKETS, TRAIN_UPTO, VAL_UPTO, split_hash_sql
from .llmops import _SHINGLES

_BUCKET = f"{split_hash_sql()} % {SPLIT_BUCKETS}"

DECONTAMINATE_EVAL_OVERLAP = f"""
WITH {_SHINGLES},
split AS (SELECT doc_id, {_BUCKET} AS bucket FROM documents),
ev AS (
    SELECT DISTINCT shingle
    FROM sh JOIN split USING (doc_id) WHERE bucket >= {VAL_UPTO}
),
tr AS (
    SELECT sh.doc_id, sh.shingle
    FROM sh JOIN split USING (doc_id) WHERE bucket < {TRAIN_UPTO}
),
hits AS (
    SELECT doc_id, COUNT(*) AS n_overlap
    FROM tr JOIN ev USING (shingle) GROUP BY doc_id
),
tot AS (SELECT doc_id, COUNT(*) AS n_shingles FROM tr GROUP BY doc_id)
SELECT t.doc_id,
    t.n_shingles,
    CAST(COALESCE(h.n_overlap, 0) AS BIGINT) AS n_overlap,
    CAST(COALESCE(h.n_overlap, 0) AS DOUBLE) / t.n_shingles AS overlap_ratio,
    CAST(COALESCE(h.n_overlap, 0) AS DOUBLE) / t.n_shingles
        >= {CONTAM_THRESHOLD} AS is_contaminated
FROM tot t LEFT JOIN hits h USING (doc_id)
"""

DOC_REPETITION = """
WITH toks AS (
    SELECT doc_id, string_split(coalesce(text, ''), ' ') AS t FROM documents
),
arr AS (
    SELECT doc_id, t,
        list_transform(generate_series(1, greatest(len(t) - 1, 0)),
                       i -> t[i] || ' ' || t[i + 1]) AS bg
    FROM toks
)
SELECT doc_id,
    len(t) AS n_tokens,
    len(list_distinct(t)) AS n_distinct_tokens,
    CASE WHEN len(t) > 0
         THEN 1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / len(t)
         ELSE 0.0 END AS dup_token_ratio,
    len(bg) AS n_bigrams,
    len(list_distinct(bg)) AS n_distinct_bigrams,
    CASE WHEN len(bg) > 0
         THEN 1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg)
         ELSE 0.0 END AS dup_bigram_ratio
FROM arr
"""

# SUM(BIGINT) is HUGEINT in DuckDB → float64 in pandas; cast back so the
# value-hash compares int with int (same trap as events_sessionized).
EVENT_PROPS_EXTRACT = """
SELECT event_type,
    COUNT(*) AS n_events,
    COUNT(k) AS n_with_k,
    CAST(SUM(k) AS BIGINT) AS sum_k,
    MIN(k) AS min_k,
    MAX(k) AS max_k,
    CAST(SUM(k) AS DOUBLE) / COUNT(k) AS avg_k
FROM (
    -- json_valid + TRY_CAST mirror Spark's get_json_object + try_cast: a
    -- malformed-JSON payload nulls (DuckDB json_extract hard-errors) and a
    -- non-integer '$.k' payload (the props re-encode hazard class, same
    -- fix as the item_cooccurrence oracles r6) nulls on both engines
    -- instead of hard-erroring in DuckDB.
    SELECT event_type,
        TRY_CAST(CASE WHEN json_valid(props)
                  AND regexp_matches(
                      json_extract_string(props, '$.k'),
                      '^[ ]*[+-]?[0-9]+[ ]*$')
                 THEN json_extract_string(props, '$.k') END
                 AS BIGINT) AS k
    FROM events
)
GROUP BY event_type
"""

# Integer SUMs cast back to BIGINT (HUGEINT → float64 pandas trap); the
# mean is portable_round-ed at scale 6 on both sides.
from ..functions.numeric import portable_round_sql

PER_SOURCE_REPORT = f"""
SELECT source,
    COUNT(*) AS n_docs,
    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
    COUNT(DISTINCT lang) AS n_langs,
    COUNT(*) - COUNT(DISTINCT md5(text)) AS n_exact_dups,
    {portable_round_sql(
        "CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) / COUNT(*)", 6
    )} AS mean_tokens
FROM documents
GROUP BY source
"""

CURATION_ORACLES = {
    "decontaminate_eval_overlap": DECONTAMINATE_EVAL_OVERLAP,
    "doc_repetition": DOC_REPETITION,
    "event_props_extract": EVENT_PROPS_EXTRACT,
    "per_source_report": PER_SOURCE_REPORT,
}

# quality_gate: the same single-pass funnel — reuses llmops' lang-ID SQL
# fragments (_SCORE_COLS/_BEST/_PRED) and the bigram shape above so every
# gate stays in lockstep with its standalone oracle.
from ..operators.curation import QG_MAX_DUP_BIGRAM, QG_MAX_STOPWORD
from .llmops import _BEST, _PRED, _SCORE_COLS, _STOP_LIST

# The row-LOCAL gate chain (mirrors operators/curation.row_gates) — the
# shared prefix of the batch QUALITY_GATE and the streaming
# STREAM_QUALITY_GATE oracles, factored so the verdicts can never drift.
_ROW_GATE_CTES = f"""tk AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
ar AS (
    SELECT doc_id, text, t,
        list_transform(generate_series(1, greatest(len(t) - 1, 0)),
                       i -> t[i] || ' ' || t[i + 1]) AS bg
    FROM tk
),
m AS (
    SELECT doc_id, md5(text) AS content_hash,
        CAST(len(list_filter(t, x -> x IN ({_STOP_LIST}))) AS DOUBLE)
            / len(t) AS stopword_ratio,
        CASE WHEN len(bg) > 0
             THEN 1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg)
             ELSE 0.0 END AS dup_bigram_ratio,
        {_SCORE_COLS}
    FROM ar
),
wb AS (SELECT *, {_BEST} AS best_score FROM m),
p AS (SELECT *, {_PRED} AS predicted_lang FROM wb)"""

QUALITY_GATE = f"""
WITH {_ROW_GATE_CTES},
c AS (SELECT *, MIN(doc_id) OVER (PARTITION BY content_hash) AS canon FROM p)
SELECT doc_id,
    predicted_lang <> 'und' AS lang_ok,
    dup_bigram_ratio <= {QG_MAX_DUP_BIGRAM} AS rep_ok,
    stopword_ratio <= {QG_MAX_STOPWORD} AS stop_ok,
    doc_id = canon AS canonical_ok,
    (predicted_lang <> 'und'
     AND dup_bigram_ratio <= {QG_MAX_DUP_BIGRAM}
     AND stopword_ratio <= {QG_MAX_STOPWORD}
     AND doc_id = canon) AS keep
FROM c
"""

CURATION_ORACLES["quality_gate"] = QUALITY_GATE

# shard_manifest: the kept corpus (quality_gate nested verbatim) bucketed
# with the same split arithmetic, per-(split, lang) accounting. SUM(BIGINT)
# → HUGEINT in DuckDB, so cast back (same trap as sum_k above).
SHARD_MANIFEST = f"""
WITH qg AS ({QUALITY_GATE}),
kept AS (
    SELECT d.doc_id, d.lang, d.text,
        CASE WHEN {_BUCKET.replace('doc_id', 'd.doc_id')} < {TRAIN_UPTO} THEN 'train'
             WHEN {_BUCKET.replace('doc_id', 'd.doc_id')} < {VAL_UPTO} THEN 'val'
             ELSE 'test' END AS split
    FROM documents d JOIN qg ON qg.doc_id = d.doc_id AND qg.keep
)
SELECT split, lang,
    COUNT(*) AS n_docs,
    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
    CAST(SUM(length(text)) AS BIGINT) AS total_chars
FROM kept
GROUP BY split, lang
"""

CURATION_ORACLES["shard_manifest"] = SHARD_MANIFEST

# compact_manifest: the same kept corpus chunked into the shard writer's
# files (row_number div SHARD_MAX_RECORDS within (split, lang) in doc_id
# order), then next-fit bin-packed by byte size (window cumsum div
# target; see pipelines/shards._pack_files). Window SUM over BIGINT is
# HUGEINT in DuckDB — cast back BEFORE the integer division or bin_id
# itself widens (the r4→r5 dtype class, curation_funnel precedent).


def _compact_manifest_sql() -> str:
    from ..pipelines.shards import COMPACT_TARGET_BYTES, SHARD_MAX_RECORDS

    return f"""
WITH qg AS ({QUALITY_GATE}),
kept AS (
    SELECT d.doc_id, d.lang, d.text,
        CASE WHEN {_BUCKET.replace('doc_id', 'd.doc_id')} < {TRAIN_UPTO} THEN 'train'
             WHEN {_BUCKET.replace('doc_id', 'd.doc_id')} < {VAL_UPTO} THEN 'val'
             ELSE 'test' END AS split
    FROM documents d JOIN qg ON qg.doc_id = d.doc_id AND qg.keep
),
perdoc AS (
    SELECT split, lang, doc_id, CAST(length(text) AS BIGINT) AS nb,
        (CAST(ROW_NUMBER() OVER (PARTITION BY split, lang ORDER BY doc_id)
              AS BIGINT) - 1) // {SHARD_MAX_RECORDS} AS file_idx
    FROM kept
),
files AS (
    SELECT split, lang, file_idx,
        CAST(COUNT(*) AS BIGINT) AS fn_docs,
        CAST(SUM(nb) AS BIGINT) AS fbytes,
        MIN(doc_id) AS fdoc_min, MAX(doc_id) AS fdoc_max
    FROM perdoc GROUP BY split, lang, file_idx
),
merged AS (
    SELECT *,
        COALESCE(CAST(SUM(fbytes) OVER (
            PARTITION BY split, lang ORDER BY file_idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
        ) AS BIGINT), 0) // {COMPACT_TARGET_BYTES} AS bin_id,
        'merge' AS action
    FROM files WHERE fbytes < {COMPACT_TARGET_BYTES}
),
kept_as_is AS (
    SELECT *, file_idx AS bin_id, 'keep' AS action
    FROM files WHERE fbytes >= {COMPACT_TARGET_BYTES}
),
binned AS (SELECT * FROM merged UNION ALL SELECT * FROM kept_as_is)
SELECT split, lang, action, CAST(bin_id AS BIGINT) AS bin_id,
    CAST(COUNT(*) AS BIGINT) AS n_files,
    CAST(SUM(fn_docs) AS BIGINT) AS n_docs,
    CAST(SUM(fbytes) AS BIGINT) AS est_bytes,
    MIN(fdoc_min) AS first_doc,
    MAX(fdoc_max) AS last_doc
FROM binned
GROUP BY split, lang, action, bin_id
"""


CURATION_ORACLES["compact_manifest"] = _compact_manifest_sql()

# line_dedup: C4/CCNet-style cross-document boilerplate line removal.
# Mirrors operators/curation.py:line_dedup — same lower(trim()) line
# normalization, same LINE_DF_CAP census threshold, same md5-of-rejoined
# text stand-in. n_lines/n_kept cast to INT (DuckDB COUNT is BIGINT-safe
# but SUM(CASE..1..) would be HUGEINT -> float64 in pandas — round-4
# lesson); kept_ratio divides the SAME double/int operands as the Spark
# side so IEEE results are bit-identical; string_agg skips NULLs (the
# boilerplate lines) and COALESCE('') matches Spark's empty array_join.
from ..operators.curation import LINE_DF_CAP

LINE_DEDUP = f"""
WITH lns AS (
    SELECT doc_id, string_split(text, chr(10)) AS t FROM documents
),
lines AS (
    SELECT doc_id, s AS pos, lower(trim(t[s])) AS norm
    FROM lns, unnest(generate_series(1, len(t))) AS g(s)
),
boiler AS (
    SELECT norm FROM lines GROUP BY norm
    HAVING COUNT(DISTINCT doc_id) >= {LINE_DF_CAP}
),
flagged AS (
    SELECT l.doc_id, l.pos, l.norm, (b.norm IS NOT NULL) AS is_bp
    FROM lines l LEFT JOIN boiler b USING (norm)
)
SELECT doc_id,
    CAST(COUNT(*) AS INT) AS n_lines,
    CAST(COUNT(CASE WHEN NOT is_bp THEN 1 END) AS INT) AS n_kept,
    CAST(COUNT(CASE WHEN NOT is_bp THEN 1 END) AS DOUBLE) / COUNT(*)
        AS kept_ratio,
    md5(COALESCE(
        string_agg(CASE WHEN NOT is_bp THEN norm END, chr(10) ORDER BY pos),
        '')) AS kept_hash
FROM flagged GROUP BY doc_id
"""

CURATION_ORACLES["line_dedup"] = LINE_DEDUP

# gopher_quality: mirrors operators/curation.py:gopher_quality — same split
# units (explicit-whitespace-class words / chr(10) lines; the literal
# class [ \t\n\r\f] rather than \s because Java's \s includes \x0B where
# RE2's does not), same regexes (disjoint-first-char alternation so
# Java-leftmost-first and RE2-leftmost-longest agree), same
# single-division ratio arithmetic. Counts cast to INT to match Spark's
# array_size; ratios divide identical operands so IEEE results are
# bit-identical.
from ..operators.curation import (
    GOPHER_MAX_BULLET_RATIO,
    GOPHER_MAX_ELLIPSIS_RATIO,
    GOPHER_MAX_MEAN_WLEN,
    GOPHER_MAX_SYMBOL_RATIO,
    GOPHER_MAX_WORDS,
    GOPHER_MIN_ALPHA_RATIO,
    GOPHER_MIN_MEAN_WLEN,
    GOPHER_MIN_REQUIRED_STOP,
    GOPHER_MIN_WORDS,
    GOPHER_REQUIRED_STOPWORDS,
)

_REQ_LIST = ", ".join(f"'{w}'" for w in GOPHER_REQUIRED_STOPWORDS)

GOPHER_QUALITY = f"""
WITH staged AS (
    SELECT doc_id,
        regexp_split_to_array(text, '[ \\t\\n\\r\\f]+') AS ws,
        string_split(text, chr(10)) AS ls,
        len(regexp_replace(text, '[ \\t\\n\\r\\f]', '', 'g')) AS n_wchars,
        len(regexp_extract_all(text, '#|…|\\.\\.\\.')) AS n_symbols
    FROM documents
),
metrics AS (
    SELECT doc_id,
        CAST(len(ws) AS INT) AS n_words,
        CAST(n_wchars AS DOUBLE) / len(ws) AS mean_word_len,
        CAST(n_symbols AS DOUBLE) / len(ws) AS symbol_word_ratio,
        CAST(len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]')))
             AS DOUBLE) / len(ws) AS alpha_word_ratio,
        CAST(len(list_filter(ls, l -> regexp_matches(ltrim(l), '^[-*•]')))
             AS DOUBLE) / len(ls) AS bullet_line_ratio,
        CAST(len(list_filter(ls,
                 l -> regexp_matches(rtrim(l), '(\\.\\.\\.|…)$')))
             AS DOUBLE) / len(ls) AS ellipsis_line_ratio,
        CAST(len(list_intersect(ws, [{_REQ_LIST}])) AS INT)
            AS n_required_stop
    FROM staged
)
SELECT *,
    (n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
     AND mean_word_len BETWEEN {GOPHER_MIN_MEAN_WLEN} AND {GOPHER_MAX_MEAN_WLEN}
     AND symbol_word_ratio <= {GOPHER_MAX_SYMBOL_RATIO}
     AND alpha_word_ratio >= {GOPHER_MIN_ALPHA_RATIO}
     AND bullet_line_ratio <= {GOPHER_MAX_BULLET_RATIO}
     AND ellipsis_line_ratio <= {GOPHER_MAX_ELLIPSIS_RATIO}
     AND n_required_stop >= {GOPHER_MIN_REQUIRED_STOP}) AS gopher_pass
FROM metrics
"""

CURATION_ORACLES["gopher_quality"] = GOPHER_QUALITY


# gopher_repetition: mirrors operators/curation.py:gopher_repetition —
# same explicit-whitespace word split / chr(10) line split, same
# element-by-element n-gram concatenation, same (count*10^7 + charlen)
# bigint encoding for the top-gram pick (plain integer max on both
# engines — no struct/collation comparison), same single-IEEE-division
# ratios of exact integers. list_aggregate sums are HUGEINT → cast to
# DOUBLE before the division (operands equal ⇒ doubles equal).
from ..operators.curation import (
    GOPHER_MAX_DUP5GRAM_CHAR_FRAC,
    GOPHER_MAX_DUP_LINE_CHAR_FRAC,
    GOPHER_MAX_DUP_LINE_FRAC,
    GOPHER_MAX_TOP2GRAM_CHAR_FRAC,
    GOPHER_MAX_TOP3GRAM_CHAR_FRAC,
)


def _dd_wordgrams(n: int) -> str:
    cat = " || ' ' || ".join(f"ws[i + {j}]" for j in range(n))
    return (
        f"CASE WHEN len(ws) >= {n} THEN "
        f"list_transform(generate_series(1, len(ws) - {n - 1}), i -> {cat}) "
        f"ELSE [] END"
    )


def _dd_top_key(garr: str, n: int) -> str:
    return (
        f"list_aggregate(list_transform(list_distinct({garr}), "
        f"g -> CAST(len(list_filter({garr}, x -> x = g)) AS BIGINT) "
        f"* 10000000 + (length(g) - {n - 1})), 'max')"
    )


def _dd_dup_chars(garr: str, joiners: int) -> str:
    return (
        f"coalesce(list_aggregate(list_transform(list_distinct({garr}), "
        f"g -> CASE WHEN len(list_filter({garr}, x -> x = g)) > 1 "
        f"THEN CAST(len(list_filter({garr}, x -> x = g)) AS BIGINT) "
        f"* (length(g) - {joiners}) ELSE 0 END), 'sum'), 0)"
    )


GOPHER_REPETITION = f"""
WITH staged AS (
    SELECT doc_id,
        regexp_split_to_array(text, '[ \\t\\n\\r\\f]+') AS ws,
        string_split(text, chr(10)) AS ls,
        len(regexp_replace(text, '[ \\t\\n\\r\\f]', '', 'g')) AS n_wchars,
        len(replace(text, chr(10), '')) AS n_lchars
    FROM documents
),
grams AS (
    SELECT doc_id, ls, n_wchars, n_lchars,
        {_dd_wordgrams(2)} AS g2,
        {_dd_wordgrams(3)} AS g3,
        {_dd_wordgrams(5)} AS g5
    FROM staged
),
keyed AS (
    SELECT doc_id, ls, g5, n_wchars, n_lchars,
        {_dd_top_key('g2', 2)} AS k2,
        {_dd_top_key('g3', 3)} AS k3
    FROM grams
),
metrics AS (
    SELECT doc_id,
        CAST(len(ls) AS INT) AS n_lines,
        1.0 - CAST(len(list_distinct(ls)) AS DOUBLE) / len(ls)
            AS dup_line_frac,
        CASE WHEN n_lchars > 0
             THEN CAST({_dd_dup_chars('ls', 0)} AS DOUBLE) / n_lchars
             ELSE 0.0 END AS dup_line_char_frac,
        CASE WHEN k2 IS NOT NULL AND n_wchars > 0
             THEN CAST((k2 // 10000000) * (k2 % 10000000) AS DOUBLE)
                  / n_wchars
             ELSE 0.0 END AS top_2gram_char_frac,
        CASE WHEN k3 IS NOT NULL AND n_wchars > 0
             THEN CAST((k3 // 10000000) * (k3 % 10000000) AS DOUBLE)
                  / n_wchars
             ELSE 0.0 END AS top_3gram_char_frac,
        CASE WHEN n_wchars > 0
             THEN CAST({_dd_dup_chars('g5', 4)} AS DOUBLE) / n_wchars
             ELSE 0.0 END AS dup_5gram_char_frac
    FROM keyed
)
SELECT *,
    (dup_line_frac <= {GOPHER_MAX_DUP_LINE_FRAC}
     AND dup_line_char_frac <= {GOPHER_MAX_DUP_LINE_CHAR_FRAC}
     AND top_2gram_char_frac <= {GOPHER_MAX_TOP2GRAM_CHAR_FRAC}
     AND top_3gram_char_frac <= {GOPHER_MAX_TOP3GRAM_CHAR_FRAC}
     AND dup_5gram_char_frac <= {GOPHER_MAX_DUP5GRAM_CHAR_FRAC})
        AS gopher_rep_pass
FROM metrics
"""

CURATION_ORACLES["gopher_repetition"] = GOPHER_REPETITION


# ccnet_quality_buckets: same census (count DESC, tok ASC LIMIT K — exact
# deterministic tie-break), but scored via explode + LEFT JOIN instead of
# the literal map — an independent formulation of the same lookup.
# SUM(BIGINT) is HUGEINT → cast back to BIGINT for the output column and
# to DOUBLE before the mean division (identical operands ⇒ identical
# doubles ⇒ identical NTILE order).
from ..operators.curation import CCNET_VOCAB_K

CCNET_QUALITY_BUCKETS = f"""
WITH toks AS (
    SELECT doc_id, unnest(string_split(coalesce(text, ''), ' ')) AS tok
    FROM documents
),
vocab AS (
    SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY tok
    ORDER BY COUNT(*) DESC, tok LIMIT {CCNET_VOCAB_K}
),
scored AS (
    SELECT t.doc_id,
        CAST(COUNT(*) AS INT) AS n_tokens,
        CAST(SUM(coalesce(v.c, 1)) AS BIGINT) AS sum_tok_counts,
        CAST(SUM(coalesce(v.c, 1)) AS DOUBLE) / COUNT(*) AS mean_tok_count
    FROM toks t LEFT JOIN vocab v USING (tok) GROUP BY t.doc_id
)
SELECT doc_id, n_tokens, sum_tok_counts, mean_tok_count,
    CASE NTILE(3) OVER (ORDER BY mean_tok_count DESC, doc_id)
        WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail'
    END AS ppl_bucket
FROM scored
"""

CURATION_ORACLES["ccnet_quality_buckets"] = CCNET_QUALITY_BUCKETS


# source_overlap: per-source DISTINCT word-3-gram sets → pairwise
# Jaccard/containment. Counts are COUNT(*) BIGINT on both sides (no
# HUGEINT trap — addition does not widen in DuckDB, only SUM does);
# ratios divide the same named integer columns in the same association
# as operators/curation.py:source_overlap and portable_round at 6.
_SO_JAC = portable_round_sql(
    "CAST(n_common AS DOUBLE) / CAST(n_a + n_b - n_common AS DOUBLE)", 6
)
_SO_CONT = portable_round_sql(
    "CAST(n_common AS DOUBLE) / CAST(LEAST(n_a, n_b) AS DOUBLE)", 6
)

SOURCE_OVERLAP = f"""
WITH toks AS (SELECT source, string_split(text, ' ') AS t FROM documents),
sh AS (
    SELECT DISTINCT source,
        concat_ws(' ', t[i], t[i+1], t[i+2]) AS shingle
    FROM toks, unnest(generate_series(1, len(t) - 2)) AS u(i)
),
sz AS (SELECT source, COUNT(*) AS n FROM sh GROUP BY source),
inter AS (
    SELECT a.source AS source_a, b.source AS source_b,
        COUNT(*) AS n_common
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
    GROUP BY 1, 2
),
base AS (
    SELECT sa.source AS source_a, sb.source AS source_b,
        sa.n AS n_a, sb.n AS n_b,
        COALESCE(i.n_common, 0) AS n_common
    FROM sz sa
    JOIN sz sb ON sa.source < sb.source
    LEFT JOIN inter i
        ON i.source_a = sa.source AND i.source_b = sb.source
)
SELECT source_a, source_b, n_a, n_b, n_common,
    {_SO_JAC} AS jaccard,
    {_SO_CONT} AS containment
FROM base
"""

CURATION_ORACLES["source_overlap"] = SOURCE_OVERLAP


# source_overlap_minhash: replica of the Spark signature pipeline keyed by
# source — same md5-hex7 hash chain and affine permutations as the dedup
# minhash oracles (imported fragments, so sketches can't drift), long-form
# (source, p, minhash) join instead of a 16-column pivot. n_match is a
# BIGINT-cast conditional SUM (HUGEINT rule); est_jaccard divides two
# DOUBLE casts exactly like the Column expression.
from ..operators.dedup import MINHASH_PERMS, MINHASH_PRIME
from .llmops import _A_LIST, _B_LIST, _HEX7_TO_INT

SOURCE_OVERLAP_MINHASH = f"""
WITH toks AS (SELECT source, string_split(text, ' ') AS t FROM documents),
sh AS (
    SELECT DISTINCT source,
        concat_ws(' ', t[i], t[i+1], t[i+2]) AS shingle
    FROM toks, unnest(generate_series(1, len(t) - 2)) AS u(i)
),
hashed AS (
    SELECT source, {_HEX7_TO_INT} AS h
    FROM (SELECT source, md5(shingle) AS m FROM sh)
),
mh AS (
    SELECT source, p,
        MIN((({_A_LIST})[p + 1] * h + ({_B_LIST})[p + 1])
            % {MINHASH_PRIME}) AS minhash
    FROM hashed, unnest(generate_series(0, {MINHASH_PERMS - 1})) AS t(p)
    GROUP BY source, p
)
SELECT a.source AS source_a, b.source AS source_b,
    CAST(SUM(CASE WHEN a.minhash = b.minhash THEN 1 ELSE 0 END) AS BIGINT)
        AS n_match,
    CAST(CAST(SUM(CASE WHEN a.minhash = b.minhash THEN 1 ELSE 0 END)
              AS BIGINT) AS DOUBLE)
        / CAST({MINHASH_PERMS} AS DOUBLE) AS est_jaccard
FROM mh a
JOIN mh b ON a.p = b.p AND a.source < b.source
GROUP BY 1, 2
"""

CURATION_ORACLES["source_overlap_minhash"] = SOURCE_OVERLAP_MINHASH


# cross_source_neardups: the MinHash-LSH pair oracle composed verbatim as
# a CTE (imported string — the dedup definition can't drift), plus the two
# id→source joins and the cross-feed filter.
from .llmops import DEDUP_MINHASH_LSH as _DEDUP_MINHASH_LSH

CROSS_SOURCE_NEARDUPS = f"""
WITH pairs AS ({_DEDUP_MINHASH_LSH})
SELECT doc_a, doc_b, da.source AS source_a, db.source AS source_b, jaccard
FROM pairs
JOIN documents da ON da.doc_id = doc_a
JOIN documents db ON db.doc_id = doc_b
WHERE da.source <> db.source
"""

CURATION_ORACLES["cross_source_neardups"] = CROSS_SOURCE_NEARDUPS

# split_leakage_report: the same composed LSH pair CTE, endpoints labeled
# with the dataset_split hash arithmetic (pure doc_id math — no join),
# cross-split pairs only. The hash routes through the overflow-safe
# split_hash_sql chokepoint (r9 scale probe: wide doc_ids overflowed the
# naive product on both engines).
_SPLIT_CASE = (
    "CASE WHEN " + split_hash_sql("{col}") + f" % {SPLIT_BUCKETS}"
    f" < {TRAIN_UPTO} THEN 'train' WHEN "
    + split_hash_sql("{col}")
    + f" % {SPLIT_BUCKETS} < {VAL_UPTO} THEN 'val' ELSE 'test' END"
)

SPLIT_LEAKAGE_REPORT = f"""
WITH pairs AS ({_DEDUP_MINHASH_LSH}),
labeled AS (
    SELECT doc_a, doc_b,
        {_SPLIT_CASE.format(col='doc_a')} AS split_a,
        {_SPLIT_CASE.format(col='doc_b')} AS split_b,
        jaccard
    FROM pairs
)
SELECT doc_a, doc_b, split_a, split_b, jaccard
FROM labeled WHERE split_a <> split_b
"""

CURATION_ORACLES["split_leakage_report"] = SPLIT_LEAKAGE_REPORT


def _funnel_sql() -> str:
    """curation_funnel oracle: quality_gate nested verbatim (the verdicts
    can never drift), first-failing-stage CASE ladder in FUNNEL_STAGES
    order, literal stage dimension, window cumsum for n_in. Window SUM
    over BIGINT is HUGEINT in DuckDB — cast back (sum_k trap); the ELSE
    arm of drop_rate is CAST(0 AS DOUBLE), never the DECIMAL literal."""
    from ..operators.curation import FUNNEL_STAGES

    stage_vals = ", ".join(
        f"({i}, '{s}')" for i, s in enumerate(FUNNEL_STAGES)
    )
    return f"""
WITH qg AS ({QUALITY_GATE}),
ff AS (
    SELECT CASE WHEN NOT lang_ok THEN 0
                WHEN NOT rep_ok THEN 1
                WHEN NOT stop_ok THEN 2
                WHEN NOT canonical_ok THEN 3
                ELSE 4 END AS stage_idx
    FROM qg
),
drops AS (
    SELECT stage_idx, COUNT(*) AS n FROM ff
    WHERE stage_idx < {len(FUNNEL_STAGES)}
    GROUP BY stage_idx
),
stages(stage_idx, stage) AS (VALUES {stage_vals}),
tot AS (SELECT COUNT(*) AS total FROM qg),
j AS (
    SELECT s.stage_idx, s.stage,
        CAST(COALESCE(d.n, 0) AS BIGINT) AS n_dropped
    FROM stages s LEFT JOIN drops d USING (stage_idx)
),
with_in AS (
    SELECT stage_idx, stage,
        CAST((SELECT total FROM tot) - COALESCE(SUM(n_dropped) OVER (
            ORDER BY stage_idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
        ), 0) AS BIGINT) AS n_in,
        n_dropped
    FROM j
)
SELECT stage_idx, stage, n_in, n_dropped,
    CAST(n_in - n_dropped AS BIGINT) AS n_out,
    CASE WHEN n_in > 0 THEN CAST(n_dropped AS DOUBLE) / n_in
         ELSE CAST(0 AS DOUBLE) END AS drop_rate
FROM with_in
"""


CURATION_ORACLES["curation_funnel"] = _funnel_sql()


# source_quality_matrix: the shared row-gate CTE prefix (verdicts can
# never drift from the batch/stream gates), source attached by a doc_id
# join oracle-side (the Spark side CARRIES it through the scan
# projection instead — same values, no corpus join there). Counts
# BIGINT; the one rate division is double/double.
SOURCE_QUALITY_MATRIX = f"""
WITH {_ROW_GATE_CTES},
v AS (
    SELECT d.source,
        (p.predicted_lang <> 'und') AS lang_ok,
        (p.dup_bigram_ratio <= {QG_MAX_DUP_BIGRAM}) AS rep_ok,
        (p.stopword_ratio <= {QG_MAX_STOPWORD}) AS stop_ok
    FROM p JOIN documents d ON d.doc_id = p.doc_id
)
SELECT source,
    CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(SUM(CASE WHEN lang_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_lang_ok,
    CAST(SUM(CASE WHEN rep_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_rep_ok,
    CAST(SUM(CASE WHEN stop_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_stop_ok,
    CAST(SUM(CASE WHEN lang_ok AND rep_ok AND stop_ok THEN 1 ELSE 0 END)
         AS BIGINT) AS n_pass,
    CAST(SUM(CASE WHEN lang_ok AND rep_ok AND stop_ok THEN 1 ELSE 0 END)
         AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS pass_rate
FROM v
GROUP BY source
"""

CURATION_ORACLES["source_quality_matrix"] = SOURCE_QUALITY_MATRIX


# source_unigram_kl (operators/curation.source_unigram_kl): per-word KL
# terms quantized to nano-nats BEFORE the per-source sum; NULL source
# coalesces to '' at the chokepoint (mirrored — NULL keys would drop
# from the equi-joins on both engines); integer SUMs cast back from
# HUGEINT; kl_nats is the exact integer/1e9 division.


def _source_kl_sql() -> str:
    from ..operators.curation import KL_NANO_SCALE

    return f"""
WITH toks AS (
    SELECT coalesce(source, '') AS source,
        unnest(string_split(coalesce(text, ''), ' ')) AS w
    FROM documents
),
sw AS (
    SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c_sw
    FROM toks GROUP BY source, w
),
ns AS (
    SELECT source, CAST(SUM(c_sw) AS BIGINT) AS n_tokens,
        CAST(COUNT(*) AS BIGINT) AS n_word_types
    FROM sw GROUP BY source
),
cw AS (SELECT w, CAST(SUM(c_sw) AS BIGINT) AS c_w FROM sw GROUP BY w),
tot AS (SELECT CAST(SUM(c_sw) AS DOUBLE) AS n FROM sw),
terms AS (
    SELECT sw.source, n_tokens, n_word_types,
        CAST(FLOOR(((CAST(c_sw AS DOUBLE) / CAST(n_tokens AS DOUBLE))
            * ln((CAST(c_sw AS DOUBLE) / CAST(n_tokens AS DOUBLE))
                / (CAST(c_w AS DOUBLE) / n)))
            * {float(KL_NANO_SCALE)} + 0.5) AS BIGINT) AS kl_nano
    FROM sw
    JOIN ns USING (source)
    JOIN cw USING (w)
    CROSS JOIN tot
)
SELECT source, n_tokens, n_word_types,
    CAST(SUM(kl_nano) AS BIGINT) AS kl_nano_sum,
    CAST(CAST(SUM(kl_nano) AS BIGINT) AS DOUBLE) / 1000000000.0 AS kl_nats
FROM terms
GROUP BY source, n_tokens, n_word_types
"""


CURATION_ORACLES["source_unigram_kl"] = _source_kl_sql()
