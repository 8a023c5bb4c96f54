"""Text-analysis operators over the documents table — the LLM-data-pipeline
extension surface (BASELINE.json north star): quality scoring, language ID,
token counting, fingerprinting.

All pure JVM built-ins (split/filter/regexp/md5) — no Python UDFs — so the
whole surface stays inside whole-stage codegen and scales linearly with the
scan. Every ratio is a single int/int → double division (deterministic
across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..config import DEFAULT_CONFIG, EngineConfig

# Shared with oracles/llmops.py — keep in lockstep.
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "for")
# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation marks.
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Tiny deterministic language profiles (marker stopwords per language).
LANG_MARKERS = {
    "en": ("the", "and", "of", "is"),
    "de": ("der", "die", "und", "ist"),
    "fr": ("le", "la", "et", "est"),
    "es": ("el", "la", "y", "es"),
}


def _tokens():
    return F.split(F.col("text"), " ")


def text_quality(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Per-document quality metrics: token counts (whitespace + BPE-ish
    regex), average token length, stopword/punctuation ratios."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    n_tokens = F.array_size(toks)
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    n_stop = F.array_size(
        F.expr(f"filter(split(text, ' '), x -> x IN ({stop_list}))")
    )
    n_chars = F.length("text")
    n_alpha_chars = F.length(F.regexp_replace("text", r"[^A-Za-z0-9]", ""))
    return docs.select(
        "doc_id",
        "lang",
        n_tokens.alias("n_tokens"),
        F.regexp_count("text", F.lit(BPE_PATTERN)).alias("n_bpe_tokens"),
        n_chars.alias("n_chars"),
        (
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
            .cast("double")
            / n_tokens
        ).alias("avg_token_len"),
        (n_stop.cast("double") / n_tokens).alias("stopword_ratio"),
        ((n_chars - n_alpha_chars - (n_tokens - 1)).cast("double") / n_chars).alias(
            "punct_ratio"
        ),
    )


def lang_id(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Marker-stopword language ID: score each profile by marker-token hits,
    argmax with deterministic tie-break (score DESC, lang ASC), 'und'
    (undetermined) when no marker hits at all."""
    docs = load_table(spark, sf_dir, "documents")

    scored = docs.select(
        "doc_id",
        F.col("lang").alias("actual_lang"),
        *[
            F.array_size(
                F.expr(
                    "filter(split(text, ' '), x -> x IN ({}))".format(
                        ", ".join(f"'{w}'" for w in markers)
                    )
                )
            ).alias(f"score_{lang}")
            for lang, markers in LANG_MARKERS.items()
        ],
    )
    # argmax via greatest + chained when (deterministic tie-break: first
    # lang in alphabetical order wins among ties).
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.lit("und")
    for lang in reversed(langs):
        pred = F.when(
            (best > 0) & (F.col(f"score_{lang}") == best), F.lit(lang)
        ).otherwise(pred)
    return scored.select(
        "doc_id",
        "actual_lang",
        pred.alias("predicted_lang"),
        best.alias("best_score"),
    )


def doc_fingerprint(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Content fingerprints: exact md5, normalized md5 (lower + collapsed
    whitespace), and a 4-hex shard key — the partitioning handle for
    dedup-by-fingerprint at scale (hash-partition on shard_key ⇒ each
    partition dedups locally, no global shuffle of payloads)."""
    docs = load_table(spark, sf_dir, "documents")
    normalized = F.lower(F.regexp_replace("text", r"\s+", " "))
    return docs.select(
        "doc_id",
        F.md5(F.col("text")).alias("content_hash"),
        F.md5(normalized).alias("normalized_hash"),
        F.substring(F.md5(F.col("text")), 1, 4).alias("shard_key"),
        F.length("text").alias("n_chars"),
    )
