"""PII scrubbing: redact emails, IPv4 addresses, and phone-like digit
sequences from a text column — the compliance pass every training-data
pipeline runs before anything else sees the corpus.

The reference repo handles user records (amazon_reviews.csv customer
fields, reference extract_load_transform_data_pipeline.py.py:95-101) but
never scrubs them; this engine exposes scrubbing as a first-class,
oracle-checked operator.

Engine parity: patterns are written in the common subset of Java regex
(Spark) and RE2 (DuckDB) — no backreferences, no lookaround, ASCII word
boundaries only — so the DuckDB oracle applies the IDENTICAL patterns.
All scrubbing is `regexp_replace`/`regexp_extract_all` built-ins: pure
whole-stage codegen, scan → project, no shuffle, no Python. At 100 TB
this runs at parquet-scan speed and is trivially partition-parallel.

The driver's synthetic corpus contains no PII (word-soup text), so the
registered query proves engine parity on the no-match path; the planted
fixtures in tests/test_pii.py pin the match path cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..config import DEFAULT_CONFIG, EngineConfig

# Common Java-regex/RE2 subset. Order matters: emails are scrubbed before
# phones so an address's digits can't be re-matched as a phone number.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}(\.\d{1,3}){3}\b"
PHONE_RE = r"\+?\d[\d ()-]{6,}\d"

PII_PATTERNS = (
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ip", IPV4_RE, "<IP>"),
    ("phone", PHONE_RE, "<PHONE>"),
)


def scrub_expr(col: Column) -> Column:
    """The scrubbed text: replacement chain in PII_PATTERNS order."""
    out = col
    for _, pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def count_exprs(col: Column) -> list[Column]:
    """Per-category match counts, each measured on the ORIGINAL text (so
    counts are independent of replacement order; overlapping categories —
    a phone inside an email — count in both, documented behavior)."""
    return [
        F.array_size(F.regexp_extract_all(col, F.lit(pattern), 0)).alias(
            f"n_{name}"
        )
        for name, pattern, _ in PII_PATTERNS
    ]


def pii_scrub(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Scrub the documents table; emit scrubbed text + per-category counts
    + a `has_pii` routing flag (quarantine-vs-clean split key)."""
    docs = load_table(spark, sf_dir, "documents")
    text = F.col("text")
    counts = count_exprs(text)
    total = sum(
        (F.col(f"n_{name}") for name, _, _ in PII_PATTERNS), F.lit(0)
    )
    return docs.select(
        "doc_id",
        scrub_expr(text).alias("clean_text"),
        *counts,
    ).withColumn("has_pii", total > 0)


def pii_source_report(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Per-SOURCE PII incidence matrix: for every upstream feed, how many
    documents carry each PII category and what fraction of the feed is
    implicated — the compliance dashboard that localizes WHICH feed leaks
    user data before `pii_scrub` quietly launders it away (a feed at 40%
    email incidence is a crawler misconfiguration, not noise; the
    per-source split is the pii twin of `source_quality_matrix`).

    One scan, one map-side-combined groupBy(source): counts are the same
    `count_exprs` match expressions as pii_scrub (shared — can never
    drift) with source carried through the projection; no join anywhere.
    Pure regexp codegen at parquet-scan speed, trivially
    partition-parallel at 100 TB. NULL text is mirrored to the empty doc
    (coalesce both engines); NULL source groups like any other key.

    The driver corpus is PII-free word soup, so the registered query
    proves engine parity on the all-zero path; the planted fixtures in
    tests/test_pii.py pin the match path per category and per source."""
    docs = load_table(spark, sf_dir, "documents")
    text = F.coalesce(F.col("text"), F.lit(""))
    counts = count_exprs(text)
    total = sum(
        (F.col(f"n_{name}") for name, _, _ in PII_PATTERNS), F.lit(0)
    )
    per_doc = docs.select("source", *counts).withColumn(
        "is_pii_doc", (total > 0).cast("int")
    )
    n_docs = F.count(F.lit(1)).cast("long")
    return (
        per_doc.groupBy("source")
        .agg(
            n_docs.alias("n_docs"),
            *[
                F.sum(f"n_{name}").cast("long").alias(f"total_{name}")
                for name, _, _ in PII_PATTERNS
            ],
            F.sum("is_pii_doc").cast("long").alias("n_pii_docs"),
        )
        .select(
            "source",
            "n_docs",
            *[f"total_{name}" for name, _, _ in PII_PATTERNS],
            "n_pii_docs",
            (
                F.col("n_pii_docs").cast("double")
                / F.col("n_docs").cast("double")
            ).alias("pii_doc_rate"),
        )
    )
