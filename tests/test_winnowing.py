"""Winnowing guarantee test: any shared token run of length >= w + k - 1
must produce at least one SHARED fingerprint between the two documents —
the property that makes winnowed indexes complete for substring matching
(Schleimer/Wilkerson/Aiken 2003, theorem 1). Checked on real corpus pairs
the all-pairs n-gram operator identifies as overlapping."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline__s3_to_postgres_s3_spark.catalog import load_table
from data_pipeline__s3_to_postgres_s3_spark.operators.textops import (
    WINNOW_K,
    WINNOW_W,
    winnow_fingerprints,
)


def _common_run(a: list[str], b: list[str]) -> int:
    """Longest common contiguous token run (O(n·m), fine for fixtures)."""
    best = 0
    for i in range(len(a)):
        for j in range(len(b)):
            k = 0
            while i + k < len(a) and j + k < len(b) and a[i + k] == b[j + k]:
                k += 1
            best = max(best, k)
    return best


def test_shared_runs_share_fingerprints(spark, sf_small):
    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in load_table(spark, sf_small, "documents").limit(40).collect()
    }
    fps = (
        winnow_fingerprints(spark, sf_small)
        .groupBy("doc_id")
        .agg(F.collect_set("fingerprint").alias("fp"))
        .collect()
    )
    fp_sets = {r["doc_id"]: set(r["fp"]) for r in fps}
    threshold = WINNOW_W + WINNOW_K - 1

    ids = sorted(docs)
    checked = 0
    for i, a in enumerate(ids):
        for b in ids[i + 1 : i + 6]:  # bounded pair budget
            if _common_run(docs[a], docs[b]) >= threshold:
                assert fp_sets[a] & fp_sets[b], (
                    f"docs {a},{b} share a >= {threshold}-token run but no "
                    "fingerprint — winnowing guarantee violated"
                )
                checked += 1
    assert checked > 0, "fixture produced no overlapping pairs to check"


def test_fingerprint_density(spark, sf_small):
    """Winnowing keeps roughly 2/(w+1) of grams — a sanity band that
    catches an off-by-one in the window frame (density 1.0 would mean no
    winnowing at all; near-zero would mean dropped fingerprints)."""
    docs = load_table(spark, sf_small, "documents")
    n_grams = docs.select(
        F.greatest(
            F.array_size(F.split("text", " ")) - (WINNOW_K - 1), F.lit(0)
        ).alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    n_fp = winnow_fingerprints(spark, sf_small).count()
    density = n_fp / n_grams
    assert 0.1 < density < 0.8, density
