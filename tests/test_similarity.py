"""Similarity-search quality tests.

Value-level correctness of each query is oracle-checked by the registry
tests; these pin the QUALITY of the approximate indexes against the exact
brute-force baseline — recall@5 is the number that justifies the 100 TB
scale paths, and a silent index regression (wrong bucket family, dropped
table, broken centroid assembly) shows up here, not in the oracle diff
(which would agree with the equally-broken SQL replica).
"""

from __future__ import annotations

import pytest

from data_pipeline__s3_to_postgres_s3_spark.operators.similarity import (
    similarity_bruteforce_topk,
    similarity_ivf_topk,
    similarity_lsh_topk,
)


@pytest.fixture(scope="module")
def baseline_pairs(spark, sf_dir):
    return {
        (r["query_id"], r["vec_id"])
        for r in similarity_bruteforce_topk(spark, sf_dir).collect()
    }


def _recall(df, baseline):
    got = {(r["query_id"], r["vec_id"]) for r in df.collect()}
    return len(got & baseline) / len(baseline)


def test_lsh_recall(spark, sf_dir, baseline_pairs):
    # Measured 0.775 at sf0.01 with 4 bits x 8 tables; floor leaves head-
    # room for data-dependent variation without tolerating a broken index.
    assert _recall(similarity_lsh_topk(spark, sf_dir), baseline_pairs) >= 0.6


def test_ivf_recall(spark, sf_dir, baseline_pairs):
    # Measured 0.675 at sf0.01 with nprobe=4 of 10 cells.
    assert _recall(similarity_ivf_topk(spark, sf_dir), baseline_pairs) >= 0.5


def test_approx_results_subset_of_exact_scores(spark, sf_dir):
    """Approximate top-k sims can never exceed the exact top-1 sim for the
    same query (candidates are a subset of the corpus)."""
    exact_best = {
        r["query_id"]: r["sim"]
        for r in similarity_bruteforce_topk(spark, sf_dir)
        .where("rank = 1")
        .collect()
    }
    for r in similarity_ivf_topk(spark, sf_dir).collect():
        assert r["sim"] <= exact_best[r["query_id"]]
