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


def test_kmeans_assignment_invariants(spark, sf_dir):
    from data_pipeline__s3_to_postgres_s3_spark.operators.similarity import (
        KMEANS_K,
        embedding_kmeans,
    )

    rows = embedding_kmeans(spark, sf_dir).collect()
    emb_count = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert len(rows) == emb_count  # every vector assigned exactly once
    clusters = {r["cluster"] for r in rows}
    assert clusters <= set(range(KMEANS_K))
    assert len(clusters) > 1  # the corpus doesn't collapse to one cell
    assert all(r["d2"] >= 0 for r in rows)


def test_kmeans_iterations_do_not_increase_inertia(spark, sf_dir):
    """Lloyd's guarantee: total within-cluster d2 after the iterated
    centroids <= inertia of the raw seed assignment."""
    from pyspark.sql import functions as F

    from data_pipeline__s3_to_postgres_s3_spark.catalog import load_table
    from data_pipeline__s3_to_postgres_s3_spark.operators.similarity import (
        KMEANS_K,
        _dist_structs,
        _inline_centroids,
        embedding_kmeans,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    seed_rows = (
        emb.where(F.col("vec_id") < KMEANS_K)
        .select(
            F.col("vec_id").alias("cell"),
            F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias(
                "centroid"
            ),
        )
        .collect()
    )
    nearest = F.array_min(_dist_structs(_inline_centroids(seed_rows, "bigint")))
    seed_inertia = (
        emb.select(nearest["d2"].alias("d2")).agg(F.sum("d2")).collect()[0][0]
    )
    final_inertia = (
        embedding_kmeans(spark, sf_dir).agg(F.sum("d2")).collect()[0][0]
    )
    assert final_inertia <= seed_inertia
