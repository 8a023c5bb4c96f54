"""incremental_dedup_bloom semantic pins (operators/dedup.py).

The sf0.01 corpus has no cross-boundary exact duplicates (the oracle
gate sees 0 vs 0), so the real semantics — boundary placement, canonical
election, copy counting, and the no-false-negative guarantee that makes
the bloom-prefiltered result equal exact dedup — are pinned on synthetic
corpora here.
"""

from __future__ import annotations

from data_pipeline__s3_to_postgres_s3_spark import plans
from data_pipeline__s3_to_postgres_s3_spark.operators.dedup import (
    BLOOM_NUM_BITS,
    incremental_dedup_bloom,
)


def _write_docs(spark, tmp_path, rows) -> str:
    spark.createDataFrame(rows, "doc_id bigint, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_cross_boundary_dups_found_with_canonical_and_counts(spark, tmp_path):
    # max doc_id 100 → boundary at 90: corpus = [.. <90], new = [>= 90].
    rows = [
        (1, "shared text alpha"),
        (2, "shared text alpha"),   # two corpus copies of alpha
        (3, "corpus only beta"),
        (50, "shared text gamma"),
        (90, "shared text alpha"),  # new: dup of 1 and 2
        (95, "shared text gamma"),  # new: dup of 50
        (96, "brand new delta"),    # new: no corpus twin
        (100, "corpus only beta"),  # new: dup of 3
    ]
    sf = _write_docs(spark, tmp_path, rows)
    got = {
        r["new_doc_id"]: r for r in incremental_dedup_bloom(spark, sf).collect()
    }
    assert set(got) == {90, 95, 100}
    assert got[90]["canonical_corpus_doc_id"] == 1
    assert got[90]["n_corpus_copies"] == 2
    assert got[95]["canonical_corpus_doc_id"] == 50
    assert got[95]["n_corpus_copies"] == 1
    assert got[100]["canonical_corpus_doc_id"] == 3


def test_bloom_result_equals_bruteforce_exact_dedup(spark, tmp_path):
    """No false negatives: on a corpus large enough for bloom collisions
    to be plausible, the bloom-prefiltered result must equal a
    brute-force exact computation."""
    rows = [(i, f"unique doc body {i % 700}") for i in range(1, 1001)]
    sf = _write_docs(spark, tmp_path, rows)
    got = sorted(
        tuple(r) for r in incremental_dedup_bloom(spark, sf).collect()
    )
    # Brute force in Python: boundary 900; text collides when i%700 ties.
    thr = (1000 * 9) // 10
    corpus = {}
    for i in range(1, thr):
        corpus.setdefault(i % 700, []).append(i)
    want = []
    for i in range(thr, 1001):
        twins = corpus.get(i % 700, [])
        if twins:
            want.append((i, min(twins), len(twins)))
    assert got == sorted(want)


def test_bloom_plan_shape(spark, sf_dir):
    """Filter state is bounded (≤ bits/64 packed longs) and broadcast;
    no cartesian product; exchange count bounded."""
    df = incremental_dedup_bloom(spark, sf_dir)
    assert BLOOM_NUM_BITS // 64 == 16384
    assert plans.broadcast_join_count(df) >= 1
    assert plans.exchange_count(df) <= 5
    assert "Cartesian" not in plans.simple_plan(df)


# ---------------------------------------------------------------------------
# bloom_vocab_novelty — the meaningful-row twin driving the shared Bloom
# build/probe/verify helpers through genuine hits AND misses (the sf
# corpora have word-level overlap across the increment boundary even
# though full texts never collide).
from data_pipeline__s3_to_postgres_s3_spark.operators.dedup import (  # noqa: E402
    bloom_vocab_novelty,
)


def test_vocab_novelty_counts_planted(spark, tmp_path):
    # max doc_id 100 → boundary 90: corpus = {<90}, new = {>=90}.
    rows = [
        (1, "alpha beta gamma"),
        (2, "beta delta"),
        (89, "epsilon"),
        (90, "alpha zeta zeta"),      # seen: alpha; novel: zeta (distinct!)
        (95, "beta epsilon delta"),   # all seen
        (96, "omega psi"),            # all novel
        (100, None),                  # NULL text → no tokens → no row
    ]
    sf = _write_docs(spark, tmp_path, rows)
    got = {r["new_doc_id"]: r for r in bloom_vocab_novelty(spark, sf).collect()}
    assert set(got) == {90, 95, 96}
    assert (got[90]["n_distinct_tokens"], got[90]["n_seen_tokens"],
            got[90]["n_novel_tokens"]) == (2, 1, 1)
    assert (got[95]["n_distinct_tokens"], got[95]["n_seen_tokens"],
            got[95]["n_novel_tokens"]) == (3, 3, 0)
    assert (got[96]["n_distinct_tokens"], got[96]["n_seen_tokens"],
            got[96]["n_novel_tokens"]) == (2, 0, 2)


def test_vocab_novelty_equals_bruteforce(spark, tmp_path):
    """No false negatives + exact verification of bloom hits ⇒ the
    result equals a plain Python set computation, even on a vocabulary
    large enough for bloom collisions to be plausible."""
    rows = [
        (i, " ".join(f"w{(i * 7 + j) % 1500}" for j in range(12)))
        for i in range(1, 501)
    ]
    sf = _write_docs(spark, tmp_path, rows)
    got = sorted(tuple(r) for r in bloom_vocab_novelty(spark, sf).collect())
    thr = (500 * 9) // 10
    corpus_vocab = set()
    for i, text in rows:
        if i < thr:
            corpus_vocab |= set(text.split(" "))
    want = []
    for i, text in rows:
        if i >= thr:
            toks = set(text.split(" "))
            seen = len(toks & corpus_vocab)
            want.append((i, len(toks), seen, len(toks) - seen))
    assert got == sorted(want)


def test_vocab_novelty_plan_shape(spark, sf_dir):
    df = bloom_vocab_novelty(spark, sf_dir)
    assert plans.broadcast_join_count(df) >= 1
    assert "Cartesian" not in plans.simple_plan(df)
