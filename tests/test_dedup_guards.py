"""Adversarial-corpus tests for the dedup candidate-explosion guards.

Low-entropy corpora (tiny shared vocabulary, boilerplate phrases) are the
failure mode for banded dedup at scale: every doc lands in one band bucket
and candidate expansion goes quadratic in a single task / single array row.
These tests pin the round-2 guards:

- dedup_simhash: buckets over `bucket_cap` are sub-banded with extra
  signature nibbles, and still-huge sub-buckets expand via a distributed
  self-join (no giant collect_list row). Nothing is dropped — identical
  signatures legitimately produce quadratic OUTPUT — and the DuckDB oracle
  (oracles.llmops.dedup_simhash_sql) mirrors the sub-band semantics, so
  results stay hash-identical when the cap binds.
- dedup_ngram_jaccard: posting lists longer than `df_cap` are pruned from
  the intersection index before pair expansion, with Observation metrics
  so the prune is visible; the oracle (dedup_ngram_jaccard_sql) prunes
  identically.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from data_pipeline__s3_to_postgres_s3_spark.operators.dedup import (
    dedup_ngram_jaccard,
    dedup_simhash,
    ngram_df_report,
    simhash_bucket_report,
)
from data_pipeline__s3_to_postgres_s3_spark.oracles.llmops import (
    dedup_ngram_jaccard_sql,
    dedup_simhash_sql,
)
from tests.oracle_harness import compare

VOCAB = [f"w{i:03d}" for i in range(60)]


def _write_documents(spark, tmp_path, rows):
    path = str(tmp_path / "documents.parquet")
    spark.createDataFrame(
        [(int(i), "en", t) for i, t in rows], "doc_id long, lang string, text string"
    ).write.mode("overwrite").parquet(path)
    return str(tmp_path)


def _docs_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # Spark writes documents.parquet as a DIRECTORY of part files.
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    return con


@pytest.fixture(scope="module")
def low_entropy_dir(spark, tmp_path_factory):
    """300 docs, ALL with the identical token set (shuffled order). SimHash
    depends only on the distinct-token set, so every signature is identical
    — the worst case: one bucket holds the whole corpus."""
    rows = []
    for i in range(300):
        words = VOCAB[:]
        random.Random(i).shuffle(words)
        rows.append((i, " ".join(words)))
    return _write_documents(spark, tmp_path_factory.mktemp("lowent"), rows)


@pytest.fixture(scope="module")
def mixed_dir(spark, tmp_path_factory):
    """A 24-doc near-dup cluster (shared 40-word vocab + 2 unique words per
    doc) plus 30 diverse docs — oversized AND small buckets in one corpus,
    so both expansion tiers and the sub-band key logic all execute."""
    rows = []
    base = VOCAB[:40]
    for i in range(24):
        words = base + [f"u{i}a", f"u{i}b"]
        random.Random(100 + i).shuffle(words)
        rows.append((i, " ".join(words)))
    for i in range(24, 54):
        rng = random.Random(200 + i)
        words = [f"x{i}_{j}" for j in range(20)] + rng.sample(VOCAB, 5)
        rng.shuffle(words)
        rows.append((i, " ".join(words)))
    return _write_documents(spark, tmp_path_factory.mktemp("mixed"), rows)


def test_simhash_low_entropy_completes_and_is_exhaustive(spark, low_entropy_dir):
    """All 300 identical signatures → every bucket oversized, sub-banding
    cannot split (extra nibbles identical too) → the distributed-join tier
    carries the whole corpus. Output must still be EXACT: all C(300,2)
    Hamming-0 pairs, with the fallback visible in the observation."""
    df = dedup_simhash(spark, low_entropy_dir, bucket_cap=16)
    n = df.count()
    assert n == 300 * 299 // 2
    # 4 band entries per doc, all routed to the fallback join.
    audit = simhash_bucket_report(spark, low_entropy_dir, bucket_cap=16).collect()[0]
    assert audit.fallback_entries == 300 * 4
    assert audit.oversized_buckets == 4


def test_simhash_subband_matches_oracle_when_cap_binds(spark, mixed_dir):
    """With a cap the 24-doc cluster exceeds, the Spark plan and the DuckDB
    replica must still agree row-for-row — the sub-band rule is part of the
    operator's semantics, not an execution detail."""
    df = dedup_simhash(spark, mixed_dir, bucket_cap=8)
    report = compare(df, _docs_connection(mixed_dir), dedup_simhash_sql(bucket_cap=8))
    assert report["ok"], report


def test_simhash_default_cap_inactive_at_test_scale(spark, mixed_dir):
    """With the cap far above every bucket, results equal the un-sub-banded
    oracle — i.e. the guard is a no-op until it is needed."""
    df = dedup_simhash(spark, mixed_dir, bucket_cap=10_000)
    report = compare(
        df, _docs_connection(mixed_dir), dedup_simhash_sql(bucket_cap=10_000)
    )
    assert report["ok"], report
    audit = simhash_bucket_report(spark, mixed_dir, bucket_cap=10_000).collect()[0]
    assert audit.oversized_buckets == 0


def test_jaccard_df_cap_parity_and_observability(spark, tmp_path):
    """One boilerplate phrase shared by ALL docs (DF = 60 > cap=10) must be
    pruned — visibly — while a true near-dup pair held together by
    low-DF shingles survives, and Spark matches the capped oracle."""
    boiler = "common header phrase shared by every single document here"
    rows = []
    for i in range(58):
        uniq = " ".join(f"t{i}_{j}" for j in range(15))
        rows.append((i, f"{boiler} {uniq}"))
    near = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    rows.append((100, near + "ending one"))
    rows.append((101, near + "ending one"))  # exact twin → jaccard 1.0
    sf = _write_documents(spark, tmp_path, rows)

    df = dedup_ngram_jaccard(spark, sf, df_cap=10)
    report = compare(df, _docs_connection(sf), dedup_ngram_jaccard_sql(df_cap=10))
    assert report["ok"], report
    pairs = {(r.doc_a, r.doc_b) for r in df.collect()}
    assert (100, 101) in pairs
    audit = ngram_df_report(spark, sf, df_cap=10).collect()[0]
    assert audit.dropped_shingles > 0
    assert audit.dropped_postings >= 58


def test_jaccard_low_entropy_completes(spark, tmp_path):
    """Identical-TEXT corpus (shingle order matters for n-grams, unlike
    simhash): every shingle's posting list exceeds the cap, the whole index
    is pruned, and the query completes with zero pairs (exact duplicates
    are dedup_exact's job) instead of expanding 300²/2 candidates per
    shingle."""
    text = " ".join(VOCAB)
    sf = _write_documents(spark, tmp_path, [(i, text) for i in range(300)])
    df = dedup_ngram_jaccard(spark, sf, df_cap=16)
    assert df.count() == 0
    audit = ngram_df_report(spark, sf, df_cap=16).collect()[0]
    assert audit.dropped_shingles > 0
    assert audit.max_df == 300


def test_prefix_filter_is_lossless_vs_inverted_index(spark, sf_dir):
    """The PPJoin prefix-filter theorem in CI: dedup_jaccard_prefix must
    return EXACTLY dedup_ngram_jaccard's pairs wherever the DF cap is
    inactive (it is at sf0.01 — max df ≈ 25 « 256). A lost pair here
    means the prefix-length arithmetic or the global shingle order
    regressed; an extra pair means verification loosened."""
    from data_pipeline__s3_to_postgres_s3_spark.operators.dedup import (
        dedup_jaccard_prefix,
        dedup_ngram_jaccard,
    )

    a = sorted(map(tuple, dedup_jaccard_prefix(spark, sf_dir).collect()))
    b = sorted(map(tuple, dedup_ngram_jaccard(spark, sf_dir).collect()))
    assert a == b
    assert len(a) > 0


def test_ceil_threshold_mult_exact_arithmetic(spark):
    """ADVICE r4: IEEE ceil(t*n) over-counts when t*n is a true integer
    (0.3*10 -> 3.0000000000000004 -> ceil 4), shortening the prefix and
    silently losing pairs. Pin the rational-arithmetic bound against
    Python's exact Fraction math over a threshold x n grid that includes
    every integer-product hazard."""
    from fractions import Fraction

    from data_pipeline__s3_to_postgres_s3_spark.operators.dedup import (
        _ceil_threshold_mult,
    )

    ns = list(range(1, 41))
    ndf = spark.createDataFrame([(n,) for n in ns], "n long")
    for t in (0.3, 0.5, 0.7, 0.8, 0.25, 0.75, 0.9, 0.6, 0.1):
        frac = Fraction(t).limit_denominator(1_000_000)
        got = {
            r.n: r.c
            for r in ndf.select(
                "n", _ceil_threshold_mult(t).alias("c")
            ).collect()
        }
        for n in ns:
            want = -((-frac.numerator * n) // frac.denominator)  # exact ceil
            assert got[n] == want, f"t={t} n={n}: {got[n]} != {want}"


def test_jaccard_auto_facade_both_branches(spark, sf_small):
    """The size-dispatch facade must produce the SAME exact pair set from
    either branch (lossless equivalence is pinned separately at sf0.01);
    forcing the budget to each extreme exercises both code paths, and the
    factored decision rule is pinned directly."""
    from data_pipeline__s3_to_postgres_s3_spark.operators.dedup import (
        _jaccard_variant,
        dedup_jaccard,
    )

    assert _jaccard_variant(None, 100) == "inverted"  # empty corpus
    assert _jaccard_variant(99, 100) == "inverted"
    assert _jaccard_variant(101, 100) == "prefix"

    via_inverted = sorted(
        map(tuple, dedup_jaccard(spark, sf_small, expansion_budget=10**18).collect())
    )
    via_prefix = sorted(
        map(tuple, dedup_jaccard(spark, sf_small, expansion_budget=0).collect())
    )
    assert via_inverted == via_prefix


def test_incremental_dedup_is_cross_boundary_slice_of_lsh(spark, sf_dir):
    """One-sided semantics, exactly: incremental_dedup_minhash must equal
    dedup_minhash_lsh's pair set restricted to pairs straddling the
    increment boundary (doc_a < thr <= doc_b) — same bands, same verify,
    no corpus x corpus or new x new pairs, nothing else lost."""
    from pyspark.sql import functions as F

    from data_pipeline__s3_to_postgres_s3_spark.operators.dedup import (
        INCREMENTAL_NEW_FRAC_DEN,
        INCREMENTAL_NEW_FRAC_NUM,
        dedup_minhash_lsh,
        incremental_dedup_minhash,
    )
    from data_pipeline__s3_to_postgres_s3_spark.catalog import load_table

    m = load_table(spark, sf_dir, "documents").agg(F.max("doc_id")).collect()[0][0]
    thr = (int(m) * INCREMENTAL_NEW_FRAC_NUM) // INCREMENTAL_NEW_FRAC_DEN

    inc = sorted(
        (r.corpus_doc_id, r.new_doc_id, r.jaccard)
        for r in incremental_dedup_minhash(spark, sf_dir).collect()
    )
    full = sorted(
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup_minhash_lsh(spark, sf_dir).collect()
        if r.doc_a < thr <= r.doc_b
    )
    assert inc == full
    for corpus_id, new_id, _ in inc:
        assert corpus_id < thr <= new_id


def test_containment_matches_bruteforce_small(spark, sf_small):
    """Directed containment pairs vs an exact in-Python set computation at
    sf0.001 (DF cap inactive at this scale, so the operator is exact)."""
    from data_pipeline__s3_to_postgres_s3_spark.operators.dedup import (
        CONTAINMENT_THRESHOLD,
        NGRAM_N,
        dedup_containment,
    )

    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_small}/documents.parquet").collect()
    }

    def shingles(t: str) -> set[str]:
        toks = t.split(" ")
        return {
            " ".join(toks[i : i + NGRAM_N])
            for i in range(len(toks) - NGRAM_N + 1)
        }

    sets = {d: s for d, s in ((d, shingles(t)) for d, t in docs.items()) if s}
    expected = set()
    for a, sa in sets.items():
        for b, sb in sets.items():
            if a == b:
                continue
            inter = len(sa & sb)
            if inter and inter / len(sa) >= CONTAINMENT_THRESHOLD:
                expected.add((a, b))
    got = {
        (r["inner_doc"], r["outer_doc"])
        for r in dedup_containment(spark, sf_small).collect()
    }
    assert got == expected


def test_containment_dominates_jaccard_pairs(spark, sf_dir):
    """Containment ≥ Jaccard always (the union dominates either set), so
    every Jaccard-threshold pair must surface in BOTH directions of the
    containment output — the asymmetric operator strictly widens the
    symmetric one at equal-or-lower threshold."""
    from data_pipeline__s3_to_postgres_s3_spark.operators.dedup import (
        CONTAINMENT_THRESHOLD,
        JACCARD_THRESHOLD,
        dedup_containment,
    )

    assert CONTAINMENT_THRESHOLD <= JACCARD_THRESHOLD
    jac = {
        (r["doc_a"], r["doc_b"])
        for r in dedup_ngram_jaccard(spark, sf_dir).collect()
    }
    cont = {
        (r["inner_doc"], r["outer_doc"])
        for r in dedup_containment(spark, sf_dir).collect()
    }
    for a, b in jac:
        assert (a, b) in cont and (b, a) in cont


def test_containment_catches_subset_jaccard_misses(spark, tmp_path):
    """The reason the operator exists: a snippet quoted inside a much
    larger page clears the containment threshold while its Jaccard sits
    far below the resemblance threshold (the big doc inflates the
    union)."""
    from data_pipeline__s3_to_postgres_s3_spark.operators.dedup import (
        CONTAINMENT_THRESHOLD,
        dedup_containment,
    )

    snippet = " ".join(f"s{i}" for i in range(12))
    page = snippet + " " + " ".join(f"p{i}" for i in range(120))
    other = " ".join(f"q{i}" for i in range(30))
    spark.createDataFrame(
        [(1, snippet), (2, page), (3, other)], "doc_id bigint, text string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    jac = {
        (r["doc_a"], r["doc_b"])
        for r in dedup_ngram_jaccard(spark, str(tmp_path)).collect()
    }
    cont = {
        (r["inner_doc"], r["outer_doc"]): r["containment"]
        for r in dedup_containment(spark, str(tmp_path)).collect()
    }
    assert not jac  # resemblance never fires on the subset pair
    assert (1, 2) in cont and cont[(1, 2)] >= CONTAINMENT_THRESHOLD
    assert (2, 1) not in cont  # the big page is NOT contained in the snippet


def test_minhash_estimate_audit_bounds_and_coverage(spark, sf_dir):
    """The audit must cover every LSH candidate pair (superset of the
    thresholded dedup output), and the 16-perm estimator must track exact
    Jaccard: both in [0,1], mean absolute error well under the ~1/4
    standard deviation of a 16-trial binomial."""
    from data_pipeline__s3_to_postgres_s3_spark.operators.dedup import (
        dedup_minhash_lsh,
        minhash_estimate_audit,
    )

    audit = minhash_estimate_audit(spark, sf_dir).collect()
    assert audit
    assert all(0.0 <= r["est_sim"] <= 1.0 for r in audit)
    assert all(0.0 <= r["jaccard"] <= 1.0 for r in audit)
    assert all(abs(r["abs_err"] - abs(r["est_sim"] - r["jaccard"])) < 1e-12
               for r in audit)
    mean_err = sum(r["abs_err"] for r in audit) / len(audit)
    assert mean_err < 0.25, mean_err
    audited = {(r["doc_a"], r["doc_b"]) for r in audit}
    kept = {
        (r["doc_a"], r["doc_b"])
        for r in dedup_minhash_lsh(spark, sf_dir).collect()
    }
    assert kept <= audited


def test_minhash_param_planner_scurve_shape(spark, sf_dir):
    """The S-curve must match the closed form 1-(1-j^r)^b recomputed in
    Python (same fixed-association chains), be monotone nondecreasing,
    and hit the exact endpoints P(0)=0, P(1)=1."""
    from data_pipeline__s3_to_postgres_s3_spark.operators.dedup import (
        MINHASH_BAND_ROWS,
        MINHASH_PERMS,
        minhash_param_planner,
    )

    rows = sorted(
        minhash_param_planner(spark, sf_dir).collect(),
        key=lambda r: r["grid_i"],
    )
    assert len(rows) == 101
    b = MINHASH_PERMS // MINHASH_BAND_ROWS

    def py_curve(i: int) -> float:
        j = i / 100.0
        jr = 1.0
        for _ in range(MINHASH_BAND_ROWS):
            jr = jr * j
        miss = 1.0 - jr
        missb = 1.0
        for _ in range(b):
            missb = missb * miss
        return 1.0 - missb

    for r in rows:
        assert r["p_candidate"] == py_curve(r["grid_i"]), r
    assert rows[0]["p_candidate"] == 0.0
    assert rows[-1]["p_candidate"] == 1.0
    ps = [r["p_candidate"] for r in rows]
    assert all(a <= b2 for a, b2 in zip(ps, ps[1:]))
    # the verify threshold flag flips exactly at JACCARD_THRESHOLD
    flags = [(r["j"], r["above_verify"]) for r in rows]
    assert all(f == (j >= 0.8) for j, f in flags)
