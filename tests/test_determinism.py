"""Run-to-run determinism for tie-break-prone queries (SURVEY.md quirk Q5).

The reference's ROW_NUMBER and LIMIT 1 winners are nondeterministic; this
engine pins trailing sort keys everywhere. Each query here runs twice in
the same session — task scheduling, partial-agg combine order, and AQE
re-planning all vary between runs, so any unpinned tie-break or
order-dependent float accumulation shows up as a diff."""

from __future__ import annotations

import pytest

from data_pipeline__s3_to_postgres_s3_spark.registry import QUERIES

PRONE = [
    "most_ordered_product_date",  # ROW_NUMBER over grouped counts
    "best_performing_product",    # 5-key sort + LIMIT 1
    "top_revenue_customers_per_region",  # rank with revenue ties
    "dedup_simhash",              # bucket pair expansion order
    "similarity_ivf_topk",        # centroid AVG accumulation order
    "bm25_topk",                  # summed per-term scores + rank window
    "embedding_kmeans",           # per-round centroid AVG accumulation
    "stratified_sample",          # per-stratum rank cut at the quota
    "winnow_dup_candidates",      # pair counts over the fingerprint join
    "dedup_containment",          # DF-capped posting pair expansion
    "semantic_dedup",             # within-cluster cosine fold + drop set
    "temperature_resample",       # per-source rank cut at integer quota
    "customer_rfm_segments",      # three ntile windows with tied metrics
    "weighted_sample_tokens",     # top-K cut on divided priorities
    "events_ohlc",                # min_by/max_by under ts ties
    "item_triangles",             # wedge join + corner explode order
    "bigram_pmi_topk",            # quantized-PMI LIMIT cut under ties
    "similarity_sq_topk",         # ADC rank window on rounded sims
]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", PRONE)
def test_query_deterministic_across_runs(spark, sf_dir, name):
    first = _rows(QUERIES[name](spark, sf_dir))
    second = _rows(QUERIES[name](spark, sf_dir))
    assert first == second


def test_vocab_census_tie_break_deterministic(spark, tmp_path):
    """Tokens tied at the vocab boundary resolve by token ASC — two builds
    over a tie-heavy corpus must produce identical vocabularies (ratios
    equal run-to-run)."""
    from data_pipeline__s3_to_postgres_s3_spark.operators.textops import (
        vocab_oov_report,
    )

    # 80 distinct tokens, ALL with equal frequency → the top-64 cut is
    # decided purely by the tie-break.
    rows = [(i, " ".join(f"t{j:02d}" for j in range(80))) for i in range(5)]
    spark.createDataFrame(rows, "doc_id bigint, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    a = sorted(tuple(r) for r in vocab_oov_report(spark, str(tmp_path)).collect())
    b = sorted(tuple(r) for r in vocab_oov_report(spark, str(tmp_path)).collect())
    assert a == b
    # tokens t64..t79 are OOV for every doc: 16/80 exactly.
    assert all(r[2] == 16 and r[3] == 0.2 for r in a)


def test_customer_nation_value_rank_window_semantics(spark, sf_dir):
    """percent_rank/cume_dist bounds + the last_value frame trap: with
    the UNBOUNDED-to-UNBOUNDED frame, nation_bottom equals the nation's
    true minimum for EVERY row (the default RANGE frame would echo the
    current row's value instead)."""
    from collections import defaultdict

    from data_pipeline__s3_to_postgres_s3_spark.operators.windows import (
        customer_nation_value_rank,
    )

    rows = customer_nation_value_rank(spark, sf_dir).collect()
    by_nation = defaultdict(list)
    for r in rows:
        by_nation[r["nation"]].append(r)
    for nation, rs in by_nation.items():
        revs = [r["revenue_cents"] for r in rs]
        top, bottom = max(revs), min(revs)
        for r in rs:
            assert r["nation_top_cents"] == top
            assert r["nation_bottom_cents"] == bottom
            assert 0.0 <= r["pct_rank"] <= 1.0
            assert 0.0 < r["cume_frac"] <= 1.0
        # Exactly one rank-0 row (the top customer) per nation.
        assert sum(1 for r in rs if r["pct_rank"] == 0.0) == 1
