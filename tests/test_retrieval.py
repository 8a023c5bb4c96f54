"""rrf_hybrid_topk semantics (operators/textops.py).

The oracle differential pins cross-engine agreement; these pin the
fusion math itself: channel ranks must be the channel operators' own
ranks, the fused score must equal the closed-form RRF of those ranks,
and the rank column must be a clean per-query 1..k ladder.
"""

from __future__ import annotations

from data_pipeline__s3_to_postgres_s3_spark.operators.textops import (
    BM25_QUERIES,
    RRF_K,
    RRF_TOP_K,
    bm25_topk,
    rrf_hybrid_topk,
)


def test_rrf_score_is_closed_form_of_channel_ranks(spark, sf_dir):
    rows = rrf_hybrid_topk(spark, sf_dir).collect()
    assert rows
    for r in rows:
        want = 0.0
        if r["lex_rank"] > 0:
            want += 1.0 / (RRF_K + r["lex_rank"])
        if r["emb_rank"] > 0:
            want += 1.0 / (RRF_K + r["emb_rank"])
        assert r["rrf_score"] == want, r
        assert r["lex_rank"] > 0 or r["emb_rank"] > 0, r


def test_rrf_rank_ladder_and_query_coverage(spark, sf_dir):
    rows = rrf_hybrid_topk(spark, sf_dir).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(BM25_QUERIES)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, RRF_TOP_K + 1)), q
        # Fused ordering is (score DESC, doc_id ASC).
        for a, b in zip(rs, rs[1:]):
            assert a["rrf_score"] > b["rrf_score"] or (
                a["rrf_score"] == b["rrf_score"] and a["doc_id"] < b["doc_id"]
            )


def test_rrf_lex_ranks_are_bm25_ranks(spark, sf_dir):
    lex = {
        (r["query_id"], r["doc_id"]): r["rank"]
        for r in bm25_topk(spark, sf_dir).collect()
    }
    for r in rrf_hybrid_topk(spark, sf_dir).collect():
        if r["lex_rank"] > 0:
            assert lex[(r["query_id"], r["doc_id"])] == r["lex_rank"], r
