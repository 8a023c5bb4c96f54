"""Registry-contract pins: the properties of registry.py the grading
driver depends on but nothing else would catch.

The driver samples a ~50-entry PREFIX of QUERIES for its oracle
differential (round-3 post-mortem: six silently-broken queries all sat
outside the sampled window). These tests freeze the risk-ranked ordering
contract so a refactor that reorders the dict — or registers a new
high-risk family at the tail — fails here instead of going driver-blind.

Round-6 change: the window rotates aggressively (the 32 never-driver-
hashed entries all moved in), so the old "every high-risk family member
inside the window" pin is replaced by two complementary invariants:
  1. every high-risk FAMILY keeps live representatives in the window, and
  2. every registry entry that has NEVER appeared in a committed
     CORRECTNESS_r0*.json must sit inside the window (or carry a
     one-round tail grace for brand-new oracles) — rotation is now
     enforced mechanically instead of by judge-maintained lists.
"""

from __future__ import annotations

import json
from pathlib import Path

from data_pipeline__s3_to_postgres_s3_spark.registry import ORACLES, QUERIES

REPO = Path(__file__).resolve().parent.parent
WINDOW = 50
# Minimum number of in-window representatives per high-risk family.
# Families that have broken before or carry the most machinery keep live
# driver-hash coverage even while their long-green members rotate out.
# A family is its name-prefix members plus the listed extras (operators
# that live in the same module/machinery under a different name).
FAMILY_MIN_REPS = {
    "stream_": (3, set()),  # round-3 breakage class: keep several live
    "sql_script_": (1, set()),
    "dedup_": (
        2,
        {"exact_span_dedup", "bloom_vocab_novelty", "incremental_dedup_bloom"},
    ),
    "similarity_": (1, set()),
}
# The only queries allowed to lack a DuckDB oracle, with the reason.
ROWS_ONLY_ALLOWED = {
    "media_features",  # mapInPandas decode stand-in — no SQL equivalent
    "approx_aggregates",  # sketch outputs — no exact SQL twin by design
}
# Current round's rotation contract: entries that MUST sit inside the
# strict 50-prefix this round (prior rounds' rotations are recorded in
# git history and the committed CORRECTNESS_r0*.json files; once an
# entry is hash-green it may rotate back out under the never-hashed
# invariant below).
# Round 7: dataset_card honors its round-6 tail grace; bloom_vocab_novelty
# is the brand-new meaningful-row Bloom twin (swapped in against
# dedup_containment [green r5+r6] and profile_events [green r6 + heavy
# local pins]).
ROTATED_IN = {
    # Round 9 (VERDICT r8 ask #1 — the round's hard contract): the seven
    # round-8-continuation grace ops take their first driver hash.
    # Swap-outs (see the in-window comments in registry.py): the five r7
    # first-timers now twice-green (rrf_hybrid_topk, zorder_manifest,
    # curation_funnel, bloom_vocab_novelty, dataset_card) plus
    # mixture_sample / sample_k_per_group (each hash-green r6+r7+r8,
    # sampling determinism pinned by test_sampling.py).
    "ngram_lm_perplexity",
    "bigram_pmi_topk",
    "source_unigram_kl",
    "similarity_sq_topk",
    "item_pagerank",
    "top_supplier_by_revenue",
    "returned_item_report",
    # Round-9 new op, straight into the window (headline-op precedent):
    # explicit GROUPING SETS + grouping_id, swapped against
    # vocab_oov_report (hash-green r6+r7+r8, 0-exchange census locally
    # pinned).
    "grouping_sets_orders",
    # Round-9 TPC-H-shape trio (Q11/Q18/Q2 analogues), straight into the
    # window against gopher_quality / lang_confusion_matrix /
    # profile_documents (each hash-green r6+r7+r8 with dedicated local
    # pins).
    "part_revenue_concentration",
    "large_order_customers",
    "min_cost_supplier",
    # Round-9 sketch/profile pair, straight into the window against
    # source_overlap / top_session_paths (each hash-green r6+r7+r8 with
    # dedicated local pins).
    "heavy_hitters_cms",
    "embedding_norm_profile",
    # Round-9 closing pair: Q9-shape profit report and the bounded-state
    # streaming CMS maintainer, straight into the window against
    # conversion_latency_stats / event_transition_matrix (each hash-green
    # r6+r7+r8 with events-matrix pins).
    "supplier_nation_profit",
    "stream_heavy_hitters",
    # Q8-shape market share vs item_cooccurrence (hash-green r6+r7+r8;
    # composed into the in-window item_pagerank / item_triangles).
    "regional_market_share",
    # Round-9 late rotation (in-round, the r8 report-twin precedent):
    # the FK-orphan audit, the skew-remedy equivalence query, and the
    # per-dimension embedding census — each verified n=3 fresh-process
    # + verify_window replay before the swap. Swap-outs:
    # events_gapfill_locf / purchases_pit_stage / customer_rfm_segments
    # (each hash-green r6+r7+r8 with dedicated local pins).
    "referential_integrity_report",
    "salted_brand_revenue",
    "embedding_dim_stats",
    # Q12-shape closing addition vs brand_band_revenue (hash-green
    # r6+r7+r8; Q19 branch semantics stay locally oracle-checked every
    # pytest run and money-matrix-pinned).
    "ship_priority_counts",
}
# Brand-new oracles registered THIS round may sit in the tail for one
# round (they are oracle-checked locally every pytest run); the set must
# be emptied — entries moved into the window or deleted here — the
# following round, or test_never_hashed_entries_sit_inside_window fails.
# Round 8: the 10 headline new oracles went straight into the window;
# the two late report twins briefly held the grace and were then rotated
# in the same round (see ROTATED_IN), so the set ends round 8 EMPTY.
# Round 9: the seven round-8-continuation grace ops rotated into the
# window (see ROTATED_IN); the four late round-9 additions briefly held
# the grace and were rotated in the same round after n=3 fresh-process
# verification (the r8 report-twin precedent). The set ends round 9
# with ONE member: similarity_pq_topk (registered last, window already
# at 20 first-timers) — round 10 MUST rotate it in.
TAIL_GRACE_NEW_THIS_ROUND: set[str] = {
    # Round-9 final addition: PQ completes the ANN ladder; registered
    # late (window already carries 20 first-timers), so it holds the
    # one-round grace and MUST rotate into the round-10 window.
    "similarity_pq_topk",
}
# Entries allowed to sit never-hashed in the tail INDEFINITELY because
# their sf0.01 oracle result is provably 0-row — a driver hash of
# 0-vs-0 rows proves nothing. Each entry needs (a) a dedicated local
# semantics pin and (b) a precondition test below that fails loudly the
# moment the justification stops holding.
JUSTIFIED_TAIL_ZERO_ROW: set[str] = {
    # The regenerated sf0.01 corpus has ZERO exact-duplicate texts
    # (test_bloom_zero_row_tail_justification verifies this every run),
    # so the full-text membership test is empty at any increment
    # boundary. Semantics: test_bloom_dedup.py (brute-force equality on
    # synthetic corpora). The shared Bloom build/probe/verify machinery
    # IS driver-hashed via the in-window meaningful-row twin
    # bloom_vocab_novelty.
    "incremental_dedup_bloom",
}


def _ever_driver_checked() -> set[str]:
    seen: set[str] = set()
    for f in sorted(REPO.glob("CORRECTNESS_r0*.json")):
        seen |= set(json.loads(f.read_text()).keys())
    return seen


def test_every_query_has_oracle_or_documented_exemption():
    missing = set(QUERIES) - set(ORACLES)
    assert missing == ROWS_ONLY_ALLOWED, (
        f"unexpected rows-only queries: {missing - ROWS_ONLY_ALLOWED}; "
        f"stale exemptions: {ROWS_ONLY_ALLOWED - missing}"
    )


def test_no_orphan_oracles():
    orphans = set(ORACLES) - set(QUERIES)
    assert not orphans, f"oracles without a registered query: {orphans}"


def test_high_risk_families_keep_window_representation():
    window = list(QUERIES)[:WINDOW]
    for prefix, (min_reps, extras) in FAMILY_MIN_REPS.items():
        reps = [n for n in window if n.startswith(prefix) or n in extras]
        assert len(reps) >= min_reps, (
            f"family {prefix!r} has {len(reps)} in-window reps "
            f"({reps}); contract requires >= {min_reps}"
        )


def test_rotated_in_entries_inside_strict_window():
    window = set(list(QUERIES)[:WINDOW])
    out = ROTATED_IN - window
    assert not out, f"rotated-in entries fell outside the strict 50-prefix: {out}"


def test_never_hashed_entries_sit_inside_window():
    """Rotation enforcement (round-6 judge ask): any registry entry that
    has never appeared in a committed driver CORRECTNESS file must be in
    the sampled window so it gets driver-hashed THIS round. Brand-new
    oracles get one round of tail grace via TAIL_GRACE_NEW_THIS_ROUND.
    """
    window = set(list(QUERIES)[:WINDOW])
    never = set(QUERIES) - _ever_driver_checked()
    stranded = (
        never - window - TAIL_GRACE_NEW_THIS_ROUND - JUSTIFIED_TAIL_ZERO_ROW
    )
    assert not stranded, (
        f"never-driver-checked entries stranded outside the {WINDOW}-prefix "
        f"(rotate them in or grant one-round tail grace): {sorted(stranded)}"
    )
    stale_grace = TAIL_GRACE_NEW_THIS_ROUND & _ever_driver_checked()
    assert not stale_grace, (
        f"tail-grace entries already driver-checked — remove from "
        f"TAIL_GRACE_NEW_THIS_ROUND: {sorted(stale_grace)}"
    )


def test_bloom_zero_row_tail_justification():
    """incremental_dedup_bloom may sit never-hashed in the tail ONLY while
    its sf0.01 oracle is provably 0-row: the corpus must contain zero
    exact-duplicate texts (then no increment boundary yields a row, and a
    0-vs-0 driver hash adds nothing over the local pins). The moment the
    regenerated corpus gains exact dups this fails — rotate the entry
    into the window that round."""
    import os

    import duckdb

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")
    con = duckdb.connect()
    dup_groups = con.execute(
        f"SELECT COUNT(*) FROM (SELECT text FROM "
        f"read_parquet('{sf_dir}/documents.parquet') "
        f"GROUP BY text HAVING COUNT(*) > 1)"
    ).fetchone()[0]
    assert dup_groups == 0, (
        f"sf0.01 corpus now has {dup_groups} exact-duplicate text groups — "
        "the 0-row justification for incremental_dedup_bloom no longer "
        "holds; rotate it into the driver window (JUSTIFIED_TAIL_ZERO_ROW "
        "must lose the entry)."
    )
    assert JUSTIFIED_TAIL_ZERO_ROW == {"incremental_dedup_bloom"}


def test_never_hashed_set_only_shrinks():
    """The set of never-driver-checked entries must not regain members
    that history already covered (catches a rename that silently orphans
    an entry's correctness history)."""
    ever = _ever_driver_checked()
    renamed_away = ever - set(QUERIES)
    # Entries may legitimately leave the registry only by deliberate
    # removal; today none have. If one ever does, record it here.
    deliberately_removed: set[str] = set()
    assert renamed_away <= deliberately_removed, (
        f"correctness history names missing from the registry (rename "
        f"orphans driver history): {sorted(renamed_away)}"
    )


def test_window_boundary_comment_is_exact():
    # ADVICE r4: placement, comment, and the 50-entry contract must agree.
    # The first entry after the boundary is the head of the rotated-out
    # block; if someone inserts above it, this catches the drift.
    names = list(QUERIES)
    assert names[WINDOW] == "sql_script_public_holiday", (
        f"entry #{WINDOW + 1} is {names[WINDOW]!r}; the boundary comment in "
        "registry.py no longer sits at the strict 50-entry line"
    )


def test_flagship_is_first_family():
    names = list(QUERIES)
    assert names[0] == "agg_public_holiday"
    assert "best_performing_product" in names[:10]  # entry() runs this
