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
    # Round 14 (r13 VERDICT #2 — conservative rotation, 2 swaps in the
    # ≤6 budget): the stacked-segment manifest and the drift-TRIGGERED
    # compaction go straight into the window (headline-op precedent),
    # swapped against ann_index_build and ann_index_topk — both
    # hash-green r11+r12+r13; the build-manifest machinery stays
    # driver-hashed via the in-window ann_compact_rebuild (its oracle
    # IS the full-scope build retraining + retirement split) and the
    # artifact serve plan via the in-window ann_index_topk_segments
    # (shares _ann_serve_topk verbatim). Prior rounds' rotations are
    # recorded in git history of this file and the committed
    # CORRECTNESS_r*.json (round 11 rotated ann_index_build /
    # ann_index_topk / key_uniqueness_report / repair_documents_reingest
    # in — see the r11 version of this set).
    "ann_segment_stack_report",
    "ann_compact_if_drifted",
    # Round-14 second pair (4 swaps total, still ≤6): the schema-drift
    # round's detection gate and its ANALYZE twin go straight into the
    # window, swapped against key_uniqueness_report and
    # repair_documents_reingest — both hash-green r11+r12+r13, both
    # machinery-pinned by test_duplicate_key_robustness.py's
    # planted-corpus oracle-differential tests every pytest run.
    "schema_snapshot_report",
    "table_column_stats",
    # Round-14 third pair (6 swaps total, the full ≤6 budget): the
    # join-key skew census (the salting/AQE-remediation trigger) and
    # the partition-stats merge rollup go straight in, swapped against
    # referential_integrity_report (hash-green r9–r13; shares
    # FK_RELATIONSHIPS + the per-relationship groupBy shape with
    # join_skew_report, orphan semantics pinned by
    # test_referential_integrity.py) and zorder_skip_estimate
    # (hash-green r8–r13; Morton/file-skip machinery pinned by
    # test_layout.py).
    "join_skew_report",
    "partition_stats_rollup",
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
# verification (the r8 report-twin precedent). The set ended round 9
# with ONE member: similarity_pq_topk (registered last, window already
# at 20 first-timers).
# Round 10: similarity_pq_topk rotated into the window (ROTATED_IN);
# the two round-10 additions (ivf_pq_topk, pq_recall_report) went
# straight into the window — the set is EMPTY.
TAIL_GRACE_NEW_THIS_ROUND: set[str] = set()
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
    # r10 ADVICE (medium): the old "CORRECTNESS_r0*.json" glob stopped
    # matching at round 10 — widened so r10+ driver history counts.
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
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
