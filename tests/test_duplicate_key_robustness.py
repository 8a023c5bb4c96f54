"""Duplicate/colliding-key axis of the driver robustness matrix
(round 11, VERDICT r10 ask #6): a re-ingested or corrupted feed that
claims the same primary key twice — EXACT duplicate rows (same key,
same payload: the re-ingest class) and CONFLICTING duplicates (same
key, different payload).

What the full-registry probe (185 queries, verify_window --all against
a planted-duplicate sf0.01 corpus) established:

- The similarity family CRASHED outright (a duplicated QUERY vec_id
  gives map_from_entries duplicate keys → DUPLICATED_MAP_KEY) and
  hash-diverged elsewhere. FIXED at the `_embeddings` chokepoint: a
  vec_id claimed by >1 raw row has ambiguous identity and ALL its rows
  drop, mirrored in all 16 oracle validity sites
  (``vec_id NOT IN (… GROUP BY vec_id HAVING COUNT(*) > 1)``). The dup
  set is memoized per corpus file and EMPTY on healthy corpora, so the
  clean-corpus plan gains no filter or join at all.

- 28 of 185 queries diverge on the combined corpus (21 on exact-dups
  alone) — all in the documents/events/orders-keyed rank/dedup/pair
  families. The mechanics are ENGINE-ARBITRARY MULTIPLICITY: e.g.
  returned_item_report aggregates revenue per custkey BEFORE joining
  customer (dup customer rows duplicate the output row) while the SQL
  form aggregates after (dup rows double the revenue) — both are
  faithful readings of the same query over input that violates its PK
  contract, and no per-query mirror can make two engines' arbitrary
  picks agree. The scalable contract is therefore: ENFORCE uniqueness
  at ingest (the reference's S2 quarantine precedent; the dedup family
  is the remediation toolkit) and DETECT violations mechanically —
  `key_uniqueness_report`, the oracle-checked PK-multiplicity census
  this round adds (it also surfaces that the driver's own synthetic
  lineitem does NOT carry a unique (l_orderkey, l_linenumber), which is
  why no query here keys on that pair).
"""

from __future__ import annotations

import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_pipeline__s3_to_postgres_s3_spark.catalog import TABLES
from data_pipeline__s3_to_postgres_s3_spark.registry import ORACLES, QUERIES

from .oracle_harness import compare, duckdb_connection
from .matrix_budget import subset  # noqa: E402

# One representative per similarity sub-family — every one rides the
# _embeddings identity chokepoint (the full family was probe-verified;
# these pin it against regression).
SIMILARITY_REPS = [
    "similarity_bruteforce_topk",
    "similarity_lsh_topk",
    "similarity_pq_topk",
    "ivf_pq_topk",
    "ann_index_build",
    "ann_index_topk",
    "ann_index_topk_segments",
    "ann_segment_stack_report",
    "ann_compact_if_drifted",
    "ann_compact_rebuild",
    "embedding_neardup_pairs",
    "semantic_dedup",
]


def _dup(table: pa.Table, extra_rows: list[dict]) -> pa.Table:
    return pa.Table.from_pylist(table.to_pylist() + extra_rows, schema=table.schema)


@pytest.fixture(scope="module")
def dupkey_dir(sf_small, tmp_path_factory):
    """sf0.01 with planted duplicates: exact dup rows AND conflicting
    duplicates in documents / embeddings / events / orders / customer.
    vec_ids 2 (exact) and 7 (conflicting) are QUERY ids — the crash
    class."""
    d = tmp_path_factory.mktemp("dupkey")
    for t in TABLES:
        shutil.copy(f"{sf_small}/{t}.parquet", str(d / f"{t}.parquet"))

    tb = pq.read_table(f"{sf_small}/embeddings.parquet")
    extra = []
    for r in tb.to_pylist():
        if r["vec_id"] is not None and r["vec_id"] % 13 == 2:
            extra.append(dict(r))  # exact (vec_id 2 is a query)
        if r["vec_id"] is not None and r["vec_id"] % 11 == 7 and r["embedding"]:
            c = dict(r)
            v = list(r["embedding"])
            v[0] = (v[0] or 0.0) + 0.25
            c["embedding"] = v  # conflicting (vec_id 7 is a query)
            extra.append(c)
    pq.write_table(_dup(tb, extra), str(d / "embeddings.parquet"))

    tb = pq.read_table(f"{sf_small}/documents.parquet")
    extra = []
    for r in tb.to_pylist():
        if r["doc_id"] is not None and r["doc_id"] % 17 == 3:
            extra.append(dict(r))
        if r["doc_id"] is not None and r["doc_id"] % 19 == 5 and r["text"]:
            c = dict(r)
            c["text"] = r["text"] + " redux"
            c["n_chars"] = len(c["text"])
            extra.append(c)
    pq.write_table(_dup(tb, extra), str(d / "documents.parquet"))

    tb = pq.read_table(f"{sf_small}/events.parquet")
    extra = []
    for r in tb.to_pylist():
        if r["event_id"] is not None and r["event_id"] % 23 == 4:
            extra.append(dict(r))
        if r["event_id"] is not None and r["event_id"] % 29 == 6:
            c = dict(r)
            c["value"] = (c["value"] or 0.0) + 1.5
            extra.append(c)
    pq.write_table(_dup(tb, extra), str(d / "events.parquet"))

    tb = pq.read_table(f"{sf_small}/orders.parquet")
    extra = [dict(r) for r in tb.to_pylist() if r["o_orderkey"] % 31 == 8]
    pq.write_table(_dup(tb, extra), str(d / "orders.parquet"))

    tb = pq.read_table(f"{sf_small}/customer.parquet")
    extra = []
    for r in tb.to_pylist():
        if r["c_custkey"] % 47 == 1:
            extra.append(dict(r))
        if r["c_custkey"] % 53 == 2:
            c = dict(r)
            c["c_acctbal"] = (c["c_acctbal"] or 0.0) + 100.0
            extra.append(c)
    pq.write_table(_dup(tb, extra), str(d / "customer.parquet"))
    return str(d)


def test_fixture_plants_duplicate_query_ids(dupkey_dir):
    """Precondition: the corpus must duplicate ids INSIDE the query set
    (vec_id < 8) — the class that crashed the PQ map path — and carry
    both exact and conflicting duplicates."""
    rows = pq.read_table(f"{dupkey_dir}/embeddings.parquet").to_pylist()
    from collections import Counter

    ids = Counter(r["vec_id"] for r in rows)
    assert ids[2] == 2 and ids[7] == 2  # both are query ids
    v7 = [tuple(r["embedding"]) for r in rows if r["vec_id"] == 7]
    assert v7[0] != v7[1]  # conflicting payload
    v2 = [tuple(r["embedding"]) for r in rows if r["vec_id"] == 2]
    assert v2[0] == v2[1]  # exact duplicate


@pytest.mark.parametrize("name", subset(SIMILARITY_REPS, keep=('ann_index_topk_segments',), k=3))
def test_similarity_oracle_gate_green_under_duplicate_keys(
    spark, dupkey_dir, name
):
    con = duckdb_connection(dupkey_dir)
    try:
        report = compare(
            QUERIES[name](spark, dupkey_dir), con, ORACLES[name]
        )
        assert report["ok"], f"{name} under duplicate vec_ids: {report}"
    finally:
        con.close()


def test_embeddings_chokepoint_drops_all_rows_of_duplicated_ids(
    spark, dupkey_dir
):
    from data_pipeline__s3_to_postgres_s3_spark.operators import (
        similarity as sim,
    )

    dups = sim._dup_vec_ids(spark, dupkey_dir)
    assert dups is not None and set(dups) and all(
        (v % 13 == 2) or (v % 11 == 7) for v in dups
    )
    kept = {r["vec_id"] for r in sim._embeddings(spark, dupkey_dir).collect()}
    assert kept and not (kept & set(dups))


def test_key_uniqueness_report_detects_planted_duplicates(spark, dupkey_dir):
    """The detection gate: oracle-compared AND hand-verified against the
    planted counts (sf0.01 doc_ids are 0..499: 30 exact-dup ids via
    %17==3, 27 conflicting via %19==5 — 57 surplus rows, 27 conflicts)."""
    con = duckdb_connection(dupkey_dir)
    try:
        report = compare(
            QUERIES["key_uniqueness_report"](spark, dupkey_dir),
            con,
            ORACLES["key_uniqueness_report"],
        )
        assert report["ok"], report
    finally:
        con.close()
    rows = {
        r["table_name"]: r
        for r in QUERIES["key_uniqueness_report"](spark, dupkey_dir).collect()
    }
    doc = rows["documents"]
    assert (doc["n_rows"], doc["dup_keys"], doc["dup_rows"], doc["conflict_keys"]) == (557, 56, 57, 27)
    emb = rows["embeddings"]
    assert emb["conflict_keys"] > 0 and emb["dup_keys"] > emb["conflict_keys"]
    assert rows["region"]["dup_keys"] == 0


@pytest.mark.parametrize(
    "name",
    [
        "schema_snapshot_report",
        "table_column_stats",
        "join_skew_report",
        "partition_stats_rollup",
    ],
)
def test_census_ops_oracle_green_under_duplicate_keys(
    spark, dupkey_dir, name
):
    """r14 census ops under planted duplicates: no key assumption — both
    engines count the duplicated rows identically, so the gate stays
    green (no chokepoint involvement; plain counts/aggregates)."""
    con = duckdb_connection(dupkey_dir)
    try:
        report = compare(QUERIES[name](spark, dupkey_dir), con, ORACLES[name])
        assert report["ok"], f"{name} under duplicate keys: {report}"
    finally:
        con.close()


def test_key_uniqueness_report_clean_corpus_baseline(spark, sf_small):
    """On the driver's own corpus every single-column PK is unique; the
    synthetic lineitem's (l_orderkey, l_linenumber) is NOT (the
    generator assigns random linenumbers) — the report says so instead
    of a query silently assuming it."""
    rows = {
        r["table_name"]: r
        for r in QUERIES["key_uniqueness_report"](spark, sf_small).collect()
    }
    for t in ("customer", "orders", "events", "documents", "embeddings"):
        assert rows[t]["dup_keys"] == 0 and rows[t]["null_key_rows"] == 0
    assert rows["lineitem"]["dup_keys"] > 0  # honest census, not a gate


def test_repair_documents_reingest_semantics(spark, dupkey_dir, sf_small):
    """The remediation half: exact dup rows collapse (n_copies records
    multiplicity), conflicting ids quarantine, and on a healthy corpus
    the repair is the identity with all n_copies = 1 (idempotence)."""
    from data_pipeline__s3_to_postgres_s3_spark.operators.dedup import (
        repair_documents_reingest,
    )

    con = duckdb_connection(dupkey_dir)
    try:
        report = compare(
            QUERIES["repair_documents_reingest"](spark, dupkey_dir),
            con,
            ORACLES["repair_documents_reingest"],
        )
        assert report["ok"], report
    finally:
        con.close()

    rows = repair_documents_reingest(spark, dupkey_dir).collect()
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids))  # repaired corpus: unique identity
    collapsed = [r for r in rows if r["n_copies"] == 2]
    # doc_ids %17==3 planted exact copies (30 ids), minus id 309 which is
    # ALSO %19==5 (conflicting redux) and therefore quarantined.
    assert len(collapsed) == 29
    assert all(r["doc_id"] % 17 == 3 for r in collapsed)
    assert 309 not in set(ids)
    # conflicting ids (%19==5 with text) are gone entirely
    assert not [i for i in ids if i % 19 == 5 and i % 17 != 3]
    assert len(rows) == 473  # 500 - 27 conflicting ids

    clean = repair_documents_reingest(spark, sf_small).collect()
    assert len(clean) == 500 and all(r["n_copies"] == 1 for r in clean)


@pytest.fixture(scope="module")
def fingerprint_corner_dir(sf_small, tmp_path_factory):
    """The corners the content-fingerprint branch must canonicalize to
    match the exact struct distinct (r11 VERDICT #3): same-key row pairs
    differing only by -0.0 vs 0.0, only by NaN bit provenance, and a
    null-position swap ('x', NULL, NULL) vs (NULL, NULL, 'x') that a
    naive xxhash64 fold (which SKIPS null inputs) would merge."""
    d = tmp_path_factory.mktemp("fp_corner")
    for t in TABLES:
        shutil.copy(f"{sf_small}/{t}.parquet", str(d / f"{t}.parquet"))
    tb = pq.read_table(f"{sf_small}/events.parquet")
    rows = tb.to_pylist()
    base = dict(rows[0])
    nan = float("nan")
    plants = []
    # NOT conflicts under the exact distinct (one row class each):
    plants.append({**base, "event_id": 900001, "value": 0.0})
    plants.append({**base, "event_id": 900001, "value": -0.0})
    plants.append({**base, "event_id": 900002, "value": nan})
    plants.append({**base, "event_id": 900002, "value": nan})
    # IS a conflict: null-position swap across event_type/value/props.
    plants.append(
        {**base, "event_id": 900003, "event_type": "x", "value": None,
         "props": None}
    )
    plants.append(
        {**base, "event_id": 900003, "event_type": None, "value": None,
         "props": "x"}
    )
    pq.write_table(
        pa.Table.from_pylist(rows + plants, schema=tb.schema),
        str(d / "events.parquet"),
    )
    return str(d)


def test_key_census_fingerprint_branch_bit_identical(
    spark, fingerprint_corner_dir, dupkey_dir, monkeypatch
):
    """The dispatched content-hash branch must return the byte-identical
    report as the exact branch — on the planted-duplicate corpus AND on
    the float/null corner corpus (the classes a naive hash splits or
    merges wrongly)."""
    from data_pipeline__s3_to_postgres_s3_spark.operators import profiling

    def run(sf_dir):
        return sorted(
            map(tuple, QUERIES["key_uniqueness_report"](spark, sf_dir).collect())
        )

    for d in (fingerprint_corner_dir, dupkey_dir):
        exact = run(d)
        monkeypatch.setattr(profiling, "KEY_CENSUS_EXACT_MAX_ROWS", -1)
        hashed = run(d)
        monkeypatch.setattr(
            profiling, "KEY_CENSUS_EXACT_MAX_ROWS", 2_000_000
        )
        assert hashed == exact

    # Sanity on the corners themselves (exact branch semantics): the
    # ±0.0 and NaN pairs are exact duplicates, the null-position swap is
    # a conflict — on BOTH branches by the equality above.
    ev = {
        r["table_name"]: r
        for r in QUERIES["key_uniqueness_report"](
            spark, fingerprint_corner_dir
        ).collect()
    }["events"]
    assert ev["dup_keys"] == 3 and ev["conflict_keys"] == 1
