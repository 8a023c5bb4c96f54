"""Compaction family (pipelines/shards.py): compact_manifest planning
semantics + the physical compact_shards rewrite.

The oracle differential (test_correctness_oracle / the driver window)
pins cross-engine agreement of compact_manifest; these tests pin the
CLAIMS the plan makes — reconciliation against shard_manifest (bin sums
ARE the shard totals), next-fit bin bounds, ordering-preserving
contiguity, the keep-arm for already-healthy files (which never fires on
the sf corpora's uniform small files — synthetic census, the
test_sampling/test_curation pattern), and the physical rewrite's
fewer/bounded/ordered/conserved guarantees.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from data_pipeline__s3_to_postgres_s3_spark.pipelines.shards import (
    COMPACT_TARGET_BYTES,
    SHARD_MAX_RECORDS,
    _pack_files,
    compact_manifest,
    compact_shards,
    shard_manifest,
    write_training_shards,
)


def test_compact_manifest_reconciles_with_shard_manifest(spark, sf_dir):
    """Σ bin docs == shard n_docs and Σ bin bytes == shard total_chars per
    (split, lang): the plan accounts for every kept doc exactly once."""
    shard = {
        (r["split"], r["lang"]): r
        for r in shard_manifest(spark, sf_dir).collect()
    }
    bins: dict[tuple, list] = {}
    for r in compact_manifest(spark, sf_dir).collect():
        bins.setdefault((r["split"], r["lang"]), []).append(r)
    assert set(bins) == set(shard)
    for key, rows in bins.items():
        assert sum(r["n_docs"] for r in rows) == shard[key]["n_docs"], key
        assert sum(r["est_bytes"] for r in rows) == shard[key]["total_chars"], key
        # input file accounting: n_files bins cover ceil(n_docs/cap) files
        n_files = sum(r["n_files"] for r in rows)
        expect = -(-shard[key]["n_docs"] // SHARD_MAX_RECORDS)
        assert n_files == expect, key


def test_compact_manifest_bins_bounded_and_contiguous(spark, sf_dir):
    rows = compact_manifest(spark, sf_dir).collect()
    by_part: dict[tuple, list] = {}
    for r in rows:
        by_part.setdefault((r["split"], r["lang"]), []).append(r)
    for key, part in by_part.items():
        # Next-fit bound: a merged bin closes once the running total
        # crosses a target multiple, so it holds < target + one more
        # small file < 2x target.
        for r in part:
            if r["action"] == "merge":
                assert r["est_bytes"] < 2 * COMPACT_TARGET_BYTES, r
            assert r["first_doc"] <= r["last_doc"], r
        # Ordering-preserving compaction: bins' doc_id ranges must not
        # overlap — contiguous input files merge with neighbours only.
        spans = sorted((r["first_doc"], r["last_doc"]) for r in part)
        for (a_lo, a_hi), (b_lo, b_hi) in zip(spans, spans[1:]):
            assert a_hi < b_lo, (key, (a_lo, a_hi), (b_lo, b_hi))


def test_pack_files_keep_and_merge_arms(spark):
    """Synthetic census: files of 100k/100k/100k bytes pack into bins by
    the running total (256k target: cum_prev 0/100k/200k → bin 0, the
    300k-cum file → bin 1), a 300k file is kept as-is, and a second
    partition packs independently."""
    files = spark.createDataFrame(
        [
            ("train", "en", 0, 10, 100_000, 1, 10),
            ("train", "en", 1, 10, 100_000, 11, 20),
            ("train", "en", 2, 10, 100_000, 21, 30),
            ("train", "en", 3, 10, 100_000, 31, 40),
            ("train", "en", 4, 5, 300_000, 41, 45),  # >= target: keep
            ("val", "fr", 0, 2, 1_000, 46, 47),
            ("val", "fr", 1, 2, 1_000, 48, 49),
        ],
        "split string, lang string, file_idx long, fn_docs long,"
        " fbytes long, fdoc_min long, fdoc_max long",
    )
    out = {
        (r["split"], r["lang"], r["action"], r["bin_id"]): r
        for r in _pack_files(files).collect()
    }
    # train/en merged: cum_prev of files 0..3 = 0,100k,200k,300k
    # -> bins 0,0,0,1 (bin 0 holds 3 files = 300k, bin 1 holds 1).
    b0 = out[("train", "en", "merge", 0)]
    assert b0["n_files"] == 3 and b0["est_bytes"] == 300_000
    assert (b0["first_doc"], b0["last_doc"]) == (1, 30)
    b1 = out[("train", "en", "merge", 1)]
    assert b1["n_files"] == 1 and (b1["first_doc"], b1["last_doc"]) == (31, 40)
    # the large file is kept untouched, bin keyed by its own file_idx
    keep = out[("train", "en", "keep", 4)]
    assert keep["n_files"] == 1 and keep["est_bytes"] == 300_000
    # independent partition: two tiny files -> one bin
    fr = out[("val", "fr", "merge", 0)]
    assert fr["n_files"] == 2 and fr["n_docs"] == 4
    assert len(out) == 4


def test_compact_shards_physical_rewrite(spark, sf_dir, tmp_path):
    """The physical half: a small-files shard tree compacts to fewer,
    record-bounded, doc_id-ordered files with rows conserved and the
    split=/lang= layout intact."""
    shard_dir = str(tmp_path / "shards")
    out_dir = str(tmp_path / "compacted")
    write_training_shards(spark, sf_dir, shard_dir, max_records_per_file=50)
    before = glob.glob(f"{shard_dir}/split=*/lang=*/part-*.parquet")
    compact_shards(spark, shard_dir, out_dir, max_records_per_file=500)
    after = glob.glob(f"{out_dir}/split=*/lang=*/part-*.parquet")
    assert 0 < len(after) < len(before)
    n_before = sum(pq.ParquetFile(f).metadata.num_rows for f in before)
    n_after = 0
    for f in after:
        t = pq.read_table(f, columns=["doc_id"])
        n_after += t.num_rows
        assert t.num_rows <= 500
        ids = t.column("doc_id").to_pylist()
        assert ids == sorted(ids), f
    assert n_after == n_before
    # layout intact: same (split, lang) directories
    dirs = lambda paths: {tuple(p.split("/")[-3:-1]) for p in paths}
    assert dirs(after) == dirs(before)


def test_pack_files_properties_random_censuses(spark):
    """Hypothesis sweep over random file censuses: for ANY census the
    packing must (a) conserve files/docs/bytes exactly, (b) keep every
    file >= target out of merge bins, (c) bound every merged bin below
    2x target (next-fit), and (d) keep bins doc_id-contiguous within a
    partition."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    census_rows = st.lists(
        st.tuples(
            st.sampled_from(["train", "val"]),
            st.sampled_from(["en", "fr"]),
            st.integers(min_value=1, max_value=400_000),  # fbytes
            st.integers(min_value=1, max_value=50),  # fn_docs
        ),
        min_size=1,
        max_size=24,
    )

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(rows=census_rows)
    def run(rows):
        doc = 0
        data = []
        by_part: dict = {}
        for split, lang, fbytes, fn_docs in rows:
            idx = by_part.get((split, lang), 0)
            by_part[(split, lang)] = idx + 1
            data.append(
                (split, lang, idx, fn_docs, fbytes, doc, doc + fn_docs - 1)
            )
            doc += fn_docs
        files = spark.createDataFrame(
            data,
            "split string, lang string, file_idx long, fn_docs long,"
            " fbytes long, fdoc_min long, fdoc_max long",
        )
        out = _pack_files(files).collect()
        # (a) conservation
        assert sum(r["n_files"] for r in out) == len(data)
        assert sum(r["n_docs"] for r in out) == sum(d[3] for d in data)
        assert sum(r["est_bytes"] for r in out) == sum(d[4] for d in data)
        for r in out:
            # (b)/(c) arm invariants
            if r["action"] == "keep":
                assert r["n_files"] == 1
                assert r["est_bytes"] >= COMPACT_TARGET_BYTES
            else:
                assert r["est_bytes"] < 2 * COMPACT_TARGET_BYTES
        # (d) contiguity per partition AND action: merge bins never
        # overlap each other (contiguous small-file runs), keeps never
        # overlap each other (distinct files). A keep CAN legitimately
        # sit inside a merge bin's span — the cumsum skips large files,
        # so two smalls straddling a big one still share a bin.
        for key in {(r["split"], r["lang"], r["action"]) for r in out}:
            spans = sorted(
                (r["first_doc"], r["last_doc"])
                for r in out
                if (r["split"], r["lang"], r["action"]) == key
            )
            for (a_lo, a_hi), (b_lo, b_hi) in zip(spans, spans[1:]):
                assert a_hi < b_lo, (key, spans)

    run()
