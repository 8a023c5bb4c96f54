"""Semantic + plan pins for the curation operators (operators/curation.py).

Oracle parity runs in test_correctness_oracle via the registry; these tests
pin the properties the oracle can't see: which docs get flagged, the
shuffle-free repetition plan, broadcast of the eval shingle set, and the
split-composition invariant (decontamination only ever touches train docs).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline__s3_to_postgres_s3_spark import plans
from data_pipeline__s3_to_postgres_s3_spark.operators.curation import (
    decontaminate_eval_overlap,
    doc_repetition,
    event_props_extract,
)
from data_pipeline__s3_to_postgres_s3_spark.operators.sampling import dataset_split


def test_decontaminate_only_train_docs_and_both_classes(spark, sf_dir):
    out = decontaminate_eval_overlap(spark, sf_dir)
    split = dataset_split(spark, sf_dir)
    train_ids = {r["doc_id"] for r in split.where("split = 'train'").collect()}
    rows = out.collect()
    assert {r["doc_id"] for r in rows} <= train_ids
    flags = {r["is_contaminated"] for r in rows}
    assert flags == {True, False}
    for r in rows:
        assert 0.0 <= r["overlap_ratio"] <= 1.0
        assert r["n_overlap"] <= r["n_shingles"]


def test_decontaminate_flags_exact_copy_of_eval_doc(spark, sf_dir):
    """A train doc whose text equals an eval doc's text must be flagged —
    the core decontamination guarantee."""
    out = decontaminate_eval_overlap(spark, sf_dir)
    split = dataset_split(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    labeled = docs.join(split.select("doc_id", "split"), "doc_id")
    dup_across = (
        labeled.where("split = 'train'")
        .select("doc_id", "text")
        .join(
            labeled.where("split = 'test'").select(F.col("text").alias("t2")),
            F.col("text") == F.col("t2"),
        )
        .select("doc_id")
        .distinct()
    )
    copies = {r["doc_id"] for r in dup_across.collect()}
    if copies:  # corpus-dependent; sf0.01 does contain cross-split dupes
        flagged = {
            r["doc_id"] for r in out.where("is_contaminated").collect()
        }
        assert copies <= flagged


def test_decontaminate_broadcasts_eval_shingles(spark, sf_dir):
    df = decontaminate_eval_overlap(spark, sf_dir)
    assert plans.broadcast_join_count(df) >= 1


def test_doc_repetition_is_shuffle_free(spark, sf_dir):
    df = doc_repetition(spark, sf_dir)
    assert plans.exchange_count(df) == 0


def test_doc_repetition_bounds_and_signal(spark, sf_dir):
    rows = doc_repetition(spark, sf_dir).collect()
    assert all(0.0 <= r["dup_token_ratio"] <= 1.0 for r in rows)
    assert all(0.0 <= r["dup_bigram_ratio"] <= 1.0 for r in rows)
    # Bigram repetition is strictly rarer than token repetition per doc.
    assert all(
        r["dup_bigram_ratio"] <= r["dup_token_ratio"] + 1e-9 for r in rows
    )
    # The tiny-vocabulary corpus repeats tokens in every doc.
    assert any(r["dup_token_ratio"] > 0.5 for r in rows)


def test_event_props_extract_accounts_for_every_event(spark, sf_dir):
    out = event_props_extract(spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert sum(r["n_events"] for r in out) == ev.count()
    for r in out:
        assert r["n_with_k"] == r["n_events"]  # every props has k
        assert r["min_k"] <= r["avg_k"] <= r["max_k"]


def test_quality_gate_single_exchange_and_consistency(spark, sf_dir):
    """The funnel must stay one-scan-one-shuffle AND agree with each
    standalone component query gate-for-gate."""
    from data_pipeline__s3_to_postgres_s3_spark.operators.curation import (
        QG_MAX_DUP_BIGRAM,
        quality_gate,
    )
    from data_pipeline__s3_to_postgres_s3_spark.operators.dedup import dedup_exact
    from data_pipeline__s3_to_postgres_s3_spark.operators.textops import lang_id

    df = quality_gate(spark, sf_dir)
    assert plans.exchange_count(df) == 1

    rows = {r["doc_id"]: r for r in df.collect()}
    assert {r["keep"] for r in rows.values()} == {True, False}
    for r in rows.values():
        assert r["keep"] == (
            r["lang_ok"] and r["rep_ok"] and r["stop_ok"] and r["canonical_ok"]
        )

    # lang gate == standalone lang_id verdict
    for lr in lang_id(spark, sf_dir).collect():
        assert rows[lr["doc_id"]]["lang_ok"] == (lr["predicted_lang"] != "und")
    # rep gate == standalone doc_repetition threshold
    for rr in doc_repetition(spark, sf_dir).collect():
        assert rows[rr["doc_id"]]["rep_ok"] == (
            rr["dup_bigram_ratio"] <= QG_MAX_DUP_BIGRAM
        )
    # canonical gate == dedup_exact's elected canonical per content hash
    canonical_ids = {
        r["canonical_doc_id"] for r in dedup_exact(spark, sf_dir).collect()
    }
    for doc_id, r in rows.items():
        assert r["canonical_ok"] == (doc_id in canonical_ids)


def test_per_source_report_totals_reconcile(spark, sf_dir):
    """The source-axis accounting must reconcile with the lang-axis
    accounting (corpus_stats): same corpus, two groupings, identical
    grand totals — the invariant a mixture dashboard relies on."""
    from data_pipeline__s3_to_postgres_s3_spark.operators.curation import (
        per_source_report,
    )
    from data_pipeline__s3_to_postgres_s3_spark.operators.sampling import (
        corpus_stats,
    )

    by_source = per_source_report(spark, sf_dir)
    by_lang = corpus_stats(spark, sf_dir)
    s = by_source.agg(
        F.sum("n_docs").alias("docs"), F.sum("total_tokens").alias("toks")
    ).collect()[0]
    l = by_lang.agg(
        F.sum("n_docs").alias("docs"), F.sum("total_tokens").alias("toks")
    ).collect()[0]
    assert (s.docs, s.toks) == (l.docs, l.toks)
    assert by_source.count() > 1
    dup_sanity = by_source.where(F.col("n_exact_dups") < 0).count()
    assert dup_sanity == 0


def test_char_ngram_diversity_matches_python_recompute(spark, sf_small):
    """The in-row run-length-encoded trigram counts must agree exactly with
    a Counter recompute — every output is exact-int arithmetic until one
    IEEE division, so equality is bitwise, not approximate."""
    from collections import Counter

    from data_pipeline__s3_to_postgres_s3_spark.operators.textops import (
        char_ngram_diversity,
    )

    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_small}/documents.parquet").collect()
    }
    rows = {r["doc_id"]: r for r in char_ngram_diversity(spark, sf_small).collect()}
    for d, t in docs.items():
        tris = [t[i : i + 3] for i in range(len(t) - 2)]
        if not tris:
            assert d not in rows
            continue
        c = Counter(tris)
        n = len(tris)
        ssq = sum(v * v for v in c.values())
        r = rows[d]
        assert r["n_trigrams"] == n
        assert r["n_distinct"] == len(c)
        assert r["distinct_ratio"] == len(c) / n
        assert r["max_freq_ratio"] == max(c.values()) / n
        assert r["simpson_index"] == (n * n - ssq) / (n * n)


def test_line_dedup_scrubs_boilerplate_on_multiline_corpus(spark, tmp_path):
    """The sf corpora are single-line docs, so the driver's oracle gate
    only sees the degenerate keep-everything path; pin the real C4-style
    behavior on a synthetic multi-line corpus: cross-document census,
    lower/trim normalization collapsing cosmetic variants, removal from
    EVERY doc (no survivor), and order-preserving reassembly."""
    import hashlib

    from data_pipeline__s3_to_postgres_s3_spark.operators.curation import (
        LINE_DF_CAP,
        line_dedup,
    )

    assert LINE_DF_CAP == 3
    boiler = "Subscribe To Our Newsletter"  # appears (case-varied) in 3 docs
    rows = [
        (1, f"alpha body one\n{boiler}\nalpha body two"),
        (2, f"  {boiler.upper()}  \nbeta body"),
        (3, f"gamma body\n{boiler.lower()}"),
        (4, "delta body\nshared twice"),  # df=2 < cap → kept
        (5, "shared twice\nepsilon body"),
        (6, boiler),  # nothing but boilerplate → empty scrubbed text
    ]
    spark.createDataFrame(rows, "doc_id bigint, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))

    got = {r["doc_id"]: r for r in line_dedup(spark, str(tmp_path)).collect()}

    def h(*lines):
        return hashlib.md5("\n".join(lines).encode()).hexdigest()

    assert (got[1]["n_lines"], got[1]["n_kept"]) == (3, 2)
    assert got[1]["kept_hash"] == h("alpha body one", "alpha body two")
    assert (got[2]["n_lines"], got[2]["n_kept"]) == (2, 1)
    assert got[2]["kept_hash"] == h("beta body")
    assert (got[3]["n_lines"], got[3]["n_kept"]) == (2, 1)
    assert got[3]["kept_hash"] == h("gamma body")
    # df=2 lines survive in BOTH docs (cap not reached).
    assert got[4]["n_kept"] == 2 and got[5]["n_kept"] == 2
    assert got[4]["kept_hash"] == h("delta body", "shared twice")
    # All-boilerplate doc: still one output row, empty scrubbed text.
    assert (got[6]["n_lines"], got[6]["n_kept"]) == (1, 0)
    assert got[6]["kept_hash"] == h()
    assert got[6]["kept_ratio"] == 0.0 and got[1]["kept_ratio"] == 2 / 3


def test_line_dedup_oracle_parity_on_multiline_corpus(spark, tmp_path):
    """Spark ↔ DuckDB parity where the boilerplate census actually fires
    (the sf gate never exercises it) — incl. empty lines, trailing
    newlines, and ties in line position ordering."""
    import duckdb

    from data_pipeline__s3_to_postgres_s3_spark.operators.curation import (
        line_dedup,
    )
    from data_pipeline__s3_to_postgres_s3_spark.oracles.curation import (
        LINE_DEDUP,
    )

    rows = [
        (
            i,
            "\n".join(
                (["nav header"] if i % 2 == 0 else [])
                + [f"body {i} {j}" for j in range(i % 4 + 1)]
                + (["footer text", ""] if i % 3 == 0 else [])
            ),
        )
        for i in range(12)
    ]
    spark.createDataFrame(rows, "doc_id bigint, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))

    got = sorted(tuple(r) for r in line_dedup(spark, str(tmp_path)).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    want = sorted(tuple(r) for r in con.execute(LINE_DEDUP).fetchall())
    assert got == want


def test_line_dedup_plan_shape(spark, tmp_path, sf_dir):
    """Census join is SIZE-DISPATCHED (ADVICE r5 + r6 measurement): the
    checkpointed census is counted, and the broadcast hint applied only
    below LINE_BC_MAX_ROWS — so the common path never shuffle-writes
    the corpus side (hintless AQE still pays that map write before
    converting SMJ→BHJ; measured 2.9 s vs 0.6 s cold at sf0.1) while a
    pathological census degrades to a genuine shuffle join. Pin: the
    small-census branch broadcasts, the whole op checkpoints the census
    exactly once, and no sorted shuffle sneaks into line reassembly."""
    from data_pipeline__s3_to_postgres_s3_spark.operators.curation import (
        line_dedup,
    )

    boiler = "shared boilerplate line"
    rows = [(i, f"body {i}\n{boiler}") for i in range(1, 5)]
    spark.createDataFrame(rows, "doc_id bigint, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    with plans.checkpoint_audit() as ckpts:
        df = line_dedup(spark, str(tmp_path))
    assert len(ckpts) == 1  # census materialized once for count + join
    assert plans.broadcast_join_count(df) >= 1  # hint → static BHJ
    true_exch = plans.exchange_count(df) + sum(c["exch"] for c in ckpts)
    assert true_exch <= 3
    # sf corpora are single-line: the census is empty, still broadcast.
    assert plans.broadcast_join_count(line_dedup(spark, sf_dir)) >= 1


def test_gopher_quality_rule_paths_on_synthetic_corpus(spark, tmp_path):
    """The sf corpus has no symbols, bullets, or ellipses, so pin every
    Gopher rule on docs built to trip exactly one rule each."""
    from data_pipeline__s3_to_postgres_s3_spark.operators.curation import (
        GOPHER_MIN_WORDS,
        gopher_quality,
    )

    good_body = ("the quick brown fox jumps over lazy dogs near riverbank "
                 * 7).strip()  # 63 words, all alpha, mean len in [3,10]
    rows = [
        (1, good_body),                                    # passes
        (2, "the short doc"),                              # too few words
        (3, " ".join(["####"] * 30 + good_body.split())),  # symbol ratio
        (4, " ".join(["1234"] * 30 + good_body.split())),  # alpha ratio
        (5, "\n".join(["- bullet item each line"] * 20)),  # bullet lines
        (6, "\n".join([f"{good_body} trailing off..."] * 3)),  # ellipsis
        (7, good_body.replace("the", "zzz")),              # no req stopword
        (8, " ".join(["a"] * 60)),                         # mean word len < 3
    ]
    spark.createDataFrame(rows, "doc_id bigint, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))

    got = {r["doc_id"]: r for r in gopher_quality(spark, str(tmp_path)).collect()}
    assert got[1]["gopher_pass"]
    assert not got[2]["gopher_pass"] and got[2]["n_words"] < GOPHER_MIN_WORDS
    assert not got[3]["gopher_pass"] and got[3]["symbol_word_ratio"] > 0.1
    assert not got[4]["gopher_pass"] and got[4]["alpha_word_ratio"] < 0.8
    assert not got[5]["gopher_pass"] and got[5]["bullet_line_ratio"] == 1.0
    assert not got[6]["gopher_pass"] and got[6]["ellipsis_line_ratio"] == 1.0
    assert not got[7]["gopher_pass"] and got[7]["n_required_stop"] == 0
    assert not got[8]["gopher_pass"] and got[8]["mean_word_len"] < 3.0


def test_gopher_quality_oracle_parity_on_synthetic_corpus(spark, tmp_path):
    """Spark ↔ DuckDB parity where the regex rules actually fire — the sf
    gate only exercises the all-zero symbol/bullet/ellipsis path."""
    import duckdb

    from data_pipeline__s3_to_postgres_s3_spark.operators.curation import (
        gopher_quality,
    )
    from data_pipeline__s3_to_postgres_s3_spark.oracles.curation import (
        GOPHER_QUALITY,
    )

    base = "the value of data and tables that have merit with care"
    rows = [
        (
            i,
            "\n".join(
                ([f"- item {j}" for j in range(i % 3)])
                + [f"{base} {'#' * (i % 4)} w{j}…" for j in range(i % 5 + 1)]
                + (["  * spaced bullet", "fading out..."] if i % 2 else [])
            ),
        )
        for i in range(10)
    ]
    spark.createDataFrame(rows, "doc_id bigint, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))

    got = sorted(tuple(r) for r in gopher_quality(spark, str(tmp_path)).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    want = sorted(tuple(r) for r in con.execute(GOPHER_QUALITY).fetchall())
    assert got == want


def test_gopher_quality_is_shuffle_free(spark, sf_dir):
    from data_pipeline__s3_to_postgres_s3_spark.operators.curation import (
        gopher_quality,
    )

    assert plans.exchange_count(gopher_quality(spark, sf_dir)) == 0


def test_source_overlap_matrix_on_synthetic_corpus(spark, tmp_path):
    """Pin source_overlap's set semantics on hand-computable shingle sets:
    per-source DISTINCT 3-gram vocabularies (doc-level repeats collapse),
    every unordered pair present including zero-overlap ones, and the
    Jaccard/containment arithmetic."""
    from data_pipeline__s3_to_postgres_s3_spark.operators.curation import (
        source_overlap,
    )

    rows = [
        (1, "a b c d", "srcA"),  # shingles {a b c, b c d}
        (2, "a b c", "srcA"),  # duplicate shingle — must not inflate n_a
        (3, "b c d e", "srcB"),  # {b c d, c d e} — shares 1 with srcA
        (4, "x y z w", "srcC"),  # disjoint
        (5, "no", "srcD"),  # <3 tokens → no shingles → absent entirely
    ]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, source string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = {
        (r["source_a"], r["source_b"]): r
        for r in source_overlap(spark, str(tmp_path)).collect()
    }
    # srcD contributed no shingles → only the A/B/C pair grid remains.
    assert set(got) == {
        ("srcA", "srcB"),
        ("srcA", "srcC"),
        ("srcB", "srcC"),
    }
    ab = got[("srcA", "srcB")]
    assert (ab["n_a"], ab["n_b"], ab["n_common"]) == (2, 2, 1)
    assert ab["jaccard"] == 0.333333  # portable_round(1/3, 6)
    assert ab["containment"] == 0.5
    for pair in (("srcA", "srcC"), ("srcB", "srcC")):
        r = got[pair]
        assert r["n_common"] == 0
        assert r["jaccard"] == 0.0 and r["containment"] == 0.0


def test_source_overlap_minhash_tracks_exact_jaccard(spark, sf_dir):
    """The estimator twin must track the exact matrix: with P=16
    permutations the stderr is ~√(J(1−J)/16) ≤ 0.125, so over 190 pairs
    the MEAN absolute estimation error should sit well inside one stderr
    (estimator granularity is 1/16 = 0.0625). Also pins the shared pair
    grid (same source pairs as the exact op)."""
    from data_pipeline__s3_to_postgres_s3_spark.operators.curation import (
        source_overlap,
        source_overlap_minhash,
    )

    exact = {
        (r["source_a"], r["source_b"]): r["jaccard"]
        for r in source_overlap(spark, sf_dir).collect()
    }
    est = {
        (r["source_a"], r["source_b"]): r["est_jaccard"]
        for r in source_overlap_minhash(spark, sf_dir).collect()
    }
    assert set(est) == set(exact)
    errs = [abs(est[k] - exact[k]) for k in exact]
    assert sum(errs) / len(errs) <= 0.08, sorted(errs)[-5:]


def test_cross_source_neardups_is_the_cross_feed_slice(spark, sf_dir):
    """Pin the composition: exactly the dedup_minhash_lsh pair set minus
    within-source pairs — no pair invented, none lost."""
    from data_pipeline__s3_to_postgres_s3_spark.catalog import load_table
    from data_pipeline__s3_to_postgres_s3_spark.operators.curation import (
        cross_source_neardups,
    )
    from data_pipeline__s3_to_postgres_s3_spark.operators.dedup import (
        dedup_minhash_lsh,
    )

    src = {
        r["doc_id"]: r["source"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "source")
        .collect()
    }
    all_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dedup_minhash_lsh(spark, sf_dir).collect()
    }
    expected = {(a, b) for (a, b) in all_pairs if src[a] != src[b]}
    got = {
        (r["doc_a"], r["doc_b"])
        for r in cross_source_neardups(spark, sf_dir).collect()
    }
    assert got == expected
    assert expected, "sf corpus should contain cross-source near-dups"
    assert expected != all_pairs, "within-source pairs must be filtered"


def test_gopher_repetition_metrics_on_synthetic_corpus(spark, tmp_path):
    """The sf corpora are single-line word-soup, so pin every repetition
    metric on hand-computed docs: dup-line fraction + char fraction,
    top-{2,3}-gram char fractions (count*charlen of the (count, charlen)
    max), the dup-5-gram overlap-proxy (documented: can exceed 1), and
    the degenerate empty-text doc."""
    from data_pipeline__s3_to_postgres_s3_spark.operators.curation import (
        gopher_repetition,
    )

    rows = [
        (1, "a b\nc d\na b"),                 # repeated line + bigram
        (2, ("x y z w v " * 3).strip()),      # period-5 token stream
        (3, ""),                              # degenerate
    ]
    spark.createDataFrame(rows, "doc_id bigint, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))

    got = {r["doc_id"]: r for r in gopher_repetition(spark, str(tmp_path)).collect()}

    r1 = got[1]
    assert r1["n_lines"] == 3
    assert r1["dup_line_frac"] == 1.0 - 2 / 3
    # "a b" (3 chars) appears twice -> 6 of 9 non-newline chars
    assert r1["dup_line_char_frac"] == 6 / 9
    # words: a b c d a b -> top bigram "a b" c=2, charlen 2; n_wchars 6
    assert r1["top_2gram_char_frac"] == 4 / 6
    # all trigrams distinct -> c=1, charlen 3
    assert r1["top_3gram_char_frac"] == 3 / 6
    assert r1["dup_5gram_char_frac"] == 0.0
    assert not r1["gopher_rep_pass"]  # dup_line + top2 over threshold

    r2 = got[2]
    # 15 tokens of period 5: every 5-gram duplicated; overlap proxy
    # (3 + 2*4) * 5 chars over 15 word chars = 55/15 > 1 -> fails dup5
    assert r2["dup_5gram_char_frac"] == 55 / 15
    assert r2["n_lines"] == 1 and r2["dup_line_frac"] == 0.0
    assert not r2["gopher_rep_pass"]

    r3 = got[3]
    assert r3["n_lines"] == 1
    assert r3["dup_line_frac"] == 0.0
    assert r3["dup_line_char_frac"] == 0.0
    assert r3["top_2gram_char_frac"] == 0.0
    assert r3["dup_5gram_char_frac"] == 0.0
    assert r3["gopher_rep_pass"]


def test_gopher_repetition_oracle_parity_on_synthetic_corpus(spark, tmp_path):
    """Spark ↔ DuckDB parity where the repetition rules actually fire
    (multi-line docs, duplicated grams, tabs, empty docs)."""
    import duckdb

    from data_pipeline__s3_to_postgres_s3_spark.operators.curation import (
        gopher_repetition,
    )
    from data_pipeline__s3_to_postgres_s3_spark.oracles.curation import (
        GOPHER_REPETITION,
    )

    rows = [
        (1, "a b\nc d\na b"),
        (2, ("x y z w v " * 3).strip()),
        (3, ""),
        (4, "one\ttab  double space\nline two\nline two"),
        (5, "the the the the the the"),
    ]
    spark.createDataFrame(rows, "doc_id bigint, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))

    got = sorted(
        tuple(r) for r in gopher_repetition(spark, str(tmp_path)).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    want = sorted(tuple(r) for r in con.execute(GOPHER_REPETITION).fetchall())
    assert got == want


def test_ccnet_quality_buckets_equal_terciles_and_order(spark, tmp_path):
    """CCNet semantics: equal-thirds split, highest mean corpus frequency
    -> head. Nine docs built so mean frequency strictly orders them."""
    from data_pipeline__s3_to_postgres_s3_spark.operators.curation import (
        ccnet_quality_buckets,
    )

    # "c" appears 9x, "m" 6x, rare tokens once each: mean freq descends
    # from all-common docs to all-rare docs.
    rows = [
        (1, "c c c"), (2, "c c c"), (3, "c c c"),
        (4, "m m"), (5, "m m"), (6, "m m"),
        (7, "r1 r2"), (8, "r3 r4"), (9, "r5 r6"),
    ]
    spark.createDataFrame(rows, "doc_id bigint, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))

    got = {r["doc_id"]: r for r in ccnet_quality_buckets(spark, str(tmp_path)).collect()}
    assert [got[i]["ppl_bucket"] for i in range(1, 10)] == (
        ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
    )
    assert got[1]["mean_tok_count"] == 9.0
    assert got[4]["mean_tok_count"] == 6.0
    assert got[7]["mean_tok_count"] == 1.0
    # Determinism: a second run assigns identical buckets.
    again = {r["doc_id"]: r["ppl_bucket"]
             for r in ccnet_quality_buckets(spark, str(tmp_path)).collect()}
    assert again == {i: got[i]["ppl_bucket"] for i in range(1, 10)}


def test_gopher_repetition_and_ccnet_plan_shapes(spark, sf_dir):
    """gopher_repetition is a pure scan projection (ZERO shuffle);
    ccnet's scoring pass adds only the census + the tercile window over
    the reduced projection."""
    from data_pipeline__s3_to_postgres_s3_spark.operators.curation import (
        ccnet_quality_buckets,
        gopher_repetition,
    )

    # r15: the adaptive single-split scan spread is a round-robin
    # exchange, not a keyed shuffle — the pin counts KEYED exchanges.
    assert plans.keyed_exchange_count(gopher_repetition(spark, sf_dir)) == 0
    # census shuffle happens at build time (collect); the returned plan
    # carries only the NTILE window's single exchange.
    assert plans.exchange_count(ccnet_quality_buckets(spark, sf_dir)) <= 1


def test_curation_funnel_first_fail_attribution(spark, tmp_path):
    """Each doc drops at its FIRST failing gate: doc 2 fails repetition
    AND stopword but counts only under repetition; conservation holds
    (n_out[i] == n_in[i+1], last n_out == kept corpus)."""
    from data_pipeline__s3_to_postgres_s3_spark.operators.curation import (
        FUNNEL_STAGES,
        curation_funnel,
        quality_gate,
    )

    keep_text = "the alpha beta gamma delta epsilon zeta window scan"
    rows = [
        (1, "zzz qqq www"),  # no lang markers -> lang_id
        (2, "the cat sat the cat sat the cat sat the cat sat"),  # rep + stop
        (3, "the quick and fast of stream is here for scan"),  # stopword
        (4, keep_text),  # canonical of the dup pair -> kept
        (5, keep_text),  # exact dup -> exact_dup
        (6, "is vector scan merge batch join hash sort stream"),  # kept
    ]
    spark.createDataFrame(rows, "doc_id bigint, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))

    got = {
        r["stage"]: r for r in curation_funnel(spark, str(tmp_path)).collect()
    }
    assert [got[s]["stage_idx"] for s in FUNNEL_STAGES] == [0, 1, 2, 3]
    expect = {
        "lang_id": (6, 1, 5),
        "repetition": (5, 1, 4),
        "stopword": (4, 1, 3),
        "exact_dup": (3, 1, 2),
    }
    for stage, (n_in, n_drop, n_out) in expect.items():
        r = got[stage]
        assert (r["n_in"], r["n_dropped"], r["n_out"]) == (
            n_in,
            n_drop,
            n_out,
        ), stage
        assert r["drop_rate"] == n_drop / n_in
    kept = (
        quality_gate(spark, str(tmp_path)).where("keep").count()
    )
    assert kept == got["exact_dup"]["n_out"] == 2


def test_curation_funnel_conserves_at_sf(spark, sf_dir):
    """Chain conservation on the real corpus + agreement with
    quality_gate's kept count."""
    from data_pipeline__s3_to_postgres_s3_spark.operators.curation import (
        curation_funnel,
        quality_gate,
    )

    rows = sorted(
        curation_funnel(spark, sf_dir).collect(),
        key=lambda r: r["stage_idx"],
    )
    gated = quality_gate(spark, sf_dir)
    assert rows[0]["n_in"] == gated.count()
    for a, b in zip(rows, rows[1:]):
        assert a["n_out"] == b["n_in"]
        assert a["n_in"] - a["n_dropped"] == a["n_out"]
    assert rows[-1]["n_out"] == gated.where("keep").count()
