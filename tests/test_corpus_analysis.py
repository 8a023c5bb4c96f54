"""Semantic pins for the round-8 corpus-analysis trio
(ngram_novelty_timeline / bpe_merge_census in operators/textops.py,
split_leakage_report in operators/curation.py).

Oracle parity at sf runs in test_correctness_oracle via the registry;
here the CLAIMS are pinned — novelty conservation and saturation on a
corpus where repetition actually occurs (the sf corpora are word-soup:
every batch is near-all-new there), hand-computed BPE pair counts, and
the leakage report's exact reconciliation with its two composed
surfaces (dedup_minhash_lsh + dataset_split).
"""

from __future__ import annotations

from data_pipeline__s3_to_postgres_s3_spark.operators.curation import (
    split_leakage_report,
)
from data_pipeline__s3_to_postgres_s3_spark.operators.dedup import (
    dedup_minhash_lsh,
)
from data_pipeline__s3_to_postgres_s3_spark.operators.sampling import (
    HASH_MOD,
    HASH_MULT,
    SPLIT_BUCKETS,
    TRAIN_UPTO,
    VAL_UPTO,
)
from data_pipeline__s3_to_postgres_s3_spark.operators.textops import (
    NOVELTY_BATCH_DOCS,
    bpe_merge_census,
    ngram_novelty_timeline,
)


def _write_docs(spark, tmp_path, rows) -> str:
    spark.createDataFrame(rows, "doc_id bigint, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _py_split(doc_id: int) -> str:
    b = (doc_id * HASH_MULT) % HASH_MOD % SPLIT_BUCKETS
    return "train" if b < TRAIN_UPTO else ("val" if b < VAL_UPTO else "test")


def test_novelty_timeline_saturates_on_repeated_content(spark, tmp_path):
    """Batch 0 is all-new (rate 1.0); a later batch that repeats batch
    0's shingles verbatim adds NOTHING (rate 0.0, cum_vocab flat); a
    mixed batch sits in between. Conservation: Σ n_new == final
    cum_vocab == corpus-wide distinct shingle count."""
    b = NOVELTY_BATCH_DOCS
    fresh = "alpha beta gamma delta epsilon zeta"  # 4 shingles
    rows = [
        (0, fresh),
        (1, "one two three four"),  # 2 more shingles
        # batch 1: pure repetition of batch 0 content
        (b, fresh),
        (b + 1, fresh),
        # batch 2: half repeated, half new
        (2 * b, fresh),
        (2 * b + 1, "nu xi omicron pi rho"),  # 3 new shingles
    ]
    sf = _write_docs(spark, tmp_path, rows)
    out = {r["batch"]: r for r in ngram_novelty_timeline(spark, sf).collect()}
    assert set(out) == {0, 1, 2}
    assert out[0]["n_docs"] == 2 and out[0]["novelty_rate"] == 1.0
    assert out[0]["n_new_shingles"] == 6 and out[0]["cum_vocab"] == 6
    assert out[1]["n_new_shingles"] == 0 and out[1]["novelty_rate"] == 0.0
    assert out[1]["cum_vocab"] == 6
    assert out[1]["n_distinct_shingles"] == 4  # the repeated doc's 4
    assert out[1]["n_shingle_occurrences"] == 8  # 2 docs x 4 each
    assert out[2]["n_new_shingles"] == 3
    assert out[2]["cum_vocab"] == 9
    assert out[2]["n_distinct_shingles"] == 7  # 4 repeated + 3 new
    assert out[2]["novelty_rate"] == 3 / 7
    # conservation across the timeline
    assert sum(r["n_new_shingles"] for r in out.values()) == 9
    assert max(r["cum_vocab"] for r in out.values()) == 9


def test_novelty_timeline_sf_conservation(spark, sf_dir):
    """At sf: cum_vocab is monotone, equals the running Σ n_new, and the
    final value equals the corpus-wide distinct shingle count computed
    independently."""
    from pyspark.sql import functions as F

    from data_pipeline__s3_to_postgres_s3_spark.catalog import load_table
    from data_pipeline__s3_to_postgres_s3_spark.operators.dedup import (
        _shingle_arrays,
    )

    rows = sorted(
        ngram_novelty_timeline(spark, sf_dir).collect(),
        key=lambda r: r["batch"],
    )
    run = 0
    for r in rows:
        run += r["n_new_shingles"]
        assert r["cum_vocab"] == run
        assert r["n_distinct_shingles"] >= r["n_new_shingles"]
        assert r["n_shingle_occurrences"] >= r["n_distinct_shingles"]
    total_vocab = (
        _shingle_arrays(load_table(spark, sf_dir, "documents"))
        .select(F.explode("shingles").alias("s"))
        .agg(F.count_distinct("s"))
        .collect()[0][0]
    )
    assert rows[-1]["cum_vocab"] == total_vocab


def test_bpe_merge_census_hand_computed(spark, tmp_path):
    """'aaab aaab ab x.' twice: pre-tokens aaab(x4) ab(x2) x(x2) '.'(x2)
    → pairs: aa appears 2x per 'aaab' (positions 1,2) = 8, ab once per
    'aaab' + once per 'ab' = 6; single-char tokens contribute nothing."""
    rows = [(1, "aaab aaab ab x."), (2, "aaab aaab ab x.")]
    sf = _write_docs(spark, tmp_path, rows)
    out = {r["pair"]: r for r in bpe_merge_census(spark, sf).collect()}
    assert set(out) == {"aa", "ab"}
    assert out["aa"]["pair_count"] == 8
    assert out["aa"]["n_distinct_words"] == 1  # only 'aaab' contains 'aa'
    assert out["ab"]["pair_count"] == 6
    assert out["ab"]["n_distinct_words"] == 2  # 'aaab' and 'ab'


def test_bpe_merge_census_topk_deterministic(spark, sf_dir):
    """The report is exactly the top-K by (count DESC, pair ASC) — re-run
    equality pins the deterministic LIMIT, and every pair is 2 chars."""
    a = [(r["pair"], r["pair_count"]) for r in bpe_merge_census(spark, sf_dir).collect()]
    b = [(r["pair"], r["pair_count"]) for r in bpe_merge_census(spark, sf_dir).collect()]
    assert a == b
    counts = [c for _, c in a]
    assert counts == sorted(counts, reverse=True)
    assert all(len(p) == 2 for p, _ in a)


def test_split_leakage_reconciles_with_composed_surfaces(spark, tmp_path):
    """Construct near-dup pairs that straddle splits: the report must be
    EXACTLY the LSH pair set filtered to cross-split endpoints, with the
    dataset_split hash arithmetic deciding the labels."""
    # 20-token base text; near-dups share all but one token.
    base = [f"w{i}" for i in range(20)]
    text_a = " ".join(base)
    text_b = " ".join(base[:-1] + ["zz"])
    # Find ids whose splits differ (by the same hash the engine uses).
    ids = list(range(1, 400))
    train_ids = [i for i in ids if _py_split(i) == "train"]
    test_ids = [i for i in ids if _py_split(i) == "test"]
    val_ids = [i for i in ids if _py_split(i) == "val"]
    assert train_ids and test_ids and val_ids
    rows = [
        (train_ids[0], text_a),  # near-dup pair crossing train/test
        (test_ids[0], text_b),
        (train_ids[1], "totally different words here friend"),  # no pair
        (val_ids[0], text_a),  # exact dup of train_ids[0] crossing val
    ]
    sf = _write_docs(spark, tmp_path, rows)
    got = {
        (r["doc_a"], r["doc_b"]): r
        for r in split_leakage_report(spark, sf).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup_minhash_lsh(spark, sf).collect()
    }
    expect = {
        (a, b): j
        for (a, b), j in lsh.items()
        if _py_split(a) != _py_split(b)
    }
    assert set(got) == set(expect) and expect, (set(lsh), expect)
    for (a, b), r in got.items():
        assert r["split_a"] == _py_split(a)
        assert r["split_b"] == _py_split(b)
        assert r["jaccard"] == expect[(a, b)]


def test_split_leakage_sf_subset_of_lsh(spark, sf_dir):
    """At sf: every reported pair is an LSH pair with cross-split
    endpoints, and no cross-split LSH pair is missing."""
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in dedup_minhash_lsh(spark, sf_dir).collect()
    }
    got = {
        (r["doc_a"], r["doc_b"]): (r["split_a"], r["split_b"])
        for r in split_leakage_report(spark, sf_dir).collect()
    }
    assert set(got) <= lsh
    for (a, b), (sa, sb) in got.items():
        assert sa == _py_split(a) and sb == _py_split(b) and sa != sb
    missing = {
        (a, b)
        for (a, b) in lsh
        if _py_split(a) != _py_split(b) and (a, b) not in got
    }
    assert not missing


def test_source_quality_matrix_reconciles_with_row_gates(spark, sf_dir):
    """The per-source matrix must equal a Python aggregation of the
    row_gates frame, and account for every document exactly once."""
    import pyarrow.parquet as pq

    from data_pipeline__s3_to_postgres_s3_spark.catalog import load_table
    from data_pipeline__s3_to_postgres_s3_spark.operators.curation import (
        row_gates,
        source_quality_matrix,
    )

    gates = row_gates(
        load_table(spark, sf_dir, "documents"), carry=("source",)
    ).collect()
    want: dict = {}
    for r in gates:
        w = want.setdefault(
            r["source"], {"n": 0, "lang": 0, "rep": 0, "stop": 0, "pass": 0}
        )
        w["n"] += 1
        w["lang"] += bool(r["lang_ok"])
        w["rep"] += bool(r["rep_ok"])
        w["stop"] += bool(r["stop_ok"])
        w["pass"] += bool(r["lang_ok"] and r["rep_ok"] and r["stop_ok"])
    got = {r["source"]: r for r in source_quality_matrix(spark, sf_dir).collect()}
    assert set(got) == set(want)
    for s, w in want.items():
        g = got[s]
        assert (
            g["n_docs"], g["n_lang_ok"], g["n_rep_ok"], g["n_stop_ok"], g["n_pass"]
        ) == (w["n"], w["lang"], w["rep"], w["stop"], w["pass"]), s
        assert g["pass_rate"] == w["pass"] / w["n"]
    n_total = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    assert sum(r["n_docs"] for r in got.values()) == n_total


def test_dedup_cluster_report_reconciles_with_composed_frames(spark, tmp_path):
    """On a corpus with real multi-member clusters: the report must equal
    a Python recomputation from the clusters + pairs frames it composes
    (the sf corpora have no exact dups, so build one)."""
    from data_pipeline__s3_to_postgres_s3_spark.operators.dedup import (
        dedup_minhash_lsh,
    )
    from data_pipeline__s3_to_postgres_s3_spark.operators.graph import (
        dedup_cluster_report,
        dedup_clusters,
    )

    base = [f"w{i}" for i in range(20)]
    t = " ".join(base)
    t2 = " ".join(base[:-1] + ["zz"])
    rows = [
        (1, t, "feedA"),
        (2, t, "feedB"),      # near/exact dup cluster {1,2,3}
        (3, t2, "feedA"),
        (4, "completely different words here my friend", "feedC"),
        (5, "another unrelated document entirely", "feedC"),
    ]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, source string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    sf = str(tmp_path)

    members = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup_clusters(spark, sf).collect()
        if r["cluster_size"] > 1
    }
    pairs = dedup_minhash_lsh(spark, sf).collect()
    src = {d: s for d, _, s in rows}
    got = {r["cluster_id"]: r for r in dedup_cluster_report(spark, sf).collect()}
    assert set(got) == set(members.values()) == {1}
    rep = got[1]
    assert rep["cluster_size"] == 3
    assert rep["n_sources"] == len({src[d] for d in members})
    in_cluster = [p for p in pairs if members.get(p["doc_a"]) == 1]
    assert rep["n_pairs"] == len(in_cluster) == 3  # (1,2),(1,3),(2,3)
    assert rep["min_jaccard"] == min(p["jaccard"] for p in in_cluster)
    import math

    mean = sum(p["jaccard"] for p in in_cluster) / len(in_cluster)
    assert abs(rep["mean_jaccard"] - math.floor(mean * 1e6 + 0.5) / 1e6) < 2e-6


def test_ngram_lm_perplexity_hand_computed(spark, tmp_path):
    """Add-one bigram LM on a 4-doc corpus, scored by hand.

    Corpus bigram counts: c(a,b)=3, c(b,a)=1, c(b,c)=1; contexts
    c(a·)=3, c(b·)=2; V=|{b,a,c}|=3. Surprisals (micro-nats):
    -ln((3+1)/(3+3)) = 405465, -ln((1+1)/(2+3)) = 916291. Docs with <2
    tokens (incl. NULL text) carry no row."""
    from data_pipeline__s3_to_postgres_s3_spark.operators.textops import (
        ngram_lm_perplexity,
    )

    rows = [
        (1, "a b a b"),  # bigrams (a,b)x2 (b,a)x1
        (2, "a b c"),  # (a,b) (b,c)
        (3, "z"),  # 1 token -> no bigrams
        (4, None),  # NULL text -> empty doc
    ]
    sf = _write_docs(spark, tmp_path, rows)
    out = {r["doc_id"]: r for r in ngram_lm_perplexity(spark, sf).collect()}
    assert set(out) == {1, 2}
    d1, d2 = out[1], out[2]
    assert d1["n_bigrams"] == 3
    assert d1["nll_micro_sum"] == 2 * 405465 + 916291
    assert d1["avg_nll"] == 0.5757
    assert d1["ppl"] == 1.78
    assert d2["n_bigrams"] == 2
    assert d2["nll_micro_sum"] == 405465 + 916291
    assert d2["avg_nll"] == 0.6609
    assert d2["ppl"] == 1.94


def test_bigram_pmi_topk_hand_computed(spark, tmp_path):
    """Two docs of alternating pairs: (a,b) and (c,d) each occur 5 times
    (the back-pairs (b,a)/(d,c) only 4 — screened out). T=18,
    c_left(a)=5, c_right(b)=5 → PMI = ln(5·18/(5·5)) = ln(3.6),
    micro-quantized 1280934. Tie on pmi_micro breaks by w1 ASC."""
    from data_pipeline__s3_to_postgres_s3_spark.operators.textops import (
        bigram_pmi_topk,
    )

    rows = [
        (1, "a b a b a b a b a b"),
        (2, "c d c d c d c d c d"),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    out = bigram_pmi_topk(spark, sf).collect()
    assert [(r["w1"], r["w2"]) for r in out] == [("a", "b"), ("c", "d")]
    for r in out:
        assert r["pair_count"] == 5
        assert r["c_left"] == 5 and r["c_right"] == 5
        assert r["pmi_micro"] == 1280934
        assert r["pmi"] == 1.280934


def test_source_unigram_kl_hand_computed(spark, tmp_path):
    """Two symmetric sources over a two-word vocabulary. Source a:
    {x:3, y:1}, source b: {x:1, y:3}; corpus p(x)=p(y)=0.5. KL each =
    0.75·ln(1.5) + 0.25·ln(0.5) → nano terms 304098831 + (-173286795)
    = 130812036. NULL source/text fold into the '' group / empty-token
    distribution deterministically."""
    from data_pipeline__s3_to_postgres_s3_spark.operators.curation import (
        source_unigram_kl,
    )

    spark.createDataFrame(
        [
            (1, "x x x y", "a"),
            (2, "x y y y", "b"),
        ],
        "doc_id bigint, text string, source string",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["source"]: r
        for r in source_unigram_kl(spark, str(tmp_path)).collect()
    }
    assert set(out) == {"a", "b"}
    for s in ("a", "b"):
        r = out[s]
        assert r["n_tokens"] == 4 and r["n_word_types"] == 2
        assert r["kl_nano_sum"] == 130812036
        assert r["kl_nats"] == 0.130812036


def test_ngram_lm_perplexity_matches_python_replica(spark, tmp_path):
    """Independent semantic pin on a seeded random word-soup corpus: a
    pure-Python add-one bigram LM scored with the same micro-nat
    quantization — catches a formulation bug the DuckDB oracle would
    share (both engines' SQL is written from the same derivation)."""
    import math
    import random
    from collections import Counter

    from data_pipeline__s3_to_postgres_s3_spark.operators.textops import (
        LM_NLL_SCALE,
        ngram_lm_perplexity,
    )

    rng = random.Random(13)
    vocab = ["red", "green", "blue", "ox", "owl", "fir", "elm"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 9))))
        for i in range(1, 25)
    ]
    sf = _write_docs(spark, tmp_path, rows)

    bg = Counter()
    per_doc: dict[int, list[tuple[str, str]]] = {}
    for doc_id, text in rows:
        toks = text.split(" ")
        grams = list(zip(toks, toks[1:]))
        if grams:
            per_doc[doc_id] = grams
            bg.update(grams)
    ctx = Counter()
    for (w1, _), c in bg.items():
        ctx[w1] += c
    v = len({w2 for _, w2 in bg})
    expected = {}
    for doc_id, grams in per_doc.items():
        s = 0
        for g in grams:
            p = (bg[g] + 1.0) / (ctx[g[0]] + float(v))
            s += math.floor((-math.log(p)) * float(LM_NLL_SCALE) + 0.5)
        avg = math.floor(((s / 1000000.0) / len(grams)) * 10000 + 0.5) / 10000
        ppl = math.floor(math.exp(avg) * 100 + 0.5) / 100
        expected[doc_id] = (len(grams), s, avg, ppl)

    got = {
        r["doc_id"]: (
            r["n_bigrams"],
            r["nll_micro_sum"],
            r["avg_nll"],
            r["ppl"],
        )
        for r in ngram_lm_perplexity(spark, sf).collect()
    }
    assert got == expected
