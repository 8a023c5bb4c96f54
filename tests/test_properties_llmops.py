"""Hypothesis property tests for the round-6 operators: exact Python
recomputes over randomized small corpora (the char_ngram_diversity
Counter-recompute pattern, randomized). Every compared number is exact
integer arithmetic until single IEEE divisions replicated in the same
order, so equality is bitwise — no approx.
"""

from __future__ import annotations

from collections import Counter, defaultdict
from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_pipeline__s3_to_postgres_s3_spark.operators.dedup import (
    SPAN_GRAM_DF_CAP,
    SPAN_GRAM_TOKENS,
    SPAN_MIN_RUN_GRAMS,
    exact_span_dedup,
    incremental_dedup_bloom,
)
from data_pipeline__s3_to_postgres_s3_spark.operators.dedup import (
    INCREMENTAL_NEW_FRAC_DEN,
    INCREMENTAL_NEW_FRAC_NUM,
)

PROP_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_token = st.sampled_from(["a", "b", "c"])
_doc_tokens = st.lists(_token, min_size=0, max_size=25)


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(rows, "doc_id bigint, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _expected_spans(docs: dict[int, list[str]]):
    k = SPAN_GRAM_TOKENS
    per_doc = {
        d: [tuple(t[i : i + k]) for i in range(len(t) - k + 1)]
        for d, t in docs.items()
    }
    df = Counter()
    for gs in per_doc.values():
        for g in set(gs):
            df[g] += 1
    heavy = {g for g, c in df.items() if c > SPAN_GRAM_DF_CAP}
    pos = {
        d: [(i + 1, g) for i, g in enumerate(gs) if g not in heavy]
        for d, gs in per_doc.items()
    }
    out = {}
    for da, db in combinations(sorted(per_doc), 2):
        matches = [
            (pa, pb)
            for pa, ga in pos[da]
            for pb, gb in pos[db]
            if ga == gb
        ]
        if not matches:
            continue
        by_diag = defaultdict(list)
        for pa, pb in matches:
            by_diag[pa - pb].append(pa)
        runs = []
        for pas in by_diag.values():
            pas.sort()
            run = 1
            for prev, cur in zip(pas, pas[1:]):
                if cur == prev + 1:
                    run += 1
                else:
                    runs.append(run)
                    run = 1
            runs.append(run)
        if max(runs) >= SPAN_MIN_RUN_GRAMS:
            out[(da, db)] = (
                len(matches),
                max(runs),
                max(runs) + k - 1,
            )
    return out


@PROP_SETTINGS
@given(
    token_lists=st.lists(_doc_tokens, min_size=2, max_size=4),
)
def test_exact_span_dedup_matches_python_recompute(
    spark, tmp_path_factory, token_lists
):
    tmp_path = tmp_path_factory.mktemp("span_prop")
    docs = {i + 1: t for i, t in enumerate(token_lists)}
    sf = _write_docs(
        spark, tmp_path, [(d, " ".join(t)) for d, t in docs.items()]
    )
    got = {
        (r["doc_a"], r["doc_b"]): (
            r["n_gram_matches"],
            r["max_run_grams"],
            r["longest_span_tokens"],
        )
        for r in exact_span_dedup(spark, sf).collect()
    }
    assert got == _expected_spans(docs)


@PROP_SETTINGS
@given(
    payloads=st.lists(
        st.integers(min_value=0, max_value=6), min_size=2, max_size=30
    ),
)
def test_incremental_dedup_bloom_matches_python_recompute(
    spark, tmp_path_factory, payloads
):
    """Random collision-heavy corpora: the bloom-prefiltered result must
    equal the exact cross-boundary dedup — no false negatives, canonical
    = min corpus doc_id, count = corpus copies."""
    tmp_path = tmp_path_factory.mktemp("bloom_prop")
    rows = [(i + 1, f"doc body {p}") for i, p in enumerate(payloads)]
    sf = _write_docs(spark, tmp_path, rows)
    got = sorted(
        tuple(r) for r in incremental_dedup_bloom(spark, sf).collect()
    )
    m = len(rows)
    thr = (m * INCREMENTAL_NEW_FRAC_NUM) // INCREMENTAL_NEW_FRAC_DEN
    corpus = defaultdict(list)
    for d, text in rows:
        if d < thr:
            corpus[text].append(d)
    want = sorted(
        (d, min(corpus[text]), len(corpus[text]))
        for d, text in rows
        if d >= thr and corpus.get(text)
    )
    assert got == want


@PROP_SETTINGS
@given(
    line_lists=st.lists(
        st.lists(_token, min_size=0, max_size=6), min_size=1, max_size=5
    ),
)
def test_gopher_repetition_matches_python_recompute(
    spark, tmp_path_factory, line_lists
):
    """Random multi-line docs (incl. empty lines and empty docs): every
    metric replicated exactly — dup-line fraction/char-fraction, top-2/3
    gram char fractions with the (count, charlen) tie rule, dup-5-gram
    overlap proxy."""
    from data_pipeline__s3_to_postgres_s3_spark.operators.curation import (
        gopher_repetition,
    )

    tmp_path = tmp_path_factory.mktemp("gopher_prop")
    text = "\n".join(" ".join(ln) for ln in line_lists)
    sf = _write_docs(spark, tmp_path, [(1, text)])
    r = gopher_repetition(spark, sf).collect()[0]

    lines = text.split("\n")
    words = [w for w in __import__("re").split(r"[ \t\n\r\f]+", text)]
    n_wchars = len(
        __import__("re").sub(r"[ \t\n\r\f]", "", text)
    )
    n_lchars = len(text.replace("\n", ""))

    assert r["n_lines"] == len(lines)
    assert r["dup_line_frac"] == 1.0 - len(set(lines)) / len(lines)
    lc = Counter(lines)
    dup_line_chars = sum(c * len(l) for l, c in lc.items() if c > 1)
    assert r["dup_line_char_frac"] == (
        dup_line_chars / n_lchars if n_lchars > 0 else 0.0
    )

    def grams(n):
        return [
            " ".join(words[i : i + n]) for i in range(len(words) - n + 1)
        ]

    def top_frac(n):
        gs = grams(n)
        if not gs or n_wchars == 0:
            return 0.0
        cnt = Counter(gs)
        c, charlen = max(
            (c, len(g) - (n - 1)) for g, c in cnt.items()
        )
        return (c * charlen) / n_wchars

    assert r["top_2gram_char_frac"] == top_frac(2)
    assert r["top_3gram_char_frac"] == top_frac(3)
    g5 = Counter(grams(5))
    dup5 = sum(c * (len(g) - 4) for g, c in g5.items() if c > 1)
    assert r["dup_5gram_char_frac"] == (
        dup5 / n_wchars if n_wchars > 0 else 0.0
    )


@PROP_SETTINGS
@given(
    doc_tokens=st.lists(
        st.lists(_token, min_size=1, max_size=8), min_size=3, max_size=12
    ),
)
def test_ccnet_buckets_equal_terciles_property(
    spark, tmp_path_factory, doc_tokens
):
    """Random corpora: NTILE(3) semantics — bucket sizes differ by at
    most one, sized largest-first, and the bucket assignment is monotone
    in (mean corpus token frequency DESC, doc_id ASC)."""
    from data_pipeline__s3_to_postgres_s3_spark.operators.curation import (
        ccnet_quality_buckets,
    )

    tmp_path = tmp_path_factory.mktemp("ccnet_prop")
    rows = [(i + 1, " ".join(t)) for i, t in enumerate(doc_tokens)]
    sf = _write_docs(spark, tmp_path, rows)
    got = sorted(
        ccnet_quality_buckets(spark, sf).collect(),
        key=lambda r: (-r["mean_tok_count"], r["doc_id"]),
    )
    n = len(rows)
    sizes = [n // 3 + (1 if b < n % 3 else 0) for b in range(3)]
    expected = (
        ["head"] * sizes[0] + ["middle"] * sizes[1] + ["tail"] * sizes[2]
    )
    assert [r["ppl_bucket"] for r in got] == expected
    # Mean = exact corpus-frequency mean (vocab K=256 covers everything
    # at this size).
    freq = Counter(t for toks in doc_tokens for t in toks)
    for r in got:
        toks = doc_tokens[r["doc_id"] - 1]
        assert r["sum_tok_counts"] == sum(freq[t] for t in toks)
        assert r["mean_tok_count"] == sum(freq[t] for t in toks) / len(toks)


@PROP_SETTINGS
@given(
    doc_lines=st.lists(
        st.lists(
            st.sampled_from(["nav bar", "Nav Bar ", "body x", "body y", ""]),
            min_size=1,
            max_size=5,
        ),
        min_size=1,
        max_size=8,
    ),
)
def test_line_dedup_matches_python_recompute(
    spark, tmp_path_factory, doc_lines
):
    """Random multi-line corpora with case/whitespace variants of the
    same boilerplate: census (lower/trim-normalized, DISTINCT docs,
    df >= 3), scrub-from-every-doc, and order-preserving kept_hash all
    replicated exactly."""
    import hashlib

    from data_pipeline__s3_to_postgres_s3_spark.operators.curation import (
        LINE_DF_CAP,
        line_dedup,
    )

    tmp_path = tmp_path_factory.mktemp("line_prop")
    rows = [(i + 1, "\n".join(ls)) for i, ls in enumerate(doc_lines)]
    sf = _write_docs(spark, tmp_path, rows)
    got = {r["doc_id"]: r for r in line_dedup(spark, sf).collect()}

    norm_docs = {
        d: [ln.strip().lower() for ln in text.split("\n")]
        for d, text in rows
    }
    df = Counter()
    for lines in norm_docs.values():
        for ln in set(lines):
            df[ln] += 1
    boiler = {ln for ln, c in df.items() if c >= LINE_DF_CAP}
    assert len(got) == len(rows)
    for d, lines in norm_docs.items():
        kept = [ln for ln in lines if ln not in boiler]
        r = got[d]
        assert r["n_lines"] == len(lines)
        assert r["n_kept"] == len(kept)
        assert r["kept_ratio"] == len(kept) / len(lines)
        assert r["kept_hash"] == hashlib.md5(
            "\n".join(kept).encode()
        ).hexdigest()
