"""Semantic pins for the dataset-assembly operators (operators/sampling.py).

The oracle gate proves engine parity; these tests pin the properties that
make the operators CORRECT for training pipelines: split assignments must
be stable when the corpus grows, proportions must track the bucket
boundaries, and packing must respect the token budget except for
single-oversized documents."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline__s3_to_postgres_s3_spark.operators.sampling import (
    MIXTURE_WEIGHTS,
    SEQ_LEN,
    corpus_stats,
    dataset_split,
    mixture_sample,
    pack_sequences,
)


def test_split_proportions_and_coverage(spark, sf_dir):
    df = dataset_split(spark, sf_dir)
    counts = {r["split"]: r["n"] for r in df.groupBy("split").agg(F.count("*").alias("n")).collect()}
    total = sum(counts.values())
    assert set(counts) == {"train", "val", "test"}
    # Multiplicative hashing over a contiguous id range lands near 80/10/10.
    assert 0.7 <= counts["train"] / total <= 0.9
    assert counts["val"] / total <= 0.2 and counts["test"] / total <= 0.2


def test_split_stable_under_corpus_growth(spark, sf_dir, tmp_path):
    """Appending documents must never reassign existing ones — the
    anti-leak property positional or fractional random splits lack."""
    full = {r["doc_id"]: r["split"] for r in dataset_split(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    half_ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    half_ids = sorted(half_ids)[: len(half_ids) // 2]
    docs.where(F.col("doc_id").isin(half_ids)).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    half = {
        r["doc_id"]: r["split"]
        for r in dataset_split(spark, str(tmp_path)).collect()
    }
    assert half == {k: v for k, v in full.items() if k in half}


def test_corpus_stats_totals_consistent(spark, sf_dir):
    stats = corpus_stats(spark, sf_dir).collect()
    docs_n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r["n_docs"] for r in stats) == docs_n
    for r in stats:
        assert r["p50_tokens"] <= r["p90_tokens"]
        assert 0 < r["mean_tokens"] <= r["total_tokens"]


def test_pack_sequences_budget_invariant(spark, sf_dir):
    """A document may only spill past its bin's budget if it STARTS inside
    it (contiguous packing's defining invariant): the preceding cumulative
    total of every doc lies inside its assigned bin."""
    df = pack_sequences(spark, sf_dir)
    bad = df.where(
        ((F.col("cum_tokens") - F.col("n_tokens")) / SEQ_LEN).cast("bigint")
        != F.col("bin")
    ).count()
    assert bad == 0
    # Bins are dense from 0 within every (lang, shard) stream.
    per_group = df.groupBy("lang", "shard").agg(
        F.min("bin").alias("lo"), F.max("bin").alias("hi"), F.count("*").alias("n")
    )
    assert per_group.where(F.col("lo") != 0).count() == 0


def test_mixture_sample_rates_and_independence(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    totals = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    kept = {
        r["lang"]: r["n"]
        for r in mixture_sample(spark, sf_dir).groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for lang, total in totals.items():
        rate = MIXTURE_WEIGHTS.get(lang, 100) / 100
        if rate == 1.0:
            assert kept.get(lang) == total  # keep-all languages intact
        else:
            assert abs(kept.get(lang, 0) / total - rate) < 0.15
    # The sampling decision must not correlate with the split assignment:
    # the downsampled language keeps ~the split's train share.
    split = dataset_split(spark, sf_dir).select("doc_id", "split")
    joint = (
        mixture_sample(spark, sf_dir)
        .where(F.col("lang") == "en")
        .join(split, "doc_id")
        .groupBy("split")
        .agg(F.count("*").alias("n"))
    )
    counts = {r["split"]: r["n"] for r in joint.collect()}
    assert 0.6 <= counts["train"] / sum(counts.values()) <= 0.95


def test_pack_sequences_deterministic(spark, sf_dir):
    a = sorted(map(tuple, pack_sequences(spark, sf_dir).collect()))
    b = sorted(map(tuple, pack_sequences(spark, sf_dir).collect()))
    assert a == b


def test_isqrt_col_exact(spark):
    """The corrected-FLOOR integer sqrt must equal math.isqrt everywhere —
    including perfect squares and their neighbors, where bare
    FLOOR(sqrt(double)) can land one off."""
    import math

    from data_pipeline__s3_to_postgres_s3_spark.operators.sampling import (
        _isqrt_col,
    )

    vals = sorted(
        {0, 1, 2, 3}
        | {k * k + d for k in (2, 3, 10, 100, 1000, 1 << 20, 1 << 26) for d in (-1, 0, 1)}
        | {10**6, 10**12, (1 << 52) - 1}
    )
    df = spark.createDataFrame([(v,) for v in vals], "n bigint")
    got = {r["n"]: r["s"] for r in df.select("n", _isqrt_col(F.col("n")).alias("s")).collect()}
    assert got == {v: math.isqrt(v) for v in vals}


def test_temperature_resample_quotas_exact(spark, sf_dir):
    """Per-source sample counts must equal the exact integer quota
    ⌊TARGET·√N_s / Σ√N_t⌋, and the α=1/2 flattening must shrink the head
    source's share relative to its raw corpus share."""
    import math

    from data_pipeline__s3_to_postgres_s3_spark.operators.sampling import (
        TEMPERATURE_TARGET,
        temperature_resample,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    counts = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    w = {s: math.isqrt(n) for s, n in counts.items()}
    total_w = sum(w.values())
    expected = {s: (w[s] * TEMPERATURE_TARGET) // total_w for s in w}

    got = {
        r["source"]: r["n"]
        for r in temperature_resample(spark, sf_dir)
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == {s: q for s, q in expected.items() if q > 0}
    assert sum(got.values()) <= TEMPERATURE_TARGET

    head = max(counts, key=counts.get)
    raw_share = counts[head] / sum(counts.values())
    sampled_share = got[head] / sum(got.values())
    assert sampled_share <= raw_share + 1e-9


def test_token_budget_report_accounting(spark, sf_dir):
    """Shares must sum to ~100 and the per-(lang,source) whitespace totals
    must re-aggregate to corpus_stats' per-lang totals (same corpus, two
    groupings — the cross-tab cannot invent or lose tokens)."""
    from data_pipeline__s3_to_postgres_s3_spark.operators.textops import (
        token_budget_report,
    )

    rows = token_budget_report(spark, sf_dir).collect()
    assert abs(sum(r["share_pct"] for r in rows) - 100.0) < 1e-3

    per_lang_ws: dict[str, int] = {}
    for r in rows:
        per_lang_ws[r["lang"]] = per_lang_ws.get(r["lang"], 0) + r["ws_tokens"]
    cs = {r["lang"]: r["total_tokens"] for r in corpus_stats(spark, sf_dir).collect()}
    assert per_lang_ws == cs


def test_chunk_documents_multi_chunk_and_coverage(spark, sf_dir, tmp_path):
    """The sf corpus is short-doc (1 chunk each), so pin the multi-chunk
    path on synthetic docs: stride placement, tail clamping, the
    drop-pure-suffix rule, and full token coverage."""
    from data_pipeline__s3_to_postgres_s3_spark.operators.sampling import (
        CHUNK_OVERLAP,
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        chunk_documents,
    )

    def words(n):
        return " ".join(f"w{i}" for i in range(n))

    rows = [
        (1, words(300)),   # starts 1, 97, 193 → lens 128, 128, 108
        (2, words(128)),   # exactly one budget
        (3, words(129)),   # 97 + 32 = 129 ≤ 129 → second chunk kept
        (4, words(100)),   # second start dropped (97+32 > 100)
        (5, words(2)),     # shorter than anything — still one chunk
    ]
    spark.createDataFrame(rows, "doc_id bigint, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))

    out = {}
    for r in chunk_documents(spark, str(tmp_path)).collect():
        out.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["start_token"], r["n_chunk_tokens"])
        )
    for d in out:
        out[d].sort()
    assert out[1] == [(0, 1, 128), (1, 97, 128), (2, 193, 108)]
    assert out[2] == [(0, 1, 128)]
    assert out[3] == [(0, 1, 128), (1, 97, 33)]
    assert out[4] == [(0, 1, 100)]
    assert out[5] == [(0, 1, 2)]
    # Full coverage + stride placement, generically:
    for doc_id, n in [(1, 300), (2, 128), (3, 129), (4, 100), (5, 2)]:
        covered = set()
        for idx, start, ln in out[doc_id]:
            assert start == 1 + idx * CHUNK_STRIDE
            assert ln == min(CHUNK_TOKENS, n - start + 1)
            covered.update(range(start, start + ln))
        assert covered == set(range(1, n + 1))
    assert CHUNK_STRIDE == CHUNK_TOKENS - CHUNK_OVERLAP


def test_chunk_documents_oracle_parity_on_multi_chunk_corpus(spark, tmp_path):
    """The sf corpora are short-doc, so the driver's oracle gate never
    exercises multi-chunk rows; pin Spark↔DuckDB parity on a corpus where
    it does (incl. the boundary cases above)."""
    import duckdb

    from data_pipeline__s3_to_postgres_s3_spark.operators.sampling import (
        chunk_documents,
    )
    from data_pipeline__s3_to_postgres_s3_spark.oracles.sampling import (
        CHUNK_DOCUMENTS,
    )

    rows = [
        (i, " ".join(f"w{j * i % 97}" for j in range(n)))
        for i, n in enumerate([300, 128, 129, 100, 2, 500, 97, 223])
    ]
    spark.createDataFrame(rows, "doc_id bigint, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))

    got = sorted(
        tuple(r)
        for r in chunk_documents(spark, str(tmp_path)).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    want = sorted(tuple(r) for r in con.execute(CHUNK_DOCUMENTS).fetchall())
    assert got == want


def test_weighted_sample_favors_heavy_docs(spark, sf_dir):
    """Sequential Poisson: the sampled docs' mean token count must exceed
    the corpus mean (inclusion probability ∝ token mass), the plan must
    be TakeOrdered (no global sort), and two runs must agree exactly."""
    from data_pipeline__s3_to_postgres_s3_spark.operators.sampling import (
        WEIGHTED_SAMPLE_K,
        weighted_sample_tokens,
    )

    df = weighted_sample_tokens(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    rows = df.collect()
    assert len(rows) == WEIGHTED_SAMPLE_K
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from pyspark.sql import functions as F

    corpus_mean = docs.select(
        F.avg(F.array_size(F.split("text", " ")))
    ).first()[0]
    sample_mean = sum(r["n_tokens"] for r in rows) / len(rows)
    assert sample_mean > corpus_mean
    assert sorted(tuple(r) for r in weighted_sample_tokens(spark, sf_dir).collect()) == sorted(
        tuple(r) for r in rows
    )


def test_dataset_card_reconciles_with_grouped_views(spark, sf_dir):
    """The global card must agree with the per-lang (corpus_stats) and
    per-source (per_source_report) views on every shared total — one
    corpus, three groupings, identical grand totals."""
    from data_pipeline__s3_to_postgres_s3_spark.operators.curation import (
        per_source_report,
    )
    from data_pipeline__s3_to_postgres_s3_spark.operators.sampling import (
        corpus_stats,
        dataset_card,
    )

    card = dataset_card(spark, sf_dir).collect()[0]
    by_lang = corpus_stats(spark, sf_dir).collect()
    by_source = per_source_report(spark, sf_dir).collect()
    assert card["n_docs"] == sum(r["n_docs"] for r in by_lang)
    assert card["n_docs"] == sum(r["n_docs"] for r in by_source)
    assert card["total_tokens"] == sum(r["total_tokens"] for r in by_lang)
    assert card["total_tokens"] == sum(r["total_tokens"] for r in by_source)
    assert card["n_langs"] == len(by_lang)
    assert card["n_sources"] == len(by_source)
    # Global exact-dup mass >= the per-source sum (cross-source dups only
    # collapse under the global distinct).
    assert card["n_exact_dups"] >= sum(r["n_exact_dups"] for r in by_source)
    assert 0.0 <= card["exact_dup_rate"] < 1.0


def test_pack_efficiency_report_reconciles_with_packer(spark, sf_dir):
    """The per-lang fill stats must equal a Python aggregation of the
    pack_sequences frame; fills are exact bin-token/SEQ_LEN ratios and
    overfull counting is integer."""
    import math

    from data_pipeline__s3_to_postgres_s3_spark.operators.sampling import (
        SEQ_LEN,
        pack_efficiency_report,
        pack_sequences,
    )

    bins: dict = {}
    for r in pack_sequences(spark, sf_dir).collect():
        k = (r["lang"], r["shard"], r["bin"])
        d = bins.setdefault(k, {"docs": 0, "toks": 0})
        d["docs"] += 1
        d["toks"] += r["n_tokens"]
    by_lang: dict = {}
    for (lang, _, _), d in bins.items():
        w = by_lang.setdefault(lang, {"bins": 0, "docs": 0, "toks": 0, "fills": [], "over": 0})
        w["bins"] += 1
        w["docs"] += d["docs"]
        w["toks"] += d["toks"]
        w["fills"].append(d["toks"] / SEQ_LEN)
        w["over"] += d["toks"] > SEQ_LEN
    got = {r["lang"]: r for r in pack_efficiency_report(spark, sf_dir).collect()}
    assert set(got) == set(by_lang)
    for lang, w in by_lang.items():
        g = got[lang]
        assert (g["n_bins"], g["n_docs"], g["total_tokens"], g["overfull_bins"]) == (
            w["bins"], w["docs"], w["toks"], w["over"]
        ), lang
        assert g["min_fill"] == min(w["fills"])
        assert g["max_fill"] == max(w["fills"])
        mean = sum(w["fills"]) / len(w["fills"])
        assert abs(g["mean_fill"] - math.floor(mean * 1e6 + 0.5) / 1e6) < 2e-6


def test_split_hash_survives_wide_64bit_doc_ids(spark, sf_dir, tmp_path):
    """r9 scale-probe regression pin: 9e9-range doc_ids overflowed the
    naive (doc_id · HASH_MULT) product under ANSI on BOTH engines
    (tools/scale_probe.py caught split_leakage_report and
    compact_manifest dying with ARITHMETIC_OVERFLOW). The split_hash
    chokepoint's 16-bit-split mulmod must (1) run on wide ids without
    overflow, (2) equal the naive arithmetic computed in unbounded
    Python, and (3) stay oracle-mirrored end-to-end."""
    import shutil

    import duckdb

    from data_pipeline__s3_to_postgres_s3_spark.catalog import TABLES
    from data_pipeline__s3_to_postgres_s3_spark.operators.sampling import (
        HASH_MOD,
        HASH_MULT,
        SPLIT_BUCKETS,
        TRAIN_UPTO,
        VAL_UPTO,
        dataset_split,
    )
    from data_pipeline__s3_to_postgres_s3_spark.registry import ORACLES

    from .oracle_harness import compare, duckdb_connection

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    for t in TABLES:
        if t != "documents":
            shutil.copy(f"{sf_dir}/{t}.parquet", str(tmp_path / f"{t}.parquet"))
    src = pq.read_table(f"{sf_dir}/documents.parquet")
    wide_ids = pc.add(src.column("doc_id"), 9_000_000_000)
    src = src.set_column(
        src.schema.get_field_index("doc_id"), "doc_id", wide_ids
    )
    pq.write_table(src, str(tmp_path / "documents.parquet"))

    rows = dataset_split(spark, str(tmp_path)).collect()
    assert rows, "wide-id split produced no rows"
    for r in rows[:500]:
        b = (r["doc_id"] * HASH_MULT) % HASH_MOD % SPLIT_BUCKETS
        assert r["bucket"] == b, r
        want = "train" if b < TRAIN_UPTO else ("val" if b < VAL_UPTO else "test")
        assert r["split"] == want, r

    con = duckdb_connection(str(tmp_path))
    try:
        for name in ("dataset_split", "mixture_sample", "shard_manifest"):
            from data_pipeline__s3_to_postgres_s3_spark.registry import QUERIES

            rep = compare(QUERIES[name](spark, str(tmp_path)), con, ORACLES[name])
            assert rep["ok"], (name, rep)
    finally:
        con.close()
