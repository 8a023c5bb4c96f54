"""Dataset assembly operators for training-data pipelines: deterministic
splits, corpus statistics, sequence packing.

These are the operations that sit between "clean corpus" (textops/dedup)
and "training shards": reproducible train/val/test assignment, the token
accounting that drives mixture decisions, and packing documents into
fixed token budgets. All pure JVM built-ins — no Python UDFs — and every
expression is replicated verbatim in the DuckDB oracles
(oracles/sampling.py; keep in lockstep).

Scale notes (100 TB):
- dataset_split is a stateless map over the scan — no shuffle at all. The
  split is a function of doc_id alone (multiplicative hashing), so it is
  stable under corpus growth and across engines — appending documents
  never reassigns existing ones, unlike positional/random splits.
- corpus_stats is one groupBy(lang) with map-side partial aggregation;
  the exact percentiles are the expensive part (per-group sort) — at
  production scale swap in percentile_approx and keep the same surface.
- pack_sequences windows over (lang, shard) where shard buckets ~10k docs:
  packing needs an order, but a single per-lang window would serialize a
  43%-skewed 'en' partition; sharding bounds every window partition while
  keeping bins deterministic (bin ids are unique per (lang, shard)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..config import DEFAULT_CONFIG, EngineConfig
from ..functions.numeric import portable_round

# Knuth multiplicative hash: exact bigint arithmetic in Spark and DuckDB,
# so the assignment is engine-portable (no engine-specific hash function).
HASH_MULT = 2654435761
HASH_MOD = 2**32
SPLIT_BUCKETS = 100
TRAIN_UPTO = 80  # buckets [0,80) → train
VAL_UPTO = 90  # [80,90) → val, [90,100) → test


def split_hash(col: F.Column, salt: int = 0) -> F.Column:
    """((col + salt) · HASH_MULT) mod HASH_MOD, overflow-safe for the
    full non-negative int64 id range — THE single split-hash chokepoint
    (r9 scale probe: 9e9-range doc_ids overflowed the naive product
    under ANSI on BOTH engines; every split/sample consumer and every
    oracle routes through this pair now).

    HASH_MOD = 2^32 is a power of two, so the residue depends only on
    the low 32 bits of each factor: reduce the salted id mod 2^32,
    split it into 16-bit halves, and fold — every intermediate stays
    below 2^49, and the result is ALGEBRAICALLY IDENTICAL to the naive
    (col·m) % 2^32 for every id, so committed driver hashes and all
    sf results are unchanged. Mirrored token-for-token by
    ``split_hash_sql``.

    The salted residue is pmod, not %, so NEGATIVE ids hash identically
    on both engines (r13 negative-id probe: Spark's two's-complement
    bitwiseAND of a negative residue disagreed with DuckDB's signed %;
    pmod == % for every non-negative id, so clean-corpus hashes are
    bit-unchanged)."""
    a = F.pmod(col + F.lit(salt), F.lit(HASH_MOD))
    hi = F.shiftright(a.cast("long"), 16)
    lo = a.cast("long").bitwiseAND(F.lit(65535))
    return (
        ((hi * HASH_MULT) % 65536) * 65536 + lo * HASH_MULT
    ) % HASH_MOD


def split_hash_sql(expr: str = "doc_id", salt: int = 0) -> str:
    """DuckDB twin of ``split_hash`` (// and % mirror shiftright/mask
    once the salted residue is forced non-negative — the pmod twin)."""
    a = f"(((({expr}) + {salt}) % {HASH_MOD} + {HASH_MOD}) % {HASH_MOD})"
    hi = f"(({a}) // 65536)"
    lo = f"(({a}) % 65536)"
    return (
        f"((({hi} * {HASH_MULT}) % 65536) * 65536"
        f" + {lo} * {HASH_MULT}) % {HASH_MOD}"
    )

SEQ_LEN = 2048  # token budget per packed sequence
PACK_SHARD = 10_000  # docs per packing shard (bounds window partitions)


def _bucket() -> F.Column:
    return split_hash(F.col("doc_id")) % SPLIT_BUCKETS


def dataset_split(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Reproducible 80/10/10 train/val/test assignment per document.

    Hash-based (not positional, not random): re-running on a grown corpus
    keeps every existing assignment, and any engine computing the same
    arithmetic lands on the same split — the property training pipelines
    need for leak-free evaluation sets."""
    docs = load_table(spark, sf_dir, "documents")
    b = _bucket()
    return docs.select(
        "doc_id",
        "lang",
        "source",
        b.alias("bucket"),
        F.when(b < TRAIN_UPTO, "train")
        .when(b < VAL_UPTO, "val")
        .otherwise("test")
        .alias("split"),
    )


def corpus_stats(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Per-language corpus accounting: doc/token/char totals, mean and
    exact p50/p90 token counts — the numbers mixture weighting reads.
    Exact percentiles sort per group; at production scale substitute
    percentile_approx (same column surface)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.array_size(F.split(F.col("text"), " "))
    per_doc = docs.select("lang", toks.alias("n_tokens"), F.length("text").alias("n_chars"))
    n = F.count(F.lit(1))
    # Doubles are portable_round-ed at scale 6 on both sides (CLAUDE.md
    # float rule) so interpolated-percentile ulps can never flip a hash;
    # the oracle twin casts its HUGEINT sums back to BIGINT.
    return (
        per_doc.groupBy("lang")
        .agg(
            n.alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_chars").alias("total_chars"),
            portable_round(F.sum("n_tokens").cast("double") / n, 6).alias("mean_tokens"),
            portable_round(F.percentile("n_tokens", F.lit(0.5)), 6).alias("p50_tokens"),
            portable_round(F.percentile("n_tokens", F.lit(0.9)), 6).alias("p90_tokens"),
        )
    )


# Mixture weights: per-language keep rates (percent) for corpus mixing —
# the up/down-sampling step that turns raw corpus proportions into a
# training distribution. Unlisted languages keep everything.
MIXTURE_WEIGHTS = {"en": 50, "zh": 100, "de": 100, "fr": 100, "es": 100}
MIXTURE_SALT = 7  # decorrelates the sampling hash from dataset_split's


def mixture_sample(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Deterministic weighted corpus mixing: keep each document with its
    language's configured rate, decided by the same multiplicative hashing
    as dataset_split (salted so the two decisions are independent).
    Shuffle-free, reproducible, and stable under corpus growth — the
    properties random sampling lacks in an incremental pipeline."""
    docs = load_table(spark, sf_dir, "documents")
    b = split_hash(F.col("doc_id"), MIXTURE_SALT) % SPLIT_BUCKETS
    rate = F.coalesce(
        *[
            F.when(F.col("lang") == lang, F.lit(pct))
            for lang, pct in sorted(MIXTURE_WEIGHTS.items())
        ],
        F.lit(100),
    )
    return docs.select(
        "doc_id", "lang", "source", b.alias("bucket"), rate.alias("keep_pct")
    ).where(b < rate)


# Exact per-stratum quotas (percent of each language kept) — the
# complement to mixture_sample's RATE-based keep: a rate gives each doc an
# independent verdict (count only approximately targets rate·N); a QUOTA
# ranks the stratum by salted hash and cuts at exactly floor(N·pct/100) —
# what a budgeted mixture spec demands.
STRATIFIED_SALT = 9_176_623
STRATIFIED_QUOTA_PCT = {"en": 35, "de": 60, "fr": 55, "es": 50, "zh": 45}


def stratified_sample(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Exact-quota stratified sampling: per language, keep exactly
    floor(N_lang · pct / 100) documents, selected by salted-hash rank —
    deterministic, engine-portable, and leak-decorrelated from both the
    split and the mixture decisions (different salt).

    Scale shape: ONE shuffle on lang for the per-stratum window. Exact
    quotas inherently rank within the stratum; Spark's window sort is
    distributed per partition, and a skewed stratum ('en' at ~40%) is
    bounded by that language's size, not the corpus — at larger scale the
    same surface swaps to rate-keep + exact trim of the boundary bucket.
    Row_number ties cannot occur: (hash, doc_id) is unique per doc."""
    docs = load_table(spark, sf_dir, "documents")
    h = split_hash(F.col("doc_id"), STRATIFIED_SALT)
    rank_w = Window.partitionBy("lang").orderBy("h", "doc_id")
    count_w = Window.partitionBy("lang")
    pct = F.coalesce(
        *[
            F.when(F.col("lang") == lang, F.lit(p))
            for lang, p in sorted(STRATIFIED_QUOTA_PCT.items())
        ],
        F.lit(100),
    )
    return (
        docs.select("doc_id", "lang", "source", h.alias("h"))
        .withColumn("rn", F.row_number().over(rank_w))
        .withColumn(
            "quota",
            F.floor(F.count(F.lit(1)).over(count_w) * pct / 100).cast("long"),
        )
        .where(F.col("rn") <= F.col("quota"))
        .select("doc_id", "lang", "source", F.col("rn").alias("sample_rank"))
    )


# Uniform / per-group k-samples — the remaining two sampling shapes
# (alongside split, rate-mixture, and exact-quota stratified): a global
# k-document sample and a fixed k per group. Hash-rank-then-cut is the
# distributed equivalent of reservoir sampling: under the hash's
# uniformity every document is equally likely, but the result is
# deterministic, engine-portable, and re-runnable (true reservoirs are
# order-dependent and irreproducible across engines).
UNIFORM_SAMPLE_SALT = 4_481_249
UNIFORM_SAMPLE_K = 100
GROUP_SAMPLE_K = 20


def _sample_hash(salt: int) -> F.Column:
    return split_hash(F.col("doc_id"), salt)


def uniform_sample_k(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Global uniform k-sample without replacement: the k smallest salted
    hashes. Plan: TakeOrderedAndProject — each partition contributes its
    local top-k and only k rows merge at the driver side; no full sort,
    no full shuffle, scales to any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id", "lang", "source", _sample_hash(UNIFORM_SAMPLE_SALT).alias("h")
        )
        .orderBy("h", "doc_id")
        .limit(UNIFORM_SAMPLE_K)
    )


def sample_k_per_group(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Exactly GROUP_SAMPLE_K docs per language (fewer if the stratum is
    smaller) by salted-hash rank — the per-group twin of uniform_sample_k;
    one shuffle on lang for the rank window."""
    docs = load_table(spark, sf_dir, "documents")
    h = _sample_hash(UNIFORM_SAMPLE_SALT)
    w = Window.partitionBy("lang").orderBy("h", "doc_id")
    return (
        docs.select("doc_id", "lang", "source", h.alias("h"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= GROUP_SAMPLE_K)
        .select("doc_id", "lang", "source", F.col("rn").alias("sample_rank"))
    )


# Overlapping fixed-token chunking (RAG/context-window prep): chunks of
# CHUNK_TOKENS whitespace tokens starting every CHUNK_STRIDE tokens, so
# consecutive chunks share CHUNK_OVERLAP tokens of context. A start is
# kept iff it is the first OR at least OVERLAP+1 tokens remain — every
# token is covered and no chunk is a pure suffix of its predecessor.
CHUNK_TOKENS = 128
CHUNK_OVERLAP = 32
CHUNK_STRIDE = CHUNK_TOKENS - CHUNK_OVERLAP  # 96


def chunk_frame(docs: DataFrame, carry: tuple[str, ...] = ()) -> DataFrame:
    """Frame-level chunking kernel (see chunk_documents): expand a frame
    with doc_id/text into one row per overlapping chunk, carrying any
    extra columns named in ``carry`` (the curation pipeline threads
    split/lang through)."""
    toks = docs.select("doc_id", *carry, F.split("text", " ").alias("t"))
    starts = (
        f"filter(sequence(1, size(t), {CHUNK_STRIDE}),"
        f" s -> s = 1 OR s + {CHUNK_OVERLAP} <= size(t))"
    )
    ch = toks.select(
        "doc_id",
        *carry,
        "t",
        F.posexplode(F.expr(starts)).alias("chunk_idx", "start_token"),
    )
    chunk = F.expr(f"slice(t, start_token, {CHUNK_TOKENS})")
    return ch.select(
        "doc_id",
        *carry,
        "chunk_idx",
        "start_token",
        F.array_size(chunk).alias("n_chunk_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_hash"),
    )


def chunk_documents(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Split every document into overlapping fixed-token-budget chunks —
    the retrieval/context-window twin of pack_sequences (packing joins
    SMALL docs into one budget; chunking splits LARGE docs across many).
    Output: (doc_id, chunk_idx, start_token, n_chunk_tokens, chunk_hash)
    with the hash standing in for the chunk text so the result stays
    compact and oracle-hashable.

    Physical shape: ZERO shuffle — chunk starts are a filtered stride
    sequence computed per row, expanded with posexplode (a generator, not
    an exchange), each chunk a slice of the token array. The plan is
    scan → generate → project; parallelism is the scan's, and a 100 TB
    corpus chunks at scan speed."""
    return chunk_frame(load_table(spark, sf_dir, "documents"))


# Temperature-weighted source rebalancing: quotas ∝ N_src^(1/2), i.e. the
# standard temperature-sampling exponent α = 1/τ with τ = 2 that
# multilingual/multi-source training mixes use to up-weight small sources
# without letting the head source dominate. α = 1/2 specifically so the
# weight is an EXACT integer sqrt — quotas stay engine-portable integer
# arithmetic with no float pow/sum whose association could differ.
TEMPERATURE_SALT = 13_371_337
TEMPERATURE_TARGET = 120  # total docs in the resampled mixture


def _isqrt_col(n: F.Column) -> F.Column:
    """⌊√n⌋ exactly: FLOOR(sqrt(double)) can land one off on either side
    near perfect squares (sqrt rounds to nearest ulp), so correct the
    candidate by exact integer comparison — identical CASE form in the
    oracle, so both engines agree on every n."""
    s = F.floor(F.sqrt(n.cast("double"))).cast("long")
    return (
        s
        + F.when((s + 1) * (s + 1) <= n, F.lit(1)).otherwise(F.lit(0))
        - F.when(s * s > n, F.lit(1)).otherwise(F.lit(0))
    )


def temperature_resample(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Exact-quota temperature resampling across sources: source s gets
    quota_s = ⌊TARGET · √N_s / Σ_t √N_t⌋ documents, selected by salted-hash
    rank within the source — the α=1/2 temperature flattening that keeps
    head sources from dominating a training mix while small feeds keep
    presence proportional to √size.

    Everything that decides membership is EXACT integer arithmetic:
    integer sqrt (corrected FLOOR — see _isqrt_col), integer Σ, and
    ⌊w·T/Σ⌋ computed as (x − x mod Σ)/Σ (x − x%Σ is an exact multiple, and
    IEEE division of exact ratios is exact) — so Spark and the oracle land
    on identical quotas with no float pow/sum association hazard.

    Scale shape: source stats are a groupBy the size of the source list;
    the grand total is a 1-row aggregate broadcast back (scalar-injection
    crossJoin, cf. relational.py); ranked membership is ONE shuffle on
    source for the rank window — same shape as stratified_sample, same
    skew bound (a stratum's window is its own size, not the corpus)."""
    docs = load_table(spark, sf_dir, "documents")
    weights = (
        docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_src"))
        .select("source", _isqrt_col(F.col("n_src")).alias("w"))
    )
    total = weights.agg(F.sum("w").alias("t"))
    x = F.col("w") * TEMPERATURE_TARGET
    quotas = weights.crossJoin(F.broadcast(total)).select(
        "source", ((x - x % F.col("t")) / F.col("t")).cast("long").alias("quota")
    )
    h = split_hash(F.col("doc_id"), TEMPERATURE_SALT)
    w = Window.partitionBy("source").orderBy("h", "doc_id")
    return (
        docs.select("doc_id", "lang", "source", h.alias("h"))
        .withColumn("rn", F.row_number().over(w))
        .join(F.broadcast(quotas), "source")
        .where(F.col("rn") <= F.col("quota"))
        .select("doc_id", "lang", "source", F.col("rn").alias("sample_rank"))
    )


def pack_sequences(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Contiguous sequence packing: stream documents in stable (doc_id)
    order within (lang, shard), accumulate whitespace-token counts, and
    assign each document to the SEQ_LEN-token bin its preceding cumulative
    total lands in. Deterministic, shuffle-bounded (the window partitions
    are ≤ PACK_SHARD docs), and the standard cheap alternative to
    NP-hard bin packing for training-shard assembly."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.array_size(F.split(F.col("text"), " "))
    shard = (F.col("doc_id") / PACK_SHARD).cast("bigint")
    per_doc = docs.select(
        "doc_id", "lang", toks.alias("n_tokens"), shard.alias("shard")
    )
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return per_doc.select(
        "doc_id",
        "lang",
        "shard",
        "n_tokens",
        cum.alias("cum_tokens"),
        F.floor((cum - F.col("n_tokens")) / F.lit(SEQ_LEN))
        .cast("bigint")
        .alias("bin"),
    )


WEIGHTED_SAMPLE_K = 80
WEIGHTED_SAMPLE_SALT = 424_242


def weighted_sample_tokens(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Token-weighted k-sample without replacement — sequential Poisson
    sampling (Ohlsson 1998, the order-sampling scheme survey statistics
    uses for probability-proportional-to-size draws): each doc gets
    priority u/w where u is its salted uniform hash and w its token
    count; the K SMALLEST priorities are the sample, so heavy documents
    (large w → small priority) are proportionally favored. This is the
    deterministic weighted complement of uniform_sample_k for budget-
    aware corpus draws (sample by token mass, not by doc count).

    Portability: the priority is a SINGLE IEEE division of two exact
    longs (hash, n_tokens) — no pow/log transform (the classic
    Efraimidis–Spirakis u^(1/w) key needs libm pow, whose ulps differ
    across engines); ties are impossible modulo hash collisions and
    broken by doc_id anyway.

    Plan: TakeOrderedAndProject, same as uniform_sample_k — each
    partition ships only its local top-K, no global sort at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    w_tok = F.array_size(F.split("text", " ")).cast("long")
    pri = _sample_hash(WEIGHTED_SAMPLE_SALT).cast("double") / w_tok
    return (
        docs.select(
            "doc_id",
            "lang",
            "source",
            w_tok.alias("n_tokens"),
            pri.alias("priority"),
        )
        .orderBy("priority", "doc_id")
        .limit(WEIGHTED_SAMPLE_K)
    )


def dataset_card(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """One-row global dataset card — the summary a curation pipeline
    publishes beside its shards (the global twin of corpus_stats' per-lang
    and per_source_report's per-source views, reconciling with both):
    corpus size, vocabulary-of-sources breadth, token/char volume, exact
    duplicate mass, and the token-length distribution.

    Scale shape: ONE scan into ONE 1-row aggregate; the dup counter rides
    the same aggregate via count_distinct(md5) — no self-join, no second
    pass. Exact percentiles buffer per group at production scale →
    percentile_approx swap (corpus_stats precedent, same column
    surface)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.array_size(F.split(F.col("text"), " "))
    per_doc = docs.select(
        "lang",
        "source",
        F.md5("text").alias("h"),
        toks.alias("n_tokens"),
        F.length("text").alias("n_chars"),
    )
    n = F.count(F.lit(1))
    n_dups = n - F.count_distinct("h")
    return per_doc.agg(
        n.alias("n_docs"),
        F.count_distinct("lang").alias("n_langs"),
        F.count_distinct("source").alias("n_sources"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        n_dups.alias("n_exact_dups"),
        # when-guards: NULL (DuckDB's x/0), not an ANSI error, on an
        # empty corpus — r12 empty-table probe.
        F.when(
            n > 0, portable_round(n_dups.cast("double") / n, 6)
        ).alias("exact_dup_rate"),
        F.when(
            n > 0,
            portable_round(F.sum("n_tokens").cast("double") / n, 6),
        ).alias("mean_tokens"),
        portable_round(F.percentile("n_tokens", F.lit(0.5)), 6).alias(
            "p50_tokens"
        ),
        portable_round(F.percentile("n_tokens", F.lit(0.9)), 6).alias(
            "p90_tokens"
        ),
        F.max("n_tokens").alias("max_tokens"),
    )


def pack_efficiency_report(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Packing-waste audit per language: how full the packed sequences
    actually are — the number a training-cost owner watches, since every
    unfilled token in a bin is paid GPU time (and chronic overfull bins
    mean documents straddle sequence boundaries and lose context).

    Composition: the bin assignment IS pack_sequences (shared frame —
    the audit can never disagree with the packer). Per (lang, shard,
    bin) the doc/token totals reduce first (map-side combine), then per
    lang: bin count, mean fill (rounded at 1e-6 — distributed-avg
    class), exact min/max fill, and the count of overfull bins — the
    overfull test compares INTEGER token sums against SEQ_LEN, never a
    float. fill = bin_tokens / SEQ_LEN is one division by a constant,
    identical token stream in the oracle."""
    from ..functions.numeric import portable_round

    packed = pack_sequences(spark, sf_dir, cfg)
    bins = (
        packed.groupBy("lang", "shard", "bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("bin_tokens"),
        )
    )
    fill = F.col("bin_tokens").cast("double") / F.lit(SEQ_LEN).cast("double")
    return (
        bins.select(
            "lang",
            "n_docs",
            "bin_tokens",
            fill.alias("fill"),
            (F.col("bin_tokens") > SEQ_LEN).cast("int").alias("overfull"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bins"),
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("bin_tokens").cast("long").alias("total_tokens"),
            portable_round(F.avg("fill"), 6).alias("mean_fill"),
            F.min("fill").alias("min_fill"),
            F.max("fill").alias("max_fill"),
            F.sum("overfull").cast("long").alias("overfull_bins"),
        )
    )
