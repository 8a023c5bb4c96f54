"""Similarity search over the embeddings table (array<float> column).

Two tiers, as a 100 TB engine needs both:
- brute-force cosine top-k — the exact baseline: broadcast the (small) query
  set against the corpus, fold the dot product with ``aggregate``/``zip_with``
  (JVM-side, sequential ⇒ deterministic), partition-local top-k via window.
  Cost O(|Q|·N·d) but embarrassingly parallel with NO shuffle of the corpus:
  each partition scores its slice, the window's top-k shuffles only |Q|·k
  candidate rows per partition (AQE prunes further).
- sign-LSH bucketed top-k — the scale path: bucket = sign bits of the first
  8 dimensions (a fixed random-hyperplane family; deterministic here so the
  oracle can replicate it). Queries probe only their own bucket ⇒ corpus
  scan shrinks ~256×; recall measured against the brute-force baseline in
  tests. An IVF variant would learn centroids instead; the plumbing is the
  same bucket-equi-join.

Cosines are compared after portable rounding (functions/numeric.py) so
ordering ties break identically in Spark and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..config import DEFAULT_CONFIG, EngineConfig
from ..functions.numeric import portable_round

N_QUERIES = 8  # fixed query set: vec_id < 8
TOP_K = 5
NEARDUP_COSINE = 0.45
LSH_BITS = 8

_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
    " CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
)


def _cosine(a: str, b: str, na: str, nb: str) -> F.Column:
    return F.expr(_DOT.format(a=a, b=b)) / (F.col(na) * F.col(nb))


def _with_norm(df: DataFrame, vec: str = "embedding") -> DataFrame:
    return df.withColumn(
        "norm", F.sqrt(F.expr(_DOT.format(a=vec, b=vec)))
    )


def similarity_bruteforce_topk(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Exact cosine top-5 for each query vector (vec_id < 8) over the whole
    corpus (self-matches excluded)."""
    emb = _with_norm(load_table(spark, sf_dir, "embeddings"))
    queries = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_embedding"),
        F.col("norm").alias("q_norm"),
    )
    pairs = emb.crossJoin(F.broadcast(queries)).where(
        F.col("vec_id") != F.col("query_id")
    )
    sim = portable_round(
        _cosine("q_embedding", "embedding", "q_norm", "norm"), 4
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        pairs.select("query_id", "vec_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
    )


def similarity_lsh_topk(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Approximate top-5: candidates restricted to the query's sign-LSH
    bucket (first 8 dims' sign bits), then exact cosine within the bucket.
    Same output shape as the brute-force baseline for recall measurement."""
    emb = _with_norm(load_table(spark, sf_dir, "embeddings"))
    bucket = F.concat(
        *[
            F.when(F.expr(f"CAST(element_at(embedding, {i + 1}) AS DOUBLE)") >= 0,
                   F.lit("1")).otherwise(F.lit("0"))
            for i in range(LSH_BITS)
        ]
    )
    emb = emb.withColumn("bucket", bucket)
    queries = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_embedding"),
        F.col("norm").alias("q_norm"),
        F.col("bucket").alias("q_bucket"),
    )
    pairs = emb.join(
        F.broadcast(queries),
        (F.col("bucket") == F.col("q_bucket"))
        & (F.col("vec_id") != F.col("query_id")),
    )
    sim = portable_round(
        _cosine("q_embedding", "embedding", "q_norm", "norm"), 4
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        pairs.select("query_id", "vec_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
    )


def embedding_neardup_pairs(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos ≥ 0.45) found via the
    sign-LSH buckets — the embedding-space member of the dedup ladder.
    Bucket-equi-join keeps the pair space bucket-local (≈N²/2^bits)."""
    emb = _with_norm(load_table(spark, sf_dir, "embeddings"))
    bucket = F.concat(
        *[
            F.when(F.expr(f"CAST(element_at(embedding, {i + 1}) AS DOUBLE)") >= 0,
                   F.lit("1")).otherwise(F.lit("0"))
            for i in range(LSH_BITS)
        ]
    )
    emb = emb.withColumn("bucket", bucket)
    a = emb.alias("a")
    b = emb.alias("b")
    sim = portable_round(
        F.expr(_DOT.format(a="a.embedding", b="b.embedding"))
        / (F.col("a.norm") * F.col("b.norm")),
        4,
    )
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            sim.alias("sim"),
        )
        .where(F.col("sim") >= NEARDUP_COSINE)
    )
