"""Skew-handling join strategies for 100 TB workloads.

AQE's skew-join splitting (enabled in session.py) handles most cases at
runtime, but two situations still need explicit treatment on a cluster:
a single hot key whose one-partition sort would OOM even after splitting
(AQE splits partitions, not the sort of one key on the build side), and
aggregations where one group dominates. The two standard remedies:

- ``salted_join``: replicate the small side R times and scatter the big
  side's hot keys across R salt buckets — the hot key's rows spread over R
  tasks instead of one. Semantics-preserving for inner/left joins on
  equi-keys; cost is an R× blowup of the (small) right side, so R trades
  parallelism against broadcast size.
- ``two_phase_agg``: partial aggregate on (key, salt) first, then final
  aggregate on key — the classic map-side-combine generalization for
  algebraic aggregates when one group holds a large share of all rows.
  (Spark's hash aggregate already does partial aggregation per TASK; the
  explicit salt phase matters for non-algebraic flows like collect_list
  or when feeding a windowed top-k.)

Both are pure DataFrame algebra — tested for exact equivalence with their
unsalted twins in tests/test_skew.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..config import DEFAULT_CONFIG, EngineConfig
from ..functions.numeric import cents

DEFAULT_SALT = 8


def _round_robin_salt(salt: int) -> Column:
    """Deterministic-per-layout round-robin bucket: spreads the rows of any
    single key over `salt` buckets even when every column is constant."""
    return F.pmod(F.monotonically_increasing_id(), F.lit(salt)).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = DEFAULT_SALT,
) -> DataFrame:
    """Equi-join with the big side's keys scattered over `salt` buckets.

    big gets a random-free salt from `monotonically_increasing_id() % salt`
    — a round-robin over each task's row sequence, so rows of ONE key
    spread across buckets regardless of row content. (Hashing the non-key
    columns fails two edge cases: a frame whose only column is the join key
    has nothing to hash, and constant non-key rows all land in one salt —
    exactly the hot-key scenario the salt exists for.) The salt value is
    partitioning-dependent but never observable: small is exploded ×salt so
    every (key, salt) bucket finds its match, and _salt is dropped.
    """
    big_salted = big.withColumn("_salt", _round_robin_salt(salt))
    small_salted = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return big_salted.join(small_salted, [on, "_salt"], how).drop("_salt")


def two_phase_agg(
    df: DataFrame,
    key: str,
    agg_col: Column,
    alias: str,
    salt: int = DEFAULT_SALT,
    *,
    more: tuple[tuple[Column, str], ...] = (),
) -> DataFrame:
    """SUM-shaped aggregation in two phases: (key, salt) partials, then the
    final combine on key. agg_col must be an algebraic sum-like expression
    (SUM of anything, COUNT via SUM(1)). Additional (agg_col, alias)
    pairs ride the SAME partial pass via the keyword-only ``more`` —
    one scan however many sums the caller needs (keyword-only so a
    caller adding extra aggregates never has to re-pass ``salt``
    positionally just to reach it — ADVICE r9)."""
    aggs = [(agg_col, alias), *more]
    salted = df.withColumn("_salt", _round_robin_salt(salt))
    partial = salted.groupBy(key, "_salt").agg(
        *[c.alias(f"_partial{i}") for i, (c, _) in enumerate(aggs)]
    )
    return partial.groupBy(key).agg(
        *[F.sum(f"_partial{i}").alias(a) for i, (_, a) in enumerate(aggs)]
    )


def salted_brand_revenue(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Per-brand lineitem revenue computed through BOTH explicit skew
    remedies — the registry-exposed (driver-hashable) instance of this
    module: `salted_join` scatters the lineitem→part equi-join (p_brand
    has ~25 values over every lineitem row: the classic low-cardinality
    hot-key join where one brand's rows would otherwise sort in one
    task), then `two_phase_agg` runs the (brand, salt)-partial /
    brand-final aggregation for both the count and the revenue sum.

    The oracle is the PLAIN join+group SQL — the driver hash is the
    cross-engine proof that salting redistributes work without moving a
    single row or cent (the local equivalence pins in test_skew.py are
    the synthetic-skew twins of this check).

    Scale shape: the salt multiplies only the SMALL side (part × 8), the
    big side gets a constant-free round-robin bucket; revenue
    accumulates in exact integer 1e-4 units (combine-order-free), so the
    two-phase split cannot change the result. Output is |brands| rows.

    Determinism: integer sums; one final division for display."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("partkey"),
        cents(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
        ).alias("rev_c"),
    )
    dim = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("partkey"), "p_brand"
    )
    joined = salted_join(li, dim, "partkey", "inner")
    agged = two_phase_agg(
        joined,
        "p_brand",
        F.count(F.lit(1)),
        "n_lines",
        more=((F.sum("rev_c"), "rev_sum"),),
    )
    return agged.select(
        F.col("p_brand").alias("brand"),
        F.col("n_lines").cast("long").alias("n_lines"),
        (F.col("rev_sum") / 10000.0).alias("revenue"),
    )
