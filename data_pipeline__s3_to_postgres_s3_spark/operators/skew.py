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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

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
) -> DataFrame:
    """SUM-shaped aggregation in two phases: (key, salt) partials, then the
    final combine on key. agg_col must be an algebraic sum-like expression
    (SUM of anything, COUNT via SUM(1))."""
    salted = df.withColumn("_salt", _round_robin_salt(salt))
    partial = salted.groupBy(key, "_salt").agg(agg_col.alias("_partial"))
    return partial.groupBy(key).agg(F.sum("_partial").alias(alias))
