"""Skew-remedy equivalence tests: salted plans must produce EXACTLY the
rows of their unsalted twins — salting redistributes work, never results.
The fixture data is deliberately skewed (90% of rows on one key), the
shape that motivates the operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline__s3_to_postgres_s3_spark.operators.skew import (
    _round_robin_salt,
    salted_join,
    two_phase_agg,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # 900 rows on key 1 (the hot key), 100 spread over keys 2..11.
    big = spark.range(1000).select(
        F.when(F.col("id") < 900, 1).otherwise((F.col("id") % 10) + 2).alias("k"),
        (F.col("id") * 3).alias("payload"),
    )
    small = spark.range(12).select(
        (F.col("id") + 1).alias("k"), F.concat(F.lit("dim_"), F.col("id")).alias("name")
    )
    return big, small


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_inner_join_equivalent(spark, skewed):
    big, small = skewed
    plain = big.join(small, "k", "inner").select("k", "payload", "name")
    salted = salted_join(big, small, "k", "inner").select("k", "payload", "name")
    assert _rows(salted) == _rows(plain)


def test_salted_left_join_equivalent(spark, skewed):
    big, small = skewed
    # restrict small so some big keys find no match (left semantics matter)
    small_partial = small.where(F.col("k") <= 5)
    plain = big.join(small_partial, "k", "left").select("k", "payload", "name")
    salted = salted_join(big, small_partial, "k", "left").select(
        "k", "payload", "name"
    )
    assert _rows(salted) == _rows(plain)


def test_salted_join_spreads_hot_key(spark, skewed):
    """The hot key's rows must land in >1 salt bucket — otherwise the salt
    does nothing and the hot partition is as big as before."""
    big, _ = skewed
    n_buckets = (
        big.where(F.col("k") == 1)
        .select(_round_robin_salt(8).alias("b"))
        .distinct()
        .count()
    )
    assert n_buckets > 1


def test_salted_join_key_only_frame(spark, skewed):
    """A big frame whose ONLY column is the join key must still salt (the
    old hash-of-other-columns salt threw here)."""
    big, small = skewed
    key_only = big.select("k")
    plain = key_only.join(small, "k", "inner").select("k", "name")
    salted = salted_join(key_only, small, "k", "inner").select("k", "name")
    assert _rows(salted) == _rows(plain)


def test_salted_join_constant_payload_spreads(spark):
    """Constant non-key rows — the degenerate case for content-derived
    salts — must still spread over >1 bucket."""
    big = spark.range(1000).select(F.lit(1).alias("k"), F.lit("x").alias("payload"))
    n_buckets = big.select(_round_robin_salt(8).alias("b")).distinct().count()
    assert n_buckets > 1


def test_two_phase_agg_equivalent(spark, skewed):
    big, _ = skewed
    plain = big.groupBy("k").agg(F.sum("payload").alias("total"))
    salted = two_phase_agg(big, "k", F.sum("payload"), "total")
    assert _rows(salted) == _rows(plain)


def test_two_phase_agg_multi_equivalent(spark, skewed):
    """r9c: extra (agg_col, alias) pairs ride the SAME partial pass —
    results must equal the plain single-pass groupBy for every column."""
    big, _ = skewed
    plain = big.groupBy("k").agg(
        F.sum("payload").alias("total"),
        F.count(F.lit(1)).alias("n"),
    )
    salted = two_phase_agg(
        big, "k", F.sum("payload"), "total", 8, more=((F.count(F.lit(1)), "n"),)
    )
    assert _rows(salted.select("k", "total", "n")) == _rows(
        plain.select("k", "total", "n")
    )


def test_salted_brand_revenue_equals_plain_groupby(spark, sf_small):
    """The registry query's salted/two-phase plan must reproduce the plain
    join+group bit-for-bit on real data (the oracle differential proves
    the same against DuckDB at sf0.01; this is the in-engine twin)."""
    from data_pipeline__s3_to_postgres_s3_spark.catalog import load_table
    from data_pipeline__s3_to_postgres_s3_spark.functions.numeric import cents
    from data_pipeline__s3_to_postgres_s3_spark.operators.skew import (
        salted_brand_revenue,
    )

    li = load_table(spark, sf_small, "lineitem")
    part = load_table(spark, sf_small, "part")
    plain = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            (
                F.sum(
                    cents(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")),
                        4,
                    )
                )
                / 10000.0
            ).alias("revenue"),
        )
    )
    assert _rows(salted_brand_revenue(spark, sf_small)) == _rows(plain)
