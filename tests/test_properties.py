"""Property tests (hypothesis) for the quirk semantics that define parity.

These attack the three behaviors most likely to drift (SURVEY.md §5.3):
- Q8 dilution: the tripdata means are zero-filled over ALL rows of the
  month, not conditional means over matching rows;
- Q2/P5/P6 null-date predicates: late/undelivered classification under
  highly-null shipment/delivery dates;
- cents accumulation: distributed sums of fixed-decimal doubles must be
  exact and order-independent.

Each property runs a real Spark plan on generated rows and compares against
a plain-Python reference. Example counts are kept small — each example is a
Spark job — but hypothesis still explores the edges (empty sets, all-null
columns, boundary dates) via its shrinking search.
"""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DateType,
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)

from data_pipeline__s3_to_postgres_s3_spark.functions.numeric import cents

PROP_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

fares = st.integers(min_value=0, max_value=10_000).map(lambda c: c / 100.0)
dows = st.integers(min_value=1, max_value=7)


@PROP_SETTINGS
@given(rows=st.lists(st.tuples(dows, fares), min_size=1, max_size=40))
def test_diluted_mean_is_zero_filled(spark, rows):
    """avg(when(dow==7, fare).otherwise(0)) over all rows — NOT the mean of
    Saturday fares (quirk Q8). Reference: sum(matching)/count(ALL)."""
    df = spark.createDataFrame(rows, ["dow", "fare"])
    got = df.agg(
        F.avg(F.when(F.col("dow") == 7, F.col("fare")).otherwise(0)).alias("m")
    ).collect()[0]["m"]
    expected = sum(f for d, f in rows if d == 7) / len(rows)
    assert got == pytest.approx(expected, abs=1e-12)


dates = st.dates(min_value=dt.date(2022, 1, 1), max_value=dt.date(2022, 12, 31))
opt_dates = st.none() | dates


@PROP_SETTINGS
@given(
    rows=st.lists(
        st.tuples(dates, opt_dates, opt_dates), min_size=1, max_size=30
    ),
    as_of=dates,
)
def test_late_undelivered_predicates(spark, rows, as_of):
    """Q2 classification under nulls: late = shipped >=6 days after order,
    no delivery, shipment not before order; undelivered = never shipped or
    delivered and as_of >= order + 15 days. NULL comparisons must drop rows
    (SQL three-valued logic), matching the Python reference exactly."""
    schema = StructType(
        [
            StructField("order_date", DateType()),
            StructField("shipment_date", DateType()),
            StructField("delivery_date", DateType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    late = (
        (F.datediff("shipment_date", "order_date") >= 6)
        & F.col("delivery_date").isNull()
        & (F.col("shipment_date") >= F.col("order_date"))
    )
    undelivered = (
        F.col("delivery_date").isNull()
        & F.col("shipment_date").isNull()
        & (F.lit(as_of) >= F.date_add("order_date", 15))
    )
    got = df.agg(
        F.count(F.when(late, F.lit(1))).alias("late"),
        F.count(F.when(undelivered, F.lit(1))).alias("undelivered"),
    ).collect()[0]

    exp_late = sum(
        1
        for o, s, d in rows
        if s is not None and d is None and (s - o).days >= 6 and s >= o
    )
    exp_und = sum(
        1
        for o, s, d in rows
        if s is None and d is None and as_of >= o + dt.timedelta(days=15)
    )
    assert (got["late"], got["undelivered"]) == (exp_late, exp_und)


@PROP_SETTINGS
@given(values=st.lists(fares, min_size=1, max_size=60))
def test_cents_sum_exact_any_partitioning(spark, values):
    """Integer-cents accumulation equals the Decimal ground truth no matter
    how rows are partitioned (double summation would drift with partition
    combine order — cents must not)."""
    schema = StructType([StructField("v", DoubleType())])
    for n_parts in (1, 4):
        df = spark.createDataFrame(
            [(v,) for v in values], schema
        ).repartition(n_parts)
        got = df.agg((F.sum(cents(F.col("v"))) / 100.0).alias("s")).collect()[0]["s"]
        expected = float(
            sum(Decimal(str(v)) for v in values)
        )
        assert got == pytest.approx(expected, abs=1e-9)


@PROP_SETTINGS
@given(
    ids=st.lists(st.integers(min_value=1, max_value=10_000), min_size=1, max_size=50),
    wm=st.integers(min_value=0, max_value=10_000),
)
def test_watermark_filter_idempotent(spark, ids, wm):
    """Applying the incremental filter twice equals once (re-running a load
    against an up-to-date destination appends nothing new)."""
    from data_pipeline__s3_to_postgres_s3_spark.sources.jdbc import (
        filter_above_watermark,
    )

    schema = StructType([StructField("pk", IntegerType())])
    df = spark.createDataFrame([(i,) for i in ids], schema)
    once = filter_above_watermark(df, "pk", wm)
    twice = filter_above_watermark(once, "pk", wm)
    assert sorted(r["pk"] for r in twice.collect()) == sorted(
        i for i in ids if i > wm
    )


@PROP_SETTINGS
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1,
        max_size=40,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    """Distributed CC == a trivial sequential union-find on the same edge
    list (random small graphs incl. self-loops, dupes, both orientations)."""
    from data_pipeline__s3_to_postgres_s3_spark.operators.graph import (
        connected_components,
    )

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    want = {}
    for node in parent:
        root = find(node)
        want.setdefault(root, set()).add(node)
    # canonical labeling: min member of each component
    want_label = {n: min(members) for members in want.values() for n in members}

    df = spark.createDataFrame(edges, ["a", "b"])
    got = {r["node"]: r["comp"] for r in connected_components(df).collect()}
    assert got == want_label


def test_top_supplier_by_revenue_keeps_ties(spark, tmp_path):
    """Q15 keeps EVERY supplier at the max (cents-exact equality): two
    suppliers engineered to identical quarter revenue both survive; a
    third below max and a fourth outside the window do not."""
    import datetime as dtm

    from data_pipeline__s3_to_postgres_s3_spark.operators.relational import (
        top_supplier_by_revenue,
    )

    d_in = dtm.datetime(1998, 2, 1)
    d_out = dtm.datetime(1997, 2, 1)
    rows = [
        # suppkey, shipdate, extendedprice, discount
        (1, d_in, 100.0, 0.0),
        (1, d_in, 50.0, 0.0),
        (2, d_in, 300.0, 0.5),  # 150.0 — ties supplier 1
        (3, d_in, 10.0, 0.0),
        (4, d_out, 999.0, 0.0),  # outside the quarter
    ]
    spark.createDataFrame(
        rows,
        "l_suppkey bigint, l_shipdate timestamp,"
        " l_extendedprice double, l_discount double",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        [(i, f"Supplier#{i}") for i in range(1, 5)],
        "s_suppkey bigint, s_name string",
    ).write.mode("overwrite").parquet(str(tmp_path / "supplier.parquet"))
    out = {
        r["s_suppkey"]: r["total_revenue"]
        for r in top_supplier_by_revenue(spark, str(tmp_path)).collect()
    }
    assert out == {1: 150.0, 2: 150.0}
