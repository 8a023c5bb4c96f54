"""Pivot/unpivot round-trip pins (operators/relational.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline__s3_to_postgres_s3_spark.operators.relational import (
    ORDER_STATUSES,
    order_status_pivot,
    order_status_unpivot,
)


def test_pivot_schema_is_pinned(spark, sf_dir):
    df = order_status_pivot(spark, sf_dir)
    assert df.columns == ["month"] + [f"total_{s}" for s in ORDER_STATUSES]


def test_unpivot_round_trip_preserves_totals(spark, sf_dir):
    """melt(pivot(x)) must account for every order dollar: per-status grand
    totals equal the raw orders aggregation (cents-exact)."""
    long = order_status_unpivot(spark, sf_dir)
    got = {
        r["o_orderstatus"]: round(r["s"], 2)
        for r in long.groupBy("o_orderstatus")
        .agg(F.sum("total").alias("s"))
        .collect()
    }
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    want = {
        r["o_orderstatus"]: round(r["s"], 2)
        for r in orders.groupBy("o_orderstatus")
        .agg((F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")) / 100.0).alias("s"))
        .collect()
    }
    assert got == want
    # dense long form: every (month, status) cell present
    n_months = long.select("month").distinct().count()
    assert long.count() == n_months * len(ORDER_STATUSES)


def test_churn_reconciliation_accounts_for_all_active_customers(spark, sf_dir):
    """Full-outer semantics: every customer active in either period appears
    exactly once, statuses partition the keys, zero-fill is side-correct."""
    from data_pipeline__s3_to_postgres_s3_spark.operators.relational import (
        customer_churn_reconciliation,
    )

    rows = customer_churn_reconciliation(spark, sf_dir).collect()
    keys = [r["customer_key"] for r in rows]
    assert len(keys) == len(set(keys))
    for r in rows:
        if r["status"] == "new":
            assert r["n_early"] == 0 and r["n_late"] > 0
        elif r["status"] == "churned":
            assert r["n_early"] > 0 and r["n_late"] == 0
        else:
            assert r["status"] == "retained"
            assert r["n_early"] > 0 and r["n_late"] > 0

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    active = (
        orders.where(
            "(o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01')"
            " OR (o_orderdate >= '2000-01-01' AND o_orderdate < '2001-01-01')"
        )
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert len(rows) == active
