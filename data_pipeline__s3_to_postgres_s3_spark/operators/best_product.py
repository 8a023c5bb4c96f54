"""best_performing_product and its three building-block aggregates.

Reference: /root/reference/sql/transformation.sql:86-149 —
- MostOrderedDate: grouped COUNT(*) + ROW_NUMBER() top-1-per-product (A3/W1);
- ReviewPercentages: ratio-of-conditional-sums star percentages (A4/J4);
- ShipmentPercentages: early/late conditional-count ratios over a 3-way left
  join (A5/J5, quirk Q3);
- final: 3-way left join of the CTEs + ORDER BY 5 percentages DESC LIMIT 1
  (J6/O2), COALESCE(…, 0) fills, and quirk Q4 — the ``is_public_holiday``
  column actually carries MostOrderedDate.working_day (mislabeled in the
  reference; reproduced as-is).

Determinism (quirk Q5): the reference's ROW_NUMBER and LIMIT 1 tie-breaks are
nondeterministic; engine and oracle both pin trailing keys (order_date,
product_id).

Scale: the grouped counts shuffle once on their group keys with map-side
partial aggregation; the top-1-per-product window re-uses the groupBy
shuffle's hash partitioning on product_id (no extra exchange); dims are
broadcast; the final LIMIT 1 is a TakeOrdered (no global sort
materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import dim_dates, dim_products, ref_orders, ref_reviews, ref_shipments
from ..config import DEFAULT_CONFIG, EngineConfig


def most_ordered_product_date(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Each product's most-ordered weekday date (transformation.sql:86-97)."""
    return most_ordered_product_date_from_tables(
        spark, ref_orders(spark, sf_dir, cfg), cfg
    )


def most_ordered_product_date_from_tables(
    spark: SparkSession, orders: DataFrame, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    dates = dim_dates(spark, cfg)

    base = orders.join(
        F.broadcast(dates),
        orders["order_date"] == dates["calendar_dt"],
        "inner",
    ).where(F.col("day_of_the_week_num").between(1, 5))

    # repartition(product_id) FIRST: hash-partitioning on product_id
    # satisfies the 3-key groupBy's clustering (subset rule) AND the
    # window's, so one exchange serves both (2 → 1, tools/plan_report.py).
    # Right call here because the group reduction factor is ~1 row per
    # (product, date) — shuffling raw rows once beats shuffling barely-
    # reduced partial aggregates twice. For high-reduction aggregates,
    # partial-agg-first wins instead; measure before copying this shape.
    grouped = (
        base.repartition("product_id")
        .groupBy("product_id", "order_date", "working_day")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )
    w = (
        Window.partitionBy("product_id")
        .orderBy(F.desc("order_count"), F.asc("order_date"))
    )
    return (
        grouped.withColumn("row_num", F.row_number().over(w))
        .where(F.col("row_num") == 1)
        .select("product_id", "order_date", "order_count", "working_day")
    )


def review_percentages(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Star-rating percentages per product (transformation.sql:99-111)."""
    products = dim_products(spark, sf_dir)
    reviews = ref_reviews(spark, sf_dir, cfg)
    return review_percentages_from_tables(products, reviews)


def review_percentages_from_tables(
    products: DataFrame, reviews: DataFrame
) -> DataFrame:
    j = F.broadcast(products).join(reviews, "product_id", "inner")

    def pct(star: int, name: str):
        return (
            (
                F.sum(F.when(F.col("review") == star, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1))
            )
            * 100
        ).alias(name)

    return j.groupBy("product_name", "product_id").agg(
        pct(1, "pct_one_star_review"),
        pct(2, "pct_two_star_review"),
        pct(3, "pct_three_star_review"),
        pct(4, "pct_four_star_review"),
        pct(5, "pct_five_star_review"),
        F.count(F.lit(1)).alias("tt_review_points"),
    )


def shipment_percentages(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Early/late shipment percentages per product
    (transformation.sql:113-123, quirks Q3/Q6: denominator is ALL left-join
    rows, so products with zero shipments still appear)."""
    orders = ref_orders(spark, sf_dir, cfg)
    ships = ref_shipments(spark, sf_dir)
    products = dim_products(spark, sf_dir)
    return shipment_percentages_from_tables(orders, ships, products)


def shipment_percentages_from_tables(
    orders: DataFrame, ships: DataFrame, products: DataFrame
) -> DataFrame:
    j = (
        orders.join(ships, "order_id", "left")
        .join(F.broadcast(products), "product_id", "left")
    )

    early = (
        F.col("shipment_date").isNotNull()
        & (F.col("shipment_date") < F.date_add("order_date", 6))
        & F.col("delivery_date").isNotNull()
    )
    late = F.col("shipment_date").isNotNull() & (
        (F.col("shipment_date") >= F.date_add("order_date", 6))
        | F.col("delivery_date").isNull()
    )
    return j.groupBy("product_name", "product_id").agg(
        (
            (F.count(F.when(early, F.col("order_id"))).cast("double") / F.count(F.lit(1)))
            * 100
        ).alias("pct_early_shipments"),
        (
            (F.count(F.when(late, F.col("order_id"))).cast("double") / F.count(F.lit(1)))
            * 100
        ).alias("pct_late_shipments"),
    )


def best_performing_product(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Final single-row analytics table (transformation.sql:125-149)."""
    return best_performing_product_from_tables(
        spark,
        ref_orders(spark, sf_dir, cfg),
        ref_shipments(spark, sf_dir),
        ref_reviews(spark, sf_dir, cfg),
        cfg,
        products=dim_products(spark, sf_dir),
    )


def best_performing_product_from_tables(
    spark: SparkSession,
    orders: DataFrame,
    ships: DataFrame,
    reviews: DataFrame,
    cfg: EngineConfig = DEFAULT_CONFIG,
    products: DataFrame | None = None,
) -> DataFrame:
    """Core logic over raw frames — used by the ELT pipeline's transform
    stage. When no product dimension is supplied (the pipeline's staging area
    has none), a surrogate ``product_<id>`` dim is derived from the observed
    product ids, mirroring the reference's implied if_common.dim_products
    (transformation.sql:100-108)."""
    if products is None:
        products = (
            orders.select("product_id")
            .union(reviews.select("product_id"))
            .distinct()
            .select(
                "product_id",
                F.concat(F.lit("product_"), F.col("product_id")).alias("product_name"),
            )
        )
    most = most_ordered_product_date_from_tables(spark, orders, cfg)
    rev = review_percentages_from_tables(products, reviews)
    ship = shipment_percentages_from_tables(orders, ships, products).withColumnsRenamed(
        {
            "pct_early_shipments": "s_pct_early",
            "pct_late_shipments": "s_pct_late",
            "product_name": "s_product_name",
        }
    )

    j = (
        most.join(rev, "product_id", "left")
        .join(ship, "product_id", "left")
    )
    out = j.select(
        F.lit(cfg.run_date).alias("ingestion_date"),
        F.col("product_name"),
        F.col("order_date").alias("most_ordered_day"),
        # Quirk Q4: the reference stores working_day verbatim into a BOOL
        # column named is_public_holiday ('true' = working day).
        F.col("working_day").cast("boolean").alias("is_public_holiday"),
        F.coalesce("tt_review_points", F.lit(0)).alias("tt_review_points"),
        F.coalesce("pct_one_star_review", F.lit(0.0)).alias("pct_one_star_review"),
        F.coalesce("pct_two_star_review", F.lit(0.0)).alias("pct_two_star_review"),
        F.coalesce("pct_three_star_review", F.lit(0.0)).alias("pct_three_star_review"),
        F.coalesce("pct_four_star_review", F.lit(0.0)).alias("pct_four_star_review"),
        F.coalesce("pct_five_star_review", F.lit(0.0)).alias("pct_five_star_review"),
        F.coalesce("s_pct_early", F.lit(0.0)).alias("pct_early_shipments"),
        F.coalesce("s_pct_late", F.lit(0.0)).alias("pct_late_shipments"),
        F.col("product_id").alias("_tie_product_id"),
    )
    return (
        out.orderBy(
            F.desc("pct_five_star_review"),
            F.desc("pct_four_star_review"),
            F.desc("pct_three_star_review"),
            F.desc("pct_two_star_review"),
            F.desc("pct_one_star_review"),
            F.asc("_tie_product_id"),
        )
        .limit(1)
        .drop("_tie_product_id")
    )
