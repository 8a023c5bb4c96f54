"""agg_shipments — late / undelivered conditional counts.

Reference: /root/reference/sql/transformation.sql:55-67 (operators A2, J2,
P5, P6; quirk Q2: the as-of "today" is hardcoded to the data's max
order_date — parameterized here as ``cfg.as_of_date``).

Semantics preserved exactly:
- late: datediff(shipment, order) >= 6 AND delivery IS NULL AND
  shipment >= order;
- undelivered: both dates NULL AND as_of >= order + 15 days;
- COUNT(CASE ...) counts only non-null branches.

Scale: shipments ⋈ orders is the big join — at 100 TB it's a shuffle
hash/sort-merge join on order_id; both sides are pre-projected to the
3-4 needed columns so the shuffle is narrow. The aggregate is global but
partial (map-side) so only 1 row per task crosses the wire.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import ref_orders, ref_shipments
from ..config import DEFAULT_CONFIG, EngineConfig


def agg_shipments(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    ships = ref_shipments(spark, sf_dir)
    orders = ref_orders(spark, sf_dir, cfg)
    return agg_shipments_from_tables(ships, orders, cfg)


def agg_shipments_from_tables(
    ships: DataFrame, orders: DataFrame, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Core logic over raw (shipment_deliveries, orders) frames — used both
    by the oracle-checked query above and the ELT pipeline's transform stage."""
    j = ships.join(orders.select("order_id", "order_date"), "order_id", "inner")

    late = (
        (F.datediff("shipment_date", "order_date") >= 6)
        & F.col("delivery_date").isNull()
        & (F.col("shipment_date") >= F.col("order_date"))
    )
    undelivered = (
        F.col("delivery_date").isNull()
        & F.col("shipment_date").isNull()
        & (F.lit(cfg.as_of_date) >= F.date_add("order_date", 15))
    )
    return j.agg(
        F.count(F.when(late, F.col("shipment_id"))).alias("tt_late_shipments"),
        F.count(F.when(undelivered, F.col("shipment_id"))).alias(
            "tt_undelivered_items"
        ),
    ).select(F.lit(cfg.run_date).alias("ingestion_date"), "*")
