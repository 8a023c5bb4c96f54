"""Central registry mapping query names → (Spark callable, DuckDB oracle).

Every operator claimed done in SURVEY.md §2 has an entry here; the driver
and the local tests both consume this.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .operators.best_product import (
    best_performing_product,
    most_ordered_product_date,
    review_percentages,
    shipment_percentages,
)
from .operators.public_holiday import agg_public_holiday
from .operators.shipments import agg_shipments
from .operators.tripdata import tripdata_monthly_metrics
from .operators.watermark import (
    incremental_load_watermark,
    orders_with_lineitems_semi,
    orders_without_lineitems_anti,
)
from .oracles.parity import PARITY_ORACLES

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {
    "agg_public_holiday": agg_public_holiday,
    "agg_shipments": agg_shipments,
    "most_ordered_product_date": most_ordered_product_date,
    "review_percentages": review_percentages,
    "shipment_percentages": shipment_percentages,
    "best_performing_product": best_performing_product,
    "tripdata_monthly_metrics": tripdata_monthly_metrics,
    "incremental_load_watermark": incremental_load_watermark,
    "orders_without_lineitems_anti": orders_without_lineitems_anti,
    "orders_with_lineitems_semi": orders_with_lineitems_semi,
}

ORACLES: dict[str, str] = {**PARITY_ORACLES}
