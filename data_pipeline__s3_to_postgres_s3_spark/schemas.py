"""Explicit StructType schemas for the reference's tables.

The reference infers CSV schemas with pandas and patches dtypes ad hoc
(extract_load_transform_data_pipeline.py.py:73,89,110); a production Spark
engine declares them (SURVEY.md §1.3) — inference is a full extra pass over
100 TB and nondeterministic under dirty data.

Shapes from /root/reference/erd_table_creations.sql:1-26 and the implied
dims in /root/reference/sql/transformation.sql:40-44,100-108.
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    DateType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

ORDERS = StructType(
    [
        StructField("order_id", IntegerType(), False),
        StructField("customer_id", IntegerType(), True),
        StructField("order_date", DateType(), True),
        StructField("product_id", IntegerType(), True),
        StructField("unit_price", IntegerType(), True),
        StructField("quantity", IntegerType(), True),
        StructField("total_price", IntegerType(), True),
    ]
)

SHIPMENT_DELIVERIES = StructType(
    [
        StructField("shipment_id", IntegerType(), False),
        StructField("order_id", IntegerType(), True),
        # Both dates highly nullable in the reference data (~68% / ~78%).
        StructField("shipment_date", DateType(), True),
        StructField("delivery_date", DateType(), True),
    ]
)

# review is declared PK in the reference DDL but the load path is
# append-only with duplicates (SURVEY.md Q7) — nullable, non-unique.
REVIEWS = StructType(
    [
        StructField("review", IntegerType(), True),
        StructField("product_id", IntegerType(), True),
    ]
)

DIM_DATES = StructType(
    [
        StructField("calendar_dt", DateType(), False),
        StructField("year_num", IntegerType(), True),
        StructField("month_of_the_year_num", IntegerType(), True),
        StructField("day_of_the_week_num", IntegerType(), True),
        StructField("working_day", StringType(), True),  # 'true'/'false' text
    ]
)

DIM_PRODUCTS = StructType(
    [
        StructField("product_id", IntegerType(), False),
        StructField("product_name", StringType(), True),
    ]
)

TRIPDATA = StructType(
    [
        StructField("pickup_date", DateType(), True),
        StructField("pickup_datetime", TimestampType(), True),
        StructField("dropoff_datetime", TimestampType(), True),
        StructField("fare_amount", DoubleType(), True),
    ]
)

ANALYTICS_BEST_PERFORMING_PRODUCT = StructType(
    [
        StructField("ingestion_date", DateType(), False),
        StructField("product_name", StringType(), False),
        StructField("most_ordered_day", DateType(), False),
        StructField("is_public_holiday", BooleanType(), False),
        StructField("tt_review_points", IntegerType(), False),
        *[
            StructField(f"pct_{s}_star_review", DoubleType(), False)
            for s in ("one", "two", "three", "four", "five")
        ],
        StructField("pct_early_shipments", DoubleType(), False),
        StructField("pct_late_shipments", DoubleType(), False),
    ]
)

CSV_SCHEMAS = {
    "orders": ORDERS,
    "shipment_deliveries": SHIPMENT_DELIVERIES,
    "reviews": REVIEWS,
}
