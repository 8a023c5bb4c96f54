"""DuckDB oracle SQL for the reference-parity queries (SURVEY.md §2).

Each statement mirrors its Spark operator exactly — same mapping fragments,
same aliases, same arithmetic order (so float results are bit-identical),
same pinned constants (run_date 1998-12-31, holiday year 1998, as-of
2001-08-01, watermark seed 1000 — config.EngineConfig defaults).
"""

from .mappings import (
    DIM_DATES_SQL,
    DIM_PRODUCTS_SQL,
    REF_ORDERS_SQL,
    REF_REVIEWS_SQL,
    REF_SHIPMENTS_SQL,
    TRIPDATA_SQL,
)

AGG_PUBLIC_HOLIDAY = f"""
WITH {REF_ORDERS_SQL}, {DIM_DATES_SQL}
SELECT
    DATE '1998-12-31' AS ingestion_date,
    {', '.join(
        f"CAST(SUM(CASE WHEN month_of_the_year_num = {m} THEN quantity ELSE 0 END)"
        f" AS INTEGER) AS tt_order_hol_{name}"
        for m, name in enumerate(
            ('jan','feb','mar','apr','may','jun','jul','aug','sep','oct','nov','dec'),
            start=1,
        )
    )}
FROM ref_orders
LEFT JOIN dim_dates ON order_date = calendar_dt
WHERE year_num = 1998
  AND day_of_the_week_num BETWEEN 1 AND 5
  AND working_day = 'false'
"""

AGG_SHIPMENTS = f"""
WITH {REF_ORDERS_SQL}, {REF_SHIPMENTS_SQL}
SELECT
    DATE '1998-12-31' AS ingestion_date,
    COUNT(CASE WHEN date_diff('day', order_date, shipment_date) >= 6
                AND delivery_date IS NULL
                AND shipment_date >= order_date
               THEN shipment_id END) AS tt_late_shipments,
    COUNT(CASE WHEN delivery_date IS NULL AND shipment_date IS NULL
                AND DATE '2001-08-01' >= order_date + 15
               THEN shipment_id END) AS tt_undelivered_items
FROM ref_shipments a
INNER JOIN ref_orders b USING (order_id)
"""

MOST_ORDERED_PRODUCT_DATE = f"""
WITH {REF_ORDERS_SQL}, {DIM_DATES_SQL},
grouped AS (
    SELECT product_id, order_date, working_day, COUNT(*) AS order_count,
           ROW_NUMBER() OVER (
               PARTITION BY product_id
               ORDER BY COUNT(*) DESC, order_date ASC
           ) AS row_num
    FROM ref_orders a
    INNER JOIN dim_dates b ON a.order_date = b.calendar_dt
    WHERE day_of_the_week_num BETWEEN 1 AND 5
    GROUP BY product_id, order_date, working_day
)
SELECT product_id, order_date, order_count, working_day
FROM grouped WHERE row_num = 1
"""

_PCT_REVIEW = ", ".join(
    f"(CAST(SUM(CASE WHEN review = {k} THEN 1 ELSE 0 END) AS DOUBLE)"
    f" / COUNT(*)) * 100 AS pct_{name}_star_review"
    for k, name in enumerate(("one", "two", "three", "four", "five"), start=1)
)

REVIEW_PERCENTAGES = f"""
WITH {DIM_PRODUCTS_SQL}, {REF_REVIEWS_SQL}
SELECT product_name, product_id,
    {_PCT_REVIEW},
    COUNT(*) AS tt_review_points
FROM dim_products a
INNER JOIN ref_reviews b USING (product_id)
GROUP BY product_name, product_id
"""

SHIPMENT_PERCENTAGES = f"""
WITH {REF_ORDERS_SQL}, {REF_SHIPMENTS_SQL}, {DIM_PRODUCTS_SQL}
SELECT
    product_name, product_id,
    (CAST(COUNT(CASE WHEN b.shipment_date IS NOT NULL
                      AND b.shipment_date < a.order_date + 6
                      AND b.delivery_date IS NOT NULL
                     THEN a.order_id END) AS DOUBLE) / COUNT(*)) * 100
        AS pct_early_shipments,
    (CAST(COUNT(CASE WHEN b.shipment_date IS NOT NULL
                      AND (b.shipment_date >= a.order_date + 6
                           OR b.delivery_date IS NULL)
                     THEN a.order_id END) AS DOUBLE) / COUNT(*)) * 100
        AS pct_late_shipments
FROM ref_orders a
LEFT JOIN ref_shipments b USING (order_id)
LEFT JOIN dim_products c USING (product_id)
GROUP BY product_name, product_id
"""

BEST_PERFORMING_PRODUCT = f"""
WITH {REF_ORDERS_SQL}, {REF_SHIPMENTS_SQL}, {REF_REVIEWS_SQL},
{DIM_PRODUCTS_SQL}, {DIM_DATES_SQL},
most_ordered AS (
    SELECT product_id, order_date, order_count, working_day
    FROM (
        SELECT product_id, order_date, working_day, COUNT(*) AS order_count,
               ROW_NUMBER() OVER (
                   PARTITION BY product_id
                   ORDER BY COUNT(*) DESC, order_date ASC
               ) AS row_num
        FROM ref_orders a
        INNER JOIN dim_dates b ON a.order_date = b.calendar_dt
        WHERE day_of_the_week_num BETWEEN 1 AND 5
        GROUP BY product_id, order_date, working_day
    ) WHERE row_num = 1
),
review_percentages AS (
    SELECT product_name, product_id,
        {_PCT_REVIEW},
        COUNT(*) AS tt_review_points
    FROM dim_products a
    INNER JOIN ref_reviews b USING (product_id)
    GROUP BY product_name, product_id
),
shipment_percentages AS (
    SELECT
        product_name, product_id,
        (CAST(COUNT(CASE WHEN b.shipment_date IS NOT NULL
                          AND b.shipment_date < a.order_date + 6
                          AND b.delivery_date IS NOT NULL
                         THEN a.order_id END) AS DOUBLE) / COUNT(*)) * 100
            AS tt_early_shipments,
        (CAST(COUNT(CASE WHEN b.shipment_date IS NOT NULL
                          AND (b.shipment_date >= a.order_date + 6
                               OR b.delivery_date IS NULL)
                         THEN a.order_id END) AS DOUBLE) / COUNT(*)) * 100
            AS tt_late_shipments
    FROM ref_orders a
    LEFT JOIN ref_shipments b USING (order_id)
    LEFT JOIN dim_products c USING (product_id)
    GROUP BY product_name, product_id
)
SELECT
    DATE '1998-12-31' AS ingestion_date,
    review_percentages.product_name AS product_name,
    most_ordered.order_date AS most_ordered_day,
    CAST(most_ordered.working_day AS BOOLEAN) AS is_public_holiday,
    COALESCE(review_percentages.tt_review_points, 0) AS tt_review_points,
    COALESCE(review_percentages.pct_one_star_review, 0) AS pct_one_star_review,
    COALESCE(review_percentages.pct_two_star_review, 0) AS pct_two_star_review,
    COALESCE(review_percentages.pct_three_star_review, 0) AS pct_three_star_review,
    COALESCE(review_percentages.pct_four_star_review, 0) AS pct_four_star_review,
    COALESCE(review_percentages.pct_five_star_review, 0) AS pct_five_star_review,
    COALESCE(shipment_percentages.tt_early_shipments, 0) AS pct_early_shipments,
    COALESCE(shipment_percentages.tt_late_shipments, 0) AS pct_late_shipments
FROM most_ordered
LEFT JOIN review_percentages USING (product_id)
LEFT JOIN shipment_percentages USING (product_id)
ORDER BY pct_five_star_review DESC, pct_four_star_review DESC,
         pct_three_star_review DESC, pct_two_star_review DESC,
         pct_one_star_review DESC, most_ordered.product_id ASC
LIMIT 1
"""

# Diluted means as exact-integer sums / COUNT(*), rounded with the portable
# half-up formula — mirrors operators/tripdata.py bit-for-bit.
_MINUTES = "FLOOR(date_diff('second', pickup_datetime, dropoff_datetime) / 60)"
_TRIP_COLS = ", ".join(
    f"FLOOR((({sum_expr}) / COUNT(*)) * 100 + 0.5) / 100 AS {day}_mean_{name}"
    for day, dow in (("sat", 7), ("sun", 1))
    for sum_expr, name in (
        (
            f"CAST(SUM(CASE WHEN dayofweek(pickup_date) + 1 = {dow} THEN 1"
            f" ELSE 0 END) AS DOUBLE)",
            "trip_count",
        ),
        (
            f"SUM(CASE WHEN dayofweek(pickup_date) + 1 = {dow} THEN"
            f" CAST(ROUND(fare_amount * 100, 0) AS BIGINT) ELSE 0 END)"
            f" / 100.0",
            "fare_per_trip",
        ),
        (
            f"CAST(SUM(CASE WHEN dayofweek(pickup_date) + 1 = {dow} THEN"
            f" {_MINUTES} ELSE 0 END) AS DOUBLE)",
            "duration_per_trip_in_minutes",
        ),
    )
)

TRIPDATA_MONTHLY_METRICS = f"""
WITH {TRIPDATA_SQL}
SELECT strftime(pickup_date, '%Y-%m') AS year_month,
    {_TRIP_COLS}
FROM tripdata
WHERE pickup_date BETWEEN DATE '2024-01-01' AND DATE '2026-12-31'
GROUP BY year_month
"""

INCREMENTAL_LOAD_WATERMARK = f"""
WITH {REF_ORDERS_SQL}
SELECT * FROM ref_orders
WHERE order_id > (
    SELECT COALESCE(MAX(order_id), 0) FROM ref_orders WHERE order_id < 1000
)
"""

ORDERS_WITHOUT_LINEITEMS_ANTI = f"""
WITH {REF_ORDERS_SQL}
SELECT * FROM ref_orders o
WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.order_id)
"""

ORDERS_WITH_LINEITEMS_SEMI = f"""
WITH {REF_ORDERS_SQL}
SELECT * FROM ref_orders o
WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.order_id)
"""

PARITY_ORACLES = {
    "agg_public_holiday": AGG_PUBLIC_HOLIDAY,
    "agg_shipments": AGG_SHIPMENTS,
    "most_ordered_product_date": MOST_ORDERED_PRODUCT_DATE,
    "review_percentages": REVIEW_PERCENTAGES,
    "shipment_percentages": SHIPMENT_PERCENTAGES,
    "best_performing_product": BEST_PERFORMING_PRODUCT,
    "tripdata_monthly_metrics": TRIPDATA_MONTHLY_METRICS,
    "incremental_load_watermark": INCREMENTAL_LOAD_WATERMARK,
    "orders_without_lineitems_anti": ORDERS_WITHOUT_LINEITEMS_ANTI,
    "orders_with_lineitems_semi": ORDERS_WITH_LINEITEMS_SEMI,
}
