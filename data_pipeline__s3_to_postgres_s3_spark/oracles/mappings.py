"""Shared DuckDB SQL fragments for the reference-shaped mapped views.

MUST stay semantically identical to catalog.py (Spark side). Constants here
mirror config.EngineConfig defaults: product_mod=100, calendar
1995-01-01..2002-12-31, holidays {Jan 1, May 1, Jul 4, Dec 25, Dec 26}.
"""

REF_ORDERS_SQL = """
ref_orders AS (
    SELECT
        o_orderkey AS order_id,
        o_custkey AS customer_id,
        CAST(o_orderdate AS DATE) AS order_date,
        o_orderkey % 100 AS product_id,
        o_orderkey % 300 + 100 AS unit_price,
        o_orderkey % 10 + 1 AS quantity,
        (o_orderkey % 300 + 100) * (o_orderkey % 10 + 1) AS total_price
    FROM orders
)"""

REF_SHIPMENTS_SQL = """
ref_shipments AS (
    SELECT
        l_orderkey * 10 + l_linenumber AS shipment_id,
        l_orderkey AS order_id,
        CASE WHEN l_partkey % 3 <> 0 THEN CAST(l_shipdate AS DATE) END
            AS shipment_date,
        CASE WHEN l_partkey % 3 <> 0 AND l_partkey % 2 = 0
             THEN CAST(l_shipdate AS DATE) + CAST(l_suppkey % 4 + 1 AS INTEGER)
        END AS delivery_date
    FROM lineitem
)"""

REF_REVIEWS_SQL = """
ref_reviews AS (
    SELECT
        l_partkey % 5 + 1 AS review,
        l_partkey % 100 AS product_id
    FROM lineitem
)"""

DIM_PRODUCTS_SQL = """
dim_products AS (
    SELECT p_partkey AS product_id, p_name AS product_name FROM part
)"""

DIM_DATES_SQL = """
dim_dates AS (
    SELECT
        calendar_dt,
        EXTRACT(year FROM calendar_dt) AS year_num,
        EXTRACT(month FROM calendar_dt) AS month_of_the_year_num,
        isodow(calendar_dt) AS day_of_the_week_num,
        CASE WHEN isodow(calendar_dt) >= 6
                  OR (EXTRACT(month FROM calendar_dt) = 1
                      AND EXTRACT(day FROM calendar_dt) = 1)
                  OR (EXTRACT(month FROM calendar_dt) = 5
                      AND EXTRACT(day FROM calendar_dt) = 1)
                  OR (EXTRACT(month FROM calendar_dt) = 7
                      AND EXTRACT(day FROM calendar_dt) = 4)
                  OR (EXTRACT(month FROM calendar_dt) = 12
                      AND EXTRACT(day FROM calendar_dt) IN (25, 26))
             THEN 'false' ELSE 'true'
        END AS working_day
    FROM (
        SELECT CAST(unnest(generate_series(
            DATE '1995-01-01', DATE '2002-12-31', INTERVAL 1 DAY)) AS DATE)
            AS calendar_dt
    )
)"""

TRIPDATA_SQL = """
tripdata AS (
    SELECT
        tsu + to_months(CAST(event_id % 36 AS INTEGER)) AS pickup_datetime,
        CAST(tsu + to_months(CAST(event_id % 36 AS INTEGER)) AS DATE)
            AS pickup_date,
        tsu + to_months(CAST(event_id % 36 AS INTEGER))
           + to_minutes(CAST(event_id % 60 + 1 AS INTEGER))
            AS dropoff_datetime,
        CAST(value AS DOUBLE) AS fare_amount
    FROM (SELECT *, CAST(ts AS TIMESTAMP) AS tsu FROM events)
)"""
