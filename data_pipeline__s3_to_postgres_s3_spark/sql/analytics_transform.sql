-- Engine-native warehouse transform script (S5 path).
--
-- Produces the same three analytics tables as pipelines/elt.transform, but
-- as a multi-statement SQL script executed by pipelines/sql_script.py —
-- the workflow a user migrating a warehouse-SQL pipeline brings with them
-- (cf. the reference's transformation task, extract_load_transform_data_
-- pipeline.py.py:122-134). Written in the translated dialect subset on
-- purpose: ::DATE casts, TO_DATE with Postgres pattern letters, date
-- subtraction, INTERVAL arithmetic and CURRENT_DATE pinning all appear so
-- the driver's correctness gate exercises every translation rule.
--
-- Differences from naive warehouse SQL, for determinism (SURVEY.md Q5):
-- ROW_NUMBER carries an order_date ASC tie-break and the final top-1 a
-- product_id ASC tie-break, so results are stable across engines and runs.
--
-- Placeholders {holiday_year} / {as_of_date} are filled from EngineConfig;
-- CURRENT_DATE is pinned to cfg.run_date by the runner.

CREATE TABLE IF NOT EXISTS analytics.agg_public_holiday (
    ingestion_date DATE NOT NULL,
    tt_order_hol_jan INT, tt_order_hol_feb INT, tt_order_hol_mar INT,
    tt_order_hol_apr INT, tt_order_hol_may INT, tt_order_hol_jun INT,
    tt_order_hol_jul INT, tt_order_hol_aug INT, tt_order_hol_sep INT,
    tt_order_hol_oct INT, tt_order_hol_nov INT, tt_order_hol_dec INT
);

TRUNCATE TABLE analytics.agg_public_holiday;

INSERT INTO analytics.agg_public_holiday
SELECT
    CURRENT_DATE::DATE AS ingestion_date,
    SUM(CASE WHEN month_of_the_year_num = 1 THEN quantity ELSE 0 END) AS m01,
    SUM(CASE WHEN month_of_the_year_num = 2 THEN quantity ELSE 0 END) AS m02,
    SUM(CASE WHEN month_of_the_year_num = 3 THEN quantity ELSE 0 END) AS m03,
    SUM(CASE WHEN month_of_the_year_num = 4 THEN quantity ELSE 0 END) AS m04,
    SUM(CASE WHEN month_of_the_year_num = 5 THEN quantity ELSE 0 END) AS m05,
    SUM(CASE WHEN month_of_the_year_num = 6 THEN quantity ELSE 0 END) AS m06,
    SUM(CASE WHEN month_of_the_year_num = 7 THEN quantity ELSE 0 END) AS m07,
    SUM(CASE WHEN month_of_the_year_num = 8 THEN quantity ELSE 0 END) AS m08,
    SUM(CASE WHEN month_of_the_year_num = 9 THEN quantity ELSE 0 END) AS m09,
    SUM(CASE WHEN month_of_the_year_num = 10 THEN quantity ELSE 0 END) AS m10,
    SUM(CASE WHEN month_of_the_year_num = 11 THEN quantity ELSE 0 END) AS m11,
    SUM(CASE WHEN month_of_the_year_num = 12 THEN quantity ELSE 0 END) AS m12
FROM staging.orders
LEFT JOIN if_common.dim_dates
    ON TO_DATE(order_date, 'YYYY-MM-DD') = calendar_dt
WHERE year_num = {holiday_year}
  AND day_of_the_week_num BETWEEN 1 AND 5
  AND working_day = 'false';

CREATE TABLE IF NOT EXISTS analytics.agg_shipments (
    ingestion_date DATE NOT NULL,
    tt_late_shipments BIGINT,
    tt_undelivered_items BIGINT
);

TRUNCATE TABLE analytics.agg_shipments;

INSERT INTO analytics.agg_shipments
    (ingestion_date, tt_late_shipments, tt_undelivered_items)
SELECT
    CURRENT_DATE,
    COUNT(CASE WHEN (CAST(shipment_date AS DATE) - CAST(order_date AS DATE)) >= 6
                AND delivery_date IS NULL
                AND shipment_date >= order_date
               THEN shipment_id END),
    COUNT(CASE WHEN delivery_date IS NULL AND shipment_date IS NULL
                AND '{as_of_date}'::DATE >= CAST(order_date AS DATE) + INTERVAL '15 days'
               THEN shipment_id END)
FROM staging.shipment_deliveries a
INNER JOIN orders b ON a.order_id = b.order_id;  -- bare name: search path

CREATE TABLE IF NOT EXISTS analytics.best_performing_product (
    ingestion_date DATE NOT NULL,
    product_name VARCHAR(255),
    most_ordered_day DATE,
    is_public_holiday BOOL,
    tt_review_points BIGINT,
    pct_one_star_review FLOAT,
    pct_two_star_review FLOAT,
    pct_three_star_review FLOAT,
    pct_four_star_review FLOAT,
    pct_five_star_review FLOAT,
    pct_early_shipments FLOAT,
    pct_late_shipments FLOAT
);

TRUNCATE TABLE analytics.best_performing_product;

WITH most_ordered AS (
    SELECT product_id, order_date, order_count, working_day
    FROM (
        SELECT product_id, order_date, working_day,
               COUNT(*) AS order_count,
               ROW_NUMBER() OVER (
                   PARTITION BY product_id
                   ORDER BY COUNT(*) DESC, order_date ASC
               ) AS row_num
        FROM staging.orders a
        INNER JOIN if_common.dim_dates b
            ON a.order_date::DATE = b.calendar_dt::DATE
        WHERE day_of_the_week_num BETWEEN 1 AND 5
        GROUP BY product_id, order_date, working_day
    ) ranked
    WHERE row_num = 1
),
review_percentages AS (
    SELECT product_name, a.product_id,
        (CAST(SUM(CASE WHEN review = 1 THEN 1 ELSE 0 END) AS FLOAT) / COUNT(*)) * 100 AS pct_one,
        (CAST(SUM(CASE WHEN review = 2 THEN 1 ELSE 0 END) AS FLOAT) / COUNT(*)) * 100 AS pct_two,
        (CAST(SUM(CASE WHEN review = 3 THEN 1 ELSE 0 END) AS FLOAT) / COUNT(*)) * 100 AS pct_three,
        (CAST(SUM(CASE WHEN review = 4 THEN 1 ELSE 0 END) AS FLOAT) / COUNT(*)) * 100 AS pct_four,
        (CAST(SUM(CASE WHEN review = 5 THEN 1 ELSE 0 END) AS FLOAT) / COUNT(*)) * 100 AS pct_five,
        COUNT(*) AS tt_review_points
    FROM if_common.dim_products a
    INNER JOIN staging.reviews b ON a.product_id = b.product_id
    GROUP BY product_name, a.product_id
),
shipment_percentages AS (
    SELECT product_name, a.product_id,
        (CAST(COUNT(CASE WHEN b.shipment_date IS NOT NULL
                          AND CAST(b.shipment_date AS DATE)
                              < CAST(a.order_date AS DATE) + 6
                          AND b.delivery_date IS NOT NULL
                         THEN a.order_id END) AS FLOAT) / COUNT(*)) * 100
            AS pct_early,
        (CAST(COUNT(CASE WHEN b.shipment_date IS NOT NULL
                          AND (CAST(b.shipment_date AS DATE)
                               >= CAST(a.order_date AS DATE) + 6
                               OR b.delivery_date IS NULL)
                         THEN a.order_id END) AS FLOAT) / COUNT(*)) * 100
            AS pct_late
    FROM staging.orders a
    LEFT JOIN staging.shipment_deliveries b ON a.order_id = b.order_id
    LEFT JOIN if_common.dim_products c ON a.product_id = c.product_id
    GROUP BY product_name, a.product_id
)
INSERT INTO analytics.best_performing_product
SELECT
    CURRENT_DATE AS ingestion_date,
    review_percentages.product_name AS product_name,
    most_ordered.order_date AS most_ordered_day,
    most_ordered.working_day AS is_public_holiday,
    COALESCE(review_percentages.tt_review_points, 0) AS tt_review_points,
    COALESCE(pct_one, 0) AS pct_one_star_review,
    COALESCE(pct_two, 0) AS pct_two_star_review,
    COALESCE(pct_three, 0) AS pct_three_star_review,
    COALESCE(pct_four, 0) AS pct_four_star_review,
    COALESCE(pct_five, 0) AS pct_five_star_review,
    COALESCE(shipment_percentages.pct_early, 0) AS pct_early_shipments,
    COALESCE(shipment_percentages.pct_late, 0) AS pct_late_shipments
FROM most_ordered
LEFT JOIN review_percentages
    ON most_ordered.product_id = review_percentages.product_id
LEFT JOIN shipment_percentages
    ON most_ordered.product_id = shipment_percentages.product_id
ORDER BY pct_five_star_review DESC, pct_four_star_review DESC,
         pct_three_star_review DESC, pct_two_star_review DESC,
         pct_one_star_review DESC, most_ordered.product_id ASC
LIMIT 1;
