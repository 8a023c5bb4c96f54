"""Parity on the REFERENCE'S OWN DATA.

The driver's oracle gate runs on synthetic testdata; this suite runs the
engine's transform operators on the reference repo's actual sample CSVs
(/root/reference/data/*.csv — 10,000 orders / 7,236 reviews / 10,000
shipment_deliveries, read-only) with the reference's own constants (as-of
date 2022-09-05 hardcoded at transformation.sql:65, holiday year 2022 at
:42), and compares against a DuckDB transliteration of
/root/reference/sql/transformation.sql over the same files. This is the
closest available check to "a reference user switches engines and gets
the same numbers" — the reference's Postgres outputs themselves are not
in the repo, so SQL-on-same-data is the oracle.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest

from data_pipeline__s3_to_postgres_s3_spark import schemas
from data_pipeline__s3_to_postgres_s3_spark.config import EngineConfig
from data_pipeline__s3_to_postgres_s3_spark.operators.best_product import (
    best_performing_product_from_tables,
)
from data_pipeline__s3_to_postgres_s3_spark.operators.public_holiday import (
    agg_public_holiday_from_tables,
)
from data_pipeline__s3_to_postgres_s3_spark.operators.shipments import (
    agg_shipments_from_tables,
)
from data_pipeline__s3_to_postgres_s3_spark.sources.files import (
    read_csv,
    split_corrupt,
)

from .oracle_harness import compare

REF_DATA = "/root/reference/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference data not available"
)

CFG = EngineConfig(
    run_date=dt.date(2022, 9, 5),
    as_of_date=dt.date(2022, 9, 5),  # transformation.sql:65 hardcode
    holiday_year=2022,  # transformation.sql:42
    calendar_start=dt.date(2021, 1, 1),
    calendar_end=dt.date(2023, 12, 31),
)

# DuckDB replicas of the generated dims at the reference constants; the
# surrogate product dim mirrors best_performing_product_from_tables.
_DIMS = """
dim_dates AS (
    SELECT calendar_dt,
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
             THEN 'false' ELSE 'true' END AS working_day
    FROM (
        SELECT CAST(unnest(generate_series(
            DATE '2021-01-01', DATE '2023-12-31', INTERVAL 1 DAY)) AS DATE)
            AS calendar_dt
    )
),
dim_products AS (
    SELECT product_id,
        'product_' || CAST(product_id AS VARCHAR) AS product_name
    FROM (
        SELECT DISTINCT product_id FROM orders
        UNION
        SELECT DISTINCT product_id FROM reviews
    )
)
"""

AGG_PUBLIC_HOLIDAY_SQL = f"""
WITH {_DIMS}
SELECT DATE '2022-09-05' AS ingestion_date,
    {', '.join(
        f"CAST(SUM(CASE WHEN month_of_the_year_num = {m} THEN quantity"
        f" ELSE 0 END) AS INTEGER) AS tt_order_hol_{name}"
        for m, name in enumerate(
            ('jan','feb','mar','apr','may','jun',
             'jul','aug','sep','oct','nov','dec'),
            start=1,
        )
    )}
FROM orders
LEFT JOIN dim_dates ON order_date = calendar_dt
WHERE year_num = 2022
  AND day_of_the_week_num BETWEEN 1 AND 5
  AND working_day = 'false'
"""

AGG_SHIPMENTS_SQL = """
SELECT DATE '2022-09-05' AS ingestion_date,
    COUNT(CASE WHEN date_diff('day', order_date, shipment_date) >= 6
                AND delivery_date IS NULL
                AND shipment_date >= order_date
               THEN shipment_id END) AS tt_late_shipments,
    COUNT(CASE WHEN delivery_date IS NULL AND shipment_date IS NULL
                AND DATE '2022-09-05' >= order_date + 15
               THEN shipment_id END) AS tt_undelivered_items
FROM shipment_deliveries a
INNER JOIN orders b USING (order_id)
"""

_PCT_REVIEW = ", ".join(
    f"(CAST(SUM(CASE WHEN review = {k} THEN 1 ELSE 0 END) AS DOUBLE)"
    f" / COUNT(*)) * 100 AS pct_{name}_star_review"
    for k, name in enumerate(("one", "two", "three", "four", "five"), start=1)
)

BEST_PERFORMING_PRODUCT_SQL = f"""
WITH {_DIMS},
most_ordered AS (
    SELECT product_id, order_date, order_count, working_day
    FROM (
        SELECT product_id, order_date, working_day, COUNT(*) AS order_count,
               ROW_NUMBER() OVER (
                   PARTITION BY product_id
                   ORDER BY COUNT(*) DESC, order_date ASC
               ) AS row_num
        FROM orders a
        INNER JOIN dim_dates b ON a.order_date = b.calendar_dt
        WHERE day_of_the_week_num BETWEEN 1 AND 5
        GROUP BY product_id, order_date, working_day
    ) WHERE row_num = 1
),
review_percentages AS (
    SELECT product_name, product_id, {_PCT_REVIEW},
        COUNT(*) AS tt_review_points
    FROM dim_products a
    INNER JOIN reviews b USING (product_id)
    GROUP BY product_name, product_id
),
shipment_percentages AS (
    SELECT product_name, product_id,
        (CAST(COUNT(CASE WHEN b.shipment_date IS NOT NULL
                          AND b.shipment_date < a.order_date + 6
                          AND b.delivery_date IS NOT NULL
                         THEN a.order_id END) AS DOUBLE) / COUNT(*)) * 100
            AS tt_early,
        (CAST(COUNT(CASE WHEN b.shipment_date IS NOT NULL
                          AND (b.shipment_date >= a.order_date + 6
                               OR b.delivery_date IS NULL)
                         THEN a.order_id END) AS DOUBLE) / COUNT(*)) * 100
            AS tt_late
    FROM orders a
    LEFT JOIN shipment_deliveries b USING (order_id)
    LEFT JOIN dim_products c USING (product_id)
    GROUP BY product_name, product_id
)
SELECT DATE '2022-09-05' AS ingestion_date,
    review_percentages.product_name AS product_name,
    most_ordered.order_date AS most_ordered_day,
    CAST(most_ordered.working_day AS BOOLEAN) AS is_public_holiday,
    COALESCE(review_percentages.tt_review_points, 0) AS tt_review_points,
    COALESCE(pct_one_star_review, 0) AS pct_one_star_review,
    COALESCE(pct_two_star_review, 0) AS pct_two_star_review,
    COALESCE(pct_three_star_review, 0) AS pct_three_star_review,
    COALESCE(pct_four_star_review, 0) AS pct_four_star_review,
    COALESCE(pct_five_star_review, 0) AS pct_five_star_review,
    COALESCE(shipment_percentages.tt_early, 0) AS pct_early_shipments,
    COALESCE(shipment_percentages.tt_late, 0) AS pct_late_shipments
FROM most_ordered
LEFT JOIN review_percentages USING (product_id)
LEFT JOIN shipment_percentages USING (product_id)
ORDER BY pct_five_star_review DESC, pct_four_star_review DESC,
         pct_three_star_review DESC, pct_two_star_review DESC,
         pct_one_star_review DESC, most_ordered.product_id ASC
LIMIT 1
"""


@pytest.fixture(scope="module")
def ref_frames(spark):
    out = {}
    for table in ("orders", "reviews", "shipment_deliveries"):
        df = read_csv(
            spark, f"{REF_DATA}/{table}.csv", schemas.CSV_SCHEMAS[table]
        )
        clean, _ = split_corrupt(df)
        out[table] = clean
    return out


@pytest.fixture(scope="module")
def ref_con():
    import duckdb

    con = duckdb.connect()
    for table in ("orders", "reviews", "shipment_deliveries"):
        con.execute(
            f"CREATE VIEW {table} AS SELECT * FROM "
            f"read_csv_auto('{REF_DATA}/{table}.csv', header=true)"
        )
    yield con
    con.close()


def test_row_counts(ref_frames):
    # count() on the raw scan prunes to the corrupt-record filter column
    # alone, which Spark rejects (see sources/files.py) — collect a key.
    def n(table: str, key: str) -> int:
        return len(ref_frames[table].select(key).collect())

    assert n("orders", "order_id") == 10_000
    assert n("reviews", "review") == 7_236
    assert n("shipment_deliveries", "shipment_id") == 10_000


def test_agg_shipments_on_reference_data(spark, ref_frames, ref_con):
    df = agg_shipments_from_tables(
        ref_frames["shipment_deliveries"], ref_frames["orders"], CFG
    )
    report = compare(df, ref_con, AGG_SHIPMENTS_SQL)
    assert report["ok"], report


def test_agg_public_holiday_on_reference_data(spark, ref_frames, ref_con):
    df = agg_public_holiday_from_tables(spark, ref_frames["orders"], CFG)
    report = compare(df, ref_con, AGG_PUBLIC_HOLIDAY_SQL)
    assert report["ok"], report


def test_best_performing_product_on_reference_data(spark, ref_frames, ref_con):
    df = best_performing_product_from_tables(
        spark,
        ref_frames["orders"],
        ref_frames["shipment_deliveries"],
        ref_frames["reviews"],
        CFG,
    )
    report = compare(df, ref_con, BEST_PERFORMING_PRODUCT_SQL)
    assert report["ok"], report
