"""DuckDB oracles for the standard-surface extension queries
(operators/relational.py, operators/windows.py). Same cents / portable-round
formulas as the Spark side (functions/numeric.py)."""

from ..functions.numeric import portable_round_sql

PRICING_SUMMARY = """
WITH base AS (
    SELECT l_returnflag, l_linestatus,
        CAST(ROUND(l_quantity * 100, 0) AS BIGINT) AS qty_c,
        CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS price_c,
        CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)
            AS disc_price_c,
        CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000,
                   0) AS BIGINT) AS charge_c,
        CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS disc_c
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
)
SELECT l_returnflag, l_linestatus,
    SUM(qty_c) / 100.0 AS sum_qty,
    SUM(price_c) / 100.0 AS sum_base_price,
    SUM(disc_price_c) / 10000.0 AS sum_disc_price,
    SUM(charge_c) / 1000000.0 AS sum_charge,
    FLOOR((SUM(qty_c) / 100.0 / COUNT(*)) * 100 + 0.5) / 100 AS avg_qty,
    FLOOR((SUM(price_c) / 100.0 / COUNT(*)) * 100 + 0.5) / 100 AS avg_price,
    FLOOR((SUM(disc_c) / 100.0 / COUNT(*)) * 10000 + 0.5) / 10000 AS avg_disc,
    COUNT(*) AS count_order
FROM base
GROUP BY l_returnflag, l_linestatus
"""

TOP_REVENUE_CUSTOMERS_PER_REGION = """
WITH per_cust AS (
    SELECT o_custkey,
           SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS revenue_cents
    FROM orders GROUP BY o_custkey
),
ranked AS (
    SELECT r_name, c_custkey, c_name, revenue_cents,
           ROW_NUMBER() OVER (
               PARTITION BY r_name
               ORDER BY revenue_cents DESC, c_custkey ASC
           ) AS rank
    FROM per_cust
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
)
SELECT r_name, rank, c_custkey, c_name, revenue_cents / 100.0 AS revenue
FROM ranked WHERE rank <= 3
"""

CUSTOMER_SET_OPS = """
SELECT DISTINCT custkey FROM (
    (
        (
            SELECT c_custkey AS custkey FROM customer
            WHERE c_mktsegment = 'BUILDING'
            UNION ALL
            SELECT o_custkey AS custkey FROM orders
            GROUP BY o_custkey
            HAVING SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                   > 50000000
        )
        INTERSECT
        SELECT DISTINCT o_custkey AS custkey FROM orders
    )
    EXCEPT ALL
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal < 0
)
"""

# HAVING COUNT(*) > 0 on every grouping-set oracle: Spark emits NO rows
# at all for a ROLLUP/CUBE/GROUPING SETS over EMPTY input, while the SQL
# standard (and DuckDB) emit the () grand-total row with COUNT 0 — the
# one un-mirrorable-in-Spark corner of the r12 empty-table probe. A
# grouped row over non-empty input always has COUNT >= 1, so the clause
# is a verified no-op whenever any row exists.
_GROUPED_TOTALS = """
    COUNT(*) AS n_orders,
    SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) / 100.0 AS total_revenue
"""

ROLLUP_ORDERS = f"""
SELECT COALESCE(o_orderstatus, 'ALL') AS orderstatus,
       COALESCE(o_orderpriority, 'ALL') AS orderpriority,
       {_GROUPED_TOTALS}
FROM orders
GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
HAVING COUNT(*) > 0
"""

CUBE_ORDERS = f"""
SELECT COALESCE(o_orderstatus, 'ALL') AS orderstatus,
       COALESCE(o_orderpriority, 'ALL') AS orderpriority,
       {_GROUPED_TOTALS}
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
HAVING COUNT(*) > 0
"""

# grouping_sets_orders (operators/relational.grouping_sets_orders):
# explicit set list + GROUPING id; DuckDB's GROUPING(a, b) uses the same
# first-column-is-MSB bit order as Spark's grouping_id() and returns
# BIGINT on both engines.
GROUPING_SETS_ORDERS = f"""
SELECT COALESCE(o_orderstatus, 'ALL') AS orderstatus,
       COALESCE(o_orderpriority, 'ALL') AS orderpriority,
       GROUPING(o_orderstatus, o_orderpriority) AS gid,
       {_GROUPED_TOTALS}
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                        (o_orderpriority), ())
HAVING COUNT(*) > 0
"""

# part_revenue_concentration (operators/relational.part_revenue_concentration):
# TPC-H Q11 shape — the threshold compare stays in exact integers
# (rc·np·10 > 13·t) on both engines; share is one IEEE division of the
# same integers, portable-rounded at 1e-8.
PART_REVENUE_CONCENTRATION = f"""
WITH pp AS (
    SELECT l_partkey,
        SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000, 0)
            AS BIGINT)) AS rc
    FROM lineitem GROUP BY l_partkey
),
tot AS (SELECT SUM(rc) AS t, COUNT(*) AS np FROM pp)
SELECT l_partkey AS partkey,
    rc / 10000.0 AS part_revenue,
    {portable_round_sql('CAST(rc AS DOUBLE) / CAST(t AS DOUBLE)', 8)}
        AS revenue_share
FROM pp, tot
WHERE rc * np * 10 > 13 * t
"""

# large_order_customers (operators/relational.large_order_customers):
# TPC-H Q18 shape — HAVING on exact integer centi-quantities before any
# join; the top-100 cut orders by integer cents + orderkey.
LARGE_ORDER_CUSTOMERS = """
WITH big AS (
    SELECT l_orderkey,
        SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS qty_c
    FROM lineitem GROUP BY l_orderkey
    HAVING SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) > 25000
)
SELECT c_custkey, c_name, o_orderkey,
    CAST(o_orderdate AS DATE) AS orderdate,
    CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) / 100.0 AS totalprice,
    qty_c / 100.0 AS sum_qty
FROM big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) DESC, o_orderkey ASC
LIMIT 100
"""

# min_cost_supplier (operators/relational.min_cost_supplier): TPC-H Q2
# shape — unit price is ONE IEEE division of exact integers
# (bit-identical cross-engine), portable-rounded at 1e-4 BEFORE the MIN
# and the rank; ties break by suppkey.
_UNIT = portable_round_sql(
    "CAST(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS DOUBLE)"
    " / l_quantity", 4
)
MIN_COST_SUPPLIER = f"""
WITH per_ps AS (
    -- r9c NULL/zero guard, mirrored from the operator: a line with NULL
    -- price / NULL-or-zero quantity / NULL part / NULL supplier cannot
    -- offer a price (no-op on the clean corpus; keeps NULLs out of the
    -- rank window whose ASC NULL position differs cross-engine).
    SELECT l_partkey, l_suppkey, MIN({_UNIT}) AS min_unit_cents
    FROM lineitem
    WHERE l_quantity > 0 AND l_extendedprice IS NOT NULL
      AND l_partkey IS NOT NULL AND l_suppkey IS NOT NULL
    GROUP BY l_partkey, l_suppkey
),
best AS (
    SELECT l_partkey, l_suppkey, min_unit_cents,
        ROW_NUMBER() OVER (
            PARTITION BY l_partkey
            ORDER BY min_unit_cents ASC, l_suppkey ASC
        ) AS rn
    FROM per_ps
)
SELECT l_partkey AS partkey, l_suppkey AS suppkey, s_name,
    min_unit_cents / 100.0 AS best_unit_price
FROM best JOIN supplier ON l_suppkey = s_suppkey
WHERE rn = 1
"""

# supplier_nation_profit (operators/relational.supplier_nation_profit):
# TPC-H Q9 shape — EXTRACT(year) in the grouping key; exact 4-decimal
# integer revenue; year cast INT to match Spark's year().
SUPPLIER_NATION_PROFIT = """
SELECT n_name,
    CAST(EXTRACT(year FROM l_shipdate) AS INT) AS o_year,
    CAST(COUNT(*) AS BIGINT) AS n_lineitems,
    SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000, 0)
        AS BIGINT)) / 10000.0 AS profit
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name, o_year
"""

# regional_market_share (operators/relational.regional_market_share):
# TPC-H Q8 shape — conditional and total sums from ONE grouped pass in
# exact integers; share is one IEEE division, portable-rounded 1e-6.
REGIONAL_MARKET_SHARE = f"""
WITH g AS (
    SELECT r_name,
        CAST(EXTRACT(year FROM l_shipdate) AS INT) AS o_year,
        SUM(CASE WHEN n_name = 'NATION_7'
            THEN CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000, 0)
                 AS BIGINT) ELSE 0 END) AS nat_c,
        SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000, 0)
            AS BIGINT)) AS tot_c
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, o_year
)
SELECT r_name, o_year,
    nat_c / 10000.0 AS nation_revenue,
    tot_c / 10000.0 AS total_revenue,
    {portable_round_sql('CAST(nat_c AS DOUBLE) / CAST(tot_c AS DOUBLE)', 6)}
        AS market_share
FROM g
"""

DISTINCT_AGGREGATES = """
SELECT n_name,
    COUNT(DISTINCT c_mktsegment) AS n_segments,
    COUNT(DISTINCT c_custkey) AS n_customers,
    COUNT(*) AS n_rows
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""

# Events: ts is TIMESTAMP_NS in parquet; truncate to microseconds the same
# way the Spark side does (timestamp_micros(ts DIV 1000)).
_EV = "(SELECT *, CAST(ts AS TIMESTAMP) AS tsu FROM events)"

EVENTS_SESSIONIZED = f"""
WITH flagged AS (
    SELECT user_id, event_id, tsu, value,
        CASE WHEN FLOOR(epoch(tsu))
                  - FLOOR(epoch(LAG(tsu) OVER w)) > {30 * 60}
                  OR LAG(tsu) OVER w IS NULL
             THEN 1 ELSE 0 END AS new_session
    FROM {_EV}
    WINDOW w AS (PARTITION BY user_id ORDER BY tsu NULLS FIRST, event_id NULLS FIRST)
),
sessions AS (
    SELECT user_id, value,
        SUM(new_session) OVER (
            PARTITION BY user_id ORDER BY tsu NULLS FIRST, event_id NULLS FIRST
            ROWS UNBOUNDED PRECEDING
        ) AS session_id
    FROM flagged
)
SELECT user_id,
    -- DuckDB's windowed SUM yields HUGEINT → pandas float64; Spark emits
    -- int64. Cast so the driver's value-hash compares 3 with 3, not 3.0.
    CAST(MAX(session_id) AS BIGINT) AS n_sessions,
    COUNT(*) AS n_events,
    SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) / 100.0 AS total_value
FROM sessions
GROUP BY user_id
"""

EVENTS_RUNNING_TOTALS = f"""
SELECT user_id, event_id,
    SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) OVER (
        PARTITION BY user_id ORDER BY tsu NULLS FIRST, event_id NULLS FIRST
        ROWS UNBOUNDED PRECEDING
    ) / 100.0 AS running_value
FROM {_EV}
"""

EVENT_TYPE_HOURLY = f"""
SELECT CAST(date_trunc('hour', tsu) AS TIMESTAMP) AS hour_start, event_type,
    COUNT(*) AS n_events,
    SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) / 100.0 AS total_value,
    COUNT(DISTINCT user_id) AS n_users
FROM {_EV}
GROUP BY hour_start, event_type
"""

VALUE_PERCENTILES = f"""
SELECT event_type,
    quantile_cont(value, 0.5) AS p50,
    quantile_cont(value, 0.9) AS p90,
    quantile_cont(value, 0.99) AS p99,
    MIN(value) AS min_value,
    MAX(value) AS max_value,
    COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY event_type
"""


# SCD2 from the event change log: change points via LAG over the same
# (user_id -> tsu, event_id) order, LEAD(valid_from) closes each episode.
SCD2_USER_EVENT_HISTORY = f"""
WITH pts AS (
    SELECT user_id, event_type, tsu, event_id,
        CASE WHEN LAG(event_type) OVER w IS NULL
                  OR LAG(event_type) OVER w <> event_type
             THEN 1 ELSE 0 END AS is_change
    FROM {_EV}
    WINDOW w AS (PARTITION BY user_id ORDER BY tsu NULLS FIRST, event_id NULLS FIRST)
)
SELECT user_id, event_type,
    CAST(ROW_NUMBER() OVER w2 AS INT) AS version,
    tsu AS valid_from,
    LEAD(tsu) OVER w2 AS valid_to,
    LEAD(tsu) OVER w2 IS NULL AS is_current
FROM pts
WHERE is_change = 1
WINDOW w2 AS (PARTITION BY user_id ORDER BY tsu NULLS FIRST, event_id NULLS FIRST)
"""


# Pivot/unpivot: conditional cents-sums per status; the unpivot oracle is
# the dense month x status long form (zero for empty cells, like the
# materialized pivot).
_STATUS_TOTAL = (
    "COALESCE(SUM(CASE WHEN o_orderstatus = '{s}' THEN "
    "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) END), 0) / 100.0"
)

ORDER_STATUS_PIVOT = f"""
SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
    {_STATUS_TOTAL.format(s='F')} AS total_F,
    {_STATUS_TOTAL.format(s='O')} AS total_O,
    {_STATUS_TOTAL.format(s='P')} AS total_P
FROM orders
GROUP BY month
"""

ORDER_STATUS_UNPIVOT = f"""
WITH wide AS ({ORDER_STATUS_PIVOT})
SELECT month, 'F' AS o_orderstatus, total_F AS total FROM wide
UNION ALL
SELECT month, 'O', total_O FROM wide
UNION ALL
SELECT month, 'P', total_P FROM wide
"""


_REV = "CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)"

# o_orderdate CAST to DATE like the Spark side's to_date: the output
# type must not track the parquet encoding (test_date_encoding.py).
SHIPPING_PRIORITY = f"""
SELECT l.l_orderkey, CAST(o.o_orderdate AS DATE) AS o_orderdate,
    o.o_orderpriority,
    SUM({_REV}) / 10000.0 AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < DATE '1998-06-01'
  AND l.l_shipdate > DATE '1998-06-01'
GROUP BY l.l_orderkey, CAST(o.o_orderdate AS DATE), o.o_orderpriority
ORDER BY revenue DESC, l.l_orderkey ASC
LIMIT 10
"""

LOCAL_SUPPLIER_VOLUME = f"""
SELECT n.n_name,
    SUM({_REV}) / 10000.0 AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= DATE '1997-01-01'
  AND o.o_orderdate < DATE '1998-01-01'
GROUP BY n.n_name
ORDER BY revenue DESC, n.n_name ASC
"""


CUSTOMER_CHURN_RECONCILIATION = """
WITH early AS (
    SELECT o_custkey AS early_key, COUNT(*) AS n_early
    FROM orders
    WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
    GROUP BY o_custkey
),
late AS (
    SELECT o_custkey AS late_key, COUNT(*) AS n_late
    FROM orders
    WHERE o_orderdate >= DATE '2000-01-01' AND o_orderdate < DATE '2001-01-01'
    GROUP BY o_custkey
)
SELECT COALESCE(early_key, late_key) AS customer_key,
    CAST(COALESCE(n_early, 0) AS BIGINT) AS n_early,
    CAST(COALESCE(n_late, 0) AS BIGINT) AS n_late,
    CASE WHEN early_key IS NULL THEN 'new'
         WHEN late_key IS NULL THEN 'churned'
         ELSE 'retained' END AS status
FROM early FULL OUTER JOIN late ON early_key = late_key
"""

LARGE_VOLUME_ORDERS = """
WITH big AS (
    SELECT l_orderkey,
           SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS qty_c
    FROM lineitem
    GROUP BY l_orderkey
    HAVING qty_c > 25000
)
SELECT c_custkey, c_name, o_orderkey,
    CAST(o_orderdate AS DATE) AS o_orderdate,
    -- DOUBLE-pinned like the DATE cast above: under a DECIMAL(12,2)
    -- money layout a raw pass-through would come back Decimal-typed
    -- (tests/test_money_encoding.py); cast is a no-op on today's double.
    CAST(o_totalprice AS DOUBLE) AS total_price,
    qty_c / 100.0 AS sum_qty
FROM orders
JOIN big ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_price DESC, o_orderkey ASC
LIMIT 100
"""

NATION_TRADE_VOLUME = f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
    CAST(year(l_shipdate) AS INT) AS l_year,
    SUM({_REV}) / 10000.0 AS revenue
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
JOIN nation cn ON c.c_nationkey = cn.n_nationkey
WHERE sn.n_name IN ('NATION_1', 'NATION_2')
  AND cn.n_name IN ('NATION_1', 'NATION_2')
  AND sn.n_name <> cn.n_name
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""

PARTS_SUPPLIER_STATS = """
SELECT p_brand, p_type, p_size,
    COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5'
  AND p_type <> 'MEDIUM'
  AND p_size IN (1, 5, 9, 14, 20, 28, 36, 45)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC
"""

# growth_pct uses the same floor(x*f + 0.5)/f formula on BOTH sides — for
# negative growth that's round-half-toward-+inf, which is fine for parity
# because the formulas are identical.
MONTHLY_REVENUE_GROWTH = """
WITH monthly AS (
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
           SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS rev_c
    FROM orders
    GROUP BY month
)
SELECT month,
    rev_c / 100.0 AS revenue,
    LAG(rev_c) OVER w / 100.0 AS prev_revenue,
    FLOOR((rev_c - LAG(rev_c) OVER w) * 100.0 / LAG(rev_c) OVER w
          * 10000 + 0.5) / 10000 AS growth_pct,
    FLOOR(CAST(SUM(rev_c) OVER f AS DOUBLE) / COUNT(*) OVER f
          / 100.0 * 100 + 0.5) / 100 AS trailing_3mo_avg
FROM monthly
WINDOW w AS (ORDER BY month),
       f AS (ORDER BY month ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""

SMALL_QUANTITY_REVENUE = """
WITH per_part AS (
    SELECT l_partkey AS avg_key,
           CAST(SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS BIGINT)
               AS sum_qty_c,
           COUNT(*) AS cnt
    FROM lineitem
    GROUP BY l_partkey
)
SELECT
    FLOOR((CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
                AS BIGINT) / 100.0 / 7.0) * 100 + 0.5) / 100 AS avg_yearly,
    COUNT(*) AS n_lineitems
FROM lineitem
JOIN per_part ON l_partkey = avg_key
WHERE 5 * CAST(ROUND(l_quantity * 100, 0) AS BIGINT) * cnt < sum_qty_c
"""

VALUE_HISTOGRAM = """
SELECT event_type,
    CAST(FLOOR(value / 5.0) AS BIGINT) AS bucket,
    -- CAST the width to DOUBLE: a bare 5.0 literal is DECIMAL(2,1) in
    -- DuckDB, so BIGINT * 5.0 types as DECIMAL(21,1) — pandas-lossy
    -- (driver hashes the pandas form; Spark emits DOUBLE).
    CAST(FLOOR(value / 5.0) AS BIGINT) * CAST(5.0 AS DOUBLE) AS bucket_low,
    COUNT(*) AS n,
    MIN(value) AS min_value,
    MAX(value) AS max_value
FROM events
GROUP BY event_type, CAST(FLOOR(value / 5.0) AS BIGINT)
"""

CUSTOMER_REVENUE_DECILES = """
WITH per_cust AS (
    SELECT o_custkey,
           CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS rev_c
    FROM orders
    GROUP BY o_custkey
),
ranked AS (
    SELECT n_name, rev_c,
           NTILE(10) OVER (
               PARTITION BY n_name ORDER BY rev_c DESC, c_custkey ASC
           ) AS decile
    FROM per_cust
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
)
SELECT n_name, decile,
    COUNT(*) AS n_customers,
    MAX(rev_c) / 100.0 AS max_revenue,
    MIN(rev_c) / 100.0 AS min_revenue,
    CAST(SUM(rev_c) AS BIGINT) / 100.0 AS total_revenue
FROM ranked
GROUP BY n_name, decile
"""

ORDER_PRIORITY_LATENESS = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1997-07-01'
  AND o_orderdate < TIMESTAMP '1997-10-01'
  AND EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
  )
GROUP BY o_orderpriority
"""

CUSTOMER_ORDER_DISTRIBUTION = """
WITH per_cust AS (
    SELECT c_custkey, COUNT(o_orderkey) AS c_count
    FROM customer
    LEFT JOIN orders
      ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
    GROUP BY c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM per_cust
GROUP BY c_count
"""

SUPPLIERS_KEPT_WAITING = """
WITH per_order AS (
    SELECT l_orderkey,
        COUNT(DISTINCT l_suppkey) AS n_supp,
        COUNT(DISTINCT CASE WHEN l_shipdate > o_orderdate + INTERVAL 30 DAY
                            THEN l_suppkey END) AS n_late,
        MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 30 DAY
                 THEN l_suppkey END) AS blame_supp
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'
    GROUP BY l_orderkey
)
SELECT s_name, COUNT(*) AS numwait
FROM per_order
JOIN supplier ON blame_supp = s_suppkey
WHERE n_supp > 1 AND n_late = 1
GROUP BY s_name
"""

DORMANT_HIGH_VALUE_CUSTOMERS = """
WITH pos AS (
    SELECT CAST(SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
               AS sum_c,
           COUNT(*) AS n_pos
    FROM customer WHERE c_acctbal > 0
)
SELECT n_name, COUNT(*) AS numcust,
    CAST(SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) / 100.0
        AS totacctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey, pos
WHERE CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) * n_pos > sum_c
  AND NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey
        AND o_orderdate >= TIMESTAMP '2000-06-01'
  )
GROUP BY n_name
"""

# Batch twin of the streaming sliding window: 1-hour windows sliding every
# 15 minutes — each event contributes to exactly 4 aligned window starts.
EVENTS_SLIDING_VALUE = f"""
WITH contrib AS (
    SELECT time_bucket(INTERVAL 15 MINUTE, tsu)
               - k * INTERVAL 15 MINUTE AS window_start,
           event_type, value
    FROM {_EV}, (SELECT UNNEST([0, 1, 2, 3]) AS k)
    -- F.window() DROPS NULL-ts rows (unlike a groupBy over date_trunc,
    -- which keeps a NULL group) — r13 extreme-timestamp probe.
    WHERE tsu IS NOT NULL
)
SELECT CAST(window_start AS TIMESTAMP) AS window_start, event_type,
    COUNT(*) AS n_events,
    SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) / 100.0 AS total_value
FROM contrib
GROUP BY window_start, event_type
"""

def _cdc_merge_sql() -> str:
    """MERGE-upsert oracle sharing the Spark operator's feed constants
    (operators/cdc.py) so the synthetic CDC feed can never drift."""
    from ..operators.cdc import CDC_DELETE_MOD, CDC_INSERT_MOD, CDC_UPDATE_MOD

    return f"""
WITH base AS (
    SELECT c_custkey AS custkey, c_name AS name,
           CAST(c_acctbal AS DOUBLE) AS acctbal,
           c_mktsegment AS mktsegment
    FROM customer
),
deletes AS (SELECT custkey FROM base WHERE custkey % {CDC_DELETE_MOD} = 0),
updates AS (
    SELECT custkey, acctbal + 100.0 AS u_acctbal,
           'REACTIVATED' AS u_mktsegment
    FROM base
    WHERE custkey % {CDC_UPDATE_MOD} = 0 AND custkey % {CDC_DELETE_MOD} <> 0
),
inserts AS (
    SELECT -custkey AS custkey, 'NEW ' || name AS name, 0.0 AS acctbal,
           mktsegment, 'inserted' AS cdc_op
    FROM base WHERE custkey % {CDC_INSERT_MOD} = 0
),
survivors AS (
    SELECT b.* FROM base b ANTI JOIN deletes d USING (custkey)
),
merged AS (
    SELECT s.custkey, s.name,
        COALESCE(u.u_acctbal, s.acctbal) AS acctbal,
        COALESCE(u.u_mktsegment, s.mktsegment) AS mktsegment,
        CASE WHEN u.u_acctbal IS NOT NULL THEN 'updated'
             ELSE 'kept' END AS cdc_op
    FROM survivors s LEFT JOIN updates u USING (custkey)
)
SELECT * FROM merged UNION ALL SELECT * FROM inserts
"""


CDC_MERGE_CUSTOMERS = _cdc_merge_sql()

def _rolling_zscore_sql() -> str:
    """Token-identical double formula over the same integer-exact frame
    moments as the Spark operator (constants imported — no drift)."""
    from ..operators.windows import ROLLING_MIN_N, ROLLING_WINDOW_ROWS

    return f"""
WITH c AS (
    SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tsu,
           CAST(ROUND(value * 100, 0) AS BIGINT) AS c
    FROM events
),
win AS (
    SELECT user_id, event_id, c,
        COUNT(*) OVER w AS n,
        SUM(c) OVER w AS s1,
        SUM(c * c) OVER w AS s2
    FROM c
    WINDOW w AS (
        PARTITION BY user_id ORDER BY tsu NULLS FIRST, event_id NULLS FIRST
        ROWS BETWEEN {ROLLING_WINDOW_ROWS - 1} PRECEDING AND CURRENT ROW
    )
)
SELECT user_id, event_id,
    FLOOR(
        (CAST(c AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        / sqrt((CAST(s2 AS DOUBLE)
                - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
               / (CAST(n AS DOUBLE) - 1))
        * 1000000 + 0.5) / 1000000 AS zscore
FROM win
WHERE n >= {ROLLING_MIN_N} AND s2 * n > s1 * s1
"""


EVENTS_ROLLING_ZSCORE = _rolling_zscore_sql()

def _profile_sql(table: str, cols: tuple, source_sql: str | None = None) -> str:
    """One aggregate subquery + per-column UNION ALL unpivot — same single
    scan, same exact distincts, columns pinned to the operator's list."""
    aggs = ["COUNT(*) AS n_rows"]
    for c in cols:
        aggs.append(f"COUNT({c}) AS nn_{c}")
        aggs.append(f"COUNT(DISTINCT {c}) AS nd_{c}")
    arms = "\nUNION ALL\n".join(
        f"SELECT '{c}' AS column_name, n_rows, nn_{c} AS n_nonnull,"
        f" nd_{c} AS n_distinct FROM s"
        for c in cols
    )
    src = source_sql or table
    return f"WITH s AS (SELECT {', '.join(aggs)} FROM {src})\n{arms}"


def _profile_oracles() -> dict:
    from ..operators.profiling import (
        PROFILE_DOCUMENTS_COLS,
        PROFILE_EVENTS_COLS,
        PROFILE_ORDERS_COLS,
    )

    return {
        "profile_orders": _profile_sql("orders", PROFILE_ORDERS_COLS),
        "profile_documents": _profile_sql("documents", PROFILE_DOCUMENTS_COLS),
        # Profile the micros-TRUNCATED ts, not the raw encoding: the Spark
        # side profiles the normalize_event_ts output, and a driver
        # re-encode with true sub-microsecond nanos (the round-3 drift
        # class) would otherwise split n_distinct between the two.
        # CAST(ts AS TIMESTAMP) truncates TIMESTAMP_NS → micros and is a
        # no-op on timestamp[us]; * REPLACE keeps the column name 'ts'.
        "profile_events": _profile_sql(
            "events",
            PROFILE_EVENTS_COLS,
            "(SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)",
        ),
    }


PROFILE_ORDERS = _profile_oracles()["profile_orders"]

# --- events product analytics (operators/events_analytics.py) -------------
# Strict first-touch funnel: NULL three-valued logic is equivalent on both
# sides (Spark SUM skips NULL flags; the CASE's ELSE 0 lands the same
# place); integer SUMs cast back to BIGINT (HUGEINT trap).


def _funnel_sql() -> str:
    from ..operators.events_analytics import FUNNEL_STEPS

    first_cols = ", ".join(
        f"MIN(CASE WHEN event_type = '{s}' THEN tsu END) AS t_{s}"
        for s in FUNNEL_STEPS
    )
    reached = [f"(t_{FUNNEL_STEPS[0]} IS NOT NULL)"]
    for prev, cur in zip(FUNNEL_STEPS, FUNNEL_STEPS[1:]):
        reached.append(f"({reached[-1]} AND t_{cur} > t_{prev})")
    flag_cols = ", ".join(
        f"{r} AS r_{s}" for s, r in zip(FUNNEL_STEPS, reached)
    )
    count_cols = ", ".join(
        f"CAST(SUM(CASE WHEN r_{s} THEN 1 ELSE 0 END) AS BIGINT) AS n_{s}"
        for s in FUNNEL_STEPS
    )
    rate_cols = ", ".join(
        "CASE WHEN n_" + prev + " > 0 THEN "
        + portable_round_sql(f"CAST(n_{cur} AS DOUBLE) / n_{prev}", 6)
        + f" END AS rate_{cur}"
        for prev, cur in zip(FUNNEL_STEPS, FUNNEL_STEPS[1:])
    )
    return f"""
WITH firsts AS (
    SELECT user_id, {first_cols}
    FROM {_EV}
    GROUP BY user_id
),
flags AS (SELECT {flag_cols} FROM firsts),
counts AS (SELECT COUNT(*) AS n_users, {count_cols} FROM flags)
SELECT n_users, {", ".join(f"n_{s}" for s in FUNNEL_STEPS)}, {rate_cols}
FROM counts
"""


FUNNEL_CONVERSION = _funnel_sql()

RETENTION_COHORTS = f"""
WITH days AS (
    SELECT DISTINCT user_id, CAST(tsu AS DATE) AS d
    FROM {_EV}
),
cohort AS (
    SELECT user_id, MIN(d) AS cohort_day FROM days GROUP BY user_id
),
sizes AS (
    SELECT cohort_day, COUNT(*) AS cohort_size FROM cohort GROUP BY cohort_day
),
cells AS (
    SELECT c.cohort_day,
        date_diff('day', c.cohort_day, d.d) AS offset_days,
        COUNT(*) AS n_active
    FROM days d JOIN cohort c USING (user_id)
    GROUP BY 1, 2
)
SELECT cohort_day, offset_days, n_active, cohort_size,
    {portable_round_sql('CAST(n_active AS DOUBLE) / cohort_size', 6)}
        AS retention_rate
FROM cells JOIN sizes USING (cohort_day)
"""

EXTENSION_ORACLES = {
    "cdc_merge_customers": CDC_MERGE_CUSTOMERS,
    "funnel_conversion": FUNNEL_CONVERSION,
    "retention_cohorts": RETENTION_COHORTS,
    "events_rolling_zscore": EVENTS_ROLLING_ZSCORE,
    **_profile_oracles(),
    "pricing_summary": PRICING_SUMMARY,
    "top_revenue_customers_per_region": TOP_REVENUE_CUSTOMERS_PER_REGION,
    "customer_set_ops": CUSTOMER_SET_OPS,
    "rollup_orders": ROLLUP_ORDERS,
    "cube_orders": CUBE_ORDERS,
    "grouping_sets_orders": GROUPING_SETS_ORDERS,
    "part_revenue_concentration": PART_REVENUE_CONCENTRATION,
    "large_order_customers": LARGE_ORDER_CUSTOMERS,
    "min_cost_supplier": MIN_COST_SUPPLIER,
    "supplier_nation_profit": SUPPLIER_NATION_PROFIT,
    "regional_market_share": REGIONAL_MARKET_SHARE,
    "distinct_aggregates": DISTINCT_AGGREGATES,
    "events_sessionized": EVENTS_SESSIONIZED,
    "events_running_totals": EVENTS_RUNNING_TOTALS,
    "event_type_hourly": EVENT_TYPE_HOURLY,
    "value_percentiles": VALUE_PERCENTILES,
    "scd2_user_event_history": SCD2_USER_EVENT_HISTORY,
    "customer_churn_reconciliation": CUSTOMER_CHURN_RECONCILIATION,
    "shipping_priority": SHIPPING_PRIORITY,
    "local_supplier_volume": LOCAL_SUPPLIER_VOLUME,
    "order_status_pivot": ORDER_STATUS_PIVOT,
    "order_status_unpivot": ORDER_STATUS_UNPIVOT,
    "large_volume_orders": LARGE_VOLUME_ORDERS,
    "nation_trade_volume": NATION_TRADE_VOLUME,
    "parts_supplier_stats": PARTS_SUPPLIER_STATS,
    "monthly_revenue_growth": MONTHLY_REVENUE_GROWTH,
    "small_quantity_revenue": SMALL_QUANTITY_REVENUE,
    "value_histogram": VALUE_HISTOGRAM,
    "customer_revenue_deciles": CUSTOMER_REVENUE_DECILES,
    "events_sliding_value": EVENTS_SLIDING_VALUE,
    "order_priority_lateness": ORDER_PRIORITY_LATENESS,
    "customer_order_distribution": CUSTOMER_ORDER_DISTRIBUTION,
    "suppliers_kept_waiting": SUPPLIERS_KEPT_WAITING,
    "dormant_high_value_customers": DORMANT_HIGH_VALUE_CUSTOMERS,
}

# item_cooccurrence: mirrors operators/events_analytics.py — same distinct
# (user, item) basket base, same CAP-smallest-items guard (ROW_NUMBER ORDER
# BY item ↔ slice(sort_array(...))), pair expansion as a plain self-join
# (independent formulation of the in-row expansion), and the lift quotient
# divides the SAME exact long products on both engines. TRY_CAST-then-filter
# mirrors Spark's cast-then-filter: a non-integer '$.k' payload (the props
# re-encode hazard class) drops the row on both engines instead of
# hard-erroring in DuckDB.
from ..operators.events_analytics import BASKET_EVENT_TYPES, BASKET_ITEM_CAP

_BASKET_TYPES_SQL = ", ".join(f"'{t}'" for t in BASKET_EVENT_TYPES)

ITEM_COOCCURRENCE = f"""
WITH items AS (
    SELECT DISTINCT user_id, item FROM (
        SELECT user_id,
            TRY_CAST(CASE WHEN json_valid(props)
                      AND regexp_matches(
                          json_extract_string(props, '$.k'),
                          '^[ ]*[+-]?[0-9]+[ ]*$')
                     THEN json_extract_string(props, '$.k') END
                     AS BIGINT) AS item
        FROM events
        WHERE event_type IN ({_BASKET_TYPES_SQL}))
    WHERE item IS NOT NULL AND user_id IS NOT NULL
),
capped AS (
    SELECT user_id, item FROM (
        SELECT user_id, item,
            ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY item) AS rn
        FROM items)
    WHERE rn <= {BASKET_ITEM_CAP}
),
pairs AS (
    SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS n_users_both
    FROM capped a JOIN capped b
      ON a.user_id = b.user_id AND a.item < b.item
    GROUP BY 1, 2
),
marg AS (SELECT item, COUNT(*) AS n_users FROM items GROUP BY 1),
tot AS (SELECT COUNT(DISTINCT user_id) AS n FROM items)
SELECT p.item_a, p.item_b, p.n_users_both,
    ma.n_users AS n_users_a, mb.n_users AS n_users_b,
    CAST(p.n_users_both * tot.n AS DOUBLE) / (ma.n_users * mb.n_users)
        AS lift
FROM pairs p
JOIN marg ma ON p.item_a = ma.item
JOIN marg mb ON p.item_b = mb.item, tot
"""

EXTENSION_ORACLES["item_cooccurrence"] = ITEM_COOCCURRENCE

# customer_rfm_segments: same per-customer rollup, same per-nation NTILE(4)
# with custkey tie-breaks, exact-cents monetary (HUGEINT sum divides to
# DOUBLE before pandas sees it).
from ..operators.windows import N_RFM_TILES

CUSTOMER_RFM_SEGMENTS = f"""
WITH per_cust AS (
    SELECT o_custkey,
        MAX(o_orderdate) AS last_order,
        COUNT(*) AS n_orders,
        SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS spend_c
    FROM orders GROUP BY o_custkey
),
enriched AS (
    SELECT n.n_name, p.o_custkey AS c_custkey, p.last_order, p.n_orders,
           p.spend_c
    FROM per_cust p
    JOIN customer c ON p.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
),
scored AS (
    SELECT n_name, spend_c,
        NTILE({N_RFM_TILES}) OVER (PARTITION BY n_name
            ORDER BY last_order, c_custkey) AS r_score,
        NTILE({N_RFM_TILES}) OVER (PARTITION BY n_name
            ORDER BY n_orders, c_custkey) AS f_score,
        NTILE({N_RFM_TILES}) OVER (PARTITION BY n_name
            ORDER BY spend_c, c_custkey) AS m_score
    FROM enriched
)
SELECT n_name, r_score, f_score, m_score,
    COUNT(*) AS n_customers,
    SUM(spend_c) / 100.0 AS total_monetary
FROM scored GROUP BY n_name, r_score, f_score, m_score
"""

EXTENSION_ORACLES["customer_rfm_segments"] = CUSTOMER_RFM_SEGMENTS

# promo_revenue_share: same 4-decimal integer revenue units, same
# double(promo)*100/total association; month CAST to DATE as in the other
# calendar rollups. The HUGEINT sums divide straight to DOUBLE.
_REV_C4 = "CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)"

PROMO_REVENUE_SHARE = f"""
SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
    SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_C4} ELSE 0 END) / 10000.0
        AS promo_revenue,
    SUM({_REV_C4}) / 10000.0 AS total_revenue,
    CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_C4} ELSE 0 END)
         AS DOUBLE) * 100 / SUM({_REV_C4}) AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY month
"""

EXTENSION_ORACLES["promo_revenue_share"] = PROMO_REVENUE_SHARE

# conversion_latency_stats: same two conditional MINs, exact-microsecond
# latencies, and the corpus_stats percentile idiom — portable_round(q/1e6)
# with token-identical association on both sides.
CONVERSION_LATENCY_STATS = f"""
WITH per_user AS (
    SELECT user_id,
        MIN(CASE WHEN event_type = 'view' THEN tsu END) AS first_view,
        MIN(CASE WHEN event_type = 'purchase' THEN tsu END) AS first_purchase
    FROM (SELECT *, CAST(ts AS TIMESTAMP) AS tsu FROM events)
    GROUP BY user_id
),
conv AS (
    SELECT CAST(first_view AS DATE) AS cohort_day,
        epoch_us(first_purchase) - epoch_us(first_view) AS lat_us
    FROM per_user
    WHERE first_view IS NOT NULL AND first_purchase >= first_view
)
SELECT cohort_day,
    COUNT(*) AS n_converted,
    {portable_round_sql('CAST(SUM(lat_us) AS DOUBLE) / COUNT(*) / 1000000.0', 6)}
        AS mean_latency_s,
    {portable_round_sql('quantile_cont(lat_us, 0.5) / 1000000.0', 6)}
        AS p50_latency_s,
    {portable_round_sql('quantile_cont(lat_us, 0.9) / 1000000.0', 6)}
        AS p90_latency_s
FROM conv GROUP BY cohort_day
"""

EXTENSION_ORACLES["conversion_latency_stats"] = CONVERSION_LATENCY_STATS

# item_triangles: nests the item_cooccurrence oracle verbatim (same basket
# base and cap), then counts ordered wedges closed by a third edge — each
# triangle x<y<z appears exactly once, corners unnested per node.
from ..operators.graph import COOC_TRIANGLE_MIN_USERS

ITEM_TRIANGLES = f"""
WITH items AS (
    SELECT DISTINCT user_id, item FROM (
        SELECT user_id,
            TRY_CAST(CASE WHEN json_valid(props)
                      AND regexp_matches(
                          json_extract_string(props, '$.k'),
                          '^[ ]*[+-]?[0-9]+[ ]*$')
                     THEN json_extract_string(props, '$.k') END
                     AS BIGINT) AS item
        FROM events
        WHERE event_type IN ({_BASKET_TYPES_SQL}))
    WHERE item IS NOT NULL AND user_id IS NOT NULL
),
capped AS (
    SELECT user_id, item FROM (
        SELECT user_id, item,
            ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY item) AS rn
        FROM items)
    WHERE rn <= {BASKET_ITEM_CAP}
),
edges AS (
    SELECT a.item AS a, b.item AS b
    FROM capped a JOIN capped b
      ON a.user_id = b.user_id AND a.item < b.item
    GROUP BY 1, 2
    HAVING COUNT(*) >= {COOC_TRIANGLE_MIN_USERS}
),
tri AS (
    SELECT e1.a AS x, e1.b AS y, e2.b AS z
    FROM edges e1
    JOIN edges e2 ON e1.b = e2.a
    JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
),
corners AS (
    SELECT x AS item FROM tri
    UNION ALL SELECT y FROM tri
    UNION ALL SELECT z FROM tri
)
SELECT item, COUNT(*) AS n_triangles FROM corners GROUP BY item
"""

EXTENSION_ORACLES["item_triangles"] = ITEM_TRIANGLES

# user_value_mad: same two-stage median/MAD with portable_round at scale 6
# before every comparison and output; DuckDB's MEDIAN == quantile_cont 0.5.
from ..operators.windows import MAD_K

USER_VALUE_MAD = f"""
WITH med AS (
    SELECT user_id,
        {portable_round_sql('quantile_cont(value, 0.5)', 6)} AS med
    FROM events GROUP BY user_id
),
dev AS (
    SELECT e.user_id, m.med, ABS(e.value - m.med) AS adev
    FROM events e JOIN med m USING (user_id)
),
scored AS (
    SELECT user_id, med, adev,
        {portable_round_sql(
            'quantile_cont(adev, 0.5) OVER (PARTITION BY user_id)', 6
        )} AS mad
    FROM dev
)
SELECT user_id,
    CAST(COUNT(*) AS INT) AS n_events,
    MIN(med) AS median_value,
    MIN(mad) AS mad_value,
    CAST(COUNT(CASE WHEN adev > {MAD_K} * mad THEN 1 END) AS INT)
        AS n_outliers
FROM scored GROUP BY user_id
"""

EXTENSION_ORACLES["user_value_mad"] = USER_VALUE_MAD

# event_transition_matrix: same (ts, event_id) lag ordering, same
# long-division probability; row totals via a window over the pair frame.
EVENT_TRANSITION_MATRIX = """
WITH seq AS (
    SELECT LAG(event_type) OVER (
            PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) NULLS FIRST, event_id NULLS FIRST
        ) AS prev_type,
        event_type AS next_type
    FROM events
),
pairs AS (
    SELECT prev_type, next_type, COUNT(*) AS n_transitions
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
)
SELECT prev_type, next_type, n_transitions,
    CAST(n_transitions AS DOUBLE) /
        SUM(n_transitions) OVER (PARTITION BY prev_type) AS transition_prob
FROM pairs
"""

EXTENSION_ORACLES["event_transition_matrix"] = EVENT_TRANSITION_MATRIX

# top_session_paths: same gaps-and-islands sessionization as
# STREAM_SESSION_STATS, paths via string_agg ordered by (tsu, event_id),
# identical top-K tie-break; n_events_per_session divides the SAME
# long sum by the same count. The gap test mirrors EVENTS_SESSIONIZED's
# FLOOR(epoch(.)) form — Spark's unix_timestamp TRUNCATES to seconds, so
# the oracle must truncate too or a fractional-second gap straddling the
# 1800 s boundary would split the engines.
from ..operators.events_analytics import PATH_TOP_K as _PATH_K

TOP_SESSION_PATHS = f"""
WITH flagged AS (
    SELECT user_id, tsu, event_id, event_type,
        CASE WHEN FLOOR(epoch(tsu))
                  - FLOOR(epoch(LAG(tsu) OVER w)) > {30 * 60}
                  OR LAG(tsu) OVER w IS NULL
             THEN 1 ELSE 0 END AS new_session
    FROM {_EV}
    WINDOW w AS (PARTITION BY user_id ORDER BY tsu NULLS FIRST, event_id NULLS FIRST)
),
sessions AS (
    SELECT user_id, tsu, event_id, event_type,
        SUM(new_session) OVER (
            PARTITION BY user_id ORDER BY tsu NULLS FIRST, event_id NULLS FIRST
            ROWS UNBOUNDED PRECEDING
        ) AS session_id
    FROM flagged
),
paths AS (
    SELECT user_id, session_id,
        string_agg(event_type, '>' ORDER BY tsu NULLS FIRST, event_id NULLS FIRST) AS path,
        COUNT(*) AS n_ev
    FROM sessions GROUP BY user_id, session_id
)
SELECT path, COUNT(*) AS n_sessions,
    CAST(SUM(n_ev) AS DOUBLE) / COUNT(*) AS n_events_per_session
FROM paths GROUP BY path
ORDER BY n_sessions DESC, path ASC
LIMIT {_PATH_K}
"""

EXTENSION_ORACLES["top_session_paths"] = TOP_SESSION_PATHS

# order_to_ship_lag_stats: exact integer day lags, same single-division
# mean and portable_round-ed quantile_cont as the other percentile
# rollups; month CAST to DATE like every calendar rollup.
ORDER_TO_SHIP_LAG_STATS = f"""
WITH lags AS (
    SELECT CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE)
            AS month,
        date_diff('day', CAST(o_orderdate AS DATE),
                  CAST(l_shipdate AS DATE)) AS lag_days
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
)
SELECT month,
    CAST(COUNT(*) AS INT) AS n_lineitems,
    {portable_round_sql('CAST(SUM(lag_days) AS DOUBLE) / COUNT(*)', 6)}
        AS mean_lag_days,
    {portable_round_sql('quantile_cont(lag_days, 0.5)', 6)} AS p50_lag_days,
    {portable_round_sql('quantile_cont(lag_days, 0.9)', 6)} AS p90_lag_days
FROM lags GROUP BY month
"""

EXTENSION_ORACLES["order_to_ship_lag_stats"] = ORDER_TO_SHIP_LAG_STATS

# brand_band_revenue: the identical CASE chain rendered from Q19_BRANCHES
# (branches brand-disjoint → order-independent), same exact revenue units.
from ..operators.relational import Q19_BRANCHES

_Q19_CASE = "CASE"
for _name, _brand, _slo, _shi, _qlo, _qhi in Q19_BRANCHES:
    _Q19_CASE += (
        f" WHEN p_brand = '{_brand}' AND p_size BETWEEN {_slo} AND {_shi}"
        f" AND l_quantity BETWEEN {_qlo} AND {_qhi} THEN '{_name}'"
    )
_Q19_CASE += " END"

BRAND_BAND_REVENUE = f"""
SELECT {_Q19_CASE} AS branch,
    COUNT(*) AS n_lineitems,
    SUM({_REV_C4}) / 10000.0 AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE {_Q19_CASE} IS NOT NULL
GROUP BY branch
"""

EXTENSION_ORACLES["brand_band_revenue"] = BRAND_BAND_REVENUE

# active_users_rolling: DAU via grouped distinct; WAU via the interval
# self-join twin of the contribution explode (user active in [d-6, d]);
# inner-joined on the DAU days like the Spark side.
from ..operators.events_analytics import WAU_WINDOW_DAYS

ACTIVE_USERS_ROLLING = f"""
WITH user_days AS (
    SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
    FROM events
),
dau AS (
    SELECT day, COUNT(DISTINCT user_id) AS dau FROM user_days GROUP BY day
),
wau AS (
    SELECT d.day, COUNT(DISTINCT u.user_id) AS wau
    FROM (SELECT DISTINCT day FROM user_days) d
    JOIN user_days u
      ON u.day BETWEEN d.day - {WAU_WINDOW_DAYS - 1} AND d.day
    GROUP BY d.day
)
SELECT dau.day, dau.dau, wau.wau
FROM dau JOIN wau ON dau.day = wau.day
"""

EXTENSION_ORACLES["active_users_rolling"] = ACTIVE_USERS_ROLLING

# customer_nation_value_rank: mirrors operators/windows.py — same total
# ordering (rev_c DESC, custkey ASC), same UNBOUNDED-to-UNBOUNDED frame
# for first/last_value (the default RANGE frame would silently return the
# current row for last_value). percent_rank/cume_dist are integer-derived
# rationals, bit-identical across engines. SUM cast back to BIGINT
# (HUGEINT trap).
CUSTOMER_NATION_VALUE_RANK = """
WITH per_cust AS (
    SELECT o_custkey,
        CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
            AS rev_c
    FROM orders GROUP BY o_custkey
),
enriched AS (
    SELECT n_name AS nation, c_custkey, rev_c
    FROM per_cust
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
)
SELECT nation, c_custkey, rev_c AS revenue_cents,
    PERCENT_RANK() OVER w AS pct_rank,
    CUME_DIST() OVER w AS cume_frac,
    FIRST_VALUE(rev_c) OVER (
        w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        AS nation_top_cents,
    LAST_VALUE(rev_c) OVER (
        w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        AS nation_bottom_cents
FROM enriched
WINDOW w AS (PARTITION BY nation ORDER BY rev_c DESC, c_custkey ASC)
"""

EXTENSION_ORACLES["customer_nation_value_rank"] = CUSTOMER_NATION_VALUE_RANK


def _zorder_sql() -> str:
    """Z-order manifest oracle (operators/layout.zorder_manifest): same
    min/max census (scalar-subquery CTE instead of collected literals —
    identical integer values), same 16-bit grid normalization, the same
    Morton interleave term stream (shared _morton_sql — the bit
    expressions can never drift), and the same top-bits file split. All
    integer arithmetic; dates surface as DATE on both engines."""
    from ..operators.layout import Z_BITS, Z_EPOCH, Z_FILES_LOG2, _morton_sql

    grid = (1 << Z_BITS) - 1
    x = f"((ck - ck_min) * {grid}) // greatest(ck_max - ck_min, 1)"
    y = f"((dy - dy_min) * {grid}) // greatest(dy_max - dy_min, 1)"
    morton = _morton_sql(f"({x})", f"({y})")
    return f"""
WITH base AS (
    -- BIGINT ck mirrors the Spark side's explicit long cast: the grid
    -- product (span * 65535) overflows INTEGER for custkey ranges past
    -- ~32k (sf1), under any int32 driver re-encoding of the key.
    SELECT CAST(o_custkey AS BIGINT) AS ck,
        CAST(date_diff('day', DATE '{Z_EPOCH}',
                       CAST(o_orderdate AS DATE)) AS BIGINT) AS dy,
        CAST(o_orderdate AS DATE) AS od
    FROM orders
),
mm AS (
    SELECT MIN(ck) AS ck_min, MAX(ck) AS ck_max,
           MIN(dy) AS dy_min, MAX(dy) AS dy_max
    FROM base
),
keyed AS (
    SELECT ck, od, {morton} AS z
    FROM base, mm
)
SELECT COALESCE(CAST(z >> {2 * Z_BITS - Z_FILES_LOG2} AS INT), -1)
        AS file_id,
    COUNT(*) AS n_rows,
    COALESCE(MIN(ck), -1) AS min_custkey,
    COALESCE(MAX(ck), -1) AS max_custkey,
    COALESCE(MIN(od), DATE '{Z_EPOCH}') AS min_orderdate,
    COALESCE(MAX(od), DATE '{Z_EPOCH}') AS max_orderdate,
    COALESCE(MIN(z), -1) AS min_z, COALESCE(MAX(z), -1) AS max_z
FROM keyed
GROUP BY 1
"""


EXTENSION_ORACLES["zorder_manifest"] = _zorder_sql()


def _zorder_skip_sql() -> str:
    """zorder_skip_estimate oracle: the manifest SQL nested verbatim,
    sentinel excluded, integer extent sums, the two divisions in the
    same written order as the Column expressions."""
    return f"""
WITH mf AS ({_zorder_sql()}),
f AS (SELECT * FROM mf WHERE file_id <> -1),
s AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_files,
        CAST(SUM(max_custkey - min_custkey + 1) AS BIGINT) AS ck_ext,
        MIN(min_custkey) AS ck_lo, MAX(max_custkey) AS ck_hi,
        CAST(SUM(date_diff('day', min_orderdate, max_orderdate) + 1)
             AS BIGINT) AS dt_ext,
        MIN(min_orderdate) AS d_lo, MAX(max_orderdate) AS d_hi
    FROM f
)
SELECT 'custkey' AS dimension, n_files,
    ck_ext AS sum_extent,
    CAST(ck_hi - ck_lo + 1 AS BIGINT) AS span,
    CAST(ck_ext AS DOUBLE) / CAST(CAST(ck_hi - ck_lo + 1 AS BIGINT)
        AS DOUBLE) AS expected_files,
    CAST(ck_ext AS DOUBLE) / CAST(CAST(ck_hi - ck_lo + 1 AS BIGINT)
        AS DOUBLE) / CAST(n_files AS DOUBLE) AS expected_frac
FROM s
UNION ALL
SELECT 'orderdate', n_files,
    dt_ext,
    CAST(date_diff('day', d_lo, d_hi) + 1 AS BIGINT),
    CAST(dt_ext AS DOUBLE) / CAST(CAST(date_diff('day', d_lo, d_hi) + 1
        AS BIGINT) AS DOUBLE),
    CAST(dt_ext AS DOUBLE) / CAST(CAST(date_diff('day', d_lo, d_hi) + 1
        AS BIGINT) AS DOUBLE) / CAST(n_files AS DOUBLE)
FROM s
"""


EXTENSION_ORACLES["zorder_skip_estimate"] = _zorder_skip_sql()


# item_pagerank (operators/graph.item_pagerank): nests the
# item_cooccurrence oracle verbatim (composition precedent:
# item_triangles), symmetrizes, then unrolls PR_ITERS integer-arithmetic
# rounds (kmeans generated-SQL precedent — aggregates are not allowed in
# a recursive CTE's recursive member). Every quantity is bigint:
# (85·r) // (100·deg) per edge and the exact integer teleport, so the
# per-node SUM is combine-order-free and bit-identical to Spark.


def _pagerank_sql() -> str:
    from ..operators.graph import (
        PR_DAMP_DEN,
        PR_DAMP_NUM,
        PR_ITERS,
        PR_SCALE,
        PR_TELEPORT,
    )

    rounds = []
    for i in range(PR_ITERS):
        prev = "r0" if i == 0 else f"r{i}"
        rounds.append(f"""
c{i + 1} AS (
    SELECT e.dst AS item,
        CAST(SUM(({PR_DAMP_NUM} * r.r) // ({PR_DAMP_DEN} * d.deg))
             AS BIGINT) AS c
    FROM {prev} r
    JOIN edges e ON e.src = r.item
    JOIN deg d ON d.src = e.src
    GROUP BY e.dst
),
r{i + 1} AS (
    SELECT n.item,
        CAST({PR_TELEPORT} + COALESCE(c.c, 0) AS BIGINT) AS r
    FROM nodes n LEFT JOIN c{i + 1} c USING (item)
)""")
    return f"""
WITH co AS ({ITEM_COOCCURRENCE}),
edges AS (
    SELECT item_a AS src, item_b AS dst FROM co
    UNION ALL
    SELECT item_b AS src, item_a AS dst FROM co
),
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src),
nodes AS (SELECT src AS item, deg FROM deg),
r0 AS (SELECT item, CAST({PR_SCALE} AS BIGINT) AS r FROM nodes),
{",".join(rounds)}
SELECT n.item, n.deg AS degree, r.r AS pr_micro,
    CAST(r.r AS DOUBLE) / 1000000.0 AS pr
FROM nodes n JOIN r{PR_ITERS} r USING (item)
"""


EXTENSION_ORACLES["item_pagerank"] = _pagerank_sql()


# top_supplier_by_revenue (operators/relational.py, TPC-H Q15 shape):
# integer-cents revenue makes the =MAX tie test exact; HUGEINT SUM is
# only compared/divided, never emitted raw.
TOP_SUPPLIER_BY_REVENUE = f"""
WITH rev AS (
    SELECT l_suppkey, SUM({_REV}) AS rev_c
    FROM lineitem
    WHERE l_shipdate >= DATE '1998-01-01'
      AND l_shipdate < DATE '1998-04-01'
    GROUP BY l_suppkey
),
mx AS (SELECT MAX(rev_c) AS mx FROM rev)
SELECT s.s_suppkey, s.s_name, rev.rev_c / 10000.0 AS total_revenue
FROM rev
CROSS JOIN mx
JOIN supplier s ON s.s_suppkey = rev.l_suppkey
WHERE rev.rev_c = mx.mx
"""

EXTENSION_ORACLES["top_supplier_by_revenue"] = TOP_SUPPLIER_BY_REVENUE


# returned_item_report (operators/relational.py, TPC-H Q10 shape):
# cents-exact revenue DESC + c_custkey ASC is a total order for the
# LIMIT; acctbal re-quantizes through cents so the money-DECIMAL
# re-encode axis cannot move the value or its dtype.
RETURNED_ITEM_REPORT = f"""
SELECT c.c_custkey, c.c_name,
    SUM({_REV}) / 10000.0 AS revenue,
    CAST(ROUND(c.c_acctbal * 100, 0) AS BIGINT) / 100.0 AS acctbal,
    n.n_name
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= DATE '1998-01-01'
  AND o.o_orderdate < DATE '1998-04-01'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c.c_custkey ASC
LIMIT 20
"""

EXTENSION_ORACLES["returned_item_report"] = RETURNED_ITEM_REPORT


# referential_integrity_report (operators/profiling.py): FK-orphan audit.
# NULL FKs are reported separately, never as orphans (SQL EXISTS
# semantics, mirrored exactly); orphan_pct is one IEEE division of exact
# integer counts, portable-rounded at 1e-4 in the identical association
# (CAST(orph AS DOUBLE) * 100.0 / total).
def _fk_audit_sql(label: str, child: str, fk: str, parent: str, pk: str) -> str:
    pct = portable_round_sql("CAST(orph AS DOUBLE) * 100.0 / total", 4)
    return f"""
SELECT '{label}' AS relationship,
    CAST(total AS BIGINT) AS child_rows,
    CAST(nulls AS BIGINT) AS null_fk_rows,
    CAST(orph AS BIGINT) AS orphan_rows,
    CASE WHEN total = 0 THEN 0.0 ELSE {pct} END AS orphan_pct
FROM (
    SELECT
        (SELECT COUNT(*) FROM {child}) AS total,
        (SELECT COUNT(*) FROM {child} WHERE {fk} IS NULL) AS nulls,
        (SELECT COUNT(*) FROM {child} c WHERE c.{fk} IS NOT NULL
            AND NOT EXISTS (SELECT 1 FROM {parent} p
                            WHERE p.{pk} = c.{fk})) AS orph
)
"""


def _referential_integrity_sql() -> str:
    from ..operators.profiling import FK_RELATIONSHIPS

    return "\nUNION ALL\n".join(
        _fk_audit_sql(*spec) for spec in FK_RELATIONSHIPS
    )


REFERENTIAL_INTEGRITY_REPORT = _referential_integrity_sql()

EXTENSION_ORACLES["referential_integrity_report"] = (
    REFERENTIAL_INTEGRITY_REPORT
)


# key_uniqueness_report (operators/profiling.py): PK-multiplicity census
# per table, built from the SAME KEY_SPECS the operator iterates (no
# drift). Full-row distinctness via the row(...) constructor (arrays
# compare element-wise on both engines); every count CAST to BIGINT
# (the HUGEINT dtype trap). The per-table column lists are read from the
# parquet schema by the operator and pinned here via SELECT-star row().
def _key_uniqueness_sql() -> str:
    from ..operators.profiling import KEY_SPECS

    parts = []
    for name, keys in KEY_SPECS:
        kl = ", ".join(keys)
        notnull = " AND ".join(f"{k} IS NOT NULL" for k in keys)
        parts.append(f"""
SELECT '{name}' AS table_name,
    CAST((SELECT COUNT(*) FROM {name}) AS BIGINT) AS n_rows,
    CAST((SELECT COUNT(*) FROM {name} WHERE NOT ({notnull})) AS BIGINT)
        AS null_key_rows,
    CAST(COUNT(*) AS BIGINT) AS n_keys,
    CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_keys,
    CAST(SUM(n - 1) AS BIGINT) AS dup_rows,
    CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
        AS conflict_keys
FROM (
    SELECT {kl}, COUNT(*) AS n,
        COUNT(DISTINCT _t) AS nd
    FROM {name} _t WHERE {notnull} GROUP BY {kl}
)""")
    return "\nUNION ALL\n".join(parts)


KEY_UNIQUENESS_REPORT = _key_uniqueness_sql()
EXTENSION_ORACLES["key_uniqueness_report"] = KEY_UNIQUENESS_REPORT


# table_column_stats (operators/profiling.py): ANALYZE-style numeric
# stats census, built from the SAME TABLE_STATS_SPECS the operator
# iterates (no drift). Every value funnels through the canonical
# (CAST(col AS DOUBLE) + 0.0) domain — token-identical to the Column
# expr — so -0.0 can never split the engines; counts CAST to BIGINT
# (the HUGEINT dtype trap), min/max CAST to DOUBLE (a DuckDB DOUBLE +
# DECIMAL literal addition stays DOUBLE, the outer cast pins it).
# NULL counting uses COUNT(CASE ...) — never SUM — so a 0-row table
# reports 0, not NULL (r12 empty-table probe). The oracle reads the
# gated feeds (the registry splices the shadow-CTE / events mirrors),
# matching the operator's normalized load_table/load_events reads.
def _table_column_stats_sql() -> str:
    from ..operators.profiling import TABLE_STATS_SPECS

    parts = []
    for name, cols in TABLE_STATS_SPECS:
        for c in cols:
            d = f"(CAST({c} AS DOUBLE) + 0.0)"
            parts.append(f"""
SELECT '{name}' AS table_name, '{c}' AS column_name,
    CAST(COUNT({c}) AS BIGINT) AS n_nonnull,
    CAST(COUNT(CASE WHEN {c} IS NULL THEN 1 END) AS BIGINT) AS n_nulls,
    CAST(COUNT(DISTINCT {d}) AS BIGINT) AS n_distinct,
    CAST(MIN({d}) AS DOUBLE) AS min_value,
    CAST(MAX({d}) AS DOUBLE) AS max_value
FROM {name}""")
    return "\nUNION ALL\n".join(parts)


TABLE_COLUMN_STATS = _table_column_stats_sql()
EXTENSION_ORACLES["table_column_stats"] = TABLE_COLUMN_STATS


# join_skew_report (operators/profiling.py): join-key multiplicity
# census per declared FK relationship, built from the SAME
# FK_RELATIONSHIPS the operator iterates (no drift). The hot key is
# the SMALLEST key among those sharing the max multiplicity — the
# oracle's ORDER BY n DESC, fk LIMIT 1 is the same total order as the
# operator's min_by((-n, fk)) distributive aggregate; reported as
# DOUBLE so a NULL (empty child) stays dtype-stable. Ratios mirror the
# Column exprs token-identically (max*keys/rows association), CASE-
# guarded against empty input (ANSI x/0 vs DuckDB NULL — r12 probe).
def _join_skew_sql() -> str:
    from ..operators.profiling import FK_RELATIONSHIPS

    parts = []
    for label, child, fk, _parent, _pk in FK_RELATIONSHIPS:
        parts.append(f"""
SELECT '{label}' AS relationship,
    CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n_rows,
    CAST(COALESCE(SUM(CASE WHEN fk IS NULL THEN n END), 0) AS BIGINT)
        AS null_fk_rows,
    CAST(COUNT(CASE WHEN fk IS NOT NULL THEN 1 END) AS BIGINT) AS n_keys,
    CAST(COALESCE(MAX(CASE WHEN fk IS NOT NULL THEN n END), 0) AS BIGINT)
        AS max_key_rows,
    CAST((SELECT fk FROM (
            SELECT CAST({fk} AS BIGINT) AS fk, COUNT(*) AS n
            FROM {child} WHERE {fk} IS NOT NULL GROUP BY 1
          ) ORDER BY n DESC, fk LIMIT 1) AS DOUBLE) AS hot_key,
    CASE WHEN COUNT(CASE WHEN fk IS NOT NULL THEN 1 END) > 0 THEN
        FLOOR(CAST(COALESCE(SUM(CASE WHEN fk IS NOT NULL THEN n END), 0)
                   AS DOUBLE)
              / COUNT(CASE WHEN fk IS NOT NULL THEN 1 END)
              * 10000 + 0.5) / 10000 END AS avg_key_rows,
    CASE WHEN COALESCE(SUM(CASE WHEN fk IS NOT NULL THEN n END), 0) > 0 THEN
        FLOOR(CAST(COALESCE(MAX(CASE WHEN fk IS NOT NULL THEN n END), 0)
                   AS DOUBLE)
              * COUNT(CASE WHEN fk IS NOT NULL THEN 1 END)
              / COALESCE(SUM(CASE WHEN fk IS NOT NULL THEN n END), 0)
              * 10000 + 0.5) / 10000
        END AS skew_ratio
FROM (
    SELECT CAST({fk} AS BIGINT) AS fk, COUNT(*) AS n
    FROM {child} GROUP BY 1
)""")
    return "\nUNION ALL\n".join(parts)


JOIN_SKEW_REPORT = _join_skew_sql()
EXTENSION_ORACLES["join_skew_report"] = JOIN_SKEW_REPORT


# partition_stats_rollup (operators/profiling.py): month-partition
# stats + the MERGED total derived from the month CTE (never a second
# scan) — the oracle proves the merge algebra by construction. cents
# sums COALESCE to 0 (bare-SUM NULL class); min/max fold through the
# canonical (CAST + 0.0) double domain.
PARTITION_STATS_ROLLUP = """
WITH m AS (
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        CAST(COUNT(*) AS BIGINT) AS n_rows,
        CAST(COUNT(o_totalprice) AS BIGINT) AS n_priced,
        CAST(COALESCE(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)), 0)
             AS BIGINT) AS sum_cents,
        CAST(MIN((CAST(o_totalprice AS DOUBLE) + 0.0)) AS DOUBLE)
            AS min_value,
        CAST(MAX((CAST(o_totalprice AS DOUBLE) + 0.0)) AS DOUBLE)
            AS max_value
    FROM orders
    GROUP BY month
)
SELECT 'month' AS scope, month, n_rows, n_priced, sum_cents,
       min_value, max_value
FROM m
UNION ALL
SELECT 'total' AS scope, CAST(NULL AS DATE) AS month,
    CAST(COALESCE(SUM(n_rows), 0) AS BIGINT) AS n_rows,
    CAST(COALESCE(SUM(n_priced), 0) AS BIGINT) AS n_priced,
    CAST(COALESCE(SUM(sum_cents), 0) AS BIGINT) AS sum_cents,
    CAST(MIN(min_value) AS DOUBLE) AS min_value,
    CAST(MAX(max_value) AS DOUBLE) AS max_value
FROM m
"""

EXTENSION_ORACLES["partition_stats_rollup"] = PARTITION_STATS_ROLLUP


# schema_snapshot_report (operators/profiling.py): physical-schema
# census — the schema-drift DETECTOR. Raw-feed oracle (registry
# _RAW_FEED_ORACLES, the key_uniqueness_report convention): the Spark
# side reads load_table(raw=True), so the oracle must see the raw view
# too. The column set comes from DuckDB's information_schema over the
# SAME registered views (DISTINCT guards against a runner registering
# a table in more than one schema); names sort bytewise-identically to
# Python's sorted() for these ASCII identifiers.
def _schema_snapshot_sql() -> str:
    from ..catalog import TABLES

    parts = []
    for name in TABLES:
        cols_sub = (
            "(SELECT DISTINCT column_name FROM information_schema.columns "
            f"WHERE table_name = '{name}')"
        )
        parts.append(f"""
SELECT '{name}' AS table_name,
    CAST((SELECT COUNT(*) FROM {cols_sub}) AS BIGINT) AS n_cols,
    (SELECT string_agg(column_name, ',' ORDER BY column_name)
     FROM {cols_sub}) AS col_list,
    CAST(COUNT(*) AS BIGINT) AS n_rows
FROM {name}""")
    return "\nUNION ALL\n".join(parts)


SCHEMA_SNAPSHOT_REPORT = _schema_snapshot_sql()
EXTENSION_ORACLES["schema_snapshot_report"] = SCHEMA_SNAPSHOT_REPORT


# salted_brand_revenue (operators/skew.py): the oracle is the PLAIN
# join+group — the driver hash proves the salted/two-phase plan moves
# work, never rows or cents. Revenue in exact 1e-4 integer units.
SALTED_BRAND_REVENUE = """
SELECT p_brand AS brand,
    CAST(COUNT(*) AS BIGINT) AS n_lines,
    SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000, 0)
        AS BIGINT)) / 10000.0 AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""

EXTENSION_ORACLES["salted_brand_revenue"] = SALTED_BRAND_REVENUE


# ship_priority_counts (operators/relational.ship_priority_counts):
# TPC-H Q12 shape. NULL o_orderpriority lands in NEITHER bucket (IN /
# NOT IN both yield NULL → ELSE 0), exactly as the Column exprs; counts
# CAST to BIGINT so DuckDB's HUGEINT SUM cannot widen the dtype.
SHIP_PRIORITY_COUNTS = """
SELECT l_returnflag AS returnflag,
    CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
    CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= DATE '1998-01-01'
  AND l_shipdate < DATE '1999-01-01'
GROUP BY l_returnflag
"""

EXTENSION_ORACLES["ship_priority_counts"] = SHIP_PRIORITY_COUNTS
