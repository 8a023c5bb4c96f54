"""DuckDB oracles for the temporal joins (operators/temporal.py).

The as-of oracle uses DuckDB's NATIVE ASOF JOIN — a genuinely independent
implementation of the semantics the Spark side expresses with the
union-tag window trick. The range oracle is the naive inequality join the
bucketed Spark plan must reproduce exactly."""

from ..operators.temporal import RANGE_WINDOW_US

_EV = "(SELECT *, CAST(ts AS TIMESTAMP) AS tsu FROM events)"

PURCHASE_LAST_VIEW_ASOF = f"""
WITH e AS (SELECT * FROM {_EV}),
p AS (SELECT event_id, user_id, tsu, value FROM e
      WHERE event_type = 'purchase'),
v AS (SELECT user_id, tsu, value FROM e WHERE event_type = 'view')
SELECT p.event_id, p.user_id, p.tsu AS ts, p.value,
       v.tsu AS view_ts, v.value AS view_value
FROM p ASOF LEFT JOIN v
  ON p.user_id = v.user_id AND v.tsu <= p.tsu
"""

ERROR_BURSTS_RANGE = f"""
WITH e AS (SELECT * FROM {_EV}),
err AS (SELECT user_id, event_id, epoch_us(tsu) AS us FROM e
        WHERE event_type = 'error')
SELECT a.user_id, a.event_id AS event_a, b.event_id AS event_b,
       b.us - a.us AS gap_us
FROM err a JOIN err b
  ON a.user_id = b.user_id
 AND b.us > a.us
 AND b.us - a.us <= {RANGE_WINDOW_US}
"""

TEMPORAL_ORACLES = {
    "purchase_last_view_asof": PURCHASE_LAST_VIEW_ASOF,
    "error_bursts_range": ERROR_BURSTS_RANGE,
}

# events_gapfill_locf: mirrors operators/temporal.py:events_gapfill_locf —
# same hour truncation under the UTC session tz, same exact-cents rollup
# (SUM(BIGINT) divides straight to DOUBLE so the HUGEINT widening never
# reaches pandas), scaffold via generate_series over each user's own span,
# LOCF via IGNORE NULLS last_value with an identical rows frame.
EVENTS_GAPFILL_LOCF = f"""
WITH e AS (SELECT * FROM {_EV}),
hourly AS (
    SELECT user_id, date_trunc('hour', tsu) AS bucket_ts,
        CAST(COUNT(*) AS INT) AS n_events,
        SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) / 100.0 AS bucket_value
    FROM e GROUP BY 1, 2
),
spans AS (
    SELECT user_id, MIN(bucket_ts) AS lo, MAX(bucket_ts) AS hi
    FROM hourly GROUP BY 1
),
scaffold AS (
    SELECT user_id, g AS bucket_ts
    FROM spans, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS t(g)
)
SELECT s.user_id, s.bucket_ts,
    COALESCE(h.n_events, 0) AS n_events,
    last_value(h.bucket_value IGNORE NULLS) OVER (
        PARTITION BY s.user_id ORDER BY s.bucket_ts
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_locf,
    h.n_events IS NULL AS is_gap
FROM scaffold s LEFT JOIN hourly h USING (user_id, bucket_ts)
"""

TEMPORAL_ORACLES["events_gapfill_locf"] = EVENTS_GAPFILL_LOCF

# events_ohlc: independent formulation — open/close via two ROW_NUMBER
# windows over the same deterministic (ts, event_id) order the Spark side
# feeds min_by/max_by. Every output value is an observed double (no
# arithmetic), so equality is exact.
EVENTS_OHLC = f"""
WITH e AS (
    SELECT user_id, date_trunc('hour', tsu) AS bucket_ts, value,
        ROW_NUMBER() OVER (
            PARTITION BY user_id, date_trunc('hour', tsu)
            ORDER BY tsu NULLS FIRST, event_id NULLS FIRST) AS rn_a,
        ROW_NUMBER() OVER (
            PARTITION BY user_id, date_trunc('hour', tsu)
            ORDER BY tsu DESC NULLS LAST, event_id DESC) AS rn_d
    FROM {_EV}
)
SELECT user_id, bucket_ts,
    MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
    MAX(value) AS high,
    MIN(value) AS low,
    MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
    CAST(COUNT(*) AS INT) AS n_events
FROM e GROUP BY user_id, bucket_ts
"""

TEMPORAL_ORACLES["events_ohlc"] = EVENTS_OHLC

# purchases_pit_stage: interval-containment lookup against the SCD2
# history CTE (the SQL twin of oracles/extensions.SCD2_USER_EVENT_HISTORY,
# inlined here over the same _EV base) — half-open [valid_from, valid_to)
# episodes partition each user's timeline, so the join is exactly-one.
PURCHASES_PIT_STAGE = f"""
WITH pts AS (
    SELECT user_id, event_type, tsu, event_id,
        CASE WHEN LAG(event_type) OVER w IS NULL
                  OR LAG(event_type) OVER w <> event_type
             THEN 1 ELSE 0 END AS is_change
    FROM {_EV}
    WINDOW w AS (PARTITION BY user_id ORDER BY tsu NULLS FIRST, event_id NULLS FIRST)
),
hist AS (
    SELECT user_id, event_type,
        CAST(ROW_NUMBER() OVER w2 AS INT) AS version,
        tsu AS valid_from,
        LEAD(tsu) OVER w2 AS valid_to
    FROM pts
    WHERE is_change = 1
    WINDOW w2 AS (PARTITION BY user_id ORDER BY tsu NULLS FIRST, event_id NULLS FIRST)
)
SELECT p.event_id, p.user_id, p.tsu AS ts, p.value,
    h.event_type AS stage_type,
    h.version AS stage_version,
    h.valid_from AS stage_since
FROM (SELECT event_id, user_id, tsu, value FROM {_EV}
      WHERE event_type = 'purchase') p
JOIN hist h
  ON p.user_id = h.user_id
 AND p.tsu >= h.valid_from
 AND (h.valid_to IS NULL OR p.tsu < h.valid_to)
"""

TEMPORAL_ORACLES["purchases_pit_stage"] = PURCHASES_PIT_STAGE
