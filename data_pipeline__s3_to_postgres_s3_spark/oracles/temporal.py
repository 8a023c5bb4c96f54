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
