"""DuckDB oracles for the Structured Streaming queries (streaming/events.py).

Valid because complete-mode window aggregations over a finite stream equal
their batch twins, streaming dedup emits exactly the distinct set, and the
stateful running-max sink reduces to the batch max/count (monotone state).
Same micros truncation + cents formulas as oracles/extensions.py.
"""

# ts IS NOT NULL mirrors the stream reader's event-time chokepoint
# (read_events_stream drops NULL-ts rows — they cannot carry event-time
# semantics and abort Python stateful ops; r6 null-robustness matrix).
_EV = "(SELECT *, CAST(ts AS TIMESTAMP) AS tsu FROM events WHERE ts IS NOT NULL)"

STREAM_HOURLY_ROLLUP = f"""
SELECT CAST(date_trunc('hour', tsu) AS TIMESTAMP) AS hour_start, event_type,
    COUNT(*) AS n_events,
    SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) / 100.0 AS total_value
FROM {_EV}
GROUP BY hour_start, event_type
"""

# Sliding 1h window, 30m slide: an event at t belongs to the windows starting
# at time_bucket_30m(t) and time_bucket_30m(t) - 30m.
STREAM_SLIDING_VALUE = f"""
WITH contrib AS (
    SELECT time_bucket(INTERVAL 30 MINUTE, tsu) AS window_start, value
    FROM {_EV}
    UNION ALL
    SELECT time_bucket(INTERVAL 30 MINUTE, tsu) - INTERVAL 30 MINUTE, value
    FROM {_EV}
)
SELECT CAST(window_start AS TIMESTAMP) AS window_start,
    COUNT(*) AS n_events,
    SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) / 100.0 AS total_value
FROM contrib
GROUP BY window_start
"""

# Gaps-and-islands sessionization, 30-minute gap — one row per session,
# keyed by its first event time (== Spark's session_window.start).
STREAM_SESSION_STATS = f"""
WITH flagged AS (
    SELECT user_id, tsu, value,
        CASE WHEN epoch(tsu) - epoch(LAG(tsu) OVER w) >= {30 * 60}
                  OR LAG(tsu) OVER w IS NULL
             THEN 1 ELSE 0 END AS new_session
    FROM {_EV}
    WINDOW w AS (PARTITION BY user_id ORDER BY tsu NULLS FIRST)
),
sessions AS (
    SELECT user_id, tsu, value,
        SUM(new_session) OVER (
            PARTITION BY user_id ORDER BY tsu NULLS FIRST ROWS UNBOUNDED PRECEDING
        ) AS session_id
    FROM flagged
)
SELECT user_id,
    MIN(tsu) AS session_start,
    COUNT(*) AS n_events,
    SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) / 100.0 AS total_value
FROM sessions
GROUP BY user_id, session_id
"""

STREAM_DEDUP_EVENTS = """
SELECT DISTINCT ON (event_id) event_id, user_id, event_type, value
FROM events WHERE ts IS NOT NULL
ORDER BY event_id, ts ASC NULLS FIRST, user_id ASC NULLS FIRST,
    event_type ASC NULLS FIRST, value ASC NULLS FIRST
"""

STREAM_USER_RUNNING_MAX = """
SELECT user_id, MAX(value) AS max_value, COUNT(*) AS n_events
FROM events WHERE ts IS NOT NULL
GROUP BY user_id
"""


# Stream-stream interval join: finite-input append-mode inner join equals
# the batch interval join. Same micros truncation as the stream source.
# The view side mirrors the admitted-view cap EXACTLY, including its JOIN
# SHAPE (streaming/events.py _admitted_views: first 8 views per
# (user, 30-min tumbling bucket) by (view_ts, view_id) — deterministic;
# NULLS FIRST pins Spark's ASC default so NULL event_ids occupy the same
# rank slots). The Spark side applies the cap as a LEFT SEMI equi-join on
# view_id, which (a) drops NULL-event_id views (NULL never equi-joins)
# and (b) admits EVERY row sharing an admitted id; the `event_id IN
# (SELECT ...)` qualification below reproduces both — a plain join
# against the capped CTE would keep NULL-id rows the semi-join drops
# (r11 ADVICE). A no-op on the sf corpora (max 2 views/bucket); binds
# identically on both engines when a hot key exceeds the cap.
STREAM_VIEW_PURCHASE_JOIN = f"""
WITH admitted AS (
    SELECT event_id FROM (
        SELECT event_id,
            ROW_NUMBER() OVER (
                PARTITION BY user_id, epoch_us(tsu) // 1800000000
                ORDER BY tsu NULLS FIRST, event_id NULLS FIRST) AS _vrn
        FROM {_EV}
        WHERE event_type = 'view'
    ) WHERE _vrn <= 8
)
SELECT p.user_id,
    p.event_id AS purchase_id,
    p.tsu AS purchase_ts,
    p.value AS purchase_value,
    v.event_id AS view_id,
    v.tsu AS view_ts
FROM {_EV} p
JOIN {_EV} v
  ON v.user_id = p.user_id
 AND v.tsu >= p.tsu - INTERVAL 30 MINUTE
 AND v.tsu <= p.tsu
WHERE p.event_type = 'purchase'
  AND v.event_type = 'view'
  AND v.event_id IN (SELECT event_id FROM admitted)
"""

# Stream-static join + complete-mode rollup == the batch join + rollup.
STREAM_STATIC_ENRICH = """
WITH tiers AS (
    -- tier computed BEFORE the join (as the Spark dim does): an unmatched
    -- user must surface as NULL tier, never fall into the ELSE bucket.
    SELECT c_custkey AS user_id,
        CASE WHEN c_acctbal < 0 THEN 'delinquent'
             WHEN c_acctbal < 5000 THEN 'standard'
             ELSE 'premium' END AS tier
    FROM customer
)
SELECT tier, event_type,
    COUNT(*) AS n_events,
    SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) / 100.0 AS total_value
FROM events e LEFT JOIN tiers t USING (user_id)
WHERE e.ts IS NOT NULL
GROUP BY tier, event_type
"""

# Streaming rolling z-score: append-mode per-event emission over a finite
# stream == the batch rolling z-score (same formula, same integer-exact
# moments) — reuse its oracle verbatim.
from .extensions import EVENTS_ROLLING_ZSCORE as _BATCH_ROLLING_ZSCORE

# The stream's event-time + value + identity chokepoints (NULL ts can't
# be watermarked, NULL value can't enter the ring buffer, NULL event_id
# has no position in the per-key (ts, id) high-watermark total order —
# r12 NULL-event_id probe: int(NaN) aborted the stateful op) applied to
# the batch formulation — the single FROM events is rewritten to the
# filtered row set so stream and oracle agree on inputs.
_STREAM_ROLLING_ZSCORE = _BATCH_ROLLING_ZSCORE.replace(
    "FROM events",
    "FROM (SELECT * FROM events"
    " WHERE ts IS NOT NULL AND value IS NOT NULL"
    " AND event_id IS NOT NULL) events",
)
assert _STREAM_ROLLING_ZSCORE != _BATCH_ROLLING_ZSCORE

# Streaming first-touch funnel stage: the keyed state is four MINs, so
# the recovered final stage equals the batch computation over ALL events
# regardless of micro-batch arrival order (NULL chain semantics spelled
# out as explicit CASE arms — stage k requires t_k strictly after
# t_{k-1}, matching operators/events_analytics.funnel_conversion).
STREAM_FUNNEL_STAGE = f"""
WITH firsts AS (
    SELECT user_id,
        MIN(CASE WHEN event_type = 'signup' THEN tsu END) AS t_signup,
        MIN(CASE WHEN event_type = 'view' THEN tsu END) AS t_view,
        MIN(CASE WHEN event_type = 'click' THEN tsu END) AS t_click,
        MIN(CASE WHEN event_type = 'purchase' THEN tsu END) AS t_purchase
    FROM {_EV}
    GROUP BY user_id
)
SELECT user_id,
    CASE WHEN t_signup IS NULL THEN 0
         WHEN t_view IS NULL OR t_view <= t_signup THEN 1
         WHEN t_click IS NULL OR t_click <= t_view THEN 2
         WHEN t_purchase IS NULL OR t_purchase <= t_click THEN 3
         ELSE 4 END AS funnel_stage
FROM firsts
"""

STREAMING_ORACLES = {

    "stream_rolling_zscore": _STREAM_ROLLING_ZSCORE,
    "stream_funnel_stage": STREAM_FUNNEL_STAGE,
    "stream_hourly_rollup": STREAM_HOURLY_ROLLUP,
    "stream_static_enrich": STREAM_STATIC_ENRICH,
    "stream_sliding_value": STREAM_SLIDING_VALUE,
    "stream_session_stats": STREAM_SESSION_STATS,
    "stream_dedup_events": STREAM_DEDUP_EVENTS,
    "stream_user_running_max": STREAM_USER_RUNNING_MAX,
    "stream_view_purchase_join": STREAM_VIEW_PURCHASE_JOIN,
}

# stream_distinct_users: the dedup→agg chain's final complete-mode sink
# == the batch per-hour COUNT(DISTINCT); NULL users dropped on both
# sides (no-anonymous-identity chokepoint, the NULL-ts pattern).
STREAM_DISTINCT_USERS = f"""
SELECT CAST(date_trunc('hour', tsu) AS TIMESTAMP) AS window_start,
    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM {_EV}
WHERE user_id IS NOT NULL
GROUP BY window_start
"""
STREAMING_ORACLES["stream_distinct_users"] = STREAM_DISTINCT_USERS

# stream_ohlc: complete-mode windowed min_by/max_by over a finite stream ==
# the batch candles; independent double-ROW_NUMBER formulation as in
# oracles/temporal.py, column order matching the streaming select.
STREAM_OHLC = f"""
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
SELECT CAST(bucket_ts AS TIMESTAMP) AS bucket_ts, user_id,
    MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
    MAX(value) AS high,
    MIN(value) AS low,
    MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
    CAST(COUNT(*) AS INT) AS n_events
FROM e GROUP BY bucket_ts, user_id
"""

STREAMING_ORACLES["stream_ohlc"] = STREAM_OHLC

# stream_minhash_dedup: the streaming pair set is arrival-order-insensitive
# (every co-bucket pair emitted exactly once, estimate from full
# signatures), so the oracle is the batch formulation — the SAME shingle /
# signature / banding CTEs as the dedup family (imported fragments keep
# the definitions in lockstep), candidates deduped across bands, estimate
# = matching permutations / PERMS, filtered at the stream's threshold.
from ..operators.dedup import (
    MINHASH_BAND_ROWS as _SMD_BAND_ROWS,
    MINHASH_PERMS as _SMD_PERMS,
    MINHASH_PRIME as _SMD_PRIME,
)
from .llmops import _A_LIST, _B_LIST, _HEX7_TO_INT, _SHINGLES

def _stream_minhash_dedup_sql(est_min: float) -> str:
    return f"""
WITH {_SHINGLES},
hashed AS (
    SELECT doc_id, {_HEX7_TO_INT} AS h
    FROM (SELECT doc_id, md5(shingle) AS m FROM sh)
),
mh AS (
    SELECT doc_id, p,
        MIN((({_A_LIST})[p + 1] * h + ({_B_LIST})[p + 1])
            % {_SMD_PRIME}) AS minhash
    FROM hashed, unnest(generate_series(0, {_SMD_PERMS - 1})) AS t(p)
    GROUP BY doc_id, p
),
bands AS (
    SELECT doc_id, p // {_SMD_BAND_ROWS} AS band,
        md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY p)) AS band_key
    FROM mh GROUP BY doc_id, band
),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a
    JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
                AND a.doc_id < b.doc_id
),
est AS (
    SELECT c.doc_a, c.doc_b,
        COUNT(CASE WHEN ma.minhash = mb.minhash THEN 1 END) AS n_match
    FROM cand c
    JOIN mh ma ON ma.doc_id = c.doc_a
    JOIN mh mb ON mb.doc_id = c.doc_b AND mb.p = ma.p
    GROUP BY c.doc_a, c.doc_b
)
SELECT doc_a, doc_b,
    CAST(n_match AS DOUBLE) / {_SMD_PERMS} AS est_sim
FROM est
WHERE CAST(n_match AS DOUBLE) / {_SMD_PERMS} >= {est_min}
"""

from ..streaming.docs import STREAM_MINHASH_EST_MIN as _SMD_EST_MIN

STREAMING_ORACLES["stream_minhash_dedup"] = _stream_minhash_dedup_sql(
    _SMD_EST_MIN
)


# stream_quality_gate: the stateless ingest-gate projection — the row-
# local half of the batch quality gate (shared _ROW_GATE_CTES prefix, so
# streaming and batch verdicts can never drift); the sink's row set is
# arrival-order-insensitive because the projection is per-row.
def _stream_quality_gate_sql() -> str:
    from .curation import _ROW_GATE_CTES
    from ..operators.curation import QG_MAX_DUP_BIGRAM, QG_MAX_STOPWORD

    return f"""
WITH {_ROW_GATE_CTES}
SELECT doc_id, content_hash,
    predicted_lang <> 'und' AS lang_ok,
    dup_bigram_ratio <= {QG_MAX_DUP_BIGRAM} AS rep_ok,
    stopword_ratio <= {QG_MAX_STOPWORD} AS stop_ok
FROM p
"""


STREAMING_ORACLES["stream_quality_gate"] = _stream_quality_gate_sql()
