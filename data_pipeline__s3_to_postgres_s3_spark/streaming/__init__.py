from .docs import stream_heavy_hitters, stream_minhash_dedup, stream_quality_gate
from .events import (
    stream_dedup_events,
    stream_distinct_users,
    stream_funnel_stage,
    stream_ohlc,
    stream_hourly_rollup,
    stream_rolling_zscore,
    stream_session_stats,
    stream_static_enrich,
    stream_sliding_value,
    stream_user_running_max,
    stream_view_purchase_join,
)

__all__ = [
    "stream_dedup_events",
    "stream_distinct_users",
    "stream_minhash_dedup",
    "stream_quality_gate",
    "stream_funnel_stage",
    "stream_ohlc",
    "stream_hourly_rollup",
    "stream_rolling_zscore",
    "stream_session_stats",
    "stream_static_enrich",
    "stream_sliding_value",
    "stream_user_running_max",
    "stream_view_purchase_join",
]
