"""Window-function surface: lag/lead gaps, sessionization, running totals,
tumbling-window rollups over the events table.

The reference's only window is one ROW_NUMBER (SURVEY.md §2.5); the engine
exposes the full pyspark.sql.Window surface. Sessionization is the classic
two-window composition: lag() to detect gaps, then a running SUM of
new-session flags to assign session ids — one shuffle on user_id, both
windows share the same partitioning.

Scale: windows partition by user_id — high-cardinality, well-distributed
key, so the sort within each partition is local and bounded. The tumbling
rollup is a plain groupBy on a derived time bucket (the batch twin of the
Structured Streaming window in streaming/events.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_events, load_table
from ..config import DEFAULT_CONFIG, EngineConfig
from ..functions.numeric import cents, portable_round

SESSION_GAP_MINUTES = 30


def events_sessionized(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Per-user session stats with a 30-minute inactivity gap."""
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_sec = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    with_flag = ev.withColumn(
        "new_session",
        F.when(
            gap_sec.isNull() | (gap_sec > SESSION_GAP_MINUTES * 60), 1
        ).otherwise(0),
    )
    with_session = with_flag.withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        with_session.groupBy("user_id")
        .agg(
            F.max("session_id").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(cents(F.col("value"))) / 100.0).alias("total_value"),
        )
    )


def events_running_totals(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Running per-user cumulative value (frame-spec window, exact cents)."""
    ev = load_events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        (F.sum(cents(F.col("value"))).over(w) / 100.0).alias("running_value"),
    )


def event_type_hourly(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Tumbling 1-hour rollup by event type (batch twin of the streaming
    windowed aggregation)."""
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("hour_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(cents(F.col("value"))) / 100.0).alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def monthly_revenue_growth(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Month-over-month revenue: lag() for the previous month's total,
    growth percentage, and a trailing 3-month moving average — the
    lag/lead + frame-spec window surface over a calendar series.

    Scale note: the window is UNPARTITIONED by design — it runs on the
    POST-AGGREGATE frame (one row per month, dozens of rows at any data
    scale), so the single-partition sort is a constant-size driver of the
    plan, not a bottleneck. The heavy input (orders) is reduced by the
    groupBy's map-side partial aggregation first; revenue accumulates as
    integer cents so the doubles that reach the window are exact."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month")
    ).agg(F.sum(cents(F.col("o_totalprice"))).alias("rev_c"))
    w = Window.orderBy("month")
    frame3 = w.rowsBetween(-2, Window.currentRow)
    prev = F.lag("rev_c").over(w)
    return monthly.select(
        "month",
        (F.col("rev_c") / 100.0).alias("revenue"),
        (prev / 100.0).alias("prev_revenue"),
        portable_round(
            (F.col("rev_c") - prev) * 100.0 / prev, 4
        ).alias("growth_pct"),
        portable_round(
            F.sum("rev_c").over(frame3) / F.count(F.lit(1)).over(frame3) / 100.0,
            2,
        ).alias("trailing_3mo_avg"),
    )


N_DECILES = 10


def customer_revenue_deciles(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Per-nation customer revenue deciles via ntile(): each nation's
    customers ranked by lifetime revenue and cut into 10 equal buckets,
    then per-bucket accounting (count, revenue range).

    Scale posture: ntile is PARTITIONED by nation — the global-ntile
    alternative is a single-partition sort of every customer and is
    exactly what this query avoids. Revenue pre-aggregates per customer
    before the window (|customers| rows, not |orders|), and the final
    per-bucket rollup reuses the window's nation partitioning. Ties break
    (revenue DESC, custkey ASC) so bucket assignment is deterministic."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(cents(F.col("o_totalprice"))).alias("rev_c")
    )
    enriched = per_cust.join(
        customer.select("c_custkey", "c_nationkey"),
        per_cust["o_custkey"] == F.col("c_custkey"),
    ).join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    )
    w = Window.partitionBy("n_name").orderBy(
        F.desc("rev_c"), F.asc("c_custkey")
    )
    return (
        enriched.withColumn("decile", F.ntile(N_DECILES).over(w))
        .groupBy("n_name", "decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            (F.max("rev_c") / 100.0).alias("max_revenue"),
            (F.min("rev_c") / 100.0).alias("min_revenue"),
            (F.sum("rev_c") / 100.0).alias("total_revenue"),
        )
    )


SLIDE_WINDOW_SEC = 3600
SLIDE_STEP_SEC = 900


def events_sliding_value(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Batch twin of the streaming sliding-window aggregate: 1-hour windows
    every 15 minutes per event type (each event lands in exactly
    window/slide = 4 windows).

    Uses F.window(ts, '1 hour', '15 minutes') — Spark expands the slide
    assignment map-side (a 4-way explode of (window, value)), then ONE
    shuffle on (window, event_type). Window starts align to the epoch in
    both engines, so the oracle reconstructs the same 4 starts with
    integer floor arithmetic."""
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(cents(F.col("value"))) / 100.0).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def scd2_user_event_history(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Slowly-changing-dimension type 2 from a change log: each user's
    event_type history as versioned validity intervals — (user_id,
    event_type, version, valid_from, valid_to, is_current).

    The warehouse pattern the reference's full-refresh dims sidestep
    (SURVEY.md §2.1 S9): instead of overwriting a dimension, keep one row
    per attribute VALUE EPISODE. Built from the raw log with two windows
    over the same (user_id → ts, event_id) partitioning — detect change
    points with lag(), then lead() the next change's start into valid_to
    (NULL = still current). ONE shuffle on user_id; both windows and the
    change filter share it, and user_id is high-cardinality so the
    per-partition sorts stay bounded at 100 TB."""
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changed = (
        F.lag("event_type").over(w).isNull()
        | (F.lag("event_type").over(w) != F.col("event_type"))
    )
    points = ev.withColumn("is_change", changed).where("is_change")
    wc = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return points.select(
        "user_id",
        "event_type",
        F.row_number().over(wc).alias("version"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(wc).alias("valid_to"),
        F.lead("ts").over(wc).isNull().alias("is_current"),
    )


ROLLING_WINDOW_ROWS = 20  # rolling frame: current row + 19 preceding
ROLLING_MIN_N = 5  # below this the z-score is statistically meaningless


def events_rolling_zscore(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Per-user rolling z-score of event value over the trailing
    ROLLING_WINDOW_ROWS events — the online anomaly-scoring pass a
    monitoring pipeline runs (|z| spikes = outliers vs the user's own
    recent behavior).

    Cross-engine exactness: engines disagree on STDDEV internals (Welford
    vs naive accumulation), so no stddev function is used. The frame's
    moments are INTEGER-EXACT — n, Σc, Σc² over integer cents — and mean/
    variance/z are then derived in one double-precision formula written
    token-identically in the oracle (IEEE ops on identical integer inputs
    ⇒ identical doubles; sqrt is correctly rounded). The var>0 guard
    compares n·Σc² > (Σc)² in exact integer arithmetic — no epsilon.

    Scale shape: one shuffle on user_id; the frame is ROWS-bounded so
    state per row is O(1) and the window never buffers a whole partition."""
    ev = load_events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(ROLLING_WINDOW_ROWS - 1), 0)
    )
    c = cents(F.col("value"))
    n = F.count(F.lit(1)).over(w)
    s1 = F.sum(c).over(w)
    s2 = F.sum(c * c).over(w)
    stats = ev.select(
        "user_id",
        "event_id",
        c.alias("c"),
        n.alias("n"),
        s1.alias("s1"),
        s2.alias("s2"),
    ).where(
        (F.col("n") >= ROLLING_MIN_N)
        & (F.col("s2") * F.col("n") > F.col("s1") * F.col("s1"))
    )
    cd = F.col("c").cast("double")
    nd = F.col("n").cast("double")
    s1d = F.col("s1").cast("double")
    s2d = F.col("s2").cast("double")
    var = (s2d - s1d * s1d / nd) / (nd - 1)
    z = (cd - s1d / nd) / F.sqrt(var)
    return stats.select(
        "user_id", "event_id", portable_round(z, 6).alias("zscore")
    )


def events_ohlc(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Hourly OHLC candles per user — the open/high/low/close rollup every
    timeseries store ships (ClickHouse argMin/argMax, kdb first/last; the
    reference's tripdata query aggregates the same feed shape with plain
    AVGs, tripdata_monthly_metrics.py:62-77).

    open/close are min_by/max_by over the deterministic event order
    (ts, event_id) — event_id is unique, so first/last are well-defined
    under ties on ts; high/low/first/last are all passthroughs of observed
    values (NO new float arithmetic), so cross-engine equality is exact by
    construction.

    Scale shape: ONE shuffle — a single groupBy(user, hour) with map-side
    partial aggregation; min_by/max_by combine associatively, so the
    partials are as cheap as MIN/MAX. The oracle reproduces open/close
    with an independent formulation (two ROW_NUMBER windows) to keep the
    implementations honest."""
    ev = load_events(spark, sf_dir)
    order_key = F.struct(F.col("ts"), F.col("event_id"))
    return ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("bucket_ts")
    ).agg(
        F.min_by("value", order_key).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", order_key).alias("close"),
        F.count(F.lit(1)).cast("int").alias("n_events"),
    )


N_RFM_TILES = 4


def customer_rfm_segments(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """RFM segmentation — the classic CRM scoring the reference's
    analytics schema stops short of: per customer compute Recency (last
    order date), Frequency (order count), Monetary (lifetime spend), cut
    each into quartiles WITHIN the customer's market (nation), and roll
    up segment sizes. Output: (n_name, r_score, f_score, m_score,
    n_customers, total_monetary) with 4 = best on every axis.

    Scale posture mirrors customer_revenue_deciles: per-customer
    aggregation first (|customers| rows, not |orders|), quartiles
    PARTITIONED by nation so no single-partition global sort exists, all
    three ntile windows share one (n_name) partitioning → ONE window
    exchange, and the final rollup reuses it. Monetary accumulates as
    exact integer cents; the only double is the final /100 division.
    Ties break by custkey on every axis, so tile assignment is
    deterministic."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    per_cust = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(cents(F.col("o_totalprice"))).alias("spend_c"),
    )
    enriched = per_cust.join(
        customer.select("c_custkey", "c_nationkey"),
        per_cust["o_custkey"] == F.col("c_custkey"),
    ).join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    )
    part = Window.partitionBy("n_name")
    r = F.ntile(N_RFM_TILES).over(part.orderBy("last_order", "c_custkey"))
    f = F.ntile(N_RFM_TILES).over(part.orderBy("n_orders", "c_custkey"))
    m = F.ntile(N_RFM_TILES).over(part.orderBy("spend_c", "c_custkey"))
    scored = enriched.select(
        "n_name",
        "spend_c",
        r.alias("r_score"),
        f.alias("f_score"),
        m.alias("m_score"),
    )
    return scored.groupBy("n_name", "r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_customers"),
        (F.sum("spend_c") / 100.0).alias("total_monetary"),
    )


MAD_K = 3


def user_value_mad(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Robust per-user value profile: median and MAD (median absolute
    deviation) — the outlier-resistant complement to the rolling z-score
    (whose mean/stddev a single spiked value drags): (user_id, n_events,
    median_value, mad_value, n_outliers) where an outlier deviates from
    the median by more than MAD_K x MAD (the standard robust cutoff).

    Float discipline: medians interpolate at half-points of 2-decimal
    doubles at worst; every derived double is portable_round-ed at scale
    6 on both sides (corpus_stats precedent) BEFORE it feeds the outlier
    comparison, so an interpolation ulp cannot flip a verdict on either
    engine.

    Scale shape: one groupBy(user_id) for medians, a keyed join back, a
    per-user window for the MAD (same user_id partitioning as the join
    output — no extra exchange class), and a final groupBy on the same
    key. Exact per-group medians sort within the user partition;
    percentile_approx swaps in at production scale (same surface)."""
    ev = load_events(spark, sf_dir)
    med = ev.groupBy("user_id").agg(
        portable_round(F.percentile("value", F.lit(0.5)), 6).alias("med")
    )
    dev = ev.join(med, "user_id").select(
        "user_id",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    w = Window.partitionBy("user_id")
    scored = dev.withColumn(
        "mad", portable_round(F.percentile("adev", F.lit(0.5)).over(w), 6)
    )
    return scored.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_events"),
        F.min("med").alias("median_value"),
        F.min("mad").alias("mad_value"),
        F.count(F.when(F.col("adev") > MAD_K * F.col("mad"), 1))
        .cast("int")
        .alias("n_outliers"),
    )


def customer_nation_value_rank(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Per-customer position within their nation's revenue distribution:
    percent_rank (relative rank), cume_dist (fraction at-or-above in the
    ordering), and the nation's top/bottom revenue via
    first_value/last_value over the full-partition frame — the analytic
    window quartet no other query exercises (SURVEY §2.5 completeness).

    Determinism: the window ordering (rev_c DESC, custkey ASC) is total,
    so percent_rank/cume_dist are exact (rank-1)/(n-1) and rank/n
    rational values — integer-derived doubles, bit-identical in the
    oracle. last_value uses the UNBOUNDED-to-UNBOUNDED frame (the
    default RANGE frame would return the current row's value — the
    classic last_value trap, pinned here on purpose).

    Scale posture: revenue pre-aggregates per customer before the window
    (|customers| rows, not |orders|); the window partitions by nation —
    never a global sort."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(cents(F.col("o_totalprice"))).alias("rev_c")
    )
    enriched = per_cust.join(
        customer.select("c_custkey", "c_nationkey"),
        per_cust["o_custkey"] == F.col("c_custkey"),
    ).join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    )
    w = Window.partitionBy("n_name").orderBy(
        F.desc("rev_c"), F.asc("c_custkey")
    )
    w_full = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return enriched.select(
        F.col("n_name").alias("nation"),
        "c_custkey",
        F.col("rev_c").alias("revenue_cents"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume_frac"),
        F.first_value(F.col("rev_c")).over(w_full).alias("nation_top_cents"),
        F.last_value(F.col("rev_c")).over(w_full).alias(
            "nation_bottom_cents"
        ),
    )
