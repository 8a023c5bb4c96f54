"""Catalog: raw testdata tables + reference-shaped mapped views.

The driver testdata (/root/testdata/sf*/) is a TPC-H-ish star schema. The
reference pipeline's tables (orders / shipment_deliveries / reviews /
dim_dates / dim_products / tripdata — see /root/repo/FIXTURES.md) are derived
from it with DETERMINISTIC, SQL-expressible mappings so every Spark query has
an exactly-equivalent DuckDB oracle. The same mapping expressions live as SQL
in ``oracles/mappings.py`` — keep the two in lockstep.

Reference shapes being reproduced:
- orders / shipment_deliveries / reviews DDL:
  /root/reference/erd_table_creations.sql:1-26
- implied dims dim_dates / dim_products:
  /root/reference/sql/transformation.sql:40-44,90-93,100-108
- tripdata: /root/reference/airflow/dags/tripdata_monthly_metrics.py:63-77

Scale note: every mapped view is a narrow projection over a parquet scan —
column pruning and predicate pushdown reach the scan (verified via
``plans.explain``). dim_dates is generated on the driver-side as a ~3k-row
frame and is always broadcast; dim_products is a broadcast candidate at any
realistic cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import DEFAULT_CONFIG, EngineConfig

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _ensure_utc(spark: SparkSession) -> None:
    """Timestamp→date casts and epoch math must be timezone-stable even when
    the caller (e.g. the grading driver) built its own SparkSession."""
    if spark.conf.get("spark.sql.session.timeZone") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")


# Relational measure representability bound (r13 extreme-money probe):
# the universal integer-money discipline (cents() = CAST(ROUND(v·100)
# AS BIGINT)) aborts under ANSI on NaN/±Inf/1e300 on BOTH engines —
# 27 of 55 relational oracles red on a corrupted-measure feed. Same
# contract as events.value: non-representable measures go NULL at the
# load chokepoint, the ROW survives, and the r9 NULL-measures regime
# (already mirrored in every oracle) takes over. Oracle twin: the
# registry-level shadow-CTE prelude (registry._measure_shadow_ctes).
MEASURE_ABS_MAX = 1000000000000.0
MEASURE_COLS: dict[str, tuple[str, ...]] = {
    "lineitem": ("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
    "orders": ("o_totalprice",),
    "part": ("p_retailprice",),
    "customer": ("c_acctbal",),
    "supplier": ("s_acctbal",),
}


# Per-(file, mtime) dirtiness memo: gating wraps columns in CASE, which
# costs parquet predicate pushdown on exactly the columns users filter
# (a measure-range scan predicate stops reaching PushedFilters). A
# healthy corpus — the overwhelmingly common case — must not pay that,
# so the gate engages ONLY when the feed actually contains a
# non-representable value (the similarity `_dup_vec_ids` convention:
# zero plan impact on clean data). The probe is one column-pruned
# LIMIT-1 scan per (table, file version) per process; the oracle
# mirrors are unconditional CASE views whose identity on clean data
# keeps the two sides equal either way.
_DIRTY_MEMO: dict[tuple, bool] = {}


def _memo_key(sf_dir: str, name: str, kind: str) -> tuple:
    # ns-resolution mtime + size (r13 ADVICE): int-seconds mtime let a
    # corpus regenerated in place within the same second keep a stale
    # "clean" verdict for the process lifetime — the Spark gate stays
    # off while the oracle mirrors are unconditional, a silent hash-red.
    import os

    p = os.path.abspath(os.path.join(sf_dir, f"{name}.parquet"))
    try:
        st = os.stat(p)
        mt, size = st.st_mtime_ns, st.st_size
    except OSError:
        mt, size = -1, -1
    return (p, mt, size, kind)


def _measures_dirty(spark: SparkSession, sf_dir: str, name: str) -> bool:
    key = _memo_key(sf_dir, name, "measures")
    if key not in _DIRTY_MEMO:
        df = _normalize_decimals(
            spark.read.parquet(f"{sf_dir}/{name}.parquet")
        )
        # Partial-schema fixtures (narrow projections of the table) are
        # legal inputs: gate only the measure columns actually present.
        cols = [c for c in MEASURE_COLS[name] if c in df.columns]
        if not cols:
            _DIRTY_MEMO[key] = False
            return False
        df = df.select(*cols)
        bad = None
        for col in cols:
            cd = F.col(col).cast("double")
            b = F.isnan(cd) | (F.abs(cd) > MEASURE_ABS_MAX)
            bad = b if bad is None else (bad | b)
        _DIRTY_MEMO[key] = df.where(bad).limit(1).count() > 0
    return _DIRTY_MEMO[key]


def load_table(
    spark: SparkSession, sf_dir: str, name: str, raw: bool = False
) -> DataFrame:
    """``raw=True`` skips the measure representability gate — reserved
    for the corruption DETECTORS (key_uniqueness_report's census must
    see the raw feed; its oracle is exempt from the mirrors too)."""
    _ensure_utc(spark)
    df = _normalize_decimals(spark.read.parquet(f"{sf_dir}/{name}.parquet"))
    if not raw and name in MEASURE_COLS and _measures_dirty(
        spark, sf_dir, name
    ):
        for col in MEASURE_COLS[name]:
            if col not in df.columns:
                continue
            cd = F.col(col).cast("double")
            keep = ~F.isnan(cd) & (F.abs(cd) <= MEASURE_ABS_MAX)
            df = df.withColumn(col, F.when(keep, F.col(col)))
    return df


def scan_spread(
    spark: SparkSession,
    df: DataFrame,
    sf_dir: str,
    name: str,
    min_bytes: int = 0,
) -> DataFrame:
    """Round-robin repartition a SMALL single-split scan to the core
    grant — the guide-§2.5 'unsplittable input' remedy, applied only
    where the downstream map work is CPU-heavy (interpreted
    higher-order-function array kernels, wide unpivots): the sf corpora
    are single-row-group parquet files, so a scan is ONE task at any
    core count and map-heavy operators serialize on it (measured r15:
    char_ngram_diversity 3.8 s and the table_column_stats pre-aggregate
    6-8 s in one task at local[32]).

    Scale-adaptive gate, not a local[32] tune: the repartition fires only
    when the file is smaller than one 128 MB input split (i.e. the scan
    CANNOT parallelize) AND the session has more than one core. At
    production scale the file set exceeds the split size, the gate is
    false, and the plan is untouched. Round-robin repartition is
    deterministic under retries (sortBeforeRepartition, SPARK-23207) and
    row-set-preserving, so any aggregation/per-row operator above it is
    unaffected. ``min_bytes`` lets a caller skip feeds too small to be
    worth one-task-per-core scheduling (the census spreads only >=1 MB
    tables); CPU-dense per-row kernels (char-trigram RLE) pass 0."""
    import os

    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        if os.path.isdir(path):
            bytes_ = sum(
                os.path.getsize(os.path.join(r, f))
                for r, _d, fs in os.walk(path)
                for f in fs
            )
        else:
            bytes_ = os.path.getsize(path)
    except OSError:
        return df
    cores = spark.sparkContext.defaultParallelism
    if cores > 1 and min_bytes <= bytes_ < 128 * 1024 * 1024:
        return df.repartition(cores)
    return df


def _normalize_decimals(df: DataFrame) -> DataFrame:
    """Cast any DECIMAL column to DOUBLE at load (a no-op on today's
    all-double testdata).

    Same hazard class as ``normalize_event_ts``: the driver regenerates
    testdata between rounds and may change physical encodings, and the
    TPC-H-spec layout for the money columns (l_extendedprice, l_discount,
    o_totalprice, …) is DECIMAL(12,2), not double. Without this cast a
    re-encode would flow DecimalType through every price expression —
    Spark decimal arithmetic widens precision differently from DuckDB,
    and toPandas materializes decimals as object(Decimal) where DuckDB's
    .df() gives float64, so the driver's value hash would split even on
    equal values. Normalizing at the single load chokepoint keeps every
    consumer double-typed under any numeric layout; the cents-based
    oracles stay exact because a DECIMAL(_,2)'s value scaled by 100 is an
    integer both engines recover identically (pinned driver-faithfully in
    tests/test_money_encoding.py)."""
    from pyspark.sql.types import DecimalType

    for f in df.schema.fields:
        if isinstance(f.dataType, DecimalType):
            df = df.withColumn(f.name, F.col(f.name).cast("double"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


# events.ts representability window (r13 extreme-timestamp probe).
# Half-open [MIN, MAX): pre-epoch values serve no analytics here and
# far-future ones explode span-derived grids (gapfill) and ANSI month
# arithmetic; both are corruption in a clickstream feed. Mirrored in
# every oracle via the registry-level rewrite (_EVENTS_FEED_NORM).
EVENT_TS_MIN = "1970-01-01 00:00:00"
EVENT_TS_MAX = "2100-01-01 00:00:00"


def _events_dirty(spark: SparkSession, sf_dir: str) -> bool:
    """One LIMIT-1 probe per (events file set, mtimes) per process: does
    the feed contain a non-representable ts or value? Gating wraps ts
    and value in CASE, which costs scan-level predicate pushdown on
    exactly the event-time/value filters — a clean feed (the common
    case) must not pay that. Reads through the same events* glob the
    file-stream source uses so batch and streaming agree on the
    verdict."""
    import glob as _glob
    import os

    files = sorted(
        _glob.glob(os.path.join(sf_dir, "events*.parquet"))
    )

    def _fstat(f: str) -> tuple:
        try:
            st = os.stat(f)
            return (f, st.st_mtime_ns, st.st_size)
        except OSError:
            return (f, -1, -1)

    key = (tuple(_fstat(f) for f in files), "events-tsvalue")
    if not files:
        return False
    if key not in _DIRTY_MEMO:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        if len(files) == 1:
            # events.parquet may be a single FILE or a Spark-written
            # DIRECTORY — a direct path read handles both, where
            # pathGlobFilter matches only leaf file names and would see
            # nothing inside the directory.
            raw = spark.read.parquet(files[0])
        else:
            raw = spark.read.option(
                "pathGlobFilter", "events*.parquet"
            ).parquet(sf_dir)
        raw = _normalize_decimals(raw)
        checks = []
        if "value" in raw.columns:
            cd = F.col("value").cast("double")
            checks.append(F.isnan(cd) | (F.abs(cd) > EVENT_VALUE_ABS_MAX))
        if "ts" in raw.columns:
            t = F.col("ts")
            raw = normalize_event_ts(raw, gate=False)
            checks.append(
                t.isNotNull()
                & (
                    (t < F.lit(EVENT_TS_MIN).cast("timestamp"))
                    | (t >= F.lit(EVENT_TS_MAX).cast("timestamp"))
                )
            )
        if not checks:
            _DIRTY_MEMO[key] = False
            return False
        bad = checks[0]
        for b in checks[1:]:
            bad = bad | b
        _DIRTY_MEMO[key] = raw.where(bad).limit(1).count() > 0
    return _DIRTY_MEMO[key]


def normalize_event_ts(
    ev: DataFrame, col: str = "ts", gate: bool = True
) -> DataFrame:
    """Normalize an event-timestamp column to TIMESTAMP (LTZ) regardless of
    the encoding the producer wrote — external data arrives in whatever
    layout the source chose (cf. the reference's S7 ingestion contract,
    tripdata_monthly_metrics.py:54-87):

    - ``bigint``: parquet TIMESTAMP(NANOS) read under the nanosAsLong legacy
      conf. Truncated to micros with integer DIV (int64 nanos exceed the
      double mantissa; matches DuckDB's TIMESTAMP_NS → TIMESTAMP cast).
    - ``timestamp_ntz``: parquet timestamp[us] with isAdjustedToUTC=false.
      Cast to TIMESTAMP — wall-clock-preserving under the UTC session tz
      pinned by ``_ensure_utc``, so results are oracle-identical.
    - ``timestamp``: already LTZ; passthrough.

    Every events consumer (batch AND streaming) goes through this one
    helper so a driver-side re-encode of the testdata can never split the
    engine into per-query behaviors again.
    """
    dt = dict(ev.dtypes)[col]
    if dt == "bigint":
        ev = ev.withColumn(col, F.expr(f"timestamp_micros({col} DIV 1000)"))
    elif dt == "timestamp_ntz":
        ev = ev.withColumn(col, F.col(col).cast("timestamp"))
    # Representability window (r13 extreme-timestamp probe): pre-epoch
    # and far-future timestamps are feed corruption, not events — a
    # single year-9999 ts OOM-killed the probe JVM outright (the
    # min-to-max gapfill grid spans 8000 years of hours) and year-9999
    # month arithmetic overflows DATE under ANSI. Out-of-window ts goes
    # NULL and the ROW survives, landing in the ALREADY-PINNED NULL-ts
    # regime (stream readers drop; batch windows pin NULLS FIRST — the
    # r6 events NULL matrix). Mirrored once at the registry level
    # (_EVENTS_FEED_NORM), the normalize_event_value pattern.
    # ``gate=False`` = encoding normalization only: the _events_dirty
    # probe itself, and clean feeds (where skipping the CASE wrap keeps
    # event-time predicates in PushedFilters).
    if gate:
        c = F.col(col)
        ev = ev.withColumn(
            col,
            F.when(
                (c >= F.lit(EVENT_TS_MIN).cast("timestamp"))
                & (c < F.lit(EVENT_TS_MAX).cast("timestamp")),
                c,
            ),
        )
    return ev


# events.value representability bound: the universal integer-money
# discipline (cents() = CAST(ROUND(v·100) AS BIGINT)) tops out near
# int64/100 ≈ 9.2e16 — values beyond 1e12 are feed corruption, not
# revenue, and overflow the cast on BOTH engines.
EVENT_VALUE_ABS_MAX = 1000000000000.0


def normalize_event_value(
    ev: DataFrame, col: str = "value", gate: bool = True
) -> DataFrame:
    """Non-REPRESENTABLE event values go NULL; the ROW survives (r12
    extreme-value probe — 17/34 events queries red on a NaN/Inf/1e300
    feed): NaN and ±Inf abort every ANSI cents() cast (and their rank
    position is engine-arbitrary), and |v| > EVENT_VALUE_ABS_MAX
    overflows the int64 cents grid on BOTH engines. NULLing instead of
    dropping keeps the event in sessions/funnels/counts, and the NULL
    then flows through the r6 NULL-value discipline already mirrored in
    every oracle. The oracle twin is the registry-level `FROM events`
    rewrite (registry._EVENTS_FEED_NORM); a verified no-op on sane
    corpora."""
    if not gate:
        return ev
    cd = F.col(col).cast("double")
    keep = ~F.isnan(cd) & (F.abs(cd) <= EVENT_VALUE_ABS_MAX)
    return ev.withColumn(col, F.when(keep, F.col(col)))


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with a proper TIMESTAMP ``ts`` (see ``normalize_event_ts``
    for the encodings accepted) and ``ts``/``value`` gated to the
    representable ranges — the gates engage only when the feed actually
    carries a non-representable value (``_events_dirty``), so clean
    plans keep scan-level ts/value pushdown."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    g = _events_dirty(spark, sf_dir)
    return normalize_event_value(
        normalize_event_ts(load_table(spark, sf_dir, "events"), gate=g),
        gate=g,
    )


# ---------------------------------------------------------------------------
# Reference-shaped mapped views (FIXTURES.md §C)
# ---------------------------------------------------------------------------


def ref_orders(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """orders(order_id, customer_id, order_date, product_id, unit_price,
    quantity, total_price) — cf. erd_table_creations.sql:8-17."""
    o = load_table(spark, sf_dir, "orders")
    unit_price = (F.col("o_orderkey") % 300 + 100).alias("unit_price")
    quantity = (F.col("o_orderkey") % 10 + 1).alias("quantity")
    return o.select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_custkey").alias("customer_id"),
        F.to_date("o_orderdate").alias("order_date"),
        (F.col("o_orderkey") % cfg.product_mod).alias("product_id"),
        unit_price,
        quantity,
        ((F.col("o_orderkey") % 300 + 100) * (F.col("o_orderkey") % 10 + 1)).alias(
            "total_price"
        ),
    )


def ref_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """shipment_deliveries(shipment_id, order_id, shipment_date,
    delivery_date) — cf. erd_table_creations.sql:20-26. Null-model mirrors the
    reference data's high null rates (FIXTURES.md: ~68%/~78% null) via
    deterministic key arithmetic: a third of shipments have no shipment_date;
    delivered rows are the even-partkey subset of shipped rows."""
    li = load_table(spark, sf_dir, "lineitem")
    ship = F.when(F.col("l_partkey") % 3 != 0, F.to_date("l_shipdate"))
    deliver = F.when(
        (F.col("l_partkey") % 3 != 0) & (F.col("l_partkey") % 2 == 0),
        F.date_add(F.to_date("l_shipdate"), (F.col("l_suppkey") % 4 + 1).cast("int")),
    )
    return li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("shipment_id"),
        F.col("l_orderkey").alias("order_id"),
        ship.alias("shipment_date"),
        deliver.alias("delivery_date"),
    )


def ref_reviews(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """reviews(review 1..5, product_id) — duplicates allowed (append-only
    load, SURVEY.md Q7)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        (F.col("l_partkey") % 5 + 1).alias("review"),
        (F.col("l_partkey") % cfg.product_mod).alias("product_id"),
    )


def dim_products(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dim_products(product_id, product_name) — implied warehouse dim
    (transformation.sql:100-108); mapped onto part."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        F.col("p_partkey").alias("product_id"),
        F.col("p_name").alias("product_name"),
    )


def dim_dates(spark: SparkSession, cfg: EngineConfig = DEFAULT_CONFIG) -> DataFrame:
    """dim_dates(calendar_dt, year_num, month_of_the_year_num,
    day_of_the_week_num ISO 1=Mon..7=Sun, working_day 'true'/'false' TEXT) —
    implied warehouse dim (transformation.sql:40-44,90-93; FIXTURES.md §B).

    working_day is 'false' on weekends and on fixed-date holidays (Jan 1,
    May 1, Jul 4, Dec 25, Dec 26) so the reference's "public holiday" quirk
    (weekday AND working_day='false', SURVEY.md Q1) selects non-empty rows.
    Generated with sequence+explode — a few thousand rows, always broadcast.
    """
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(cfg.calendar_start),
                F.lit(cfg.calendar_end),
            )
        ).alias("calendar_dt")
    )
    m = F.month("calendar_dt")
    d = F.dayofmonth("calendar_dt")
    iso_dow = F.weekday("calendar_dt") + 1  # weekday(): 0=Mon..6=Sun
    holiday = (
        ((m == 1) & (d == 1))
        | ((m == 5) & (d == 1))
        | ((m == 7) & (d == 4))
        | ((m == 12) & (d == 25))
        | ((m == 12) & (d == 26))
    )
    return days.select(
        F.col("calendar_dt"),
        F.year("calendar_dt").alias("year_num"),
        m.alias("month_of_the_year_num"),
        iso_dow.alias("day_of_the_week_num"),
        F.when((iso_dow >= 6) | holiday, F.lit("false"))
        .otherwise(F.lit("true"))
        .alias("working_day"),
    )


def tripdata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tripdata(pickup_date, pickup_datetime, dropoff_datetime, fare_amount)
    — the NYC-taxi-shaped table the reference queries on ClickHouse
    (tripdata_monthly_metrics.py:63-77), mapped onto events. event timestamps
    cover one month; spreading by ``event_id % 36`` months yields 36 monthly
    groups like the reference's 2014-01..2016-12 golden output."""
    ev = load_events(spark, sf_dir)
    pickup = F.expr("timestampadd(MONTH, CAST(event_id % 36 AS INT), ts)")
    return ev.select(
        pickup.alias("pickup_datetime"),
        F.to_date(pickup).alias("pickup_date"),
        F.expr(
            "timestampadd(MINUTE, CAST(event_id % 60 + 1 AS INT),"
            " timestampadd(MONTH, CAST(event_id % 36 AS INT), ts))"
        ).alias("dropoff_datetime"),
        F.col("value").cast("double").alias("fare_amount"),
    )
