"""Catalog queries for time-window aggregation (events table).

Batch-mode ``F.window`` / ``F.session_window`` (streaming/windows.py) —
the same operators the streaming jobs use — checked against DuckDB via
epoch arithmetic. Window-start timestamps are rebuilt as
``TIMESTAMP '1970-01-01' + to_seconds(...)`` on the oracle side to stay
tz-naive (DuckDB's to_timestamp returns TIMESTAMPTZ, which would
stringify differently); Spark windows are epoch-aligned in the pinned
UTC session, so the values agree exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rentals_data_pipeline_spark.functions.rounding import round_half_up as RND
from rentals_data_pipeline_spark.plans.catalog import query
from rentals_data_pipeline_spark.sources.tables import load_table
from rentals_data_pipeline_spark.streaming import windows as TW

_EPOCH = "TIMESTAMP '1970-01-01 00:00:00'"


@query(
    "ts_tumbling_hourly",
    f"""
SELECT
    date_trunc('hour', ts) AS window_start,
    date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
    event_type,
    COUNT(*) AS n_events,
    FLOOR((SUM(value)) * 10000.0 + 0.5) / 10000.0 AS total_value
FROM events
GROUP BY 1, 2, 3
""",
)
def ts_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling counts/sums per event_type (epoch-aligned)."""
    events = load_table(spark, sf_dir, "events")
    out = events.transform(
        TW.tumbling(
            "ts",
            "1 hour",
            ["event_type"],
            [
                F.count(F.lit(1)).alias("n_events"),
                RND(F.sum("value"), 4).alias("total_value"),
            ],
        )
    )
    return out


@query(
    "ts_sliding_10m_5m",
    f"""
WITH expanded AS (
    SELECT
        {_EPOCH} + to_seconds(
            CAST(FLOOR(epoch(ts) / 300) * 300 - k.k * 300 AS BIGINT)
        ) AS window_start,
        event_type,
        value
    FROM events, (SELECT unnest([0, 1]) AS k) k
)
SELECT
    window_start,
    window_start + INTERVAL 10 MINUTE AS window_end,
    event_type,
    COUNT(*) AS n_events,
    FLOOR((SUM(value)) * 10000.0 + 0.5) / 10000.0 AS total_value
FROM expanded
GROUP BY 1, 2, 3
""",
)
def ts_sliding_10m_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute windows sliding every 5 — each event feeds exactly two
    windows (duplication factor duration/slide = 2, carried through the
    shuffle; keep the ratio small at scale)."""
    events = load_table(spark, sf_dir, "events")
    return events.transform(
        TW.sliding(
            "ts",
            "10 minutes",
            "5 minutes",
            ["event_type"],
            [
                F.count(F.lit(1)).alias("n_events"),
                RND(F.sum("value"), 4).alias("total_value"),
            ],
        )
    )


@query(
    "ts_session_windows",
    """
WITH marked AS (
    SELECT
        user_id,
        ts,
        value,
        CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                  <= INTERVAL 30 MINUTE
             THEN 0 ELSE 1 END AS new_session
    FROM events
),
numbered AS (
    SELECT *,
        SUM(new_session) OVER (
            PARTITION BY user_id ORDER BY ts
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS session_id
    FROM marked
)
SELECT
    user_id,
    MIN(ts) AS session_start,
    MAX(ts) + INTERVAL 30 MINUTE AS session_end,
    COUNT(*) AS n_events,
    FLOOR((SUM(value)) * 10000.0 + 0.5) / 10000.0 AS total_value
FROM numbered
GROUP BY user_id, session_id
""",
)
def ts_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows (30-minute inactivity gap). Spark's
    session_window end is last-event + gap; the oracle's gaps-and-
    islands construction mirrors that exactly."""
    events = load_table(spark, sf_dir, "events")
    return events.transform(
        TW.session(
            "ts",
            "30 minutes",
            ["user_id"],
            [
                F.count(F.lit(1)).alias("n_events"),
                RND(F.sum("value"), 4).alias("total_value"),
            ],
        )
    )


@query(
    "ts_hierarchical_rollup_daily",
    """
SELECT
    CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
    event_type,
    COUNT(*) AS n_events,
    FLOOR((SUM(value)) * 10000.0 + 0.5) / 10000.0 AS total_value,
    FLOOR((FLOOR((SUM(value)) * 10000.0 + 0.5) / 10000.0 / COUNT(*))
          * 10000.0 + 0.5) / 10000.0 AS avg_value
FROM events
GROUP BY 1, 2
""",
)
def ts_hierarchical_rollup_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style hierarchical rollup: daily aggregates computed
    FROM the hourly rollup's partial aggregates (counts and sums
    re-aggregate losslessly; avg is derived at the final level, never
    averaged across partials). At 100 TB this is the continuous-
    aggregate pattern — the hourly table is materialized once and every
    coarser granularity reads 24 rows/day instead of the raw events;
    the oracle aggregates the raw table directly, certifying the
    two-level rollup is exact."""
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("sv"),
    )
    # avg is derived from the ROUNDED total: sums of 2-decimal inputs
    # never land on a 1e-4 rounding midpoint, so the rounded total is
    # bit-identical across engines regardless of summation grouping,
    # and rounded_total/n stays bit-identical — whereas rounding the
    # raw quotient hits exact .5 midpoints (2-decimal sums / n) where
    # the two engines' last-bit differences flip the result.
    return (
        hourly.groupBy(F.date_trunc("day", "hour").alias("day"), "event_type")
        .agg(F.sum("n").alias("n_events"), RND(F.sum("sv"), 4).alias("total_value"))
        .withColumn("avg_value", RND(F.col("total_value") / F.col("n_events"), 4))
    )


@query("sketch_distinct_users_rollup")  # rows-only: DataSketches HLL
# register values have no ANSI oracle; mergeability + accuracy are
# pinned by tests/test_sketch_ops.py
def sketch_distinct_users_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per day estimated from PERSISTABLE per-day HLL
    sketches, plus the whole-corpus rollup estimated by unioning those
    same sketches (one 'total' row, day = NULL) — never re-scanning the
    events. The continuous-aggregate pattern for COUNT(DISTINCT):
    exact distincts don't re-aggregate across grains, sketches do
    (register-max union == sketch of the union, exactly)."""
    from rentals_data_pipeline_spark.operators import sketches as SK

    events = load_table(spark, sf_dir, "events")
    daily = SK.distinct_sketches(
        events.withColumn("day", F.date_trunc("day", "ts")), ["day"], "user_id"
    )
    per_day = SK.rollup_estimates(daily, ["day"])
    total = SK.rollup_estimates(daily, []).withColumn(
        "day", F.lit(None).cast("timestamp")
    )
    return per_day.unionByName(total).select("day", "n_distinct_est")


@query(
    "sketch_distinct_users_rollup_exact",
    """
WITH pairs AS (
    SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
    FROM events
)
SELECT CAST(day AS VARCHAR) AS day_key,
       CAST(COUNT(*) AS BIGINT) AS n_distinct
FROM pairs GROUP BY day
UNION ALL
SELECT 'total' AS day_key,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct
FROM pairs
""",
)
def sketch_distinct_users_rollup_exact(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXACT twin of ``sketch_distinct_users_rollup`` (round 9 — the
    r8 graduation pattern applied to the next rows-only candidate):
    exact distinct users per day plus the exact whole-corpus rollup
    ('total' row). One (day, user) dedup shuffle feeds BOTH grains —
    per-day counts are a map-side-combinable count over the deduped
    pairs, and the global distinct dedups user_id over the already
    per-day-deduped pairs (|pairs| << |events| at 100 TB), never
    re-scanning the fact table twice. The day key is emitted as a
    string so the total row carries 'total' instead of a NULL date
    (the NULL-sentinel hash trap). The HLL query remains the
    zero-rescan path over PERSISTED sketches; this is the ground
    truth it approximates (accuracy pinned in
    tests/test_sketch_ops.py)."""
    events = load_table(spark, sf_dir, "events")
    pairs = events.select(
        F.date_trunc("day", "ts").cast("date").alias("day"), "user_id"
    ).distinct()
    per_day = pairs.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct")
    ).select(F.col("day").cast("string").alias("day_key"), "n_distinct")
    total = (
        pairs.select("user_id")
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("n_distinct"))
        .select(F.lit("total").alias("day_key"), "n_distinct")
    )
    return per_day.unionByName(total)


@query(
    "sketch_sliding_distinct_users_exact",
    """
WITH pairs AS (
    SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
    FROM events
),
days AS (SELECT DISTINCT day FROM pairs),
fan AS (
    SELECT CAST(unnest(generate_series(
               day, day + INTERVAL 6 DAY, INTERVAL 1 DAY)) AS DATE) AS day,
           user_id
    FROM pairs
),
win AS (
    SELECT DISTINCT f.day, f.user_id
    FROM fan f JOIN days d ON f.day = d.day
)
SELECT day, CAST(COUNT(*) AS BIGINT) AS n_distinct_7d
FROM win GROUP BY day
""",
)
def sketch_sliding_distinct_users_exact(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXACT twin of ``sketch_sliding_distinct_users``: trailing-7-day
    distinct users per active day, exact. The naive form (one fact
    scan per window position, or a non-equi range join that plans as
    a nested loop) is replaced by the contribution-fanout shape: dedup
    (day, user) once, EXPLODE each pair to the <= 7 window-end days it
    contributes to (an equi-joinable column — no BNLJ), semi-join to
    the observed days (tiny, broadcast), dedup (window_day, user),
    count. Shuffle volume is bounded by 7 x |pairs|, independent of
    fact-row count beyond the first dedup — the 100 TB shape for
    exact rolling COUNT(DISTINCT). The HLL sliding query stays the
    zero-rescan dashboard path; since round 10 it uses this SAME
    trailing-7-calendar-day window definition (the old rows-based
    frame covered the 7 most recent PRESENT days, diverging on gap
    days), so this twin certifies exactly what it estimates."""
    events = load_table(spark, sf_dir, "events")
    pairs = events.select(
        F.date_trunc("day", "ts").cast("date").alias("day"), "user_id"
    ).distinct()
    days = pairs.select("day").distinct()
    fan = pairs.select(
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("day"),
        "user_id",
    )
    win = (
        fan.join(F.broadcast(days), "day", "left_semi")
        .select("day", "user_id")
        .distinct()
    )
    return win.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct_7d")
    )


@query(
    "sketch_histogram_quantiles",
    """
WITH b AS (
    SELECT
        CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
        CAST(LEAST(63, GREATEST(0, FLOOR(o_totalprice / 8000.0))) AS INT) AS bin
    FROM orders
    WHERE o_totalprice IS NOT NULL
),
daily AS (SELECT month, day, bin, COUNT(*) AS cnt FROM b GROUP BY 1, 2, 3),
monthly AS (SELECT month, bin, SUM(cnt) AS cnt FROM daily GROUP BY 1, 2),
cum AS (
    SELECT month, bin, cnt,
        SUM(cnt) OVER (PARTITION BY month ORDER BY bin) AS c,
        SUM(cnt) OVER (PARTITION BY month) AS t
    FROM monthly
)
SELECT
    month,
    CAST(MAX(t) AS BIGINT) AS n_orders,
    0.0 + 8000.0 * (MIN(CASE WHEN c >= 0.5 * t THEN bin END) + 1) AS p50_est,
    0.0 + 8000.0 * (MIN(CASE WHEN c >= 0.9 * t THEN bin END) + 1) AS p90_est,
    0.0 + 8000.0 * (MIN(CASE WHEN c >= 0.99 * t THEN bin END) + 1) AS p99_est
FROM cum
GROUP BY month
""",
)
def sketch_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketches: per-DAY fixed-width histograms of
    order totals (64 × 8000-wide bins — exact integer counting, built
    once with map-side combine), merged to MONTH by summing bins, then
    p50/p90/p99 estimated from the merged bins (upper bin edge —
    within one bin width of truth). The continuous-aggregate pattern
    for percentiles at 100 TB: any coarser grain re-aggregates the
    persisted bins instead of re-sorting raw data. Every stage is
    deterministic integer/IEEE arithmetic, so unlike KLL/t-digest the
    full sketch→merge→quantile pipeline is hash-certified against the
    oracle."""
    from rentals_data_pipeline_spark.operators import sketches as SK

    orders = load_table(spark, sf_dir, "orders")
    keyed = orders.select(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
        F.date_trunc("day", "o_orderdate").cast("date").alias("day"),
        "o_totalprice",
    )
    daily = SK.histogram_sketch(
        keyed, ["month", "day"], "o_totalprice", lo=0.0, hi=512000.0, nbins=64
    )
    monthly = SK.merge_histograms(daily, ["month"])
    return SK.histogram_quantiles(
        monthly,
        ["month"],
        {"p50_est": 0.5, "p90_est": 0.9, "p99_est": 0.99},
        lo=0.0,
        hi=512000.0,
        nbins=64,
        total_col="n_orders",
    )


@query(
    "ts_gap_fill_hourly",
    """
WITH bounds AS (
    SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
    FROM events
),
h AS (
    SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM bounds
),
t AS (SELECT DISTINCT event_type FROM events),
agg AS (
    SELECT date_trunc('hour', ts) AS hour, event_type,
           COUNT(*) AS n,
           FLOOR((SUM(value)) * 10000.0 + 0.5) / 10000.0 AS tv
    FROM events GROUP BY 1, 2
),
spine AS (SELECT h.hour, t.event_type FROM h CROSS JOIN t)
SELECT
    CAST(spine.hour AS TIMESTAMP) AS hour,
    spine.event_type,
    CAST(COALESCE(agg.n, 0) AS BIGINT) AS n_events,
    last_value(agg.tv IGNORE NULLS) OVER (
        PARTITION BY spine.event_type ORDER BY spine.hour
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried_value
FROM spine LEFT JOIN agg
    ON spine.hour = agg.hour AND spine.event_type = agg.event_type
""",
)
def ts_gap_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap filling — the hypertable feature plain GROUP BY can't give:
    a DENSE hourly spine per event_type (sequence-exploded from the
    global bounds × the broadcast type dimension), hours with no
    events zero-filled for counts and forward-filled (last non-null,
    the locf idiom) for the running value. Spine generation is one
    1-row aggregate + explode; the join is spine-sized, not
    events-sized."""
    events = load_table(spark, sf_dir, "events")
    # r13 single-scan shape: bounds and the type dimension DERIVE from
    # the hourly aggregate instead of re-scanning the fact (runtime
    # input_records measured 3x the events table before). The agg is
    # the tiny |hours x types| frame; checkpointing it lets its three
    # consumers (bounds, types, the spine join's probe side) read it
    # in place. Identical results: min/max over agg hours equal
    # min/max over row hours (date_trunc is monotone, nulls ignored by
    # both), the type set is preserved verbatim (a type whose rows all
    # have null ts still yields a (null, type) agg row), and null
    # hours never matched the spine join in either shape.
    agg = (
        events.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            RND(F.sum("value"), 4).alias("tv"),
        )
        .localCheckpoint(eager=True)
    )
    bounds = agg.agg(
        F.min("hour").alias("lo"), F.max("hour").alias("hi")
    )
    hours = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour")
    )
    types = agg.select("event_type").distinct()
    spine = hours.crossJoin(F.broadcast(types))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(agg, ["hour", "event_type"], "left")
        .select(
            "hour",
            "event_type",
            F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
            F.last("tv", ignorenulls=True).over(w).alias("carried_value"),
        )
    )


@query(
    "sketch_heavy_hitters_event_types",
    """
SELECT CAST(event_type AS VARCHAR) AS item,
       COUNT(*) AS n_occurrences
FROM events
GROUP BY 1
HAVING COUNT(*) > (SELECT COUNT(*) FROM events) / 5.0
""",
)
def sketch_heavy_hitters_event_types(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact phi=1/5 heavy hitters over event types via the two-pass
    Misra-Gries sketch (operators/sketches.py::heavy_hitters): pass 1
    keeps only 4 counters per partition — fewer than the column's 5
    distinct values, so the sketch's eviction path genuinely runs —
    and pass 2 exact-counts the surviving candidates. The oracle is
    the brute-force GROUP BY ... HAVING the sketch provably equals
    (per-partition candidate union is a superset of global heavy
    hitters); the events distribution hovers around the 20%% threshold
    so the HAVING is selective, not vacuous."""
    from rentals_data_pipeline_spark.operators.sketches import heavy_hitters

    events = load_table(spark, sf_dir, "events")
    return heavy_hitters(events, "event_type", k=5)


@query(
    "ts_session_windows_dynamic_gap",
    """
WITH g AS (
    SELECT user_id, ts, value,
           ts + INTERVAL 1 MINUTE *
               (CASE WHEN event_type = 'click' THEN 45 ELSE 15 END)
               AS ext_end
    FROM events
),
marked AS (
    SELECT user_id, ts, value, ext_end,
        CASE WHEN ts < MAX(ext_end) OVER (
                 PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             THEN 0 ELSE 1 END AS new_session
    FROM g
),
numbered AS (
    SELECT *,
        SUM(new_session) OVER (
            PARTITION BY user_id ORDER BY ts
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS session_id
    FROM marked
)
SELECT
    user_id,
    MIN(ts) AS session_start,
    MAX(ext_end) AS session_end,
    COUNT(*) AS n_events,
    FLOOR((SUM(value)) * 10000.0 + 0.5) / 10000.0 AS total_value
FROM numbered
GROUP BY user_id, session_id
""",
)
def ts_session_windows_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows where the inactivity gap depends on the
    EVENT (45 min after a click, 15 min after anything else) — Spark's
    dynamic-gap session_window.  The oracle replays the exact merge
    rule as gaps-and-islands over a running MAX(ts + gap): an event
    joins the open session iff it starts strictly before the furthest
    extension any earlier event granted, and the session end is that
    running max — certifying boundary semantics, not just row
    bucketing."""
    events = load_table(spark, sf_dir, "events")
    gap = F.when(
        F.col("event_type") == "click", F.lit("45 minutes")
    ).otherwise(F.lit("15 minutes"))
    return events.transform(
        TW.session_dynamic(
            "ts",
            gap,
            ["user_id"],
            [
                F.count(F.lit(1)).alias("n_events"),
                RND(F.sum("value"), 4).alias("total_value"),
            ],
        )
    )


@query(
    "ts_anomaly_zscore",
    """
WITH daily AS (
    SELECT event_type,
        CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        CAST(SUM(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
            AS x
    FROM events GROUP BY 1, 2
),
win AS (
    SELECT event_type, day, x,
        COUNT(*) OVER w AS wn,
        SUM(CAST(x AS HUGEINT)) OVER w AS s,
        SUM(CAST(x AS HUGEINT) * x) OVER w AS ss
    FROM daily
    WINDOW w AS (
        PARTITION BY event_type ORDER BY day
        ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
    )
)
SELECT event_type, day, x AS scaled_total,
    CASE WHEN wn < 7 THEN NULL
         ELSE (CAST(x AS HUGEINT) * wn - s) * (CAST(x AS HUGEINT) * wn - s)
              > 4 * (wn * ss - s * s)
    END AS is_anomaly
FROM win
""",
)
def ts_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection over the daily value series,
    per event type: a day is anomalous when its total deviates from the
    trailing-7-day mean by more than 2 sigma. The entire test runs in
    EXACT integer arithmetic — values scale to 1e-6 integers (one IEEE
    multiply + floor, deterministic), and the z-score inequality
    cross-multiplies to (x*n - s)^2 > 4*(n*ss - s^2) over exact
    128-bit products (decimal(38,0) here, HUGEINT in the oracle) — no
    sqrt, no float variance, so the anomaly boundary is bit-exact on
    both engines where a naive STDDEV_POP comparison would flake the
    hash gate on summation order. Like the flagship, the window runs
    over the PRE-AGGREGATED |types| x |days| grid, never raw events;
    at 100 TB the daily rollup is the only fact-sized shuffle."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.sum(
            F.floor(F.col("value") * F.lit(1e6) + F.lit(0.5)).cast("long")
        ).alias("x")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    xd = F.col("x").cast("decimal(38,0)")
    win = daily.select(
        "event_type",
        "day",
        "x",
        F.count(F.lit(1)).over(w).alias("wn"),
        F.sum(xd).over(w).alias("s"),
        F.sum(xd * F.col("x")).over(w).alias("ss"),
    )
    lhs = xd * F.col("wn") - F.col("s")
    rhs = F.lit(4) * (F.col("wn") * F.col("ss") - F.col("s") * F.col("s"))
    return win.select(
        "event_type",
        "day",
        F.col("x").alias("scaled_total"),
        F.when(F.col("wn") < 7, F.lit(None).cast("boolean"))
        .otherwise(lhs * lhs > rhs)
        .alias("is_anomaly"),
    )


@query("sketch_sliding_distinct_users")  # rows-only: DataSketches HLL
# register values have no ANSI oracle; the sliding union's accuracy
# against exact per-window distincts is pinned by
# tests/test_sketch_ops.py::test_sliding_estimates_accuracy
def sketch_sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-CALENDAR-day distinct users per active day from the
    SAME persistable per-day HLL sketches the rollup query stores —
    the rolling COUNT(DISTINCT) dashboards want, answered without any
    fact re-scan (operators/sketches.py::sliding_estimates): each
    day's sketch fans out to the <= 7 window-end days it contributes
    to and registers union per window day — an equi-shuffle, never a
    single-partition global window. Exact rolling distincts would
    need a fact scan per window position; sketches make the window
    cost O(|days| x 2^lgk) bytes. Same calendar-window definition as
    ``sketch_sliding_distinct_users_exact``, which certifies it."""
    from rentals_data_pipeline_spark.operators import sketches as SK

    events = load_table(spark, sf_dir, "events")
    daily = SK.distinct_sketches(
        events.withColumn("day", F.date_trunc("day", "ts")), ["day"], "user_id"
    )
    return SK.sliding_estimates(daily, "day", frame_days=7)


@query(
    "window_range_frame_events",
    """
SELECT event_id, event_type,
    FLOOR(CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (
        PARTITION BY event_type
        ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT)
        RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
    ) AS DOUBLE) * 1e2 + 0.5) / 1e2 AS sum_1h,
    COUNT(*) OVER (
        PARTITION BY event_type
        ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT)
        RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
    ) AS n_1h
FROM events
""",
)
def window_range_frame_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based (RANGE) window frames — the frame type the rest of
    the window family doesn't cover: for every event, the sum and
    count of its type's events in the TRAILING HOUR of event time
    (peers at the same second share a frame, the RANGE semantic ROWS
    frames can't express). Ordering key is integer epoch seconds so
    both engines build identical frames; the sum is decimal-exact per
    value (order-invariant), then rounded to a 2-dp DOUBLE on output —
    raw DECIMAL(38,6) would stringify differently after the driver's
    pandas-side float64 widening of the DuckDB oracle (the r5 red-row
    class). At
    scale this is one shuffle on event_type + one sort — same cost
    envelope as any other window, state bounded by the hour span."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, Window.currentRow)
    )
    return events.select(
        "event_id",
        "event_type",
        RND(F.sum(F.col("value").cast("decimal(38,6)")).over(w).cast("double")).alias(
            "sum_1h"
        ),
        F.count(F.lit(1)).over(w).alias("n_1h"),
    )


@query("sketch_distinct_overlap_users")  # rows-only: HLL registers
# have no ANSI oracle; inclusion-exclusion accuracy vs exact overlap
# is pinned by tests/test_sketch_ops.py::test_overlap_estimate_accuracy
def sketch_distinct_overlap_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap from sketches: how many distinct users BOTH
    viewed and purchased, estimated by inclusion-exclusion over the
    same persisted per-event-type HLL sketches the rollup stores
    (operators/sketches.py::overlap_estimate) — the set-intersection
    question unions alone can't answer, still with zero fact
    re-scans."""
    from rentals_data_pipeline_spark.operators import sketches as SK

    events = load_table(spark, sf_dir, "events")
    per_type = SK.distinct_sketches(events, ["event_type"], "user_id")
    return SK.overlap_estimate(per_type, "event_type", "view", "purchase")


@query(
    "sketch_distinct_overlap_users_exact",
    """
WITH per_user AS (
    SELECT user_id,
           MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v,
           MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
    FROM events
    WHERE event_type IN ('view', 'purchase')
    GROUP BY user_id
)
SELECT CAST(SUM(v) AS BIGINT) AS nd_view,
       CAST(SUM(p) AS BIGINT) AS nd_purchase,
       CAST(SUM(v * p) AS BIGINT) AS nd_both
FROM per_user
""",
)
def sketch_distinct_overlap_users_exact(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXACT twin of ``sketch_distinct_overlap_users`` (added round 8 —
    the rows-only HLL variant's most likely graduation candidate per
    the r7 verdict): distinct viewers, distinct purchasers, and the
    exact view∩purchase audience. ONE user_id shuffle with map-side
    combine (per-user boolean flags, then a scalar agg) instead of two
    COUNT DISTINCT shuffles plus an INTERSECT — the flag-fold shape
    stays one pass at any scale. The HLL query remains the zero-rescan
    path over PERSISTED sketches; this is the ground truth it is
    benchmarked against (tests/test_sketch_ops.py pins the estimate
    accuracy)."""
    events = load_table(spark, sf_dir, "events")
    per_user = (
        events.where(F.col("event_type").isin("view", "purchase"))
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "view", 1).otherwise(0)
            ).alias("v"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("p"),
        )
    )
    return per_user.agg(
        F.sum("v").cast("long").alias("nd_view"),
        F.sum("p").cast("long").alias("nd_purchase"),
        F.sum(F.col("v") * F.col("p")).cast("long").alias("nd_both"),
    )


@query("ts_downsample_lttb")  # rows-only: bucket-mean triangle areas
# are float comparisons with no stable ANSI replay; semantics pinned
# by tests/test_round5c_ops.py (reference implementation equality,
# endpoint/cardinality/actual-point invariants)
def ts_downsample_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling of each event
    type's raw value series to 100 visually-representative points
    (operators/window.py::lttb_downsample) — what a dashboard fetches
    instead of 20M raw points per panel. One Arrow applyInPandas group
    per series; every output row is an actual event."""
    events = load_table(spark, sf_dir, "events")
    from rentals_data_pipeline_spark.operators.window import lttb_downsample

    return events.transform(
        lttb_downsample(["event_type"], "ts", "value", n_out=100)
    )


@query(
    "ts_seasonal_naive_backtest",
    """
WITH hourly AS (
    SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS actual
    FROM events
    GROUP BY 1, 2
),
joined AS (
    SELECT a.event_type, a.actual, f.actual AS forecast
    FROM hourly a
    JOIN hourly f
      ON f.event_type = a.event_type
     AND f.h = a.h - INTERVAL 24 HOUR
)
SELECT event_type,
       COUNT(*) AS n_hours,
       CAST(SUM(ABS(actual - forecast)) AS BIGINT) AS abs_err_sum,
       FLOOR(CAST(SUM(ABS(actual - forecast)) AS DOUBLE) / COUNT(*)
             * 10000.0 + 0.5) / 10000.0 AS mae,
       FLOOR(CAST(SUM(ABS(actual - forecast)) AS DOUBLE)
             / NULLIF(CAST(SUM(actual) AS DOUBLE), 0)
             * 1000000.0 + 0.5) / 1000000.0 AS wape
FROM joined
GROUP BY event_type
""",
)
def ts_seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each hour's event count
    with the count from the SAME hour yesterday, and score MAE / WAPE
    per event type — the baseline every fancier forecaster must beat,
    and the first query a capacity-planning pipeline runs. Forecast
    alignment is an equi-join on the SHIFTED hour key (h - 24h), which
    is gap-robust — a missing hour simply produces no backtest row —
    where lag(24) over a sparse series would silently compare
    misaligned hours. Shape: one map-side-combined (type, hour)
    count shuffle, then a frame-sized self-join co-partitioned on the
    type (broadcast at this SF); all errors are exact integer sums, so
    every statistic is order-invariant by construction."""
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count(F.lit(1)).alias("actual"))
    fc = hourly.select(
        F.col("event_type"),
        (F.col("h") + F.expr("INTERVAL 24 HOURS")).alias("h"),
        F.col("actual").alias("forecast"),
    )
    joined = hourly.join(fc, ["event_type", "h"])
    abs_err = F.abs(F.col("actual") - F.col("forecast"))
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum(abs_err).cast("long").alias("abs_err_sum"),
        RND(
            F.sum(abs_err).cast("double") / F.count(F.lit(1)), 4
        ).alias("mae"),
        RND(
            F.sum(abs_err).cast("double")
            / F.nullif(F.sum("actual").cast("double"), F.lit(0.0)),
            6,
        ).alias("wape"),
    )


def _ewma_terms_sql() -> tuple[str, str]:
    """Shared oracle text: numerator = sum of lag(j)*2^-(j+1), denom =
    sum of weights for the taps that exist (series-start partials)."""
    num = " + ".join(
        f"COALESCE(LAG(actual, {j}) OVER w * {2.0 ** -(j + 1)!r}, 0)"
        for j in range(8)
    )
    den = " + ".join(
        f"CASE WHEN LAG(actual, {j}) OVER w IS NOT NULL"
        f" THEN {2.0 ** -(j + 1)!r} ELSE 0 END"
        for j in range(8)
    )
    return num, den


_EWMA_NUM, _EWMA_DEN = _ewma_terms_sql()

_EWMA_SQL = f"""
WITH hourly AS (
    SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS actual
    FROM events
    GROUP BY 1, 2
)
SELECT event_type, h, actual,
       FLOOR(({_EWMA_NUM}) / ({_EWMA_DEN}) * 10000.0 + 0.5) / 10000.0
           AS smoothed
FROM hourly
WINDOW w AS (PARTITION BY event_type ORDER BY h)
"""


@query("ts_ewma_hourly_smoothing", _EWMA_SQL)
def ts_ewma_hourly_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential-taper trailing smoother over each type's hourly
    count series: an 8-tap FIR truncation of EWMA(α=1/2) — weights
    2^-1..2^-8, renormalized over the taps that exist at series start.
    Truncating at 8 taps bounds the tail mass below 2^-8 (under the
    0.01 % level) AND makes the arithmetic EXACT: integer counts times
    dyadic weights are exact doubles, so numerator and denominator
    carry zero rounding error in any summation order — no decimal
    folding needed, the only rounding is the final display digit. One
    map-side-combined (type, hour) count shuffle + ONE window sort
    computes all eight taps; at 100 TB the window runs on the
    |types| x |hours| rollup, never raw events."""
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count(F.lit(1)).alias("actual"))
    w = Window.partitionBy("event_type").orderBy("h")
    num = None
    den = None
    for j in range(8):
        tap = F.lag("actual", j).over(w)
        wgt = float(2.0 ** -(j + 1))
        term = F.coalesce(tap * F.lit(wgt), F.lit(0.0))
        avail = F.when(tap.isNotNull(), F.lit(wgt)).otherwise(F.lit(0.0))
        num = term if num is None else num + term
        den = avail if den is None else den + avail
    return hourly.select(
        "event_type",
        "h",
        "actual",
        RND(num / den, 4).alias("smoothed"),
    )


@query(
    "ts_interpolate_linear",
    """
WITH bounds AS (
    SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
    FROM events
),
h AS (
    SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM bounds
),
ty AS (SELECT DISTINCT event_type FROM events),
agg AS (
    SELECT date_trunc('hour', ts) AS hour, event_type,
           COUNT(*) AS n,
           FLOOR((SUM(value)) * 10000.0 + 0.5) / 10000.0 AS v
    FROM events GROUP BY 1, 2
),
spine AS (
    SELECT CAST(h.hour AS TIMESTAMP) AS hour, ty.event_type,
           CAST(FLOOR(epoch(h.hour)) AS BIGINT) / 3600 AS hidx
    FROM h CROSS JOIN ty
),
j AS (
    SELECT spine.hour, spine.event_type, spine.hidx,
           CAST(COALESCE(agg.n, 0) AS BIGINT) AS n_events, agg.v
    FROM spine LEFT JOIN agg
      ON spine.hour = agg.hour AND spine.event_type = agg.event_type
),
anchored AS (
    SELECT *,
        last_value(v IGNORE NULLS) OVER wp AS prev_v,
        last_value(CASE WHEN v IS NOT NULL THEN hidx END IGNORE NULLS)
            OVER wp AS prev_i,
        first_value(v IGNORE NULLS) OVER wn AS next_v,
        first_value(CASE WHEN v IS NOT NULL THEN hidx END IGNORE NULLS)
            OVER wn AS next_i
    FROM j
    WINDOW
        wp AS (PARTITION BY event_type ORDER BY hidx
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        wn AS (PARTITION BY event_type ORDER BY hidx
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
)
SELECT hour, event_type, n_events,
    CASE
        WHEN v IS NOT NULL THEN v
        WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN
            FLOOR((prev_v + (next_v - prev_v)
                   * (CAST(hidx - prev_i AS DOUBLE)
                      / CAST(next_i - prev_i AS DOUBLE)))
                  * 10000.0 + 0.5) / 10000.0
        WHEN prev_v IS NOT NULL THEN prev_v
        ELSE next_v
    END AS value_filled,
    (v IS NULL) AS was_gap
FROM anchored
""",
)
def ts_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation across hourly gaps, per event_type — the
    time-weighted fill for metered/sensor series where carrying the
    last observation forward (ts_gap_fill_hourly's locf) biases the
    series flat. Dense spine as in the gap-fill query; each missing
    hour takes prev + (next - prev) * elapsed-fraction between its two
    non-null neighbors (locf/nocb at the edges). The neighbor lookup is
    two IGNORE NULLS window passes over the spine (|hours x types|
    rows, never the raw fact), hour indices are exact integers, and the
    interpolated value rounds half-up at 4 dp — engine-replayable
    IEEE arithmetic end to end."""
    events = load_table(spark, sf_dir, "events")
    bounds = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias(
            "hour"
        )
    )
    types = events.select("event_type").distinct()
    spine = hours.crossJoin(F.broadcast(types)).withColumn(
        "hidx",
        (F.unix_timestamp(F.col("hour").cast("timestamp")) / 3600).cast(
            "long"
        ),
    )
    agg = events.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        RND(F.sum("value"), 4).alias("v"),
    )
    j = spine.join(agg, ["hour", "event_type"], "left").select(
        "hour",
        "event_type",
        "hidx",
        F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
        "v",
    )
    wp = (
        Window.partitionBy("event_type")
        .orderBy("hidx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wn = (
        Window.partitionBy("event_type")
        .orderBy("hidx")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    v = F.col("v")
    hidx = F.col("hidx")
    anchored = j.select(
        "*",
        F.last(v, ignorenulls=True).over(wp).alias("prev_v"),
        F.last(F.when(v.isNotNull(), hidx), ignorenulls=True)
        .over(wp)
        .alias("prev_i"),
        F.first(v, ignorenulls=True).over(wn).alias("next_v"),
        F.first(F.when(v.isNotNull(), hidx), ignorenulls=True)
        .over(wn)
        .alias("next_i"),
    )
    interp = RND(
        F.col("prev_v")
        + (F.col("next_v") - F.col("prev_v"))
        * (
            (hidx - F.col("prev_i")).cast("double")
            / (F.col("next_i") - F.col("prev_i")).cast("double")
        ),
        4,
    )
    return anchored.select(
        "hour",
        "event_type",
        "n_events",
        F.when(v.isNotNull(), v)
        .when(
            F.col("prev_v").isNotNull() & F.col("next_v").isNotNull(), interp
        )
        .when(F.col("prev_v").isNotNull(), F.col("prev_v"))
        .otherwise(F.col("next_v"))
        .alias("value_filled"),
        v.isNull().alias("was_gap"),
    )


@query(
    "window_rolling_autocorr",
    """
WITH hourly AS (
    SELECT event_type, date_trunc('hour', ts) AS hour,
           FLOOR((SUM(value)) * 10000.0 + 0.5) / 10000.0 AS v
    FROM events GROUP BY 1, 2
),
p AS (
    SELECT event_type, hour, v,
           LAG(v) OVER (PARTITION BY event_type ORDER BY hour) AS yv
    FROM hourly
),
pp AS (SELECT * FROM p WHERE yv IS NOT NULL),
s AS (
    SELECT event_type, hour,
        COUNT(*) OVER w AS n,
        SUM(CAST(v AS DECIMAL(18,4))) OVER w AS sx,
        SUM(CAST(yv AS DECIMAL(18,4))) OVER w AS sy,
        SUM(CAST(v AS DECIMAL(18,4)) * CAST(yv AS DECIMAL(18,4))) OVER w
            AS sxy,
        SUM(CAST(v AS DECIMAL(18,4)) * CAST(v AS DECIMAL(18,4))) OVER w
            AS sxx,
        SUM(CAST(yv AS DECIMAL(18,4)) * CAST(yv AS DECIMAL(18,4))) OVER w
            AS syy
    FROM pp
    WINDOW w AS (PARTITION BY event_type ORDER BY hour
                 ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
)
SELECT event_type, CAST(hour AS TIMESTAMP) AS hour,
    CAST(n AS BIGINT) AS n_pairs,
    FLOOR(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / NULLIF(sqrt(
                GREATEST(0.0, CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * GREATEST(0.0, CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
             0.0))
          * 1000000.0 + 0.5) / 1000000.0 AS autocorr
FROM s WHERE n >= 12
""",
)
def window_rolling_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-24h lag-1 autocorrelation of the hourly volume series,
    per event type — the rolling-window statistical frame (mean/corr
    over a sliding history) that powers anomaly scoring and
    seasonality checks. The correlation is NOT Spark's fp `corr`
    window (order-dependent summation would flake the hash gate): the
    five moment sums fold DECIMAL(18,4) casts of the 4-dp-rounded
    hourly anchors — exact, order-invariant — and Pearson's formula
    then runs once per row in IEEE doubles on identical operands.
    Shape: windows run over the pre-aggregated |types x hours| series,
    never raw events; one shuffle on event_type reused by the lag and
    the rolling frame."""
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(RND(F.sum("value"), 4).alias("v"))
    w_lag = Window.partitionBy("event_type").orderBy("hour")
    pp = hourly.select(
        "*", F.lag("v", 1).over(w_lag).alias("yv")
    ).where(F.col("yv").isNotNull())
    x4 = F.col("v").cast("decimal(18,4)")
    y4 = F.col("yv").cast("decimal(18,4)")
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-23, Window.currentRow)
    )
    s = pp.select(
        "event_type",
        "hour",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum(x4).over(w).alias("sx"),
        F.sum(y4).over(w).alias("sy"),
        F.sum(x4 * y4).over(w).alias("sxy"),
        F.sum(x4 * x4).over(w).alias("sxx"),
        F.sum(y4 * y4).over(w).alias("syy"),
    )
    nd = F.col("n").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxyd = F.col("sxy").cast("double")
    sxxd, syyd = F.col("sxx").cast("double"), F.col("syy").cast("double")
    num = nd * sxyd - sxd * syd
    den = F.sqrt(
        F.greatest(F.lit(0.0), nd * sxxd - sxd * sxd)
        * F.greatest(F.lit(0.0), nd * syyd - syd * syd)
    )
    return s.where(F.col("n") >= 12).select(
        "event_type",
        F.col("hour").cast("timestamp").alias("hour"),
        F.col("n").cast("long").alias("n_pairs"),
        RND(num / F.nullif(den, F.lit(0.0)), 6).alias("autocorr"),
    )


@query(
    "ts_changepoint_cusum",
    """
WITH daily AS (
    SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        SUM(CAST(value AS DECIMAL(18,6))) AS dv
    FROM events GROUP BY 1, 2
),
tot AS (
    SELECT event_type, SUM(dv) AS sn, COUNT(*) AS n FROM daily GROUP BY 1
),
walk AS (
    SELECT d.event_type, d.day,
        SUM(d.dv) OVER (PARTITION BY d.event_type ORDER BY d.day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS st,
        ROW_NUMBER() OVER (PARTITION BY d.event_type ORDER BY d.day) AS t,
        t2.sn, t2.n
    FROM daily d JOIN tot t2 USING (event_type)
),
cusum AS (
    SELECT event_type, day,
        ABS(CAST(st AS DOUBLE)
            - CAST(t AS DOUBLE) * (CAST(sn AS DOUBLE) / CAST(n AS DOUBLE)))
            AS dev
    FROM walk
),
best AS (
    SELECT event_type, day, dev,
        ROW_NUMBER() OVER (PARTITION BY event_type
                           ORDER BY dev DESC, day) AS rn
    FROM cusum
)
SELECT event_type, day AS changepoint_day,
    FLOOR(dev * 10000.0 + 0.5) / 10000.0 AS max_cusum_dev
FROM best WHERE rn = 1
""",
)
def ts_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint localization per event type: the day where
    the cumulative deviation from the series' overall mean peaks — the
    standard answer to "WHEN did the level shift?" after a drift
    monitor (KS / PSI) says THAT it shifted. Daily sums fold
    DECIMAL(18,6) (exact, order-invariant); the cumulative walk and
    the t·mean subtraction run in IEEE doubles on identical operands;
    the argmax frontier orders by the deviation with a day tiebreak.
    Windows run on the |types × days| daily series, never raw
    events."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("dv"))
    tot = daily.groupBy("event_type").agg(
        F.sum("dv").alias("sn"), F.count(F.lit(1)).alias("n")
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_rn = Window.partitionBy("event_type").orderBy("day")
    walk = daily.join(tot, "event_type").select(
        "event_type",
        "day",
        F.sum("dv").over(w_cum).alias("st"),
        F.row_number().over(w_rn).alias("t"),
        "sn",
        "n",
    )
    dev = F.abs(
        F.col("st").cast("double")
        - F.col("t").cast("double")
        * (F.col("sn").cast("double") / F.col("n").cast("double"))
    )
    w_best = Window.partitionBy("event_type").orderBy(
        F.col("dev").desc(), "day"
    )
    return (
        walk.select("event_type", "day", dev.alias("dev"))
        .withColumn("rn", F.row_number().over(w_best))
        .where(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("day").alias("changepoint_day"),
            RND(F.col("dev"), 4).alias("max_cusum_dev"),
        )
    )


@query(
    "ts_acf_hourly_lags",
    """
WITH e AS (
    SELECT event_type,
        CAST(FLOOR(epoch(date_trunc('hour', ts)) / 3600.0) AS BIGINT) AS hr,
        value
    FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
),
hm AS (
    SELECT event_type, hr,
        CAST(SUM(CAST(FLOOR(value * 1000000.0 + 0.5) / 1000000.0
                      AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS m
    FROM e GROUP BY 1, 2
),
lagged AS (
    SELECT event_type, hr, m,
        LAG(m, 1) OVER w AS l1, LAG(m, 6) OVER w AS l6,
        LAG(m, 12) OVER w AS l12, LAG(m, 24) OVER w AS l24
    FROM hm WINDOW w AS (PARTITION BY event_type ORDER BY hr)
),
pairs AS (
    SELECT event_type, u.lag, m AS x, u.y
    FROM lagged,
    LATERAL (VALUES (1, l1), (6, l6), (12, l12), (24, l24)) AS u(lag, y)
    WHERE u.y IS NOT NULL
),
a AS (
    SELECT event_type, lag, COUNT(*) AS n,
        SUM(CAST(FLOOR(x * 1000000.0 + 0.5) / 1000000.0
                 AS DECIMAL(38,6))) AS sx,
        SUM(CAST(FLOOR(y * 1000000.0 + 0.5) / 1000000.0
                 AS DECIMAL(38,6))) AS sy,
        SUM(CAST(FLOOR(x * y * 1000000.0 + 0.5) / 1000000.0
                 AS DECIMAL(38,6))) AS sxy,
        SUM(CAST(FLOOR(x * x * 1000000.0 + 0.5) / 1000000.0
                 AS DECIMAL(38,6))) AS sxx,
        SUM(CAST(FLOOR(y * y * 1000000.0 + 0.5) / 1000000.0
                 AS DECIMAL(38,6))) AS syy
    FROM pairs GROUP BY 1, 2
)
SELECT event_type, CAST(lag AS INT) AS lag_hours,
    CAST(n AS BIGINT) AS n_pairs,
    FLOOR(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / NULLIF(SQRT(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * SQRT(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)),
                    0.0))
          * 1000000.0 + 0.5) / 1000000.0 AS acf
FROM a
""",
)
def ts_acf_hourly_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of the hourly mean-value series at
    lags 1/6/12/24 hours, per event type — the seasonality spectrum:
    a spike at lag 24 reveals a daily cycle, at lag 1 short-range
    stickiness; ``window_rolling_autocorr`` is its moving-window lag-1
    sibling, this is the fixed-lag diagnostic a monitoring pipeline
    charts.  Lags step over the OBSERVED hourly series (empty hours
    are skipped, not zero-filled — gap-fill is its own query).

    Shape: the fact folds once to |types x 720 hours| anchored means
    (map-side combined — the only data-sized shuffle); all four lags
    come from ONE window pass over the tiny series; Pearson folds
    6-dp-anchored decimal products (order-invariant), and the final
    correlate is one IEEE expression per (type, lag), spelled
    identically in the oracle."""
    dec = "decimal(38,6)"
    r6 = lambda c: RND(c, 6)  # noqa: E731
    events = load_table(spark, sf_dir, "events")
    e = events.where(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    ).select(
        "event_type",
        F.expr("unix_timestamp(date_trunc('hour', ts)) div 3600").alias(
            "hr"
        ),
        "value",
    )
    hm = e.groupBy("event_type", "hr").agg(
        (
            F.sum(r6(F.col("value")).cast(dec)).cast("double")
            / F.count(F.lit(1))
        ).alias("m")
    )
    w = Window.partitionBy("event_type").orderBy("hr")
    lagged = hm.select(
        "event_type",
        "m",
        F.lag("m", 1).over(w).alias("l1"),
        F.lag("m", 6).over(w).alias("l6"),
        F.lag("m", 12).over(w).alias("l12"),
        F.lag("m", 24).over(w).alias("l24"),
    )
    pairs = lagged.select(
        "event_type",
        F.col("m").alias("x"),
        F.expr(
            "stack(4, 1, l1, 6, l6, 12, l12, 24, l24) AS (lag, y)"
        ),
    ).where(F.col("y").isNotNull())
    a = pairs.groupBy("event_type", "lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(r6(F.col("x")).cast(dec)).alias("sx"),
        F.sum(r6(F.col("y")).cast(dec)).alias("sy"),
        F.sum(r6(F.col("x") * F.col("y")).cast(dec)).alias("sxy"),
        F.sum(r6(F.col("x") * F.col("x")).cast(dec)).alias("sxx"),
        F.sum(r6(F.col("y") * F.col("y")).cast(dec)).alias("syy"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sy").cast("double")
    den = F.sqrt(
        nd * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    ) * F.sqrt(
        nd * F.col("syy").cast("double")
        - F.col("sy").cast("double") * F.col("sy").cast("double")
    )
    return a.select(
        "event_type",
        F.col("lag").cast("int").alias("lag_hours"),
        F.col("n").cast("long").alias("n_pairs"),
        r6(num / F.nullif(den, F.lit(0.0))).alias("acf"),
    )


_CCF_LAGS = (-24, -6, -1, 0, 1, 6, 24)


@query(
    "ts_ccf_click_purchase",
    f"""
WITH e AS (
    SELECT event_type,
        CAST(FLOOR(epoch(date_trunc('hour', ts)) / 3600.0) AS BIGINT) AS hr,
        value
    FROM events
    WHERE value IS NOT NULL AND ts IS NOT NULL
      AND event_type IN ('click', 'purchase')
),
p AS (
    SELECT hr,
        CAST(SUM(CASE WHEN event_type = 'click'
                 THEN CAST(FLOOR(value * 1000000.0 + 0.5) / 1000000.0
                           AS DECIMAL(38,6)) END) AS DOUBLE)
            / COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS x,
        CAST(SUM(CASE WHEN event_type = 'purchase'
                 THEN CAST(FLOOR(value * 1000000.0 + 0.5) / 1000000.0
                           AS DECIMAL(38,6)) END) AS DOUBLE)
            / COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS y
    FROM e GROUP BY 1
),
s AS (
    SELECT u.lag, hr - u.lag AS hr, y
    FROM p, LATERAL (VALUES {", ".join(f"({k})" for k in _CCF_LAGS)})
        AS u(lag)
    WHERE y IS NOT NULL
),
j AS (
    SELECT s.lag, p.x, s.y FROM p JOIN s USING (hr) WHERE p.x IS NOT NULL
),
a AS (
    SELECT lag, COUNT(*) AS n,
        SUM(CAST(FLOOR(x * 1000000.0 + 0.5) / 1000000.0
                 AS DECIMAL(38,6))) AS sx,
        SUM(CAST(FLOOR(y * 1000000.0 + 0.5) / 1000000.0
                 AS DECIMAL(38,6))) AS sy,
        SUM(CAST(FLOOR(x * y * 1000000.0 + 0.5) / 1000000.0
                 AS DECIMAL(38,6))) AS sxy,
        SUM(CAST(FLOOR(x * x * 1000000.0 + 0.5) / 1000000.0
                 AS DECIMAL(38,6))) AS sxx,
        SUM(CAST(FLOOR(y * y * 1000000.0 + 0.5) / 1000000.0
                 AS DECIMAL(38,6))) AS syy
    FROM j GROUP BY 1
)
SELECT CAST(lag AS INT) AS lag_hours,
    CAST(n AS BIGINT) AS n_pairs,
    FLOOR(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / NULLIF(SQRT(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * SQRT(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)),
                    0.0))
          * 1000000.0 + 0.5) / 1000000.0 AS ccf
FROM a
""",
)
def ts_ccf_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation function between the hourly mean click-value
    and purchase-value series at lags ±1/±6/±24 (and 0) — the lead-lag
    diagnostic: ccf at positive lag k correlates clicks at hour t with
    purchases at t+k (does click activity LEAD purchases?), negative
    lags test the reverse, lag 0 is the contemporaneous baseline.
    ``ts_acf_hourly_lags`` is the single-series sibling; this is the
    pair diagnostic a funnel-monitoring pipeline charts.

    Shape: ONE conditional aggregation folds the fact to the shared
    hourly grid (both series from one map-side-combined shuffle — a
    per-series groupBy would scan twice); the ≤ |hours| pivot frame is
    localCheckpoint-ed so the lag self-pairing below it cannot
    re-resolve the fact scan (the alias-rename exchange-reuse trap),
    lag shifts are HOUR ARITHMETIC on the checkpointed frame (exact
    calendar shifts even across empty hours — no dense spine, no
    global window), and Pearson folds the same 6-dp anchored decimals
    as the ACF. Hours missing either series drop from that lag's pair
    set (n_pairs reports coverage)."""
    dec = "decimal(38,6)"
    r6 = lambda c: RND(c, 6)  # noqa: E731
    events = load_table(spark, sf_dir, "events")
    e = events.where(
        F.col("value").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("event_type").isin("click", "purchase")
    ).select(
        "event_type",
        F.expr("unix_timestamp(date_trunc('hour', ts)) div 3600").alias(
            "hr"
        ),
        "value",
    )

    def _series(etype: str) -> Column:
        cond = F.col("event_type") == etype
        return F.sum(F.when(cond, r6(F.col("value")).cast(dec))).cast(
            "double"
        ) / F.count(F.when(cond, F.lit(1)))

    p = e.groupBy("hr").agg(
        _series("click").alias("x"), _series("purchase").alias("y")
    ).localCheckpoint(eager=True)
    s = (
        p.where(F.col("y").isNotNull())
        .select(
            F.explode(
                F.array(*[F.lit(k) for k in _CCF_LAGS])
            ).alias("lag"),
            "hr",
            "y",
        )
        .select("lag", (F.col("hr") - F.col("lag")).alias("hr"), "y")
    )
    j = p.where(F.col("x").isNotNull()).select("hr", "x").join(s, "hr")
    a = j.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(r6(F.col("x")).cast(dec)).alias("sx"),
        F.sum(r6(F.col("y")).cast(dec)).alias("sy"),
        F.sum(r6(F.col("x") * F.col("y")).cast(dec)).alias("sxy"),
        F.sum(r6(F.col("x") * F.col("x")).cast(dec)).alias("sxx"),
        F.sum(r6(F.col("y") * F.col("y")).cast(dec)).alias("syy"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sy").cast("double")
    den = F.sqrt(
        nd * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    ) * F.sqrt(
        nd * F.col("syy").cast("double")
        - F.col("sy").cast("double") * F.col("sy").cast("double")
    )
    return a.select(
        F.col("lag").cast("int").alias("lag_hours"),
        F.col("n").cast("long").alias("n_pairs"),
        r6(num / F.nullif(den, F.lit(0.0))).alias("ccf"),
    )


@query(
    "ts_ingestion_staleness",
    """
WITH b AS (
    SELECT MAX(ts) AS wm, MIN(ts) AS t0 FROM events WHERE ts IS NOT NULL
),
a AS (
    SELECT e.event_type,
        MAX(e.ts) AS last_ts,
        COUNT(*) AS n_total,
        COUNT(CASE WHEN e.ts >= b.wm - INTERVAL 24 HOUR THEN 1 END)
            AS n_last_24h,
        MAX(b.wm) AS wm, MAX(b.t0) AS t0
    FROM events e CROSS JOIN b
    WHERE e.ts IS NOT NULL
    GROUP BY 1
)
SELECT event_type,
    CAST(last_ts AS TIMESTAMP) AS last_ts,
    CAST(n_total AS BIGINT) AS n_total,
    CAST(n_last_24h AS BIGINT) AS n_last_24h,
    CAST((CAST(FLOOR(epoch(wm)) AS BIGINT)
          - CAST(FLOOR(epoch(last_ts)) AS BIGINT)) // 60 AS BIGINT)
        AS staleness_minutes,
    FLOOR((CAST(n_total AS DOUBLE)
           / ((CAST(FLOOR(epoch(wm)) AS BIGINT)
               - CAST(FLOOR(epoch(t0)) AS BIGINT)) // 86400 + 1))
          * 10000.0 + 0.5) / 10000.0 AS daily_avg,
    FLOOR((CAST(n_last_24h
                * ((CAST(FLOOR(epoch(wm)) AS BIGINT)
                    - CAST(FLOOR(epoch(t0)) AS BIGINT)) // 86400 + 1)
                AS DOUBLE)
           / CAST(n_total AS DOUBLE)) * 10000.0 + 0.5) / 10000.0
        AS last24_vs_daily_avg
FROM a
""",
)
def ts_ingestion_staleness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-freshness monitor (r13): per event type, the last
    event seen, its staleness in minutes behind the corpus watermark
    (the global max ts), the trailing-24h volume, and that volume
    against the type's long-run daily average — the pipeline-health
    panel that catches a silently-stalled upstream feed (staleness
    grows) or a collapsed one (last-24h ratio sinks) before any
    downstream query goes wrong.

    Shape: a 1-row (watermark, min-ts) carrier broadcast-crosses the
    fact (the whitelisted scalar-carrier BNLJ — map-side, no shuffle)
    so the trailing-window predicate folds in the same single
    conditional aggregation as the totals; all time arithmetic is
    integer epoch math (FLOOR(epoch) on both engines), divisions
    round only at the emit boundary."""
    events = load_table(spark, sf_dir, "events").where(
        F.col("ts").isNotNull()
    )
    b = events.agg(F.max("ts").alias("wm"), F.min("ts").alias("t0"))
    j = events.crossJoin(F.broadcast(b))
    a = j.groupBy("event_type").agg(
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).alias("n_total"),
        F.count(
            F.when(
                F.col("ts") >= F.col("wm") - F.expr("INTERVAL 24 HOURS"),
                F.lit(1),
            )
        ).alias("n_last_24h"),
        F.max("wm").alias("wm"),
        F.max("t0").alias("t0"),
    )
    days = F.expr(
        "(unix_timestamp(CAST(wm AS TIMESTAMP))"
        " - unix_timestamp(CAST(t0 AS TIMESTAMP))) div 86400 + 1"
    )
    return a.select(
        "event_type",
        F.col("last_ts").cast("timestamp").alias("last_ts"),
        F.col("n_total").cast("long").alias("n_total"),
        F.col("n_last_24h").cast("long").alias("n_last_24h"),
        F.expr(
            "(unix_timestamp(CAST(wm AS TIMESTAMP))"
            " - unix_timestamp(CAST(last_ts AS TIMESTAMP))) div 60"
        ).cast("long").alias("staleness_minutes"),
        RND(F.col("n_total").cast("double") / days, 4).alias("daily_avg"),
        RND(
            (F.col("n_last_24h") * days).cast("double")
            / F.col("n_total").cast("double"),
            4,
        ).alias("last24_vs_daily_avg"),
    )
