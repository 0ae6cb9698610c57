"""§2.B.8 — event-time windowing, batch-first (oracle-checkable).

Batch formulations of the streaming window shapes; the Structured
Streaming twins live in ``streaming_demo``/``tpctools_spark.streaming``.
Window-start timestamps are emitted as formatted strings on both sides
so the hash cannot diverge on timestamp rendering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tpctools_spark.catalog import table
from tpctools_spark.queries._util import global_rank, money, trunc_digits
from tpctools_spark.registry import query

_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


@query(
    "window_tumbling",
    oracle=f"""
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '{_TS_FMT_DUCK}') AS bucket_start,
           event_type,
           COUNT(*) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed 1-hour event-time buckets (tumbling window), per event type.

    Uses Spark's native ``window()`` — the same construct the streaming
    twin uses with a watermark; in batch it is a plain hash aggregate on
    the derived bucket column.
    """
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(money(F.col("value"))).cast("double"), 2).alias(
                "total_value"
            ),
        )
        .select(
            F.date_format(F.col("w.start"), _TS_FMT_SPARK).alias("bucket_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "window_sliding",
    oracle=f"""
    WITH starts AS (
      SELECT time_bucket(INTERVAL '30 minutes', ts) AS w_start, value FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL 30 MINUTE, value FROM events
    )
    SELECT strftime(w_start, '{_TS_FMT_DUCK}') AS window_start,
           COUNT(*) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE), 2) AS total_value
    FROM starts
    GROUP BY 1
    """,
)
def window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window: 1-hour windows every 30 minutes.

    Spark's ``window(ts, '1 hour', '30 minutes')`` assigns each event to
    2 overlapping windows; the oracle reproduces the assignment by
    unioning the two aligned start offsets.
    """
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(money(F.col("value"))).cast("double"), 2).alias(
                "total_value"
            ),
        )
        .select(
            F.date_format(F.col("w.start"), _TS_FMT_SPARK).alias("window_start"),
            "n_events",
            "total_value",
        )
    )


@query(
    "window_session",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, value, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                  OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, ts, value,
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id,
           COUNT(*) AS n_events,
           strftime(MIN(ts), '{_TS_FMT_DUCK}') AS session_start,
           strftime(MAX(ts), '{_TS_FMT_DUCK}') AS session_end,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE), 2) AS total_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-minute inactivity gap) — gaps-and-islands.

    Two stacked windows over one shuffle on user_id: flag session starts
    with ``lag``, then a running sum numbers the sessions. This is the
    batch formulation; the streaming twin is ``session_window(ts, '30
    minutes')`` (see streaming module).
    """
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 30 * 60 * 1_000_000
    lag_ts = F.lag("ts").over(w)
    flagged = ev.withColumn(
        "new_session",
        F.when(
            lag_ts.isNull()
            | (F.unix_micros(F.col("ts")) - F.unix_micros(lag_ts) > gap_us),
            1,
        ).otherwise(0),
    )
    cum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = flagged.withColumn("session_id", F.sum("new_session").over(cum))
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min("ts"), _TS_FMT_SPARK).alias("session_start"),
        F.date_format(F.max("ts"), _TS_FMT_SPARK).alias("session_end"),
        F.round(F.sum(money(F.col("value"))).cast("double"), 2).alias("total_value"),
    )


@query(
    "cogroup_asof_pandas",
    oracle="""
    SELECT e.user_id,
           strftime(e.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
           e.event_type,
           o.o_orderkey AS last_orderkey,
           CAST((epoch_us(e.ts) - epoch_us(o.odate)) // 8640000 AS DOUBLE)
             / 10000 AS days_since_order
    FROM events e
    LEFT JOIN LATERAL (
      SELECT o_orderkey, o_orderdate AS odate FROM orders
      WHERE o_custkey = e.user_id AND o_orderdate <= e.ts
      ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1
    ) o ON TRUE
    """,
)
def cogroup_asof_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of merge of two tables via cogrouped ``applyInPandas``.

    The cogroup surface: both sides shuffle once on the key, and each
    (user's events, user's orders-by-customer-id) pair lands in one
    Arrow-backed pandas call — here ``merge_asof`` attaches the user's
    most recent order at-or-before each event. This is the API of
    choice when per-key logic needs both relations materialized side by
    side (backfills, interval reconciliation) and outgrows join+window
    SQL; the batch-SQL twin of the same semantics is
    ``join_asof_event``. State per task is one key group, so memory is
    bounded by the largest key, not the table.

    Determinism: order ties on odate break by highest o_orderkey (the
    sort feeds merge_asof's last-match-wins), timestamps are emitted as
    formatted strings, and day deltas are exact integer-microsecond
    floor division — every output has a bitwise SQL twin (the LATERAL
    top-1 oracle).
    """
    import pandas as pd

    ev = table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    o = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderkey"),
        F.col("o_orderdate").cast("timestamp").alias("odate"),
    )

    out_schema = (
        "user_id long, ts string, event_type string, "
        "last_orderkey long, days_since_order double"
    )
    cols = ["user_id", "ts", "event_type", "last_orderkey", "days_since_order"]
    _FMT = "%Y-%m-%d %H:%M:%S.%f"

    def merge(events: pd.DataFrame, orders: pd.DataFrame) -> pd.DataFrame:
        if events.empty:
            return pd.DataFrame(columns=cols)
        events = events.sort_values("ts")
        if orders.empty:
            out = events.assign(last_orderkey=None, days_since_order=None)
            out["ts"] = out["ts"].dt.strftime(_FMT)
            return out[cols]
        orders = orders.sort_values(["odate", "o_orderkey"])
        merged = pd.merge_asof(
            events, orders[["odate", "o_orderkey"]],
            left_on="ts", right_on="odate", direction="backward",
        )
        merged["last_orderkey"] = merged["o_orderkey"]
        has = merged["odate"].notna()
        ts_us = merged["ts"].astype("int64") // 1000
        od_us = merged["odate"].astype("int64") // 1000
        merged["days_since_order"] = (
            ((ts_us - od_us) // 8_640_000) / 10000.0
        ).where(has)
        merged["ts"] = merged["ts"].dt.strftime(_FMT)
        return merged[cols]

    return (
        ev.groupBy("user_id")
        .cogroup(o.groupBy("user_id"))
        .applyInPandas(merge, out_schema)
    )


@query(
    "events_funnel",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT
      CASE
        WHEN t_view IS NOT NULL AND t_click > t_view AND t_purchase > t_click
          THEN 'purchased'
        WHEN t_view IS NOT NULL AND t_click > t_view THEN 'clicked'
        WHEN t_view IS NOT NULL THEN 'viewed'
        ELSE 'none'
      END AS stage,
      COUNT(*) AS n_users
    FROM firsts
    GROUP BY 1
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: how far does each user get through
    view → click → purchase, respecting event order?

    The sequential-pattern shape without a MATCH_RECOGNIZE operator:
    one conditional-MIN aggregation collapses each user to three
    first-occurrence timestamps, and the stage is pure timestamp
    comparison — exact, so the funnel oracle-checks. One shuffle on
    user_id total; at 100 TB this is the cheapest funnel formulation
    (no self-joins, no per-user sort). NULL comparisons propagate the
    same three-valued logic in both engines (a missing stage can never
    satisfy `>`).
    """
    ev = table(spark, sf_dir, "events")

    def first_of(t: str) -> F.Column:
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    firsts = ev.groupBy("user_id").agg(
        first_of("view").alias("t_view"),
        first_of("click").alias("t_click"),
        first_of("purchase").alias("t_purchase"),
    )
    stage = (
        F.when(
            F.col("t_view").isNotNull()
            & (F.col("t_click") > F.col("t_view"))
            & (F.col("t_purchase") > F.col("t_click")),
            "purchased",
        )
        .when(
            F.col("t_view").isNotNull() & (F.col("t_click") > F.col("t_view")),
            "clicked",
        )
        .when(F.col("t_view").isNotNull(), "viewed")
        .otherwise("none")
    )
    return firsts.groupBy(stage.alias("stage")).agg(
        F.count(F.lit(1)).alias("n_users")
    )


@query(
    "events_downsample_ohlc",
    oracle=f"""
    SELECT strftime(time_bucket(INTERVAL '15 minutes', ts), '{_TS_FMT_DUCK}') AS bucket_start,
           event_type,
           arg_min(value, (epoch_us(ts) % 900000000) * 8589934592
                          + (event_id % 8589934592)) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           arg_max(value, (epoch_us(ts) % 900000000) * 8589934592
                          + (event_id % 8589934592)) AS close,
           COUNT(*) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE), 2) AS volume
    FROM events
    GROUP BY 1, 2
    """,
)
def events_downsample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style OHLC downsample: 15-minute bars per event type.

    The time-series rollup pattern (continuous-aggregate material): one
    HASH aggregate per bar, no window sort anywhere — ``min_by``/
    ``max_by`` pick the open/close in the same map-side-partial pass
    that computes high/low/volume, so a 100 TB tick table downsamples
    in a single shuffle keyed by (bar, series). The order key must be a
    fixed-width long, not a string: a string-keyed min_by buffer kicks
    the whole aggregate out of the hash fast path into SortAggregate
    (plan-asserted in tests/test_new_ops_plans.py). Packing: in-bar
    microsecond offset (epoch_us mod 9·10⁸ — both engines' bucket
    origins are 900 s-aligned to the epoch, and the offset is monotone
    within a bar) × 2³³ + event_id mod 2³³ — fits a long with headroom,
    ties broken by id; the identical expression on both engines makes
    the bar values deterministic. Volume sums exact decimals;
    open/close/high/low are raw stored doubles, bit-equal across
    engines.
    """
    ev = table(spark, sf_dir, "events")
    okey = F.pmod(F.unix_micros(F.col("ts")), F.lit(900_000_000)) * F.lit(
        8589934592
    ) + F.pmod(F.col("event_id"), F.lit(8589934592))
    return (
        ev.groupBy(F.window("ts", "15 minutes").alias("w"), "event_type")
        .agg(
            F.min_by("value", okey).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", okey).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(money(F.col("value"))).cast("double"), 2).alias("volume"),
        )
        .select(
            F.date_format(F.col("w.start"), _TS_FMT_SPARK).alias("bucket_start"),
            "event_type",
            "open",
            "high",
            "low",
            "close",
            "n_events",
            "volume",
        )
    )


@query(
    "events_cohort_retention",
    oracle="""
    WITH weekly AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
      FROM events
    ), cohorts AS (
      SELECT user_id, MIN(week) AS cohort_week FROM weekly GROUP BY user_id
    )
    SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST(datediff('day', cohort_week, week) / 7 AS BIGINT) AS week_offset,
           COUNT(*) AS n_users
    FROM weekly JOIN cohorts USING (user_id)
    GROUP BY cohorts.cohort_week, week_offset
    """,
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle: users grouped by first-active
    week, counted in every later week they return.

    The standard growth-analytics shape. One distinct-reduce to
    (user, week) — the only pass over the raw events — then the cohort
    assignment is a per-user MIN re-joined to the same tiny weekly
    activity table; at 100 TB the event scan happens once and
    everything after runs on |users × weeks| rows. All-integer output
    (date strings, week offsets, counts): nothing to round.
    """
    ev = table(spark, sf_dir, "events")
    weekly = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("week")
    ).distinct()
    cohorts = weekly.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        weekly.join(cohorts, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "n_users",
        )
    )


@query(
    "events_path_trigrams",
    oracle="""
    WITH steps AS (
      SELECT event_type AS t0,
             LEAD(event_type, 1) OVER w AS t1,
             LEAD(event_type, 2) OVER w AS t2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), trigrams AS (
      SELECT t0 || '>' || t1 || '>' || t2 AS path, COUNT(*) AS n
      FROM steps WHERE t2 IS NOT NULL
      GROUP BY 1
    )
    SELECT path, n, rk FROM (
      SELECT path, n, ROW_NUMBER() OVER (ORDER BY n DESC, path) AS rk
      FROM trigrams
    ) WHERE rk <= 20
    """,
)
def events_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 user journey trigrams: the most common 3-step event-type
    paths across all users.

    Sequential pattern mining's workhorse shape: two LEADs over the
    per-user event order turn each position into its 3-step window —
    one sort per user partition, no self-joins (the join formulation
    shuffles the event table twice more). The top-20 is a distributed
    ``orderBy().limit(20)`` (TakeOrderedAndProject) BEFORE the rank
    window, so the only unpartitioned window runs over 20 rows; the
    (ts, event_id) tie-break and (count, path) rank order keep both
    engines' top-20 identical.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = table(spark, sf_dir, "events").select(
        F.col("event_type").alias("t0"),
        F.lead("event_type", 1).over(w).alias("t1"),
        F.lead("event_type", 2).over(w).alias("t2"),
    )
    trigrams = (
        steps.filter(F.col("t2").isNotNull())
        .select(F.concat_ws(">", "t0", "t1", "t2").alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rk = Window.orderBy(F.col("n").desc(), F.col("path"))
    return (
        trigrams.orderBy(F.col("n").desc(), F.col("path"))
        .limit(20)
        .select("path", "n", F.row_number().over(rk).alias("rk"))
    )


@query(
    "events_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    grouped AS (
      SELECT user_id, day,
             day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
                        AS INTEGER) AS grp
      FROM days
    ),
    streaks AS (
      SELECT user_id, COUNT(*) AS streak_len, MIN(day) AS streak_start
      FROM grouped GROUP BY user_id, grp
    ),
    best AS (
      SELECT user_id, streak_len, streak_start,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY streak_len DESC, streak_start ASC) AS rn
      FROM streaks
    )
    SELECT user_id, streak_len AS longest_streak,
           CAST(streak_start AS VARCHAR) AS streak_start
    FROM best WHERE rn = 1
    """,
)
def events_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user — the
    gaps-and-islands pattern (day minus dense row number is constant
    within a run of consecutive days), the standard engagement metric.

    Distinct (user, day) first — map-side combinable, collapses the
    event volume to at most users × days rows before any window — then
    one partitioned window and two group-bys, all sharing the user_id
    partitioning (single exchange; the window and both aggregations
    reuse it). No self-join, no iteration: O(n log n) per user
    partition at any scale.
    """
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    days = ev.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    grouped = days.withColumn(
        "grp", F.date_sub(F.col("day"), F.row_number().over(w))
    )
    streaks = grouped.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("streak_len"),
        F.min("day").alias("streak_start"),
    )
    best = Window.partitionBy("user_id").orderBy(
        F.desc("streak_len"), F.asc("streak_start")
    )
    return (
        streaks.withColumn("rn", F.row_number().over(best))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("streak_len").alias("longest_streak"),
            F.col("streak_start").cast("string").alias("streak_start"),
        )
    )


@query(
    "events_funnel_window",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t_view
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click'
        AND e.ts > v.t_view AND e.ts <= v.t_view + INTERVAL 24 HOUR
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase'
        AND e.ts > c.t_click AND e.ts <= c.t_click + INTERVAL 24 HOUR
      GROUP BY e.user_id
    )
    SELECT
      CASE WHEN p.user_id IS NOT NULL THEN 3
           WHEN c.user_id IS NOT NULL THEN 2
           ELSE 1 END AS funnel_depth,
      COUNT(*) AS n_users
    FROM v LEFT JOIN c ON v.user_id = c.user_id
           LEFT JOIN p ON v.user_id = p.user_id
    GROUP BY 1
    """,
)
def events_funnel_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timed conversion funnel (windowFunnel semantics): view → click
    within 24 h → purchase within 24 h of that click; users counted
    at their deepest reached stage. Unlike ``events_funnel`` the steps
    must happen within a conversion window of the PREVIOUS step (24 h here — sized so the sparse fixture populates every stage), not
    just in order — the attribution metric product analytics actually
    reports.

    Each stage is one conditional MIN aggregation joined against the
    previous stage's anchor time — three aggs and two joins, all keyed
    on user_id, so the whole funnel runs inside one partitioning (no
    per-user sort, no sequential scan). Stage tables only shrink, so
    later joins get cheaper; at 100 TB each stage's anchor table is a
    fraction of users and broadcast-eligible once small enough.
    """
    ev = table(spark, sf_dir, "events")
    win = F.expr("INTERVAL 24 HOURS")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("ts") > F.col("t_view")) & (F.col("ts") <= F.col("t_view") + win)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("ts") > F.col("t_click")) & (F.col("ts") <= F.col("t_click") + win)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    depth = (
        v.join(c.select("user_id", F.lit(1).alias("has_c")), "user_id", "left")
        .join(p.select("user_id", F.lit(1).alias("has_p")), "user_id", "left")
        .select(
            F.when(F.col("has_p").isNotNull(), F.lit(3))
            .when(F.col("has_c").isNotNull(), F.lit(2))
            .otherwise(F.lit(1))
            .alias("funnel_depth")
        )
    )
    return depth.groupBy("funnel_depth").agg(F.count(F.lit(1)).alias("n_users"))


@query(
    "events_ab_ttest",
    oracle="""
    WITH stats AS (
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(value AS DECIMAL(18,6))
                      * CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sxx
      FROM events WHERE event_type IN ('click', 'purchase')
      GROUP BY event_type
    ),
    m AS (
      SELECT event_type, n, sx / n AS mean,
             (sxx - sx * sx / n) / (n - 1) AS var
      FROM stats
    )
    SELECT a.n AS n_a, b.n AS n_b,
           (CAST(floor(a.mean * 10000) AS DOUBLE) / 10000) AS mean_a,
           (CAST(floor(b.mean * 10000) AS DOUBLE) / 10000) AS mean_b,
           (CAST(floor(
              (a.mean - b.mean) / sqrt(a.var / a.n + b.var / b.n) * 10000
            ) AS DOUBLE) / 10000) AS welch_t
    FROM m a JOIN m b ON a.event_type = 'click' AND b.event_type = 'purchase'
    """,
)
def events_ab_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's t statistic between two event cohorts (click vs purchase
    values) — the A/B-test significance primitive, computed from
    sufficient statistics only.

    One scan → per-group (n, Σx, Σx²) — decimal sums so the moments are
    order-exact across partitionings and engines — then the t statistic
    is pure scalar math on a two-row table. This is THE pattern for
    statistics at 100 TB: never a second pass for the variance, never a
    driver-side collect of raw values; any test statistic derivable
    from mergeable moments aggregates map-side.
    """
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    dec = F.col("value").cast("decimal(18,6)")
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec).cast("double").alias("sx"),
        F.sum(dec * dec).cast("double").alias("sxx"),
    )
    m = stats.select(
        "event_type",
        "n",
        (F.col("sx") / F.col("n")).alias("mean"),
        (
            (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("var"),
    )
    a = m.filter(F.col("event_type") == "click").alias("a")
    b = m.filter(F.col("event_type") == "purchase").alias("b")
    return a.crossJoin(b).select(
        F.col("a.n").alias("n_a"),
        F.col("b.n").alias("n_b"),
        trunc_digits(F.col("a.mean"), 4).alias("mean_a"),
        trunc_digits(F.col("b.mean"), 4).alias("mean_b"),
        trunc_digits(
            (F.col("a.mean") - F.col("b.mean"))
            / F.sqrt(F.col("a.var") / F.col("a.n") + F.col("b.var") / F.col("b.n")),
            4,
        ).alias("welch_t"),
    )


@query(
    "window_session_native",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             -- session_window is half-open [start, last+gap): an event at
             -- exactly last+gap starts a NEW session, hence >= not >
             CASE WHEN LAG(ts) OVER w IS NULL
                  OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    numbered AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts) + INTERVAL 30 MINUTE,
                    '%Y-%m-%d %H:%M:%S') AS session_end,
           COUNT(*) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE), 2)
             AS session_value
    FROM numbered
    GROUP BY user_id, session_id
    """,
)
def window_session_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows via the NATIVE ``session_window`` aggregation —
    Spark's built-in merging session operator (the same operator the
    streaming engine uses), in batch mode: one groupBy, sessions merged
    inside the aggregation, no window-function stack at all.

    Contrast with ``window_session`` (the lag/running-sum formulation,
    two stacked windows): the native operator needs only the groupBy
    shuffle and merges overlapping [ts, ts+gap) intervals as aggregate
    state — fewer sorts at scale, and the session END comes out as
    last_event + gap by definition (mirrored in the oracle).
    """
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("sw"), F.col("user_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(money(F.col("value"))).cast("double"), 2).alias(
                "session_value"
            ),
        )
        .select(
            "user_id",
            F.date_format("sw.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("sw.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


@query(
    "events_sequence_pattern",
    oracle="""
    WITH seqs AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
               AS seq
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           len(seq) AS n_events,
           len(seq) - len(regexp_replace(seq, 'vc*p', '', 'g'))
             AS matched_len,
           (len(seq) - len(regexp_replace(seq, 'vc*p', '', 'g')) > 0)
             AS converted
    FROM seqs
    """,
)
def events_sequence_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern matching over event streams (MATCH_RECOGNIZE
    lite): each user's ordered event types collapse to a symbol string
    and a regex finds behavioural motifs — here ``v c* p`` (a view,
    any clicks, then a purchase, with no other event between). The
    trick that turns sequential pattern queries into one aggregation
    plus codegen'd regex — no self-joins, no UDAF, no per-user loop.

    The symbol string is per-user bounded (sessions/day-slices at real
    scale) and built with an ORDER-deterministic aggregation; matched
    character mass comes from length-delta after regex removal — all
    engine-exact operations.
    """
    ev = table(spark, sf_dir, "events")
    seqs = ev.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("ts", "event_id", F.substring("event_type", 1, 1).alias("s"))
                    )
                ),
                lambda r: r.getField("s"),
            ),
            "",
        ).alias("seq")
    )
    matched = F.length("seq") - F.length(F.regexp_replace("seq", "vc*p", ""))
    return seqs.select(
        "user_id",
        F.length("seq").cast("long").alias("n_events"),
        matched.cast("long").alias("matched_len"),
        (matched > 0).alias("converted"),
    )


@query(
    "events_decay_score",
    oracle="""
    WITH anchor AS (SELECT MAX(ts) AS now_ts FROM events),
    terms AS (
      SELECT e.user_id,
             CAST(floor(e.value * pow(2.0,
                    -(CAST(epoch_us(a.now_ts) - epoch_us(e.ts) AS DOUBLE)
                      / 86400000000.0) / 7.0) * 1000000) AS BIGINT)
               AS term_micro
      FROM events e CROSS JOIN anchor a
    )
    SELECT user_id,
           CAST(SUM(term_micro) AS BIGINT) AS score_micro,
           COUNT(*) AS n_events
    FROM terms GROUP BY user_id
    """,
)
def events_decay_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted engagement score: each event contributes
    value·2^(−age/half-life) with a 7-day half-life — the standard
    freshness-decayed ranking signal (recommendations, lead scoring,
    trending feeds).

    Deliberately the NON-recursive decay form: every term depends only
    on its own row plus one corpus-wide anchor (MAX(ts), a one-row
    broadcast), so the score is a plain SUM — map-side combinable,
    order-independent, no sequential scan per user (recursive EWMA
    needs one; this formulation is why production scoring pipelines
    prefer wall-clock decay). Terms are floor-quantized to integer
    micro-units before summing, so the aggregate is exact and
    engine/partitioning-invariant despite the float pow().
    """
    ev = table(spark, sf_dir, "events")
    anchor = ev.agg(F.max("ts").alias("now_ts"))
    age_days = (
        F.unix_micros(F.col("now_ts")) - F.unix_micros(F.col("ts"))
    ).cast("double") / 86_400_000_000.0
    term = F.floor(
        F.col("value") * F.pow(F.lit(2.0), -age_days / 7.0) * 1_000_000
    ).cast("bigint")
    return (
        ev.crossJoin(F.broadcast(anchor))
        .select("user_id", term.alias("term_micro"))
        .groupBy("user_id")
        .agg(
            F.sum("term_micro").alias("score_micro"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@query(
    "events_interval_coverage",
    oracle="""
    WITH iv AS (
      SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + 600000000 AS e
      FROM events
    ),
    marked AS (
      SELECT user_id, s, e,
             CASE WHEN MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) IS NULL
                    OR s > MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS new_island
      FROM iv
    ),
    islands AS (
      SELECT user_id, s, e,
             SUM(new_island) OVER (PARTITION BY user_id ORDER BY s, e
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS island
      FROM marked
    ),
    merged AS (
      SELECT user_id, island, MIN(s) AS ms, MAX(e) AS me
      FROM islands GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_active_periods,
           CAST(SUM(me - ms) // 1000000 AS BIGINT) AS covered_seconds
    FROM merged GROUP BY user_id
    """,
)
def events_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-union coverage: each event opens a 10-minute activity
    interval; overlapping intervals merge and the output is each
    user's number of distinct active periods and total covered time —
    the uptime/presence metric (machine activity, meeting coverage,
    sensor liveness) that naive SUM-of-durations double-counts.

    Gaps-and-islands over intervals: a running MAX of interval ends
    (one window), island ids from a running sum of fresh-start flags
    (same exchange), then two stacked aggregations on the same key.
    All integer epoch arithmetic — exact in both engines; one shuffle
    on user_id total.
    """
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + 600_000_000).alias("e"),
    )
    wo = Window.partitionBy("user_id").orderBy("s", "e")
    prior_max = F.max("e").over(
        wo.rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = iv.withColumn(
        "new_island",
        F.when(prior_max.isNull() | (F.col("s") > prior_max), 1).otherwise(0),
    )
    islands = marked.withColumn(
        "island",
        F.sum("new_island").over(wo.rowsBetween(Window.unboundedPreceding, 0)),
    )
    merged = islands.groupBy("user_id", "island").agg(
        F.min("s").alias("ms"), F.max("e").alias("me")
    )
    return merged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_active_periods"),
        F.expr("sum(me - ms) div 1000000").alias("covered_seconds"),
    )


@query(
    "events_dau_wau",
    oracle="""
    WITH day_users AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    days AS (SELECT DISTINCT day FROM day_users),
    dau AS (
      SELECT day, COUNT(*) AS dau FROM day_users GROUP BY day
    ),
    wau AS (
      SELECT d.day, COUNT(DISTINCT u.user_id) AS wau
      FROM days d JOIN day_users u
        ON u.day BETWEEN d.day - 6 AND d.day
      GROUP BY d.day
    )
    SELECT CAST(dau.day AS VARCHAR) AS day, dau.dau, wau.wau,
           (CAST(floor(CAST(dau.dau AS DOUBLE) / wau.wau * 10000) AS DOUBLE)
             / 10000) AS stickiness
    FROM dau JOIN wau ON dau.day = wau.day
    """,
)
def events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU / stickiness per day — the engagement
    ratio every product dashboard leads with, and a COUNT(DISTINCT)
    over a sliding window, which no window function computes directly
    (distinct state can't live in a frame buffer).

    The scalable shape: collapse events to distinct (day, user) first
    — the only pass over raw data, map-side combinable — then the
    7-day window is a bounded range join against the day spine
    (|days| × window fan-out, calendar-sized, broadcast-eligible)
    followed by an ordinary distinct count. Raw events are never
    joined or windowed.
    """
    ev = table(spark, sf_dir, "events")
    day_users = ev.select(
        F.col("ts").cast("date").alias("day"), "user_id"
    ).distinct()
    days = day_users.select("day").distinct()
    dau = day_users.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    wau = (
        days.alias("d")
        .join(
            day_users.alias("u"),
            F.col("u.day").between(F.date_sub(F.col("d.day"), 6), F.col("d.day")),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.countDistinct("u.user_id").alias("wau"))
    )
    return dau.join(wau, "day").select(
        F.col("day").cast("string").alias("day"),
        "dau",
        "wau",
        trunc_digits(F.col("dau").cast("double") / F.col("wau"), 4).alias(
            "stickiness"
        ),
    )


@query(
    "events_type_entropy",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY user_id, event_type
    ), t AS (
      SELECT user_id, CAST(SUM(cnt) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS n_types
      FROM c GROUP BY user_id
    ), terms AS (
      SELECT c.user_id, t.total, t.n_types,
             CAST((CAST(floor(-(CAST(c.cnt AS DOUBLE) / t.total)
                    * ln(CAST(c.cnt AS DOUBLE) / t.total) * 1000000)
                    AS DOUBLE) / 1000000) AS DECIMAL(18,6)) AS term
      FROM c JOIN t USING (user_id)
    )
    SELECT user_id, n_types, total AS n_events,
           CAST(SUM(term) AS DOUBLE) AS entropy_nats
    FROM terms
    GROUP BY user_id, n_types, total
    """,
)
def events_type_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type mix — the behavioral
    diversity screen (a bot replaying one action scores 0; a uniform
    5-type mix scores ln 5 ≈ 1.609).

    Two map-side-combinable aggregations (counts per (user, type),
    totals per user) and one projection per term; each −p·ln p term is
    truncated to 6 digits and summed as DECIMAL so the ≤5-term
    addition order can't flip the hash — the same cross-engine pattern
    as the PSI and bigram-LM scores. No windows, no joins beyond the
    user-keyed rejoin; at 100 TB both aggs partial-combine before the
    one shuffle.
    """
    c = (
        table(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    t = c.groupBy("user_id").agg(
        F.sum("cnt").cast("bigint").alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
    )
    p = F.col("cnt").cast("double") / F.col("total")
    terms = c.join(t, "user_id").select(
        "user_id",
        "total",
        "n_types",
        trunc_digits(-p * F.log(p), 6).cast("decimal(18,6)").alias("term"),
    )
    return terms.groupBy("user_id", "n_types", "total").agg(
        F.sum("term").cast("double").alias("entropy_nats")
    ).select(
        "user_id",
        "n_types",
        F.col("total").alias("n_events"),
        "entropy_nats",
    )


@query(
    "events_value_concentration",
    oracle="""
    WITH per_user AS (
      SELECT user_id, CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS x
      FROM events GROUP BY user_id
    ), ranked AS (
      SELECT x,
             ROW_NUMBER() OVER (ORDER BY x DESC, user_id) AS rn,
             SUM(x) OVER (ORDER BY x DESC, user_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cx
      FROM per_user
    ), tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s
      FROM per_user
    )
    SELECT tot.n AS n_users,
           CAST(MIN(CASE WHEN cx * 5 >= tot.s * 4 THEN rn END) AS BIGINT)
             AS users_for_80pct,
           (CAST(floor(CAST(MIN(CASE WHEN cx * 5 >= tot.s * 4 THEN rn END)
              AS DOUBLE) / tot.n * 10000) AS DOUBLE) / 10000)
             AS share_of_users,
           (CAST(floor(CAST(2 * SUM((tot.n - rn + 1) * x) - (tot.n + 1) * tot.s
              AS DOUBLE) / (tot.n * tot.s) * 1000000) AS DOUBLE) / 1000000)
             AS gini
    FROM ranked, tot
    GROUP BY tot.n, tot.s
    """,
)
def events_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-concentration profile of the user base: how few users
    produce 80% of total event value (the Pareto point) plus the exact
    Gini coefficient — the two numbers behind every whale-risk /
    concentration dashboard.

    All in exact integers until the final divisions: per-user totals
    in cents, one descending rank + running sum over the per-user
    AGGREGATE (user-count-sized, never raw events), the 80% crossing
    by integer cross-multiplication (cx·5 ≥ s·4), and Gini from the
    rank identity G = (2·Σ iₐ·xₐ − (n+1)·Σx)/(n·Σx) using ascending
    index iₐ = n − rn + 1 — no second sort. The one-row (n, s) totals
    ride a broadcast. User-cardinality is unbounded, so the global
    rank + running sum use the two-pass distributed form
    (``global_rank``: range-partitioned local windows + broadcast
    per-partition offsets) — no stage ever holds more than one
    partition's users.
    """
    per_user = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("x")
        )
    )
    ranked = global_rank(
        per_user,
        [F.col("x").desc(), F.col("user_id")],
        rn="rn",
        cumsums={"cx": F.col("x")},
    ).select("x", "rn", "cx")
    tot = per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
    )
    j = ranked.crossJoin(F.broadcast(tot))
    eighty = F.min(
        F.when(F.col("cx") * 5 >= F.col("s") * 4, F.col("rn"))
    )
    gini_num = 2 * F.sum(
        (F.col("n") - F.col("rn") + 1) * F.col("x")
    ) - (F.col("n") + 1) * F.col("s")
    return j.groupBy("n", "s").agg(
        eighty.cast("bigint").alias("users_for_80pct"),
        trunc_digits(eighty.cast("double") / F.col("n"), 4).alias(
            "share_of_users"
        ),
        trunc_digits(
            gini_num.cast("double") / (F.col("n") * F.col("s")), 6
        ).alias("gini"),
    ).select(
        F.col("n").alias("n_users"),
        "users_for_80pct",
        "share_of_users",
        "gini",
    )


@query(
    "events_attribution_last_touch",
    oracle="""
    WITH carried AS (
      SELECT event_id, event_type, value,
             LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS channel
      FROM events
    )
    SELECT COALESCE(channel, 'direct') AS channel,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE), 2)
             AS attributed_value
    FROM carried
    WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credits the user's most
    recent preceding non-purchase event type (its "channel"); purchases
    with no prior touch credit 'direct'. The output is the per-channel
    conversion census — count and exact-decimal attributed value.

    The carry is ONE window pass (last_value ignore-nulls over an
    unbounded-preceding-to-1-preceding frame — the same scalable as-of
    formulation as `join_asof_event`, never a join+filter), then a
    tiny channel-keyed aggregate. One user_id exchange total; at
    100 TB attribution over a year of events is exactly this plan with
    more splits.
    """
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = ev.select(
        "event_type",
        "value",
        F.last(
            F.when(F.col("event_type") != "purchase", F.col("event_type")),
            ignorenulls=True,
        )
        .over(w)
        .alias("channel"),
    )
    return (
        carried.filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("channel", F.lit("direct")).alias("channel"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            F.round(
                F.sum(F.col("value").cast("decimal(12,2)")).cast("double"), 2
            ).alias("attributed_value"),
        )
    )


@query(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ), pairs AS (
      SELECT prev_type, event_type, COUNT(*) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    )
    SELECT prev_type, event_type, n,
           CAST(floor(CAST(n AS DOUBLE)
                / SUM(n) OVER (PARTITION BY prev_type) * 10000) AS DOUBLE)
             / 10000 AS prob
    FROM pairs
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams.

    The behavioral-model primitive downstream of sessionization: for
    each observed (previous event type → event type) pair, the count
    and the row-normalized transition probability. Feeds next-event
    prediction, anomaly scoring (improbable transitions), and synthetic
    journey generation.

    Scale: one window shuffle keyed by user_id (the natural event-log
    partitioning) produces the lag pairs; the matrix itself is
    |types|² rows — tiny — so the normalizing window over prev_type is
    over an already-aggregated frame, not the raw log. No driver-side
    state; probability division is the only double op, truncated to 4
    digits for cross-engine determinism.
    """
    seq = table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.lag("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("prev_type"),
    )
    pairs = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wnorm = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "event_type",
        "n",
        trunc_digits(
            F.col("n").cast("double") / F.sum("n").over(wnorm), 4
        ).alias("prob"),
    )


@query(
    "events_survival_km",
    oracle="""
    WITH days AS (
      SELECT user_id,
             date_diff('hour', TIMESTAMP '1970-01-01', ts) AS d
      FROM events
    ), u AS (
      SELECT user_id, MIN(d) AS f, MAX(d) AS l FROM days GROUP BY user_id
    ), endd AS (
      SELECT MAX(d) AS maxd FROM days
    ), u2 AS (
      SELECT l - f AS dur, CAST(l < maxd AS INT) AS died FROM u, endd
    ), dt AS (
      SELECT dur, CAST(COUNT(*) AS BIGINT) AS n_end,
             CAST(SUM(died) AS BIGINT) AS d
      FROM u2 GROUP BY dur
    ), r AS (
      SELECT dur, d,
             CAST(SUM(n_end) OVER (ORDER BY dur DESC) AS BIGINT) AS n_risk
      FROM dt
    ), f AS (
      SELECT dur, n_risk, d,
             CAST(n_risk - d AS DOUBLE) / n_risk AS factor
      FROM r
    ), arr AS (
      SELECT list(dur ORDER BY dur) AS durs,
             list(n_risk ORDER BY dur) AS nrisks,
             list(d ORDER BY dur) AS ds,
             list(factor ORDER BY dur) AS fl
      FROM f
    )
    SELECT durs[k] AS dur, nrisks[k] AS n_risk, ds[k] AS d,
           CAST(floor(list_aggregate(fl[1:k], 'product') * 1000000)
                AS DOUBLE) / 1000000 AS survival
    FROM arr, unnest(range(1, len(durs) + 1)) t(k)
    """,
)
def events_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve over user lifetimes.

    Lifetime = hours between a user's first and last event; users
    still active at the final observed hour are CENSORED, not deaths — the
    estimator's whole point, and what a naive retention ratio gets
    wrong. S(t) = Π_{j≤t} (n_j − d_j)/n_j over the at-risk counts.

    Determinism: the running product of doubles is order-sensitive, so
    both engines fold the per-duration factors in the SAME explicit
    ascending order (an ordered-array aggregate, not a distributed
    product) — IEEE multiplication then yields bit-identical curves,
    truncated to 6 digits.

    Scale: everything after the per-user min/max aggregation operates
    on ≤ |distinct durations| rows (the observation window in days) —
    the global suffix-sum window and the array fold are metadata-sized.
    The one-row MAX(day) anchor is a broadcast (allowlisted BNLJ).
    """
    hour = F.floor(F.unix_micros("ts") / 3_600_000_000)
    days = table(spark, sf_dir, "events").select(
        "user_id", hour.alias("d")
    )
    u = days.groupBy("user_id").agg(
        F.min("d").alias("f"), F.max("d").alias("l")
    )
    endd = days.agg(F.max("d").alias("maxd"))
    u2 = u.crossJoin(F.broadcast(endd)).select(
        (F.col("l") - F.col("f")).alias("dur"),
        (F.col("l") < F.col("maxd")).cast("int").alias("died"),
    )
    dt = u2.groupBy("dur").agg(
        F.count(F.lit(1)).alias("n_end"),
        F.sum("died").alias("d"),
    )
    w = (
        Window.orderBy(F.col("dur").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    f = dt.select(
        "dur",
        "d",
        F.sum("n_end").over(w).alias("n_risk"),
    ).select(
        "dur",
        "n_risk",
        "d",
        (
            (F.col("n_risk") - F.col("d")).cast("double") / F.col("n_risk")
        ).alias("factor"),
    )
    arr = f.agg(
        F.array_sort(
            F.collect_list(F.struct("dur", "n_risk", "d", "factor"))
        ).alias("a")
    )
    k = F.explode(F.sequence(F.lit(1), F.size("a"))).alias("k")
    out = arr.select("a", k)
    # r13 fold sweep: stays a fold — the array is the collect_list of
    # DISTINCT event durations (group-sized, one aggregated row), so
    # the k x k interpreted product is bounded by duration cardinality,
    # not event volume.
    surv = F.aggregate(
        F.slice("a", F.lit(1), F.col("k")),
        F.lit(1.0),
        lambda acc, s: acc * s.getField("factor"),
    )
    return out.select(
        F.element_at("a", F.col("k")).getField("dur").alias("dur"),
        F.element_at("a", F.col("k")).getField("n_risk").alias("n_risk"),
        F.element_at("a", F.col("k")).getField("d").alias("d"),
        (F.floor(surv * 1_000_000).cast("double") / 1_000_000).alias(
            "survival"
        ),
    )


@query(
    "events_forecast_snaive",
    oracle="""
    WITH hourly AS (
      SELECT event_type,
             CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS h,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
      FROM events GROUP BY event_type, floor(epoch_us(ts) / 3600000000)
    ), bounds AS (
      SELECT MAX(h) AS hmax FROM hourly
    ), test AS (
      SELECT a.event_type, a.h, a.v AS actual, f.v AS forecast
      FROM hourly a
      JOIN hourly f ON f.event_type = a.event_type
                   AND f.h = a.h - 168
      CROSS JOIN bounds b
      WHERE a.h > b.hmax - 168
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_hours,
           CAST(floor(CAST(SUM(abs(actual - forecast)) AS DOUBLE)
                / SUM(actual) * 10000) AS DOUBLE) / 10000 AS wape,
           CAST(floor(CAST(SUM(CAST(floor(CAST(abs(actual - forecast)
                      AS DOUBLE) / actual * 1000000) AS BIGINT))
                      AS DOUBLE) / COUNT(*) / 1000000 * 10000)
                AS DOUBLE) / 10000 AS mape
    FROM test
    WHERE actual > 0
    GROUP BY event_type
    """,
)
def events_forecast_snaive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each of the last 168
    hours as the same hour one week earlier, and score WAPE and MAPE
    per event type.

    The baseline every production forecaster must beat — if a model
    can't out-predict "same hour last week", it ships nothing. The
    backtest join is the forecast: hourly actuals self-joined at lag
    168 on (type, hour), restricted to the final week.

    Determinism: actuals are exact integer cents sums; WAPE is a ratio
    of two exact integer sums (one truncated division). MAPE needs a
    mean of per-hour ratios, so each ratio is truncated to 6 digits
    FIRST (an exact decimal), summed as exact integers, then divided —
    the truncate-then-sum pattern that keeps double addition order out
    of the aggregate.

    Scale: one hourly rollup (map-side combinable), a self-join on the
    (type, hour) key — co-partitioned, no window — and a per-type
    census. Lag and horizon are constants; the plan is flat at any
    history length.
    """
    hourly = (
        table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.floor(F.unix_micros("ts") / 3_600_000_000).alias("h"),
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("v")
        )
    )
    bounds = hourly.agg(F.max("h").alias("hmax"))
    a = hourly.select(
        "event_type", "h", F.col("v").alias("actual")
    )
    fc = hourly.select(
        F.col("event_type").alias("f_type"),
        (F.col("h") + 168).alias("f_h"),
        F.col("v").alias("forecast"),
    )
    test = (
        a.join(
            fc,
            (F.col("event_type") == F.col("f_type"))
            & (F.col("h") == F.col("f_h")),
        )
        .crossJoin(F.broadcast(bounds))
        .filter((F.col("h") > F.col("hmax") - 168) & (F.col("actual") > 0))
    )
    ape_fx = F.floor(
        F.abs(F.col("actual") - F.col("forecast")).cast("double")
        / F.col("actual")
        * 1_000_000
    ).cast("bigint")
    return test.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours"),
        trunc_digits(
            F.sum(F.abs(F.col("actual") - F.col("forecast"))).cast("double")
            / F.sum("actual"),
            4,
        ).alias("wape"),
        trunc_digits(
            F.sum(ape_fx).cast("double") / F.count(F.lit(1)) / 1_000_000,
            4,
        ).alias("mape"),
    )


@query(
    "events_peak_concurrency",
    oracle="""
    WITH deltas AS (
      SELECT event_type, epoch_us(ts) AS t, 1 AS d FROM events
      UNION ALL
      SELECT event_type, epoch_us(ts) + 600000000, -1 FROM events
    ), running AS (
      SELECT event_type, t, d,
             CAST(SUM(d) OVER (PARTITION BY event_type
                               ORDER BY t, d DESC
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS BIGINT) AS live
      FROM deltas
    )
    SELECT event_type,
           CAST(MAX(live) AS BIGINT) AS peak_concurrent
    FROM running GROUP BY event_type
    """,
)
def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency per event type: the maximum number of
    10-minute activity intervals live at any instant — the classic
    +1/−1 boundary sweep (capacity planning's first question: how many
    sessions must the system hold AT ONCE, which no per-window count
    answers because windows chop concurrent intervals apart).

    Tie rule pinned on both engines: at equal timestamps the +1 sorts
    before the −1 (ORDER BY t, d DESC), so an interval ending exactly
    when another starts counts as overlapping — the inclusive
    convention, deterministic under ties.

    Scale: the sweep partitions by event_type and sorts each key's
    boundaries once — one shuffle; interval_coverage's merge logic and
    this peak share the same boundary stream at 100 TB.
    """
    us = F.unix_micros(F.col("ts"))
    ev = table(spark, sf_dir, "events")
    deltas = ev.select(
        "event_type", us.alias("t"), F.lit(1).alias("d")
    ).unionByName(
        ev.select(
            "event_type",
            (us + 600_000_000).alias("t"),
            F.lit(-1).alias("d"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.col("t"), F.col("d").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        deltas.select("event_type", F.sum("d").over(w).alias("live"))
        .groupBy("event_type")
        .agg(F.max("live").cast("bigint").alias("peak_concurrent"))
    )
