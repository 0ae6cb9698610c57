"""§2.B.5 — window functions.

All windows partition by a key, so at scale each executor sorts only its
key's rows (one shuffle on the partition key, then in-partition sort).
Running money sums use exact decimals so frame-order FP effects cannot
diverge from the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tpctools_spark.catalog import table
from tpctools_spark.queries._util import money, trunc_digits
from tpctools_spark.registry import query


@query(
    "window_rank_topn",
    oracle="""
    SELECT c_nationkey, c_custkey, ROUND(c_acctbal, 2) AS acctbal, rn
    FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    ) WHERE rn <= 3
    """,
)
def window_rank_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by balance per nation — rank-and-filter.

    Spark pushes the ``rn <= 3`` filter into the window via a group-limit
    optimization (WindowGroupLimit), so each partition keeps only 3 rows
    before the final projection. Ties broken by c_custkey (unique).
    """
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        table(spark, sf_dir, "customer")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "c_nationkey",
            "c_custkey",
            F.round("c_acctbal", 2).alias("acctbal"),
            "rn",
        )
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                 OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2)
             AS running_total
    FROM orders
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running order total (TPC-DS Q51 shape)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum(money(F.col("o_totalprice"))).over(w).cast("double"), 2).alias(
            "running_total"
        ),
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           date_diff('day',
                     CAST(LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                                 ORDER BY o_orderdate, o_orderkey) AS DATE),
                     CAST(o_orderdate AS DATE)) AS days_since_prev,
           CAST(LEAD(o_orderkey) OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey) AS BIGINT)
             AS next_orderkey
    FROM orders
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics: days between consecutive orders per customer."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    od = F.col("o_orderdate").cast("date")
    return table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.datediff(od, F.lag(od).over(w)).cast("bigint").alias("days_since_prev"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT event_id, user_id,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(12,2)))
                 OVER (PARTITION BY user_id ORDER BY ts
                       RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
                 AS DOUBLE), 2) AS rolling_1h_value
    FROM events
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame moving aggregate: per-user trailing 1-hour value sum.

    Spark range frames need a numeric sort key, so the frame is expressed
    over epoch microseconds — semantically identical to the oracle's
    ``RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW`` (both
    ends inclusive; ties share a frame, so no tiebreaker is needed).
    """
    hour_us = 3600 * 1_000_000
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-hour_us, 0)
    )
    return table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.round(F.sum(money(F.col("value"))).over(w).cast("double"), 2).alias(
            "rolling_1h_value"
        ),
    )


@query(
    "window_ntile_pctrank",
    oracle="""
    SELECT o_orderkey,
           NTILE(4) OVER w AS quartile,
           PERCENT_RANK() OVER w AS pct_rank
    FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice > 400000
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def window_ntile_pctrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile + percent_rank quartiles of big finalized orders.

    The order-by includes the unique orderkey so ranks are total —
    without it ties would make ntile assignment engine-dependent.
    percent_rank is (rank−1)/(n−1): an IEEE division of two small ints,
    bit-identical across engines, so no truncation is needed.
    """
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 400000)
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
    )


@query(
    "window_first_last",
    oracle="""
    SELECT event_id, user_id,
           FIRST_VALUE(event_type) OVER w AS first_type,
           LAST_VALUE(event_type) OVER w AS last_type,
           NTH_VALUE(event_type, 2) OVER w AS second_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth event type per user against every event row.

    The frame matters: LAST_VALUE under the default frame (unbounded
    preceding → current row) degenerates to the current row, so the
    frame is pinned to the full partition on both sides. Ordering
    includes the unique event_id, making all three picks deterministic.
    """
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("last_type"),
        F.nth_value("event_type", 2).over(w).alias("second_type"),
    )


@query(
    "window_running_distinct",
    oracle="""
    SELECT event_id, event_type,
           COUNT(DISTINCT user_id) OVER (
             PARTITION BY event_type ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS distinct_users
    FROM events
    """,
)
def window_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) over an ordered window — which Spark's
    window functions don't support directly — via the scale-correct
    first-occurrence-marker rewrite.

    A user counts toward the running total exactly once: at their first
    event within the partition. So mark first occurrences with
    ``row_number() == 1`` over (event_type, user_id), then running-SUM
    the 0/1 markers over the event order. Two window passes with
    bounded per-row state — the naive ``size(collect_set() OVER ...)``
    alternative carries the full distinct set in every row's frame and
    dies at scale. DuckDB runs its native COUNT(DISTINCT ...) OVER with
    an identical ROWS frame as the oracle; the deterministic
    (ts, event_id) tie-break keeps frames identical across engines.
    """
    ev = table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id", "ts"
    )
    first_seen = Window.partitionBy("event_type", "user_id").orderBy(
        "ts", "event_id"
    )
    running = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = ev.select(
        "event_id",
        "event_type",
        "ts",
        F.when(F.row_number().over(first_seen) == 1, 1).otherwise(0).alias("m"),
    )
    return marked.select(
        "event_id",
        "event_type",
        F.sum("m").over(running).cast("bigint").alias("distinct_users"),
    )


@query(
    "window_rolling_median",
    oracle="""
    SELECT event_id, user_id,
           (CAST(floor(quantile_cont(value, 0.5) OVER (
              PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) * 100) AS DOUBLE)
            / 100) AS med5
    FROM events
    """,
)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling median over each user's last five events — the
    robust smoother that a mean-based rolling window can't give you
    (one spiked value drags a mean for the whole frame; the median
    shrugs it off).

    ``percentile`` runs as a true window aggregate over a ROWS frame
    (fully ordered by (ts, event_id), so frame membership is
    deterministic under ties); Spark's interpolated ``percentile`` is
    bit-equal to DuckDB's ``quantile_cont`` — same interpolation, same
    IEEE ops — the equivalence `quality_outlier_iqr` already relies
    on. One user_id exchange, frame state bounded at 5 rows per
    position: the plan a time-series store would pick.
    """
    from tpctools_spark.queries._util import trunc_digits

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, 0)
    )
    return table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        trunc_digits(F.expr("percentile(value, 0.5)").over(w), 2).alias(
            "med5"
        ),
    )


@query(
    "window_ewma",
    oracle="""
    WITH lagged AS (
      SELECT event_id, user_id,
             CAST(value AS DECIMAL(12,2)) AS x0,
             CAST(LAG(value, 1) OVER w AS DECIMAL(12,2)) AS x1,
             CAST(LAG(value, 2) OVER w AS DECIMAL(12,2)) AS x2,
             CAST(LAG(value, 3) OVER w AS DECIMAL(12,2)) AS x3,
             CAST(LAG(value, 4) OVER w AS DECIMAL(12,2)) AS x4
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_id, user_id,
           CAST(floor(
                 CAST(COALESCE(x0 * CAST(1.0 AS DECIMAL(6,4)), 0)
                + COALESCE(x1 * CAST(0.5 AS DECIMAL(6,4)), 0)
                + COALESCE(x2 * CAST(0.25 AS DECIMAL(6,4)), 0)
                + COALESCE(x3 * CAST(0.125 AS DECIMAL(6,4)), 0)
                + COALESCE(x4 * CAST(0.0625 AS DECIMAL(6,4)), 0) AS DOUBLE)
               / CAST(CASE WHEN x0 IS NULL THEN 0 ELSE CAST(1.0 AS DECIMAL(6,4)) END
                + CASE WHEN x1 IS NULL THEN 0 ELSE CAST(0.5 AS DECIMAL(6,4)) END
                + CASE WHEN x2 IS NULL THEN 0 ELSE CAST(0.25 AS DECIMAL(6,4)) END
                + CASE WHEN x3 IS NULL THEN 0 ELSE CAST(0.125 AS DECIMAL(6,4)) END
                + CASE WHEN x4 IS NULL THEN 0 ELSE CAST(0.0625 AS DECIMAL(6,4)) END AS DOUBLE)
               * 10000) AS DOUBLE) / 10000 AS ewma_value
    FROM lagged
    """,
)
def window_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average over a bounded lag frame.

    EWMA is non-associative, so no built-in window aggregate expresses
    it directly; the standard distributed form bounds the kernel (here
    5 taps, α=0.5 → weights 0.5^j, <4% truncated mass) and computes the
    weighted sum over explicit LAGs — one window shuffle keyed by
    user_id, all arithmetic inside whole-stage codegen. Weights are
    exact decimals and inputs are 2-decimal money doubles, so the
    weighted sum is EXACT in both engines; only the final
    normalization (partial frames at each series head re-scale by the
    weights actually present) divides in double, truncated to 4 digits.

    Scale: identical plan shape at any row count — the kernel width is
    a constant, never a per-group collect. Widening α-coverage means
    more lag taps (cheap, same shuffle), not more passes.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    weights = ["1.0", "0.5", "0.25", "0.125", "0.0625"]
    lags = [
        (F.lag("value", j).over(w) if j else F.col("value")).cast(
            "decimal(12,2)"
        )
        for j in range(5)
    ]
    num = None
    den = None
    for x, wt in zip(lags, weights):
        wd = F.lit(wt).cast("decimal(6,4)")
        term = F.coalesce(x * wd, F.lit(0))
        avail = F.when(x.isNull(), F.lit(0)).otherwise(wd)
        num = term if num is None else num + term
        den = avail if den is None else den + avail
    return table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        trunc_digits(num.cast("double") / den.cast("double"), 4).alias(
            "ewma_value"
        ),
    )


@query(
    "window_groups_frame",
    oracle="""
    WITH grp AS (
      SELECT user_id, ts, SUM(CAST(value AS DECIMAL(12,2))) AS g_sum
      FROM events GROUP BY user_id, ts
    ), rolled AS (
      SELECT user_id, ts,
             SUM(g_sum) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS BETWEEN 1 PRECEDING AND CURRENT ROW)
               AS roll
      FROM grp
    )
    SELECT e.event_id, e.user_id,
           ROUND(CAST(r.roll AS DOUBLE), 2) AS grp_rolling_value
    FROM events e JOIN rolled r ON e.user_id = r.user_id AND e.ts = r.ts
    """,
)
def window_groups_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPS window frame (SQL:2011) — frame bounds counted in peer
    groups (distinct ORDER BY values), not rows or value ranges.

    Spark has no GROUPS frame type, so it is lowered to the equivalent
    two-level plan: aggregate per (user, ts) peer group, run a ROWS
    frame over the group-level rows (1 group preceding + current), and
    join the group result back onto the detail rows. Semantically
    identical to a native GROUPS frame: every row in a peer group
    shares the same frame, and a peer group with n rows contributes
    all n rows to the frame of its successor group. (DuckDB's parser
    also lacks GROUPS mode, so the oracle states the same peer-group
    lowering in portable ANSI SQL — group CTE, ROWS frame, join back.)

    Scale: the group table is at most the event count; both shuffles
    (group-by and the join back) hash on (user_id, ts), and the window
    itself sorts only within user partitions — no global sort.
    """
    ev = table(spark, sf_dir, "events")
    grp = ev.groupBy("user_id", "ts").agg(
        F.sum(money(F.col("value"))).alias("g_sum")
    )
    w = Window.partitionBy("user_id").orderBy("ts").rowsBetween(-1, 0)
    rolled = grp.select(
        "user_id", "ts", F.sum("g_sum").over(w).alias("roll")
    )
    return (
        ev.select("event_id", "user_id", "ts")
        .join(rolled, ["user_id", "ts"])
        .select(
            "event_id",
            "user_id",
            F.round(F.col("roll").cast("double"), 2).alias(
                "grp_rolling_value"
            ),
        )
    )
