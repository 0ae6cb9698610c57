"""§2.B.3 — joins.

Strategy notes for 100 TB:
- dims (region/nation/supplier/part) are broadcast — no shuffle of the
  fact side; ``broadcast()`` hints are explicit where it matters.
- fact⋈fact equi-joins shuffle on the join key; AQE handles skew.
- the as-of join is the union+window formulation — O(n log n) with a
  single shuffle on the partition key, instead of a range-join blowup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tpctools_spark.catalog import table
from tpctools_spark.queries._util import money, rate, trunc_digits
from tpctools_spark.registry import query


@query(
    "join_inner_equi",
    oracle="""
    SELECT o.o_orderstatus,
           COUNT(*) AS n_items,
           CAST(floor(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) * 100) AS DOUBLE) / 100
             AS revenue
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderstatus
    """,
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈fact equi-join (orders⋈lineitem) + aggregate.

    Catalyst picks sort-merge or shuffled-hash on l_orderkey; at scale
    both sides shuffle once on the key and AQE splits skewed partitions.
    """
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "inner")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            trunc_digits(
                F.sum(
                    money(F.col("l_extendedprice"))
                    * (F.lit(1) - rate(F.col("l_discount")))
                ).cast("double"),
                2,
            ).alias("revenue"),
        )
    )


@query(
    "join_broadcast",
    oracle="""
    SELECT r.r_name, COUNT(*) AS n_customers,
           ROUND(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DOUBLE), 2) AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema dim joins with explicit broadcast of nation/region.

    The fact side (customer) never shuffles for the join — each executor
    gets the whole dim tables. This is the canonical 100 TB dim join.
    """
    c = table(spark, sf_dir, "customer")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    r = F.broadcast(table(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum(money(F.col("c_acctbal"))).cast("double"), 2).alias(
                "total_acctbal"
            ),
        )
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join — the EXISTS rewrite; emits each customer once."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join — NOT EXISTS (TPC-DS Q16/Q94 pattern)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


@query(
    "join_multiway",
    oracle="""
    SELECT n.n_name,
           CAST(floor(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) * 100) AS DOUBLE) / 100
             AS revenue
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE r.r_name IN ('ASIA', 'AMERICA')
      AND CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
      AND CAST(o.o_orderdate AS DATE) < DATE '1999-01-01'
    GROUP BY n.n_name
    """,
)
def join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped 5-table join chain: two broadcast dims, then the
    customer⋈orders⋈lineitem fact chain shuffling on its keys.

    The region filter prunes before the joins (Catalyst pushes it through
    the broadcast), so the fact chain only carries matching nations.
    """
    r = F.broadcast(
        table(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "AMERICA"))
    )
    n = F.broadcast(table(spark, sf_dir, "nation"))
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate").cast("date") < F.lit("1999-01-01").cast("date"))
    )
    li = table(spark, sf_dir, "lineitem")
    return (
        r.join(n, n.n_regionkey == r.r_regionkey)
        .join(c, c.c_nationkey == n.n_nationkey)
        .join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("n_name")
        .agg(
            trunc_digits(
                F.sum(
                    money(F.col("l_extendedprice"))
                    * (F.lit(1) - rate(F.col("l_discount")))
                ).cast("double"),
                2,
            ).alias("revenue")
        )
    )


@query(
    "join_theta_range",
    oracle="""
    SELECT e.user_id, COUNT(*) AS n_pairs
    FROM events e JOIN events f
      ON e.user_id = f.user_id
     AND f.ts > e.ts
     AND f.ts <= e.ts + INTERVAL 1 HOUR
    GROUP BY e.user_id
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-predicate join: pairs of events per user within one hour.

    The equi part (user_id) drives the shuffle; the range predicates are
    applied as join residuals — no nested-loop over the full cross
    product. (A pure theta join with no equi key would be a broadcast
    nested loop; always keep an equi anchor at scale.)
    """
    e = table(spark, sf_dir, "events").select(
        F.col("user_id"), F.col("ts").alias("e_ts")
    )
    f = table(spark, sf_dir, "events").select(
        F.col("user_id").alias("f_user"), F.col("ts").alias("f_ts")
    )
    hour_us = 3600 * 1_000_000
    return (
        e.join(
            f,
            (e.user_id == f.f_user)
            & (F.unix_micros(F.col("f_ts")) > F.unix_micros(F.col("e_ts")))
            & (
                F.unix_micros(F.col("f_ts"))
                <= F.unix_micros(F.col("e_ts")) + F.lit(hour_us)
            ),
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@query(
    "join_asof_event",
    oracle="""
    WITH ordered AS (
      SELECT event_id, user_id, ts, event_type,
             LAST_VALUE(CASE WHEN event_type = 'error' THEN event_id END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_error_id
      FROM events
    )
    SELECT event_id, user_id, asof_error_id
    FROM ordered WHERE event_type = 'purchase'
    """,
)
def join_asof_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the most recent error event at or
    before it for the same user.

    Implemented as the scalable union+window formulation: one shuffle on
    user_id, one sort by (ts, event_id), then ``last(ignorenulls)`` over
    an unbounded-preceding frame carries the latest error forward. This
    is O(n log n) with no range-join row blowup — the formulation to use
    at 100 TB (a join+filter as-of is quadratic in events per key).
    """
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = ev.withColumn(
        "asof_error_id",
        F.last(
            F.when(F.col("event_type") == "error", F.col("event_id")),
            ignorenulls=True,
        ).over(w),
    )
    return carried.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "asof_error_id"
    )


@query(
    "join_null_safe",
    oracle="""
    WITH keyed AS (
      SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg FROM customer
    ), dim AS (
      SELECT DISTINCT seg FROM keyed
    )
    SELECT d.seg, COUNT(*) AS n_customers,
           CAST(MIN(k.c_custkey) AS BIGINT) AS min_custkey
    FROM keyed k JOIN dim d ON k.seg IS NOT DISTINCT FROM d.seg
    GROUP BY d.seg
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi join (``<=>``): NULL keys match each other instead
    of silently dropping.

    The semantics an inner join gets wrong when the key is nullable —
    rows with NULL keys vanish from a plain equi join, a classic silent
    data-loss bug in fact-to-dim lookups with optional attributes.
    ``eqNullSafe`` still plans as a hash join (the null bucket hashes
    like any value), so scale behavior is unchanged; skew only appears
    if NULLs dominate, in which case the standard fix is splitting the
    NULL slice off before the join.
    """
    keyed = table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg"),
    )
    dim = keyed.select("seg").distinct().select(F.col("seg").alias("d_seg"))
    return (
        keyed.join(F.broadcast(dim), keyed.seg.eqNullSafe(F.col("d_seg")))
        .groupBy(F.col("d_seg").alias("seg"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.min("c_custkey").alias("min_custkey"),
        )
    )


@query(
    "join_asof_tolerance",
    oracle="""
    WITH ordered AS (
      SELECT event_id, user_id, ts, event_type,
             LAST_VALUE(CASE WHEN event_type = 'error' THEN event_id END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS err_id,
             LAST_VALUE(CASE WHEN event_type = 'error' THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS err_ts
      FROM events
    )
    SELECT event_id, user_id,
           CASE WHEN err_ts >= ts - INTERVAL 1 HOUR THEN err_id END AS asof_error_id,
           CASE WHEN err_ts >= ts - INTERVAL 1 HOUR THEN
             (epoch_us(ts) - epoch_us(err_ts)) // 1000000 END AS lag_seconds
    FROM ordered WHERE event_type = 'purchase'
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a match tolerance: the most recent error before
    each purchase, but only if it happened within the last hour —
    otherwise NULL. The pandas ``merge_asof(tolerance=...)`` /
    kdb ``wj`` semantics, the shape market-data and telemetry
    pipelines actually need (a stale quote must NOT join).

    Same union+window formulation as ``join_asof_event`` — one shuffle
    on user_id, carry BOTH the candidate's id and its timestamp
    forward, then apply the tolerance as a post-window filter. Still
    O(n log n); the tolerance costs one comparison, not a range join.
    """
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_err = F.col("event_type") == "error"
    carried = ev.withColumn(
        "err_id", F.last(F.when(is_err, F.col("event_id")), ignorenulls=True).over(w)
    ).withColumn(
        "err_ts", F.last(F.when(is_err, F.col("ts")), ignorenulls=True).over(w)
    )
    in_tol = F.col("err_ts") >= F.col("ts") - F.expr("INTERVAL 1 HOUR")
    return carried.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.when(in_tol, F.col("err_id")).alias("asof_error_id"),
        F.when(
            in_tol,
            F.expr("(unix_micros(ts) - unix_micros(err_ts)) div 1000000"),
        ).alias("lag_seconds"),
    )


@query(
    "join_lateral_topn",
    oracle="""
    SELECT n.n_name, t.c_custkey, t.acctbal
    FROM nation n,
         LATERAL (
           SELECT c.c_custkey,
                  (CAST(floor(c.c_acctbal * 100) AS DOUBLE) / 100) AS acctbal
           FROM customer c
           WHERE c.c_nationkey = n.n_nationkey
           ORDER BY c.c_acctbal DESC, c.c_custkey
           LIMIT 2
         ) t
    """,
)
def join_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL join: the top-2 customers by balance FOR EACH
    nation — the "top-N per group via lateral subquery" SQL idiom.

    Expressed through the raw-SQL surface (``spark.sql`` supports
    LATERAL correlated subqueries since 3.2); Catalyst decorrelates the
    LIMIT-per-group into a ranked window under the hood — the same
    physical plan a hand-written row_number filter gets, so there is no
    per-nation re-execution of the inner query (the naive lateral
    interpretation, quadratic at scale). The fixture has 25 nations ×
    customer table; at 100 TB the decorrelated window shuffles
    customers once on the join key.
    """
    table(spark, sf_dir, "nation").createOrReplaceTempView("_lat_nation")
    table(spark, sf_dir, "customer").createOrReplaceTempView("_lat_customer")
    return spark.sql(
        """
        SELECT n.n_name, t.c_custkey, t.acctbal
        FROM _lat_nation n,
             LATERAL (
               SELECT c.c_custkey,
                      CAST(floor(c.c_acctbal * 100) AS DOUBLE) / 100 AS acctbal
               FROM _lat_customer c
               WHERE c.c_nationkey = n.n_nationkey
               ORDER BY c.c_acctbal DESC, c.c_custkey
               LIMIT 2
             ) t
        """
    )


@query(
    "join_full_outer_reconcile",
    oracle="""
    WITH snap_a AS (
      SELECT doc_id, n_chars FROM documents WHERE doc_id % 7 <> 0
    ),
    snap_b AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0 THEN n_chars + 10 ELSE n_chars END
               AS n_chars
      FROM documents WHERE doc_id % 11 <> 0
    )
    SELECT
      CASE WHEN a.doc_id IS NULL THEN 'only_right'
           WHEN b.doc_id IS NULL THEN 'only_left'
           WHEN a.n_chars <> b.n_chars THEN 'changed'
           ELSE 'unchanged' END AS recon_status,
      COUNT(*) AS n_docs,
      CAST(MIN(COALESCE(a.doc_id, b.doc_id)) AS BIGINT) AS min_doc
    FROM snap_a a FULL OUTER JOIN snap_b b ON a.doc_id = b.doc_id
    GROUP BY 1
    """,
)
def join_full_outer_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-snapshot reconciliation via FULL OUTER join: classify every
    key as only-left / only-right / changed / unchanged — the data-sync
    diff that validates a migration or an incremental pipeline against
    its source (deterministically planted drift: every 7th doc missing
    left, every 11th missing right, every 5th mutated).

    FULL OUTER cannot broadcast (both sides must surface their
    unmatched rows), so this is the one join type that always
    shuffle-joins on the key — worth demonstrating precisely because
    the planner's usual broadcast escape hatch is off the table; the
    classification is a post-join projection and the output is
    status-grained, so the shuffle is the whole cost.
    """
    d = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    a = d.filter(F.col("doc_id") % 7 != 0).alias("a")
    b = (
        d.filter(F.col("doc_id") % 11 != 0)
        .select(
            "doc_id",
            F.when(F.col("doc_id") % 5 == 0, F.col("n_chars") + 10)
            .otherwise(F.col("n_chars"))
            .alias("n_chars"),
        )
        .alias("b")
    )
    joined = a.join(b, F.col("a.doc_id") == F.col("b.doc_id"), "full_outer")
    status = (
        F.when(F.col("a.doc_id").isNull(), F.lit("only_right"))
        .when(F.col("b.doc_id").isNull(), F.lit("only_left"))
        .when(F.col("a.n_chars") != F.col("b.n_chars"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        joined.select(
            status.alias("recon_status"),
            F.coalesce(F.col("a.doc_id"), F.col("b.doc_id")).alias("key"),
        )
        .groupBy("recon_status")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("key").alias("min_doc"),
        )
    )


@query(
    "join_asof_nearest",
    oracle="""
    WITH ordered AS (
      SELECT event_id, user_id, ts, event_type,
             LAST_VALUE(CASE WHEN event_type = 'error' THEN event_id END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_id,
             LAST_VALUE(CASE WHEN event_type = 'error' THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_ts,
             FIRST_VALUE(CASE WHEN event_type = 'error' THEN event_id END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_id,
             FIRST_VALUE(CASE WHEN event_type = 'error' THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_ts
      FROM events
    )
    SELECT event_id, user_id,
           CASE
             WHEN prev_id IS NULL THEN next_id
             WHEN next_id IS NULL THEN prev_id
             WHEN epoch_us(ts) - epoch_us(prev_ts)
                  <= epoch_us(next_ts) - epoch_us(ts) THEN prev_id
             ELSE next_id
           END AS nearest_error_id
    FROM ordered WHERE event_type = 'purchase'
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of join (pandas ``merge_asof(direction=
    'nearest')``): each purchase matches its closest error event in
    EITHER direction, ties to the earlier one — the sensor-alignment
    semantics when causality doesn't pin the direction.

    Same single user_id exchange as the backward as-of: one window
    sort serves BOTH carries (last-error-before via an unbounded-
    preceding frame, first-error-after via unbounded-following), and
    nearest is a projection over the two candidates. Completes the
    as-of family: backward (join_asof_event), backward-with-tolerance
    (join_asof_tolerance), nearest.
    """
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    before = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    after = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    is_err = F.col("event_type") == "error"
    carried = (
        ev.withColumn(
            "prev_id",
            F.last(F.when(is_err, F.col("event_id")), ignorenulls=True).over(before),
        )
        .withColumn(
            "prev_ts", F.last(F.when(is_err, F.col("ts")), ignorenulls=True).over(before)
        )
        .withColumn(
            "next_id",
            F.first(F.when(is_err, F.col("event_id")), ignorenulls=True).over(after),
        )
        .withColumn(
            "next_ts", F.first(F.when(is_err, F.col("ts")), ignorenulls=True).over(after)
        )
    )
    prev_gap = F.unix_micros("ts") - F.unix_micros("prev_ts")
    next_gap = F.unix_micros("next_ts") - F.unix_micros("ts")
    nearest = (
        F.when(F.col("prev_id").isNull(), F.col("next_id"))
        .when(F.col("next_id").isNull(), F.col("prev_id"))
        .when(prev_gap <= next_gap, F.col("prev_id"))
        .otherwise(F.col("next_id"))
    )
    return carried.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", nearest.alias("nearest_error_id")
    )


@query(
    "join_interval_grid",
    oracle="""
    WITH iv AS (
      SELECT event_id AS iv_id, user_id AS iv_user,
             epoch_us(ts) AS s, epoch_us(ts) + 900000000 AS e
      FROM events WHERE event_type = 'error'
    ),
    pts AS (
      SELECT event_id AS p_id, epoch_us(ts) AS p_ts
      FROM events WHERE event_type = 'purchase'
    )
    SELECT iv_user,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT iv_id) AS BIGINT) AS n_windows_hit,
           CAST(MIN(p_id) AS BIGINT) AS first_purchase_id
    FROM iv JOIN pts ON p_ts >= s AND p_ts < e
    GROUP BY iv_user
    """,
)
def join_interval_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-containment join with NO natural equi key, made
    shuffle-joinable by grid bucketing — each error event opens a
    15-minute outage window and we count the purchases (by ANY user)
    that fall inside it.

    The scale pattern (IP-range lookups, point-in-window attribution,
    genomic interval overlap): a pure range join between two fact-sized
    sides is a broadcast-nested-loop blowup. Instead, time is cut into
    fixed 10-minute grid cells; every interval is replicated to each
    cell it overlaps (≤ 3 here, bounded by window/cell), every point
    maps to exactly ONE cell, and the join becomes an equi-join on the
    manufactured cell key with the containment predicate as a residual.
    Because a point has a single cell, each (interval, point) pair can
    match at most one interval replica — no post-join dedup. One
    shuffle on the cell key, partial aggregation on top; AQE splits any
    hot cell. The oracle states the same join declaratively
    (DuckDB's IEJoin handles fixture scale).

    Completes the banding family: ``join_range_bucketed`` pairs
    points with points (symmetric proximity, probe exploded to 2
    cells), ``join_spatial_grid`` does it in 2-D; this one is the
    asymmetric interval×point containment case, where only the
    interval side replicates and its fan-out is ⌈window/cell⌉+1 —
    the knob that trades replication against residual-filter
    selectivity when windows are much wider than the grid.
    """
    cell_us = 600 * 1_000_000  # 10-minute grid cells
    win_us = 900 * 1_000_000  # 15-minute outage windows
    ev = table(spark, sf_dir, "events")
    iv = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("iv_id"),
        F.col("user_id").alias("iv_user"),
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + F.lit(win_us)).alias("e"),
    )
    # Replicate intervals to every overlapped cell; DIV keeps the cell
    # arithmetic in exact integer space (micros never round-trip
    # through double). Half-open [s, e) ⇒ last cell is (e-1) DIV cell.
    iv_cells = iv.withColumn(
        "cell",
        F.explode(
            F.sequence(
                F.expr(f"s DIV {cell_us}"), F.expr(f"(e - 1) DIV {cell_us}")
            )
        ),
    )
    pts = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.unix_micros("ts").alias("p_ts"),
        F.expr(f"unix_micros(ts) DIV {cell_us}").alias("cell"),
    )
    return (
        iv_cells.join(pts, "cell")
        .filter((F.col("p_ts") >= F.col("s")) & (F.col("p_ts") < F.col("e")))
        .groupBy("iv_user")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("iv_id").alias("n_windows_hit"),
            F.min("p_id").alias("first_purchase_id"),
        )
    )
