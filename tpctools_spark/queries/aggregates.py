"""§2.B.4 — aggregations.

Every groupBy here compiles to partial (map-side) + final hash aggregation
— the shuffle moves pre-aggregated partials, not raw rows, so these scale
with group cardinality, not input size. Money sums use exact decimal math
(see ``_util``) so hashes match the DuckDB oracle bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from tpctools_spark.catalog import table
from tpctools_spark.queries._util import davg, dsum, money, rate, trunc_digits
from tpctools_spark.registry import query


@query(
    "agg_group_sum",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_base_price,
           CAST(floor(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                          * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) * 100) AS DOUBLE) / 100 AS sum_disc_price,
           CAST(floor(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                          * (1 - CAST(l_discount AS DECIMAL(4,2)))
                          * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) * 100) AS DOUBLE) / 100 AS sum_charge,
           CAST(floor(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_quantity) * 100) AS DOUBLE) / 100 AS avg_qty,
           CAST(floor(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_extendedprice) * 100) AS DOUBLE) / 100 AS avg_price,
           CAST(floor(CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(l_discount) * 100) AS DOUBLE) / 100 AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_group_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary — the flagship hash aggregation.

    Filter pushes to the scan; six aggregates fold in one pass. The group
    key (returnflag, linestatus) has ~6 values, so the final exchange
    moves 6 rows per map partition regardless of scale.
    """
    li = table(spark, sf_dir, "lineitem")
    price = money(F.col("l_extendedprice"))
    disc = rate(F.col("l_discount"))
    tax = rate(F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate").cast("date") <= F.lit("2000-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            trunc_digits(F.sum(price * (F.lit(1) - disc)).cast("double"), 2).alias(
                "sum_disc_price"
            ),
            trunc_digits(
                F.sum(price * (F.lit(1) - disc) * (F.lit(1) + tax)).cast("double"), 2
            ).alias("sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            trunc_digits(
                F.sum(rate(F.col("l_discount"))).cast("double")
                / F.count("l_discount"),
                2,
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "agg_count_distinct",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (expands to a two-phase plan in Spark)."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@query(
    "agg_approx_distinct",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders,
           TRUE AS approx_ok
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate count-distinct (single pass, no expand).

    At 100 TB this is the right default for cardinality estimation: fixed
    sketch size per group, mergeable map-side, no shuffle blowup.

    Sketch estimates are engine-specific, so the oracle checks the exact
    cardinality plus a Spark-computed ``approx_ok`` bound: the HLL
    estimate (rsd=0.02) must land within 10% (= 5 sigma) of exact. The
    oracle's twin column is literal TRUE.
    """
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.approx_count_distinct("o_custkey", 0.02).alias("approx_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            "o_orderstatus",
            "n_customers",
            "n_orders",
            (
                F.abs(F.col("approx_customers") - F.col("n_customers"))
                <= F.greatest(F.lit(1.0), F.col("n_customers") * 0.10)
            ).alias("approx_ok"),
        )
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n_orders,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 2) AS total_price
    FROM orders
    GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (TPC-DS Q18/Q22/Q67 pattern).

    Spark expands rollup into a union of grouping sets before the hash
    aggregate; COALESCE labels the subtotal rows deterministically.
    """
    return (
        table(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price",
        )
    )


@query(
    "agg_having",
    oracle="""
    SELECT o_custkey,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 2) AS total_spent,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    HAVING SUM(CAST(o_totalprice AS DECIMAL(12,2))) > 1500000
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (TPC-H Q11 HAVING shape)."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            dsum(F.col("o_totalprice")).alias("total_spent"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(money(F.col("o_totalprice"))).alias("_exact_total"),
        )
        .filter(F.col("_exact_total") > 1_500_000)
        .drop("_exact_total")
    )


@query(
    "agg_distinct_input",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n_order_flags
    FROM (SELECT DISTINCT l_orderkey, l_returnflag FROM lineitem)
    GROUP BY l_returnflag
    """,
)
def agg_distinct_input(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over pre-deduplicated rows (distinct-then-count).

    Uses a full-column distinct (deterministic) rather than
    ``dropDuplicates`` on a subset, which keeps an arbitrary row.
    """
    return (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_returnflag")
        .distinct()
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_order_flags"))
    )


@query(
    "agg_percentile",
    oracle="""
    SELECT o_orderstatus,
           CAST(floor(quantile_cont(o_totalprice, 0.25) * 10000) AS DOUBLE) / 10000 AS p25,
           CAST(floor(quantile_cont(o_totalprice, 0.50) * 10000) AS DOUBLE) / 10000 AS p50,
           CAST(floor(quantile_cont(o_totalprice, 0.90) * 10000) AS DOUBLE) / 10000 AS p90
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group.

    Spark's ``percentile`` and DuckDB's ``quantile_cont`` share the
    linear-interpolation definition and agree bitwise on the fixture
    doubles (verified empirically); outputs truncate to 4 decimals as
    cross-engine insurance. Exact percentile sorts per group — at
    100 TB prefer ``agg_approx_percentile`` (bounded-memory sketch).
    """
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        trunc_digits(F.expr("percentile(o_totalprice, 0.25)"), 4).alias("p25"),
        trunc_digits(F.expr("percentile(o_totalprice, 0.50)"), 4).alias("p50"),
        trunc_digits(F.expr("percentile(o_totalprice, 0.90)"), 4).alias("p90"),
    )


@query(
    "agg_approx_percentile",
    oracle="""
    SELECT o_orderstatus,
           CAST(floor(quantile_cont(o_totalprice, 0.25) * 10000) AS DOUBLE) / 10000 AS p25,
           CAST(floor(quantile_cont(o_totalprice, 0.50) * 10000) AS DOUBLE) / 10000 AS p50,
           CAST(floor(quantile_cont(o_totalprice, 0.90) * 10000) AS DOUBLE) / 10000 AS p90,
           TRUE AS approx_ok
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles via the KLL-style sketch
    (``approx_percentile``): bounded memory per group regardless of
    cardinality — the 100 TB path, mergeable across partitions.

    Sketch outputs are engine-specific, so the oracle checks the exact
    interpolated percentiles plus a Spark-computed ``approx_ok``: each
    sketch percentile (accuracy=10000, rank error <= 1e-4) must land
    within 5% relative of its exact twin. The oracle twin is TRUE.
    """
    o = table(spark, sf_dir, "orders")
    close = lambda a, b: F.abs(a - b) <= F.abs(b) * 0.05  # noqa: E731
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.expr(
                "approx_percentile(o_totalprice, array(0.25, 0.5, 0.9), 10000)"
            ).alias("ap"),
            F.expr("percentile(o_totalprice, 0.25)").alias("ep25"),
            F.expr("percentile(o_totalprice, 0.50)").alias("ep50"),
            F.expr("percentile(o_totalprice, 0.90)").alias("ep90"),
        )
        .select(
            "o_orderstatus",
            trunc_digits(F.col("ep25"), 4).alias("p25"),
            trunc_digits(F.col("ep50"), 4).alias("p50"),
            trunc_digits(F.col("ep90"), 4).alias("p90"),
            (
                close(F.element_at("ap", 1), F.col("ep25"))
                & close(F.element_at("ap", 2), F.col("ep50"))
                & close(F.element_at("ap", 3), F.col("ep90"))
            ).alias("approx_ok"),
        )
    )


@query(
    "agg_regression",
    oracle="""
    SELECT l_returnflag,
           CAST(floor(regr_slope(l_extendedprice, l_quantity) * 10000) AS DOUBLE) / 10000 AS slope,
           CAST(floor(regr_intercept(l_extendedprice, l_quantity) * 10000) AS DOUBLE) / 10000 AS intercept,
           CAST(floor(corr(l_extendedprice, l_quantity) * 1000000) AS DOUBLE) / 1000000 AS correlation,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in linear-regression aggregates (slope/intercept/corr).

    Both engines implement the same single-pass covariance formulas;
    results agree to ~1e-15 relative on the fixtures, so truncation at
    4-6 decimals is stable. One hash-agg, partial+final — the same
    shuffle profile as any sum at 100 TB.
    """
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        trunc_digits(F.expr("regr_slope(l_extendedprice, l_quantity)"), 4).alias(
            "slope"
        ),
        trunc_digits(
            F.expr("regr_intercept(l_extendedprice, l_quantity)"), 4
        ).alias("intercept"),
        trunc_digits(F.corr("l_extendedprice", "l_quantity"), 6).alias(
            "correlation"
        ),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "agg_pivot",
    oracle="""
    SELECT o_orderstatus,
           ROUND(CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                 THEN CAST(o_totalprice AS DECIMAL(14,2)) END) AS DOUBLE), 2) AS urgent,
           ROUND(CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH'
                 THEN CAST(o_totalprice AS DECIMAL(14,2)) END) AS DOUBLE), 2) AS high,
           ROUND(CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM'
                 THEN CAST(o_totalprice AS DECIMAL(14,2)) END) AS DOUBLE), 2) AS medium,
           ROUND(CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED'
                 THEN CAST(o_totalprice AS DECIMAL(14,2)) END) AS DOUBLE), 2) AS not_specified,
           ROUND(CAST(SUM(CASE WHEN o_orderpriority = '5-LOW'
                 THEN CAST(o_totalprice AS DECIMAL(14,2)) END) AS DOUBLE), 2) AS low
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order priorities rotated into columns, one row per status.

    ``pivot`` with an explicit value list compiles to a single hash
    aggregation of CASE-filtered partial sums — one pass, no extra
    shuffle versus a plain groupBy, and the explicit list keeps the
    plan static (no distinct-values pre-query, which at 100 TB would be
    an extra full scan).
    """
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .pivot(
            "o_orderpriority",
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
        )
        .agg(F.round(F.sum(F.col("o_totalprice").cast("decimal(14,2)")).cast("double"), 2))
        .withColumnsRenamed(
            {
                "1-URGENT": "urgent",
                "2-HIGH": "high",
                "3-MEDIUM": "medium",
                "4-NOT SPECIFIED": "not_specified",
                "5-LOW": "low",
            }
        )
    )


@query(
    "agg_approx_topk",
    oracle="""
    SELECT l_partkey, COUNT(*) AS n, TRUE AS sketch_ok
    FROM lineitem
    GROUP BY l_partkey
    ORDER BY n DESC, l_partkey
    LIMIT 10
    """,
)
def agg_approx_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters: top-10 most frequent part keys in lineitem,
    cross-validated against the approx_top_k sketch.

    The sketch is the 100 TB shape — one pass, bounded memory, mergeable
    across partitions, no groupBy-count shuffle blowup. Sketch internals
    differ across engines, so the oracle checks the exact top-10 (ties
    broken by key) plus a Spark-computed ``sketch_ok``: the sorted
    multiset of the sketch's top-10 counts must equal the exact top-10
    counts (capacity 100k >= key cardinality at test SFs, so counts are
    exact even where tie *ordering* differs). Oracle twin is TRUE.
    """
    li = table(spark, sf_dir, "lineitem")
    exact10 = (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "l_partkey")
        .limit(10)
    )
    sketch_counts = li.select(
        F.expr("approx_top_k(l_partkey, 10, 100000)").alias("tk")
    ).select(
        F.sort_array(F.expr("transform(tk, x -> cast(x.count as bigint))")).alias(
            "sk_counts"
        )
    )
    exact_counts = exact10.agg(
        F.sort_array(F.collect_list(F.col("n").cast("bigint"))).alias("ex_counts")
    )
    ok = (
        sketch_counts.crossJoin(exact_counts)
        .select((F.col("sk_counts") == F.col("ex_counts")).alias("sketch_ok"))
    )
    return exact10.crossJoin(F.broadcast(ok))


@query(
    "agg_hll_sketch_union",
    oracle="""
    SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS exact_distinct,
           TRUE AS estimate_ok
    FROM orders GROUP BY o_orderstatus
    UNION ALL
    SELECT 'ALL' AS o_orderstatus, COUNT(DISTINCT o_custkey) AS exact_distinct,
           TRUE AS estimate_ok
    FROM orders
    """,
)
def agg_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable cardinality sketches: per-status distinct-customer HLL
    sketches, then a union-merge for the global estimate.

    The DataSketches pattern that matters at scale: sketches are STATE,
    not just numbers — build once per partition/group, persist, merge
    across days/tables without rescanning raw data. The ALL row
    estimates distinct customers across all statuses from the merged
    sketch alone (never rescanning the raw rows).

    Sketch estimates are engine-specific, so the oracle checks exact
    cardinalities plus a Spark-computed ``estimate_ok``: each estimate
    (lgConfigK=14, rsd ~0.8%) must land within 5% of exact. Oracle twin
    is TRUE.
    """
    o = table(spark, sf_dir, "orders")
    ok = lambda est, exact: F.abs(est - exact) <= exact * 0.05  # noqa: E731
    per_status = o.groupBy("o_orderstatus").agg(
        F.expr("hll_sketch_agg(o_custkey, 14)").alias("sketch"),
        F.countDistinct("o_custkey").alias("exact_distinct"),
    )
    merged = per_status.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sketch, false))").alias("estimate")
    )
    global_exact = o.agg(F.countDistinct("o_custkey").alias("exact_distinct"))
    all_row = global_exact.crossJoin(F.broadcast(merged)).select(
        F.lit("ALL").alias("o_orderstatus"),
        "exact_distinct",
        ok(F.col("estimate"), F.col("exact_distinct")).alias("estimate_ok"),
    )
    rows = per_status.select(
        "o_orderstatus",
        "exact_distinct",
        ok(
            F.expr("hll_sketch_estimate(sketch)"), F.col("exact_distinct")
        ).alias("estimate_ok"),
    )
    return rows.unionByName(all_row)


@query(
    "agg_collect_sorted",
    oracle="""
    SELECT user_id,
           array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types_seen,
           COUNT(DISTINCT event_type) AS n_types
    FROM events
    GROUP BY user_id
    """,
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-result aggregation: each user's distinct event types as a
    sorted, comma-joined list.

    collect_set has no deterministic order, so the array is sorted
    before emission; it is then serialized to a string because nested
    cells are not hashable by the correctness driver. The map-side
    partial collect keeps shuffle bytes at O(users · distinct-types),
    not O(events).
    """
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.array_join(F.sort_array(F.collect_set("event_type")), ",").alias(
            "types_seen"
        ),
        F.countDistinct("event_type").alias("n_types"),
    )


# Count-min-sketch hash rows: bucket_i(k) = ((a_i·k + b_i) mod P) mod W.
# Plain int64 arithmetic both engines evaluate identically (k ≤ ~1e9 at
# any SF, a_i < 1e9 → products < 1e18); same construction as the SimHash
# and LSH-cosine arithmetic hashes (dedup.py), which is what makes the
# whole sketch value-checkable in DuckDB instead of rows-only.
_CMS_P = 1_000_000_007
_CMS_W = 4096
_CMS_ROWS = [
    (0, 654_435_747, 283_521),
    (1, 308_871_487, 324_024),
    (2, 963_307_234, 364_527),
]
_CMS_SQL_ROWS = ", ".join(f"({i}, {a}, {b})" for i, a, b in _CMS_ROWS)


@query(
    "agg_count_min_sketch",
    oracle=f"""
    WITH h(i, a, b) AS (VALUES {_CMS_SQL_ROWS}),
    sketch AS (
      SELECT h.i,
             ((e.user_id * h.a + h.b) % {_CMS_P}) % {_CMS_W} AS bucket,
             COUNT(*) AS cnt
      FROM events e CROSS JOIN h
      GROUP BY 1, 2
    ),
    keys AS (
      SELECT user_id, COUNT(*) AS exact_count FROM events GROUP BY user_id
    ),
    probe AS (
      SELECT k.user_id, MIN(s.cnt) AS est_count
      FROM keys k
      CROSS JOIN h
      JOIN sketch s
        ON s.i = h.i
       AND s.bucket = ((k.user_id * h.a + h.b) % {_CMS_P}) % {_CMS_W}
      GROUP BY 1
    )
    SELECT k.user_id, p.est_count, k.exact_count
    FROM keys k JOIN probe p USING (user_id)
    ORDER BY p.est_count DESC, k.user_id
    LIMIT 20
    """,
)
def agg_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch: heavy-hitter frequency estimation in bounded
    memory — the streaming/telemetry primitive for "top talkers" over
    data too large to count exactly per key.

    Build: each event votes into d=3 hash rows × W=4096 buckets; the
    groupBy is map-side combinable, so every partition contributes at
    most d·W partial rows regardless of row count — at 100 TB the
    shuffle moves ~12K rows per partition, never the events. Probe:
    the sketch (≤ d·W rows, data-volume-independent) is broadcast and
    each key's estimate is the MIN over its d buckets; estimates are
    biased up only (collisions add), never down. The output returns the
    top-20 estimated-heaviest users with exact counts alongside; with
    |keys| ≪ d·W the estimate equals the exact count, making the whole
    pipeline value-checkable — the sketch arithmetic (not a tolerance
    band) is what the oracle replicates.
    """
    ev = table(spark, sf_dir, "events")
    hashes = F.array(
        *[
            F.struct(F.lit(i).alias("i"), F.lit(a).alias("a"), F.lit(b).alias("b"))
            for i, a, b in _CMS_ROWS
        ]
    )

    def bucket(key: Column, h: Column) -> Column:
        return F.pmod(F.pmod(key * h["a"] + h["b"], F.lit(_CMS_P)), F.lit(_CMS_W))

    votes = ev.select(
        "user_id", F.explode(hashes).alias("h")
    ).select(F.col("h.i").alias("i"), bucket(F.col("user_id"), F.col("h")).alias("bucket"))
    sketch = votes.groupBy("i", "bucket").agg(F.count(F.lit(1)).alias("cnt"))

    keys = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_count"))
    probes = keys.select(
        "user_id", "exact_count", F.explode(hashes).alias("h")
    ).select(
        "user_id",
        "exact_count",
        F.col("h.i").alias("i"),
        bucket(F.col("user_id"), F.col("h")).alias("bucket"),
    )
    est = (
        probes.join(F.broadcast(sketch), ["i", "bucket"])
        .groupBy("user_id")
        .agg(F.min("cnt").alias("est_count"), F.first("exact_count").alias("exact_count"))
    )
    return (
        est.orderBy(F.desc("est_count"), F.asc("user_id"))
        .limit(20)
        .select("user_id", "est_count", "exact_count")
    )


@query(
    "agg_mode_median",
    oracle="""
    WITH per_user AS (
      SELECT event_type, user_id, COUNT(*) AS cnt
      FROM events GROUP BY 1, 2
    ),
    modes AS (
      SELECT event_type, user_id AS mode_user, cnt AS mode_count,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY cnt DESC, user_id ASC) AS rn
      FROM per_user
    )
    SELECT m.event_type, m.mode_user, m.mode_count,
           (CAST(floor(med.med * 100) AS DOUBLE) / 100) AS median_value
    FROM modes m
    JOIN (SELECT event_type, MEDIAN(value) AS med FROM events GROUP BY 1) med
      USING (event_type)
    WHERE m.rn = 1
    """,
)
def agg_mode_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode + median per group: the most frequent user per event type
    (deterministic tie-break) and the exact median event value.

    Mode is computed as a two-stage aggregation — count per (type,
    user), then top-1 per type over the already-aggregated table —
    rather than a sort of the raw events: the first groupBy map-side
    combines, so the window only ever ranks |types|·|users| rows, not
    row count. Median uses Spark's exact ``median`` (sort-based within
    the hash-agg buffer); at 100 TB you'd swap ``approx_percentile``
    in, which is the same expression shape.
    """
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.desc("cnt"), F.asc("user_id")
    )
    modes = (
        per_user.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("user_id").alias("mode_user"),
            F.col("cnt").alias("mode_count"),
        )
    )
    med = ev.groupBy("event_type").agg(
        trunc_digits(F.median("value"), 2).alias("median_value")
    )
    return modes.join(med, "event_type").select(
        "event_type", "mode_user", "mode_count", "median_value"
    )


@query(
    "agg_bitmap_distinct",
    oracle="""
    SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_distinct
    FROM orders GROUP BY o_orderstatus
    UNION ALL
    SELECT 'ALL', COUNT(DISTINCT o_custkey) FROM orders
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via bitmap aggregation — the scalable
    alternative to COUNT(DISTINCT) when approximation is unacceptable.

    Keys are bucketed into 32K-bit bitmap segments
    (``bitmap_bucket_number``/``bitmap_bit_position``); each
    (group, bucket) aggregates to one bitmap — map-side combinable, so
    the shuffle carries fixed-size bitmaps instead of raw key values —
    then ``bitmap_count`` sums per group. Unlike HLL this is exact, and
    unlike COUNT(DISTINCT) the dedup state is a bitmap OR (mergeable
    across days/partitions without rescanning). The ALL row re-merges
    the per-status bitmaps with ``bitmap_or_agg`` — distinct across
    groups from sketch-state alone, never touching raw rows again.
    """
    o = table(spark, sf_dir, "orders")
    per_bucket = o.groupBy(
        "o_orderstatus",
        F.expr("bitmap_bucket_number(o_custkey)").alias("bkt"),
    ).agg(
        F.expr("bitmap_construct_agg(bitmap_bit_position(o_custkey))").alias("bm")
    )
    per_status = per_bucket.groupBy("o_orderstatus").agg(
        F.expr("sum(bitmap_count(bm))").alias("n_distinct")
    )
    merged = (
        per_bucket.groupBy("bkt")
        .agg(F.expr("bitmap_or_agg(bm)").alias("bm"))
        .agg(F.expr("sum(bitmap_count(bm))").alias("n_distinct"))
        .select(F.lit("ALL").alias("o_orderstatus"), "n_distinct")
    )
    return per_status.unionByName(merged)


@query(
    "agg_bitmap_overlap",
    oracle="""
    WITH tu AS (
      SELECT DISTINCT event_type, user_id FROM events
    ), sizes AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM tu GROUP BY 1
    ), ov AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(COUNT(*) AS BIGINT) AS n_overlap
      FROM tu a JOIN tu b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT ov.type_a, ov.type_b, sa.n AS n_a, sb.n AS n_b, ov.n_overlap,
           (CAST(floor(CAST(ov.n_overlap AS DOUBLE)
                 / (sa.n + sb.n - ov.n_overlap) * 10000) AS DOUBLE) / 10000)
             AS jaccard
    FROM ov
    JOIN sizes sa ON ov.type_a = sa.event_type
    JOIN sizes sb ON ov.type_b = sb.event_type
    WHERE ov.n_overlap > 0
    """,
)
def agg_bitmap_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact pairwise audience overlap (and Jaccard) between every
    pair of event types, computed ENTIRELY from mergeable bitmap
    state — no row-level user set ever crosses a pair boundary.

    Why this shape at 100 TB: the naive overlap query self-joins the
    (type, user) set on user_id — a shuffle sized by users × types
    that reruns from raw data for every new pair. Here users collapse
    once into per-(type, bucket) 32K-bit bitmaps (map-side combinable,
    fixed-size shuffle rows); pair overlap then needs only bitmap
    algebra: |A∪B| via ``bitmap_or_agg`` over each pair's buckets and
    |A∩B| = |A| + |B| − |A∪B| (inclusion-exclusion — Spark has no
    scalar bitmap AND, and with mergeable ORs it isn't needed). The
    pair expansion multiplies the BITMAP table (|types|·buckets rows),
    never the user rows — same state that `agg_bitmap_distinct` keeps
    for exact distinct counts, reused for set algebra: the segment
    audience-overlap matrix from sketch state alone.

    The DuckDB oracle computes the same overlaps by the direct
    distinct self-join — values must agree exactly (bitmaps are exact,
    unlike HLL/theta sketches).
    """
    ev = table(spark, sf_dir, "events")
    per_bucket = ev.groupBy(
        "event_type", F.expr("bitmap_bucket_number(user_id)").alias("bkt")
    ).agg(
        F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias("bm")
    )
    sizes = per_bucket.groupBy("event_type").agg(
        F.expr("sum(bitmap_count(bm))").cast("bigint").alias("n")
    )
    types = per_bucket.select("event_type").distinct()
    pairs = (
        types.select(F.col("event_type").alias("type_a"))
        .join(
            types.select(F.col("event_type").alias("type_b")),
            F.col("type_a") < F.col("type_b"),
        )
    )
    # Each pair pulls in both member types' bucket bitmaps. Two equi
    # broadcast joins (one per pair role) instead of one OR-predicate
    # join — the disjunction would plan as a nested loop; as equi legs
    # both sides stay BroadcastHashJoin.
    legs = per_bucket.join(
        F.broadcast(pairs), F.col("event_type") == F.col("type_a")
    ).select("type_a", "type_b", "bkt", "bm").unionByName(
        per_bucket.join(
            F.broadcast(pairs), F.col("event_type") == F.col("type_b")
        ).select("type_a", "type_b", "bkt", "bm")
    )
    union_counts = (
        legs.groupBy("type_a", "type_b", "bkt")
        .agg(F.expr("bitmap_or_agg(bm)").alias("bm"))
        .groupBy("type_a", "type_b")
        .agg(F.expr("sum(bitmap_count(bm))").cast("bigint").alias("n_union"))
    )
    joined = (
        union_counts.join(
            F.broadcast(sizes.select(F.col("event_type").alias("type_a"),
                                     F.col("n").alias("n_a"))),
            "type_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("event_type").alias("type_b"),
                                     F.col("n").alias("n_b"))),
            "type_b",
        )
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            (F.col("n_a") + F.col("n_b") - F.col("n_union")).alias("n_overlap"),
            "n_union",
        )
    )
    return joined.filter(F.col("n_overlap") > 0).select(
        "type_a",
        "type_b",
        "n_a",
        "n_b",
        "n_overlap",
        trunc_digits(
            F.col("n_overlap").cast("double") / F.col("n_union"), 4
        ).alias("jaccard"),
    )


@query(
    "agg_weighted_median",
    oracle="""
    WITH w AS (
      SELECT l_returnflag AS flag,
             l_extendedprice AS v,
             CAST(l_quantity AS BIGINT) AS wt
      FROM lineitem
    ), ordered AS (
      SELECT flag, v, wt,
             SUM(wt) OVER (PARTITION BY flag ORDER BY v, wt
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
             SUM(wt) OVER (PARTITION BY flag) AS tw
      FROM w
    )
    SELECT flag, MIN(v) AS weighted_median, CAST(MIN(tw) AS BIGINT) AS total_weight
    FROM ordered
    WHERE cw * 2 >= tw
    GROUP BY flag
    """,
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median price per return flag — the aggregate
    Spark has no built-in for (``percentile`` is unweighted), built
    from its windowed definition: order values within the group, take
    the first whose running weight reaches half the total.

    One key exchange serves both windows (running weight and group
    total share the partition); the crossing point is found by a
    filter + MIN rather than any per-group loop, and the ≥-half test
    is integer cross-multiplication (cw·2 ≥ tw) — no FP at the
    boundary. Weights are exact integers (l_quantity); the median
    VALUE passes through untouched, so the hash can't drift. At
    100 TB this is the plan a warehouse picks for weighted quantiles:
    sort within group key, single pass.
    """
    from pyspark.sql.window import Window

    w = table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("v"),
        F.col("l_quantity").cast("bigint").alias("wt"),
    )
    wr = (
        Window.partitionBy("flag")
        .orderBy("v", "wt")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt_tot = Window.partitionBy("flag")
    ordered = w.select(
        "flag",
        "v",
        F.sum("wt").over(wr).alias("cw"),
        F.sum("wt").over(wt_tot).alias("tw"),
    )
    return (
        ordered.filter(F.col("cw") * 2 >= F.col("tw"))
        .groupBy("flag")
        .agg(
            F.min("v").alias("weighted_median"),
            F.min("tw").cast("bigint").alias("total_weight"),
        )
    )


@query(
    "agg_rfm_segments",
    oracle="""
    WITH base AS (
      SELECT o_custkey,
             CAST(date_diff('day', MAX(CAST(o_orderdate AS DATE)),
                  (SELECT MAX(CAST(o_orderdate AS DATE)) FROM orders))
               AS BIGINT) AS recency_days,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 2)
               AS monetary
      FROM orders GROUP BY o_custkey
    ), cuts AS (
      SELECT quantile_cont(recency_days, 0.25) AS r1,
             quantile_cont(recency_days, 0.50) AS r2,
             quantile_cont(recency_days, 0.75) AS r3,
             quantile_cont(frequency, 0.25) AS f1,
             quantile_cont(frequency, 0.50) AS f2,
             quantile_cont(frequency, 0.75) AS f3,
             quantile_cont(monetary, 0.25) AS m1,
             quantile_cont(monetary, 0.50) AS m2,
             quantile_cont(monetary, 0.75) AS m3
      FROM base
    )
    SELECT o_custkey, recency_days, frequency, monetary,
           (CASE WHEN recency_days <= r1 THEN 4 WHEN recency_days <= r2 THEN 3
                 WHEN recency_days <= r3 THEN 2 ELSE 1 END) AS r_score,
           (CASE WHEN frequency <= f1 THEN 1 WHEN frequency <= f2 THEN 2
                 WHEN frequency <= f3 THEN 3 ELSE 4 END) AS f_score,
           (CASE WHEN monetary <= m1 THEN 1 WHEN monetary <= m2 THEN 2
                 WHEN monetary <= m3 THEN 3 ELSE 4 END) AS m_score
    FROM base, cuts
    """,
)
def agg_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (recency / frequency / monetary
    quartile scores) — the classic marketing-analytics derivation.

    Scale shape: the tempting formulation is three global ``ntile(4)``
    windows, but a global ntile is a full sort into ONE partition — a
    non-starter at 100 TB. Instead the quartile CUT-POINTS are computed
    once (exact interpolated percentiles over the per-customer
    aggregate — a one-row relation) and broadcast back; scoring is then
    a stateless projection, embarrassingly parallel. The anchor date
    (global max order date) rides the same one-row broadcast. Exact
    decimal money sums and integer day/count metrics keep every
    boundary comparison bit-identical in both engines.
    """
    o = table(spark, sf_dir, "orders")
    anchor = o.agg(
        F.max(F.col("o_orderdate").cast("date")).alias("anchor_date")
    )
    base = (
        o.groupBy("o_custkey")
        .agg(
            F.max(F.col("o_orderdate").cast("date")).alias("last_order"),
            F.count(F.lit(1)).cast("bigint").alias("frequency"),
            F.sum(money(F.col("o_totalprice"))).alias("_mdec"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "o_custkey",
            F.datediff("anchor_date", "last_order")
            .cast("bigint")
            .alias("recency_days"),
            "frequency",
            F.round(F.col("_mdec").cast("double"), 2).alias("monetary"),
        )
    )
    cuts = base.agg(
        *[
            F.expr(f"percentile({c}, {q})").alias(f"{c[0]}{i}")
            for c in ("recency_days", "frequency", "monetary")
            for i, q in ((1, 0.25), (2, 0.50), (3, 0.75))
        ]
    )
    r = F.col("recency_days")
    f_ = F.col("frequency")
    m = F.col("monetary")
    return base.crossJoin(F.broadcast(cuts)).select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary",
        F.when(r <= F.col("r1"), 4)
        .when(r <= F.col("r2"), 3)
        .when(r <= F.col("r3"), 2)
        .otherwise(1)
        .alias("r_score"),
        F.when(f_ <= F.col("f1"), 1)
        .when(f_ <= F.col("f2"), 2)
        .when(f_ <= F.col("f3"), 3)
        .otherwise(4)
        .alias("f_score"),
        F.when(m <= F.col("m1"), 1)
        .when(m <= F.col("m2"), 2)
        .when(m <= F.col("m3"), 3)
        .otherwise(4)
        .alias("m_score"),
    )


@query(
    "agg_kmv_sketch",
    oracle="""
    WITH hashed AS (
      SELECT DISTINCT event_type,
             (user_id * 654435761 + 97) % 1000000007 AS h
      FROM events
    ), ranked AS (
      SELECT event_type, h,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS r
      FROM hashed
    ), kept AS (
      SELECT event_type, COUNT(*) AS n_kept, MAX(h) AS kth
      FROM ranked WHERE r <= 16 GROUP BY event_type
    )
    SELECT event_type, n_kept,
           CASE WHEN n_kept < 16 THEN CAST(n_kept AS DOUBLE)
                ELSE CAST(floor(15.0 * 1000000007 / kth * 100) AS DOUBLE) / 100
           END AS est_distinct
    FROM kept
    """,
)
def agg_kmv_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct sketch: estimate NDV(user_id) per
    event_type from only the k=16 smallest hash values.

    The sketch the reference-era engines reach for when HLL's fixed
    registers don't suffice: KMV supports set algebra (union = merge
    min-heaps, intersection via Jaccard on the combined k-sample) and
    its state is k hashes — mergeable map-side, constant memory per
    group. Estimator: (k-1)·P/h_k (the kth smallest of n uniform
    hashes on [0,P] sits near k·P/n). Deterministic by construction —
    the hash is the repo's arithmetic 2-universal family, so DuckDB
    re-derives identical sketches and the ORACLE CHECKS THE ESTIMATE
    EXACTLY, not within tolerance.

    Scale: distinct-then-window shuffles (event_type, h) pairs once;
    the row_number window partitions by group key (no global sort).
    At 100 TB swap the exact DISTINCT for the same agg over partial
    per-partition top-k (Spark's partial aggregation already bounds
    map-side state to k values per group).
    """
    from pyspark.sql.window import Window

    k = 16
    p = 1_000_000_007
    h = (F.col("user_id") * 654_435_761 + 97) % p
    d = (
        table(spark, sf_dir, "events")
        .select("event_type", h.alias("h"))
        .distinct()
    )
    w = Window.partitionBy("event_type").orderBy("h")
    kept = (
        d.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= k)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_kept"), F.max("h").alias("kth"))
    )
    return kept.select(
        "event_type",
        "n_kept",
        F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
        .otherwise(
            trunc_digits(F.lit(float(k - 1)) * p / F.col("kth"), 2)
        )
        .alias("est_distinct"),
    )


@query(
    "agg_listagg",
    oracle="""
    SELECT c_nationkey,
           string_agg(c_name, ',' ORDER BY c_name) AS top_names
    FROM (
      SELECT c_nationkey, c_name,
             ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    ) WHERE rn <= 5
    GROUP BY c_nationkey
    """,
)
def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG (SQL:2016) — ordered string concatenation per group,
    here over each nation's top-5 customers by balance.

    Spark has no LISTAGG keyword; the equivalent composition is
    collect_list → array_sort → array_join, with the top-5 pre-limit
    keeping every group's aggregation state bounded (never LISTAGG an
    unbounded group at scale — the state is the concatenated string).
    The WindowGroupLimit pre-filter is the same top-k shape the rank
    family uses.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    top = (
        table(spark, sf_dir, "customer")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
    )
    return top.groupBy("c_nationkey").agg(
        F.array_join(F.array_sort(F.collect_list("c_name")), ",").alias(
            "top_names"
        )
    )


@query(
    "agg_percentile_disc",
    oracle="""
    SELECT o_orderpriority,
           percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice) AS p25,
           percentile_disc(0.50) WITHIN GROUP (ORDER BY o_totalprice) AS p50,
           percentile_disc(0.90) WITHIN GROUP (ORDER BY o_totalprice) AS p90
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-set aggregate (SQL:2003 WITHIN GROUP): discrete
    percentiles — the smallest actual value whose cumulative
    distribution reaches p.

    Unlike the interpolated `agg_percentile`, DISC returns values that
    exist in the data, so the result is bitwise-exact on both engines
    with no truncation insurance needed — the right choice when the
    percentile must be an observable (a real order price, a real
    latency), e.g. for SLO reporting. Same WITHIN GROUP SQL text runs
    verbatim on Spark (3.4+) and DuckDB.

    Scale: per-group exact percentile sorts group-locally after one
    hash shuffle on the group key; for 100 TB hot paths prefer the
    sketch (`agg_approx_percentile`).
    """
    from tpctools_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority,
               percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice) AS p25,
               percentile_disc(0.50) WITHIN GROUP (ORDER BY o_totalprice) AS p50,
               percentile_disc(0.90) WITHIN GROUP (ORDER BY o_totalprice) AS p90
        FROM orders
        GROUP BY o_orderpriority
        """
    )


@query(
    "agg_grouping_indicator",
    oracle="""
    SELECT NULLIF(o_orderpriority, '3-MEDIUM') AS prio,
           CAST(GROUPING(NULLIF(o_orderpriority, '3-MEDIUM')) AS BIGINT)
             AS is_total,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY ROLLUP(NULLIF(o_orderpriority, '3-MEDIUM'))
    """,
)
def agg_grouping_indicator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING() indicator — the only correct way to tell a subtotal
    row from a genuine NULL group value.

    The NULLIF deliberately turns one real priority into a NULL data
    value, so the result contains TWO rows with prio = NULL: the
    '3-MEDIUM' value group and the rollup grand total. COALESCE
    labeling (what `agg_grouping_sets` uses on NULL-free columns)
    cannot distinguish them; GROUPING() = 1 marks exactly the
    aggregated-away row, per the SQL standard. Same shape both engines,
    one hash aggregate after Expand.
    """
    o = table(spark, sf_dir, "orders").withColumn(
        "prio",
        F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM"))
        if hasattr(F, "nullif")
        else F.when(
            F.col("o_orderpriority") == "3-MEDIUM", F.lit(None)
        ).otherwise(F.col("o_orderpriority")),
    )
    return o.rollup("prio").agg(
        F.grouping("prio").cast("bigint").alias("is_total"),
        F.count(F.lit(1)).alias("n_orders"),
    ).select("prio", "is_total", "n_orders")


# Fixed-grid histogram sketch: bucket width 2^14 cents ($163.84). The
# bucket id is a pure function of the VALUE, so per-partition histograms
# merge by adding counts — the mergeability approx_percentile gets from
# its KLL sketch, here with a deterministic, engine-independent answer
# (error bound = one bucket width, by construction).
_HGQ_WIDTH = 1 << 14


def _histogram_quantile_sql() -> str:
    return f"""
    WITH c AS (
      SELECT o_orderstatus,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               AS cents
      FROM orders
    ),
    hist AS (
      SELECT o_orderstatus, cents // {_HGQ_WIDTH} AS bucket,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM c GROUP BY 1, 2
    ),
    cum AS (
      SELECT o_orderstatus, bucket, cnt,
             SUM(cnt) OVER (PARTITION BY o_orderstatus ORDER BY bucket)
               AS cum,
             SUM(cnt) OVER (PARTITION BY o_orderstatus) AS n
      FROM hist
    ),
    edges AS (
      SELECT o_orderstatus, CAST(MAX(n) AS BIGINT) AS n_rows,
             MIN(CASE WHEN cum * 100 >= n * 50 THEN bucket END)
               * {_HGQ_WIDTH} AS p50_edge_cents,
             MIN(CASE WHEN cum * 100 >= n * 90 THEN bucket END)
               * {_HGQ_WIDTH} AS p90_edge_cents,
             MIN(CASE WHEN cum * 100 >= n * 99 THEN bucket END)
               * {_HGQ_WIDTH} AS p99_edge_cents
      FROM cum GROUP BY o_orderstatus
    ),
    exact AS (
      SELECT o_orderstatus,
             quantile_disc(cents, 0.50) AS e50,
             quantile_disc(cents, 0.90) AS e90,
             quantile_disc(cents, 0.99) AS e99
      FROM c GROUP BY o_orderstatus
    )
    SELECT e.o_orderstatus, g.n_rows,
           g.p50_edge_cents, g.p90_edge_cents, g.p99_edge_cents,
           (e.e50 >= g.p50_edge_cents
              AND e.e50 < g.p50_edge_cents + {_HGQ_WIDTH}
            AND e.e90 >= g.p90_edge_cents
              AND e.e90 < g.p90_edge_cents + {_HGQ_WIDTH}
            AND e.e99 >= g.p99_edge_cents
              AND e.e99 < g.p99_edge_cents + {_HGQ_WIDTH}) AS bound_ok
    FROM edges g JOIN exact e ON g.o_orderstatus = e.o_orderstatus
    ORDER BY e.o_orderstatus
    """


@query("agg_histogram_quantile", oracle=_histogram_quantile_sql())
def agg_histogram_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable fixed-grid quantile sketch with a DETERMINISTIC answer
    — the third point of the percentile triangle: `agg_percentile` is
    exact but needs the values, `agg_approx_percentile` is bounded-
    memory but engine-specific; this is bounded-memory AND engine-
    independent, because the "sketch" is a value-keyed histogram.

    Bucket = cents div 2^14: a pure function of the value, so per-
    partition histograms merge by adding counts (map-side combine IS
    the merge), state is value-domain-bounded (never data-sized), and
    the quantile answer — the lower edge of the first bucket whose
    cumulative count crosses ceil(q·n), integer cross-multiplied — is
    identical on every engine with error ≤ one bucket width by
    construction. The in-query `bound_ok` audit proves that bound
    against the exact discrete percentile on both engines. The
    cumulative window partitions by group over the DOMAIN-bounded
    histogram, never over raw rows — at 100 TB rows stream through the
    combine; only ≤(groups × buckets) rows reach the window.
    """
    from pyspark.sql.window import Window

    c = table(spark, sf_dir, "orders").select(
        "o_orderstatus",
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    hist = c.groupBy(
        "o_orderstatus", F.expr(f"cents div {_HGQ_WIDTH}").alias("bucket")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    wk = Window.partitionBy("o_orderstatus")
    cum = hist.select(
        "o_orderstatus",
        "bucket",
        F.sum("cnt").over(wk.orderBy("bucket")).alias("cum"),
        F.sum("cnt").over(wk).alias("n"),
    )
    def edge(q100: int):
        return (
            F.min(
                F.when(F.col("cum") * 100 >= F.col("n") * q100, F.col("bucket"))
            )
            * _HGQ_WIDTH
        )
    edges = cum.groupBy("o_orderstatus").agg(
        F.max("n").cast("bigint").alias("n_rows"),
        edge(50).alias("p50_edge_cents"),
        edge(90).alias("p90_edge_cents"),
        edge(99).alias("p99_edge_cents"),
    )
    exact = c.groupBy("o_orderstatus").agg(
        F.expr("percentile_disc(0.50) WITHIN GROUP (ORDER BY cents)").alias("e50"),
        F.expr("percentile_disc(0.90) WITHIN GROUP (ORDER BY cents)").alias("e90"),
        F.expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY cents)").alias("e99"),
    )
    within = lambda e, p: (F.col(e) >= F.col(p)) & (  # noqa: E731
        F.col(e) < F.col(p) + _HGQ_WIDTH
    )
    return (
        edges.join(exact, "o_orderstatus")
        .select(
            "o_orderstatus",
            "n_rows",
            "p50_edge_cents",
            "p90_edge_cents",
            "p99_edge_cents",
            (
                within("e50", "p50_edge_cents")
                & within("e90", "p90_edge_cents")
                & within("e99", "p99_edge_cents")
            ).alias("bound_ok"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "agg_kmv_intersect",
    oracle="""
    WITH hashed AS (
      SELECT DISTINCT
             CASE WHEN event_type = 'purchase' THEN 'a' ELSE 'b' END AS s,
             (user_id * 654435761 + 97) % 1000000007 AS h
      FROM events WHERE event_type IN ('purchase', 'click')
    ),
    tagged AS (
      SELECT s, h FROM hashed
      UNION ALL
      SELECT DISTINCT 'u' AS s, h FROM hashed
    ),
    ranked AS (
      SELECT s, h,
             ROW_NUMBER() OVER (PARTITION BY s ORDER BY h) AS r
      FROM tagged
    ),
    kept AS (SELECT s, h FROM ranked WHERE r <= 16),
    union_k AS (
      SELECT COUNT(*) AS n_kept, MAX(h) AS kth FROM kept WHERE s = 'u'
    ),
    common AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m
      FROM kept u
      JOIN kept a ON a.s = 'a' AND a.h = u.h
      JOIN kept b ON b.s = 'b' AND b.h = u.h
      WHERE u.s = 'u'
    ),
    exact AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS exact_common
      FROM (SELECT h FROM hashed WHERE s = 'a'
            INTERSECT
            SELECT h FROM hashed WHERE s = 'b')
    )
    SELECT m AS n_common_sample,
           CASE WHEN n_kept < 16 THEN CAST(n_kept AS DOUBLE)
                ELSE CAST(floor(15.0 * 1000000007 / kth * 100) AS DOUBLE)
                     / 100
           END AS union_est,
           CASE WHEN n_kept < 16 THEN CAST(m AS DOUBLE)
                ELSE CAST(floor((m * 15.0 * 1000000007)
                                / (16.0 * kth) * 100) AS DOUBLE) / 100
           END AS intersect_est,
           exact_common
    FROM union_k, common, exact
    """,
)
def agg_kmv_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch set algebra — the intersection estimate
    ``agg_kmv_sketch``'s docstring promises: purchase-users ∩
    click-users from three k=16 sketches (A, B, and the merged
    union), never from the raw sets.

    The estimator is the textbook one: the union sketch's k smallest
    hashes are a uniform sample of A∪B, so the fraction m/k of them
    present in BOTH per-set sketches estimates Jaccard, and
    |A∩B| ≈ (m/k)·NDV_est(A∪B) with NDV_est = (k−1)·P/h_k. Everything
    is derived from the repo's deterministic 2-universal hash, so the
    oracle re-derives identical sketches and checks the ESTIMATE
    exactly; the exact intersection rides along for calibration.
    Sketch membership joins touch ≤ 3k rows. Scale: per-set state is
    k hashes (mergeable map-side); the union sketch merges the two
    k-heaps — constant memory however large the sets, the whole point
    of sketch set algebra at 100 TB.
    """
    from pyspark.sql.window import Window

    k = 16
    p = 1_000_000_007
    h = (F.col("user_id") * 654_435_761 + 97) % p
    hashed = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "click"))
        .select(
            F.when(F.col("event_type") == "purchase", F.lit("a"))
            .otherwise(F.lit("b"))
            .alias("s"),
            h.alias("h"),
        )
        .distinct()
    )
    tagged = hashed.unionByName(
        hashed.select(F.lit("u").alias("s"), "h").distinct()
    )
    w = Window.partitionBy("s").orderBy("h")
    kept = tagged.withColumn("r", F.row_number().over(w)).filter(
        F.col("r") <= k
    )
    union_k = kept.filter(F.col("s") == "u").agg(
        F.count(F.lit(1)).alias("n_kept"), F.max("h").alias("kth")
    )
    ka = kept.filter(F.col("s") == "a").select(F.col("h").alias("ha"))
    kb = kept.filter(F.col("s") == "b").select(F.col("h").alias("hb"))
    common = (
        kept.filter(F.col("s") == "u")
        .join(F.broadcast(ka), F.col("h") == F.col("ha"))
        .join(F.broadcast(kb), F.col("h") == F.col("hb"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    )
    exact = (
        hashed.groupBy("h")
        .agg(F.countDistinct("s").alias("ns"))
        .filter(F.col("ns") == 2)
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_common"))
    )
    small = F.col("n_kept") < k
    return (
        common.crossJoin(F.broadcast(union_k))
        .crossJoin(F.broadcast(exact))
        .select(
            F.col("m").alias("n_common_sample"),
            F.when(small, F.col("n_kept").cast("double"))
            .otherwise(
                F.floor(
                    F.lit(float(k - 1)) * p / F.col("kth") * 100
                ).cast("double")
                / 100
            )
            .alias("union_est"),
            F.when(small, F.col("m").cast("double"))
            .otherwise(
                F.floor(
                    (F.col("m") * float(k - 1) * p)
                    / (float(k) * F.col("kth"))
                    * 100
                ).cast("double")
                / 100
            )
            .alias("intersect_est"),
            "exact_common",
        )
    )
