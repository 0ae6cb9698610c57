"""§2.B.4 — aggregations.

Every groupBy here compiles to partial (map-side) + final hash aggregation
— the shuffle moves pre-aggregated partials, not raw rows, so these scale
with group cardinality, not input size. Money sums use exact decimal math
(see ``_util``) so hashes match the DuckDB oracle bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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
