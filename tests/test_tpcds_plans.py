"""Physical-plan assertions for the TPC-DS query shapes.

The correctness gate (check_oracle / driver) proves values; these prove
the plans carry the 100 TB posture the docstrings claim: dimensions
broadcast, facts shuffle only where the shape requires it.
"""

from __future__ import annotations


def _plan(df) -> str:
    df.collect()
    s = df._jdf.queryExecution().executedPlan().toString()
    # AQE prints "== Final Plan ==" followed by "== Initial Plan ==";
    # assert only against the plan that actually ran
    return s.split("== Initial Plan ==")[0]


def test_q96_star_probe_all_dims_broadcast(spark):
    """Every dim joins as BroadcastHashJoin; the fact side never
    exchanges before the final single-row reduce."""
    from tpctools_spark.registry import spark_queries

    plan = _plan(
        spark_queries()["tpcds_q96_evening_traffic"](spark, "/root/testdata/sf0.001")
    )
    assert plan.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in plan
    # only exchanges: broadcast distribution + the global agg's SinglePartition
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            raise AssertionError(f"unexpected wide exchange: {line}")


def test_q93_fact_fact_join_is_shuffle_not_broadcast_at_scale(spark):
    """With broadcast disabled (at 100 TB neither fact fits), the
    composite-key join degrades to exactly one exchange per side on
    (item, ticket) — no nested loop, no replication."""
    from tpctools_spark.registry import spark_queries

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(
            spark_queries()["tpcds_q93_actual_sales"](spark, "/root/testdata/sf0.001")
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q5_single_wide_exchange_for_rollup(spark):
    """Six fact legs union map-side; the only wide shuffle is the
    rollup's aggregation exchange (expand → partial agg → exchange)."""
    from tpctools_spark.registry import spark_queries

    plan = _plan(
        spark_queries()["tpcds_q5_channel_rollup"](spark, "/root/testdata/sf0.001")
    )
    assert "Expand" in plan  # rollup lattice
    wide = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    # AQE may reuse the exchange; every wide exchange must be the
    # rollup grouping, never a join-key redistribution of a fact leg
    assert wide, "expected the rollup aggregation exchange"
    for ln in wide:
        assert "channel" in ln, f"unexpected wide exchange: {ln}"


def test_q36_grouping_levels_match_spec_lattice(spark):
    """ROLLUP emits exactly the 3 hierarchy levels with the spec's
    lochierarchy encoding (0=leaf, 1=category subtotal, 3=grand)."""
    from tpctools_spark.registry import spark_queries

    rows = (
        spark_queries()["tpcds_q36_margin_rank"](spark, "/root/testdata/sf0.001")
        .collect()
    )
    levels = {r.lochierarchy for r in rows}
    assert levels == {0, 1, 3}
    grand = [r for r in rows if r.lochierarchy == 3]
    assert len(grand) == 1
    assert grand[0].i_category is None and grand[0].i_class is None
    # ranks restart inside each (level, parent) partition
    leaf_ranks = sorted(
        r.rank_within_parent
        for r in rows
        if r.lochierarchy == 0 and r.i_category == rows[0].i_category
    )
    assert leaf_ranks[0] == 1


def test_q94_semi_anti_pair(spark):
    """The EXISTS/NOT-EXISTS pair compiles to a semi and an anti join
    on the order key — never a nested loop or cartesian expansion."""
    from tpctools_spark.registry import spark_queries

    plan = _plan(
        spark_queries()["tpcds_q94_multi_mode_orders"](spark, "/root/testdata/sf0.001")
    )
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q9_single_fact_scan(spark):
    """The spec's 15 scalar subqueries fuse into ONE store_sales scan
    (conditional aggregation), not 15."""
    from tpctools_spark.registry import spark_queries

    plan = _plan(
        spark_queries()["tpcds_q9_quantity_brackets"](spark, "/root/testdata/sf0.001")
    )
    assert plan.count("store_sales") <= 2  # scan + reuse mention, never 15


def test_q62_all_dims_broadcast(spark):
    """Shipping-lag histogram: four broadcast dims, single fact-side
    aggregation exchange, lag arithmetic stays in the scan stage."""
    from tpctools_spark.registry import spark_queries

    plan = _plan(
        spark_queries()["tpcds_q62_web_ship_lag"](spark, "/root/testdata/sf0.001")
    )
    assert plan.count("BroadcastHashJoin") == 4
    assert "SortMergeJoin" not in plan


def test_q47_windows_share_one_exchange(spark):
    """Both window operators (yearly stats + lag/lead) run off a single
    wide exchange past the monthly rollup — the (cat,brand,store)
    partitioning satisfies the year-partitioned window's clustering."""
    from tpctools_spark.registry import spark_queries

    df = spark_queries()["tpcds_q47_monthly_deviation"](
        spark, "/root/testdata/sf0.001"
    )
    plan = _plan(df)
    assert plan.count("Window") == 2
    wide = [
        line for line in plan.splitlines() if "Exchange hashpartitioning" in line
    ]
    assert len(wide) == 2  # rollup exchange + ONE shared window exchange


def test_q67_rollup_feeds_single_window_exchange(spark):
    """Top-k over rollup: exactly one Expand (the 8-level rollup's
    grouping-set expansion) and one ranking Window, with the window's
    exchange partitioned on the category — the WindowGroupLimit shape
    that keeps per-partition top-k below the final exchange."""
    from tpctools_spark.registry import spark_queries

    plan = _plan(
        spark_queries()["tpcds_q67_topk_over_rollup"](spark, "/root/testdata/sf0.001")
    )
    assert plan.count("Expand") == 1
    assert "Window" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q38_intersect_plans_as_single_flag_aggregate(spark):
    """Three-channel INTERSECT runs as ONE flag aggregation over the
    unioned channel legs (r9 A/B: +9.2% vs the semi-join chain, and
    one exchange instead of five) — no set-op joins, no cross
    product, and exactly one wide exchange on the identity key."""
    from tpctools_spark.registry import spark_queries

    plan = _plan(
        spark_queries()["tpcds_q38_triple_channel_intersect"](
            spark, "/root/testdata/sf0.001"
        )
    )
    assert "LeftSemi" not in plan  # the old 3-distinct + 2-semi chain
    assert "Union" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # one wide exchange: the flag aggregate's hashpartitioning on the
    # (last, first, date) identity; the count-agg above it is a single
    # partition of one row
    wide = [
        ln
        for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln and "c_last_name" in ln
    ]
    assert len(wide) == 1, plan


def test_q16_order_gates_share_the_order_key(spark):
    """The multi-mode HAVING gate, the semi join, and the anti join
    all key on cs_order_number; no nested loop appears and returns
    join anti."""
    from tpctools_spark.registry import spark_queries

    plan = _plan(
        spark_queries()["tpcds_q16_catalog_multi_mode_no_return"](
            spark, "/root/testdata/sf0.001"
        )
    )
    assert "LeftAnti" in plan
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_q72_shortfall_join_is_hash_not_nested_loop(spark):
    """The inventory×demand same-week join has an equi component
    (item + week), so the shortfall residual must ride on a hash join
    — a nested-loop here would be quadratic at scale."""
    from tpctools_spark.registry import spark_queries

    plan = _plan(
        spark_queries()["tpcds_q72_inventory_shortfall"](
            spark, "/root/testdata/sf0.001"
        )
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q74_periods_plan_as_channel_pivots(spark):
    """Q74's two-period growth comparison runs as ONE conditional
    aggregate per channel (r10 A/B: +40.1% sign-stable vs the 4-leg
    filter-and-join form, 2.644 s vs 4.416 s min-of-5 at sf1) — two
    fact aggregates, two customer joins, no exchange-reuse legs."""
    from tpctools_spark.registry import spark_queries

    plan = _plan(
        spark_queries()["tpcds_q74_quantity_growth"](
            spark, "/root/testdata/sf0.001"
        )
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # exactly two joins key on the customer surrogate (one pivoted
    # aggregate per channel; the 4-leg form had four) — join STRATEGY
    # is AQE's choice and not pinned
    joins = [
        ln
        for ln in plan.splitlines()
        if "Join" in ln and "c_customer_sk" in ln
    ]
    assert len(joins) == 2, plan
