"""Physical-plan + invariant assertions for the round-6 additions
(graph ops, count-min sketch, bitmap distinct, streaks).

Locks the scale-relevant shapes: the CMS probe must broadcast the
(d·W)-bounded sketch, never shuffle the key table against it; the
bitmap distinct must aggregate bitmaps (two-level), not expand a
distinct; the streak window and its aggregations must share one
user_id exchange; pagerank must stay a static 3-round DAG with the
node-count as a broadcast.
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    df.collect()
    s = df._jdf.queryExecution().executedPlan().toString()
    return s.split("+- == Initial Plan ==")[0]


def test_cms_probe_broadcasts_sketch(spark):
    from tpctools_spark.registry import spark_queries

    df = spark_queries()["agg_count_min_sketch"](spark, SF)
    plan = _plan(df)
    # the sketch side is bounded by d*W rows — it must broadcast; a
    # shuffled join here would move the keys table for no reason.
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_cms_estimates_never_underestimate(spark):
    from tpctools_spark.registry import spark_queries

    rows = spark_queries()["agg_count_min_sketch"](spark, SF).collect()
    assert rows, "CMS top-k should be non-empty"
    for r in rows:
        assert r.est_count >= r.exact_count  # CMS bias is one-sided


def test_bitmap_distinct_no_expand(spark):
    from tpctools_spark.registry import spark_queries

    df = spark_queries()["agg_bitmap_distinct"](spark, SF)
    plan = _plan(df)
    # COUNT(DISTINCT) plans through Expand; the bitmap formulation must
    # not — dedup state is the bitmap itself.
    assert "Expand" not in plan
    assert "bitmap_construct_agg" in plan or "HashAggregate" in plan


def test_streaks_single_user_exchange(spark):
    from tpctools_spark.registry import spark_queries

    df = spark_queries()["events_streaks"](spark, SF)
    plan = _plan(df)
    # distinct(user, day), the islands window, both group-bys and the
    # best-streak window all hash-partition by user_id (or a superset
    # starting with it) — Catalyst must reuse, not re-shuffle per step.
    assert plan.count("Exchange hashpartitioning") <= 2


def test_pagerank_mass_conservation(spark):
    from tpctools_spark.registry import spark_queries

    rows = spark_queries()["graph_pagerank_power"](spark, SF).collect()
    assert len(rows) == 20
    # fixed-point ranks are positive and bounded by total mass
    for r in rows:
        assert 0 < r.rank_ppb < 1_000_000_000


def test_triangle_count_positive_and_stable(spark):
    from tpctools_spark.registry import spark_queries

    df = spark_queries()["graph_triangle_count"](spark, SF)
    n1 = df.collect()[0].n_triangles
    n2 = (
        spark_queries()["graph_triangle_count"](spark, SF)
        .repartition(7)
        .collect()[0]
        .n_triangles
    )
    assert n1 > 0
    assert n1 == n2  # partitioning-invariant


def test_funnel_window_no_per_user_sort(spark):
    from tpctools_spark.registry import spark_queries

    df = spark_queries()["events_funnel_window"](spark, SF)
    plan = _plan(df)
    # the timed funnel is chained conditional aggs — a Window/sort here
    # would mean it regressed to a sequential per-user scan.
    assert "Window" not in plan
    assert "HashAggregate" in plan


def test_novelty_two_aggregate_passes(spark):
    from tpctools_spark.registry import spark_queries

    df = spark_queries()["text_novelty_ratio"](spark, SF)
    plan = _plan(df)
    # gram->first_doc agg + postings rejoin + per-doc agg: bounded
    # exchange count, no cartesian anything.
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_phash_shuffles_hashes_not_payloads(spark):
    from tpctools_spark.registry import spark_queries

    df = spark_queries()["multimodal_phash_dedup"](spark, SF)
    plan = _plan(df)
    assert "MapInPandas" in plan
    # the dedup groupBy must aggregate AFTER the hash stage: the only
    # exchange carries (phash, partial agg), never payload bytes.
    after = plan.split("MapInPandas")[0]  # toString prints top-down
    assert "Exchange" in after


def test_try_arithmetic_stays_codegen(spark):
    from tpctools_spark.registry import spark_queries

    df = spark_queries()["scalar_try_arithmetic"](spark, SF)
    plan = _plan(df)
    # executedPlan().toString() marks codegen stages as "*(n)"
    assert "*(1)" in plan
    assert "Python" not in plan  # no UDF fallback
    assert "PushedFilters: [IsNotNull(o_orderkey), LessThanOrEqual" in plan


def test_asof_tolerance_single_exchange(spark):
    from tpctools_spark.registry import spark_queries

    df = spark_queries()["join_asof_tolerance"](spark, SF)
    plan = _plan(df)
    # union+window formulation: one hash exchange on user_id, no join.
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SortMergeJoin" not in plan
