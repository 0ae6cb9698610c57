"""Invariant checks for sketch-based aggregates (no SQL oracle exists —
sketch internals are engine-specific, so correctness is asserted against
exact computations on the same data)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_approx_topk_matches_exact_at_small_cardinality(spark):
    """Below sketch capacity the heavy-hitter counts are exact."""
    from tpctools_spark.catalog import table
    from tpctools_spark.queries.aggregates import agg_approx_topk

    got = {(r.l_partkey, r.n) for r in agg_approx_topk(spark, SF).collect()}
    exact = (
        table(spark, SF, "lineitem")
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "l_partkey")
        .limit(20)
        .collect()
    )
    # every reported (key, count) must be a true count; the reported
    # top-10 counts must match the exact top-10 count multiset
    exact_counts = {r.l_partkey: r.n for r in exact}
    assert all(exact_counts.get(k) == n for k, n in got)
    assert sorted((n for _, n in got), reverse=True) == [r.n for r in exact[:10]]


def test_hll_union_consistent_with_exact(spark):
    from tpctools_spark.queries.aggregates import agg_hll_sketch_union

    rows = {r.o_orderstatus: r for r in agg_hll_sketch_union(spark, SF).collect()}
    # every estimate (per-status and the sketch-union ALL row) must land
    # within the query's published 5% bound of its exact twin
    assert all(r.estimate_ok for r in rows.values())
    # the global exact distinct must sit between the largest part and
    # the sum of the parts (union semantics)
    parts = [r.exact_distinct for s, r in rows.items() if s != "ALL"]
    assert max(parts) <= rows["ALL"].exact_distinct <= sum(parts)
