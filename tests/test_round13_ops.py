"""Semantic guards for the round-13 additions, beyond oracle equality:
the BH planted-shift and components-chain tests live in
test_round12_ops.py (added this round); here, the shard-dedup planner's
estimator calibration — an oracle proves Spark ≡ DuckDB, but only a
ground-truth comparison proves the ESTIMATES mean anything (the lesson
of the round-13 PQ recall fix)."""

from __future__ import annotations

from tpctools_spark.registry import spark_queries

SF = "/root/testdata/sf0.001"


def test_shard_dedup_plan_estimates_are_calibrated(spark):
    """Structural invariants + KMV calibration: every pair's sketch
    intersection estimate must land within 4x of the exact shingle
    intersection (k=16 KMV has ~1/sqrt(k) relative error; measured
    ratios at this fixture span 0.42-1.90)."""
    rows = spark_queries()["pipeline_shard_dedup_plan"](spark, SF).collect()
    assert len(rows) == 6  # C(4,2) shard pairs
    seen = set()
    for r in rows:
        assert r.shard_a < r.shard_b
        seen.add((r.shard_a, r.shard_b))
        assert 0 <= r.n_common_sample <= 16
        assert r.intersect_est <= r.union_est
        assert r.union_est > 0 and r.exact_common >= 0
        # calibration against ground truth (all fixture pairs overlap)
        assert r.exact_common > 0
        assert r.exact_common / 4 <= r.intersect_est <= r.exact_common * 4, (
            r.shard_a, r.shard_b, r.intersect_est, r.exact_common,
        )
    assert len(seen) == 6
