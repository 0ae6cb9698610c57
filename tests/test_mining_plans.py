"""Physical-plan assertions for the round-5 mining/layout/drift ops.

Locks the shapes that matter at 100 TB: the chunker and Z-order
address must stay shuffle-free (pure row-local codegen), the basket
affinity must broadcast its dimension-sized count tables, the A-ES
sampler must be a TakeOrderedAndProject (never a global sort), and
the SCD2 build must reuse one user_id exchange across both windows
and the segment aggregation.
"""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    df.collect()
    s = df._jdf.queryExecution().executedPlan().toString()
    return s.split("+- == Initial Plan ==")[0]


def test_chunk_overlap_is_shuffle_free(spark):
    from tpctools_spark.registry import spark_queries

    df = spark_queries()["text_chunk_overlap"](spark, SF)
    plan = _plan(df)
    assert "Exchange" not in plan


def test_zorder_address_is_shuffle_free(spark):
    from tpctools_spark.registry import spark_queries

    df = spark_queries()["layout_zorder_address"](spark, SF)
    plan = _plan(df)
    assert "Exchange" not in plan
    # `*(n)` marks a whole-stage-codegen'd span in executedPlan text.
    assert plan.lstrip().startswith("*(1) Project")


def test_basket_lift_broadcasts_dimension_counts(spark):
    from tpctools_spark.registry import spark_queries

    df = spark_queries()["mining_basket_lift"](spark, SF)
    plan = _plan(df)
    # per-item counts are part-cardinality -> broadcast joins; the
    # one-row total is a broadcast nested loop; the only shuffled join
    # is the per-order pair generation.
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_weighted_sample_is_topk_not_global_sort(spark):
    from tpctools_spark.registry import spark_queries

    df = spark_queries()["pipeline_weighted_sample"](spark, SF)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan


def test_quantized_topk_probe_broadcast(spark):
    from tpctools_spark.registry import spark_queries

    df = spark_queries()["sim_cosine_topk_quantized"](spark, SF)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_bpe_pairs_single_count_exchange(spark):
    from tpctools_spark.registry import spark_queries

    df = spark_queries()["mining_bpe_pairs"](spark, SF)
    plan = _plan(df)
    # map-side partial counts -> one |distinct pairs| exchange -> topk.
    assert plan.count("Exchange hashpartitioning") == 1
    assert "TakeOrderedAndProject" in plan


def test_scd2_shares_one_user_exchange(spark):
    from tpctools_spark.registry import spark_queries

    df = spark_queries()["reshape_scd2_history"](spark, SF)
    plan = _plan(df)
    # lag window, running-sum window, segment groupBy, and lead window
    # are all user_id-clustered -> a single hash exchange feeds them.
    assert plan.count("Exchange hashpartitioning") == 1


def test_drift_psi_broadcasts_totals(spark):
    from tpctools_spark.registry import spark_queries

    df = spark_queries()["quality_drift_psi"](spark, SF)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan


def test_bloom_filter_injects_on_probe_side(spark):
    from tpctools_spark.queries.scale_patterns import _BLOOM_CONFS, _bloom_join

    old = {k: None for k in _BLOOM_CONFS}
    for k in _BLOOM_CONFS:
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, _BLOOM_CONFS[k])
    try:
        df = _bloom_join(spark, SF)
        plan = _plan(df)
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    # the dim side builds a bloom over surviving keys; the fact scan
    # applies might_contain before the shuffle.
    assert "bloom_filter_agg" in plan
    assert "might_contain" in plan.lower()


def test_dpp_prunes_fact_partitions(spark):
    from tpctools_spark.registry import spark_queries

    df = spark_queries()["join_dpp_partitioned"](spark, SF)
    plan = _plan(df)
    assert "dynamicpruning" in plan.lower()


def test_rate_limit_compiles_to_window_group_limit(spark):
    from tpctools_spark.registry import spark_queries

    df = spark_queries()["events_rate_limit"](spark, SF)
    plan = _plan(df)
    # rank<=N pushed into the window: partial (map-side) + final group
    # limit, so the shuffle carries at most N rows per key.
    assert plan.count("WindowGroupLimit") == 2
