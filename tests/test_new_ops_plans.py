"""Physical-plan assertions for the round-4 format/time-series/text ops.

Locks the scale-relevant shapes: the OHLC downsample must stay a single
hash aggregate (no window sort), the tf-idf ranking must push its
rank<=3 filter into the window (WindowGroupLimit) and broadcast the
vocabulary-sized df side, and the typed JSON scan must carry the
explicit schema (no inference job).
"""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    """Final executed plan only — AQE's toString appends the initial
    plan below the final one, which double-counts every node."""
    df.collect()
    s = df._jdf.queryExecution().executedPlan().toString()
    return s.split("+- == Initial Plan ==")[0]


def test_ohlc_is_single_aggregate_no_window(spark):
    from tpctools_spark.registry import spark_queries

    df = spark_queries()["events_downsample_ohlc"](spark, SF)
    plan = _plan(df)
    # min_by/max_by ride the same HashAggregate as high/low/volume;
    # a Window/Sort here would mean the open/close went row-ordered.
    assert "HashAggregate" in plan
    assert "Window" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_tfidf_window_group_limit_and_broadcast(spark):
    from tpctools_spark.registry import spark_queries

    df = spark_queries()["text_tfidf_keywords"](spark, SF)
    plan = _plan(df)
    # rank<=3 pushed into the window sort: partial + final group limit.
    assert plan.count("WindowGroupLimit") == 2
    # the per-term df table is vocabulary-sized -> must broadcast.
    assert "BroadcastHashJoin" in plan


def test_cohort_retention_single_event_scan(spark):
    from tpctools_spark.registry import spark_queries

    df = spark_queries()["events_cohort_retention"](spark, SF)
    plan = _plan(df)
    # one pass over raw events (the distinct reduce); the cohort min and
    # rejoin run on the reduced (user, week) table, not the event scan.
    assert plan.count("parquet") >= 1
    assert plan.count("FileScan parquet") <= 2  # reused scan, never 3


def test_json_scan_no_inference(spark):
    from tpctools_spark.registry import spark_queries

    df = spark_queries()["scan_json_lines"](spark, SF)
    plan = _plan(df)
    # the read must be the explicit-schema json scan (typed columns in
    # ReadSchema), not a sampled inference pass over the files.
    assert "FileScan json" in plan
    assert "c_acctbal:double" in plan.replace(" ", "")


def test_outlier_iqr_broadcasts_fences(spark):
    from tpctools_spark.registry import spark_queries

    df = spark_queries()["quality_outlier_iqr"](spark, SF)
    plan = _plan(df)
    # the per-series fence table is group-count-sized -> must broadcast;
    # the events side must never shuffle for the join.
    assert "BroadcastHashJoin" in plan


def test_path_trigrams_one_sort_no_self_join(spark):
    from tpctools_spark.registry import spark_queries

    df = spark_queries()["events_path_trigrams"](spark, SF)
    plan = _plan(df)
    # two LEADs share one window sort; the join formulation would show
    # SortMergeJoin/BroadcastHashJoin over the events table.
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" not in plan
    assert plan.count("Window") >= 1


def test_sorted_stats_prune_pushes_range_filter(spark):
    from tpctools_spark.registry import spark_queries

    df = spark_queries()["sink_sorted_stats_prune"](spark, SF)
    plan = _plan(df)
    # the range predicate must reach the parquet reader as a pushed
    # filter so row-group min/max stats can skip groups; a post-scan
    # Filter-only plan would read every row group of the sorted table.
    assert "PushedFilters: [IsNotNull(o_custkey), GreaterThanOrEqual(o_custkey,100)" in plan


def test_bucket_pruned_scan_selects_one_bucket(spark):
    from tpctools_spark.registry import spark_queries

    df = spark_queries()["scan_bucket_pruned"](spark, SF)
    plan = _plan(df)
    assert "SelectedBucketsCount: 1 out of" in plan


def test_dsir_importance_broadcast_lm_no_sort(spark):
    from tpctools_spark.registry import spark_queries

    df = spark_queries()["pipeline_dsir_importance"](spark, SF)
    plan = _plan(df)
    # The 256-row lambda table must come back onto the bigram stream as
    # a broadcast hash join (a shuffled join here would key the whole
    # postings stream by bucket), and nothing in the pipeline sorts.
    assert "BroadcastHashJoin" in plan
    assert "Sort " not in plan


def test_importance_resample_is_take_ordered(spark):
    from tpctools_spark.registry import spark_queries

    df = spark_queries()["pipeline_importance_resample"](spark, SF)
    plan = _plan(df)
    # ORDER BY key DESC LIMIT k must plan as TakeOrdered (per-partition
    # top-k + driver merge) — a global Sort+Exchange here would order
    # the full corpus to pick 100 rows.
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan
