"""Blanket physical-plan sweep over the WHOLE registry.

Four invariants that must hold for every registered query, forever:

1. No ``CartesianProduct`` anywhere — an unkeyed join of two
   multi-row relations is never acceptable at scale.
2. ``BroadcastNestedLoopJoin`` only where the build side is a
   constant-size relation by construction (one-row aggregates, probe
   vectors, scalar brackets, centroid sets) — the explicit allowlist
   below. A new query that introduces a BNLJ must either justify
   itself onto this list or re-shape into a keyed join.
3. No ``Window`` with an EMPTY partition spec over an input that
   grows with the data — Spark funnels every row through one
   partition for those. Allowed only on the explicit allowlist below:
   k-row post-``limit`` ranks, value/domain-bounded census tables,
   and documented value-check forms. Anything data-sized must use
   ``tpctools_spark.queries._util.global_rank`` (two-pass
   range-partitioned rank) or an ``orderBy().limit(k)`` head-cap.
4. No BROADCAST hint whose build subtree is a bare scan (only
   Project/Filter/SubqueryAlias above it) of a table whose cardinality
   scales with the scale factor (``customer`` / ``customer_address``:
   100k×sf and 50k×sf rows in this generator, 12 M / 6 M at spec
   sf1000). An explicit hint overrides AQE's size check, so at large
   sf the plan ships gigabytes to every executor and OOMs the driver.
   Subtrees containing an Aggregate/Limit are exempt here (their
   output cardinality is shape-dependent, judged at review time);
   bare scans of these tables must stay unhinted so AQE decides
   broadcast-vs-shuffle from actual runtime sizes.

Planning-only (no jobs run): executedPlan().toString() forces physical
planning but not execution, so the sweep covers ~260 queries in about
a minute. Side-effecting queries (streams, sinks, bucketed-table
builders) are skipped — their plan shapes are asserted by their own
dedicated tests.

Checkpoint visibility: ``localCheckpoint(eager=False)`` subtrees
(tpcds q14/q23/q75 derived sets) would collapse to an opaque
``LogicalRDD`` scan and hide the joins behind them. All checkpoint
sites go through ``_util.maybe_local_checkpoint``, and this sweep sets
``TPCTOOLS_NO_CHECKPOINT=1`` so it plans the full pre-checkpoint tree
— the former blind spot is closed. ``scripts/plan_fingerprints.py``
additionally commits normalized plan fingerprints (PLANS.json) under
the same flag, so any plan change shows up as a reviewable diff.
"""

from __future__ import annotations

import re

import pytest

from tpctools_spark.registry import spark_queries

SF = "/root/testdata/sf0.001"

# Queries whose construction writes/streams — covered by dedicated
# tests. Canonical prefix→reason map shared with the fingerprint
# artifact so sweep and PLANS.json coverage cannot drift.
from tpctools_spark.plan_exclusions import (  # noqa: E402
    PLAN_EXCLUDED_PREFIXES,
    plan_exclusion_reason,
)

_SIDE_EFFECTING_PREFIXES = tuple(PLAN_EXCLUDED_PREFIXES)

# BNLJ is acceptable ONLY when the broadcast side is constant-size by
# construction (one row, a probe vector, K centroids, scalar brackets).
_BNLJ_ALLOWED = {
    "agg_approx_topk",  # one-row sketch-vs-exact top-K array spines (collected aggregates)
    "agg_bitmap_overlap",  # event-type-vocabulary² pair spine (t_a < t_b self-join)
    "agg_rfm_segments",  # one-row anchor-date + quartile-cutoff broadcasts
    "agg_hll_sketch_union",  # one-row merged-sketch estimate broadcast vs the exact census
    "agg_kmv_intersect",  # one-row (m, union-kth, exact) aggregates crossed; k-hash sketch joins
    "quality_fdr_bh",  # one-row global-moment anchor × ≤55-row segment census; one-row k_rej cutoff crossed back
    "events_ab_ttest",  # two one-row cohort-stat aggregates crossed (1 x 1)
    "events_dau_wau",  # calendar-sized day spine broadcast into the 7-day range join
    "events_survival_km",  # one-row MAX(day) observation-end anchor broadcast
    "events_decay_score",  # one-row MAX(ts) anchor broadcast
    "events_forecast_snaive",  # one-row MAX(hour) backtest-window anchor broadcast
    "feature_quantile_bucket",  # one-row total-count N broadcast (bucket = rank·K div N)
    "feature_target_encode",  # one-row global-mean prior broadcast
    "events_value_concentration",  # one-row (n, s) totals broadcast
    "text_source_divergence",  # one-row (n1, n2, vocab) totals broadcast
    "text_collocations_pmi",  # one-row corpus-totals broadcast
    "graph_pagerank_power",  # one-row node-count broadcast (teleport term, graph.py:117)
    "mining_basket_lift",  # one-row n_orders total broadcast into the lift ratios (mining.py:86)
    "pipeline_curriculum_order",  # one-row quartile-cutpoint broadcast
    "pipeline_dedup_eval",  # one-row truth-total × one-row detector-stats cross (1 x 1, corpusgen.py)
    "pipeline_dedup_funnel",  # three one-row stage-count broadcasts (funnel row)
    "pipeline_dedup_bias_report",  # one-row corpus-totals broadcast (bias denominator)
    "pipeline_mix_weights",  # one-row corpus-totals broadcast into per-source shares
    "pipeline_epoch_allocation",  # one-row (total_tokens, sum_w) broadcast into per-source epochs
    "pipeline_dsir_importance",  # one-row LM-totals broadcast into the 256-bucket lambda table
    "pipeline_importance_resample",  # same _dsir_per_doc core: one-row LM-totals broadcast
    "pipeline_time_split",  # one-row time-cut + leak-count broadcasts
    "quality_benford_digits",  # one-row total broadcast into the 9-digit census
    "quality_referential_integrity",  # one-row per-edge rowcount broadcasts
    "quality_ks_test",  # one-row (n1, n2) cohort-totals broadcast
    "sim_cosine_topk",  # one-row probe-vector broadcast into the scan (similarity.py:99)
    "sim_cosine_topk_ivf",  # one-row probe vector + nprobe-row top-cells broadcasts
    "sim_ivf_recall",  # composes the two probe-broadcast retrievals
    "sim_ivf_nprobe_curve",  # probe broadcast on every sweep leg
    "sim_pq_recall",  # one-row probe-vector broadcast on the exact side
    "sim_pq_topk",  # one-row probe-vector broadcast on the shortlist rescore
    "sim_matryoshka_eval",  # one-row probe broadcast on both retrieval legs
    "sim_cosine_topk_quantized",  # one-row quantized probe-vector broadcast
    "sim_knn_join",  # K-centroid broadcast (constant K) scoring the probe side
    "text_bigram_lm",  # one-row vocabulary-size V aggregate broadcast (mining.py:990)
    "text_bm25_search",  # one-row (N, avgdl) corpus-stats broadcast
    "text_hybrid_rrf",  # composes the bm25 + cosine probe-broadcast legs
    "tpcds_q14_cross_channel_intersect",  # one-row cross-channel avg-sales scalar anchor
    "tpcds_q24_color_basket_above_avg",  # one-row (all_cents, n_cells) totals broadcast
    "tpcds_q23_frequent_best",  # one-row best-customer-threshold scalar anchors
    "tpcds_q9_quantity_brackets",  # one-row bracket-average scalar subqueries (spec shape)
    "tpch_q11_important_stock",  # one-row global value-threshold scalar anchor (spec shape)
    "tpch_q22_global_sales_opportunity",  # one-row global avg-balance scalar anchor (spec shape)
}

# Unpartitioned (empty partition spec) windows are acceptable ONLY over
# inputs that are constant-size or domain-bounded by construction.
_GLOBAL_WINDOW_ALLOWED = {
    "events_path_trigrams",  # rank over the 20-row TakeOrderedAndProject head
    "events_survival_km",  # duration census — observation-window-bounded domain
    "pipeline_interleave_stride",  # rank over the 60-row TakeOrderedAndProject head
    "pipeline_weighted_sample",  # rank over the k-row TakeOrderedAndProject head
    "quality_fdr_bh",  # BH rank over the ≤55-row (event_type×k%10) segment census
    "quality_ks_test",  # fixed cent-grid census — domain-bounded by construction
    "quality_mann_whitney",  # distinct-cents census — value-domain-bounded
    "sim_cosine_topk",  # rank over the k-row TakeOrderedAndProject head
    "sim_ivf_nprobe_curve",  # k-row post-limit ranks on the brute + ivf legs
    "sim_cosine_topk_quantized",  # rank over the k-row TakeOrderedAndProject head
    "sim_pq_topk",  # rank over the k-row TakeOrderedAndProject head
    "text_bm25_search",  # rank over the k-row TakeOrderedAndProject head
    "text_hybrid_rrf",  # rank over the k-row TakeOrderedAndProject head
    "tpcds_q44_best_worst_items",  # ranks over the two 10-row TakeOrderedAndProject heads
    "tpcds_q70_state_county_rollup_rank",  # geography-bounded (state × county) rollup
}

_ORDER_SUFFIX = re.compile(r"\b(ASC|DESC) NULLS (FIRST|LAST)$")

# Invariant 4: tables whose row count scales with sf (this generator:
# customer = 100k×sf, customer_address = 50k×sf; TPC-DS spec sf1000:
# 12 M / 6 M). Detected in Relation lines by their signature leading
# column. item/store/date_dim etc. are fixed or spec-sublinear-bounded
# (item caps at 502k rows at sf100k) — broadcastable by policy.
_SF_SCALING_SIGNATURES = {
    "customer": "c_customer_sk#",
    "customer_address": "ca_address_sk#",
}

# Node names that cannot change the cardinality class of their input:
# a hint subtree made only of these over an sf-scaling scan broadcasts
# a relation that grows linearly with the data. Aggregate / limits /
# joins change cardinality in shape-dependent ways and are judged at
# review time, not by this sweep.
_CARDINALITY_PRESERVING = {
    "Project",
    "Filter",
    "SubqueryAlias",
    "View",
    "Relation",
    "LogicalRelation",
}


def _line_depth(line: str) -> int:
    """Depth of a node line in a Catalyst ``treeString``: the tree
    prints 3-char rails (``:  `` / ``   ``) then ``+- `` or ``:- ``;
    the root has no marker."""
    for marker in ("+- ", ":- "):
        i = line.find(marker)
        if i >= 0:
            return i // 3 + 1
    return 0


def broadcast_hints_over_scaling_scans(analyzed: str) -> list[str]:
    """Names of sf-scaling tables that appear under a broadcast
    ``ResolvedHint`` with only cardinality-preserving nodes between the
    hint and the scan."""
    lines = analyzed.splitlines()
    offenders: list[str] = []
    for i, line in enumerate(lines):
        if "ResolvedHint" not in line or "broadcast" not in line.lower():
            continue
        hint_depth = _line_depth(line)
        bare = True
        hit = None
        for sub in lines[i + 1 :]:
            d = _line_depth(sub)
            if d <= hint_depth:
                break
            node = sub[sub.find("- ") + 2 :].split(" ", 1)[0].split("[", 1)[0]
            if node not in _CARDINALITY_PRESERVING:
                bare = False
            for tbl, sig in _SF_SCALING_SIGNATURES.items():
                if node in ("Relation", "LogicalRelation") and sig in sub:
                    hit = tbl
        if bare and hit:
            offenders.append(hit)
    return offenders


def unpartitioned_window_specs(plan: str) -> list[str]:
    """First arguments of every ``windowspecdefinition(...)`` in *plan*
    whose partition spec is empty.

    In a physical plan string the spec prints its partition
    expressions first (plain expressions), then its order expressions
    (``expr ASC|DESC NULLS FIRST|LAST``), then the frame
    (``specifiedwindowframe(...)``). An empty partition spec therefore
    means the FIRST top-level argument is already an order expression
    or the frame itself.
    """
    out = []
    needle = "windowspecdefinition("
    i = 0
    while True:
        j = plan.find(needle, i)
        if j < 0:
            break
        k = j + len(needle)
        depth = 1
        arg_start = k
        first = None
        while depth > 0 and k < len(plan):
            c = plan[k]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0 and first is None:
                    first = plan[arg_start:k]
            elif c == "," and depth == 1 and first is None:
                first = plan[arg_start:k]
            k += 1
        i = k
        first = (first or "").strip()
        if first.startswith("specifiedwindowframe") or _ORDER_SUFFIX.search(
            first
        ):
            out.append(first)
    return out


_SWEPT = [
    n
    for n in sorted(spark_queries())
    if not any(n.startswith(p) for p in _SIDE_EFFECTING_PREFIXES)
]


@pytest.mark.parametrize("name", _SWEPT)
def test_no_cartesian_bnlj_and_global_windows_allowlisted(
    spark, name, monkeypatch
):
    # Audit the REAL tree: localCheckpoint(eager=False) subtrees
    # collapse to opaque LogicalRDD scans, hiding the joins behind
    # them (the former q14/q23/q75 blind spot). The flag makes
    # maybe_local_checkpoint a no-op for this planning pass.
    monkeypatch.setenv("TPCTOOLS_NO_CHECKPOINT", "1")
    df = spark_queries()[name](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian join"
    if "BroadcastNestedLoopJoin" in plan:
        assert name in _BNLJ_ALLOWED, (
            f"{name}: new BroadcastNestedLoopJoin — constant-size build side? "
            "add to allowlist with justification or re-shape to a keyed join"
        )
    specs = unpartitioned_window_specs(plan)
    if specs:
        assert name in _GLOBAL_WINDOW_ALLOWED, (
            f"{name}: Window with empty partition spec ({specs[0][:80]}) — "
            "single-partition at scale. Use _util.global_rank / "
            "orderBy().limit(k), or allowlist with a boundedness justification"
        )
    analyzed = df._jdf.queryExecution().analyzed().toString()
    offenders = broadcast_hints_over_scaling_scans(analyzed)
    assert not offenders, (
        f"{name}: explicit broadcast hint over bare scan of sf-scaling "
        f"table(s) {sorted(set(offenders))} — overrides AQE's size check "
        "and ships an sf-proportional relation to every executor at "
        "scale. Drop the hint and let AQE decide."
    )


def test_sweep_detects_planted_global_window(spark):
    """The detector itself: a planted empty-partition window is caught,
    a partitioned one is not."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.range(100).withColumn("g", F.col("id") % 5)
    planted = df.withColumn(
        "rn", F.row_number().over(Window.orderBy("id"))
    )
    plan = planted._jdf.queryExecution().executedPlan().toString()
    assert unpartitioned_window_specs(plan), "planted global window missed"

    ok = df.withColumn(
        "rn", F.row_number().over(Window.partitionBy("g").orderBy("id"))
    )
    plan = ok._jdf.queryExecution().executedPlan().toString()
    assert not unpartitioned_window_specs(plan), (
        "partitioned window falsely flagged"
    )


def test_sweep_detects_planted_scaling_broadcast(spark):
    """Invariant-4 detector: a planted broadcast hint on a bare
    customer scan is caught; an unhinted join, a hint on a fixed-size
    table, and a hint over an Aggregate are not."""
    from pyspark.sql import functions as F

    from tpctools_spark.queries.tpcds_demo import _t

    cust = _t(spark, "customer").select("c_customer_sk", "c_birth_year")
    dd = _t(spark, "date_dim").select("d_date_sk")

    planted = cust.join(F.broadcast(cust.alias("b")), "c_customer_sk")
    analyzed = planted._jdf.queryExecution().analyzed().toString()
    assert broadcast_hints_over_scaling_scans(analyzed) == ["customer"], (
        "planted customer broadcast hint missed"
    )

    unhinted = cust.join(cust.alias("b"), "c_customer_sk")
    analyzed = unhinted._jdf.queryExecution().analyzed().toString()
    assert not broadcast_hints_over_scaling_scans(analyzed)

    fixed_ok = cust.crossJoin(F.broadcast(dd.limit(1)))
    analyzed = fixed_ok._jdf.queryExecution().analyzed().toString()
    assert not broadcast_hints_over_scaling_scans(analyzed), (
        "fixed-size date_dim hint falsely flagged"
    )

    agg_ok = cust.crossJoin(
        F.broadcast(cust.agg(F.max("c_birth_year").alias("mx")))
    )
    analyzed = agg_ok._jdf.queryExecution().analyzed().toString()
    assert not broadcast_hints_over_scaling_scans(analyzed), (
        "aggregate-bounded subtree falsely flagged"
    )


def test_plans_artifact_covers_registry():
    """PLANS.json coverage is auditable: every registered query is
    either fingerprinted or listed in the artifact's exclusion map
    with a reason, exclusions match the canonical prefix map, and the
    two partitions tile the registry exactly."""
    import json

    with open("/root/repo/PLANS.json") as f:
        art = json.load(f)
    fps, excluded = art["fingerprints"], art["excluded"]
    registry = set(spark_queries())
    assert set(fps) | set(excluded) == registry
    assert not (set(fps) & set(excluded))
    assert len(fps) + len(excluded) == len(registry)
    for name, reason in excluded.items():
        assert reason == plan_exclusion_reason(name), name
        assert reason  # non-empty justification
    for name in fps:
        assert plan_exclusion_reason(name) is None, (
            f"{name} is fingerprinted but matches an exclusion prefix"
        )
