"""Benchmark the headline query suite; prints ONE JSON line.

Runs the heavier queries from the §2.B inventory at the sf directory in
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``. Each query executes end-to-end into a
``noop`` sink — full compute, no driver collect — so timings measure the
distributed plan, not result transfer.

Output: ONE compact JSON line (printed last, < 1800 chars so the
driver's stdout tail capture never truncates it):
  {"metric": "suite_wall_time", "value": <total sec>, "unit": "sec",
   "queries": {headline subset}, "gen_throughput": {...}, "sf": <sf>}
Full per-query warm+cold timings land in ``bench_out.json``.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# Committed solo reference for the host-calibration job below: warm
# min-of-3 of `spark.range(2**28).selectExpr("xxhash64(id)")` into a
# noop sink on an otherwise-idle local[32] build host (measured 0.51 /
# 0.64 / 0.76 s across probes). Pure fixed-size CPU work — independent
# of SF_DIR, data layout, and every query in the suite — so when a
# bench artifact's calibration lands far above this, the HOST was slow,
# not the code (the r12 driver run was ~2.5x inflated by contention and
# nothing in the artifact said so; this field makes that self-evident).
_CALIB_REF_S = 0.65


def _calibration_verdict(start: float, end: float,
                         ref: float = _CALIB_REF_S) -> dict:
    """Fold the two calibration samples into the artifact entry, with a
    WARNING string when the run is contention-suspect: start/end
    disagreeing >20% (load changed mid-suite) or either sample >1.5x
    the committed reference (host slower than the solo baseline).
    Pure function — pinned by tests/test_bench_policies.py."""
    out: dict = {"start": start, "end": end, "ref": ref}
    warns = []
    hi, lo = max(start, end), min(start, end)
    if lo > 0 and hi / lo > 1.2:
        warns.append(
            f"start/end calibration disagree {hi / lo:.2f}x (>1.2x): "
            "host load changed mid-suite"
        )
    if hi > 1.5 * ref:
        warns.append(
            f"calibration {hi:.2f}s is {hi / ref:.1f}x the committed "
            f"solo reference {ref}s: host contended, timings inflated"
        )
    if warns:
        out["warning"] = "; ".join(warns)
    return out


def _calibration_run(spark) -> float:
    """Time the fixed synthetic calibration job: one untimed warm-up
    (pays the per-process codegen compile), then warm min-of-3."""
    def _pass() -> None:
        spark.range(2 ** 28).selectExpr("xxhash64(id) AS h").write.format(
            "noop"
        ).mode("overwrite").save()

    _pass()
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        _pass()
        runs.append(time.perf_counter() - t0)
    return round(min(runs), 3)


def sf1_rep_policy(elapsed_s: float, budget_s: float) -> int:
    """Per-query rep count for the sf1 suites under a draining soft
    budget: 3 back-to-back reps while fresh, 2 past 55% of budget,
    1 past 75%. The chosen count is recorded per query in
    ``tpcds_sf1_reps`` / ``tpch_sf1_reps`` so the artifact says what
    each min was actually a min OF (the r9-ADVICE rep-count low);
    ``tests/test_bench_policies.py`` pins the thresholds."""
    if elapsed_s < 0.55 * budget_s:
        return 3
    if elapsed_s < 0.75 * budget_s:
        return 2
    return 1

# Headline suite: scan+agg, broadcast/shuffle/multiway joins, windows,
# event-time sessions, dedup, similarity, text analysis.
HEADLINE = [
    "agg_group_sum",
    "filter_pred",
    "join_inner_equi",
    "join_multiway",
    "tpch_q3_shipping_priority",
    "tpch_q4_order_priority",
    "tpch_q5_local_supplier",
    "tpch_q8_market_share",
    "tpch_q10_returned_items",
    "tpch_q13_customer_distribution",
    "tpch_q17_small_quantity_revenue",
    "tpch_q18_large_volume_customer",
    "tpch_q22_global_sales_opportunity",
    "join_theta_range",
    "join_range_bucketed",
    "join_asof_event",
    "window_rank_topn",
    "window_running_sum",
    "window_session",
    "window_tumbling",
    "agg_grouping_sets",
    "scalar_math_decimal",
    "dedup_exact",
    "dedup_minhash",
    "dedup_ngram_jaccard",
    "dedup_cluster_components",
    "sim_cosine_topk",
    "text_tokens",
    "multimodal_join",
    "pipeline_pack_sequences",
    "pipeline_contamination",
    "pipeline_unigram_lm_score",
    # TPC-DS anchor group: the four most expensive shapes (6-fact union
    # rollup, 4-way CTE self-join, cross-channel INTERSECT, dual-rank
    # union) over the native generator's materialized parquet.
    "tpcds_q5_channel_rollup",
    "tpcds_q11_channel_growth",
    "tpcds_q14_cross_channel_intersect",
    "tpcds_q49_return_ratios",
    # Round-5 group: mining/layout/drift ops and the two runtime-pruning
    # join patterns (bloom filter, dynamic partition pruning).
    "mining_basket_lift",
    "mining_bpe_pairs",
    "dedup_containment",
    "pipeline_weighted_sample",
    "reshape_scd2_history",
    "quality_drift_psi",
    "quality_anomaly_mad",
    "text_chunk_overlap",
    "sim_cosine_topk_quantized",
    "layout_zorder_address",
    "join_bloom_pruned",
    "join_dpp_partitioned",
    # Round-6 group: sketches, graph, URL/keyphrase text ops, tolerance
    # as-of — the new operator families added this round.
    "agg_count_min_sketch",
    "agg_bitmap_distinct",
    "graph_pagerank_power",
    "graph_triangle_count",
    "events_streaks",
    "text_rake_keyphrases",
    "join_asof_tolerance",
    "dedup_url_canonical",
    # Round-7 group: retrieval (BM25, PQ), span-level dedup, BFS,
    # bitmap set algebra, audio fan-out, CDC compaction.
    "text_bm25_search",
    "sim_pq_topk",
    "dedup_repeated_spans",
    "graph_bfs_distance",
    "agg_bitmap_overlap",
    "multimodal_audio_segment",
    "reshape_cdc_compact",
    "text_hybrid_rrf",
    "layout_hilbert_address",
    "quality_ks_test",
    "quality_cusum_changepoint",
    "events_value_concentration",
    "dedup_minhash_band_eval",
    "join_temporal_align",
    # Round-8 group: feature engineering, planted-truth dedup eval,
    # semantic prune, CDC chunking, survival/rank statistics, the
    # stream-static join, and the corpus generators.
    "feature_standardize",
    "feature_hash_bucket",
    "feature_target_encode",
    "pipeline_dedup_eval",
    "dedup_semantic_prune",
    "multimodal_chunk_cdc",
    "events_survival_km",
    "events_markov_transitions",
    "quality_mann_whitney",
    "quality_seasonal_zscore",
    "window_ewma",
    "agg_kmv_sketch",
    "pipeline_curriculum_order",
    "pipeline_quality_filter_gopher",
    "stream_static_enrich",
    "sink_sorted_stats_prune",
    # Round-12 group: the banded interval join, join pre-flight
    # profiling, regex census, MI feature screen, batch assembly,
    # snapshot diff, and the tar-shard roundtrip.
    "join_interval_grid",
    "quality_join_size_profile",
    "scalar_regex",
    "feature_mutual_info",
    "pipeline_length_batches",
    "reshape_snapshot_diff",
    "multimodal_tar_shards",
]

# Driver-facing compact line keys: the stdout tail capture is ~2000
# chars, so only this subset of timings rides on the final JSON line;
# the full per-query + cold map goes to bench_out.json.
COMPACT_KEYS = [
    "agg_group_sum",
    "tpch_q3_shipping_priority",
    "tpch_q18_large_volume_customer",
    "join_multiway",
    "window_session",
    "dedup_minhash",
    "dedup_ngram_jaccard",
    "dedup_cluster_components",
    "sim_cosine_topk",
    "pipeline_contamination",
    "tpcds_q5_channel_rollup",
    "tpcds_q11_channel_growth",
    "tpcds_q14_cross_channel_intersect",
    "tpcds_q49_return_ratios",
    "mining_basket_lift",
    "sim_cosine_topk_quantized",
    "join_bloom_pruned",
    "q1_sf1",
    "dedup_jaccard_50k",
    "dedup_minhash_50k",
    "dedup_components_50k",
    "dedup_jaccard_500k",
    "dedup_minhash_500k",
    "dedup_components_500k",
    "dedup_embedding_500k",
    "dedup_lsh_500k",
    "dedup_semantic_prune_500k",
    "sim_ivf_50k",
    "text_bm25_50k",
    "dsir_importance_500k",
    "dsir_resample_500k",
    "sim_pq_build_50k",
    "sim_pq_probe_50k",
    "gen_tpch",
    "gen_tpcds",
]


def main() -> None:
    from tpctools_spark.registry import spark_queries
    from tpctools_spark.session import get_spark

    spark = get_spark("tpctools-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = spark_queries()

    # Each query runs cold once, then N_WARM warm passes back-to-back.
    # The cold run pays the one-time per-process Janino/whole-stage-
    # codegen compile (~5-15 s for complex plans, independent of data
    # volume); the reported time is the MIN of the warm passes — on a
    # shared long-lived local[32] JVM, single warm samples swing ±40%
    # with GC/JIT state (round 5's "regressions" were exactly this
    # noise), and the min is the steady-state a dedicated cluster job
    # sustains. The warm max−min spread lands in bench_out.json
    # ("warm_spread") so a genuinely bimodal query is visible. Cold
    # totals are reported alongside in "cold_queries".
    # Fault isolation: one broken query must not zero the whole round's
    # bench record (round 3 lost its record to a single AnalysisException
    # raised before any output) — time each query under try/except,
    # report failures in "errors", and always print the compact line.
    # Host calibration, sample 1 of 2 (suite start): a fixed synthetic
    # job whose time depends only on host speed. Sample 2 runs at suite
    # end; both land in the artifact so a contended run is self-evident
    # (see _calibration_verdict).
    try:
        calib_start = _calibration_run(spark)
    except Exception:  # noqa: BLE001 — calibration must never kill bench
        calib_start = -1.0

    N_WARM = 3
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    spread: dict[str, float] = {}
    errors: dict[str, str] = {}
    total = 0.0

    def _jvm_quiesce():
        """Release Python-held py4j plan references and ask the JVM for
        a full GC before a timed tier entry. r13 measurement-hygiene
        fix (OPTIMIZATION_r13.md): after ~90 headline queries + fixture
        builds, the long-lived 32g driver JVM accumulates dead plan/
        cache state that inflated LATE tier entries 1.4-1.8x on
        UNCHANGED code (dsir_resample_500k 7.14 s in-suite vs 3.90 s
        isolated, sim_pq_build_50k 5.38 vs 2.89, minhash_500k 10.43 vs
        6.14 — all reproduced isolated-fast in .scratch probes while
        the host calibration showed an idle host). Runs OUTSIDE every
        timed region; the timed computation is unchanged."""
        import gc as _gc

        _gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:  # noqa: BLE001 — hygiene must never kill bench
            pass

    def _timed(key: str, fn, reps: int = 3):
        """Cold once, then ``reps`` warm back-to-back passes: record the
        cold time, the warm MIN, and the warm max−min spread. Single
        warm samples on the shared JVM swing ±40% (gen entries moved 3x
        between the r9 driver run and the solo close on identical
        code), so EVERY bench entry goes through here — no entry is a
        single rep, and every entry carries its spread so a noisy
        number is visible as such. Returns the last run's value (recall
        asserts read it)."""
        _jvm_quiesce()
        t0 = time.perf_counter()
        out = fn()
        cold[key] = round(time.perf_counter() - t0, 3)
        runs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            runs.append(time.perf_counter() - t0)
        timings[key] = round(min(runs), 3)
        spread[key] = round(max(runs) - min(runs), 3)
        return out
    for name in HEADLINE:
        try:
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            cold[name] = round(time.perf_counter() - t0, 3)
            runs = []
            for _ in range(N_WARM):
                t0 = time.perf_counter()
                qs[name](spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs.append(time.perf_counter() - t0)
            timings[name] = round(min(runs), 3)
            spread[name] = round(max(runs) - min(runs), 3)
            total += timings[name]
        except Exception as exc:  # noqa: BLE001 — record and continue
            errors[name] = f"{type(exc).__name__}: {exc}"[:200]
        spark.catalog.clearCache()

    # Generation throughput — the reference's one published number is
    # dsdgen wall time (README.md:38); time our native generators at the
    # bench SF into a noop sink (pure compute, no disk variance).
    from tpctools_spark.generate import build_table
    from tpctools_spark.generate_tpcds import build_tpcds_table

    sf_num = float(os.path.basename(SF_DIR.rstrip("/")).removeprefix("sf") or 0.1)
    TPCH_TABLES = ("lineitem", "orders", "customer", "part", "partsupp", "supplier")
    TPCDS_TABLES = ("store_sales", "web_sales", "item", "customer", "date_dim")
    # Same warm-then-time protocol as the queries: a tiny-SF pass pays
    # the plan-compile cost, the timed pass measures generation
    # throughput at the bench SF.
    # Tables are submitted as concurrent jobs here and in the sf1
    # throughput section below — the reference's own 48-way dsdgen
    # protocol, and the way a real cluster runs independent table jobs.
    from concurrent.futures import ThreadPoolExecutor

    def _noop_tpch(t: str, sf: float) -> None:
        build_table(spark, t, sf, 32).write.format("noop").mode("overwrite").save()

    def _noop_tpcds(t: str, sf: float) -> None:
        build_tpcds_table(spark, t, sf, 32).write.format("noop").mode(
            "overwrite"
        ).save()

    def _gen_pass_tpch() -> None:
        with ThreadPoolExecutor(8) as ex:
            list(ex.map(lambda t: _noop_tpch(t, sf_num), TPCH_TABLES))

    def _gen_pass_tpcds() -> None:
        with ThreadPoolExecutor(8) as ex:
            list(ex.map(lambda t: _noop_tpcds(t, sf_num), TPCDS_TABLES))

    try:
        # Same cold + min-of-3-warm protocol as the query loop. These
        # were the noisiest single-rep entries in the driver artifact
        # (gen_tpch 5.9 s driver vs 4.2 s solo vs 2.0 s r8 on the same
        # code) — min-of-3 makes the recorded number the steady state.
        _timed("gen_tpch", _gen_pass_tpch)
        total += timings["gen_tpch"]
        _timed("gen_tpcds", _gen_pass_tpcds)
        total += timings["gen_tpcds"]
    except Exception as exc:  # noqa: BLE001
        errors["gen"] = f"{type(exc).__name__}: {exc}"[:200]

    # Amortized-scale generation throughput (rows/s at sf1, all tables):
    # the comparable figure to the reference's dsdgen 6247 s at
    # sf1000/48-way ≈ 0.8 M rows/s (BASELINE.md). Small-SF gen timings
    # above are ~90% fixed job-scheduling overhead, so the rows/s figure
    # is measured at sf1 where compute dominates.
    from tpctools_spark.generate_tpcds import CARDINALITY, rows_for

    gen_stats: dict[str, int] = {}
    # exact sf1 row counts (lineitem counted by its actual explode size)
    tpch_rows_sf1 = {
        "region": 5, "nation": 25, "supplier": 10_000, "customer": 150_000,
        "part": 200_000, "partsupp": 800_000, "orders": 1_500_000,
        "lineitem": 5_999_999,
    }
    # Best of three passes: a long-lived JVM's gen throughput swings
    # ±40% with GC/JIT state after the query suite; the max is the
    # steady-state figure a dedicated generation job would sustain.
    # The rate spread (max−min across the 3 passes) lands in the same
    # warm_spread map as the timing entries so the artifact shows how
    # noisy each published rate was.
    def _best_of_3(label: str, fn) -> int:
        rates = []
        for _ in range(3):
            t0 = time.perf_counter()
            n = fn()
            rates.append(round(n / (time.perf_counter() - t0)))
        spread[label] = max(rates) - min(rates)
        return max(rates)

    # Tables are submitted concurrently (thread pool → independent Spark
    # jobs; the scheduler fills idle cores with small-table tasks while
    # the big tables run). This is the reference's own protocol — dsdgen
    # sf1000 ran 48 parallel processes (BASELINE.md) — and matches
    # convert.py's cross-table parallelism. Measured: 2.0× on TPC-DS
    # (24 tables), ~1.2× on TPC-H (orders+lineitem dominate).
    from concurrent.futures import ThreadPoolExecutor

    def _gen_tpch() -> int:
        def one(t: str) -> None:
            build_table(spark, t, 1.0, 32).write.format("noop").mode(
                "overwrite"
            ).save()

        with ThreadPoolExecutor(8) as ex:
            list(ex.map(one, tpch_rows_sf1))
        return sum(tpch_rows_sf1.values())

    def _gen_tpcds() -> int:
        def one(t: str) -> None:
            build_tpcds_table(spark, t, 1.0, 32).write.format("noop").mode(
                "overwrite"
            ).save()

        with ThreadPoolExecutor(8) as ex:
            list(ex.map(one, CARDINALITY))
        return sum(rows_for(t, 1.0) for t in CARDINALITY)

    try:
        gen_stats["tpch_sf1_rows_per_s"] = _best_of_3(
            "tpch_sf1_rows_per_s", _gen_tpch
        )
        gen_stats["tpcds_sf1_rows_per_s"] = _best_of_3(
            "tpcds_sf1_rows_per_s", _gen_tpcds
        )
    except Exception as exc:  # noqa: BLE001
        errors["gen_throughput"] = f"{type(exc).__name__}: {exc}"[:200]

    # Q1 at sf1 (6M-row multi-file lineitem): the driver fixture is a
    # single row group → 1-task scan, so agg_group_sum's fixture timing
    # says nothing about scan parallelism. Materialize the generator's
    # lineitem at sf1 once (pure function of (table, sf) — reusable) and
    # time the same Q1 plan over it; this run scans 32 splits.
    sf1_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".scratch", "bench_sf1"
    )

    # Conversion throughput — the reference's other measured metric
    # (printed per file, never published: src/lib.rs:174, 214): typed
    # pipe-CSV lineitem at the bench SF → snappy parquet, end-to-end
    # through convert_table. Reported as rows/s alongside generation.
    try:
        import shutil

        from tpctools_spark.convert import convert_table

        li_df = build_table(spark, "lineitem", sf_num, 32)
        tbl_path = os.path.join(sf1_dir, f"lineitem_tbl_sf{sf_num}")
        if not os.path.exists(os.path.join(tbl_path, "_SUCCESS")):
            li_df.write.mode("overwrite").option("delimiter", "|").option(
                "header", "false"
            ).csv(tbl_path)
        n_li = li_df.count()

        def _convert_once() -> None:
            out = os.path.join(sf1_dir, "lineitem_conv_tmp")
            shutil.rmtree(out, ignore_errors=True)
            convert_table(
                spark, tbl_path, li_df.schema, out, file_ext=".csv"
            )
            shutil.rmtree(out, ignore_errors=True)

        # Best-of-3, same protocol as generation: a single timed run
        # right after one warm-up lands mid-JIT (~0.7 M rows/s) while
        # steady state is ~0.9-1.0 M — the r5→r6 "37% regression" was
        # exactly this single-sample noise (convert.py unchanged).
        _convert_once()  # warm: codegen + committer setup

        gen_stats["convert_lineitem_rows_per_s"] = _best_of_3(
            "convert_lineitem_rows_per_s", lambda: (_convert_once(), n_li)[1]
        )
    except Exception as exc:  # noqa: BLE001
        errors["convert_throughput"] = f"{type(exc).__name__}: {exc}"[:200]
    li_path = os.path.join(sf1_dir, "lineitem.parquet")
    try:
        if not os.path.exists(os.path.join(li_path, "_SUCCESS")):
            build_table(spark, "lineitem", 1.0, 32).write.mode("overwrite").parquet(
                li_path
            )
        _timed(
            "q1_sf1",
            lambda: qs["agg_group_sum"](spark, sf1_dir)
            .write.format("noop")
            .mode("overwrite")
            .save(),
        )
    except Exception as exc:  # noqa: BLE001
        errors["q1_sf1"] = f"{type(exc).__name__}: {exc}"[:200]

    # Dedup at 100x the fixture: the capped 3-gram Jaccard detector over
    # a 50k-doc generated corpus (scaled vocabulary; planted near-dup at
    # every 7th doc). Runs the REGISTRY query verbatim over the fixture-
    # layout corpus (like the minhash/components entries) — earlier
    # rounds timed a hand-rolled twin that paired docs via a postings
    # SELF-join, the exact shape dedup.py's single-postings-shuffle
    # implementation exists to avoid, so it overstated the shipped
    # path's cost ~3x (9.0 s vs ~3 s warm; cross-round series note in
    # SURVEY §6). Planted recall is verified in-line — a scale point
    # with ground truth, not just a wall time.
    try:
        from pyspark.sql import functions as F

        from tpctools_spark.generate_corpus import gen_documents

        docs_path = os.path.join(sf1_dir, "corpus50k.parquet")
        if not os.path.exists(os.path.join(docs_path, "_SUCCESS")):
            gen_documents(spark, 50_000, parts=32, vocab_size=10_000)                .write.mode("overwrite").parquet(docs_path)
        corpus_fix_dir = os.path.join(sf1_dir, "corpus50k_fixture")
        docs_fix = os.path.join(corpus_fix_dir, "documents.parquet")
        if not os.path.exists(os.path.join(docs_fix, "_SUCCESS")):
            spark.read.parquet(docs_path).write.mode("overwrite").parquet(
                docs_fix
            )

        def _jaccard_50k() -> int:
            # One aggregate over the FULL pair output (planted-found
            # counted in the same pass) — a filter().count() would let
            # Catalyst push the planted predicate into the candidate
            # joins and time a pruned plan.
            row = (
                qs["dedup_ngram_jaccard"](spark, corpus_fix_dir)
                .agg(
                    F.count(F.lit(1)).alias("total"),
                    F.count(
                        F.when(
                            (F.col("doc_b") == F.col("doc_a") + 1)
                            & (F.col("doc_b") % 7 == 0),
                            1,
                        )
                    ).alias("found"),
                )
                .collect()[0]
            )
            spark.catalog.clearCache()  # the query caches grams/pairs
            return row["found"]


        # This plan is big enough that the JVM is still JIT-warming on
        # the second run — min of two warm passes (the steady state a
        # long-lived cluster job sustains).
        n_pairs = _timed("dedup_jaccard_50k", _jaccard_50k, reps=2)
        if n_pairs < 50_000 // 7:
            errors["dedup_jaccard_50k"] = (
                f"planted recall broken: {n_pairs} pairs < {50_000 // 7}"
            )
    except Exception as exc:  # noqa: BLE001
        errors["dedup_jaccard_50k"] = f"{type(exc).__name__}: {exc}"[:200]

    # MinHash LSH at the same 100x scale point: the banded-signature
    # path is the detector a 100 TB dedup actually ships (candidate
    # generation by band-bucket join, cost ~ #colliding pairs, never
    # all-pairs), so it gets the same 50k-doc ground-truth bench as the
    # inverted-index Jaccard detector above. This runs the REGISTRY
    # query verbatim — the corpus is laid out as a fixture directory
    # (documents.parquet) so dedup_minhash's own catalog path serves —
    # and verifies planted recall in-line: every id ≡ 0 (mod 7) is a
    # near-copy of its predecessor (one appended marker, 3-gram
    # Jaccard ≈ 0.97), so banded LSH at 8×4/32 hashes should recover
    # ≥ 95% of the planted pairs.
    try:
        corpus_fix_dir = os.path.join(sf1_dir, "corpus50k_fixture")
        docs_fix = os.path.join(corpus_fix_dir, "documents.parquet")
        if not os.path.exists(os.path.join(docs_fix, "_SUCCESS")):
            spark.read.parquet(docs_path).write.mode("overwrite").parquet(
                docs_fix
            )

        def _minhash_50k() -> None:
            qs["dedup_minhash"](spark, corpus_fix_dir).write.format(
                "noop"
            ).mode("overwrite").save()
            spark.catalog.clearCache()  # the query caches signatures

        _timed("dedup_minhash_50k", _minhash_50k, reps=2)
        planted_total = (50_000 - 1) // 7
        planted_found = (
            qs["dedup_minhash"](spark, corpus_fix_dir)
            .filter(
                (F.col("doc_b") == F.col("doc_a") + 1)
                & (F.col("doc_b") % 7 == 0)
            )
            .count()
        )
        spark.catalog.clearCache()
        if planted_found < 0.95 * planted_total:
            errors["dedup_minhash_50k"] = (
                f"planted recall broken: {planted_found}/{planted_total}"
            )
    except Exception as exc:  # noqa: BLE001
        errors["dedup_minhash_50k"] = f"{type(exc).__name__}: {exc}"[:200]

    # Connected components at the same 100x point — the stage that
    # turns pairs into drop decisions (A~B~C with A≁C must dedup as
    # one cluster). Runs the registry query verbatim over the fixture-
    # layout corpus; ground truth: the planted pairs are ~7.1k DISJOINT
    # 2-doc clusters (copies attach to non-copy predecessors), so the
    # multi-doc component count must recover >= 95% of them.
    try:
        def _components_50k() -> int:
            out = qs["dedup_cluster_components"](spark, corpus_fix_dir)
            n_multi = (
                out.filter(F.col("cluster_size") >= 2)
                .select("cluster_id")
                .distinct()
                .count()
            )
            spark.catalog.clearCache()
            return n_multi

        n_multi = _timed("dedup_components_50k", _components_50k, reps=2)
        planted_total = (50_000 - 1) // 7
        if n_multi < 0.95 * planted_total:
            errors["dedup_components_50k"] = (
                f"planted clusters broken: {n_multi}/{planted_total}"
            )
    except Exception as exc:  # noqa: BLE001
        errors["dedup_components_50k"] = f"{type(exc).__name__}: {exc}"[:200]

    # The 500k-doc tier — 10x the 50k point, the scale where shuffle
    # cliffs, df-cap saturation, and state growth in the components
    # loop would show (a plan that is accidentally quadratic in corpus
    # size moves ~100x here, not 10x). Vocabulary scales with the
    # corpus (100k word ids) for the same reason as the 50k tier; the
    # same ground truth is planted (id ≡ 0 mod 7 near-dups its
    # predecessor) so every timing carries a recall assert. Cold + one
    # warm rep per query keeps the tier ~5 minutes; SPARK_GRAFT_500K=0
    # skips it.
    if os.environ.get("SPARK_GRAFT_500K", "1") != "0":
        try:
            from pyspark.sql import functions as F

            from tpctools_spark.generate_corpus import gen_documents

            corpus500_dir = os.path.join(sf1_dir, "corpus500k_fixture")
            docs500 = os.path.join(corpus500_dir, "documents.parquet")
            if not os.path.exists(os.path.join(docs500, "_SUCCESS")):
                gen_documents(
                    spark, 500_000, parts=32, vocab_size=100_000
                ).write.mode("overwrite").parquet(docs500)
            planted_500k = (500_000 - 1) // 7

            def _planted_pairs(qname: str) -> int:
                # Single aggregate over the FULL pair output — a bare
                # .filter(planted).count() lets Catalyst push the
                # planted predicate into the candidate joins and time
                # a pruned plan (see the embedding tier's _pair_recall
                # for the measured case).
                row = (
                    qs[qname](spark, corpus500_dir)
                    .agg(
                        F.count(F.lit(1)).alias("total"),
                        F.count(
                            F.when(
                                (F.col("doc_b") == F.col("doc_a") + 1)
                                & (F.col("doc_b") % 7 == 0),
                                1,
                            )
                        ).alias("found"),
                    )
                    .collect()[0]
                )
                spark.catalog.clearCache()
                return row["found"]

            def _multi_clusters() -> int:
                n = (
                    qs["dedup_cluster_components"](spark, corpus500_dir)
                    .filter(F.col("cluster_size") >= 2)
                    .select("cluster_id")
                    .distinct()
                    .count()
                )
                spark.catalog.clearCache()
                return n

            tier = [
                # (key, run, floor, floor_desc)
                ("dedup_jaccard_500k", lambda: _planted_pairs(
                    "dedup_ngram_jaccard"), planted_500k, "exact"),
                ("dedup_minhash_500k", lambda: _planted_pairs(
                    "dedup_minhash"), int(0.95 * planted_500k), "lsh>=95%"),
                ("dedup_components_500k", _multi_clusters,
                 int(0.95 * planted_500k), "clusters>=95%"),
            ]
            # Min-of-3 back-to-back reps, like every other entry: the
            # r9 single-rep tier swung 3x between the driver run and
            # the solo close (jaccard 30.0 vs 10.5 s — measurement, not
            # plan). A soft per-tier budget sheds reps (3 → 2) rather
            # than entries if the host is running slow.
            tier_t0 = time.perf_counter()
            tier_budget = float(
                os.environ.get("SPARK_GRAFT_500K_BUDGET", "600")
            )
            for key, run, floor, desc in tier:
                try:
                    reps = (
                        3
                        if time.perf_counter() - tier_t0 < 0.5 * tier_budget
                        else 2
                    )
                    found = _timed(key, run, reps=reps)
                    if found < floor:
                        errors[key] = (
                            f"planted recall broken ({desc}): "
                            f"{found} < {floor}"
                        )
                except Exception as exc:  # noqa: BLE001
                    errors[key] = f"{type(exc).__name__}: {exc}"[:200]
        except Exception as exc:  # noqa: BLE001
            errors["tier_500k"] = f"{type(exc).__name__}: {exc}"[:200]

    # The 500k EMBEDDING-dedup tier: the bounded-occupancy blocking
    # (dedup_embedding / dedup_semantic_prune) and the corpus-adaptive
    # LSH get measured scale points, not just property tests. The
    # corpus is SCATTERED geometry with planted near-dups (every id ≡ 0
    # mod 70 copies id−10 at cosine ≈ 0.9996, same label) — with the
    # label-CLUSTERED ANN fixture the true ≥0.3-cosine pair set is
    # itself quadratic at this size, so no linear detector could exist;
    # scattered geometry keeps ground truth = the 7142 planted pairs
    # and every timing carries a recall floor. The occupancy bound is
    # asserted on the same corpus.
    if os.environ.get("SPARK_GRAFT_500K", "1") != "0":
        try:
            from pyspark.sql import functions as F

            from tpctools_spark.generate_corpus import gen_embeddings_scattered

            emb500_dir = os.path.join(sf1_dir, "emb500k_fixture")
            emb500 = os.path.join(emb500_dir, "embeddings.parquet")
            if not os.path.exists(os.path.join(emb500, "_SUCCESS")):
                gen_embeddings_scattered(
                    spark, 500_000, dim=64, parts=32
                ).write.mode("overwrite").parquet(emb500)
            planted_e500 = (500_000 - 1) // 70

            def _pair_recall(qname: str) -> int:
                # ONE aggregate over the FULL pair enumeration: a bare
                # .filter(planted).count() let Catalyst push the
                # planted-pair predicate into the candidate joins, so
                # the timed plan enumerated a tiny slice of the real
                # work (the r10 lsh entry measured 22 s while the full
                # enumeration ran >25 min — the skew it hid is fixed,
                # but the bench must time the full job to prove it).
                row = (
                    qs[qname](spark, emb500_dir)
                    .agg(
                        F.count(F.lit(1)).alias("total"),
                        F.count(
                            F.when(
                                (F.col("vec_b") == F.col("vec_a") + 10)
                                & (F.col("vec_b") % 70 == 0),
                                1,
                            )
                        ).alias("found"),
                    )
                    .collect()[0]
                )
                spark.catalog.clearCache()
                return row["found"]

            def _prune_catch() -> int:
                # A planted pair is "caught" when the pruner dropped at
                # least one member (a recall floor: occasional drops by
                # random ≥tau neighbors only help it).
                kept = qs["dedup_semantic_prune"](spark, emb500_dir).select(
                    "vec_id"
                )
                pairs = spark.range(70, 500_000, 70).select(
                    (F.col("id") - 10).alias("a"), F.col("id").alias("b")
                )
                n = (
                    pairs.join(
                        kept.select(
                            F.col("vec_id").alias("a"), F.lit(1).alias("ka")
                        ),
                        "a",
                        "left",
                    )
                    .join(
                        kept.select(
                            F.col("vec_id").alias("b"), F.lit(1).alias("kb")
                        ),
                        "b",
                        "left",
                    )
                    .filter(F.col("ka").isNull() | F.col("kb").isNull())
                    .count()
                )
                spark.catalog.clearCache()
                return n

            tier_e = [
                ("dedup_embedding_500k",
                 lambda: _pair_recall("dedup_embedding"),
                 int(0.85 * planted_e500), "cells>=85%"),
                ("dedup_lsh_500k",
                 lambda: _pair_recall("dedup_lsh_cosine"),
                 int(0.95 * planted_e500), "lsh>=95%"),
                ("dedup_semantic_prune_500k", _prune_catch,
                 int(0.85 * planted_e500), "prune>=85%"),
            ]
            tier_t0 = time.perf_counter()
            tier_budget = float(
                os.environ.get("SPARK_GRAFT_500K_BUDGET", "600")
            )
            for key, run, floor, desc in tier_e:
                try:
                    reps = (
                        3
                        if time.perf_counter() - tier_t0 < 0.5 * tier_budget
                        else 2
                    )
                    found = _timed(key, run, reps=reps)
                    if found < floor:
                        errors[key] = (
                            f"planted recall broken ({desc}): "
                            f"{found} < {floor}"
                        )
                except Exception as exc:  # noqa: BLE001
                    errors[key] = f"{type(exc).__name__}: {exc}"[:200]
            # r12 invariant: "no codegen fallback at the 500k tier"
            # (dedup.py's LSH note) is CHECKED, not claimed in a
            # comment. One untimed rep runs with codegen fallback
            # DISABLED: a Janino compile failure in any whole stage
            # (and, via CODEGEN_ONLY, any expression falling back to
            # the interpreted path) becomes a hard error recorded in
            # bench errors instead of a silent drop to the slower
            # non-WSCG path. The observed sf0.01-tier fallback (fused
            # scan+dims+signs topping Janino's 64 KB method limit)
            # makes the tier boundary worth pinning.
            try:
                spark.conf.set("spark.sql.codegen.fallback", "false")
                spark.conf.set(
                    "spark.sql.codegen.factoryMode", "CODEGEN_ONLY"
                )
                _pair_recall("dedup_lsh_cosine")
                gen_stats["lsh500k_codegen_strict"] = True
            except Exception as exc:  # noqa: BLE001
                errors["lsh500k_codegen_strict"] = (
                    f"{type(exc).__name__}: {exc}"[:200]
                )
            finally:
                spark.conf.unset("spark.sql.codegen.fallback")
                spark.conf.unset("spark.sql.codegen.factoryMode")
                # A throw inside _pair_recall skips its own clearCache;
                # drop any half-built prep/sig caches here so the
                # following 500k checks measure a cold catalog.
                spark.catalog.clearCache()
            # Occupancy bound at the measured scale: the blocking must
            # hold its bounded-cell property on half a million vectors,
            # not just in the 1k/2k property test.
            try:
                from tpctools_spark.queries.dedup import (
                    _EMB_CELL_TARGET,
                    _embedding_cells,
                )

                prep = spark.read.parquet(emb500).select(
                    "vec_id",
                    "label",
                    F.transform(
                        "embedding", lambda x: x.cast("double")
                    ).alias("e"),
                )
                occ = int(
                    _embedding_cells(prep)
                    .groupBy("label", "subcell")
                    .count()
                    .agg(F.max("count"))
                    .collect()[0][0]
                )
                gen_stats["emb500k_max_cell"] = occ
                if occ > 4 * _EMB_CELL_TARGET:
                    errors["emb500k_occupancy"] = (
                        f"max cell {occ} > {4 * _EMB_CELL_TARGET}"
                    )
            except Exception as exc:  # noqa: BLE001
                errors["emb500k_occupancy"] = (
                    f"{type(exc).__name__}: {exc}"[:200]
                )
        except Exception as exc:  # noqa: BLE001
            errors["tier_emb500k"] = f"{type(exc).__name__}: {exc}"[:200]

    # DSIR at the 500k-document corpus (r11: the family's first scale
    # proof point — importance scoring and the Gumbel top-k resample
    # were new in r10 with sf-fixture timings only). Reuses the text
    # tier's corpus500k fixture. Beyond timing, the two plan shapes the
    # small-SF tests pin (tests/test_new_ops_plans.py) are re-asserted
    # ON THE 500k PLAN: the 256-row λ table must still come back as a
    # broadcast hash join (a shuffled join would key the whole ~100M-row
    # bigram-occurrence stream by bucket), and the resample must still
    # be TakeOrderedAndProject (a global sort would order 500k rows to
    # keep 100). AQE can only downgrade these with data in hand, so the
    # sf0.001 pin alone doesn't prove the 500k shape.
    if os.environ.get("SPARK_GRAFT_500K", "1") != "0":
        try:
            from pyspark.sql import functions as F

            from tpctools_spark.generate_corpus import gen_documents
            from tpctools_spark.queries.pipeline import _DSIR_K

            corpus500_dir = os.path.join(sf1_dir, "corpus500k_fixture")
            docs500 = os.path.join(corpus500_dir, "documents.parquet")
            if not os.path.exists(os.path.join(docs500, "_SUCCESS")):
                gen_documents(
                    spark, 500_000, parts=32, vocab_size=100_000
                ).write.mode("overwrite").parquet(docs500)

            # Plan assertions read the FINAL post-AQE plan, which only
            # exists after executing the same DataFrame object (the
            # test_new_ops_plans._plan pattern) — so each timed run
            # collects its own df and inspects the plan it just
            # executed; no extra full execution is spent on the check.
            def _final_plan(df) -> str:
                return (
                    df._jdf.queryExecution().executedPlan().toString()
                ).split("+- == Initial Plan ==")[0]

            plan_ok = {"bhj": False, "tko": False}

            def _dsir_imp() -> int:
                df = qs["pipeline_dsir_importance"](spark, corpus500_dir)
                rows = df.collect()
                if "BroadcastHashJoin" in _final_plan(df):
                    plan_ok["bhj"] = True
                spark.catalog.clearCache()
                if len(rows) != 500_000:
                    raise AssertionError(f"scored {len(rows)} != 500000")
                n_sel = sum(1 for r in rows if r["selected"])
                if not 0 < n_sel < 500_000:
                    raise AssertionError(f"degenerate selection {n_sel}")
                return n_sel

            _timed("dsir_importance_500k", _dsir_imp, reps=2)
            if not plan_ok["bhj"]:
                errors["dsir_importance_500k_plan"] = (
                    "lambda join is not broadcast at 500k"
                )

            def _dsir_res() -> int:
                df = qs["pipeline_importance_resample"](spark, corpus500_dir)
                rows = df.collect()
                if "TakeOrderedAndProject" in _final_plan(df):
                    plan_ok["tko"] = True
                spark.catalog.clearCache()
                if len(rows) != _DSIR_K:
                    raise AssertionError(f"resampled {len(rows)} != {_DSIR_K}")
                return len(rows)

            _timed("dsir_resample_500k", _dsir_res, reps=2)
            if not plan_ok["tko"]:
                errors["dsir_resample_500k_plan"] = (
                    "resample is not TakeOrdered at 500k"
                )
        except Exception as exc:  # noqa: BLE001
            errors["tier_dsir500k"] = f"{type(exc).__name__}: {exc}"[:200]

    # ANN retrieval at 25x the sf0.1 embeddings fixture: IVF cell-pruned
    # top-k + its recall against the in-query brute-force ground truth,
    # over 50k label-clustered generated vectors (dim 64, fixture
    # layout, registry query verbatim). The pipeline is deterministic,
    # so the measured recall is a FIXED property of (corpus, nprobe=3):
    # 0.5 here — at 25x the density the probe's true top-10 spreads
    # past 3 of the 10 cells, exactly the decay the nprobe curve
    # (sim_ivf_nprobe_curve) exists to retune; the floor assert catches
    # any index-pipeline change that degrades it further.
    try:
        from tpctools_spark.generate_corpus import gen_embeddings

        emb_fix_dir = os.path.join(sf1_dir, "emb50k_fixture")
        emb_fix = os.path.join(emb_fix_dir, "embeddings.parquet")
        if not os.path.exists(os.path.join(emb_fix, "_SUCCESS")):
            gen_embeddings(spark, 50_000, dim=64, parts=32).write.mode(
                "overwrite"
            ).parquet(emb_fix)

        def _ivf_50k() -> float:
            row = qs["sim_ivf_recall"](spark, emb_fix_dir).collect()[0]
            spark.catalog.clearCache()
            return float(row["recall_at_k"])

        recall = _timed("sim_ivf_50k", _ivf_50k, reps=2)
        if recall < 0.4:
            errors["sim_ivf_50k"] = f"recall degraded: {recall} < 0.4"
    except Exception as exc:  # noqa: BLE001
        errors["sim_ivf_50k"] = f"{type(exc).__name__}: {exc}"[:200]

    # BM25 lexical retrieval at the same 50k-doc scale point: the
    # registry query verbatim (filtered postings explode + broadcast
    # stats + TakeOrdered top-k). No planted relevance truth exists for
    # BM25, so the in-line assert pins structure: exactly TOPK ranked
    # rows with positive scores — any postings/stat regression that
    # empties or truncates the result set fails loudly.
    try:
        corpus_fix_dir = os.path.join(sf1_dir, "corpus50k_fixture")

        def _bm25_50k() -> list:
            out = qs["text_bm25_search"](spark, corpus_fix_dir).collect()
            spark.catalog.clearCache()
            return out

        rows = _timed("text_bm25_50k", _bm25_50k, reps=2)
        ranks = sorted(r["rank"] for r in rows)
        from tpctools_spark.queries.retrieval import BM25_TOPK

        # Pin the FULL top-k: exactly BM25_TOPK rows with consecutive
        # ranks 1..k and positive scores — a silently truncated result
        # (ranks 1..n, n < k) must fail, not pass.
        if (
            len(rows) != BM25_TOPK
            or ranks != list(range(1, BM25_TOPK + 1))
            or any(r["bm25"] <= 0 for r in rows)
        ):
            errors["text_bm25_50k"] = f"top-k structure broken: {len(rows)} rows"
    except Exception as exc:  # noqa: BLE001
        errors["text_bm25_50k"] = f"{type(exc).__name__}: {exc}"[:200]

    # PQ ANN at the same 50k-vector point, split on the index seam
    # (retrieval._pq_build / _pq_probe_from): the BUILD (codebook
    # Lloyd + full-corpus encode, materialized to parquet — the
    # data-proportional cost a production deployment amortizes across
    # probes) and the PROBE (LUT → ADC over the code table → C-row
    # exact rescore — the per-query cost) are timed separately and
    # are the headline keys (r11: the fused sim_pq_50k entry, which
    # re-trained the codebook inside every timed rep, is retired —
    # its 8.5 s said nothing about the serving path; see the note at
    # retrieval._pq_rescored). Recall of the SPLIT probe against
    # exact fixed-point ground truth gates at >= 0.9 — the floor that
    # caught the original ADC-only form at 0.0.
    try:
        emb_fix_dir = os.path.join(sf1_dir, "emb50k_fixture")

        from tpctools_spark.queries.retrieval import (
            _PQ_TOPK,
            _pq_build,
            _pq_exact_topk_ids,
            _pq_probe_from,
        )

        pq_dir = os.path.join(sf1_dir, "pq50k_index")

        def _pq_build_once() -> None:
            cb, enc = _pq_build(spark, emb_fix_dir)
            cb.write.mode("overwrite").parquet(os.path.join(pq_dir, "cb"))
            enc.write.mode("overwrite").parquet(os.path.join(pq_dir, "enc"))

        _timed("sim_pq_build_50k", _pq_build_once, reps=2)

        cbr = spark.read.parquet(os.path.join(pq_dir, "cb"))
        encr = spark.read.parquet(os.path.join(pq_dir, "enc"))

        def _pq_probe_once() -> list:
            return (
                _pq_probe_from(spark, emb_fix_dir, cbr, encr)
                .orderBy("exact_dist", "vec_id")
                .limit(_PQ_TOPK)
                .collect()
            )

        rows = _timed("sim_pq_probe_50k", _pq_probe_once, reps=2)
        probe_ids = {r["vec_id"] for r in rows}
        exact_ids = {
            r["e_id"]
            for r in _pq_exact_topk_ids(spark, emb_fix_dir).collect()
        }
        split_recall = len(probe_ids & exact_ids) / _PQ_TOPK
        if split_recall < 0.9:
            errors["sim_pq_probe_50k"] = (
                f"split-probe recall degraded: {split_recall} < 0.9"
            )
    except Exception as exc:  # noqa: BLE001
        errors["sim_pq_50k"] = f"{type(exc).__name__}: {exc}"[:200]

    # Full TPC-DS 99 at sf1: a decade above the per-query scratch
    # fixtures (sf0.001). Materialized once (pure function of
    # (table, sf), reused across rounds), then every registered
    # tpcds_q* shape runs end-to-end into the noop sink. Each plan is
    # first warmed UNTIMED against the default sf0.001 materialization
    # — the codegen cache keys on the generated source, so the compile
    # cost (5-10 s for the big shapes, data-independent) is paid on
    # tiny data and the timed sf1 pass measures the data-proportional
    # quantity (measured: q89 6.4 s single-pass vs 2.3 s warmed). The
    # compact line carries the suite total and the 10 slowest, the
    # full map lands in bench_out.json. This is the anchor that
    # catches join-order/AQE regressions the small fixtures can't
    # express.
    tpcds_sf1: dict[str, float] = {}
    # Per-query rep counts: reps shrink 3 → 2 → 1 as the suite budget
    # drains, so a single "passes" scalar would overstate the protocol
    # for late-alphabet queries — the artifact records what each
    # query's min was actually a min OF.
    tpcds_sf1_reps: dict[str, int] = {}
    try:
        from tpctools_spark.benchfix import ensure_tpcds_sf1

        tpcds_sf1_dir = ensure_tpcds_sf1(spark)
        # Soft wall-clock budget: the driver's bench capture must never
        # be lost to this (round 3 lost its whole record to one crash);
        # if the suite overruns, stop, record how many shapes were
        # skipped, and still print the compact line.
        budget_s = float(os.environ.get("SPARK_GRAFT_SF1_BUDGET", "750"))
        suite_t0 = time.perf_counter()
        skipped_for_budget = 0
        ds_names = sorted(n for n in qs if n.startswith("tpcds_q"))
        try:
            # Warm pass: compile every plan on the tiny default tables
            # (codegen cache keys on generated source, so the 5-10 s
            # compile for big shapes is paid on data-free plans).
            for name in ds_names:
                try:
                    os.environ.pop("TPCTOOLS_TPCDS_DIR", None)
                    qs[name](spark, SF_DIR).write.format("noop").mode(
                        "overwrite"
                    ).save()
                except Exception as exc:  # noqa: BLE001
                    errors[f"sf1_{name}"] = (
                        f"{type(exc).__name__}: {exc}"[:200]
                    )
            # Timed: up to 3 BACK-TO-BACK reps per query, min. Single
            # sf1 samples on a shared JVM swing ±40% (r8 recorded q90
            # at 6.4 s vs a 0.65 s steady state); consecutive reps
            # keep each query's code+data hot, which measured ~25%
            # lower mins than whole-suite passes (171.6 vs 131.2 s
            # totals, r9) — the steady state a dedicated cluster job
            # sustains. Reps shrink to 2/1 as the budget tightens.
            os.environ["TPCTOOLS_TPCDS_DIR"] = tpcds_sf1_dir
            for name in ds_names:
                elapsed = time.perf_counter() - suite_t0
                if elapsed > budget_s:
                    skipped_for_budget += 1
                    continue
                reps = sf1_rep_policy(elapsed, budget_s)
                try:
                    for _ in range(reps):
                        t0 = time.perf_counter()
                        qs[name](spark, SF_DIR).write.format("noop").mode(
                            "overwrite"
                        ).save()
                        dt = round(time.perf_counter() - t0, 3)
                        if name not in tpcds_sf1 or dt < tpcds_sf1[name]:
                            tpcds_sf1[name] = dt
                    tpcds_sf1_reps[name] = reps
                except Exception as exc:  # noqa: BLE001
                    errors[f"sf1_{name}"] = (
                        f"{type(exc).__name__}: {exc}"[:200]
                    )
        finally:
            os.environ.pop("TPCTOOLS_TPCDS_DIR", None)
        if skipped_for_budget:
            errors["tpcds_sf1_budget"] = (
                f"budget {budget_s:.0f}s hit: {skipped_for_budget} of 99 "
                "shapes not timed this run"
            )
        timings["tpcds_sf1_suite"] = round(sum(tpcds_sf1.values()), 3)
    except Exception as exc:  # noqa: BLE001
        errors["tpcds_sf1_suite"] = f"{type(exc).__name__}: {exc}"[:200]

    # Full TPC-H 22 at sf1 — the symmetric anchor. 14 fixture-form
    # queries (incl. Q1=agg_group_sum, Q6=filter_pred) run over the
    # materialized generator tables in fixture layout; the 8 spec-form
    # queries over the generator's own layout via TPCTOOLS_TPCH_DIR.
    # Same warm-on-tiny protocol and its own soft budget.
    tpch_sf1: dict[str, float] = {}
    tpch_sf1_reps: dict[str, int] = {}
    _TPCH_FIXTURE_FORM = [
        "agg_group_sum", "filter_pred",
        "tpch_q3_shipping_priority", "tpch_q4_order_priority",
        "tpch_q5_local_supplier", "tpch_q7_volume_shipping",
        "tpch_q8_market_share", "tpch_q10_returned_items",
        "tpch_q13_customer_distribution", "tpch_q14_promo_revenue",
        "tpch_q15_top_supplier", "tpch_q17_small_quantity_revenue",
        "tpch_q18_large_volume_customer",
        "tpch_q22_global_sales_opportunity",
    ]
    _TPCH_GEN_FORM = [
        "tpch_q2_min_cost_supplier", "tpch_q9_product_profit",
        "tpch_q11_important_stock", "tpch_q12_shipmode_priority",
        "tpch_q16_supplier_part_count", "tpch_q19_discounted_revenue",
        "tpch_q20_potential_promotion", "tpch_q21_suppliers_kept_waiting",
    ]
    try:
        from tpctools_spark.benchfix import ensure_tpch_sf1

        _, tpch_gen_dir = ensure_tpch_sf1(spark)
        budget_s = float(
            os.environ.get("SPARK_GRAFT_TPCH_SF1_BUDGET", "300")
        )
        suite_t0 = time.perf_counter()
        skipped_for_budget = 0
        try:
            # Warm pass (compile on tiny tables), then up to 3
            # back-to-back timed reps per query, min — same protocol
            # and rationale as the TPC-DS block above.
            for name in _TPCH_FIXTURE_FORM + _TPCH_GEN_FORM:
                try:
                    os.environ.pop("TPCTOOLS_TPCH_DIR", None)
                    qs[name](spark, SF_DIR).write.format("noop").mode(
                        "overwrite"
                    ).save()
                except Exception as exc:  # noqa: BLE001
                    errors[f"sf1_{name}"] = (
                        f"{type(exc).__name__}: {exc}"[:200]
                    )
            for name in _TPCH_FIXTURE_FORM + _TPCH_GEN_FORM:
                elapsed = time.perf_counter() - suite_t0
                if elapsed > budget_s:
                    skipped_for_budget += 1
                    continue
                reps = sf1_rep_policy(elapsed, budget_s)
                try:
                    if name in _TPCH_GEN_FORM:
                        os.environ["TPCTOOLS_TPCH_DIR"] = tpch_gen_dir
                    else:
                        os.environ.pop("TPCTOOLS_TPCH_DIR", None)
                    for _ in range(reps):
                        t0 = time.perf_counter()
                        qs[name](spark, sf1_dir).write.format("noop").mode(
                            "overwrite"
                        ).save()
                        dt = round(time.perf_counter() - t0, 3)
                        if name not in tpch_sf1 or dt < tpch_sf1[name]:
                            tpch_sf1[name] = dt
                    tpch_sf1_reps[name] = reps
                except Exception as exc:  # noqa: BLE001
                    errors[f"sf1_{name}"] = (
                        f"{type(exc).__name__}: {exc}"[:200]
                    )
        finally:
            os.environ.pop("TPCTOOLS_TPCH_DIR", None)
        if skipped_for_budget:
            errors["tpch_sf1_budget"] = (
                f"budget {budget_s:.0f}s hit: {skipped_for_budget} of 22 "
                "shapes not timed this run"
            )
        timings["tpch_sf1_suite"] = round(sum(tpch_sf1.values()), 3)
    except Exception as exc:  # noqa: BLE001
        errors["tpch_sf1_suite"] = f"{type(exc).__name__}: {exc}"[:200]

    sf = os.path.basename(SF_DIR.rstrip("/")).removeprefix("sf")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf

    # Host calibration, sample 2 of 2 (suite end).
    try:
        calib_end = _calibration_run(spark)
    except Exception:  # noqa: BLE001
        calib_end = -1.0
    host_calibration = _calibration_verdict(calib_start, calib_end)

    full = {
        "metric": "suite_wall_time",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "cold_queries": cold,
        "warm_spread": spread,
        "host_calibration_s": host_calibration,
        "gen_throughput": gen_stats,
        "tpcds_sf1_queries": tpcds_sf1,
        "tpcds_sf1_reps": tpcds_sf1_reps,
        "tpcds_sf1_min_reps": min(tpcds_sf1_reps.values(), default=0),
        "tpch_sf1_queries": tpch_sf1,
        "tpch_sf1_reps": tpch_sf1_reps,
        "tpch_sf1_min_reps": min(tpch_sf1_reps.values(), default=0),
        "errors": errors,
        "sf": sf_val,
    }
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_out.json"
    )
    with open(out_path, "w") as f:
        json.dump(full, f, indent=2)

    # Driver contract: ONE compact JSON line, printed LAST. The driver's
    # stdout tail capture is ~2000 chars — round 2's full map overflowed
    # it (BENCH_r02 parsed:null), so only the headline subset rides here.
    compact = {
        "metric": "suite_wall_time",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: timings[k] for k in COMPACT_KEYS if k in timings},
        "host_calibration_s": host_calibration,
        "gen_throughput": gen_stats,
        "sf": sf_val,
        "detail": "bench_out.json",
    }
    if tpch_sf1:
        compact["tpch_sf1_suite"] = timings.get("tpch_sf1_suite")
    if tpcds_sf1:
        compact["tpcds_sf1_suite"] = timings.get("tpcds_sf1_suite")
        compact["tpcds_sf1_slowest"] = {
            k.removeprefix("tpcds_"): v
            for k, v in sorted(
                tpcds_sf1.items(), key=lambda kv: -kv[1]
            )[:10]
        }
    if errors:
        # Names only on the compact line (messages live in bench_out.json)
        # so the line stays inside the driver's tail-capture budget.
        compact["errors"] = sorted(errors)
    line = json.dumps(compact)
    if len(line) >= 1800:  # never die on line length — shed detail instead
        compact["tpcds_sf1_slowest"] = dict(
            list(compact.get("tpcds_sf1_slowest", {}).items())[:3]
        )
        line = json.dumps(compact)
    if len(line) >= 1800:
        compact["queries"] = dict(list(compact["queries"].items())[:8])
        compact.pop("errors", None)
        line = json.dumps(compact)
    print(line)


if __name__ == "__main__":
    main()
