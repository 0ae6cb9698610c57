"""Shard-dedup planner calibration guards, beyond oracle equality:
the BH planted-shift and components-chain tests live in
test_structural_guards.py; here, the shard-dedup planner's
estimator calibration — an oracle proves Spark ≡ DuckDB, but only a
ground-truth comparison proves the ESTIMATES mean anything (the lesson
of the PQ recall fix)."""

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


def test_shard_dedup_run_recall_on_planted_truth(spark, tmp_path_factory):
    """The planner's consumer: running ONLY the top-k planned shard
    pairs must recover >= 0.9 of the cross-shard near-dup pairs an
    all-pairs run finds, on a corpus with planted cross-shard dups.

    Plant: heavy duplication across shard pairs (0,1) and (2,3), one
    lone dup across (0,2), none elsewhere — the planner must rank
    (0,1) and (2,3) into its top 3, so planned recall is >= 22/23."""
    from tpctools_spark.registry import spark_queries

    def words(seed: int, n: int = 12) -> str:
        return " ".join(f"w{seed}x{j}" for j in range(n))

    rows = []
    # background: a few unique docs in every shard (kept small so the
    # planted intersections dominate the k=16 sketch sample)
    for i in range(20):
        rows.append((100 + i, words(1000 + i)))
    # planted dups across (0,1): doc 4k and 4k+1 share text
    for k in range(12):
        t = words(2000 + k)
        rows.append((200 + 4 * k, t))        # shard 0
        rows.append((200 + 4 * k + 1, t))    # shard 1
    # planted dups across (2,3)
    for k in range(10):
        t = words(3000 + k)
        rows.append((300 + 4 * k + 2, t))    # shard 2
        rows.append((300 + 4 * k + 3, t))    # shard 3
    # one lone dup across (0,2) — allowed to be missed
    t = words(4000)
    rows.append((400, t))                    # shard 0
    rows.append((402, t))                    # shard 2
    out = str(tmp_path_factory.mktemp("shard_run"))
    spark.createDataFrame(
        [(i, t, "en", "test", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")

    qs = spark_queries()
    planned = {
        (r.doc_a, r.doc_b)
        for r in qs["pipeline_shard_dedup_run"](spark, out).collect()
    }
    # all-pairs ground truth: full jaccard pairs, cross-shard only
    allp = {
        (r.doc_a, r.doc_b)
        for r in qs["dedup_ngram_jaccard"](spark, out).collect()
        if r.doc_a % 4 != r.doc_b % 4
    }
    assert allp, "planted duplicates not found by the all-pairs run"
    assert planned <= allp
    recall = len(planned) / len(allp)
    assert recall >= 0.9, (recall, sorted(allp - planned))
