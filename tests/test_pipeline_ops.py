"""Invariant tests for the training-data-pipeline operators.

The oracle gate proves Spark==DuckDB; these tests prove the SEMANTICS
are right — packing conservation, sampling determinism/monotonicity,
mixture-weight algebra — properties a matching-but-wrong pair of
implementations could both violate.
"""

from __future__ import annotations

from tpctools_spark.registry import spark_queries


def test_pack_sequences_conservation(spark, sf_dir):
    """Contiguous packing: within each shard, every token lands in
    exactly one (seq, offset) slot — each doc starts exactly where the
    previous doc in its shard ended."""
    rows = spark_queries()["pipeline_pack_sequences"](spark, sf_dir).collect()
    seq_len = 128
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    assert len(by_shard) == 8
    for shard, docs in by_shard.items():
        docs.sort(key=lambda r: r.doc_id)
        cum = 0
        for r in docs:
            assert r.seq_id == shard * 1_000_000 + cum // seq_len
            assert r.seq_offset == cum % seq_len
            span = (cum % seq_len + r.n_tokens + seq_len - 1) // seq_len
            assert r.n_seqs_spanned == span
            cum += r.n_tokens


def test_stratified_sample_deterministic_and_monotone(spark, sf_dir):
    """Membership is a pure function of doc_id — rerunning gives the
    identical kept set, and en-docs are kept at a lower rate."""
    q = spark_queries()["pipeline_sample_stratified"]
    kept1 = {r.doc_id for r in q(spark, sf_dir).collect()}
    kept2 = {r.doc_id for r in q(spark, sf_dir).collect()}
    assert kept1 == kept2 and kept1
    rows = q(spark, sf_dir).collect()
    assert all(
        r.keep_pct == (20 if r.lang == "en" else 80) for r in rows
    )


def test_mix_weights_algebra(spark, sf_dir):
    """Shares sum to ~1 and weight ≈ uniform-target / actual-share."""
    rows = spark_queries()["pipeline_mix_weights"](spark, sf_dir).collect()
    n = len(rows)
    total_share = sum(r.actual_share for r in rows)
    assert abs(total_share - 1.0) < 1e-3  # truncation slack
    for r in rows:
        if r.actual_share > 0:
            expect = (1.0 / n) / r.actual_share
            assert abs(r.mix_weight - expect) < expect * 0.01


def test_contamination_only_crosses_eval_boundary(spark, sf_dir):
    """Pairs always have train on the left, eval (doc_id%97==0) on the
    right, and the flag matches the shared-gram threshold."""
    rows = spark_queries()["pipeline_contamination"](spark, sf_dir).collect()
    assert rows  # planted fixture guarantees at least one hit
    for r in rows:
        assert r.eval_doc % 97 == 0
        assert r.train_doc % 97 != 0
        assert r.contaminated == (r.n_shared_grams >= 3)


def test_pii_scrub_removes_pattern(spark, sf_dir):
    """Scrubbed docs no longer match; count equals raw occurrences."""
    from pyspark.sql import functions as F

    from tpctools_spark.catalog import table

    out = spark_queries()["pipeline_pii_scrub"](spark, sf_dir)
    docs = table(spark, sf_dir, "documents")
    joined = out.join(docs, "doc_id").select(
        "doc_id",
        "n_redactions",
        F.regexp_count(
            F.regexp_replace("text", r"\b(customer|spark)\b", "<PII>"),
            F.lit(r"\b(customer|spark)\b"),
        ).alias("left_after"),
    )
    rows = joined.collect()
    assert rows
    assert all(r.left_after == 0 for r in rows)
    assert all(r.n_redactions > 0 for r in rows)
