"""Structural semantic guards, beyond oracle equality.

Oracle checks prove Spark ≡ DuckDB; these pin the properties the ops
CLAIM (the banded interval join reproduces the naive range join, the
join-size profile predicts the real join, bloom filters are physically
written, batch assembly respects its size cap and waste accounting,
the diff classes partition the key space, the script's fixed point
satisfies its own exit condition) so a refactor that broke the claim
symmetrically in both engines would still fail here.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tpctools_spark.catalog import table
from tpctools_spark.registry import spark_queries

SF = "/root/testdata/sf0.001"


def test_interval_grid_equals_naive_range_join(spark):
    """The grid-bucketed plan must reproduce the naive (quadratic)
    range-join answer exactly — each true pair found exactly once,
    none invented by the cell replication."""
    got = {
        r["iv_user"]: (r["n_pairs"], r["n_windows_hit"])
        for r in spark_queries()["join_interval_grid"](spark, SF).collect()
    }
    ev = table(spark, SF, "events")
    iv = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("iv_id"),
        F.col("user_id").alias("iv_user"),
        F.unix_micros("ts").alias("s"),
    )
    pts = ev.filter(F.col("event_type") == "purchase").select(
        F.unix_micros("ts").alias("p_ts")
    )
    naive = (
        iv.crossJoin(pts)
        .filter(
            (F.col("p_ts") >= F.col("s"))
            & (F.col("p_ts") < F.col("s") + F.lit(900 * 1_000_000))
        )
        .groupBy("iv_user")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("iv_id").alias("n_windows_hit"),
        )
        .collect()
    )
    want = {r["iv_user"]: (r["n_pairs"], r["n_windows_hit"]) for r in naive}
    assert got == want and got


def test_join_size_profile_predicts_the_real_join(spark):
    """The pre-flight numbers must equal ground truth measured on the
    actually-executed join."""
    row = spark_queries()["quality_join_size_profile"](spark, SF).collect()[0]
    o = table(spark, SF, "orders")
    li = table(spark, SF, "lineitem")
    real = o.join(li, o.o_orderkey == li.l_orderkey).count()
    assert row["join_rows"] == real
    heaviest = (
        li.groupBy("l_orderkey")
        .count()
        .orderBy(F.desc("count"), "l_orderkey")
        .first()
    )
    assert row["max_key_rows"] == heaviest["count"]
    assert row["heaviest_key"] == heaviest["l_orderkey"]


def test_parquet_bloom_filters_are_physically_written(spark, tmp_path):
    """Same projection, same rows: the bloom-enabled file must carry
    strictly more bytes (the serialized filters). Guards against the
    writer option silently not reaching parquet-mr — which is exactly
    what happens with the per-column `#col` variant in this build."""
    import os

    ev = table(spark, SF, "events").select("event_id", "user_id")

    def size_of(path, with_bloom):
        w = ev.coalesce(1).write.mode("overwrite")
        if with_bloom:
            w = w.option("parquet.bloom.filter.enabled", "true")
        w.parquet(path)
        (f,) = [x for x in os.listdir(path) if x.endswith(".parquet")]
        return os.path.getsize(os.path.join(path, f))

    plain = size_of(str(tmp_path / "plain"), False)
    bloom = size_of(str(tmp_path / "bloom"), True)
    assert bloom > plain


def test_length_batches_cap_and_waste_accounting(spark):
    out = {
        r["bucket"]: r
        for r in spark_queries()["pipeline_length_batches"](
            spark, SF
        ).collect()
    }
    d = table(spark, SF, "documents")
    assert sum(r["n_docs"] for r in out.values()) == d.count()
    for b, r in out.items():
        # Batch cap: n_batches is exactly ceil(n_docs / 32).
        assert r["n_batches"] == -(-r["n_docs"] // 32)
        assert 0 <= r["wasted_chars"] < r["padded_chars"]
        # Waste is bounded by the bucket's own width: every batch max
        # and min live in [200*b, 200*(b+1)), so per-doc padding < 200.
        assert r["wasted_chars"] < 200 * r["n_docs"]


def test_snapshot_diff_partitions_the_key_space(spark):
    rows = spark_queries()["reshape_snapshot_diff"](spark, SF).collect()
    by_class = {r["change"]: r["n_keys"] for r in rows}
    assert set(by_class) <= {"insert", "update", "delete", "unchanged"}
    ev = table(spark, SF, "events")
    # Keys counted = users whose latest state (either version) is live.
    n_keys_live = (
        spark_queries()["reshape_snapshot_diff"](spark, SF)
        .agg(F.sum("n_keys"))
        .collect()[0][0]
    )
    assert n_keys_live <= ev.select("user_id").distinct().count()
    assert sum(by_class.values()) == n_keys_live


def test_sql_script_fixed_point_satisfies_exit_condition(spark):
    row = spark_queries()["scalar_sql_script"](spark, SF).collect()[0]
    thr, n_tail, n = (
        row["tail_threshold"],
        row["n_tail_orders"],
        row["n_orders"],
    )
    o = table(spark, SF, "orders")
    assert n == o.count()
    assert n_tail == o.filter(F.col("o_totalprice") > thr).count()
    assert n_tail * 20 <= n  # the WHILE exit condition holds at thr
    # ... and did NOT hold one rung earlier (thr is minimal): walk the
    # ladder back one step.
    prev = None
    t = 100
    while t < thr:
        prev = t
        t = (t * 3) // 2
    if prev is not None:
        n_prev = o.filter(F.col("o_totalprice") > prev).count()
        assert n_prev * 20 > n


def test_tar_shards_bytes_are_reproducible(spark):
    """Two runs must produce byte-identical shard files (mtime pinned,
    members sorted) — the property that makes shard artifacts
    content-addressable and cache-friendly."""
    import glob
    import hashlib
    import os

    from tpctools_spark.queries import scans

    def digest_run():
        before = set(glob.glob(os.path.join(scans._SCRATCH, "tar-shards*")))
        spark_queries()["multimodal_tar_shards"](spark, SF).collect()
        (new,) = (
            set(glob.glob(os.path.join(scans._SCRATCH, "tar-shards*")))
            - before
        )
        out = {}
        for f in sorted(glob.glob(os.path.join(new, "*.tar"))):
            out[os.path.basename(f)] = hashlib.sha256(
                open(f, "rb").read()
            ).hexdigest()
        return out

    a = digest_run()
    b = digest_run()
    assert a == b and a


def test_structural_ops_are_partitioning_invariant(spark):
    """Results must not depend on the shuffle-partition count —
    the property that makes max_by tie-breaking (snapshot diff),
    two-pass global ranks (length batches), and the banded join's
    cell replication safe to run on any cluster layout."""
    names = [
        "reshape_snapshot_diff",
        "pipeline_length_batches",
        "join_interval_grid",
        "feature_mutual_info",
    ]
    prior = spark.conf.get("spark.sql.shuffle.partitions")
    results = {}
    try:
        for n_part in ("3", "17"):
            spark.conf.set("spark.sql.shuffle.partitions", n_part)
            for name in names:
                rows = sorted(
                    tuple(r)
                    for r in spark_queries()[name](spark, SF).collect()
                )
                results.setdefault(name, []).append(rows)
            spark.catalog.clearCache()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prior)
    for name, (a, b) in results.items():
        assert a == b, name


def test_fdr_bh_planted_shift_rejects(spark):
    """BH step-up must REJECT a planted mean-shifted segment and
    ACCEPT the null segments. Drives the rejection branch that the
    uniform fixtures never hit (Chebyshev only rejects real shifts).

    Construction: 9 null segments × 500 rows alternating {0, 100}
    (mean exactly 50) and one TINY shifted segment (10 rows at the
    documented cents cap 100_000). The shifted rows barely move the
    pooled mean (Δ ≈ 222 cents), so each null's Chebyshev bound
    v/(n·d²) ≈ 0.90 — accepted — while the shifted segment's
    d ≈ 10⁸ milli-cents collapses its bound to ~2·10⁻⁴ — rejected
    at rank 1. The pooled variance is shared, exactly as the
    registered query computes it.
    """
    from tpctools_spark.queries.quality import _fdr_bh_from

    rows = []
    for g in range(9):
        for i in range(500):
            rows.append((f"null_{g}", 100 * (i % 2)))
    for i in range(10):
        rows.append(("shifted", 100_000))
    base = spark.createDataFrame(rows, "segment string, cents bigint")
    out = {r["segment"]: r for r in _fdr_bh_from(base).collect()}
    assert out["shifted"]["rejected"] is True
    assert out["shifted"]["rnk"] == 1  # smallest p sorts first
    for g in range(9):
        assert out[f"null_{g}"]["rejected"] is False, f"null_{g}"
    # milli-cent means are integer-exact
    assert out["shifted"]["mean_millicents"] == 100_000 * 1000
    assert out["null_0"]["mean_millicents"] == 50 * 1000


def test_components_chain_converges_logarithmically(spark):
    """A planted 1000-link chain must converge within the loud cap —
    and in O(log n) rounds, proving the pointer-halving step works.
    Plain min-label propagation would need ~1000 rounds here and the
    cap would (correctly) fire."""
    from tpctools_spark.queries.dedup import (
        _COMPONENTS_MAX_ROUNDS,
        _min_label_components,
    )

    n = 1000
    chain = [(i, i + 1) for i in range(n)]
    sym = chain + [(b, a) for a, b in chain]
    edges = spark.createDataFrame(sym, "src bigint, dst bigint")
    labels, rounds = _min_label_components(edges)
    try:
        rows = labels.collect()
    finally:
        labels.unpersist()
    assert rounds <= 25, f"chain took {rounds} rounds — halving broken?"
    assert rounds <= _COMPONENTS_MAX_ROUNDS
    assert len(rows) == n + 1
    assert all(r["cluster_id"] == 0 for r in rows)
