"""Semantic guards for the round-11 additions, beyond oracle equality.

Oracle checks prove Spark ≡ DuckDB; these pin the properties the ops
CLAIM (partitioning invariance, equi-depth balance, the histogram
error bound, bootstrap replicate statistics) so a refactor that broke
the claim symmetrically in both engines would still fail here.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tpctools_spark.registry import spark_queries

SF = "/root/testdata/sf0.001"


def test_label_propagation_partitioning_invariant(spark):
    """The deterministic-argmax LPA must produce identical trajectories
    for ANY shuffle partitioning — the property random tie-breaking
    destroys and the (max count, min label) rule exists to provide."""
    q = spark_queries()["graph_label_propagation"]
    prior = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = [tuple(r) for r in q(spark, SF).collect()]
        spark.catalog.clearCache()
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = [tuple(r) for r in q(spark, SF).collect()]
        spark.catalog.clearCache()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prior)
    assert a == b
    # Coarsening is monotone: community count never increases.
    ncomm = [r[1] for r in a]
    assert ncomm == sorted(ncomm, reverse=True)


def test_quantile_bucket_equidepth_balance(spark):
    """bucket = ((rank-1)·K) div N partitions N rows into K buckets
    whose sizes differ by at most 1 — the defining equi-depth property
    — and bucket value-ranges must be disjoint and ordered."""
    rows = spark_queries()["feature_quantile_bucket"](spark, SF).collect()
    sizes = [r.n_rows for r in rows]
    assert len(rows) == 10
    assert max(sizes) - min(sizes) <= 1
    assert sum(sizes) == spark.read.parquet(f"{SF}/orders.parquet").count()
    for lo, hi in zip(rows, rows[1:]):
        assert lo.hi_cents <= hi.lo_cents  # ordered, non-overlapping


def test_histogram_quantile_bound_holds(spark):
    """Every group's bound_ok must be TRUE: the exact discrete
    percentile lies inside the bucket the histogram picked. (The
    oracle would also pass with symmetric False — this pins True.)"""
    rows = spark_queries()["agg_histogram_quantile"](spark, SF).collect()
    assert rows and all(r.bound_ok for r in rows)


def test_poisson_bootstrap_replicate_statistics(spark):
    """Replicate effective sizes must behave like independent
    Poisson(1) resamples: each within 6·√N of N, and NOT all equal
    (the lattice-correlation failure the quadratic hash round fixes
    would collapse the spread)."""
    rows = spark_queries()["sample_poisson_bootstrap"](spark, SF).collect()
    n = spark.read.parquet(f"{SF}/orders.parquet").count()
    sizes = [r.n_eff for r in rows]
    assert len(sizes) == 8
    for s in sizes:
        assert abs(s - n) <= 6 * math.sqrt(n) + 1
    assert len(set(sizes)) > 1
    # Means vary across replicates but stay near the population mean.
    means = [r.boot_mean_cents for r in rows]
    pop = [
        r[0]
        for r in spark.read.parquet(f"{SF}/orders.parquet")
        .agg(
            F.avg(
                (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast(
                    "bigint"
                )
            )
        )
        .collect()
    ][0]
    for m in means:
        assert abs(m - float(pop)) < 0.05 * float(pop)


def test_variant_shred_matches_string_path(spark):
    """The variant shred must agree with the get_json_object string
    path on the same documents — binary and string JSON access are
    two implementations of one semantics."""
    out = {
        r.event_type: (r.n_events, r.sum_k)
        for r in spark_queries()["scalar_variant_shred"](spark, SF).collect()
    }
    ev = spark.read.parquet(f"{SF}/events.parquet")
    want = {
        r.event_type: (r.n, r.s)
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(
                F.get_json_object("props", "$.k").cast("bigint")
            ).cast("bigint").alias("s"),
        )
        .collect()
    }
    assert out == want
