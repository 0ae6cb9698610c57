"""Dimension-drift guards and lambda-free plan pins.

Oracle checks prove Spark ≡ DuckDB; these pin properties the round's
changes CLAIM: embedding-dimension drift fails loudly instead of
silently dropping pairs (r11 ADVICE), and the harness-level cache
hygiene convention holds.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _collect_err(df):
    with pytest.raises(Exception) as ei:
        df.collect()
    return str(ei.value)


def test_wide_dims_rejects_short_embeddings(spark):
    """element_at past the end returns NULL — the old silent-drop
    failure mode. The guard must raise, naming the observed dim."""
    from tpctools_spark.queries.similarity import _wide_dims

    bad = spark.createDataFrame(
        [(1, [0.1, 0.2, 0.3]), (2, [0.4, 0.5, 0.6])],
        "vec_id bigint, embedding array<double>",
    )
    msg = _collect_err(bad.select(*_wide_dims(bad, "embedding", "a")))
    assert "_wide_dims" in msg and "got 3" in msg


def test_wide_dims_rejects_long_embeddings(spark):
    """Extra dims would be silently ignored (truncated cosines) — the
    guard must raise on longer-than-expected vectors too."""
    from tpctools_spark.queries.similarity import _EMB_DIM, _wide_dims

    bad = spark.createDataFrame(
        [(1, [0.5] * (_EMB_DIM + 3))],
        "vec_id bigint, embedding array<double>",
    )
    msg = _collect_err(bad.select(*_wide_dims(bad, "embedding", "a")))
    assert f"got {_EMB_DIM + 3}" in msg


def test_wide_dims_identity_on_correct_dim(spark):
    """On a right-sized vector the guard is an identity: the flattened
    columns equal the array elements exactly."""
    from tpctools_spark.queries.similarity import _EMB_DIM, _wide_dims

    vec = [float(i) / 7 for i in range(_EMB_DIM)]
    ok = spark.createDataFrame(
        [(1, vec)], "vec_id bigint, embedding array<double>"
    )
    row = ok.select(*_wide_dims(ok, "embedding", "a")).collect()[0]
    assert [row[f"a{d}"] for d in range(1, _EMB_DIM + 1)] == vec


def test_lsh_cosine_rejects_dim_drift(spark, tmp_path):
    """The LSH flatten carries the same guard: a corpus with dim != 64
    errors instead of producing NULL-gated empty output."""
    from tpctools_spark.registry import spark_queries

    bad_dir = str(tmp_path / "sfbad")
    spark.createDataFrame(
        [(i, [0.1 * i, 0.2, 0.3, 0.4]) for i in range(1, 40)],
        "vec_id bigint, embedding array<float>",
    ).write.parquet(f"{bad_dir}/embeddings.parquet")
    msg = _collect_err(
        spark_queries()["dedup_lsh_cosine"](spark, bad_dir)
    )
    assert "dedup_lsh_cosine" in msg and "got 4" in msg
    spark.catalog.clearCache()


def test_dsir_bigram_plan_is_lambda_free(spark):
    """The r12 8.2× win came from evicting the interpreted HOF
    transform() lambda from the bigram build; pin the shape so a
    refactor cannot quietly reintroduce it. arrays_zip must feed the
    explode and no ArrayTransform may appear anywhere in the analyzed
    plan of the hashed stream."""
    from tpctools_spark.catalog import table
    from tpctools_spark.queries.pipeline import _dsir_hashed

    plan = (
        _dsir_hashed(table(spark, SF, "documents"))
        ._jdf.queryExecution()
        .analyzed()
        .toString()
    )
    assert "arrays_zip" in plan, "native adjacent-pair zip missing"
    assert "transform(" not in plan, (
        "interpreted HOF transform() lambda reintroduced in the DSIR "
        "bigram build (r12: ~12s of a 14.4s query at 500k)"
    )


def test_bigram_lm_plan_is_lambda_free(spark):
    """Same pin for text_bigram_lm's gram stream (ported r12)."""
    from tpctools_spark.registry import spark_queries

    plan = (
        spark_queries()["text_bigram_lm"](spark, SF)
        ._jdf.queryExecution()
        .analyzed()
        .toString()
    )
    assert "arrays_zip" in plan
    assert "transform(sequence" not in plan
