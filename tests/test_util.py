"""Determinism helpers: cross-engine FP hygiene (_util module)."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from tpctools_spark.queries._util import dsum, sql_trunc_digits, trunc_digits

EDGE_DOUBLES = [0.125, 0.105, 2.675, 1e-9, 123456.789, 0.99995, 7.0]


@pytest.mark.parametrize("x", EDGE_DOUBLES)
def test_trunc_digits_matches_duckdb(spark, x):
    got = (
        spark.range(1)
        .select(trunc_digits(F.lit(x), 2).alias("t"))
        .collect()[0]["t"]
    )
    want = duckdb.sql(f"SELECT {sql_trunc_digits(str(x), 2)}").fetchone()[0]
    assert got == want


def test_dsum_is_partition_order_invariant(spark):
    """Decimal-summed money is identical for any partitioning (the whole
    point of dsum: FP sums are order-dependent, decimal sums are not)."""
    vals = [(i, round(((i * 7919) % 100000) / 100.0 + 0.01, 2)) for i in range(5000)]
    df = spark.createDataFrame(vals, "id long, amount double")
    results = {
        df.repartition(p).agg(dsum(F.col("amount")).alias("s")).collect()[0]["s"]
        for p in (1, 3, 17)
    }
    assert len(results) == 1
