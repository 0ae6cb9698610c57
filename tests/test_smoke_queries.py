"""Smoke: every registered query runs at sf0.001 with a stable schema.

This mirrors the driver's t1 smoke check. Value-level parity against
DuckDB is covered by test_oracle_parity.py and scripts/check_oracle.py.
"""

from __future__ import annotations

import pytest

from tpctools_spark.registry import spark_queries

QUERY_NAMES = sorted(spark_queries())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_runs(spark, sf_dir, name):
    fn = spark_queries()[name]
    df = fn(spark, sf_dir)
    assert df.columns, f"{name}: empty schema"
    # Deterministic column names (no auto-generated agg names that would
    # break the driver's column-sorted value hash).
    for c in df.columns:
        assert "(" not in c, f"{name}: unaliased column {c!r}"
    n = df.count()
    assert n >= 0
