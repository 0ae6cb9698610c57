"""Exact value parity vs DuckDB for a representative query subset.

Full-inventory parity runs via ``scripts/check_oracle.py`` (and the
driver's own gate); here a cross-category subset keeps the pytest suite
fast while still catching regressions in determinism hygiene (decimal
sums, truncation, timezone pinning).
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts"))
from check_oracle import normalize  # noqa: E402

SUBSET = [
    "agg_group_sum",
    "filter_pred",
    "join_inner_equi",
    "join_asof_event",
    "window_rank_topn",
    "window_session",
    "window_tumbling",
    "scalar_math_decimal",
    "scalar_json",
    "sort_multi_key",
    "dedup_exact",
    "sim_cosine_topk",
    "text_tokens",
    "tpch_q3_shipping_priority",
    "tpch_q4_order_priority",
    "tpch_q13_customer_distribution",
    "tpch_q17_small_quantity_revenue",
    "tpch_q22_global_sales_opportunity",
    "tpcds_q5_channel_rollup",
]


@pytest.mark.parametrize("name", SUBSET)
def test_matches_duckdb(spark, duck, sf_dir, name):
    from tpctools_spark.registry import oracle_queries, spark_queries

    sdf = spark_queries()[name](spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    rel = duck.sql(oracle_queries()[name])
    drows = rel.fetchall()

    assert sorted(sdf.columns) == sorted(rel.columns), name
    assert len(srows) == len(drows), f"{name}: {len(srows)} vs {len(drows)}"
    assert normalize(srows, sdf.columns) == normalize(drows, list(rel.columns))
