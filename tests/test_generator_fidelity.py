"""Generator fidelity vs the TPC spec scaling tables.

Cheap insurance that "spec-shaped" stays true as the generators
evolve: per-table row counts must match the published TPC-H
(spec §4.2.5) and TPC-DS (spec table 3-2) scaling rules. The sf1
anchors are HARD-CODED here — independent of the generators' own
cardinality tables — so a drive-by edit to either cannot silently
agree with itself.
"""

from __future__ import annotations

import pytest

from tpctools_spark.generate import build_table
from tpctools_spark.generate_tpcds import CARDINALITY, build_tpcds_table, rows_for

# TPC-H spec: rows at sf1; every non-fixed table scales linearly.
# lineitem is stochastic in the spec (1-7 lines per order, avg ≈ 4);
# it is checked by band below, not listed here.
_TPCH_SF1 = {
    "region": (5, True),
    "nation": (25, True),
    "supplier": (10_000, False),
    "customer": (150_000, False),
    "part": (200_000, False),
    "partsupp": (800_000, False),
    "orders": (1_500_000, False),
}

# TPC-DS spec table 3-2 at sf1 (fixed-size dimensions marked True).
_TPCDS_SF1 = {
    "store_sales": (2_880_404, False),
    "catalog_sales": (1_441_548, False),
    "web_sales": (719_384, False),
    "inventory": (11_745_000, False),
    "item": (18_000, False),
    "customer": (100_000, False),
    "customer_address": (50_000, False),
    "date_dim": (73_049, True),
    "time_dim": (86_400, True),
    "store": (12, False),
    "warehouse": (5, False),
    "call_center": (6, False),
}


@pytest.mark.parametrize("sf", [0.01, 0.1])
@pytest.mark.parametrize("name", sorted(_TPCH_SF1))
def test_tpch_row_counts_match_spec(spark, name, sf):
    base, fixed = _TPCH_SF1[name]
    want = base if fixed else max(1, int(base * sf))
    assert build_table(spark, name, sf, 8).count() == want


@pytest.mark.parametrize("sf", [0.01])
def test_tpch_lineitem_in_spec_band(spark, sf):
    """lineitem has 1–7 lines per order (avg ≈ 4), so the spec count is
    a band around 6M·sf, not a constant."""
    orders = 1_500_000 * sf
    n = build_table(spark, "lineitem", sf, 8).count()
    assert 3.5 * orders <= n <= 4.5 * orders, n


@pytest.mark.parametrize("name", sorted(_TPCDS_SF1))
def test_tpcds_sf1_anchor_matches_spec(name):
    """The generator's cardinality table must carry the published sf1
    numbers (checked WITHOUT building data — pure table lookup)."""
    want, fixed = _TPCDS_SF1[name]
    assert rows_for(name, 1.0) == want
    if fixed:
        assert rows_for(name, 0.01) == want, f"{name} must not scale"


@pytest.mark.parametrize("sf", [0.01])
@pytest.mark.parametrize(
    "name",
    ["store_sales", "item", "customer", "date_dim", "store", "inventory"],
)
def test_tpcds_built_counts_match_cardinality(spark, name, sf):
    """What the generator BUILDS equals what its table declares."""
    assert build_tpcds_table(spark, name, sf, 8).count() == rows_for(name, sf)


def test_tpcds_cardinality_covers_all_24_tables():
    assert len(CARDINALITY) == 24
