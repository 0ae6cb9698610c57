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


# TPC-DS spec Table 3-2 at the sf10 / sf100 / sf1000 discrete scale
# points — the sublinear dimensions. Hard-coded independently of
# generate_tpcds.SPEC_SUBLINEAR_ROWS so both tables must agree with
# the published spec, not merely with each other.
_TPCDS_SUBLINEAR_ANCHORS = {
    # name: {sf: rows}
    "customer": {10: 500_000, 100: 2_000_000, 1000: 12_000_000},
    "customer_address": {10: 250_000, 100: 1_000_000, 1000: 6_000_000},
    "item": {10: 102_000, 100: 204_000, 1000: 300_000},
    "store": {10: 102, 100: 402, 1000: 1_002},
    "warehouse": {10: 10, 100: 15, 1000: 20},
    "promotion": {10: 500, 100: 1_000, 1000: 1_500},
    "reason": {10: 45, 100: 55, 1000: 65},
    "call_center": {10: 24, 100: 30, 1000: 42},
    "catalog_page": {10: 12_000, 100: 20_400, 1000: 30_000},
    "web_page": {10: 200, 100: 2_040, 1000: 3_000},
    # web_site's sf100 dip is per spec (sites retire over time)
    "web_site": {10: 42, 100: 24, 1000: 54},
    # inventory = 261 weeks x (item/2) x warehouses, exact at anchors
    "inventory": {10: 133_110_000, 100: 399_330_000, 1000: 783_000_000},
}


@pytest.mark.parametrize("name", sorted(_TPCDS_SUBLINEAR_ANCHORS))
def test_tpcds_sublinear_scaling_matches_spec(name):
    """rows_for must reproduce the spec's sublinear dimension scaling
    at sf10/sf100/sf1000 — a linear base×sf rule fails every one of
    these (customer at sf1000 would be 100 M, spec says 12 M)."""
    for sf, want in _TPCDS_SUBLINEAR_ANCHORS[name].items():
        assert rows_for(name, float(sf)) == want, (name, sf)


def test_tpcds_sublinear_interpolation_monotone_and_bounded():
    """Between anchors rows_for interpolates: values stay within the
    bracketing anchors and below-sf1 behavior is unchanged pro-rata."""
    assert rows_for("customer", 0.01) == 1_000  # historical fixture size
    mid = rows_for("customer", 30.0)
    assert 500_000 < mid < 2_000_000
    big = rows_for("customer", 30_000.0)  # beyond last anchor: keeps growing
    assert big > 65_000_000


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
