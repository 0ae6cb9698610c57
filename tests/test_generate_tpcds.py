"""TPC-DS generator: schema conformance, partition invariance, FK ranges."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tpctools_spark.generate_tpcds import (
    DATE_SK_EPOCH,
    build_tpcds_table,
    rows_for,
)
from tpctools_spark.schemas_tpcds import TPCDS

SCALE = 0.001
SMALL = ["store", "warehouse", "income_band", "reason", "ship_mode",
         "call_center", "web_site", "promotion", "item", "customer_address"]


def test_registry_complete():
    assert len(TPCDS) == 24
    assert sum(len(s.fields) for s in TPCDS.values()) == 425


@pytest.mark.parametrize("name", list(TPCDS))
def test_schema_conformance(spark, name):
    """Names and types match the registry exactly. Nullability in Spark
    plans is advisory (pmod/when mark outputs nullable), so the
    reference's NOT NULL declarations are enforced as a data property:
    required columns never contain an actual null."""
    df = build_tpcds_table(spark, name, SCALE, 2)
    assert [(f.name, f.dataType) for f in df.schema.fields] == [
        (f.name, f.dataType) for f in TPCDS[name].fields
    ]
    required = [f.name for f in TPCDS[name].fields if not f.nullable]
    if required:
        preds = [F.col(c).isNull() for c in required]
        cond = preds[0]
        for p in preds[1:]:
            cond = cond | p
        assert df.filter(cond).count() == 0, f"nulls in required cols of {name}"


@pytest.mark.parametrize("name", SMALL + ["store_sales", "date_dim"])
def test_partition_invariance(spark, name):
    def fp(p):
        df = build_tpcds_table(spark, name, SCALE, p)
        h = F.xxhash64(*[F.col(c).cast("string") for c in df.columns])
        r = df.select(F.sum(h).alias("s"), F.count(F.lit(1)).alias("n")).collect()[0]
        return (r["s"], r["n"])

    assert fp(2) == fp(5)


def test_date_dim_is_a_real_calendar(spark):
    dd = build_tpcds_table(spark, "date_dim", SCALE, 2)
    row = dd.filter(F.col("d_date") == "2000-02-29").collect()
    assert len(row) == 1  # leap day exists
    r = row[0]
    assert r.d_year == 2000 and r.d_moy == 2 and r.d_dom == 29
    assert r.d_date_sk == DATE_SK_EPOCH + (r.d_date - __import__("datetime").date(1900, 1, 2)).days


def test_fact_fk_lands_in_dimension_range(spark):
    ss = build_tpcds_table(spark, "store_sales", SCALE, 2)
    n_item = rows_for("item", SCALE)
    n_store = rows_for("store", SCALE)
    bad = ss.filter(
        ~F.col("ss_item_sk").between(1, n_item)
        | (F.col("ss_store_sk").isNotNull() & ~F.col("ss_store_sk").between(1, n_store))
    ).count()
    assert bad == 0
    # date FKs live in the date_dim surrogate range
    dates = ss.filter(F.col("ss_sold_date_sk").isNotNull()).agg(
        F.min("ss_sold_date_sk"), F.max("ss_sold_date_sk")
    ).collect()[0]
    assert dates[0] >= DATE_SK_EPOCH
    assert dates[1] < DATE_SK_EPOCH + rows_for("date_dim", SCALE)


def test_nullable_attributes_have_some_nulls(spark):
    c = build_tpcds_table(spark, "customer", 0.01, 2)
    n = c.count()
    nulls = c.filter(F.col("c_birth_year").isNull()).count()
    assert 0 < nulls < n  # ~4%
