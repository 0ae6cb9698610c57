"""TPC-DS end-to-end demos over the native generator (rows-only).

The driver fixtures carry no TPC-DS tables, so these queries exercise
the full reference surface in one plan: generate (partition-invariant,
:mod:`tpctools_spark.generate_tpcds`) → star-join → rollup — the
workload shape the reference's data exists to feed
(``/root/reference/README.md:85-93``). Deterministic by construction
(generated columns are pure functions of row ids), so the rows-only
check is stable across runs and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tpctools_spark.generate_tpcds import build_tpcds_table
from tpctools_spark.registry import query

_SCALE = 0.001


@query("tpcds_sales_rollup")  # generated input → rows-only
def tpcds_sales_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """store_sales ⋆ date_dim ⋆ store rollup: net paid by year/month.

    Star-join shape: the fact carries surrogate date keys; date_dim
    (fixed 73k rows) and store broadcast; ROLLUP produces the
    year → month → grand-total lattice. At any scale the only wide
    shuffle is the fact-side aggregation exchange.
    """
    p = spark.sparkContext.defaultParallelism
    ss = build_tpcds_table(spark, "store_sales", _SCALE, p)
    dd = F.broadcast(
        build_tpcds_table(spark, "date_dim", _SCALE, p).select(
            "d_date_sk", "d_year", "d_moy"
        )
    )
    st = F.broadcast(
        build_tpcds_table(spark, "store", _SCALE, p).select("s_store_sk")
    )
    return (
        ss.join(dd, ss.ss_sold_date_sk == dd.d_date_sk)
        .join(st, ss.ss_store_sk == st.s_store_sk)
        .rollup("d_year", "d_moy")
        .agg(
            F.count(F.lit(1)).alias("n_sales"),
            F.round(F.sum(F.col("ss_net_paid")).cast("double"), 2).alias(
                "sum_net_paid"
            ),
        )
        .select("d_year", "d_moy", "n_sales", "sum_net_paid")
    )


@query("tpcds_inventory_by_warehouse")  # generated input → rows-only
def tpcds_inventory_by_warehouse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """inventory ⋆ warehouse ⋆ item: stock position per warehouse.

    The no-fixture second shape: a quantity fact keyed by (date, item,
    warehouse) aggregated against two broadcast dims.
    """
    p = spark.sparkContext.defaultParallelism
    inv = build_tpcds_table(spark, "inventory", _SCALE, p)
    w = F.broadcast(
        build_tpcds_table(spark, "warehouse", _SCALE, p).select(
            "w_warehouse_sk", "w_warehouse_id"
        )
    )
    return (
        inv.join(w, inv.inv_warehouse_sk == w.w_warehouse_sk)
        .groupBy("w_warehouse_id")
        .agg(
            F.count(F.lit(1)).alias("n_records"),
            F.sum("inv_quantity_on_hand").alias("total_qty"),
        )
    )
