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


@query("tpcds_q3_brand_revenue")  # generated input → rows-only
def tpcds_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q3 shape: manufacturer's brand revenue by year, December
    sales only.

    Fact⋈date on the surrogate date key with the month predicate pushed
    into the broadcast dimension; brand grouping aggregates map-side
    first (item is tiny and broadcast).
    """
    p = spark.sparkContext.defaultParallelism
    ss = build_tpcds_table(spark, "store_sales", _SCALE, p)
    dd = F.broadcast(
        build_tpcds_table(spark, "date_dim", _SCALE, p)
        .filter(F.col("d_moy") == 12)
        .select("d_date_sk", "d_year")
    )
    it = F.broadcast(
        build_tpcds_table(spark, "item", _SCALE, p)
        .filter(F.col("i_manufact_id") % 20 == 1)
        .select("i_item_sk", "i_brand_id", "i_brand")
    )
    return (
        ss.join(dd, ss.ss_sold_date_sk == dd.d_date_sk)
        .join(it, ss.ss_item_sk == it.i_item_sk)
        .groupBy("d_year", "i_brand_id", "i_brand")
        .agg(F.round(F.sum("ss_ext_sales_price").cast("double"), 2).alias("sum_agg"))
        .orderBy("d_year", F.col("sum_agg").desc(), "i_brand_id")
        .limit(100)
    )


@query("tpcds_q7_demographic_avg")  # generated input → rows-only
def tpcds_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q7 shape: per-item averages for a demographic slice under
    no-response promotions.

    Four broadcast dimensions against one fact scan; the demographics
    table is spec-fixed at 1.92M rows regardless of SF, so its filtered
    projection (demo_sk only) is what broadcasts, not the full table.
    """
    p = spark.sparkContext.defaultParallelism
    ss = build_tpcds_table(spark, "store_sales", _SCALE, p)
    cd = F.broadcast(
        build_tpcds_table(spark, "customer_demographics", _SCALE, p)
        .filter(
            (F.col("cd_gender") == "F")
            & (F.col("cd_marital_status") == "W")
            & (F.col("cd_education_status") == "College")
        )
        .select("cd_demo_sk")
    )
    dd = F.broadcast(
        build_tpcds_table(spark, "date_dim", _SCALE, p)
        .filter(F.col("d_year") == 1999)
        .select("d_date_sk")
    )
    it = F.broadcast(
        build_tpcds_table(spark, "item", _SCALE, p).select("i_item_sk", "i_item_id")
    )
    pr = F.broadcast(
        build_tpcds_table(spark, "promotion", _SCALE, p)
        .filter((F.col("p_channel_email") == "N") | (F.col("p_channel_event") == "N"))
        .select("p_promo_sk")
    )
    return (
        ss.join(cd, ss.ss_cdemo_sk == cd.cd_demo_sk)
        .join(dd, ss.ss_sold_date_sk == dd.d_date_sk)
        .join(pr, ss.ss_promo_sk == pr.p_promo_sk)
        .join(it, ss.ss_item_sk == it.i_item_sk)
        .groupBy("i_item_id")
        .agg(
            F.round(F.avg("ss_quantity"), 4).alias("agg1"),
            F.round(F.avg("ss_list_price").cast("double"), 4).alias("agg2"),
            F.round(F.avg("ss_coupon_amt").cast("double"), 4).alias("agg3"),
            F.round(F.avg("ss_sales_price").cast("double"), 4).alias("agg4"),
        )
        .orderBy("i_item_id")
        .limit(100)
    )


@query("tpcds_q15_catalog_zip")  # generated input → rows-only
def tpcds_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q15 shape: catalog revenue by customer zip for big-ticket
    or select-state buyers in one quarter.

    The disjunctive residual (zip prefix OR state OR price) cannot prune
    at any single scan, so it evaluates post-join; the customer→address
    chain stays broadcast while the fact shuffles once for the zip
    grouping.
    """
    p = spark.sparkContext.defaultParallelism
    cs = build_tpcds_table(spark, "catalog_sales", _SCALE, p)
    c = build_tpcds_table(spark, "customer", _SCALE, p).select(
        "c_customer_sk", "c_current_addr_sk"
    )
    ca = build_tpcds_table(spark, "customer_address", _SCALE, p).select(
        "ca_address_sk", "ca_zip", "ca_state"
    )
    dd = F.broadcast(
        build_tpcds_table(spark, "date_dim", _SCALE, p)
        .filter((F.col("d_qoy") == 1) & (F.col("d_year") == 2000))
        .select("d_date_sk")
    )
    keep = (
        F.substring("ca_zip", 1, 2).isin("85", "86", "88")
        | F.col("ca_state").isin("CA", "GA", "WA")
        | (F.col("cs_sales_price") > 450)
    )
    return (
        cs.join(dd, cs.cs_sold_date_sk == dd.d_date_sk)
        .join(F.broadcast(c), cs.cs_bill_customer_sk == c.c_customer_sk)
        .join(F.broadcast(ca), c.c_current_addr_sk == ca.ca_address_sk)
        .filter(keep)
        .groupBy("ca_zip")
        .agg(F.round(F.sum("cs_sales_price").cast("double"), 2).alias("sum_sales"))
        .orderBy("ca_zip")
        .limit(100)
    )


@query("tpcds_q33_cross_channel")  # generated input → rows-only
def tpcds_q33(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q33 shape: one category's revenue summed across all three
    sales channels.

    Each channel aggregates independently (partial aggs collapse the
    facts before any union), then unionByName concatenates the three
    tiny per-channel results for the final rollup — the fan-in shape
    TPC-DS uses for Q33/Q56/Q60/Q76.
    """
    p = spark.sparkContext.defaultParallelism
    it = F.broadcast(
        build_tpcds_table(spark, "item", _SCALE, p)
        .filter(F.col("i_category") == "Electronics")
        .select("i_item_sk", "i_manufact_id")
    )
    dd = F.broadcast(
        build_tpcds_table(spark, "date_dim", _SCALE, p)
        .filter(F.col("d_year") == 1999)
        .select("d_date_sk")
    )

    def channel(fact: DataFrame, date_sk: str, item_sk: str, price: str) -> DataFrame:
        return (
            fact.join(dd, F.col(date_sk) == F.col("d_date_sk"))
            .join(it, F.col(item_sk) == F.col("i_item_sk"))
            .groupBy("i_manufact_id")
            .agg(F.sum(F.col(price).cast("decimal(17,2)")).alias("total_sales"))
        )

    ss = channel(
        build_tpcds_table(spark, "store_sales", _SCALE, p),
        "ss_sold_date_sk", "ss_item_sk", "ss_ext_sales_price",
    )
    cs = channel(
        build_tpcds_table(spark, "catalog_sales", _SCALE, p),
        "cs_sold_date_sk", "cs_item_sk", "cs_ext_sales_price",
    )
    ws = channel(
        build_tpcds_table(spark, "web_sales", _SCALE, p),
        "ws_sold_date_sk", "ws_item_sk", "ws_ext_sales_price",
    )
    return (
        ss.unionByName(cs)
        .unionByName(ws)
        .groupBy("i_manufact_id")
        .agg(F.round(F.sum("total_sales").cast("double"), 2).alias("total_sales"))
        .orderBy(F.col("total_sales").desc(), "i_manufact_id")
        .limit(100)
    )


@query("tpcds_q88_time_buckets")  # generated input → rows-only
def tpcds_q88(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q88 shape: store traffic in four half-hour buckets, one
    row out.

    The spec writes 8 scalar subqueries cross-joined into one row; here
    one fact scan feeds a conditional aggregation (sum of CASEs per
    bucket) — same result, 1/8th the scans. time_dim and the
    dependents-filtered household_demographics broadcast.
    """
    p = spark.sparkContext.defaultParallelism
    ss = build_tpcds_table(spark, "store_sales", _SCALE, p)
    td = F.broadcast(
        build_tpcds_table(spark, "time_dim", _SCALE, p)
        .filter(F.col("t_hour").between(8, 11))
        .select("t_time_sk", "t_hour", "t_minute")
    )
    hd = F.broadcast(
        build_tpcds_table(spark, "household_demographics", _SCALE, p)
        .filter(F.col("hd_dep_count").between(1, 5))
        .select("hd_demo_sk")
    )
    half_hour = (F.col("t_hour") * 2 + (F.col("t_minute") >= 30).cast("int"))
    bucket = (half_hour - 16).alias("bucket")  # 0..7 over 8:00-11:59
    return (
        ss.join(td, ss.ss_sold_time_sk == td.t_time_sk)
        .join(hd, ss.ss_hdemo_sk == hd.hd_demo_sk)
        .groupBy()
        .agg(
            *[
                F.sum((half_hour == 16 + i).cast("long")).alias(f"h{8 + i // 2}_{30 * (i % 2)}")
                for i in range(8)
            ]
        )
    )
