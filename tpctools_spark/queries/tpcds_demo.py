"""TPC-DS end-to-end demos over the native generator, oracle-checked.

The driver fixtures carry no TPC-DS tables, so these queries exercise
the full reference surface in one plan: generate (partition-invariant,
:mod:`tpctools_spark.generate_tpcds`) → star-join → rollup — the
workload shape the reference's data exists to feed
(``/root/reference/README.md:85-93``).

Oracle strategy (same as :mod:`tpch_generated`): generation is a pure
function of row ids, so the needed tables are MATERIALIZED once to a
stable scratch directory and every oracle is spec-form DuckDB SQL over
the very same parquet files — full value-level cross-engine checks.

Determinism notes: all money columns are decimal(7,2), so SUMs carry
scale 2 and ROUND(CAST(.. AS DOUBLE), 2) is exact on both engines.
Averages are computed as exact decimal/int SUM divided by COUNT in
double (identical operation order in both engines), then truncated —
never via engine-native AVG, whose intermediate typing differs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tpctools_spark.generate_tpcds import build_tpcds_table
from tpctools_spark.queries._util import trunc_digits
from tpctools_spark.registry import query

_SCALE = 0.001
_GEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".scratch",
    "tpcds_gen_sf0001",
)
_GEN_TABLES = [
    "store_sales", "catalog_sales", "web_sales", "inventory",
    "date_dim", "time_dim", "item", "store", "warehouse",
    "customer", "customer_address", "customer_demographics",
    "household_demographics", "promotion",
]


def _materialize(spark: SparkSession) -> None:
    """Write the generated TPC-DS tables to scratch once (pure function
    of (table, scale) — reusable across sessions and by DuckDB)."""
    marker = os.path.join(_GEN_DIR, "_ALL_TABLES_OK")
    if os.path.exists(marker):
        return
    p = spark.sparkContext.defaultParallelism
    for name in _GEN_TABLES:
        build_tpcds_table(spark, name, _SCALE, p).write.mode("overwrite").parquet(
            os.path.join(_GEN_DIR, name)
        )
    with open(marker, "w") as f:
        f.write("ok\n")


def _t(spark: SparkSession, name: str) -> DataFrame:
    _materialize(spark)
    return spark.read.parquet(os.path.join(_GEN_DIR, name))


def _with(*tables: str) -> str:
    """WITH prefix registering generated-table parquet as DuckDB CTEs."""
    ctes = ", ".join(
        f"{t} AS (SELECT * FROM read_parquet('{_GEN_DIR}/{t}/*.parquet'))"
        for t in tables
    )
    return f"WITH {ctes}"


def _avg4(sum_col: F.Column, count_col: F.Column) -> F.Column:
    """Exact sum / count in double, truncated to 4 decimals — the
    cross-engine-stable average (native AVG typing differs)."""
    return trunc_digits(sum_col.cast("double") / count_col, 4)


@query(
    "tpcds_sales_rollup",
    oracle=_with("store_sales", "date_dim", "store")
    + """
    SELECT d_year, d_moy, COUNT(*) AS n_sales,
           ROUND(CAST(SUM(ss_net_paid) AS DOUBLE), 2) AS sum_net_paid
    FROM store_sales
    JOIN date_dim ON ss_sold_date_sk = d_date_sk
    JOIN store ON ss_store_sk = s_store_sk
    GROUP BY ROLLUP(d_year, d_moy)
    """,
)
def tpcds_sales_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """store_sales ⋆ date_dim ⋆ store rollup: net paid by year/month.

    Star-join shape: the fact carries surrogate date keys; date_dim
    (fixed 73k rows) and store broadcast; ROLLUP produces the
    year → month → grand-total lattice. At any scale the only wide
    shuffle is the fact-side aggregation exchange.
    """
    ss = _t(spark, "store_sales")
    dd = F.broadcast(_t(spark, "date_dim").select("d_date_sk", "d_year", "d_moy"))
    st = F.broadcast(_t(spark, "store").select("s_store_sk"))
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


@query(
    "tpcds_inventory_by_warehouse",
    oracle=_with("inventory", "warehouse")
    + """
    SELECT w_warehouse_id, COUNT(*) AS n_records,
           CAST(SUM(inv_quantity_on_hand) AS BIGINT) AS total_qty
    FROM inventory
    JOIN warehouse ON inv_warehouse_sk = w_warehouse_sk
    GROUP BY w_warehouse_id
    """,
)
def tpcds_inventory_by_warehouse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """inventory ⋆ warehouse: stock position per warehouse.

    The no-fixture second shape: a quantity fact keyed by (date, item,
    warehouse) aggregated against a broadcast dim.
    """
    inv = _t(spark, "inventory")
    w = F.broadcast(_t(spark, "warehouse").select("w_warehouse_sk", "w_warehouse_id"))
    return (
        inv.join(w, inv.inv_warehouse_sk == w.w_warehouse_sk)
        .groupBy("w_warehouse_id")
        .agg(
            F.count(F.lit(1)).alias("n_records"),
            F.sum("inv_quantity_on_hand").alias("total_qty"),
        )
    )


@query(
    "tpcds_q3_brand_revenue",
    oracle=_with("store_sales", "date_dim", "item")
    + """
    SELECT d_year, i_brand_id, i_brand,
           ROUND(CAST(SUM(ss_ext_sales_price) AS DOUBLE), 2) AS sum_agg
    FROM store_sales
    JOIN date_dim ON ss_sold_date_sk = d_date_sk
    JOIN item ON ss_item_sk = i_item_sk
    WHERE d_moy = 12 AND i_manufact_id % 20 = 1
    GROUP BY d_year, i_brand_id, i_brand
    ORDER BY d_year, sum_agg DESC, i_brand_id
    LIMIT 100
    """,
)
def tpcds_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q3 shape: manufacturer's brand revenue by year, December
    sales only.

    Fact⋈date on the surrogate date key with the month predicate pushed
    into the broadcast dimension; brand grouping aggregates map-side
    first (item is tiny and broadcast).
    """
    ss = _t(spark, "store_sales")
    dd = F.broadcast(
        _t(spark, "date_dim").filter(F.col("d_moy") == 12).select("d_date_sk", "d_year")
    )
    it = F.broadcast(
        _t(spark, "item")
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


@query(
    "tpcds_q7_demographic_avg",
    oracle=_with(
        "store_sales", "customer_demographics", "date_dim", "item", "promotion"
    )
    + """
    SELECT i_item_id,
           CAST(floor(CAST(SUM(ss_quantity) AS DOUBLE) / COUNT(ss_quantity)
                      * 10000) AS DOUBLE) / 10000 AS agg1,
           CAST(floor(CAST(SUM(ss_list_price) AS DOUBLE) / COUNT(ss_list_price)
                      * 10000) AS DOUBLE) / 10000 AS agg2,
           CAST(floor(CAST(SUM(ss_coupon_amt) AS DOUBLE) / COUNT(ss_coupon_amt)
                      * 10000) AS DOUBLE) / 10000 AS agg3,
           CAST(floor(CAST(SUM(ss_sales_price) AS DOUBLE) / COUNT(ss_sales_price)
                      * 10000) AS DOUBLE) / 10000 AS agg4
    FROM store_sales
    JOIN customer_demographics ON ss_cdemo_sk = cd_demo_sk
    JOIN date_dim ON ss_sold_date_sk = d_date_sk
    JOIN promotion ON ss_promo_sk = p_promo_sk
    JOIN item ON ss_item_sk = i_item_sk
    WHERE cd_gender = 'F' AND cd_marital_status = 'W'
      AND cd_education_status = 'College'
      AND d_year = 1999
      AND (p_channel_email = 'N' OR p_channel_event = 'N')
    GROUP BY i_item_id
    ORDER BY i_item_id
    LIMIT 100
    """,
)
def tpcds_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q7 shape: per-item averages for a demographic slice under
    no-response promotions.

    Four broadcast dimensions against one fact scan; the demographics
    table is spec-fixed at 1.92M rows regardless of SF, so its filtered
    projection (demo_sk only) is what broadcasts, not the full table.
    Averages are exact-sum / count (see module docstring).
    """
    ss = _t(spark, "store_sales")
    cd = F.broadcast(
        _t(spark, "customer_demographics")
        .filter(
            (F.col("cd_gender") == "F")
            & (F.col("cd_marital_status") == "W")
            & (F.col("cd_education_status") == "College")
        )
        .select("cd_demo_sk")
    )
    dd = F.broadcast(
        _t(spark, "date_dim").filter(F.col("d_year") == 1999).select("d_date_sk")
    )
    it = F.broadcast(_t(spark, "item").select("i_item_sk", "i_item_id"))
    pr = F.broadcast(
        _t(spark, "promotion")
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
            _avg4(F.sum("ss_quantity"), F.count("ss_quantity")).alias("agg1"),
            _avg4(F.sum("ss_list_price"), F.count("ss_list_price")).alias("agg2"),
            _avg4(F.sum("ss_coupon_amt"), F.count("ss_coupon_amt")).alias("agg3"),
            _avg4(F.sum("ss_sales_price"), F.count("ss_sales_price")).alias("agg4"),
        )
        .orderBy("i_item_id")
        .limit(100)
    )


@query(
    "tpcds_q15_catalog_zip",
    oracle=_with("catalog_sales", "customer", "customer_address", "date_dim")
    + """
    SELECT ca_zip,
           ROUND(CAST(SUM(cs_sales_price) AS DOUBLE), 2) AS sum_sales
    FROM catalog_sales
    JOIN date_dim ON cs_sold_date_sk = d_date_sk
    JOIN customer ON cs_bill_customer_sk = c_customer_sk
    JOIN customer_address ON c_current_addr_sk = ca_address_sk
    WHERE d_qoy = 1 AND d_year = 2000
      AND (substring(ca_zip, 1, 2) IN ('85', '86', '88')
           OR ca_state IN ('CA', 'GA', 'WA')
           OR cs_sales_price > 450)
    GROUP BY ca_zip
    ORDER BY ca_zip
    LIMIT 100
    """,
)
def tpcds_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q15 shape: catalog revenue by customer zip for big-ticket
    or select-state buyers in one quarter.

    The disjunctive residual (zip prefix OR state OR price) cannot prune
    at any single scan, so it evaluates post-join; the customer→address
    chain stays broadcast while the fact shuffles once for the zip
    grouping.
    """
    cs = _t(spark, "catalog_sales")
    c = _t(spark, "customer").select("c_customer_sk", "c_current_addr_sk")
    ca = _t(spark, "customer_address").select("ca_address_sk", "ca_zip", "ca_state")
    dd = F.broadcast(
        _t(spark, "date_dim")
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


@query(
    "tpcds_q33_cross_channel",
    oracle=_with("store_sales", "catalog_sales", "web_sales", "date_dim", "item")
    + """
    , per_channel AS (
      SELECT i_manufact_id, SUM(CAST(ss_ext_sales_price AS DECIMAL(17,2))) AS total_sales
      FROM store_sales
      JOIN date_dim ON ss_sold_date_sk = d_date_sk
      JOIN item ON ss_item_sk = i_item_sk
      WHERE i_category = 'Electronics' AND d_year = 1999
      GROUP BY i_manufact_id
      UNION ALL
      SELECT i_manufact_id, SUM(CAST(cs_ext_sales_price AS DECIMAL(17,2)))
      FROM catalog_sales
      JOIN date_dim ON cs_sold_date_sk = d_date_sk
      JOIN item ON cs_item_sk = i_item_sk
      WHERE i_category = 'Electronics' AND d_year = 1999
      GROUP BY i_manufact_id
      UNION ALL
      SELECT i_manufact_id, SUM(CAST(ws_ext_sales_price AS DECIMAL(17,2)))
      FROM web_sales
      JOIN date_dim ON ws_sold_date_sk = d_date_sk
      JOIN item ON ws_item_sk = i_item_sk
      WHERE i_category = 'Electronics' AND d_year = 1999
      GROUP BY i_manufact_id
    )
    SELECT i_manufact_id,
           ROUND(CAST(SUM(total_sales) AS DOUBLE), 2) AS total_sales
    FROM per_channel
    GROUP BY i_manufact_id
    ORDER BY total_sales DESC, i_manufact_id
    LIMIT 100
    """,
)
def tpcds_q33(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q33 shape: one category's revenue summed across all three
    sales channels.

    Each channel aggregates independently (partial aggs collapse the
    facts before any union), then unionByName concatenates the three
    tiny per-channel results for the final rollup — the fan-in shape
    TPC-DS uses for Q33/Q56/Q60/Q76.
    """
    it = F.broadcast(
        _t(spark, "item")
        .filter(F.col("i_category") == "Electronics")
        .select("i_item_sk", "i_manufact_id")
    )
    dd = F.broadcast(
        _t(spark, "date_dim").filter(F.col("d_year") == 1999).select("d_date_sk")
    )

    def channel(fact: DataFrame, date_sk: str, item_sk: str, price: str) -> DataFrame:
        return (
            fact.join(dd, F.col(date_sk) == F.col("d_date_sk"))
            .join(it, F.col(item_sk) == F.col("i_item_sk"))
            .groupBy("i_manufact_id")
            .agg(F.sum(F.col(price).cast("decimal(17,2)")).alias("total_sales"))
        )

    ss = channel(
        _t(spark, "store_sales"), "ss_sold_date_sk", "ss_item_sk", "ss_ext_sales_price"
    )
    cs = channel(
        _t(spark, "catalog_sales"), "cs_sold_date_sk", "cs_item_sk", "cs_ext_sales_price"
    )
    ws = channel(
        _t(spark, "web_sales"), "ws_sold_date_sk", "ws_item_sk", "ws_ext_sales_price"
    )
    return (
        ss.unionByName(cs)
        .unionByName(ws)
        .groupBy("i_manufact_id")
        .agg(F.round(F.sum("total_sales").cast("double"), 2).alias("total_sales"))
        .orderBy(F.col("total_sales").desc(), "i_manufact_id")
        .limit(100)
    )


@query(
    "tpcds_q88_time_buckets",
    oracle=_with("store_sales", "time_dim", "household_demographics")
    + """
    SELECT
      CAST(SUM(CASE WHEN hh = 16 THEN 1 ELSE 0 END) AS BIGINT) AS h8_0,
      CAST(SUM(CASE WHEN hh = 17 THEN 1 ELSE 0 END) AS BIGINT) AS h8_30,
      CAST(SUM(CASE WHEN hh = 18 THEN 1 ELSE 0 END) AS BIGINT) AS h9_0,
      CAST(SUM(CASE WHEN hh = 19 THEN 1 ELSE 0 END) AS BIGINT) AS h9_30,
      CAST(SUM(CASE WHEN hh = 20 THEN 1 ELSE 0 END) AS BIGINT) AS h10_0,
      CAST(SUM(CASE WHEN hh = 21 THEN 1 ELSE 0 END) AS BIGINT) AS h10_30,
      CAST(SUM(CASE WHEN hh = 22 THEN 1 ELSE 0 END) AS BIGINT) AS h11_0,
      CAST(SUM(CASE WHEN hh = 23 THEN 1 ELSE 0 END) AS BIGINT) AS h11_30
    FROM (
      SELECT t_hour * 2 + CASE WHEN t_minute >= 30 THEN 1 ELSE 0 END AS hh
      FROM store_sales
      JOIN time_dim ON ss_sold_time_sk = t_time_sk
      JOIN household_demographics ON ss_hdemo_sk = hd_demo_sk
      WHERE t_hour BETWEEN 8 AND 11 AND hd_dep_count BETWEEN 1 AND 5
    )
    """,
)
def tpcds_q88(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q88 shape: store traffic in four half-hour buckets, one
    row out.

    The spec writes 8 scalar subqueries cross-joined into one row; here
    one fact scan feeds a conditional aggregation (sum of CASEs per
    bucket) — same result, 1/8th the scans. time_dim and the
    dependents-filtered household_demographics broadcast.
    """
    ss = _t(spark, "store_sales")
    td = F.broadcast(
        _t(spark, "time_dim")
        .filter(F.col("t_hour").between(8, 11))
        .select("t_time_sk", "t_hour", "t_minute")
    )
    hd = F.broadcast(
        _t(spark, "household_demographics")
        .filter(F.col("hd_dep_count").between(1, 5))
        .select("hd_demo_sk")
    )
    half_hour = (F.col("t_hour") * 2 + (F.col("t_minute") >= 30).cast("int"))
    return (
        ss.join(td, ss.ss_sold_time_sk == td.t_time_sk)
        .join(hd, ss.ss_hdemo_sk == hd.hd_demo_sk)
        .groupBy()
        .agg(
            *[
                F.sum((half_hour == 16 + i).cast("long")).alias(
                    f"h{8 + i // 2}_{30 * (i % 2)}"
                )
                for i in range(8)
            ]
        )
    )
