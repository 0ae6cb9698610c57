"""TPC-DS shapes, fourth tier: the multi-CTE self-join family —
Q11 (YoY per-customer channel growth), Q31 (county growth comparison),
Q35 (EXISTS-OR-EXISTS demographic profile), Q59 (week-over-week store
ratios).

These exercise what the earlier tiers don't: the same aggregate CTE
instantiated several times and joined against itself on entity + time
offset, growth-ratio comparisons kept EXACT through integer-cents
cross-multiplication (never FP division on the filter path), and
disjunctive semi-join composition. Oracle scheme as
:mod:`tpcds_demo`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tpctools_spark.queries._util import sql_trunc_digits, trunc_digits
from tpctools_spark.queries.tpcds_demo import _t, _with
from tpctools_spark.registry import query


@query(
    "tpcds_q11_channel_growth",
    oracle=_with("store_sales", "web_sales", "customer", "date_dim")
    + """
    , ss_year AS (
      SELECT ss_customer_sk AS cust, d_year,
             CAST(SUM(CAST((ss_ext_list_price - ss_ext_discount_amt) * 100
                           AS BIGINT)) AS BIGINT) AS total_cents
      FROM store_sales JOIN date_dim ON ss_sold_date_sk = d_date_sk
      WHERE d_year IN (2000, 2001) GROUP BY 1, 2
    ), ws_year AS (
      SELECT ws_bill_customer_sk AS cust, d_year,
             CAST(SUM(CAST((ws_ext_list_price - ws_ext_discount_amt) * 100
                           AS BIGINT)) AS BIGINT) AS total_cents
      FROM web_sales JOIN date_dim ON ws_sold_date_sk = d_date_sk
      WHERE d_year IN (2000, 2001) GROUP BY 1, 2
    )
    SELECT c_customer_id,
           s1.total_cents AS store_y1, s2.total_cents AS store_y2,
           w1.total_cents AS web_y1, w2.total_cents AS web_y2
    FROM customer
    JOIN ss_year s1 ON s1.cust = c_customer_sk AND s1.d_year = 2000
    JOIN ss_year s2 ON s2.cust = c_customer_sk AND s2.d_year = 2001
    JOIN ws_year w1 ON w1.cust = c_customer_sk AND w1.d_year = 2000
    JOIN ws_year w2 ON w2.cust = c_customer_sk AND w2.d_year = 2001
    WHERE s1.total_cents > 0 AND w1.total_cents > 0
      AND w2.total_cents * s1.total_cents > s2.total_cents * w1.total_cents
    """,
)
def tpcds_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q11 shape: customers whose web purchases grew faster
    year-over-year than their store purchases.

    The spec's `year_total` CTE instantiated four times (2 channels ×
    2 years) and joined on the customer key. The growth comparison
    ``web2/web1 > store2/store1`` is cross-multiplied into exact
    integer-cents products (totals ≤ 1e8 cents → products ≤ 1e16,
    comfortably inside int64), so no boundary customer can flip
    between engines. All four aggregate legs shuffle on the SAME key
    (customer), so AQE plans one exchange per leg and co-partitioned
    joins — the 100 TB shape; only the final customer dim join
    broadcasts.
    """
    dd = F.broadcast(
        _t(spark, "date_dim")
        .filter(F.col("d_year").isin(2000, 2001))
        .select("d_date_sk", "d_year")
    )

    def year_total(fact: DataFrame, cust_col: str, date_col: str,
                   list_col: str, disc_col: str) -> DataFrame:
        return (
            fact.join(dd, F.col(date_col) == dd.d_date_sk)
            .groupBy(F.col(cust_col).alias("cust"), "d_year")
            .agg(
                F.sum(
                    ((F.col(list_col) - F.col(disc_col)) * 100).cast("bigint")
                ).alias("total_cents")
            )
        )

    ss = year_total(
        _t(spark, "store_sales"), "ss_customer_sk", "ss_sold_date_sk",
        "ss_ext_list_price", "ss_ext_discount_amt",
    )
    ws = year_total(
        _t(spark, "web_sales"), "ws_bill_customer_sk", "ws_sold_date_sk",
        "ws_ext_list_price", "ws_ext_discount_amt",
    )
    s1 = ss.filter(F.col("d_year") == 2000).select(
        F.col("cust").alias("c1"), F.col("total_cents").alias("store_y1")
    )
    s2 = ss.filter(F.col("d_year") == 2001).select(
        F.col("cust").alias("c2"), F.col("total_cents").alias("store_y2")
    )
    w1 = ws.filter(F.col("d_year") == 2000).select(
        F.col("cust").alias("c3"), F.col("total_cents").alias("web_y1")
    )
    w2 = ws.filter(F.col("d_year") == 2001).select(
        F.col("cust").alias("c4"), F.col("total_cents").alias("web_y2")
    )
    cust = _t(spark, "customer").select("c_customer_sk", "c_customer_id")
    return (
        cust.join(s1, cust.c_customer_sk == s1.c1)
        .join(s2, cust.c_customer_sk == s2.c2)
        .join(w1, cust.c_customer_sk == w1.c3)
        .join(w2, cust.c_customer_sk == w2.c4)
        .filter(
            (F.col("store_y1") > 0)
            & (F.col("web_y1") > 0)
            & (
                F.col("web_y2") * F.col("store_y1")
                > F.col("store_y2") * F.col("web_y1")
            )
        )
        .select("c_customer_id", "store_y1", "store_y2", "web_y1", "web_y2")
    )


@query(
    "tpcds_q31_county_growth",
    oracle=_with("store_sales", "web_sales", "customer_address", "date_dim")
    + """
    , ss_cty AS (
      SELECT ca_county, d_year,
             CAST(SUM(CAST(ss_ext_sales_price * 100 AS BIGINT)) AS BIGINT)
               AS cents
      FROM store_sales
      JOIN customer_address ON ss_addr_sk = ca_address_sk
      JOIN date_dim ON ss_sold_date_sk = d_date_sk
      WHERE d_year IN (2000, 2001) GROUP BY 1, 2
    ), ws_cty AS (
      SELECT ca_county, d_year,
             CAST(SUM(CAST(ws_ext_sales_price * 100 AS BIGINT)) AS BIGINT)
               AS cents
      FROM web_sales
      JOIN customer_address ON ws_bill_addr_sk = ca_address_sk
      JOIN date_dim ON ws_sold_date_sk = d_date_sk
      WHERE d_year IN (2000, 2001) GROUP BY 1, 2
    )
    SELECT s1.ca_county,
           s1.cents AS store_y1, s2.cents AS store_y2,
           w1.cents AS web_y1, w2.cents AS web_y2
    FROM ss_cty s1
    JOIN ss_cty s2 ON s1.ca_county = s2.ca_county
    JOIN ws_cty w1 ON s1.ca_county = w1.ca_county
    JOIN ws_cty w2 ON s1.ca_county = w2.ca_county
    WHERE s1.d_year = 2000 AND s2.d_year = 2001
      AND w1.d_year = 2000 AND w2.d_year = 2001
      AND s1.cents > 0 AND w1.cents > 0
      AND w2.cents * s1.cents > s2.cents * w1.cents
    """,
)
def tpcds_q31(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q31 shape: counties where web sales grew faster than
    store sales year-over-year.

    Q11's four-way CTE self-join lifted from customers to geography
    (two channel aggregates × two periods, joined on county). Spec
    uses consecutive quarters; the generator's uniform fact dates
    leave many county×quarter×web cells empty at sf0.001, so this
    uses whole years — same plan, denser cells (documented
    adaptation). Growth filter is again exact cross-multiplied cents.
    County totals are tiny (thousands of counties), so the self-joins
    broadcast after the first aggregation; the only wide work is the
    two fact rollups.
    """
    dd = F.broadcast(
        _t(spark, "date_dim")
        .filter(F.col("d_year").isin(2000, 2001))
        .select("d_date_sk", "d_year")
    )
    ca = (
        _t(spark, "customer_address").select("ca_address_sk", "ca_county")
    )

    def county_total(fact: DataFrame, addr_col: str, date_col: str,
                     price_col: str) -> DataFrame:
        return (
            fact.join(ca, F.col(addr_col) == ca.ca_address_sk)
            .join(dd, F.col(date_col) == dd.d_date_sk)
            .groupBy("ca_county", "d_year")
            .agg(
                F.sum((F.col(price_col) * 100).cast("bigint")).alias("cents")
            )
        )

    ss = county_total(
        _t(spark, "store_sales"), "ss_addr_sk", "ss_sold_date_sk",
        "ss_ext_sales_price",
    )
    ws = county_total(
        _t(spark, "web_sales"), "ws_bill_addr_sk", "ws_sold_date_sk",
        "ws_ext_sales_price",
    )
    s1 = ss.filter(F.col("d_year") == 2000).select(
        F.col("ca_county").alias("county"), F.col("cents").alias("store_y1")
    )
    s2 = ss.filter(F.col("d_year") == 2001).select(
        F.col("ca_county").alias("k2"), F.col("cents").alias("store_y2")
    )
    w1 = ws.filter(F.col("d_year") == 2000).select(
        F.col("ca_county").alias("k3"), F.col("cents").alias("web_y1")
    )
    w2 = ws.filter(F.col("d_year") == 2001).select(
        F.col("ca_county").alias("k4"), F.col("cents").alias("web_y2")
    )
    return (
        s1.join(s2, s1.county == s2.k2)
        .join(w1, s1.county == w1.k3)
        .join(w2, s1.county == w2.k4)
        .filter(
            (F.col("store_y1") > 0)
            & (F.col("web_y1") > 0)
            & (F.col("web_y2") * F.col("store_y1")
               > F.col("store_y2") * F.col("web_y1"))
        )
        .select(
            F.col("county").alias("ca_county"),
            "store_y1", "store_y2", "web_y1", "web_y2",
        )
    )


@query(
    "tpcds_q35_multichannel_profile",
    oracle=_with(
        "store_sales", "web_sales", "catalog_sales", "customer",
        "customer_address", "customer_demographics", "date_dim",
    )
    + """
    SELECT ca_state, cd_gender, cd_marital_status,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(MIN(cd_dep_count) AS BIGINT) AS min_dep,
           CAST(MAX(cd_dep_count) AS BIGINT) AS max_dep,
           CAST(SUM(CAST(cd_dep_count AS BIGINT)) AS BIGINT) AS sum_dep
    FROM customer c
    JOIN customer_address ON c_current_addr_sk = ca_address_sk
    JOIN customer_demographics ON cd_demo_sk = c_current_cdemo_sk
    WHERE EXISTS (
        SELECT 1 FROM store_sales JOIN date_dim ON ss_sold_date_sk = d_date_sk
        WHERE c.c_customer_sk = ss_customer_sk AND d_year = 2001
      )
      AND (EXISTS (
        SELECT 1 FROM web_sales JOIN date_dim ON ws_sold_date_sk = d_date_sk
        WHERE c.c_customer_sk = ws_bill_customer_sk AND d_year = 2001
      ) OR EXISTS (
        SELECT 1 FROM catalog_sales JOIN date_dim ON cs_sold_date_sk = d_date_sk
        WHERE c.c_customer_sk = cs_ship_customer_sk AND d_year = 2001
      ))
    GROUP BY ca_state, cd_gender, cd_marital_status
    """,
)
def tpcds_q35(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q35 shape: demographic profile of customers active in
    the store channel AND at least one remote channel.

    The EXISTS-over-conjunction-of-disjunction pattern: a plain semi
    join for the store requirement, but the OR of two EXISTS cannot
    be two stacked semi joins (they'd AND) — it becomes a semi join
    against the UNION of the two remote channels' customer keys,
    which is how Catalyst decorrelates the disjunction. Aggregates
    (count/min/max/sum) follow on the surviving customers only.
    """
    dd = F.broadcast(
        _t(spark, "date_dim").filter(F.col("d_year") == 2001).select("d_date_sk")
    )
    ss_c = (
        _t(spark, "store_sales")
        .join(dd, F.col("ss_sold_date_sk") == dd.d_date_sk)
        .select(F.col("ss_customer_sk").alias("k"))
    )
    ws_c = (
        _t(spark, "web_sales")
        .join(dd, F.col("ws_sold_date_sk") == dd.d_date_sk)
        .select(F.col("ws_bill_customer_sk").alias("k"))
    )
    cs_c = (
        _t(spark, "catalog_sales")
        .join(dd, F.col("cs_sold_date_sk") == dd.d_date_sk)
        .select(F.col("cs_ship_customer_sk").alias("k"))
    )
    # A/B NEUTRAL (r10, interleaved min-of-5 at sf1): DISTINCT-reducing
    # the fact key streams before the semi probes measured +0.7% on min
    # and NOT sign-stable — the semi-join hash build already dedups;
    # raw key streams stay the shipped plan.
    remote = ws_c.unionByName(cs_c)
    cust = (
        _t(spark, "customer")
        .join(ss_c, F.col("c_customer_sk") == ss_c.k, "left_semi")
        .join(remote, F.col("c_customer_sk") == remote.k, "left_semi")
    )
    ca = (
        _t(spark, "customer_address").select("ca_address_sk", "ca_state")
    )
    cd = F.broadcast(
        _t(spark, "customer_demographics").select(
            "cd_demo_sk", "cd_gender", "cd_marital_status", "cd_dep_count"
        )
    )
    return (
        cust.join(ca, cust.c_current_addr_sk == ca.ca_address_sk)
        .join(cd, cust.c_current_cdemo_sk == cd.cd_demo_sk)
        .groupBy("ca_state", "cd_gender", "cd_marital_status")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("cd_dep_count").cast("bigint").alias("min_dep"),
            F.max("cd_dep_count").cast("bigint").alias("max_dep"),
            F.sum(F.col("cd_dep_count").cast("bigint")).alias("sum_dep"),
        )
    )


_Q59_DAYS = [
    ("Sunday", "sun"), ("Monday", "mon"), ("Tuesday", "tue"),
    ("Wednesday", "wed"), ("Thursday", "thu"), ("Friday", "fri"),
    ("Saturday", "sat"),
]


@query(
    "tpcds_q59_weekly_ratio",
    oracle=_with("store_sales", "date_dim", "store")
    + ", wss AS (SELECT d_week_seq, ss_store_sk, "
    + ", ".join(
        f"SUM(CASE WHEN d_day_name = '{day}' "
        f"THEN CAST(ss_sales_price AS DECIMAL(12,2)) END) AS {al}_sales"
        for day, al in _Q59_DAYS
    )
    + """
      FROM store_sales JOIN date_dim ON ss_sold_date_sk = d_date_sk
      GROUP BY d_week_seq, ss_store_sk)
    SELECT s_store_id, y1.d_week_seq AS week1,
    """
    + ", ".join(
        sql_trunc_digits(
            f"CAST(y1.{al}_sales AS DOUBLE) / CAST(y2.{al}_sales AS DOUBLE)", 4
        )
        + f" AS {al}_ratio"
        for _, al in _Q59_DAYS
    )
    + """
    FROM wss y1
    JOIN wss y2 ON y1.ss_store_sk = y2.ss_store_sk
               AND y1.d_week_seq = y2.d_week_seq - 52
    JOIN store ON y1.ss_store_sk = s_store_sk
    WHERE y1.d_week_seq BETWEEN 5270 AND 5321
    """,
)
def tpcds_q59(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q59 shape: week-over-week per-store revenue ratios by
    weekday — the weekly pivot CTE self-joined at a 52-week offset.

    One fact rollup builds the (week, store) × weekday matrix; the
    YoY comparison is the same CTE read twice, joined on store and
    shifted week. Ratios are double divisions truncated to 4 digits
    (both engines divide the SAME exact decimal sums cast to double,
    so the IEEE quotient is bit-identical); weeks missing a weekday
    yield NULL ratios on both sides. Week window 5270-5321 is
    calendar 2001 in the generator's d_week_seq numbering (week 1 =
    1900-01-02), compared against the same weeks of 2002.
    """
    dd = F.broadcast(
        _t(spark, "date_dim").select("d_date_sk", "d_week_seq", "d_day_name")
    )
    wss = (
        _t(spark, "store_sales")
        .join(dd, F.col("ss_sold_date_sk") == dd.d_date_sk)
        .groupBy("d_week_seq", "ss_store_sk")
        .agg(
            *[
                F.sum(
                    F.when(
                        F.col("d_day_name") == day,
                        F.col("ss_sales_price").cast("decimal(12,2)"),
                    )
                ).alias(f"{al}_sales")
                for day, al in _Q59_DAYS
            ]
        )
    )
    y1 = wss.filter(F.col("d_week_seq").between(5270, 5321))
    y2 = wss.select(
        F.col("ss_store_sk").alias("sk2"),
        (F.col("d_week_seq") - 52).alias("wk2"),
        *[F.col(f"{al}_sales").alias(f"{al}_2") for _, al in _Q59_DAYS],
    )
    st = F.broadcast(_t(spark, "store").select("s_store_sk", "s_store_id"))
    joined = y1.join(
        y2, (y1.ss_store_sk == y2.sk2) & (y1.d_week_seq == y2.wk2)
    ).join(st, y1.ss_store_sk == st.s_store_sk)
    return joined.select(
        "s_store_id",
        F.col("d_week_seq").alias("week1"),
        *[
            trunc_digits(
                F.col(f"{al}_sales").cast("double")
                / F.col(f"{al}_2").cast("double"),
                4,
            ).alias(f"{al}_ratio")
            for _, al in _Q59_DAYS
        ],
    )
