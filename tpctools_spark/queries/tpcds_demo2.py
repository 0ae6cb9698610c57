"""TPC-DS shapes, third tier: Q6/Q9/Q13/Q21/Q27/Q43/Q55/Q62/Q94/Q99.

Same oracle scheme as :mod:`tpcds_demo` (generated tables materialized
once; DuckDB runs spec-form SQL over the identical parquet). Predicates
are calibrated to the generator's sf0.001 domains (documented per query
— e.g. ``i_manager_id % k`` slices instead of literal manager ids,
mirroring the committed Q3 pattern) and every fractional output goes
through the exact-integer or truncated-double discipline of
:mod:`tpctools_spark.queries._util`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tpctools_spark.queries._util import sql_trunc_digits, trunc_digits
from tpctools_spark.queries.tpcds_demo import _avg4, _t, _with
from tpctools_spark.registry import query


@query(
    "tpcds_q6_pricey_state_items",
    oracle=_with("store_sales", "customer", "customer_address", "date_dim", "item")
    + """
    , cat AS (
      SELECT i_category,
             CAST(SUM(CAST(i_current_price * 100 AS BIGINT)) AS BIGINT) AS sum_cents,
             CAST(COUNT(i_current_price) AS BIGINT) AS n_priced
      FROM item GROUP BY i_category
    )
    SELECT ca_state AS state, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM store_sales
    JOIN customer ON ss_customer_sk = c_customer_sk
    JOIN customer_address ON c_current_addr_sk = ca_address_sk
    JOIN date_dim ON ss_sold_date_sk = d_date_sk
    JOIN item ON ss_item_sk = i_item_sk
    JOIN cat ON item.i_category = cat.i_category
    WHERE d_year = 2000 AND d_qoy = 1
      AND CAST(i_current_price * 100 AS BIGINT) * 10 * n_priced > 12 * sum_cents
    GROUP BY ca_state
    HAVING COUNT(*) >= 2
    """,
)
def tpcds_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q6 shape: states whose customers buy items priced ≥1.2×
    their category average.

    The spec's correlated AVG subquery is decorrelated into a category
    aggregate joined back to item — Catalyst's plan for the correlated
    form, written explicitly. The 1.2× cut is exact integer-cents
    cross-multiplication (price·10·n > 12·Σcents), so no engine can
    disagree on boundary items. Adaptations for generator domains:
    quarter instead of month window, HAVING ≥2 instead of ≥10 (the
    sf0.001 corpus has ~50 qualifying sales spread over 20 states).
    Scale: item/cat are broadcast; the only wide shuffle is the final
    state aggregation.
    """
    it = _t(spark, "item")
    cat = it.groupBy("i_category").agg(
        F.sum((F.col("i_current_price") * 100).cast("bigint")).alias("sum_cents"),
        F.count("i_current_price").alias("n_priced"),
    )
    pricey = (
        it.join(F.broadcast(cat), "i_category")
        .filter(
            (F.col("i_current_price") * 100).cast("bigint") * 10 * F.col("n_priced")
            > 12 * F.col("sum_cents")
        )
        .select("i_item_sk")
    )
    ss = _t(spark, "store_sales")
    dd = F.broadcast(
        _t(spark, "date_dim")
        .filter((F.col("d_year") == 2000) & (F.col("d_qoy") == 1))
        .select("d_date_sk")
    )
    cust = _t(spark, "customer").select("c_customer_sk", "c_current_addr_sk")
    addr = _t(spark, "customer_address").select("ca_address_sk", "ca_state")
    return (
        ss.join(dd, ss.ss_sold_date_sk == dd.d_date_sk)
        .join(F.broadcast(pricey), ss.ss_item_sk == pricey.i_item_sk)
        .join(cust, ss.ss_customer_sk == cust.c_customer_sk)
        .join(addr, cust.c_current_addr_sk == addr.ca_address_sk)
        .groupBy(F.col("ca_state").alias("state"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 2)
    )


_Q9_BRACKETS = [(1, 200), (201, 400), (401, 600), (601, 800), (801, 1000)]
_Q9_THRESHOLD = 576  # expected bracket size (2880/5) — mixed outcomes


@query(
    "tpcds_q9_quantity_brackets",
    oracle=_with("store_sales", "reason")
    + ", agg AS (SELECT "
    + ", ".join(
        f"CAST(SUM(CASE WHEN ss_quantity BETWEEN {lo} AND {hi} THEN 1 ELSE 0 END) AS BIGINT) AS cnt{i}, "
        + sql_trunc_digits(
            f"CAST(SUM(CASE WHEN ss_quantity BETWEEN {lo} AND {hi} "
            f"THEN CAST(ss_ext_discount_amt AS DECIMAL(12,2)) END) AS DOUBLE)"
            f" / COUNT(CASE WHEN ss_quantity BETWEEN {lo} AND {hi} "
            f"THEN ss_ext_discount_amt END)",
            4,
        )
        + f" AS disc{i}, "
        + sql_trunc_digits(
            f"CAST(SUM(CASE WHEN ss_quantity BETWEEN {lo} AND {hi} "
            f"THEN CAST(ss_net_paid AS DECIMAL(12,2)) END) AS DOUBLE)"
            f" / COUNT(CASE WHEN ss_quantity BETWEEN {lo} AND {hi} "
            f"THEN ss_net_paid END)",
            4,
        )
        + f" AS paid{i}"
        for i, (lo, hi) in enumerate(_Q9_BRACKETS)
    )
    + " FROM store_sales) SELECT r_reason_sk, "
    + ", ".join(
        f"CASE WHEN cnt{i} > {_Q9_THRESHOLD} THEN disc{i} ELSE paid{i} END AS bucket{i + 1}"
        for i in range(len(_Q9_BRACKETS))
    )
    + " FROM reason CROSS JOIN agg WHERE r_reason_sk = 1",
)
def tpcds_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q9 shape: per-bracket conditional statistics selected by a
    count threshold.

    The spec writes 15 scalar subqueries (3 per quantity bracket); this
    is the plan you actually want at 100 TB — ONE fact scan computing
    every bracket's count and both candidate averages as conditional
    aggregates, then a CASE picking per bracket. 15 scans become 1;
    the reason row (spec's FROM clause quirk) joins the 1-row aggregate
    by broadcast cross join. Bracket bounds span the generator's
    uniform 1..1000 quantity domain; the threshold sits at the expected
    bracket size so branches resolve both ways.
    """
    ss = _t(spark, "store_sales")
    aggs = []
    for i, (lo, hi) in enumerate(_Q9_BRACKETS):
        inb = F.col("ss_quantity").between(lo, hi)
        aggs.append(
            F.sum(F.when(inb, 1).otherwise(0)).cast("bigint").alias(f"cnt{i}")
        )
        aggs.append(
            _avg4(
                F.sum(F.when(inb, F.col("ss_ext_discount_amt").cast("decimal(12,2)"))),
                F.count(F.when(inb, F.col("ss_ext_discount_amt"))),
            ).alias(f"disc{i}")
        )
        aggs.append(
            _avg4(
                F.sum(F.when(inb, F.col("ss_net_paid").cast("decimal(12,2)"))),
                F.count(F.when(inb, F.col("ss_net_paid"))),
            ).alias(f"paid{i}")
        )
    agg = ss.agg(*aggs)
    reason = F.broadcast(
        _t(spark, "reason").filter(F.col("r_reason_sk") == 1).select("r_reason_sk")
    )
    out = [F.col("r_reason_sk")]
    for i in range(len(_Q9_BRACKETS)):
        out.append(
            F.when(F.col(f"cnt{i}") > _Q9_THRESHOLD, F.col(f"disc{i}"))
            .otherwise(F.col(f"paid{i}"))
            .alias(f"bucket{i + 1}")
        )
    return reason.crossJoin(agg).select(*out)


_Q13_STATES_1 = "'AL','CA','FL','GA','IL','IN','KS'"
_Q13_STATES_2 = "'KY','MI','MN','MO','NC','NE','NY'"
_Q13_STATES_3 = "'OH','OK','PA','TN','TX','VA'"


@query(
    "tpcds_q13_bracket_averages",
    oracle=_with(
        "store_sales", "store", "customer_demographics",
        "household_demographics", "customer_address",
    )
    + f"""
    SELECT
      {sql_trunc_digits("CAST(SUM(CAST(ss_quantity AS BIGINT)) AS DOUBLE) / COUNT(ss_quantity)", 4)} AS avg_qty,
      {sql_trunc_digits("CAST(SUM(CAST(ss_ext_sales_price AS DECIMAL(12,2))) AS DOUBLE) / COUNT(ss_ext_sales_price)", 4)} AS avg_sales,
      {sql_trunc_digits("CAST(SUM(CAST(ss_ext_wholesale_cost AS DECIMAL(12,2))) AS DOUBLE) / COUNT(ss_ext_wholesale_cost)", 4)} AS avg_cost,
      ROUND(CAST(SUM(CAST(ss_ext_wholesale_cost AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_cost
    FROM store_sales
    JOIN store ON ss_store_sk = s_store_sk
    JOIN customer_demographics ON ss_cdemo_sk = cd_demo_sk
    JOIN household_demographics ON ss_hdemo_sk = hd_demo_sk
    JOIN customer_address ON ss_addr_sk = ca_address_sk
    WHERE (
        (cd_marital_status = 'M' AND cd_education_status = 'Advanced Degree'
         AND ss_sales_price BETWEEN 0 AND 5000 AND hd_dep_count IN (0,1,2))
     OR (cd_marital_status = 'S' AND cd_education_status = 'College'
         AND ss_sales_price BETWEEN 2000 AND 7000 AND hd_dep_count IN (3,4,5))
     OR (cd_marital_status = 'W' AND cd_education_status = '2 yr Degree'
         AND ss_sales_price BETWEEN 4000 AND 9999.99 AND hd_dep_count IN (6,7,8,9))
    ) AND (
        (ca_country = 'United States' AND ca_state IN ({_Q13_STATES_1})
         AND ss_net_profit BETWEEN 0 AND 3000)
     OR (ca_country = 'United States' AND ca_state IN ({_Q13_STATES_2})
         AND ss_net_profit BETWEEN 3000 AND 6000)
     OR (ca_country = 'United States' AND ca_state IN ({_Q13_STATES_3})
         AND ss_net_profit BETWEEN 6000 AND 9999.99)
    )
    """,
)
def tpcds_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q13 shape: corpus-wide averages under OR-of-AND bracket
    predicates spanning three dimensions.

    The disjunction couples fact columns (sales price, net profit) to
    dimension attributes (marital/education, state), so no single
    bracket can push down alone — the residual evaluates after the
    broadcast joins, which is exactly the spec's point. All three
    dimension tables broadcast (demographics is spec-fixed 1.92M rows
    → its 3-column projection broadcasts; at larger clusters it stays
    under the 8GB broadcast ceiling). Price brackets are widened to the
    generator's uniform 0..10000 domain (spec uses 50-200 bands tuned
    to dsdgen's skew). Averages are exact-sum/count truncated; the sum
    is decimal-exact.
    """
    ss = _t(spark, "store_sales")
    st = F.broadcast(_t(spark, "store").select("s_store_sk"))
    cd = F.broadcast(
        _t(spark, "customer_demographics").select(
            "cd_demo_sk", "cd_marital_status", "cd_education_status"
        )
    )
    hd = F.broadcast(
        _t(spark, "household_demographics").select("hd_demo_sk", "hd_dep_count")
    )
    ca = (
        _t(spark, "customer_address").select("ca_address_sk", "ca_state", "ca_country")
    )
    price = F.col("ss_sales_price")
    profit = F.col("ss_net_profit")
    demo_ok = (
        (
            (F.col("cd_marital_status") == "M")
            & (F.col("cd_education_status") == "Advanced Degree")
            & price.between(0, 5000)
            & F.col("hd_dep_count").isin(0, 1, 2)
        )
        | (
            (F.col("cd_marital_status") == "S")
            & (F.col("cd_education_status") == "College")
            & price.between(2000, 7000)
            & F.col("hd_dep_count").isin(3, 4, 5)
        )
        | (
            (F.col("cd_marital_status") == "W")
            & (F.col("cd_education_status") == "2 yr Degree")
            & price.between(4000, 9999.99)
            & F.col("hd_dep_count").isin(6, 7, 8, 9)
        )
    )
    us = F.col("ca_country") == "United States"
    addr_ok = (
        (us & F.col("ca_state").isin("AL", "CA", "FL", "GA", "IL", "IN", "KS")
         & profit.between(0, 3000))
        | (us & F.col("ca_state").isin("KY", "MI", "MN", "MO", "NC", "NE", "NY")
           & profit.between(3000, 6000))
        | (us & F.col("ca_state").isin("OH", "OK", "PA", "TN", "TX", "VA")
           & profit.between(6000, 9999.99))
    )
    dec = lambda c: F.col(c).cast("decimal(12,2)")  # noqa: E731
    return (
        ss.join(st, ss.ss_store_sk == st.s_store_sk)
        .join(cd, ss.ss_cdemo_sk == cd.cd_demo_sk)
        .join(hd, ss.ss_hdemo_sk == hd.hd_demo_sk)
        .join(ca, ss.ss_addr_sk == ca.ca_address_sk)
        .filter(demo_ok & addr_ok)
        .agg(
            _avg4(
                F.sum(F.col("ss_quantity").cast("bigint")), F.count("ss_quantity")
            ).alias("avg_qty"),
            _avg4(
                F.sum(dec("ss_ext_sales_price")), F.count("ss_ext_sales_price")
            ).alias("avg_sales"),
            _avg4(
                F.sum(dec("ss_ext_wholesale_cost")), F.count("ss_ext_wholesale_cost")
            ).alias("avg_cost"),
            F.round(F.sum(dec("ss_ext_wholesale_cost")).cast("double"), 2).alias(
                "sum_cost"
            ),
        )
    )


@query(
    "tpcds_q21_inventory_shift",
    oracle=_with("inventory", "warehouse", "item", "date_dim")
    + """
    SELECT * FROM (
      SELECT w_warehouse_name, i_item_id,
             CAST(SUM(CASE WHEN d_date < DATE '2000-03-11'
                           THEN inv_quantity_on_hand ELSE 0 END) AS BIGINT)
               AS inv_before,
             CAST(SUM(CASE WHEN d_date >= DATE '2000-03-11'
                           THEN inv_quantity_on_hand ELSE 0 END) AS BIGINT)
               AS inv_after
      FROM inventory
      JOIN warehouse ON inv_warehouse_sk = w_warehouse_sk
      JOIN item ON inv_item_sk = i_item_sk
      JOIN date_dim ON inv_date_sk = d_date_sk
      WHERE d_date BETWEEN DATE '2000-02-10' AND DATE '2000-04-10'
      GROUP BY w_warehouse_name, i_item_id
    )
    WHERE inv_before > 0
      AND 3 * inv_after >= 2 * inv_before
      AND 2 * inv_after <= 3 * inv_before
    """,
)
def tpcds_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q21 shape: items whose warehouse stock stayed within
    ±50% across a reference date.

    Both sides of the split come from ONE fact scan as conditional
    sums (the spec's single-pass form); the 2/3 ≤ ratio ≤ 3/2 filter
    is exact-integer cross-multiplication — no FP division, so the
    boundary groups agree across engines. The date window prunes at
    the broadcast date_dim join.
    """
    inv = _t(spark, "inventory")
    w = F.broadcast(_t(spark, "warehouse").select("w_warehouse_sk", "w_warehouse_name"))
    it = F.broadcast(_t(spark, "item").select("i_item_sk", "i_item_id"))
    dd = F.broadcast(
        _t(spark, "date_dim")
        .filter(F.col("d_date").between("2000-02-10", "2000-04-10"))
        .select("d_date_sk", "d_date")
    )
    split = F.col("d_date") < F.lit("2000-03-11").cast("date")
    grouped = (
        inv.join(dd, inv.inv_date_sk == dd.d_date_sk)
        .join(w, inv.inv_warehouse_sk == w.w_warehouse_sk)
        .join(it, inv.inv_item_sk == it.i_item_sk)
        .groupBy("w_warehouse_name", "i_item_id")
        .agg(
            F.sum(F.when(split, F.col("inv_quantity_on_hand")).otherwise(0))
            .cast("bigint")
            .alias("inv_before"),
            F.sum(F.when(~split, F.col("inv_quantity_on_hand")).otherwise(0))
            .cast("bigint")
            .alias("inv_after"),
        )
    )
    return grouped.filter(
        (F.col("inv_before") > 0)
        & (3 * F.col("inv_after") >= 2 * F.col("inv_before"))
        & (2 * F.col("inv_after") <= 3 * F.col("inv_before"))
    )


@query(
    "tpcds_q27_demographic_rollup",
    oracle=_with(
        "store_sales", "customer_demographics", "date_dim", "store", "item"
    )
    + f"""
    SELECT i_item_id, s_state, CAST(GROUPING(s_state) AS BIGINT) AS g_state,
      {sql_trunc_digits("CAST(SUM(CAST(ss_quantity AS BIGINT)) AS DOUBLE) / COUNT(ss_quantity)", 4)} AS agg1,
      {sql_trunc_digits("CAST(SUM(CAST(ss_list_price AS DECIMAL(12,2))) AS DOUBLE) / COUNT(ss_list_price)", 4)} AS agg2,
      {sql_trunc_digits("CAST(SUM(CAST(ss_coupon_amt AS DECIMAL(12,2))) AS DOUBLE) / COUNT(ss_coupon_amt)", 4)} AS agg3,
      {sql_trunc_digits("CAST(SUM(CAST(ss_sales_price AS DECIMAL(12,2))) AS DOUBLE) / COUNT(ss_sales_price)", 4)} AS agg4
    FROM store_sales
    JOIN customer_demographics ON ss_cdemo_sk = cd_demo_sk
    JOIN date_dim ON ss_sold_date_sk = d_date_sk
    JOIN store ON ss_store_sk = s_store_sk
    JOIN item ON ss_item_sk = i_item_sk
    WHERE cd_gender = 'M' AND cd_marital_status = 'S'
      AND cd_education_status = 'College' AND d_year = 2002
    GROUP BY ROLLUP(i_item_id, s_state)
    """,
)
def tpcds_q27(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q27 shape: demographic-sliced item averages with a
    state-level ROLLUP (item → item×state → grand total lattice).

    Q7's star with the grouping lattice on top; GROUPING(s_state)
    disambiguates "all states" from a NULL state value, projected so
    the oracle compares lattice levels explicitly. Only the fact-side
    aggregation shuffles; the rollup re-aggregates the already-grouped
    partials.
    """
    ss = _t(spark, "store_sales")
    cd = F.broadcast(
        _t(spark, "customer_demographics")
        .filter(
            (F.col("cd_gender") == "M")
            & (F.col("cd_marital_status") == "S")
            & (F.col("cd_education_status") == "College")
        )
        .select("cd_demo_sk")
    )
    dd = F.broadcast(
        _t(spark, "date_dim").filter(F.col("d_year") == 2002).select("d_date_sk")
    )
    st = F.broadcast(_t(spark, "store").select("s_store_sk", "s_state"))
    it = F.broadcast(_t(spark, "item").select("i_item_sk", "i_item_id"))
    dec = lambda c: F.col(c).cast("decimal(12,2)")  # noqa: E731
    return (
        ss.join(cd, ss.ss_cdemo_sk == cd.cd_demo_sk)
        .join(dd, ss.ss_sold_date_sk == dd.d_date_sk)
        .join(st, ss.ss_store_sk == st.s_store_sk)
        .join(it, ss.ss_item_sk == it.i_item_sk)
        .rollup("i_item_id", "s_state")
        .agg(
            F.grouping("s_state").cast("bigint").alias("g_state"),
            _avg4(F.sum(F.col("ss_quantity").cast("bigint")), F.count("ss_quantity")).alias("agg1"),
            _avg4(F.sum(dec("ss_list_price")), F.count("ss_list_price")).alias("agg2"),
            _avg4(F.sum(dec("ss_coupon_amt")), F.count("ss_coupon_amt")).alias("agg3"),
            _avg4(F.sum(dec("ss_sales_price")), F.count("ss_sales_price")).alias("agg4"),
        )
        .select("i_item_id", "s_state", "g_state", "agg1", "agg2", "agg3", "agg4")
    )


_WEEKDAYS = [
    ("Sunday", "sun_sales"), ("Monday", "mon_sales"), ("Tuesday", "tue_sales"),
    ("Wednesday", "wed_sales"), ("Thursday", "thu_sales"),
    ("Friday", "fri_sales"), ("Saturday", "sat_sales"),
]


@query(
    "tpcds_q43_store_weekday",
    oracle=_with("store_sales", "date_dim", "store")
    + """
    SELECT s_store_name, s_store_id,
    """
    + ", ".join(
        f"ROUND(CAST(SUM(CASE WHEN d_day_name = '{day}' "
        f"THEN CAST(ss_sales_price AS DECIMAL(12,2)) END) AS DOUBLE), 2) AS {alias}"
        for day, alias in _WEEKDAYS
    )
    + """
    FROM date_dim
    JOIN store_sales ON d_date_sk = ss_sold_date_sk
    JOIN store ON ss_store_sk = s_store_sk
    WHERE d_year = 2001
    GROUP BY s_store_name, s_store_id
    """,
)
def tpcds_q43(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q43 shape: per-store revenue pivoted across weekdays.

    The manual-pivot idiom (sum-of-CASE per day) the spec mandates —
    one fact scan, seven conditional decimal sums, no pivot pre-scan.
    d_day_name comes from the generator's real calendar so every
    weekday column is populated.
    """
    ss = _t(spark, "store_sales")
    dd = F.broadcast(
        _t(spark, "date_dim")
        .filter(F.col("d_year") == 2001)
        .select("d_date_sk", "d_day_name")
    )
    st = F.broadcast(_t(spark, "store").select("s_store_sk", "s_store_name", "s_store_id"))
    aggs = [
        F.round(
            F.sum(
                F.when(
                    F.col("d_day_name") == day,
                    F.col("ss_sales_price").cast("decimal(12,2)"),
                )
            ).cast("double"),
            2,
        ).alias(alias)
        for day, alias in _WEEKDAYS
    ]
    return (
        ss.join(dd, ss.ss_sold_date_sk == dd.d_date_sk)
        .join(st, ss.ss_store_sk == st.s_store_sk)
        .groupBy("s_store_name", "s_store_id")
        .agg(*aggs)
    )


@query(
    "tpcds_q55_brand_manager",
    oracle=_with("store_sales", "date_dim", "item")
    + """
    SELECT i_brand_id, i_brand,
           ROUND(CAST(SUM(CAST(ss_ext_sales_price AS DECIMAL(12,2))) AS DOUBLE), 2)
             AS ext_price
    FROM date_dim
    JOIN store_sales ON d_date_sk = ss_sold_date_sk
    JOIN item ON ss_item_sk = i_item_sk
    WHERE i_manager_id % 25 = 3 AND d_moy = 11 AND d_year = 2000
    GROUP BY i_brand_id, i_brand
    ORDER BY ext_price DESC, i_brand_id
    LIMIT 100
    """,
)
def tpcds_q55(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q55 shape: one manager slice's brand revenue for one
    month — the minimal star probe of the Q3/Q52/Q55 family.

    ``i_manager_id % 25`` replaces the spec's literal manager id (the
    generator's manager ids are uniform 1..1000, so a literal picks ~0
    of 18 items at sf0.001 — same adaptation as the committed Q3).
    """
    ss = _t(spark, "store_sales")
    dd = F.broadcast(
        _t(spark, "date_dim")
        .filter((F.col("d_moy") == 11) & (F.col("d_year") == 2000))
        .select("d_date_sk")
    )
    it = F.broadcast(
        _t(spark, "item")
        .filter(F.col("i_manager_id") % 25 == 3)
        .select("i_item_sk", "i_brand_id", "i_brand")
    )
    return (
        ss.join(dd, ss.ss_sold_date_sk == dd.d_date_sk)
        .join(it, ss.ss_item_sk == it.i_item_sk)
        .groupBy("i_brand_id", "i_brand")
        .agg(
            F.round(
                F.sum(F.col("ss_ext_sales_price").cast("decimal(12,2)")).cast("double"),
                2,
            ).alias("ext_price")
        )
        .orderBy(F.col("ext_price").desc(), "i_brand_id")
        .limit(100)
    )


_LAG_BUCKETS = [
    ("d30", "lag <= 30"),
    ("d60", "lag > 30 AND lag <= 60"),
    ("d90", "lag > 60 AND lag <= 90"),
    ("d120", "lag > 90 AND lag <= 120"),
    ("dmore", "lag > 120"),
]


def _lag_sql(fact: str, sold: str, ship: str) -> str:
    """Shared Q62/Q99 oracle body: shipping-lag bucket counts."""
    return (
        ", ".join(
            f"CAST(SUM(CASE WHEN {cond.replace('lag', f'({ship} - {sold})')} "
            f"THEN 1 ELSE 0 END) AS BIGINT) AS {alias}"
            for alias, cond in _LAG_BUCKETS
        )
    )


def _lag_aggs(sold: str, ship: str) -> list[F.Column]:
    lag = F.col(ship) - F.col(sold)
    conds = [
        lag <= 30,
        (lag > 30) & (lag <= 60),
        (lag > 60) & (lag <= 90),
        (lag > 90) & (lag <= 120),
        lag > 120,
    ]
    return [
        F.sum(F.when(c, 1).otherwise(0)).cast("bigint").alias(alias)
        for (alias, _), c in zip(_LAG_BUCKETS, conds)
    ]


@query(
    "tpcds_q62_web_ship_lag",
    oracle=_with("web_sales", "warehouse", "ship_mode", "web_site", "date_dim")
    + f"""
    SELECT substring(w_warehouse_name, 1, 20) AS wname, sm_type, web_name,
           {_lag_sql("web_sales", "ws_sold_date_sk", "ws_ship_date_sk")}
    FROM web_sales
    JOIN warehouse ON ws_warehouse_sk = w_warehouse_sk
    JOIN ship_mode ON ws_ship_mode_sk = sm_ship_mode_sk
    JOIN web_site ON ws_web_site_sk = web_site_sk
    JOIN date_dim ON ws_ship_date_sk = d_date_sk
    WHERE d_month_seq BETWEEN 1200 AND 1211
    GROUP BY wname, sm_type, web_name
    """,
)
def tpcds_q62(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q62 shape: web shipping-lag buckets per
    warehouse × ship-mode × site for one year of ship dates.

    The days-to-ship histogram as five conditional sums over one fact
    scan — the lag is pure surrogate-key arithmetic (date_sk deltas are
    days), so no date parsing touches the fact. All four dims
    broadcast; d_month_seq 1200-1211 is calendar year 2000.
    """
    ws = _t(spark, "web_sales")
    w = F.broadcast(_t(spark, "warehouse").select("w_warehouse_sk", "w_warehouse_name"))
    sm = F.broadcast(_t(spark, "ship_mode").select("sm_ship_mode_sk", "sm_type"))
    site = F.broadcast(_t(spark, "web_site").select("web_site_sk", "web_name"))
    dd = F.broadcast(
        _t(spark, "date_dim")
        .filter(F.col("d_month_seq").between(1200, 1211))
        .select("d_date_sk")
    )
    return (
        ws.join(dd, ws.ws_ship_date_sk == dd.d_date_sk)
        .join(w, ws.ws_warehouse_sk == w.w_warehouse_sk)
        .join(sm, ws.ws_ship_mode_sk == sm.sm_ship_mode_sk)
        .join(site, ws.ws_web_site_sk == site.web_site_sk)
        .groupBy(
            F.substring("w_warehouse_name", 1, 20).alias("wname"),
            "sm_type",
            "web_name",
        )
        .agg(*_lag_aggs("ws_sold_date_sk", "ws_ship_date_sk"))
    )


@query(
    "tpcds_q99_catalog_ship_lag",
    oracle=_with("catalog_sales", "warehouse", "ship_mode", "call_center", "date_dim")
    + f"""
    SELECT substring(w_warehouse_name, 1, 20) AS wname, sm_type, cc_name,
           {_lag_sql("catalog_sales", "cs_sold_date_sk", "cs_ship_date_sk")}
    FROM catalog_sales
    JOIN warehouse ON cs_warehouse_sk = w_warehouse_sk
    JOIN ship_mode ON cs_ship_mode_sk = sm_ship_mode_sk
    JOIN call_center ON cs_call_center_sk = cc_call_center_sk
    JOIN date_dim ON cs_ship_date_sk = d_date_sk
    WHERE d_month_seq BETWEEN 1200 AND 1211
    GROUP BY wname, sm_type, cc_name
    """,
)
def tpcds_q99(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q99 shape: Q62's shipping-lag histogram on the catalog
    channel (call centers instead of web sites) — the cross-channel
    twin proving the bucket scaffold generalizes."""
    cs = _t(spark, "catalog_sales")
    w = F.broadcast(_t(spark, "warehouse").select("w_warehouse_sk", "w_warehouse_name"))
    sm = F.broadcast(_t(spark, "ship_mode").select("sm_ship_mode_sk", "sm_type"))
    cc = F.broadcast(_t(spark, "call_center").select("cc_call_center_sk", "cc_name"))
    dd = F.broadcast(
        _t(spark, "date_dim")
        .filter(F.col("d_month_seq").between(1200, 1211))
        .select("d_date_sk")
    )
    return (
        cs.join(dd, cs.cs_ship_date_sk == dd.d_date_sk)
        .join(w, cs.cs_warehouse_sk == w.w_warehouse_sk)
        .join(sm, cs.cs_ship_mode_sk == sm.sm_ship_mode_sk)
        .join(cc, cs.cs_call_center_sk == cc.cc_call_center_sk)
        .groupBy(
            F.substring("w_warehouse_name", 1, 20).alias("wname"),
            "sm_type",
            "cc_name",
        )
        .agg(*_lag_aggs("cs_sold_date_sk", "cs_ship_date_sk"))
    )


@query(
    "tpcds_q94_multi_mode_orders",
    oracle=_with("web_sales", "web_returns", "customer_address", "date_dim")
    + """
    SELECT CAST(COUNT(DISTINCT ws_order_number) AS BIGINT) AS order_count,
           ROUND(CAST(SUM(CAST(ws_ext_ship_cost AS DECIMAL(12,2))) AS DOUBLE), 2)
             AS total_shipping_cost,
           ROUND(CAST(SUM(CAST(ws_net_profit AS DECIMAL(12,2))) AS DOUBLE), 2)
             AS total_net_profit
    FROM web_sales ws1
    JOIN date_dim ON ws1.ws_ship_date_sk = d_date_sk
    JOIN customer_address ON ws1.ws_ship_addr_sk = ca_address_sk
    WHERE d_date BETWEEN DATE '2000-02-01' AND DATE '2000-07-31'
      AND ca_state IN ('AL','CA','FL','GA','IL','IN','KS','KY','MI','MN')
      AND EXISTS (SELECT 1 FROM web_sales ws2
                  WHERE ws1.ws_order_number = ws2.ws_order_number
                    AND ws1.ws_ship_mode_sk <> ws2.ws_ship_mode_sk)
      AND NOT EXISTS (SELECT 1 FROM web_returns wr
                      WHERE ws1.ws_order_number = wr.wr_order_number)
    """,
)
def tpcds_q94(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q94 shape: orders shipped in multiple ways and never
    returned — the EXISTS/NOT-EXISTS pair at order grain.

    The spec tests "shipped from more than one warehouse"; at sf0.001
    the generator has ONE warehouse, so the multi-source test uses
    ship modes (20, spec-fixed) — identical plan: a self semi-join on
    order number with an inequality residual, plus an anti join against
    returns. Both subqueries reduce to order-number-keyed joins, so at
    100 TB they shuffle on the same key as the main aggregation (AQE
    coalesces the exchanges); date_dim broadcasts, and the sf-scaling
    address table stays unhinted so AQE sizes the join at runtime.
    """
    ws = _t(spark, "web_sales")
    dd = F.broadcast(
        _t(spark, "date_dim")
        .filter(F.col("d_date").between("2000-02-01", "2000-07-31"))
        .select("d_date_sk")
    )
    ca = (
        _t(spark, "customer_address")
        .filter(
            F.col("ca_state").isin(
                "AL", "CA", "FL", "GA", "IL", "IN", "KS", "KY", "MI", "MN"
            )
        )
        .select("ca_address_sk")
    )
    ws2 = ws.select(
        F.col("ws_order_number").alias("o2"), F.col("ws_ship_mode_sk").alias("m2")
    )
    wr = _t(spark, "web_returns").select(F.col("wr_order_number").alias("ro"))
    return (
        ws.join(dd, ws.ws_ship_date_sk == dd.d_date_sk)
        .join(ca, ws.ws_ship_addr_sk == ca.ca_address_sk)
        .join(
            ws2,
            (F.col("ws_order_number") == F.col("o2"))
            & (F.col("ws_ship_mode_sk") != F.col("m2")),
            "left_semi",
        )
        .join(wr, F.col("ws_order_number") == wr.ro, "left_anti")
        .agg(
            F.countDistinct("ws_order_number").cast("bigint").alias("order_count"),
            F.round(
                F.sum(F.col("ws_ext_ship_cost").cast("decimal(12,2)")).cast("double"),
                2,
            ).alias("total_shipping_cost"),
            F.round(
                F.sum(F.col("ws_net_profit").cast("decimal(12,2)")).cast("double"), 2
            ).alias("total_net_profit"),
        )
    )
