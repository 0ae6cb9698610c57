"""TPC-DS shapes, eighth tier: Q12/Q20 (revenue share within class),
Q18 (demographic rollup averages), Q28 (fused bracket statistics),
Q30 (above-state-average web returners), Q40 (before/after event
split), Q41 (dim-only distinct probe), Q44 (best/worst rank join),
Q45 (zip-OR-item disjunctive gate), Q46 (city-mismatch baskets).

New shapes: the revenue-share-within-class window applied to date-
windowed channel slices (Q12/Q20), a six-way fused bucket-statistics
scan (Q28 — one pass, no self-joins, the Q9 discipline at column
grain), rank-from-both-ends self-join (Q44), and the
semi-join-OR-broadcast-filter disjunction (Q45). Determinism and
oracle scheme as the whole family (:mod:`tpcds_demo`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tpctools_spark.queries.tpcds_demo import _t, _with
from tpctools_spark.registry import query


def _class_share_sql(fact: str, pfx: str) -> str:
    return _with(fact, "item", "date_dim") + f"""
    , per_item AS (
      SELECT i_item_id, i_item_desc, i_category, i_class,
             CAST(SUM(CAST({pfx}_ext_sales_price * 100 AS BIGINT)) AS BIGINT)
               AS rev_cents
      FROM {fact}
      JOIN item ON {pfx}_item_sk = i_item_sk
      JOIN date_dim ON {pfx}_sold_date_sk = d_date_sk
      WHERE d_year = 2001 AND d_moy IN (1, 2)
      GROUP BY 1, 2, 3, 4
    )
    SELECT i_item_id, i_item_desc, i_category, i_class, rev_cents,
           CAST(FLOOR(CAST(rev_cents AS DOUBLE) * 100
                 / SUM(rev_cents) OVER (PARTITION BY i_class) * 10000)
                AS DOUBLE) / 10000 AS revenueratio
    FROM per_item
    """


def _class_share(spark: SparkSession, fact: str, pfx: str) -> DataFrame:
    dd = F.broadcast(
        _t(spark, "date_dim")
        .filter((F.col("d_year") == 2001) & F.col("d_moy").isin(1, 2))
        .select("d_date_sk")
    )
    it = F.broadcast(
        _t(spark, "item").select(
            "i_item_sk", "i_item_id", "i_item_desc", "i_category", "i_class"
        )
    )
    f_ = _t(spark, fact)
    per_item = (
        f_.join(dd, F.col(f"{pfx}_sold_date_sk") == F.col("d_date_sk"))
        .join(it, F.col(f"{pfx}_item_sk") == it.i_item_sk)
        .groupBy("i_item_id", "i_item_desc", "i_category", "i_class")
        .agg(
            F.sum((F.col(f"{pfx}_ext_sales_price") * 100).cast("bigint")).alias(
                "rev_cents"
            )
        )
    )
    share = (
        F.floor(
            F.col("rev_cents").cast("double")
            * 100
            / F.sum("rev_cents").over(Window.partitionBy("i_class"))
            * 10000
        ).cast("double")
        / 10000
    )
    return per_item.select(
        "i_item_id", "i_item_desc", "i_category", "i_class", "rev_cents",
        share.alias("revenueratio"),
    )


@query("tpcds_q12_web_class_share", oracle=_class_share_sql("web_sales", "ws"))
def tpcds_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q12 shape: each web item's revenue share of its class
    over a two-month window.

    The agg→window ratio pattern (one shuffle for the aggregate, one
    partition-local window): the share divides exact integer cents and
    truncates — both engines divide the identical integers, so the
    4-decimal display value is bit-stable. Spec uses a 30-day window;
    two calendar months keep the generator's uniform dates dense
    (documented adaptation).
    """
    return _class_share(spark, "web_sales", "ws")


@query("tpcds_q20_catalog_class_share", oracle=_class_share_sql("catalog_sales", "cs"))
def tpcds_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q20 shape: Q12's catalog twin (same agg→window revenue
    share plan over catalog_sales)."""
    return _class_share(spark, "catalog_sales", "cs")


@query(
    "tpcds_q18_catalog_demographic_rollup",
    oracle=_with(
        "catalog_sales", "customer_demographics", "customer",
        "customer_address", "date_dim"
    )
    + """
    SELECT ca_state, cd_gender, cd_marital_status,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(cs_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(SUM(CAST(cs_ext_sales_price * 100 AS BIGINT)) AS BIGINT)
             AS sum_price_cents,
           CAST(SUM(CAST(cd_dep_count AS BIGINT)) AS BIGINT) AS sum_deps
    FROM catalog_sales
    JOIN customer_demographics ON cs_bill_cdemo_sk = cd_demo_sk
    JOIN customer ON cs_bill_customer_sk = c_customer_sk
    JOIN customer_address ON c_current_addr_sk = ca_address_sk
    JOIN date_dim ON cs_sold_date_sk = d_date_sk
    WHERE d_year = 2001 AND cd_gender = 'F'
    GROUP BY ROLLUP(ca_state, cd_gender, cd_marital_status)
    """,
)
def tpcds_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q18 shape: catalog averages by customer demographics over
    a ROLLUP of (state, gender, marital status).

    The spec outputs AVGs of quantities/prices/dependents; the exact
    integer pairs (n + each sum) are emitted instead so every rollup
    cell is bit-comparable (the averages are one division away). The
    demographic gate (cd_gender) filters BEFORE the fact join via the
    broadcast dim — at 100 TB the fact rows for the other gender never
    leave the scan.
    """
    cd = F.broadcast(
        _t(spark, "customer_demographics")
        .filter(F.col("cd_gender") == "F")
        .select("cd_demo_sk", "cd_gender", "cd_marital_status", "cd_dep_count")
    )
    cust = (
        _t(spark, "customer").select("c_customer_sk", "c_current_addr_sk")
    )
    ca = _t(spark, "customer_address").select("ca_address_sk", "ca_state")
    dd = F.broadcast(
        _t(spark, "date_dim").filter(F.col("d_year") == 2001).select("d_date_sk")
    )
    cs = _t(spark, "catalog_sales")
    return (
        cs.join(cd, cs.cs_bill_cdemo_sk == cd.cd_demo_sk)
        .join(cust, cs.cs_bill_customer_sk == cust.c_customer_sk)
        .join(ca, cust.c_current_addr_sk == ca.ca_address_sk)
        .join(dd, cs.cs_sold_date_sk == dd.d_date_sk)
        .rollup("ca_state", "cd_gender", "cd_marital_status")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("cs_quantity").cast("bigint")).alias("sum_qty"),
            F.sum((F.col("cs_ext_sales_price") * 100).cast("bigint")).alias(
                "sum_price_cents"
            ),
            F.sum(F.col("cd_dep_count").cast("bigint")).alias("sum_deps"),
        )
    )


@query(
    "tpcds_q28_quantity_bracket_stats",
    oracle=_with("store_sales")
    + """
    SELECT
    """
    + ",\n           ".join(
        f"""CAST(COUNT(CASE WHEN ss_quantity BETWEEN {lo} AND {hi}
                   THEN 1 END) AS BIGINT) AS n_b{i},
           CAST(SUM(CASE WHEN ss_quantity BETWEEN {lo} AND {hi}
                   THEN CAST(ss_list_price * 100 AS BIGINT) END) AS BIGINT)
             AS sum_cents_b{i},
           CAST(COUNT(DISTINCT CASE WHEN ss_quantity BETWEEN {lo} AND {hi}
                   THEN ss_list_price END) AS BIGINT) AS nd_b{i}"""
        for i, (lo, hi) in enumerate(
            [(0, 5), (6, 10), (11, 15), (16, 20), (21, 25), (26, 30)]
        )
    )
    + """
    FROM store_sales
    """,
)
def tpcds_q28(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q28 shape: list-price statistics for six quantity
    brackets fused into ONE scan.

    The spec writes six scalar subqueries (one per bracket); fusing
    them into conditional aggregates scans store_sales once instead of
    six times — the same single-scan discipline as the Q9 fusion. The
    spec's AVG per bracket rides as the exact (count, cents-sum) pair;
    the per-bracket COUNT(DISTINCT) keeps the spec's distinct-price
    probe (Spark plans the 6 distinct aggs with one Expand, not six
    scans).
    """
    ss = _t(spark, "store_sales")
    brackets = [(0, 5), (6, 10), (11, 15), (16, 20), (21, 25), (26, 30)]
    aggs = []
    for i, (lo, hi) in enumerate(brackets):
        inb = F.col("ss_quantity").between(lo, hi)
        aggs += [
            F.count(F.when(inb, 1)).cast("bigint").alias(f"n_b{i}"),
            F.sum(
                F.when(inb, (F.col("ss_list_price") * 100).cast("bigint"))
            ).alias(f"sum_cents_b{i}"),
            F.countDistinct(F.when(inb, F.col("ss_list_price")))
            .cast("bigint")
            .alias(f"nd_b{i}"),
        ]
    return ss.agg(*aggs)


def _returns_above_state_avg_sql(rfact: str, pfx: str, cust_col: str) -> str:
    return _with(rfact, "customer", "customer_address", "date_dim") + f"""
    , per_cust AS (
      SELECT {cust_col} AS cust, ca_state,
             CAST(SUM(CAST({pfx}_return_amt_inc_tax * 100 AS BIGINT)) AS BIGINT)
               AS ret_cents
      FROM {rfact}
      JOIN customer ON {cust_col} = c_customer_sk
      JOIN customer_address ON c_current_addr_sk = ca_address_sk
      JOIN date_dim ON {pfx}_returned_date_sk = d_date_sk
      WHERE d_year = 2001
      GROUP BY 1, 2
    ), with_avg AS (
      SELECT *,
             SUM(ret_cents) OVER (PARTITION BY ca_state) AS state_cents,
             COUNT(*) OVER (PARTITION BY ca_state) AS state_n
      FROM per_cust
    )
    SELECT c_customer_id, ca_state, ret_cents
    FROM with_avg JOIN customer ON cust = c_customer_sk
    WHERE ret_cents * state_n * 10 > state_cents * 12
    """


def _returns_above_state_avg(
    spark: SparkSession, rfact: str, pfx: str, cust_col: str
) -> DataFrame:
    cust = (
        _t(spark, "customer").select(
            "c_customer_sk", "c_customer_id", "c_current_addr_sk"
        )
    )
    ca = _t(spark, "customer_address").select("ca_address_sk", "ca_state")
    dd = F.broadcast(
        _t(spark, "date_dim").filter(F.col("d_year") == 2001).select("d_date_sk")
    )
    r = _t(spark, rfact)
    per_cust = (
        r.join(cust, F.col(cust_col) == cust.c_customer_sk)
        .join(ca, cust.c_current_addr_sk == ca.ca_address_sk)
        .join(dd, F.col(f"{pfx}_returned_date_sk") == dd.d_date_sk)
        .groupBy(F.col(cust_col).alias("cust"), "ca_state")
        .agg(
            F.sum(
                (F.col(f"{pfx}_return_amt_inc_tax") * 100).cast("bigint")
            ).alias("ret_cents")
        )
    )
    w = Window.partitionBy("ca_state")
    gated = per_cust.select(
        "cust", "ca_state", "ret_cents",
        F.sum("ret_cents").over(w).alias("state_cents"),
        F.count(F.lit(1)).over(w).alias("state_n"),
    ).filter(F.col("ret_cents") * F.col("state_n") * 10 > F.col("state_cents") * 12)
    names = _t(spark, "customer").select("c_customer_sk", "c_customer_id")
    return gated.join(names, gated.cust == names.c_customer_sk).select(
        "c_customer_id", "ca_state", "ret_cents"
    )


@query(
    "tpcds_q30_web_returns_above_avg",
    oracle=_returns_above_state_avg_sql(
        "web_returns", "wr", "wr_returning_customer_sk"
    ),
)
def tpcds_q30(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q30 shape: web customers returning more than 1.2× their
    state's average return total.

    Q1's window decorrelation applied to web_returns at state grain:
    one grouped aggregate, the state average as a window over it (no
    re-scan), threshold exact via ret·n·10 > total·12. The returns
    fact shuffles once on (customer, state).
    """
    return _returns_above_state_avg(
        spark, "web_returns", "wr", "wr_returning_customer_sk"
    )


@query(
    "tpcds_q81_catalog_returns_above_avg",
    oracle=_returns_above_state_avg_sql(
        "catalog_returns", "cr", "cr_returning_customer_sk"
    ),
)
def tpcds_q81(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q81 shape: Q30's catalog twin (same window-decorrelated
    1.2×-state-average gate over catalog_returns)."""
    return _returns_above_state_avg(
        spark, "catalog_returns", "cr", "cr_returning_customer_sk"
    )


@query(
    "tpcds_q40_warehouse_before_after",
    oracle=_with("catalog_sales", "catalog_returns", "warehouse", "item", "date_dim")
    + """
    SELECT w_state, i_item_id,
           CAST(SUM(CASE WHEN d_date < DATE '2001-06-01'
                THEN CAST((cs_sales_price - COALESCE(cr_refunded_cash, 0)) * 100
                          AS BIGINT) ELSE 0 END) AS BIGINT) AS before_cents,
           CAST(SUM(CASE WHEN d_date >= DATE '2001-06-01'
                THEN CAST((cs_sales_price - COALESCE(cr_refunded_cash, 0)) * 100
                          AS BIGINT) ELSE 0 END) AS BIGINT) AS after_cents
    FROM catalog_sales
    LEFT JOIN catalog_returns ON cs_order_number = cr_order_number
                             AND cs_item_sk = cr_item_sk
    JOIN warehouse ON cs_warehouse_sk = w_warehouse_sk
    JOIN item ON cs_item_sk = i_item_sk
    JOIN date_dim ON cs_sold_date_sk = d_date_sk
    WHERE d_year = 2001
    GROUP BY 1, 2
    """,
)
def tpcds_q40(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q40 shape: net catalog sales by warehouse state × item,
    split before/after an event date.

    Returns net out through the composite-key LEFT join (order, item);
    the before/after split is two conditional sums over one joined
    stream — no date self-join. The only wide work is the fact-fact
    left join; dims broadcast.
    """
    dd = F.broadcast(
        _t(spark, "date_dim")
        .filter(F.col("d_year") == 2001)
        .select("d_date_sk", "d_date")
    )
    w = F.broadcast(_t(spark, "warehouse").select("w_warehouse_sk", "w_state"))
    it = F.broadcast(_t(spark, "item").select("i_item_sk", "i_item_id"))
    cs = _t(spark, "catalog_sales").select(
        "cs_order_number", "cs_item_sk", "cs_warehouse_sk",
        "cs_sold_date_sk", "cs_sales_price",
    )
    cr = _t(spark, "catalog_returns").select(
        "cr_order_number", "cr_item_sk", "cr_refunded_cash"
    )
    net = (
        (F.col("cs_sales_price") - F.coalesce(F.col("cr_refunded_cash"), F.lit(0)))
        * 100
    ).cast("bigint")
    cut = F.col("d_date") < F.lit("2001-06-01").cast("date")
    return (
        cs.join(
            cr,
            (cs.cs_order_number == cr.cr_order_number)
            & (cs.cs_item_sk == cr.cr_item_sk),
            "left",
        )
        .join(w, cs.cs_warehouse_sk == w.w_warehouse_sk)
        .join(it, cs.cs_item_sk == it.i_item_sk)
        .join(dd, cs.cs_sold_date_sk == dd.d_date_sk)
        .groupBy("w_state", "i_item_id")
        .agg(
            F.sum(F.when(cut, net).otherwise(F.lit(0))).alias("before_cents"),
            F.sum(F.when(~cut, net).otherwise(F.lit(0))).alias("after_cents"),
        )
    )


@query(
    "tpcds_q41_manufact_distinct_items",
    oracle=_with("item")
    + """
    SELECT DISTINCT i_product_name
    FROM item i1
    WHERE i_manufact_id BETWEEN 300 AND 1000
      AND (SELECT COUNT(*) FROM item i2
           WHERE i2.i_manufact = i1.i_manufact
             AND ((i2.i_category = 'Electronics'
                   AND i2.i_color IN ('final', 'never'))
               OR (i2.i_category = 'Sports'
                   AND i2.i_size IN ('pending', 'ideas')))
          ) > 0
    """,
)
def tpcds_q41(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q41 shape: product names whose manufacturer also makes
    items matching a disjunctive attribute profile.

    A dim-only correlated COUNT(*)>0 — decorrelated to a left-semi
    join on the manufacturer key against the attribute-filtered item
    set. Pure broadcast work end-to-end; included because the spec's
    correlated-subquery-on-the-same-dim pattern exercises Catalyst
    decorrelation with zero fact involvement. Color/size values come from the generator's
    word pool (it has no spec color/size domains — documented), category
    from the spec domain; the attribute profile stays live either way.
    """
    it = _t(spark, "item")
    matching = it.filter(
        ((F.col("i_category") == "Electronics") & F.col("i_color").isin("final", "never"))
        | ((F.col("i_category") == "Sports") & F.col("i_size").isin("pending", "ideas"))
    ).select(F.col("i_manufact").alias("m"))
    return (
        it.filter(F.col("i_manufact_id").between(300, 1000))
        .join(F.broadcast(matching), it.i_manufact == F.col("m"), "left_semi")
        .select("i_product_name")
        .distinct()
    )


@query(
    "tpcds_q44_best_worst_items",
    oracle=_with("store_sales", "item")
    + """
    , perf AS (
      SELECT ss_item_sk,
             CAST(SUM(CAST(ss_net_profit * 100 AS BIGINT)) AS BIGINT) AS cents,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM store_sales GROUP BY 1
    ), ranked AS (
      SELECT ss_item_sk,
             RANK() OVER (ORDER BY cents * 1000000 + ss_item_sk ASC) AS worst,
             RANK() OVER (ORDER BY cents * 1000000 + ss_item_sk DESC) AS best
      FROM perf
    )
    SELECT r.worst AS rnk, i1.i_product_name AS best_performing,
           i2.i_product_name AS worst_performing
    FROM ranked r
    JOIN ranked r2 ON r.worst = r2.best
    JOIN item i1 ON r2.ss_item_sk = i1.i_item_sk
    JOIN item i2 ON r.ss_item_sk = i2.i_item_sk
    WHERE r.worst <= 10
    """,
)
def tpcds_q44(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q44 shape: best and worst performing items paired by
    rank position.

    Two global rankings of the same per-item profit aggregate — one
    ascending, one descending — self-joined on rank position, then
    resolved to product names. The ordering key folds the item key
    into the cents total (cents·1e6 + sk) so both rankings are total
    orders: rank ties are impossible (rank ≡ row_number) and the
    pairing is deterministic on both engines. Only positions ≤ 10
    survive the join, so each ranking is a distributed
    ``orderBy().limit(10)`` (TakeOrderedAndProject) with the rank
    window running over its 10-row result — the item-grain aggregate
    never funnels through one partition.
    """
    ss = _t(spark, "store_sales")
    perf = ss.groupBy("ss_item_sk").agg(
        F.sum((F.col("ss_net_profit") * 100).cast("bigint")).alias("cents"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    key = F.col("cents") * 1000000 + F.col("ss_item_sk")
    r = (
        perf.orderBy(key.asc())
        .limit(10)
        .select(
            F.col("ss_item_sk").alias("worst_sk"),
            F.rank().over(Window.orderBy(key.asc())).alias("worst"),
        )
    )
    r2 = (
        perf.orderBy(key.desc())
        .limit(10)
        .select(
            F.col("ss_item_sk").alias("best_sk"),
            F.rank().over(Window.orderBy(key.desc())).alias("best"),
        )
    )
    it1 = F.broadcast(
        _t(spark, "item").select(
            F.col("i_item_sk").alias("sk1"), F.col("i_product_name").alias("best_performing")
        )
    )
    it2 = F.broadcast(
        _t(spark, "item").select(
            F.col("i_item_sk").alias("sk2"),
            F.col("i_product_name").alias("worst_performing"),
        )
    )
    return (
        r.join(r2, r.worst == r2.best)
        .filter(F.col("worst") <= 10)
        .join(it1, F.col("best_sk") == F.col("sk1"))
        .join(it2, F.col("worst_sk") == F.col("sk2"))
        .select(F.col("worst").alias("rnk"), "best_performing", "worst_performing")
    )


@query(
    "tpcds_q45_zip_or_item_gate",
    oracle=_with("web_sales", "customer", "customer_address", "item", "date_dim")
    + """
    SELECT ca_zip, ca_city,
           CAST(SUM(CAST(ws_sales_price * 100 AS BIGINT)) AS BIGINT) AS rev_cents
    FROM web_sales
    JOIN customer ON ws_bill_customer_sk = c_customer_sk
    JOIN customer_address ON c_current_addr_sk = ca_address_sk
    JOIN item ON ws_item_sk = i_item_sk
    JOIN date_dim ON ws_sold_date_sk = d_date_sk
    WHERE d_year = 2001
      AND (substring(ca_zip, 1, 2) IN ('10', '22', '33', '44', '55')
        OR i_item_sk IN (SELECT i_item_sk FROM item WHERE i_item_sk <= 5))
    GROUP BY 1, 2
    """,
)
def tpcds_q45(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q45 shape: web revenue by customer geography, gated by a
    zip-prefix list OR membership in a small item set.

    The disjunction spans two DIFFERENT dimensions (address attribute
    vs item set), so neither side can gate the scan alone — the filter
    evaluates after both broadcast joins, with the item set inlined as
    a literal IN (the spec's subquery is a fixed tiny list). Geography
    rollup follows on the gated stream.
    """
    cust = (
        _t(spark, "customer").select("c_customer_sk", "c_current_addr_sk")
    )
    ca = (
        _t(spark, "customer_address").select("ca_address_sk", "ca_zip", "ca_city")
    )
    it = F.broadcast(_t(spark, "item").select("i_item_sk"))
    dd = F.broadcast(
        _t(spark, "date_dim").filter(F.col("d_year") == 2001).select("d_date_sk")
    )
    ws = _t(spark, "web_sales")
    return (
        ws.join(cust, ws.ws_bill_customer_sk == cust.c_customer_sk)
        .join(ca, cust.c_current_addr_sk == ca.ca_address_sk)
        .join(it, ws.ws_item_sk == it.i_item_sk)
        .join(dd, ws.ws_sold_date_sk == dd.d_date_sk)
        .filter(
            F.substring("ca_zip", 1, 2).isin("10", "22", "33", "44", "55")
            | (F.col("i_item_sk") <= 5)
        )
        .groupBy("ca_zip", "ca_city")
        .agg(
            F.sum((F.col("ws_sales_price") * 100).cast("bigint")).alias("rev_cents")
        )
    )


@query(
    "tpcds_q46_city_mismatch_baskets",
    oracle=_with(
        "store_sales", "store", "household_demographics",
        "customer_address", "customer", "date_dim"
    )
    + """
    , baskets AS (
      SELECT ss_ticket_number, ss_customer_sk, ca_city AS bought_city,
             CAST(SUM(CAST(ss_coupon_amt * 100 AS BIGINT)) AS BIGINT) AS amt_cents,
             CAST(SUM(CAST(ss_net_profit * 100 AS BIGINT)) AS BIGINT)
               AS profit_cents
      FROM store_sales
      JOIN store ON ss_store_sk = s_store_sk
      JOIN household_demographics ON ss_hdemo_sk = hd_demo_sk
      JOIN customer_address ON ss_addr_sk = ca_address_sk
      JOIN date_dim ON ss_sold_date_sk = d_date_sk
      WHERE d_year = 2001 AND (hd_dep_count = 4 OR hd_vehicle_count = 3)
      GROUP BY 1, 2, 3
    )
    SELECT c_customer_id, bought_city, ss_ticket_number,
           amt_cents, profit_cents
    FROM baskets
    JOIN customer ON ss_customer_sk = c_customer_sk
    JOIN customer_address ca2 ON c_current_addr_sk = ca2.ca_address_sk
    WHERE ca2.ca_city IS DISTINCT FROM bought_city
    """,
)
def tpcds_q46(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q46 shape: tickets bought in a city different from the
    customer's home city, under a household-demographic gate.

    The dual-role address dim (purchase address at the basket grain,
    home address after the customer join) with a null-safe mismatch —
    the Q68 pattern with Q46's own demographic disjunction. Aggregate
    first (ticket grain), join names after: the wide stream carries
    cents, not addresses.
    """
    st = F.broadcast(_t(spark, "store").select("s_store_sk"))
    hd = F.broadcast(
        _t(spark, "household_demographics")
        .filter((F.col("hd_dep_count") == 4) | (F.col("hd_vehicle_count") == 3))
        .select("hd_demo_sk")
    )
    ca = _t(spark, "customer_address").select("ca_address_sk", "ca_city")
    dd = F.broadcast(
        _t(spark, "date_dim").filter(F.col("d_year") == 2001).select("d_date_sk")
    )
    ss = _t(spark, "store_sales")
    baskets = (
        ss.join(st, ss.ss_store_sk == st.s_store_sk)
        .join(hd, ss.ss_hdemo_sk == hd.hd_demo_sk)
        .join(ca, ss.ss_addr_sk == ca.ca_address_sk)
        .join(dd, ss.ss_sold_date_sk == dd.d_date_sk)
        .groupBy(
            "ss_ticket_number", "ss_customer_sk",
            F.col("ca_city").alias("bought_city"),
        )
        .agg(
            F.sum((F.col("ss_coupon_amt") * 100).cast("bigint")).alias("amt_cents"),
            F.sum((F.col("ss_net_profit") * 100).cast("bigint")).alias(
                "profit_cents"
            ),
        )
    )
    cust = (
        _t(spark, "customer").select(
            "c_customer_sk", "c_customer_id", "c_current_addr_sk"
        )
    )
    home = (
        _t(spark, "customer_address").select(
            F.col("ca_address_sk").alias("home_sk"), F.col("ca_city").alias("home_city")
        )
    )
    return (
        baskets.join(cust, baskets.ss_customer_sk == cust.c_customer_sk)
        .join(home, cust.c_current_addr_sk == F.col("home_sk"))
        .filter(~F.col("home_city").eqNullSafe(F.col("bought_city")))
        .select(
            "c_customer_id", "bought_city", "ss_ticket_number",
            "amt_cents", "profit_cents",
        )
    )
