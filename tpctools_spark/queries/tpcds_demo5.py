"""TPC-DS shapes, sixth tier: Q4/Q38/Q87 (three-channel customer-set
algebra), Q22/Q67/Q70 (rollup hierarchies with and without top-k
windows), Q34/Q73 (count-bucket HAVING on ticket baskets).

New operator shapes over the earlier tiers: the year_total CTE at
THREE channels (Q4), INTERSECT/EXCEPT of multi-channel DISTINCT
customer sets (Q38/Q87), top-k ranking windows layered over ROLLUP
grouping sets (Q67/Q70 — one Expand, one window exchange), and
HAVING on a count bucket (Q34/Q73). Determinism discipline as the
whole family: money stays in integer cents until display, ratio
filters are cross-multiplied, ranking keys are exact integers.
Oracle scheme as :mod:`tpcds_demo` (same materialized generator
parquet on both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tpctools_spark.queries.tpcds_demo import _t, _with
from tpctools_spark.registry import query

# d_month_seq for calendar-2001 under the generator's month_seq formula
# ((year-1900)*12 + month-1): 1212..1223.
_MSEQ_LO, _MSEQ_HI = 1212, 1223


@query(
    "tpcds_q4_triple_channel_growth",
    oracle=_with(
        "store_sales", "catalog_sales", "web_sales", "customer", "date_dim"
    )
    + f"""
    , ss_year AS (
      SELECT ss_customer_sk AS cust,
             CASE WHEN d_year <= 2000 THEN 1 ELSE 2 END AS period,
             CAST(SUM(CAST((ss_ext_list_price - ss_ext_wholesale_cost
                            - ss_ext_discount_amt + ss_ext_sales_price) * 100
                           AS BIGINT)) AS BIGINT) AS cents
      FROM store_sales JOIN date_dim ON ss_sold_date_sk = d_date_sk
      GROUP BY 1, 2
    ), cs_year AS (
      SELECT cs_bill_customer_sk AS cust,
             CASE WHEN d_year <= 2000 THEN 1 ELSE 2 END AS period,
             CAST(SUM(CAST((cs_ext_list_price - cs_ext_wholesale_cost
                            - cs_ext_discount_amt + cs_ext_sales_price) * 100
                           AS BIGINT)) AS BIGINT) AS cents
      FROM catalog_sales JOIN date_dim ON cs_sold_date_sk = d_date_sk
      GROUP BY 1, 2
    ), ws_year AS (
      SELECT ws_bill_customer_sk AS cust,
             CASE WHEN d_year <= 2000 THEN 1 ELSE 2 END AS period,
             CAST(SUM(CAST((ws_ext_list_price - ws_ext_wholesale_cost
                            - ws_ext_discount_amt + ws_ext_sales_price) * 100
                           AS BIGINT)) AS BIGINT) AS cents
      FROM web_sales JOIN date_dim ON ws_sold_date_sk = d_date_sk
      GROUP BY 1, 2
    )
    SELECT c_customer_id,
           s1.cents AS store_y1, s2.cents AS store_y2,
           c1.cents AS cat_y1,   c2.cents AS cat_y2,
           w1.cents AS web_y1,   w2.cents AS web_y2
    FROM customer
    JOIN ss_year s1 ON s1.cust = c_customer_sk AND s1.period = 1
    JOIN ss_year s2 ON s2.cust = c_customer_sk AND s2.period = 2
    JOIN cs_year c1 ON c1.cust = c_customer_sk AND c1.period = 1
    JOIN cs_year c2 ON c2.cust = c_customer_sk AND c2.period = 2
    JOIN ws_year w1 ON w1.cust = c_customer_sk AND w1.period = 1
    JOIN ws_year w2 ON w2.cust = c_customer_sk AND w2.period = 2
    WHERE s1.cents > 0 AND c1.cents > 0 AND w1.cents > 0
      AND c2.cents * s1.cents > s2.cents * c1.cents
      AND c2.cents * w1.cents > w2.cents * c1.cents
    """,
)
def tpcds_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q4 shape: customers whose CATALOG purchases grew faster
    year-over-year than both their store and their web purchases.

    Q11's year_total machinery at all three channels, collapsed to
    ONE pivoted aggregation per channel (conditional period sums —
    3 fact scans, not the spec CTE's 6 leg instantiations), with the
    spec's full preference formula (list − wholesale − discount +
    sales). The spec halves that sum; the ÷2 is a common positive
    factor of every term in both growth comparisons, so it cancels
    under cross-multiplication and the totals are reported as exact
    integer cents of the un-halved sum. Two documented adaptations for
    the generator's data: comparison windows are the 3-year periods
    1998-2000 vs 2001-2003 (single years leave the web leg too sparse
    at the materialized scale), and the formula's ~zero-mean uniforms
    make the >0 gates live rather than vacuous. All three channel
    aggregates shuffle on the same customer key — AQE co-partitions
    the joins; the sf-scaling customer dim is unhinted (AQE decides),
    date_dim broadcasts.
    """
    dd = F.broadcast(
        _t(spark, "date_dim").select(
            "d_date_sk",
            F.when(F.col("d_year") <= 2000, 1).otherwise(2).alias("period"),
        )
    )

    # Both periods PIVOT inside one aggregation per channel
    # (conditional sums): 3 fact scans + 3 customer-keyed exchanges
    # instead of the 6-leg instantiate-and-self-join form; the
    # both-periods-present inner-join semantics survive as the NOT-NULL
    # pair filter (a SUM over zero matching rows is NULL).
    def period_pivot(
        fact: DataFrame, cust: str, date: str, pfx: str, out: str
    ) -> DataFrame:
        amount = (
            (
                F.col(f"{pfx}_ext_list_price")
                - F.col(f"{pfx}_ext_wholesale_cost")
                - F.col(f"{pfx}_ext_discount_amt")
                + F.col(f"{pfx}_ext_sales_price")
            )
            * 100
        ).cast("bigint")
        return (
            fact.join(dd, F.col(date) == dd.d_date_sk)
            .groupBy(F.col(cust).alias(f"k_{out}"))
            .agg(
                F.sum(F.when(F.col("period") == 1, amount)).alias(f"{out}_y1"),
                F.sum(F.when(F.col("period") == 2, amount)).alias(f"{out}_y2"),
            )
            .filter(
                F.col(f"{out}_y1").isNotNull() & F.col(f"{out}_y2").isNotNull()
            )
        )

    ss = period_pivot(
        _t(spark, "store_sales"), "ss_customer_sk", "ss_sold_date_sk", "ss", "store"
    )
    cs = period_pivot(
        _t(spark, "catalog_sales"), "cs_bill_customer_sk", "cs_sold_date_sk", "cs", "cat"
    )
    ws = period_pivot(
        _t(spark, "web_sales"), "ws_bill_customer_sk", "ws_sold_date_sk", "ws", "web"
    )
    cust = _t(spark, "customer").select("c_customer_sk", "c_customer_id")
    j = (
        cust.join(ss, cust.c_customer_sk == F.col("k_store"))
        .join(cs, cust.c_customer_sk == F.col("k_cat"))
        .join(ws, cust.c_customer_sk == F.col("k_web"))
    )
    return j.filter(
        (F.col("store_y1") > 0)
        & (F.col("cat_y1") > 0)
        & (F.col("web_y1") > 0)
        & (F.col("cat_y2") * F.col("store_y1") > F.col("store_y2") * F.col("cat_y1"))
        & (F.col("cat_y2") * F.col("web_y1") > F.col("web_y2") * F.col("cat_y1"))
    ).select(
        "c_customer_id",
        "store_y1", "store_y2", "cat_y1", "cat_y2", "web_y1", "web_y2",
    )


def _channel_customers_sql(fact: str, cust: str, date: str) -> str:
    return f"""
      SELECT DISTINCT c_last_name, c_first_name, d_date
      FROM {fact}
      JOIN date_dim ON {date} = d_date_sk
      JOIN customer ON {cust} = c_customer_sk
      WHERE d_month_seq BETWEEN {_MSEQ_LO} AND {_MSEQ_HI}
    """


def _channel_customers(
    spark: SparkSession, fact: str, cust: str, date: str
) -> DataFrame:
    """One channel's (last, first, date) identity rows in the window —
    UNDISTINCTED: the flag aggregate in _channel_membership dedups all
    three channels in its single exchange."""
    dd = F.broadcast(
        _t(spark, "date_dim")
        .filter(F.col("d_month_seq").between(_MSEQ_LO, _MSEQ_HI))
        .select("d_date_sk", "d_date")
    )
    c = (
        _t(spark, "customer").select("c_customer_sk", "c_last_name", "c_first_name")
    )
    f_ = _t(spark, fact)
    return (
        f_.join(dd, F.col(date) == dd.d_date_sk)
        .join(c, F.col(cust) == c.c_customer_sk)
        .select("c_last_name", "c_first_name", "d_date")
    )


def _channel_membership(spark: SparkSession) -> DataFrame:
    """(c_last_name, c_first_name, d_date, in_ss, in_cs, in_ws) — every
    identity seen in the window, with per-channel presence flags, from
    ONE aggregation over the unioned (undistincted) channel legs.

    The set-algebra forms (INTERSECT / EXCEPT chains) pay one exchange
    per channel DISTINCT plus one per semi/anti step; this computes
    all three distincts AND the membership test in a single hash
    aggregate — map-side partial combine dedups each channel before
    the one shuffle, so exchanged volume matches a single distinct."""
    legs = [
        _channel_customers(
            spark, "store_sales", "ss_customer_sk", "ss_sold_date_sk"
        ).withColumn("ch", F.lit(0)),
        _channel_customers(
            spark, "catalog_sales", "cs_bill_customer_sk", "cs_sold_date_sk"
        ).withColumn("ch", F.lit(1)),
        _channel_customers(
            spark, "web_sales", "ws_bill_customer_sk", "ws_sold_date_sk"
        ).withColumn("ch", F.lit(2)),
    ]
    u = legs[0].unionByName(legs[1]).unionByName(legs[2])
    return u.groupBy("c_last_name", "c_first_name", "d_date").agg(
        F.max((F.col("ch") == 0).cast("int")).alias("in_ss"),
        F.max((F.col("ch") == 1).cast("int")).alias("in_cs"),
        F.max((F.col("ch") == 2).cast("int")).alias("in_ws"),
    )


@query(
    "tpcds_q38_triple_channel_intersect",
    oracle=_with(
        "store_sales", "catalog_sales", "web_sales", "customer", "date_dim"
    )
    + f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_hot_customers FROM (
      {_channel_customers_sql("store_sales", "ss_customer_sk", "ss_sold_date_sk")}
      INTERSECT
      {_channel_customers_sql("catalog_sales", "cs_bill_customer_sk", "cs_sold_date_sk")}
      INTERSECT
      {_channel_customers_sql("web_sales", "ws_bill_customer_sk", "ws_sold_date_sk")}
    ) hot
    """,
)
def tpcds_q38(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q38 shape: count of (name, date) identities that bought
    through ALL THREE channels in the same 12-month window.

    Set INTERSECT computed as a flag aggregation: the three channel
    legs union (undistincted) into ONE hash aggregate that derives
    per-channel presence flags, and the intersect is a flag filter.
    The literal `ss.intersect(cs).intersect(ws)` form pays an exchange
    per channel DISTINCT plus one per semi join (5 total); this is a
    single exchange whose map-side partials do all the dedup — r9 A/B
    (interleaved, sf1): flag form +9.2% on min, never slower across
    reps. At 100 TB the exchange-count difference dominates.
    """
    m = _channel_membership(spark)
    return m.filter(
        (F.col("in_ss") == 1) & (F.col("in_cs") == 1) & (F.col("in_ws") == 1)
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_hot_customers"))


@query(
    "tpcds_q87_triple_channel_except",
    oracle=_with(
        "store_sales", "catalog_sales", "web_sales", "customer", "date_dim"
    )
    + f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_store_only FROM (
      {_channel_customers_sql("store_sales", "ss_customer_sk", "ss_sold_date_sk")}
      EXCEPT
      {_channel_customers_sql("catalog_sales", "cs_bill_customer_sk", "cs_sold_date_sk")}
      EXCEPT
      {_channel_customers_sql("web_sales", "ws_bill_customer_sk", "ws_sold_date_sk")}
    ) cool
    """,
)
def tpcds_q87(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q87 shape: count of (name, date) identities that bought
    in-store but NOT by catalog and NOT on the web in the window.

    Q38's EXCEPT dual, same flag-aggregation plan (one exchange; the
    exceptAll-chain alternative measured equal at min, slightly slower
    at median, over 9 interleaved sf1 reps in r9 — and the r7 note
    stands: anti-join rewrites of this EXCEPT chain measured 15%
    slower, so the flag aggregate is the keeper).
    """
    m = _channel_membership(spark)
    return m.filter(
        (F.col("in_ss") == 1) & (F.col("in_cs") == 0) & (F.col("in_ws") == 0)
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_store_only"))


@query(
    "tpcds_q22_inventory_hierarchy_rollup",
    oracle=_with("inventory", "date_dim", "item")
    + f"""
    SELECT i_product_name, i_brand, i_class, i_category,
           CAST(COUNT(inv_quantity_on_hand) AS BIGINT) AS n,
           CAST(SUM(CAST(inv_quantity_on_hand AS BIGINT)) AS BIGINT) AS sum_qoh
    FROM inventory
    JOIN date_dim ON inv_date_sk = d_date_sk
    JOIN item ON inv_item_sk = i_item_sk
    WHERE d_month_seq BETWEEN {_MSEQ_LO} AND {_MSEQ_HI}
    GROUP BY ROLLUP(i_product_name, i_brand, i_class, i_category)
    """,
)
def tpcds_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q22 shape: average inventory on hand over the full item
    hierarchy (product → brand → class → category) via ROLLUP.

    The spec orders by AVG(qoh); engine-native AVG typing differs, so
    the result carries the exact integer pair (count, sum) per rollup
    cell instead — avg is one division away for the consumer, and the
    cell set is bit-stable across engines. One Expand over the joined
    fact feeds a single hash aggregate: rollup costs one exchange, not
    four scans.
    """
    dd = F.broadcast(
        _t(spark, "date_dim")
        .filter(F.col("d_month_seq").between(_MSEQ_LO, _MSEQ_HI))
        .select("d_date_sk")
    )
    it = F.broadcast(
        _t(spark, "item").select(
            "i_item_sk", "i_product_name", "i_brand", "i_class", "i_category"
        )
    )
    inv = _t(spark, "inventory")
    return (
        inv.join(dd, inv.inv_date_sk == dd.d_date_sk)
        .join(it, inv.inv_item_sk == it.i_item_sk)
        .rollup("i_product_name", "i_brand", "i_class", "i_category")
        .agg(
            F.count("inv_quantity_on_hand").cast("bigint").alias("n"),
            F.sum(F.col("inv_quantity_on_hand").cast("bigint")).alias("sum_qoh"),
        )
    )


@query(
    "tpcds_q67_topk_over_rollup",
    oracle=_with("store_sales", "date_dim", "store", "item")
    + f"""
    , cells AS (
      SELECT i_category, i_class, i_brand, i_product_name,
             d_year, d_qoy, d_moy, s_store_id,
             CAST(SUM(CAST(ss_sales_price * ss_quantity * 100 AS BIGINT))
                  AS BIGINT) AS sumsales_cents
      FROM store_sales
      JOIN date_dim ON ss_sold_date_sk = d_date_sk
      JOIN store ON ss_store_sk = s_store_sk
      JOIN item ON ss_item_sk = i_item_sk
      WHERE d_month_seq BETWEEN {_MSEQ_LO} AND {_MSEQ_HI}
      GROUP BY ROLLUP(i_category, i_class, i_brand, i_product_name,
                      d_year, d_qoy, d_moy, s_store_id)
    )
    SELECT * FROM (
      SELECT cells.*,
             RANK() OVER (PARTITION BY i_category
                          ORDER BY sumsales_cents DESC) AS rk
      FROM cells
    ) ranked
    WHERE rk <= 5
    """,
)
def tpcds_q67(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q67 shape: top-k sales cells per category over the full
    8-level ROLLUP of (item hierarchy × calendar × store).

    Composes ROLLUP with a ranking window: one Expand feeds one hash
    aggregate, then a single window exchange partitioned by category
    ranks every rollup cell (including the NULL-category grand-total
    partition, as in spec). Ranking key is exact integer cents of
    price×quantity, so rank boundaries cannot flip between engines;
    RANK (not ROW_NUMBER) keeps ties engine-stable. Top-k = 5 instead
    of the spec's 100 — at the materialized scale every cell ranks
    inside 100, which would make the filter dead (documented
    adaptation; same plan shape). At 100 TB this is the
    WindowGroupLimit pattern: per-partition top-k pushes below the
    final exchange.
    """
    dd = F.broadcast(
        _t(spark, "date_dim")
        .filter(F.col("d_month_seq").between(_MSEQ_LO, _MSEQ_HI))
        .select("d_date_sk", "d_year", "d_qoy", "d_moy")
    )
    st = F.broadcast(_t(spark, "store").select("s_store_sk", "s_store_id"))
    it = F.broadcast(
        _t(spark, "item").select(
            "i_item_sk", "i_category", "i_class", "i_brand", "i_product_name"
        )
    )
    ss = _t(spark, "store_sales")
    cells = (
        ss.join(dd, ss.ss_sold_date_sk == dd.d_date_sk)
        .join(st, ss.ss_store_sk == st.s_store_sk)
        .join(it, ss.ss_item_sk == it.i_item_sk)
        .rollup(
            "i_category", "i_class", "i_brand", "i_product_name",
            "d_year", "d_qoy", "d_moy", "s_store_id",
        )
        .agg(
            F.sum(
                (F.col("ss_sales_price") * F.col("ss_quantity") * 100).cast("bigint")
            ).alias("sumsales_cents")
        )
    )
    w = Window.partitionBy("i_category").orderBy(F.col("sumsales_cents").desc())
    return cells.withColumn("rk", F.rank().over(w)).filter(F.col("rk") <= 5)


@query(
    "tpcds_q70_state_county_rollup_rank",
    oracle=_with("store_sales", "date_dim", "store")
    + f"""
    , top_states AS (
      SELECT s_state FROM (
        SELECT s_state,
               RANK() OVER (ORDER BY
                 SUM(CAST(ss_net_profit * 100 AS BIGINT)) DESC, s_state) AS r
        FROM store_sales
        JOIN store ON ss_store_sk = s_store_sk
        JOIN date_dim ON ss_sold_date_sk = d_date_sk
        WHERE d_month_seq BETWEEN {_MSEQ_LO} AND {_MSEQ_HI}
        GROUP BY s_state
      ) t WHERE r <= 5
    ), rolled AS (
      SELECT s_state, s_county,
             CAST(SUM(CAST(ss_net_profit * 100 AS BIGINT)) AS BIGINT)
               AS profit_cents,
             GROUPING(s_state) + GROUPING(s_county) AS lochierarchy,
             GROUPING(s_county) AS g_county
      FROM store_sales
      JOIN store ON ss_store_sk = s_store_sk
      JOIN date_dim ON ss_sold_date_sk = d_date_sk
      WHERE d_month_seq BETWEEN {_MSEQ_LO} AND {_MSEQ_HI}
        AND s_state IN (SELECT s_state FROM top_states)
      GROUP BY ROLLUP(s_state, s_county)
    )
    SELECT s_state, s_county, profit_cents, lochierarchy,
           RANK() OVER (
             PARTITION BY lochierarchy,
                          CASE WHEN g_county = 1 THEN s_state END
             ORDER BY profit_cents DESC) AS rank_within_parent
    FROM rolled
    """,
)
def tpcds_q70(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q70 shape: store profit over ROLLUP(state, county),
    restricted to the top-5 profit states, ranked within each
    hierarchy level.

    Three composed shapes: a ranked subquery gating the fact scan
    (top-5 states — a broadcast semi join after a tiny agg), the
    ROLLUP with the spec's GROUPING()-arithmetic lochierarchy column,
    and the spec's rank-within-parent window whose PARTITION BY mixes
    the grouping level with a CASE over a grouping flag. Profit stays
    in integer cents through ranking; the state tiebreak on the
    top-states rank makes the gate set unique.
    """
    dd = F.broadcast(
        _t(spark, "date_dim")
        .filter(F.col("d_month_seq").between(_MSEQ_LO, _MSEQ_HI))
        .select("d_date_sk")
    )
    st = F.broadcast(_t(spark, "store").select("s_store_sk", "s_state", "s_county"))
    ss = _t(spark, "store_sales")
    joined = (
        ss.join(dd, ss.ss_sold_date_sk == dd.d_date_sk)
        .join(st, ss.ss_store_sk == st.s_store_sk)
        .select(
            "s_state", "s_county",
            (F.col("ss_net_profit") * 100).cast("bigint").alias("cents"),
        )
    )
    top_states = (
        joined.groupBy("s_state")
        .agg(F.sum("cents").alias("c"))
        .withColumn(
            "r",
            F.rank().over(Window.orderBy(F.col("c").desc(), F.col("s_state"))),
        )
        .filter(F.col("r") <= 5)
        .select("s_state")
    )
    gated = joined.join(F.broadcast(top_states), "s_state", "left_semi")
    rolled = (
        gated.rollup("s_state", "s_county")
        .agg(
            F.sum("cents").cast("bigint").alias("profit_cents"),
            (F.grouping("s_state") + F.grouping("s_county")).alias("lochierarchy"),
            F.grouping("s_county").alias("g_county"),
        )
    )
    w = Window.partitionBy(
        "lochierarchy",
        F.when(F.col("g_county") == 1, F.col("s_state")),
    ).orderBy(F.col("profit_cents").desc())
    return rolled.withColumn("rank_within_parent", F.rank().over(w)).select(
        "s_state", "s_county", "profit_cents", "lochierarchy", "rank_within_parent"
    )


def _basket_sql(bp_values: str, extra_hd: str, dom_pred: str,
                lo: int, hi: int) -> str:
    return _with("store_sales", "date_dim", "household_demographics", "customer") + f"""
    , baskets AS (
      SELECT ss_ticket_number, ss_customer_sk,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM store_sales
      JOIN date_dim ON ss_sold_date_sk = d_date_sk
      JOIN household_demographics ON ss_hdemo_sk = hd_demo_sk
      WHERE hd_buy_potential IN ({bp_values})
        AND hd_vehicle_count > 0
        {extra_hd}
        AND {dom_pred}
        AND d_year IN (2000, 2001)
      GROUP BY ss_ticket_number, ss_customer_sk
    )
    SELECT c_last_name, c_first_name, ss_ticket_number, cnt
    FROM baskets JOIN customer ON ss_customer_sk = c_customer_sk
    WHERE cnt BETWEEN {lo} AND {hi}
    """


def _basket(spark: SparkSession, bp: list[str], ratio: bool,
             dom_hi: int | None, lo: int, hi: int) -> DataFrame:
    dd_f = F.col("d_year").isin(2000, 2001)
    if dom_hi is not None:
        dd_f = dd_f & (F.col("d_dom") <= dom_hi)
    dd = F.broadcast(
        _t(spark, "date_dim").filter(dd_f).select("d_date_sk")
    )
    hd_f = F.col("hd_buy_potential").isin(bp) & (F.col("hd_vehicle_count") > 0)
    if ratio:
        # spec: dep_count / vehicle_count > 1.2, cross-multiplied exact
        hd_f = hd_f & (
            F.col("hd_dep_count") * 5 > F.col("hd_vehicle_count") * 6
        )
    hd = F.broadcast(
        _t(spark, "household_demographics").filter(hd_f).select("hd_demo_sk")
    )
    ss = _t(spark, "store_sales")
    baskets = (
        ss.join(dd, ss.ss_sold_date_sk == dd.d_date_sk)
        .join(hd, ss.ss_hdemo_sk == hd.hd_demo_sk)
        .groupBy("ss_ticket_number", "ss_customer_sk")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .filter(F.col("cnt").between(lo, hi))
    )
    cust = (
        _t(spark, "customer").select("c_customer_sk", "c_last_name", "c_first_name")
    )
    return baskets.join(cust, baskets.ss_customer_sk == cust.c_customer_sk).select(
        "c_last_name", "c_first_name", "ss_ticket_number", "cnt"
    )


@query(
    "tpcds_q34_ticket_count_buckets",
    oracle=_basket_sql(
        "'>10000', 'Unknown', '1001-5000', '5001-10000'",
        "", "d_dom <= 31", 2, 4,
    ),
)
def tpcds_q34(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q34 shape: customers whose store tickets carried a
    mid-size basket (count bucket) under household-demographic gates.

    The count-bucket HAVING family: aggregate per (ticket, customer),
    keep rows whose COUNT falls in a band, then resolve customer
    names. Adapted bands for the generator's ~4-lines-per-ticket
    layout: bucket [2,4] instead of the spec's [15,20] and a wider
    buy-potential gate, else the bucket is empty at the materialized
    scale (documented; the plan — filtered fact → grouped count →
    HAVING band → broadcast name join — is the spec's). The demo gate
    broadcasts as a semi-join filter BEFORE the shuffle, so the
    exchange carries only qualifying lines.
    """
    return _basket(
        spark,
        [">10000", "Unknown", "1001-5000", "5001-10000"],
        ratio=False, dom_hi=None, lo=2, hi=4,
    )


@query(
    "tpcds_q73_small_basket_tickets",
    oracle=_basket_sql(
        "'>10000', 'Unknown'",
        "AND hd_dep_count * 5 > hd_vehicle_count * 6", "d_dom <= 7", 1, 2,
    ),
)
def tpcds_q73(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q73 shape: small-basket tickets ([1,2] count bucket)
    under the spec's dependent/vehicle ratio gate.

    Q34's sibling with the spec's dep/vehicle > 1.2 ratio filter kept
    EXACT via cross-multiplication (5·dep > 6·vehicle — integers, no
    FP boundary), and the early-calendar d_dom gate. Same one-exchange
    plan: both demographic and calendar gates broadcast ahead of the
    grouping shuffle.
    """
    return _basket(
        spark, [">10000", "Unknown"], ratio=True, dom_hi=7, lo=1, hi=2,
    )
