"""TPC-DS shapes, ninth tier: Q48 (OR-of-AND bracket quantity),
Q50 (return-lag histogram), Q53/Q63/Q89 (periodic deviation from
yearly average), Q56/Q60 (attribute-list cross-channel unions),
Q58 (cross-channel revenue balance), Q61 (promotion ratio),
Q66 (warehouse shipping pivot), Q69 (active-store/inactive-remote
profile), Q71 (time-of-day brand revenue), Q74 (quantity-based
customer growth).

The deviation family (Q53/Q63/Q89) keeps the spec's
``abs(period − avg)/avg > 0.1`` filter exact by cross-multiplying
with the period count: ``10·|k·period − year| > year`` — integers
end to end. Oracle scheme as :mod:`tpcds_demo`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tpctools_spark.queries.tpcds_demo import _t, _with
from tpctools_spark.registry import query


@query(
    "tpcds_q48_bracket_quantity",
    oracle=_with(
        "store_sales", "customer_demographics", "customer_address", "date_dim"
    )
    + """
    SELECT CAST(SUM(CAST(ss_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM store_sales
    JOIN customer_demographics ON ss_cdemo_sk = cd_demo_sk
    JOIN customer_address ON ss_addr_sk = ca_address_sk
    JOIN date_dim ON ss_sold_date_sk = d_date_sk
    WHERE d_year = 2001
      AND ((cd_marital_status = 'M' AND cd_education_status = 'College'
            AND ss_sales_price BETWEEN 1000 AND 5000)
        OR (cd_marital_status = 'S' AND cd_education_status = 'Primary'
            AND ss_sales_price BETWEEN 2000 AND 7000)
        OR (cd_marital_status = 'W' AND cd_education_status = 'Secondary'
            AND ss_sales_price BETWEEN 3000 AND 9000))
      AND ca_state IN ('CA', 'TX', 'NY', 'FL', 'OH', 'IL')
    """,
)
def tpcds_q48(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q48 shape: total quantity under OR-of-AND demographic ×
    price brackets with a state gate.

    Q13's sibling: the disjunction couples a broadcast-dim attribute
    (marital × education) with a fact measure band (sales price), so
    the residual evaluates after the cd broadcast join; the state list
    gates via the (unhinted, AQE-sized) address join. One fact scan
    feeding the single-row aggregate. Price bands widened to the
    generator's uniform [0, 10000) price domain (spec's are
    dollars-tens; documented).
    """
    cd = F.broadcast(
        _t(spark, "customer_demographics").select(
            "cd_demo_sk", "cd_marital_status", "cd_education_status"
        )
    )
    ca = (
        _t(spark, "customer_address")
        .filter(F.col("ca_state").isin("CA", "TX", "NY", "FL", "OH", "IL"))
        .select("ca_address_sk")
    )
    dd = F.broadcast(
        _t(spark, "date_dim").filter(F.col("d_year") == 2001).select("d_date_sk")
    )
    ss = _t(spark, "store_sales")
    p = F.col("ss_sales_price")
    bracket = (
        ((F.col("cd_marital_status") == "M")
         & (F.col("cd_education_status") == "College")
         & p.between(1000, 5000))
        | ((F.col("cd_marital_status") == "S")
           & (F.col("cd_education_status") == "Primary")
           & p.between(2000, 7000))
        | ((F.col("cd_marital_status") == "W")
           & (F.col("cd_education_status") == "Secondary")
           & p.between(3000, 9000))
    )
    return (
        ss.join(cd, ss.ss_cdemo_sk == cd.cd_demo_sk)
        .join(ca, ss.ss_addr_sk == ca.ca_address_sk)
        .join(dd, ss.ss_sold_date_sk == dd.d_date_sk)
        .filter(bracket)
        .agg(F.sum(F.col("ss_quantity").cast("bigint")).alias("total_qty"))
    )


@query(
    "tpcds_q50_return_lag_histogram",
    oracle=_with("store_sales", "store_returns", "store")
    + """
    SELECT s_store_id,
           CAST(SUM(CASE WHEN lag_days <= 30 THEN 1 ELSE 0 END) AS BIGINT)
             AS d30,
           CAST(SUM(CASE WHEN lag_days > 30 AND lag_days <= 60 THEN 1 ELSE 0
             END) AS BIGINT) AS d60,
           CAST(SUM(CASE WHEN lag_days > 60 AND lag_days <= 90 THEN 1 ELSE 0
             END) AS BIGINT) AS d90,
           CAST(SUM(CASE WHEN lag_days > 90 AND lag_days <= 120 THEN 1 ELSE 0
             END) AS BIGINT) AS d120,
           CAST(SUM(CASE WHEN lag_days > 120 THEN 1 ELSE 0 END) AS BIGINT)
             AS dmore
    FROM (
      SELECT s_store_id,
             sr_returned_date_sk - ss_sold_date_sk AS lag_days
      FROM store_sales
      JOIN store_returns ON ss_ticket_number = sr_ticket_number
                        AND ss_item_sk = sr_item_sk
      JOIN store ON ss_store_sk = s_store_sk
    ) t
    GROUP BY s_store_id
    """,
)
def tpcds_q50(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q50 shape: sold→returned lag histogram per store
    (30/60/90/120-day buckets).

    The composite-key (ticket, item) fact-fact join — the spec also
    keys on customer, dropped because the generator draws line
    customers independently (documented; the join SHAPE is identical).
    Lag arrives as surrogate-key arithmetic (d_date_sk is a dense day
    number), so the spec's two date_dim legs collapse into one integer
    subtraction — no date joins at all, and the generator's
    independent dates (negative lags possible) land in the first
    bucket deterministically on both engines.
    """
    st = F.broadcast(_t(spark, "store").select("s_store_sk", "s_store_id"))
    ss = _t(spark, "store_sales").select(
        "ss_ticket_number", "ss_item_sk", "ss_store_sk", "ss_sold_date_sk"
    )
    sr = _t(spark, "store_returns").select(
        "sr_ticket_number", "sr_item_sk", "sr_returned_date_sk"
    )
    lag = (F.col("sr_returned_date_sk") - F.col("ss_sold_date_sk")).alias("lag_days")
    joined = (
        ss.join(
            sr,
            (ss.ss_ticket_number == sr.sr_ticket_number)
            & (ss.ss_item_sk == sr.sr_item_sk),
        )
        .join(st, ss.ss_store_sk == st.s_store_sk)
        .select("s_store_id", lag)
    )
    ld = F.col("lag_days")
    return joined.groupBy("s_store_id").agg(
        F.sum(F.when(ld <= 30, 1).otherwise(0)).cast("bigint").alias("d30"),
        F.sum(F.when((ld > 30) & (ld <= 60), 1).otherwise(0))
        .cast("bigint").alias("d60"),
        F.sum(F.when((ld > 60) & (ld <= 90), 1).otherwise(0))
        .cast("bigint").alias("d90"),
        F.sum(F.when((ld > 90) & (ld <= 120), 1).otherwise(0))
        .cast("bigint").alias("d120"),
        F.sum(F.when(ld > 120, 1).otherwise(0)).cast("bigint").alias("dmore"),
    )


def _deviation_sql(entity_col: str, period_col: str, k: int) -> str:
    return _with("store_sales", "item", "date_dim") + f"""
    , per_period AS (
      SELECT {entity_col} AS entity, {period_col} AS period,
             CAST(SUM(CAST(ss_sales_price * 100 AS BIGINT)) AS BIGINT) AS cents
      FROM store_sales
      JOIN item ON ss_item_sk = i_item_sk
      JOIN date_dim ON ss_sold_date_sk = d_date_sk
      WHERE d_year = 2001
      GROUP BY 1, 2
    ), with_year AS (
      SELECT *, CAST(SUM(cents) OVER (PARTITION BY entity) AS BIGINT)
                AS year_cents
      FROM per_period
    )
    SELECT entity, period, cents, year_cents
    FROM with_year
    WHERE year_cents > 0
      AND 10 * ABS({k} * cents - year_cents) > year_cents
    """


def _deviation(
    spark: SparkSession, entity_col: str, period_col: str, k: int
) -> DataFrame:
    it = F.broadcast(_t(spark, "item").select("i_item_sk", entity_col.split(".")[-1]))
    dd = F.broadcast(
        _t(spark, "date_dim")
        .filter(F.col("d_year") == 2001)
        .select("d_date_sk", period_col)
    )
    ss = _t(spark, "store_sales")
    ent = entity_col.split(".")[-1]
    per_period = (
        ss.join(it, ss.ss_item_sk == it.i_item_sk)
        .join(dd, ss.ss_sold_date_sk == dd.d_date_sk)
        .groupBy(F.col(ent).alias("entity"), F.col(period_col).alias("period"))
        .agg(F.sum((F.col("ss_sales_price") * 100).cast("bigint")).alias("cents"))
    )
    w = Window.partitionBy("entity")
    return (
        per_period.withColumn("year_cents", F.sum("cents").over(w))
        .filter(
            (F.col("year_cents") > 0)
            & (
                10 * F.abs(F.lit(k) * F.col("cents") - F.col("year_cents"))
                > F.col("year_cents")
            )
        )
        .select("entity", "period", "cents", "year_cents")
    )


@query(
    "tpcds_q53_manufact_quarter_deviation",
    oracle=_deviation_sql("i_manufact_id", "d_qoy", 4),
)
def tpcds_q53(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q53 shape: manufacturers whose quarterly revenue deviates
    more than 10% from their yearly average.

    The grouped-subquery AVG decorrelated to a window over the single
    aggregate; the ratio filter is exact: with 4 quarters,
    |q − year/4|/(year/4) > 0.1 ⟺ 10·|4q − year| > year — no division
    touches the row set. One shuffle (the aggregate); the window reuses
    its partitioning.
    """
    return _deviation(spark, "i_manufact_id", "d_qoy", 4)


@query(
    "tpcds_q63_manager_month_deviation",
    oracle=_deviation_sql("i_manager_id", "d_moy", 12),
)
def tpcds_q63(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q63 shape: Q53 at manager × month grain (k=12 in the
    exact deviation cross-multiplication)."""
    return _deviation(spark, "i_manager_id", "d_moy", 12)


@query(
    "tpcds_q89_class_month_deviation",
    oracle=_with("store_sales", "item", "store", "date_dim")
    + """
    , per_cell AS (
      SELECT i_category, i_class, s_store_id, d_moy,
             CAST(SUM(CAST(ss_sales_price * 100 AS BIGINT)) AS BIGINT) AS cents
      FROM store_sales
      JOIN item ON ss_item_sk = i_item_sk
      JOIN store ON ss_store_sk = s_store_sk
      JOIN date_dim ON ss_sold_date_sk = d_date_sk
      WHERE d_year = 2001
      GROUP BY 1, 2, 3, 4
    ), with_year AS (
      SELECT *, CAST(SUM(cents) OVER (PARTITION BY i_category, i_class,
                  s_store_id) AS BIGINT) AS year_cents
      FROM per_cell
    )
    SELECT i_category, i_class, s_store_id, d_moy, cents, year_cents
    FROM with_year
    WHERE year_cents > 0 AND 10 * ABS(12 * cents - year_cents) > year_cents
    """,
)
def tpcds_q89(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q89 shape: Q63's deviation filter at (category, class,
    store) × month grain — the multi-key variant whose window
    partition is composite."""
    it = F.broadcast(_t(spark, "item").select("i_item_sk", "i_category", "i_class"))
    st = F.broadcast(_t(spark, "store").select("s_store_sk", "s_store_id"))
    dd = F.broadcast(
        _t(spark, "date_dim")
        .filter(F.col("d_year") == 2001)
        .select("d_date_sk", "d_moy")
    )
    ss = _t(spark, "store_sales")
    per_cell = (
        ss.join(it, ss.ss_item_sk == it.i_item_sk)
        .join(st, ss.ss_store_sk == st.s_store_sk)
        .join(dd, ss.ss_sold_date_sk == dd.d_date_sk)
        .groupBy("i_category", "i_class", "s_store_id", "d_moy")
        .agg(F.sum((F.col("ss_sales_price") * 100).cast("bigint")).alias("cents"))
    )
    w = Window.partitionBy("i_category", "i_class", "s_store_id")
    return (
        per_cell.withColumn("year_cents", F.sum("cents").over(w))
        .filter(
            (F.col("year_cents") > 0)
            & (10 * F.abs(12 * F.col("cents") - F.col("year_cents"))
               > F.col("year_cents"))
        )
        .select("i_category", "i_class", "s_store_id", "d_moy", "cents", "year_cents")
    )


def _attr_union_sql(attr_pred: str) -> str:
    legs = []
    for fact, pfx in (
        ("store_sales", "ss"), ("catalog_sales", "cs"), ("web_sales", "ws")
    ):
        item_col = f"{pfx}_item_sk"
        legs.append(f"""
      SELECT i_item_id,
             CAST(SUM(CAST({pfx}_ext_sales_price * 100 AS BIGINT)) AS BIGINT)
               AS cents
      FROM {fact}
      JOIN item ON {item_col} = i_item_sk
      JOIN date_dim ON {pfx}_sold_date_sk = d_date_sk
      WHERE d_year = 2001 AND {attr_pred}
      GROUP BY 1""")
    union = "\n      UNION ALL\n".join(legs)
    return _with(
        "store_sales", "catalog_sales", "web_sales", "item", "date_dim"
    ) + f"""
    , legs AS ({union})
    SELECT i_item_id, CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM legs GROUP BY 1
    """


def _attr_union(spark: SparkSession, attr_filter) -> DataFrame:
    dd = F.broadcast(
        _t(spark, "date_dim").filter(F.col("d_year") == 2001).select("d_date_sk")
    )
    it = F.broadcast(
        _t(spark, "item").filter(attr_filter).select("i_item_sk", "i_item_id")
    )
    legs = []
    for fact, pfx in (
        ("store_sales", "ss"), ("catalog_sales", "cs"), ("web_sales", "ws")
    ):
        f_ = _t(spark, fact)
        legs.append(
            f_.join(dd, F.col(f"{pfx}_sold_date_sk") == dd.d_date_sk)
            .join(it, F.col(f"{pfx}_item_sk") == it.i_item_sk)
            .groupBy("i_item_id")
            .agg(
                F.sum(
                    (F.col(f"{pfx}_ext_sales_price") * 100).cast("bigint")
                ).alias("cents")
            )
        )
    u = legs[0].unionByName(legs[1]).unionByName(legs[2])
    return u.groupBy("i_item_id").agg(
        F.sum("cents").cast("bigint").alias("total_cents")
    )


@query(
    "tpcds_q56_color_cross_channel",
    oracle=_attr_union_sql("i_color IN ('bold', 'silent', 'regular')"),
)
def tpcds_q56(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q56 shape: items in a color list totaled across all
    three channels (per-channel partial aggregates below the union —
    each leg combines map-side before any exchange; the item filter
    broadcasts into every leg's scan). Colors from the generator's
    word pool (no spec color domain; documented)."""
    return _attr_union(
        spark, F.col("i_color").isin("bold", "silent", "regular")
    )


@query(
    "tpcds_q60_category_cross_channel",
    oracle=_attr_union_sql("i_category IN ('Music', 'Books', 'Sports')"),
)
def tpcds_q60(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q60 shape: Q56 keyed by spec category list instead of
    color (same partial-agg-below-union plan)."""
    return _attr_union(
        spark, F.col("i_category").isin("Music", "Books", "Sports")
    )


@query(
    "tpcds_q58_channel_balance",
    oracle=_with("store_sales", "catalog_sales", "web_sales", "item", "date_dim")
    + """
    , ss_rev AS (
      SELECT ss_item_sk AS item,
             CAST(SUM(CAST(ss_ext_sales_price * 100 AS BIGINT)) AS BIGINT) AS c
      FROM store_sales JOIN date_dim ON ss_sold_date_sk = d_date_sk
      WHERE d_year = 2001 GROUP BY 1
    ), cs_rev AS (
      SELECT cs_item_sk AS item,
             CAST(SUM(CAST(cs_ext_sales_price * 100 AS BIGINT)) AS BIGINT) AS c
      FROM catalog_sales JOIN date_dim ON cs_sold_date_sk = d_date_sk
      WHERE d_year = 2001 GROUP BY 1
    ), ws_rev AS (
      SELECT ws_item_sk AS item,
             CAST(SUM(CAST(ws_ext_sales_price * 100 AS BIGINT)) AS BIGINT) AS c
      FROM web_sales JOIN date_dim ON ws_sold_date_sk = d_date_sk
      WHERE d_year = 2001 GROUP BY 1
    )
    SELECT i_item_id, s.c AS store_cents, cc.c AS catalog_cents,
           w.c AS web_cents
    FROM ss_rev s
    JOIN cs_rev cc ON s.item = cc.item
    JOIN ws_rev w ON s.item = w.item
    JOIN item ON s.item = i_item_sk
    WHERE 2 * 3 * s.c  >= (s.c + cc.c + w.c)
      AND 2 * 3 * cc.c >= (s.c + cc.c + w.c)
      AND 2 * 3 * w.c  >= (s.c + cc.c + w.c)
      AND 2 * 3 * s.c  <= 4 * (s.c + cc.c + w.c)
      AND 2 * 3 * cc.c <= 4 * (s.c + cc.c + w.c)
      AND 2 * 3 * w.c  <= 4 * (s.c + cc.c + w.c)
    """,
)
def tpcds_q58(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q58 shape: items whose revenue is balanced across all
    three channels.

    Three per-channel aggregates joined on the item key, each channel
    required within a band of the three-channel average. The spec's
    0.9·avg ≤ x ≤ 1.1·avg is widened to [avg/2, 2·avg] for the
    generator's independent uniforms (documented) and kept exact by
    cross-multiplication: x ≥ avg/2 ⟺ 6x ≥ total, x ≤ 2·avg ⟺
    6x ≤ 4·total. The three legs shuffle on the same item key, so the
    joins co-partition.
    """
    dd = F.broadcast(
        _t(spark, "date_dim").filter(F.col("d_year") == 2001).select("d_date_sk")
    )

    def rev(fact: str, pfx: str, out: str) -> DataFrame:
        f_ = _t(spark, fact)
        return (
            f_.join(dd, F.col(f"{pfx}_sold_date_sk") == dd.d_date_sk)
            .groupBy(F.col(f"{pfx}_item_sk").alias(f"item_{out}"))
            .agg(
                F.sum(
                    (F.col(f"{pfx}_ext_sales_price") * 100).cast("bigint")
                ).alias(out)
            )
        )

    s = rev("store_sales", "ss", "store_cents")
    c = rev("catalog_sales", "cs", "catalog_cents")
    w = rev("web_sales", "ws", "web_cents")
    it = F.broadcast(_t(spark, "item").select("i_item_sk", "i_item_id"))
    j = (
        s.join(c, s.item_store_cents == c.item_catalog_cents)
        .join(w, s.item_store_cents == w.item_web_cents)
        .join(it, s.item_store_cents == it.i_item_sk)
    )
    total = F.col("store_cents") + F.col("catalog_cents") + F.col("web_cents")
    cond = None
    for col in ("store_cents", "catalog_cents", "web_cents"):
        c_ = (6 * F.col(col) >= total) & (6 * F.col(col) <= 4 * total)
        cond = c_ if cond is None else (cond & c_)
    return j.filter(cond).select(
        "i_item_id", "store_cents", "catalog_cents", "web_cents"
    )


@query(
    "tpcds_q61_promotion_ratio",
    oracle=_with("store_sales", "promotion", "date_dim")
    + """
    SELECT
      CAST(SUM(CASE WHEN p_channel_dmail = 'Y' OR p_channel_email = 'Y'
                     OR p_channel_tv = 'Y'
               THEN CAST(ss_ext_sales_price * 100 AS BIGINT) ELSE 0 END)
           AS BIGINT) AS promo_cents,
      CAST(SUM(CAST(ss_ext_sales_price * 100 AS BIGINT)) AS BIGINT)
        AS total_cents
    FROM store_sales
    LEFT JOIN promotion ON ss_promo_sk = p_promo_sk
    JOIN date_dim ON ss_sold_date_sk = d_date_sk
    WHERE d_year = 2001
    """,
)
def tpcds_q61(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q61 shape: promotional vs total revenue in one scan.

    The spec computes two scalar subqueries (promo-channel sales,
    all sales) and divides; fused here into one scan with a
    conditional sum — the Q90 single-scan discipline — returning the
    exact cents pair (the ratio is one division away and would ride
    on FP).
    """
    promo = F.broadcast(
        _t(spark, "promotion").select(
            "p_promo_sk", "p_channel_dmail", "p_channel_email", "p_channel_tv"
        )
    )
    dd = F.broadcast(
        _t(spark, "date_dim").filter(F.col("d_year") == 2001).select("d_date_sk")
    )
    ss = _t(spark, "store_sales")
    cents = (F.col("ss_ext_sales_price") * 100).cast("bigint")
    is_promo = (
        (F.col("p_channel_dmail") == "Y")
        | (F.col("p_channel_email") == "Y")
        | (F.col("p_channel_tv") == "Y")
    )
    return (
        ss.join(promo, ss.ss_promo_sk == promo.p_promo_sk, "left")
        .join(dd, ss.ss_sold_date_sk == dd.d_date_sk)
        .agg(
            F.sum(F.when(is_promo, cents).otherwise(F.lit(0))).alias("promo_cents"),
            F.sum(cents).alias("total_cents"),
        )
    )


@query(
    "tpcds_q66_warehouse_ship_pivot",
    oracle=_with("web_sales", "catalog_sales", "warehouse", "ship_mode", "date_dim")
    + """
    , legs AS (
      SELECT w_warehouse_name, d_moy,
             CASE WHEN sm_type IN ('EXPRESS', 'NEXT DAY', 'OVERNIGHT')
                  THEN 'fast' ELSE 'slow' END AS speed,
             CAST(ws_quantity AS BIGINT) AS qty
      FROM web_sales
      JOIN warehouse ON ws_warehouse_sk = w_warehouse_sk
      JOIN ship_mode ON ws_ship_mode_sk = sm_ship_mode_sk
      JOIN date_dim ON ws_sold_date_sk = d_date_sk
      WHERE d_year = 2001
      UNION ALL
      SELECT w_warehouse_name, d_moy,
             CASE WHEN sm_type IN ('EXPRESS', 'NEXT DAY', 'OVERNIGHT')
                  THEN 'fast' ELSE 'slow' END AS speed,
             CAST(cs_quantity AS BIGINT) AS qty
      FROM catalog_sales
      JOIN warehouse ON cs_warehouse_sk = w_warehouse_sk
      JOIN ship_mode ON cs_ship_mode_sk = sm_ship_mode_sk
      JOIN date_dim ON cs_sold_date_sk = d_date_sk
      WHERE d_year = 2001
    )
    SELECT w_warehouse_name,
    """
    + ",\n           ".join(
        f"""CAST(SUM(CASE WHEN d_moy = {m} AND speed = 'fast' THEN qty
                 ELSE 0 END) AS BIGINT) AS fast_m{m},
           CAST(SUM(CASE WHEN d_moy = {m} AND speed = 'slow' THEN qty
                 ELSE 0 END) AS BIGINT) AS slow_m{m}"""
        for m in range(1, 13)
    )
    + """
    FROM legs GROUP BY 1
    """,
)
def tpcds_q66(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q66 shape: warehouse shipping volume pivoted to
    month × speed-class columns across web + catalog.

    The spec's 24-column manual pivot (12 months × 2 ship-mode
    classes) as conditional sums over a two-channel UNION — partial
    aggregation below the union keeps each leg's exchange at
    warehouse grain. Ship modes classify via the spec sm_type domain.
    """
    sm = F.broadcast(
        _t(spark, "ship_mode").select(
            "sm_ship_mode_sk",
            F.when(
                F.col("sm_type").isin("EXPRESS", "NEXT DAY", "OVERNIGHT"), "fast"
            ).otherwise("slow").alias("speed"),
        )
    )
    w = F.broadcast(_t(spark, "warehouse").select("w_warehouse_sk", "w_warehouse_name"))
    dd = F.broadcast(
        _t(spark, "date_dim")
        .filter(F.col("d_year") == 2001)
        .select("d_date_sk", "d_moy")
    )

    def leg(fact: str, pfx: str) -> DataFrame:
        f_ = _t(spark, fact)
        return (
            f_.join(w, F.col(f"{pfx}_warehouse_sk") == w.w_warehouse_sk)
            .join(sm, F.col(f"{pfx}_ship_mode_sk") == sm.sm_ship_mode_sk)
            .join(dd, F.col(f"{pfx}_sold_date_sk") == dd.d_date_sk)
            .select(
                "w_warehouse_name", "d_moy", "speed",
                F.col(f"{pfx}_quantity").cast("bigint").alias("qty"),
            )
        )

    u = leg("web_sales", "ws").unionByName(leg("catalog_sales", "cs"))
    aggs = []
    for m in range(1, 13):
        for spd in ("fast", "slow"):
            aggs.append(
                F.sum(
                    F.when(
                        (F.col("d_moy") == m) & (F.col("speed") == spd),
                        F.col("qty"),
                    ).otherwise(F.lit(0))
                ).cast("bigint").alias(f"{spd}_m{m}")
            )
    return u.groupBy("w_warehouse_name").agg(*aggs)


@query(
    "tpcds_q69_store_only_demographics",
    oracle=_with(
        "customer", "customer_demographics", "store_sales",
        "web_sales", "catalog_sales", "date_dim"
    )
    + """
    SELECT cd_gender, cd_marital_status, cd_education_status,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM customer
    JOIN customer_demographics ON cd_demo_sk = c_current_cdemo_sk
    WHERE EXISTS (
        SELECT 1 FROM store_sales JOIN date_dim ON ss_sold_date_sk = d_date_sk
        WHERE ss_customer_sk = c_customer_sk AND d_year = 2001)
      AND NOT EXISTS (
        SELECT 1 FROM web_sales JOIN date_dim ON ws_sold_date_sk = d_date_sk
        WHERE ws_bill_customer_sk = c_customer_sk AND d_year = 2001)
      AND NOT EXISTS (
        SELECT 1 FROM catalog_sales JOIN date_dim ON cs_sold_date_sk = d_date_sk
        WHERE cs_bill_customer_sk = c_customer_sk AND d_year = 2001)
    GROUP BY 1, 2, 3
    """,
)
def tpcds_q69(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q69 shape: Q10's complement — store-active customers
    with NO remote-channel activity (one semi join + two anti joins
    on the customer key, then the demographic count)."""
    dd = F.broadcast(
        _t(spark, "date_dim").filter(F.col("d_year") == 2001).select("d_date_sk")
    )
    ss_c = (
        _t(spark, "store_sales")
        .join(dd, F.col("ss_sold_date_sk") == F.col("d_date_sk"))
        .select(F.col("ss_customer_sk").alias("k"))
    )
    ws_c = (
        _t(spark, "web_sales")
        .join(dd, F.col("ws_sold_date_sk") == F.col("d_date_sk"))
        .select(F.col("ws_bill_customer_sk").alias("k"))
    )
    cs_c = (
        _t(spark, "catalog_sales")
        .join(dd, F.col("cs_sold_date_sk") == F.col("d_date_sk"))
        .select(F.col("cs_bill_customer_sk").alias("k"))
    )
    # A/B NEUTRAL (r10, interleaved min-of-5 at sf1): DISTINCT-reducing
    # the three fact key streams before the semi/anti probes measured
    # +0.7% on min and NOT sign-stable (rep deltas mixed) — the semi/
    # anti hash build already collapses duplicates, so the extra
    # hash-agg pass buys nothing. Raw key streams stay the shipped
    # plan (same boundary as the q10/q14 flag-agg negatives).
    cust = _t(spark, "customer").select("c_customer_sk", "c_current_cdemo_sk")
    gated = (
        cust.join(ss_c, cust.c_customer_sk == ss_c.k, "left_semi")
        .join(ws_c, cust.c_customer_sk == ws_c.k, "left_anti")
        .join(cs_c, cust.c_customer_sk == cs_c.k, "left_anti")
    )
    cd = _t(spark, "customer_demographics").select(
        "cd_demo_sk", "cd_gender", "cd_marital_status", "cd_education_status"
    )
    return (
        gated.join(cd, gated.c_current_cdemo_sk == cd.cd_demo_sk)
        .groupBy("cd_gender", "cd_marital_status", "cd_education_status")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


@query(
    "tpcds_q71_brand_time_of_day",
    oracle=_with(
        "store_sales", "catalog_sales", "web_sales", "item", "time_dim", "date_dim"
    )
    + """
    , legs AS (
      SELECT ss_item_sk AS item, ss_sold_time_sk AS tsk,
             CAST(ss_ext_sales_price * 100 AS BIGINT) AS cents
      FROM store_sales JOIN date_dim ON ss_sold_date_sk = d_date_sk
      WHERE d_year = 2001 AND d_moy = 12
      UNION ALL
      SELECT cs_item_sk, cs_sold_time_sk,
             CAST(cs_ext_sales_price * 100 AS BIGINT)
      FROM catalog_sales JOIN date_dim ON cs_sold_date_sk = d_date_sk
      WHERE d_year = 2001 AND d_moy = 12
      UNION ALL
      SELECT ws_item_sk, ws_sold_time_sk,
             CAST(ws_ext_sales_price * 100 AS BIGINT)
      FROM web_sales JOIN date_dim ON ws_sold_date_sk = d_date_sk
      WHERE d_year = 2001 AND d_moy = 12
    )
    SELECT i_brand_id, t_hour,
           CAST(SUM(cents) AS BIGINT) AS rev_cents
    FROM legs
    JOIN item ON item = i_item_sk
    JOIN time_dim ON tsk = t_time_sk
    WHERE t_meal_time IN ('breakfast', 'dinner')
    GROUP BY 1, 2
    """,
)
def tpcds_q71(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q71 shape: brand revenue during meal-time hours across
    all three channels in one month.

    The time_dim join (breakfast/dinner meal windows) over a
    three-channel union; the big time dim (86k rows) broadcasts after
    its meal-time filter cuts it to 6 hours' worth. Union first, one
    aggregate at (brand, hour) — each leg stays partial-agg friendly.
    """
    dd = F.broadcast(
        _t(spark, "date_dim")
        .filter((F.col("d_year") == 2001) & (F.col("d_moy") == 12))
        .select("d_date_sk")
    )
    td = F.broadcast(
        _t(spark, "time_dim")
        .filter(F.col("t_meal_time").isin("breakfast", "dinner"))
        .select("t_time_sk", "t_hour")
    )
    it = F.broadcast(_t(spark, "item").select("i_item_sk", "i_brand_id"))

    def leg(fact: str, pfx: str) -> DataFrame:
        f_ = _t(spark, fact)
        return f_.join(dd, F.col(f"{pfx}_sold_date_sk") == dd.d_date_sk).select(
            F.col(f"{pfx}_item_sk").alias("item"),
            F.col(f"{pfx}_sold_time_sk").alias("tsk"),
            (F.col(f"{pfx}_ext_sales_price") * 100).cast("bigint").alias("cents"),
        )

    u = (
        leg("store_sales", "ss")
        .unionByName(leg("catalog_sales", "cs"))
        .unionByName(leg("web_sales", "ws"))
    )
    return (
        u.join(it, F.col("item") == it.i_item_sk)
        .join(td, F.col("tsk") == td.t_time_sk)
        .groupBy("i_brand_id", "t_hour")
        .agg(F.sum("cents").cast("bigint").alias("rev_cents"))
    )


@query(
    "tpcds_q74_quantity_growth",
    oracle=_with("store_sales", "web_sales", "customer", "date_dim")
    + """
    , ss_year AS (
      SELECT ss_customer_sk AS cust,
             CASE WHEN d_year <= 2000 THEN 1 ELSE 2 END AS period,
             CAST(SUM(CAST(ss_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM store_sales JOIN date_dim ON ss_sold_date_sk = d_date_sk
      GROUP BY 1, 2
    ), ws_year AS (
      SELECT ws_bill_customer_sk AS cust,
             CASE WHEN d_year <= 2000 THEN 1 ELSE 2 END AS period,
             CAST(SUM(CAST(ws_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM web_sales JOIN date_dim ON ws_sold_date_sk = d_date_sk
      GROUP BY 1, 2
    )
    SELECT c_customer_id,
           s1.qty AS store_y1, s2.qty AS store_y2,
           w1.qty AS web_y1, w2.qty AS web_y2
    FROM customer
    JOIN ss_year s1 ON s1.cust = c_customer_sk AND s1.period = 1
    JOIN ss_year s2 ON s2.cust = c_customer_sk AND s2.period = 2
    JOIN ws_year w1 ON w1.cust = c_customer_sk AND w1.period = 1
    JOIN ws_year w2 ON w2.cust = c_customer_sk AND w2.period = 2
    WHERE s1.qty > 0 AND w1.qty > 0
      AND w2.qty * s1.qty > s2.qty * w1.qty
    """,
)
def tpcds_q74(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q74 shape: Q11's growth comparison on QUANTITY totals
    (the spec's year_total variant family member) over the same
    two-period windows as Q4 — per-channel period pivots on one
    customer key, exact integer cross-multiplied growth filter."""
    dd = F.broadcast(
        _t(spark, "date_dim").select(
            "d_date_sk",
            F.when(F.col("d_year") <= 2000, 1).otherwise(2).alias("period"),
        )
    )

    # Pivot collapse (the q4 rewrite applied here, shipped after a
    # +40.1% sign-stable interleaved A/B at sf1: 4-leg join form
    # 4.416 s vs pivot 2.644 s min-of-5, every rep faster): each
    # channel's two periods fold into ONE conditional-aggregate pass —
    # 2 fact shuffles + 2 customer joins instead of 4 filter legs over
    # exchange-reused year_totals + 4 joins. A period leg that is
    # absent in the join form is a NULL here, and every filter below
    # needs all four values non-null, so the kept set is identical
    # (verified row-for-row at sf0.01 before the A/B).
    cust = _t(spark, "customer").select("c_customer_sk", "c_customer_id")

    def pivot_total(fact: str, ckey: str, date: str, qty: str, out: str):
        f_ = _t(spark, fact)
        return (
            f_.join(dd, F.col(date) == dd.d_date_sk)
            .groupBy(F.col(ckey).alias(f"k_{out}"))
            .agg(
                F.sum(
                    F.when(F.col("period") == 1, F.col(qty).cast("bigint"))
                ).alias(f"{out}_y1"),
                F.sum(
                    F.when(F.col("period") == 2, F.col(qty).cast("bigint"))
                ).alias(f"{out}_y2"),
            )
        )

    ssp = pivot_total(
        "store_sales", "ss_customer_sk", "ss_sold_date_sk",
        "ss_quantity", "store",
    )
    wsp = pivot_total(
        "web_sales", "ws_bill_customer_sk", "ws_sold_date_sk",
        "ws_quantity", "web",
    )
    j = cust.join(ssp, cust.c_customer_sk == F.col("k_store")).join(
        wsp, cust.c_customer_sk == F.col("k_web")
    )
    return j.filter(
        (F.col("store_y1") > 0)
        & (F.col("web_y1") > 0)
        & (F.col("web_y2") * F.col("store_y1") > F.col("store_y2") * F.col("web_y1"))
    ).select("c_customer_id", "store_y1", "store_y2", "web_y1", "web_y2")
