"""TPC-DS shapes, fifth tier: Q39/Q47/Q51/Q76/Q97 — statistical
filters, deviation windows, cumulative full-outer merges, and
membership counting.

The FP discipline here is the module's point: every threshold that
the spec writes as a ratio (coefficient of variation > 1, deviation
from mean > 10%) is algebraically cross-multiplied into EXACT integer
arithmetic on counts and cent-sums before any division happens, so
the row set can never flip on engine-specific rounding; FP appears
only in truncated display columns. Oracle scheme as
:mod:`tpcds_demo`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tpctools_spark.queries._util import maybe_local_checkpoint
from tpctools_spark.queries.tpcds_demo import _t, _with
from tpctools_spark.registry import query


@query(
    "tpcds_q39_inventory_variance",
    oracle=_with("inventory", "item", "warehouse", "date_dim")
    + """
    , moments AS (
      SELECT w_warehouse_sk, i_item_sk, d_moy,
             CAST(COUNT(inv_quantity_on_hand) AS BIGINT) AS n,
             CAST(SUM(CAST(inv_quantity_on_hand AS BIGINT)) AS BIGINT) AS s1,
             CAST(SUM(CAST(inv_quantity_on_hand AS BIGINT)
                      * CAST(inv_quantity_on_hand AS BIGINT)) AS BIGINT) AS s2
      FROM inventory
      JOIN item ON inv_item_sk = i_item_sk
      JOIN warehouse ON inv_warehouse_sk = w_warehouse_sk
      JOIN date_dim ON inv_date_sk = d_date_sk
      WHERE d_year = 2001
      GROUP BY 1, 2, 3
    ), unstable AS (
      SELECT * FROM moments
      WHERE n > 1 AND s1 > 0 AND 4 * n * (n * s2 - s1 * s1) > (n - 1) * s1 * s1
    )
    SELECT a.w_warehouse_sk, a.i_item_sk, a.d_moy AS moy1, b.d_moy AS moy2,
           a.n AS n1, a.s1 AS sum1, b.n AS n2, b.s1 AS sum2
    FROM unstable a JOIN unstable b
      ON a.w_warehouse_sk = b.w_warehouse_sk
     AND a.i_item_sk = b.i_item_sk
     AND a.d_moy = b.d_moy - 1
    """,
)
def tpcds_q39(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q39 shape: warehouse×item×month inventory positions
    whose coefficient of variation exceeds 1 in two CONSECUTIVE
    months.

    The spec's ``stdev/mean > threshold`` filter is algebra-reduced
    to integers: with sample variance, cov² > 1/4 ⟺
    4·n·(n·Σx² − (Σx)²) > (n−1)·(Σx)² — counts and sums of int
    quantities only, no sqrt, no division, so the unstable set is
    bit-identical across engines (the committed-query discipline:
    thresholds never ride on FP). Threshold 0.5 instead of the
    spec's 1.0: the generator's quantities are uniform (cov ≈ 0.58),
    so cov > 1 selects nothing — 0.5 keeps the filter live on both
    sides of the noise (documented adaptation). One fact rollup
    computes (n, Σx, Σx²) per cell; the consecutive-month pairing is
    a self-join on the rolled-up (tiny) moment table.
    """
    dd = F.broadcast(
        _t(spark, "date_dim").filter(F.col("d_year") == 2001).select("d_date_sk", "d_moy")
    )
    it = F.broadcast(_t(spark, "item").select("i_item_sk"))
    w = F.broadcast(_t(spark, "warehouse").select("w_warehouse_sk"))
    inv = _t(spark, "inventory")
    q = F.col("inv_quantity_on_hand").cast("bigint")
    moments = (
        inv.join(dd, inv.inv_date_sk == dd.d_date_sk)
        .join(it, inv.inv_item_sk == it.i_item_sk)
        .join(w, inv.inv_warehouse_sk == w.w_warehouse_sk)
        .groupBy("w_warehouse_sk", "i_item_sk", "d_moy")
        .agg(
            F.count("inv_quantity_on_hand").alias("n"),
            F.sum(q).alias("s1"),
            F.sum(q * q).alias("s2"),
        )
    )
    unstable = moments.filter(
        (F.col("n") > 1)
        & (F.col("s1") > 0)
        & (
            4 * F.col("n")
            * (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1"))
            > (F.col("n") - 1) * F.col("s1") * F.col("s1")
        )
    )
    a = unstable.select(
        "w_warehouse_sk", "i_item_sk",
        F.col("d_moy").alias("moy1"),
        F.col("n").alias("n1"), F.col("s1").alias("sum1"),
    )
    b = unstable.select(
        F.col("w_warehouse_sk").alias("wb"), F.col("i_item_sk").alias("ib"),
        F.col("d_moy").alias("moy2"),
        F.col("n").alias("n2"), F.col("s1").alias("sum2"),
    )
    return (
        a.join(
            b,
            (a.w_warehouse_sk == b.wb)
            & (a.i_item_sk == b.ib)
            & (a.moy1 == b.moy2 - 1),
        )
        .select(
            "w_warehouse_sk", "i_item_sk", "moy1", "moy2",
            "n1", "sum1", "n2", "sum2",
        )
    )


@query(
    "tpcds_q47_monthly_deviation",
    oracle=_with("store_sales", "date_dim", "item", "store")
    + """
    , monthly AS (
      SELECT i_category, i_brand, s_store_id, d_year, d_moy,
             CAST(SUM(CAST(ss_sales_price * 100 AS BIGINT)) AS BIGINT) AS cents
      FROM store_sales
      JOIN date_dim ON ss_sold_date_sk = d_date_sk
      JOIN item ON ss_item_sk = i_item_sk
      JOIN store ON ss_store_sk = s_store_sk
      WHERE d_year = 2001
      GROUP BY 1, 2, 3, 4, 5
    ), with_stats AS (
      SELECT *,
             CAST(SUM(cents) OVER (PARTITION BY i_category, i_brand, s_store_id, d_year)
                  AS BIGINT) AS year_cents,
             CAST(COUNT(*) OVER (PARTITION BY i_category, i_brand, s_store_id, d_year)
                  AS BIGINT) AS n_months,
             LAG(cents) OVER (PARTITION BY i_category, i_brand, s_store_id
                              ORDER BY d_year, d_moy) AS prev_cents,
             LEAD(cents) OVER (PARTITION BY i_category, i_brand, s_store_id
                               ORDER BY d_year, d_moy) AS next_cents
      FROM monthly
    )
    SELECT i_category, i_brand, s_store_id, d_year, d_moy,
           cents, year_cents, n_months, prev_cents, next_cents
    FROM with_stats
    WHERE year_cents > 0
      AND abs(cents * n_months - year_cents) * 10 > year_cents
    """,
)
def tpcds_q47(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q47 shape: months whose sales deviate >10% from the
    brand-store's yearly mean, with the neighboring months' sales
    alongside (LAG/LEAD).

    Deviation test in exact cents: |m·n − Y|·10 > Y ⟺
    |m − Y/n| > 0.1·Y/n (Y = year total, n = months present) — the
    spec's avg_monthly_sales ratio without ever dividing. The yearly
    aggregates and the lag/lead neighbors share one exchange: the
    (category, brand, store) partitioning satisfies the
    year-partitioned window's clustering too, so the executed plan
    has exactly one wide shuffle past the rollup — two Window
    operators separated only by an in-partition re-sort
    (plan-asserted).
    """
    dd = F.broadcast(
        _t(spark, "date_dim")
        .filter(F.col("d_year") == 2001)
        .select("d_date_sk", "d_year", "d_moy")
    )
    it = F.broadcast(_t(spark, "item").select("i_item_sk", "i_category", "i_brand"))
    st = F.broadcast(_t(spark, "store").select("s_store_sk", "s_store_id"))
    ss = _t(spark, "store_sales")
    monthly = (
        ss.join(dd, ss.ss_sold_date_sk == dd.d_date_sk)
        .join(it, ss.ss_item_sk == it.i_item_sk)
        .join(st, ss.ss_store_sk == st.s_store_sk)
        .groupBy("i_category", "i_brand", "s_store_id", "d_year", "d_moy")
        .agg(F.sum((F.col("ss_sales_price") * 100).cast("bigint")).alias("cents"))
    )
    part = ["i_category", "i_brand", "s_store_id"]
    wy = Window.partitionBy(*part, "d_year")
    wseq = Window.partitionBy(*part).orderBy("d_year", "d_moy")
    stats = monthly.select(
        *part, "d_year", "d_moy", "cents",
        F.sum("cents").over(wy).alias("year_cents"),
        F.count(F.lit(1)).over(wy).alias("n_months"),
        F.lag("cents").over(wseq).alias("prev_cents"),
        F.lead("cents").over(wseq).alias("next_cents"),
    )
    return stats.filter(
        (F.col("year_cents") > 0)
        & (
            F.abs(F.col("cents") * F.col("n_months") - F.col("year_cents")) * 10
            > F.col("year_cents")
        )
    )


@query(
    "tpcds_q51_cumulative_channels",
    oracle=_with("store_sales", "web_sales", "date_dim")
    + """
    , ss_cum AS (
      SELECT ss_item_sk AS item_sk, d_date,
             CAST(SUM(CAST(SUM(CAST(ss_sales_price * 100 AS BIGINT)) AS BIGINT))
                  OVER (PARTITION BY ss_item_sk ORDER BY d_date
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum_cents
      FROM store_sales JOIN date_dim ON ss_sold_date_sk = d_date_sk
      WHERE d_month_seq BETWEEN 1200 AND 1205
      GROUP BY ss_item_sk, d_date
    ), ws_cum AS (
      SELECT ws_item_sk AS item_sk, d_date,
             CAST(SUM(CAST(SUM(CAST(ws_sales_price * 100 AS BIGINT)) AS BIGINT))
                  OVER (PARTITION BY ws_item_sk ORDER BY d_date
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum_cents
      FROM web_sales JOIN date_dim ON ws_sold_date_sk = d_date_sk
      WHERE d_month_seq BETWEEN 1200 AND 1205
      GROUP BY ws_item_sk, d_date
    ), merged AS (
      SELECT COALESCE(s.item_sk, w.item_sk) AS item_sk,
             COALESCE(s.d_date, w.d_date) AS d_date,
             s.cum_cents AS store_cum_raw, w.cum_cents AS web_cum_raw
      FROM ss_cum s FULL OUTER JOIN ws_cum w
        ON s.item_sk = w.item_sk AND s.d_date = w.d_date
    ), filled AS (
      SELECT item_sk, d_date,
             CAST(COALESCE(MAX(store_cum_raw) OVER (
               PARTITION BY item_sk ORDER BY d_date
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS BIGINT)
               AS store_cum,
             CAST(COALESCE(MAX(web_cum_raw) OVER (
               PARTITION BY item_sk ORDER BY d_date
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS BIGINT)
               AS web_cum
      FROM merged
    )
    SELECT item_sk, d_date, store_cum, web_cum
    FROM filled WHERE web_cum > store_cum
    """,
)
def tpcds_q51(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q51 shape: days on which an item's cumulative web
    revenue overtakes its cumulative store revenue.

    Per-channel running totals (window over the daily rollup), FULL
    OUTER merged on (item, day) — each channel has days the other
    lacks — then gap-filled with a running MAX (cumulative sums are
    monotone, so MAX-to-date equals carry-forward) before comparing.
    Cumulative sums stay in integer cents end-to-end. The windows,
    the merge, and the fill all share the (item, date) ordering, so
    the plan is two rollups + one co-partitioned full-outer join +
    one more window pass over the merged stream.
    """
    dd = F.broadcast(
        _t(spark, "date_dim")
        .filter(F.col("d_month_seq").between(1200, 1205))
        .select("d_date_sk", "d_date")
    )

    def cum(fact: DataFrame, item: str, date_col: str, price: str) -> DataFrame:
        daily = (
            fact.join(dd, F.col(date_col) == dd.d_date_sk)
            .groupBy(F.col(item).alias("item_sk"), "d_date")
            .agg(F.sum((F.col(price) * 100).cast("bigint")).alias("day_cents"))
        )
        w = (
            Window.partitionBy("item_sk")
            .orderBy("d_date")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        return daily.select(
            "item_sk", "d_date", F.sum("day_cents").over(w).alias("cum_cents")
        )

    s = cum(_t(spark, "store_sales"), "ss_item_sk", "ss_sold_date_sk", "ss_sales_price")
    ws = cum(_t(spark, "web_sales"), "ws_item_sk", "ws_sold_date_sk", "ws_sales_price")
    wsr = ws.select(
        F.col("item_sk").alias("w_item"), F.col("d_date").alias("w_date"),
        F.col("cum_cents").alias("web_cum_raw"),
    )
    merged = s.join(
        wsr, (s.item_sk == wsr.w_item) & (s.d_date == wsr.w_date), "full_outer"
    ).select(
        F.coalesce(s.item_sk, wsr.w_item).alias("item_sk"),
        F.coalesce(s.d_date, wsr.w_date).alias("d_date"),
        F.col("cum_cents").alias("store_cum_raw"),
        "web_cum_raw",
    )
    wfill = (
        Window.partitionBy("item_sk")
        .orderBy("d_date")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = merged.select(
        "item_sk",
        "d_date",
        F.coalesce(F.max("store_cum_raw").over(wfill), F.lit(0))
        .cast("bigint")
        .alias("store_cum"),
        F.coalesce(F.max("web_cum_raw").over(wfill), F.lit(0))
        .cast("bigint")
        .alias("web_cum"),
    )
    return filled.filter(F.col("web_cum") > F.col("store_cum"))


@query(
    "tpcds_q76_null_key_slices",
    oracle=_with("store_sales", "web_sales", "catalog_sales", "item", "date_dim")
    + """
    , all_slices AS (
      SELECT 'store' AS channel, 'ss_addr_sk' AS col_name,
             d_year, d_qoy, i_category, ss_ext_sales_price AS ext_sales_price
      FROM store_sales
      JOIN item ON ss_item_sk = i_item_sk
      JOIN date_dim ON ss_sold_date_sk = d_date_sk
      WHERE ss_addr_sk IS NULL
      UNION ALL
      SELECT 'web', 'ws_ship_customer_sk',
             d_year, d_qoy, i_category, ws_ext_sales_price
      FROM web_sales
      JOIN item ON ws_item_sk = i_item_sk
      JOIN date_dim ON ws_sold_date_sk = d_date_sk
      WHERE ws_ship_customer_sk IS NULL
      UNION ALL
      SELECT 'catalog', 'cs_ship_mode_sk',
             d_year, d_qoy, i_category, cs_ext_sales_price
      FROM catalog_sales
      JOIN item ON cs_item_sk = i_item_sk
      JOIN date_dim ON cs_sold_date_sk = d_date_sk
      WHERE cs_ship_mode_sk IS NULL
    )
    SELECT channel, col_name, d_year, d_qoy, i_category,
           CAST(COUNT(*) AS BIGINT) AS sales_cnt,
           ROUND(CAST(SUM(CAST(ext_sales_price AS DECIMAL(12,2))) AS DOUBLE), 2)
             AS sales_amt
    FROM all_slices
    GROUP BY 1, 2, 3, 4, 5
    """,
)
def tpcds_q76(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q76 shape: volume sold with a NULL surrogate key, per
    channel — the data-quality audit union.

    Each channel scans with an IS NULL predicate on a different FK
    (pushed to the scan), joins its dims, and unions into one
    aggregation keyed by channel+quarter+category. Partial aggregation
    happens below the union (map-side per leg), so the single wide
    exchange carries pre-combined rows.
    """
    it = F.broadcast(_t(spark, "item").select("i_item_sk", "i_category"))
    dd = F.broadcast(_t(spark, "date_dim").select("d_date_sk", "d_year", "d_qoy"))

    def leg(fact: DataFrame, channel: str, null_col: str, item_col: str,
            date_col: str, price_col: str) -> DataFrame:
        return (
            fact.filter(F.col(null_col).isNull())
            .join(it, F.col(item_col) == it.i_item_sk)
            .join(dd, F.col(date_col) == dd.d_date_sk)
            .select(
                F.lit(channel).alias("channel"),
                F.lit(null_col).alias("col_name"),
                "d_year", "d_qoy", "i_category",
                F.col(price_col).alias("ext_sales_price"),
            )
        )

    legs = (
        leg(_t(spark, "store_sales"), "store", "ss_addr_sk",
            "ss_item_sk", "ss_sold_date_sk", "ss_ext_sales_price")
        .unionByName(
            leg(_t(spark, "web_sales"), "web", "ws_ship_customer_sk",
                "ws_item_sk", "ws_sold_date_sk", "ws_ext_sales_price")
        )
        .unionByName(
            leg(_t(spark, "catalog_sales"), "catalog", "cs_ship_mode_sk",
                "cs_item_sk", "cs_sold_date_sk", "cs_ext_sales_price")
        )
    )
    return legs.groupBy(
        "channel", "col_name", "d_year", "d_qoy", "i_category"
    ).agg(
        F.count(F.lit(1)).alias("sales_cnt"),
        F.round(
            F.sum(F.col("ext_sales_price").cast("decimal(12,2)")).cast("double"), 2
        ).alias("sales_amt"),
    )


@query(
    "tpcds_q97_channel_membership",
    oracle=_with("store_sales", "catalog_sales", "date_dim")
    + """
    , ssci AS (
      SELECT DISTINCT ss_customer_sk AS customer_sk, ss_item_sk AS item_sk
      FROM store_sales JOIN date_dim ON ss_sold_date_sk = d_date_sk
      WHERE d_month_seq BETWEEN 1200 AND 1211 AND ss_customer_sk IS NOT NULL
    ), csci AS (
      SELECT DISTINCT cs_bill_customer_sk AS customer_sk, cs_item_sk AS item_sk
      FROM catalog_sales JOIN date_dim ON cs_sold_date_sk = d_date_sk
      WHERE d_month_seq BETWEEN 1200 AND 1211 AND cs_bill_customer_sk IS NOT NULL
    )
    SELECT
      CAST(SUM(CASE WHEN s.customer_sk IS NOT NULL AND c.customer_sk IS NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS store_only,
      CAST(SUM(CASE WHEN s.customer_sk IS NULL AND c.customer_sk IS NOT NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS catalog_only,
      CAST(SUM(CASE WHEN s.customer_sk IS NOT NULL AND c.customer_sk IS NOT NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS store_and_catalog
    FROM ssci s FULL OUTER JOIN csci c
      ON s.customer_sk = c.customer_sk AND s.item_sk = c.item_sk
    """,
)
def tpcds_q97(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q97 shape: (customer, item) pairs bought in-store only,
    by catalog only, or both — set membership counted through one
    FULL OUTER join.

    The relational way to count a Venn diagram without three separate
    INTERSECT/EXCEPT passes: distinct pairs per channel, one
    co-partitioned full outer join, conditional counts over the null
    pattern. Both DISTINCTs and the join shuffle on the same composite
    key, so AQE reuses the partitioning end-to-end.
    """
    dd = F.broadcast(
        _t(spark, "date_dim")
        .filter(F.col("d_month_seq").between(1200, 1211))
        .select("d_date_sk")
    )
    ss = (
        _t(spark, "store_sales")
        .join(dd, F.col("ss_sold_date_sk") == dd.d_date_sk)
        .filter(F.col("ss_customer_sk").isNotNull())
        .select(
            F.col("ss_customer_sk").alias("s_cust"),
            F.col("ss_item_sk").alias("s_item"),
        )
        .distinct()
    )
    cs = (
        _t(spark, "catalog_sales")
        .join(dd, F.col("cs_sold_date_sk") == dd.d_date_sk)
        .filter(F.col("cs_bill_customer_sk").isNotNull())
        .select(
            F.col("cs_bill_customer_sk").alias("c_cust"),
            F.col("cs_item_sk").alias("c_item"),
        )
        .distinct()
    )
    joined = ss.join(
        cs, (ss.s_cust == cs.c_cust) & (ss.s_item == cs.c_item), "full_outer"
    )
    return joined.agg(
        F.sum(
            F.when(F.col("s_cust").isNotNull() & F.col("c_cust").isNull(), 1)
            .otherwise(0)
        ).cast("bigint").alias("store_only"),
        F.sum(
            F.when(F.col("s_cust").isNull() & F.col("c_cust").isNotNull(), 1)
            .otherwise(0)
        ).cast("bigint").alias("catalog_only"),
        F.sum(
            F.when(F.col("s_cust").isNotNull() & F.col("c_cust").isNotNull(), 1)
            .otherwise(0)
        ).cast("bigint").alias("store_and_catalog"),
    )


@query(
    "tpcds_q14_cross_channel_intersect",
    oracle=_with("store_sales", "catalog_sales", "web_sales", "item", "date_dim")
    + """
    , triples AS (
      SELECT i_brand_id, i_class_id, i_category_id
      FROM store_sales JOIN item ON ss_item_sk = i_item_sk
      INTERSECT
      SELECT i_brand_id, i_class_id, i_category_id
      FROM catalog_sales JOIN item ON cs_item_sk = i_item_sk
      INTERSECT
      SELECT i_brand_id, i_class_id, i_category_id
      FROM web_sales JOIN item ON ws_item_sk = i_item_sk
    ), cross_items AS (
      SELECT i_item_sk FROM item
      JOIN triples USING (i_brand_id, i_class_id, i_category_id)
    ), totals AS (
      SELECT CAST(SUM(cents) AS BIGINT) AS total_cents,
             CAST(COUNT(*) AS BIGINT) AS total_n
      FROM (
        SELECT CAST(ss_quantity * ss_list_price * 100 AS BIGINT) AS cents
        FROM store_sales
        UNION ALL
        SELECT CAST(cs_quantity * cs_list_price * 100 AS BIGINT)
        FROM catalog_sales
        UNION ALL
        SELECT CAST(ws_quantity * ws_list_price * 100 AS BIGINT)
        FROM web_sales
      )
    ), legs AS (
      SELECT 'store' AS channel, i_brand_id, i_class_id, i_category_id,
             CAST(SUM(CAST(ss_quantity * ss_list_price * 100 AS BIGINT))
                  AS BIGINT) AS sales_cents,
             CAST(COUNT(*) AS BIGINT) AS number_sales
      FROM store_sales
      JOIN item ON ss_item_sk = i_item_sk
      JOIN date_dim ON ss_sold_date_sk = d_date_sk
      WHERE ss_item_sk IN (SELECT i_item_sk FROM cross_items) AND d_year = 2001
      GROUP BY 2, 3, 4
      UNION ALL
      SELECT 'catalog', i_brand_id, i_class_id, i_category_id,
             CAST(SUM(CAST(cs_quantity * cs_list_price * 100 AS BIGINT))
                  AS BIGINT),
             CAST(COUNT(*) AS BIGINT)
      FROM catalog_sales
      JOIN item ON cs_item_sk = i_item_sk
      JOIN date_dim ON cs_sold_date_sk = d_date_sk
      WHERE cs_item_sk IN (SELECT i_item_sk FROM cross_items) AND d_year = 2001
      GROUP BY 2, 3, 4
      UNION ALL
      SELECT 'web', i_brand_id, i_class_id, i_category_id,
             CAST(SUM(CAST(ws_quantity * ws_list_price * 100 AS BIGINT))
                  AS BIGINT),
             CAST(COUNT(*) AS BIGINT)
      FROM web_sales
      JOIN item ON ws_item_sk = i_item_sk
      JOIN date_dim ON ws_sold_date_sk = d_date_sk
      WHERE ws_item_sk IN (SELECT i_item_sk FROM cross_items) AND d_year = 2001
      GROUP BY 2, 3, 4
    )
    SELECT channel, i_brand_id,
           CAST(GROUPING(channel) AS BIGINT) AS g_channel,
           CAST(GROUPING(i_brand_id) AS BIGINT) AS g_brand,
           CAST(SUM(sales_cents) AS BIGINT) AS sum_cents,
           CAST(SUM(number_sales) AS BIGINT) AS n_sales
    FROM legs CROSS JOIN totals
    WHERE sales_cents * total_n > total_cents
    GROUP BY ROLLUP(channel, i_brand_id)
    """,
)
def tpcds_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q14 shape (lite): items sold through ALL THREE channels
    (set INTERSECT of brand/class/category triples), each channel's
    above-average sales on those items rolled up.

    Exercises native ``DataFrame.intersect`` (INTERSECT DISTINCT —
    Spark plans it as an aggregate-wrapped left-semi chain), a scalar
    threshold joined as a one-row broadcast, and the spec's
    "avg_sales" HAVING reduced to exact cents:
    group_sum·N_total > total_cents ⟺ group_sum > avg. The triple
    intersect deduplicates BEFORE joining back to items, so the
    cross-channel membership test never touches fact-table
    cardinalities twice.
    """
    it = F.broadcast(
        _t(spark, "item").select(
            "i_item_sk", "i_brand_id", "i_class_id", "i_category_id"
        )
    )
    dd = F.broadcast(
        _t(spark, "date_dim").filter(F.col("d_year") == 2001).select("d_date_sk")
    )
    ss = _t(spark, "store_sales")
    cs = _t(spark, "catalog_sales")
    ws = _t(spark, "web_sales")
    trip = ["i_brand_id", "i_class_id", "i_category_id"]

    def sold_triples(fact: DataFrame, item_col: str) -> DataFrame:
        # Reduce the fact to its DISTINCT item keys FIRST (map-side
        # combinable int column → ≤ |items| rows survive the shuffle),
        # then map keys to triples through the broadcast item dim. The
        # intersect inputs are item-dimension-sized, never fact-sized —
        # at 100 TB this is the difference between shuffling billions of
        # 3-column rows and thousands.
        sks = fact.select(F.col(item_col).alias("sk")).distinct()
        return sks.join(it, F.col("sk") == it.i_item_sk).select(*trip)

    # r9 A/B NEGATIVE result: collapsing this 3-distinct + 2-intersect
    # chain into one union+flag aggregation (the q38/q87 win) measured
    # 5.6% SLOWER here — the per-fact DISTINCT pre-reduces each fact to
    # cheap int keys map-side before any triple is materialized, while
    # the flag form drags every fact row through the item join and a
    # 3-column groupBy. Pre-reduce-then-intersect stays.
    triples = (
        sold_triples(ss, "ss_item_sk")
        .intersect(sold_triples(cs, "cs_item_sk"))
        .intersect(sold_triples(ws, "ws_item_sk"))
    )
    # All three legs gate on this item-dimension-sized set; checkpoint
    # it once so the 3-scan distinct+intersect chain behind it runs
    # once, not once per leg (exchange reuse does not cover the three
    # separately-built broadcast sides). eager=False: materialize on
    # first action, not at DataFrame-construction time — plan-only
    # tests must not run Spark jobs.
    cross_items = (
        it.join(triples, trip).select("i_item_sk").transform(maybe_local_checkpoint)
    )

    def cents(q: str, p: str) -> F.Column:
        return (F.col(q) * F.col(p) * 100).cast("bigint")

    totals = (
        ss.select(cents("ss_quantity", "ss_list_price").alias("c"))
        .unionByName(cs.select(cents("cs_quantity", "cs_list_price").alias("c")))
        .unionByName(ws.select(cents("ws_quantity", "ws_list_price").alias("c")))
        .agg(
            F.sum("c").alias("total_cents"),
            F.count(F.lit(1)).alias("total_n"),
        )
    )

    def leg(fact: DataFrame, channel: str, item_col: str, date_col: str,
            q: str, p: str) -> DataFrame:
        return (
            fact.join(
                F.broadcast(cross_items),
                F.col(item_col) == cross_items.i_item_sk,
                "left_semi",
            )
            .join(it, F.col(item_col) == it.i_item_sk)
            .join(dd, F.col(date_col) == dd.d_date_sk)
            .groupBy(*trip)
            .agg(
                F.sum(cents(q, p)).alias("sales_cents"),
                F.count(F.lit(1)).alias("number_sales"),
            )
            .select(F.lit(channel).alias("channel"), *trip,
                    "sales_cents", "number_sales")
        )

    legs = (
        leg(ss, "store", "ss_item_sk", "ss_sold_date_sk",
            "ss_quantity", "ss_list_price")
        .unionByName(
            leg(cs, "catalog", "cs_item_sk", "cs_sold_date_sk",
                "cs_quantity", "cs_list_price")
        )
        .unionByName(
            leg(ws, "web", "ws_item_sk", "ws_sold_date_sk",
                "ws_quantity", "ws_list_price")
        )
    )
    return (
        legs.crossJoin(F.broadcast(totals))
        .filter(F.col("sales_cents") * F.col("total_n") > F.col("total_cents"))
        .rollup("channel", "i_brand_id")
        .agg(
            F.grouping("channel").cast("bigint").alias("g_channel"),
            F.grouping("i_brand_id").cast("bigint").alias("g_brand"),
            F.sum("sales_cents").alias("sum_cents"),
            F.sum("number_sales").alias("n_sales"),
        )
        .select("channel", "i_brand_id", "g_channel", "g_brand",
                "sum_cents", "n_sales")
    )


@query(
    "tpcds_q49_return_ratios",
    oracle=_with(
        "store_sales", "store_returns", "web_sales", "web_returns", "item"
    )
    + """
    , legs AS (
      SELECT 'store' AS channel, ss_item_sk AS item_sk,
             CAST(SUM(CAST(ss_quantity AS BIGINT)) AS BIGINT) AS sold_qty,
             CAST(SUM(CAST(COALESCE(sr_return_quantity, 0) AS BIGINT)) AS BIGINT)
               AS ret_qty
      FROM store_sales
      LEFT JOIN store_returns
        ON ss_item_sk = sr_item_sk AND ss_ticket_number = sr_ticket_number
      GROUP BY ss_item_sk
      UNION ALL
      SELECT 'web', ws_item_sk,
             CAST(SUM(CAST(ws_quantity AS BIGINT)) AS BIGINT),
             CAST(SUM(CAST(COALESCE(wr_return_quantity, 0) AS BIGINT)) AS BIGINT)
      FROM web_sales
      LEFT JOIN web_returns
        ON ws_item_sk = wr_item_sk AND ws_order_number = wr_order_number
      GROUP BY ws_item_sk
    ), ranked AS (
      SELECT channel, item_sk, sold_qty, ret_qty,
             CAST(ret_qty AS DOUBLE) / sold_qty AS return_ratio,
             ROW_NUMBER() OVER (PARTITION BY channel
                                ORDER BY CAST(ret_qty AS DOUBLE) / sold_qty DESC,
                                         item_sk) AS rk
      FROM legs WHERE sold_qty > 0
    )
    SELECT channel, item_sk, sold_qty, ret_qty,
           CAST(floor(return_ratio * 10000) AS DOUBLE) / 10000 AS return_ratio,
           CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 10
    """,
)
def tpcds_q49(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q49 shape: each channel's worst items by return ratio.

    Sales joined to returns on the composite natural key (item +
    ticket/order), per-item quantity totals, ranked within channel by
    return ratio. The ORDER BY rides a ratio, which is safe here
    because numerator and denominator are exact int64 quantity sums:
    both engines divide identical integers, IEEE division is
    deterministic, so the rank order (tie-broken by item) cannot
    diverge — ratios only become truncated DISPLAY values after
    ranking. The sales↔returns joins are fact-to-fact on the same
    composite key Q93 uses (shuffle join at scale); ranking input is
    the per-item rollup, which is item-cardinality, not fact-sized.
    """
    from pyspark.sql.window import Window as W

    ss = _t(spark, "store_sales")
    sr = _t(spark, "store_returns").select(
        "sr_item_sk", "sr_ticket_number", "sr_return_quantity"
    )
    ws = _t(spark, "web_sales")
    wr = _t(spark, "web_returns").select(
        "wr_item_sk", "wr_order_number", "wr_return_quantity"
    )
    store_leg = (
        ss.join(
            sr,
            (ss.ss_item_sk == sr.sr_item_sk)
            & (ss.ss_ticket_number == sr.sr_ticket_number),
            "left",
        )
        .groupBy(F.col("ss_item_sk").alias("item_sk"))
        .agg(
            F.sum(F.col("ss_quantity").cast("bigint")).alias("sold_qty"),
            F.sum(
                F.coalesce(F.col("sr_return_quantity"), F.lit(0)).cast("bigint")
            ).alias("ret_qty"),
        )
        .select(F.lit("store").alias("channel"), "item_sk", "sold_qty", "ret_qty")
    )
    web_leg = (
        ws.join(
            wr,
            (ws.ws_item_sk == wr.wr_item_sk)
            & (ws.ws_order_number == wr.wr_order_number),
            "left",
        )
        .groupBy(F.col("ws_item_sk").alias("item_sk"))
        .agg(
            F.sum(F.col("ws_quantity").cast("bigint")).alias("sold_qty"),
            F.sum(
                F.coalesce(F.col("wr_return_quantity"), F.lit(0)).cast("bigint")
            ).alias("ret_qty"),
        )
        .select(F.lit("web").alias("channel"), "item_sk", "sold_qty", "ret_qty")
    )
    legs = store_leg.unionByName(web_leg).filter(F.col("sold_qty") > 0)
    ratio = F.col("ret_qty").cast("double") / F.col("sold_qty")
    w = W.partitionBy("channel").orderBy(ratio.desc(), "item_sk")
    return (
        legs.withColumn("return_ratio", ratio)
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= 10)
        .select(
            "channel", "item_sk", "sold_qty", "ret_qty",
            (F.floor(F.col("return_ratio") * 10000) / 10000).alias("return_ratio"),
            "rk",
        )
    )


@query(
    "tpcds_q23_frequent_best",
    oracle=_with("store_sales", "catalog_sales", "web_sales", "date_dim", "item")
    + """
    , frequent_items AS (
      SELECT i_item_sk FROM (
        SELECT ss_item_sk AS i_item_sk, d_year, d_moy, COUNT(*) AS cnt
        FROM store_sales JOIN date_dim ON ss_sold_date_sk = d_date_sk
        GROUP BY 1, 2, 3
      ) WHERE cnt >= 4
      GROUP BY i_item_sk
    ), cust_totals AS (
      SELECT ss_customer_sk AS cust,
             CAST(SUM(CAST(ss_quantity * ss_sales_price * 100 AS BIGINT))
                  AS BIGINT) AS cents
      FROM store_sales WHERE ss_customer_sk IS NOT NULL
      GROUP BY 1
    ), max_total AS (
      SELECT CAST(MAX(cents) AS BIGINT) AS max_cents FROM cust_totals
    ), best_customers AS (
      SELECT cust FROM cust_totals CROSS JOIN max_total
      WHERE cents * 2 > max_cents
    )
    SELECT
      CAST(SUM(CASE WHEN src = 'catalog' THEN cents ELSE 0 END) AS BIGINT)
        AS catalog_cents,
      CAST(SUM(CASE WHEN src = 'web' THEN cents ELSE 0 END) AS BIGINT)
        AS web_cents,
      CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM (
      SELECT 'catalog' AS src,
             CAST(cs_quantity * cs_list_price * 100 AS BIGINT) AS cents
      FROM catalog_sales JOIN date_dim ON cs_sold_date_sk = d_date_sk
      WHERE d_year = 2001 AND d_moy = 3
        AND cs_item_sk IN (SELECT i_item_sk FROM frequent_items)
        AND cs_bill_customer_sk IN (SELECT cust FROM best_customers)
      UNION ALL
      SELECT 'web', CAST(ws_quantity * ws_list_price * 100 AS BIGINT)
      FROM web_sales JOIN date_dim ON ws_sold_date_sk = d_date_sk
      WHERE d_year = 2001 AND d_moy = 3
        AND ws_item_sk IN (SELECT i_item_sk FROM frequent_items)
        AND ws_bill_customer_sk IN (SELECT cust FROM best_customers)
    )
    """,
)
def tpcds_q23(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q23 shape (lite): remote-channel revenue in one month
    from FREQUENT items bought by the BEST store customers.

    The two famous derived sets composed: frequently-sold items
    (item×month counts over a threshold — spec uses item×date with
    dsdgen's skew; the generator's uniform dates make months the
    equivalent grain, documented) and top customers (spent more than
    half the maximum spender — the spec's 95th-percentile cut done as
    an exact-cents comparison against a one-row MAX broadcast,
    cents·2 > max). Both sets are small, so the month's catalog/web
    scans semi-join against two broadcasts — at 100 TB this is two
    map-side IN-filters over the fact partition-pruned to one month,
    no wide shuffle at all until the final one-row total.
    """
    dd_all = F.broadcast(
        _t(spark, "date_dim").select("d_date_sk", "d_year", "d_moy")
    )
    ss = _t(spark, "store_sales")
    # Both derived sets gate BOTH remote-channel legs; checkpoint them
    # once so the store_sales aggregation passes behind them run once,
    # not once per leg. cust_totals additionally feeds its own MAX
    # anchor, which would otherwise re-aggregate store_sales a third
    # time. All three checkpoints are derived-set-sized (item ids /
    # per-customer rows), never fact-sized.
    freq = (
        ss.join(dd_all, ss.ss_sold_date_sk == dd_all.d_date_sk)
        .groupBy(
            F.col("ss_item_sk").alias("i_item_sk"), "d_year", "d_moy"
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 4)
        .select("i_item_sk")
        .distinct()
        .transform(maybe_local_checkpoint)
    )
    cust_totals = (
        ss.filter(F.col("ss_customer_sk").isNotNull())
        .groupBy(F.col("ss_customer_sk").alias("cust"))
        .agg(
            F.sum(
                (F.col("ss_quantity") * F.col("ss_sales_price") * 100).cast("bigint")
            ).alias("cents")
        )
        .transform(maybe_local_checkpoint)
    )
    max_total = cust_totals.agg(F.max("cents").alias("max_cents"))
    best = (
        cust_totals.crossJoin(F.broadcast(max_total))
        .filter(F.col("cents") * 2 > F.col("max_cents"))
        .select("cust")
        .transform(maybe_local_checkpoint)
    )
    dd_m = F.broadcast(
        _t(spark, "date_dim")
        .filter((F.col("d_year") == 2001) & (F.col("d_moy") == 3))
        .select("d_date_sk")
    )

    def leg(fact: DataFrame, src: str, item_col: str, cust_col: str,
            date_col: str, q: str, p: str) -> DataFrame:
        return (
            fact.join(dd_m, F.col(date_col) == dd_m.d_date_sk)
            .join(F.broadcast(freq), F.col(item_col) == freq.i_item_sk, "left_semi")
            .join(best, F.col(cust_col) == best.cust, "left_semi")
            .select(
                F.lit(src).alias("src"),
                (F.col(q) * F.col(p) * 100).cast("bigint").alias("cents"),
            )
        )

    lines = leg(
        _t(spark, "catalog_sales"), "catalog", "cs_item_sk",
        "cs_bill_customer_sk", "cs_sold_date_sk", "cs_quantity", "cs_list_price",
    ).unionByName(
        leg(
            _t(spark, "web_sales"), "web", "ws_item_sk",
            "ws_bill_customer_sk", "ws_sold_date_sk", "ws_quantity",
            "ws_list_price",
        )
    )
    return lines.agg(
        F.sum(F.when(F.col("src") == "catalog", F.col("cents")).otherwise(0))
        .cast("bigint")
        .alias("catalog_cents"),
        F.sum(F.when(F.col("src") == "web", F.col("cents")).otherwise(0))
        .cast("bigint")
        .alias("web_cents"),
        F.count(F.lit(1)).alias("n_lines"),
    )
