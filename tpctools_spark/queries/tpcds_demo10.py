"""TPC-DS shapes, final tier: Q54 (remote-buyer store-revenue
segments), Q64 (the cross-sales two-year item chain), Q77 (per-channel
profit & loss rollup), Q78 (unreturned-sales channel ratios),
Q80 (promotion-gated channel rollup with line-grain return netting),
Q85 (web-return reason profile under coupled brackets).

Completes the 99-query TPC-DS surface: every spec query number now has
a registered, oracle-checked shape. The heavyweights here compose the
family's proven pieces — composite-key fact⋈returns joins, channel
unions with rollups, derived-set semi gates, bracket residuals — into
their largest spec configurations. Oracle scheme as
:mod:`tpcds_demo`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tpctools_spark.queries.tpcds_demo import _t, _with
from tpctools_spark.registry import query


@query(
    "tpcds_q54_revenue_segments",
    oracle=_with(
        "catalog_sales", "web_sales", "store_sales", "item", "date_dim"
    )
    + """
    , targets AS (
      SELECT DISTINCT cust FROM (
        SELECT cs_bill_customer_sk AS cust
        FROM catalog_sales
        JOIN item ON cs_item_sk = i_item_sk
        JOIN date_dim ON cs_sold_date_sk = d_date_sk
        WHERE i_category = 'Sports' AND d_year = 2001
        UNION ALL
        SELECT ws_bill_customer_sk
        FROM web_sales
        JOIN item ON ws_item_sk = i_item_sk
        JOIN date_dim ON ws_sold_date_sk = d_date_sk
        WHERE i_category = 'Sports' AND d_year = 2001
      ) t
    ), revenue AS (
      SELECT ss_customer_sk,
             CAST(SUM(CAST(ss_ext_sales_price * 100 AS BIGINT)) AS BIGINT)
               AS cents
      FROM store_sales
      JOIN date_dim ON ss_sold_date_sk = d_date_sk
      WHERE d_year = 2001
        AND ss_customer_sk IN (SELECT cust FROM targets)
      GROUP BY 1
    )
    SELECT CAST(cents // 5000 AS BIGINT) AS segment,
           CAST(COUNT(*) AS BIGINT) AS num_customers
    FROM revenue
    GROUP BY 1
    """,
)
def tpcds_q54(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q54 shape: customers who bought the target category
    remotely, histogrammed by their store-revenue $50 segments.

    Three stages, each one exchange: the remote-buyer target set (a
    two-channel union, DISTINCT on the customer key), the store
    revenue per targeted customer (semi join gates the fact scan
    BEFORE the aggregate), and the $50-segment histogram (integer
    division of exact cents — 5000-cent buckets — so segment
    boundaries cannot ride on FP). The spec's ±month window widens to
    the year for generator density (documented).
    """
    dd = F.broadcast(
        _t(spark, "date_dim").filter(F.col("d_year") == 2001).select("d_date_sk")
    )
    it = F.broadcast(
        _t(spark, "item")
        .filter(F.col("i_category") == "Sports")
        .select("i_item_sk")
    )

    def remote(fact: str, pfx: str, cust: str) -> DataFrame:
        f_ = _t(spark, fact)
        return (
            f_.join(it, F.col(f"{pfx}_item_sk") == it.i_item_sk)
            .join(dd, F.col(f"{pfx}_sold_date_sk") == dd.d_date_sk)
            .select(F.col(cust).alias("cust"))
        )

    targets = (
        remote("catalog_sales", "cs", "cs_bill_customer_sk")
        .unionByName(remote("web_sales", "ws", "ws_bill_customer_sk"))
        .distinct()
    )
    ss = _t(spark, "store_sales")
    revenue = (
        ss.join(dd, ss.ss_sold_date_sk == dd.d_date_sk)
        .join(targets, ss.ss_customer_sk == targets.cust, "left_semi")
        .groupBy("ss_customer_sk")
        .agg(
            F.sum((F.col("ss_ext_sales_price") * 100).cast("bigint")).alias("cents")
        )
    )
    return (
        revenue.select(F.floor(F.col("cents") / F.lit(5000)).cast("bigint").alias("segment"))
        .groupBy("segment")
        .agg(F.count(F.lit(1)).cast("bigint").alias("num_customers"))
    )


@query(
    "tpcds_q64_cross_sales_yoy",
    oracle=_with(
        "store_sales", "store_returns", "customer", "item", "date_dim"
    )
    + """
    , cross_sales AS (
      SELECT i_item_id AS item_id, d_year,
             CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(CAST(ss_sales_price * 100 AS BIGINT)) AS BIGINT)
               AS price_cents,
             CAST(SUM(CAST(ss_ext_list_price * 100 AS BIGINT)) AS BIGINT)
               AS list_cents
      FROM store_sales
      JOIN store_returns ON ss_ticket_number = sr_ticket_number
                        AND ss_item_sk = sr_item_sk
      JOIN customer ON ss_customer_sk = c_customer_sk
      JOIN item ON ss_item_sk = i_item_sk
      JOIN date_dim ON ss_sold_date_sk = d_date_sk
      WHERE d_year IN (2000, 2001)
      GROUP BY 1, 2
    )
    SELECT y1.item_id,
           y1.cnt AS cnt_2000, y2.cnt AS cnt_2001,
           y1.price_cents AS price_2000, y2.price_cents AS price_2001,
           y1.list_cents AS list_2000, y2.list_cents AS list_2001
    FROM cross_sales y1
    JOIN cross_sales y2 ON y1.item_id = y2.item_id
    WHERE y1.d_year = 2000 AND y2.d_year = 2001
      AND y2.cnt <= y1.cnt
    """,
)
def tpcds_q64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q64 shape: the cross-sales CTE instantiated for two
    years and self-joined on the item, keeping items whose
    returned-sale count did not grow.

    The spec's full chain resolves the customer through address,
    demographics, household, and income band in both instantiations;
    the generator's independent surrogate draws make those hops
    no-op row multipliers here, so the chain keeps its load-bearing
    hops — the sold⋈returned composite-key join, customer and item
    resolution, per-(item, year) aggregation, and the year1×year2
    self-join with the spec's cnt₂ ≤ cnt₁ gate (documented
    reduction). The CTE materializes once and feeds both sides of
    the self-join.
    """
    cust = _t(spark, "customer").select("c_customer_sk")
    it = F.broadcast(_t(spark, "item").select("i_item_sk", "i_item_id"))
    dd = F.broadcast(
        _t(spark, "date_dim")
        .filter(F.col("d_year").isin(2000, 2001))
        .select("d_date_sk", "d_year")
    )
    ss = _t(spark, "store_sales").select(
        "ss_ticket_number", "ss_item_sk", "ss_customer_sk", "ss_sold_date_sk",
        "ss_sales_price", "ss_ext_list_price",
    )
    sr = _t(spark, "store_returns").select("sr_ticket_number", "sr_item_sk")
    # Date-first reorder (same shuffle-volume rule as q75/q78/q80):
    # the broadcast 2-year filter runs before the composite-key
    # sold⋈returned hop, so ~2/3 of store_sales rows never enter the
    # wide exchange. Inner joins — value-neutral reorder.
    cross_sales = (
        ss.join(dd, ss.ss_sold_date_sk == dd.d_date_sk)
        .join(
            sr,
            (ss.ss_ticket_number == sr.sr_ticket_number)
            & (ss.ss_item_sk == sr.sr_item_sk),
        )
        .join(cust, ss.ss_customer_sk == cust.c_customer_sk)
        .join(it, ss.ss_item_sk == it.i_item_sk)
        .groupBy(F.col("i_item_id").alias("item_id"), "d_year")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            F.sum((F.col("ss_sales_price") * 100).cast("bigint")).alias(
                "price_cents"
            ),
            F.sum((F.col("ss_ext_list_price") * 100).cast("bigint")).alias(
                "list_cents"
            ),
        )
    )
    y1 = cross_sales.filter(F.col("d_year") == 2000).select(
        F.col("item_id").alias("id1"), F.col("cnt").alias("cnt_2000"),
        F.col("price_cents").alias("price_2000"),
        F.col("list_cents").alias("list_2000"),
    )
    y2 = cross_sales.filter(F.col("d_year") == 2001).select(
        "item_id", F.col("cnt").alias("cnt_2001"),
        F.col("price_cents").alias("price_2001"),
        F.col("list_cents").alias("list_2001"),
    )
    return (
        y1.join(y2, y1.id1 == y2.item_id)
        .filter(F.col("cnt_2001") <= F.col("cnt_2000"))
        .select(
            "item_id", "cnt_2000", "cnt_2001",
            "price_2000", "price_2001", "list_2000", "list_2001",
        )
    )


@query(
    "tpcds_q77_channel_profit_loss",
    oracle=_with(
        "store_sales", "store_returns", "catalog_sales", "catalog_returns",
        "web_sales", "web_returns", "date_dim"
    )
    + """
    , legs AS (
      SELECT 'store' AS channel,
             CAST(SUM(CAST(ss_net_profit * 100 AS BIGINT)) AS BIGINT) AS profit,
             CAST(0 AS BIGINT) AS loss
      FROM store_sales JOIN date_dim ON ss_sold_date_sk = d_date_sk
      WHERE d_year = 2001
      UNION ALL
      SELECT 'store', CAST(0 AS BIGINT),
             CAST(SUM(CAST(sr_net_loss * 100 AS BIGINT)) AS BIGINT)
      FROM store_returns JOIN date_dim ON sr_returned_date_sk = d_date_sk
      WHERE d_year = 2001
      UNION ALL
      SELECT 'catalog',
             CAST(SUM(CAST(cs_net_profit * 100 AS BIGINT)) AS BIGINT),
             CAST(0 AS BIGINT)
      FROM catalog_sales JOIN date_dim ON cs_sold_date_sk = d_date_sk
      WHERE d_year = 2001
      UNION ALL
      SELECT 'catalog', CAST(0 AS BIGINT),
             CAST(SUM(CAST(cr_net_loss * 100 AS BIGINT)) AS BIGINT)
      FROM catalog_returns JOIN date_dim ON cr_returned_date_sk = d_date_sk
      WHERE d_year = 2001
      UNION ALL
      SELECT 'web',
             CAST(SUM(CAST(ws_net_profit * 100 AS BIGINT)) AS BIGINT),
             CAST(0 AS BIGINT)
      FROM web_sales JOIN date_dim ON ws_sold_date_sk = d_date_sk
      WHERE d_year = 2001
      UNION ALL
      SELECT 'web', CAST(0 AS BIGINT),
             CAST(SUM(CAST(wr_net_loss * 100 AS BIGINT)) AS BIGINT)
      FROM web_returns JOIN date_dim ON wr_returned_date_sk = d_date_sk
      WHERE d_year = 2001
    )
    SELECT channel,
           CAST(SUM(profit) AS BIGINT) AS profit_cents,
           CAST(SUM(loss) AS BIGINT) AS loss_cents,
           CAST(SUM(profit) - SUM(loss) AS BIGINT) AS net_cents
    FROM legs
    GROUP BY ROLLUP(channel)
    """,
)
def tpcds_q77(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q77 shape: profit and return-loss per channel with a
    grand-total ROLLUP.

    Six aggregate legs (sales profit + returns loss × three channels)
    union into the channel rollup — each leg collapses to one row
    before the union, so the rollup's input is six rows regardless of
    fact size. The spec also breaks out per-entity (store/page) rows;
    the generator materializes one entity per channel, so the entity
    grain is degenerate and the channel grain carries the shape
    (documented).
    """
    dd = F.broadcast(
        _t(spark, "date_dim").filter(F.col("d_year") == 2001).select("d_date_sk")
    )

    def leg(fact, date_col, channel, profit_col, loss_col):
        f_ = _t(spark, fact)
        profit = (
            F.sum((F.col(profit_col) * 100).cast("bigint"))
            if profit_col else F.lit(0).cast("bigint")
        )
        loss = (
            F.sum((F.col(loss_col) * 100).cast("bigint"))
            if loss_col else F.lit(0).cast("bigint")
        )
        return (
            f_.join(dd, F.col(date_col) == dd.d_date_sk)
            .agg(profit.alias("profit"), loss.alias("loss"))
            .select(F.lit(channel).alias("channel"), "profit", "loss")
        )

    legs = (
        leg("store_sales", "ss_sold_date_sk", "store", "ss_net_profit", None)
        .unionByName(
            leg("store_returns", "sr_returned_date_sk", "store", None, "sr_net_loss")
        )
        .unionByName(
            leg("catalog_sales", "cs_sold_date_sk", "catalog", "cs_net_profit", None)
        )
        .unionByName(
            leg("catalog_returns", "cr_returned_date_sk", "catalog", None,
                "cr_net_loss")
        )
        .unionByName(
            leg("web_sales", "ws_sold_date_sk", "web", "ws_net_profit", None)
        )
        .unionByName(
            leg("web_returns", "wr_returned_date_sk", "web", None, "wr_net_loss")
        )
    )
    return (
        legs.rollup("channel")
        .agg(
            F.sum("profit").cast("bigint").alias("profit_cents"),
            F.sum("loss").cast("bigint").alias("loss_cents"),
            (F.sum("profit") - F.sum("loss")).cast("bigint").alias("net_cents"),
        )
    )


@query(
    "tpcds_q78_unreturned_channel_ratio",
    oracle=_with(
        "store_sales", "store_returns", "web_sales", "web_returns", "date_dim"
    )
    + """
    , ss_clean AS (
      SELECT d_year, ss_item_sk AS item, ss_customer_sk AS cust,
             CAST(SUM(CAST(ss_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM store_sales
      JOIN date_dim ON ss_sold_date_sk = d_date_sk
      WHERE NOT EXISTS (SELECT 1 FROM store_returns
                        WHERE sr_ticket_number = ss_ticket_number
                          AND sr_item_sk = ss_item_sk)
        AND d_year = 2001
      GROUP BY 1, 2, 3
    ), ws_clean AS (
      SELECT d_year, ws_item_sk AS item, ws_bill_customer_sk AS cust,
             CAST(SUM(CAST(ws_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM web_sales
      JOIN date_dim ON ws_sold_date_sk = d_date_sk
      WHERE NOT EXISTS (SELECT 1 FROM web_returns
                        WHERE wr_order_number = ws_order_number
                          AND wr_item_sk = ws_item_sk)
        AND d_year = 2001
      GROUP BY 1, 2, 3
    )
    SELECT s.d_year, s.item, s.cust,
           s.qty AS store_qty, w.qty AS web_qty
    FROM ss_clean s
    JOIN ws_clean w ON s.item = w.item AND s.cust = w.cust
                   AND s.d_year = w.d_year
    WHERE w.qty > 0
    """,
)
def tpcds_q78(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q78 shape: unreturned store vs web quantities per
    (item, customer, year).

    Each channel's CTE anti-joins its returns on the composite line
    key (the "never returned" gate), aggregates at (item, customer),
    and the channels join on that same composite key — three
    exchanges total, all on aligned keys, so AQE co-partitions the
    final join. The spec's third (catalog) leg repeats the identical
    pattern and its join leaves the result empty at the materialized
    scale (documented reduction to the two live channels).
    """
    dd = F.broadcast(
        _t(spark, "date_dim")
        .filter(F.col("d_year") == 2001)
        .select("d_date_sk", "d_year")
    )
    ss = _t(spark, "store_sales")
    sr = _t(spark, "store_returns").select("sr_ticket_number", "sr_item_sk")
    # Date-first reorder (same shuffle-volume rule as q75): the
    # broadcast 1-year filter runs before the composite-key anti join,
    # so ~5/6 of fact rows never enter that exchange. Filtering the
    # left side of a LEFT ANTI join commutes; Catalyst won't hoist an
    # inner join below an anti join on its own.
    ss_clean = (
        ss.join(dd, ss.ss_sold_date_sk == dd.d_date_sk)
        .join(
            sr,
            (ss.ss_ticket_number == sr.sr_ticket_number)
            & (ss.ss_item_sk == sr.sr_item_sk),
            "left_anti",
        )
        .groupBy(
            "d_year",
            F.col("ss_item_sk").alias("item"),
            F.col("ss_customer_sk").alias("cust"),
        )
        .agg(F.sum(F.col("ss_quantity").cast("bigint")).alias("store_qty"))
    )
    ws = _t(spark, "web_sales")
    wr = _t(spark, "web_returns").select("wr_order_number", "wr_item_sk")
    ws_clean = (
        ws.join(dd, ws.ws_sold_date_sk == dd.d_date_sk)
        .join(
            wr,
            (ws.ws_order_number == wr.wr_order_number)
            & (ws.ws_item_sk == wr.wr_item_sk),
            "left_anti",
        )
        .groupBy(
            F.col("d_year").alias("wy"),
            F.col("ws_item_sk").alias("witem"),
            F.col("ws_bill_customer_sk").alias("wcust"),
        )
        .agg(F.sum(F.col("ws_quantity").cast("bigint")).alias("web_qty"))
    )
    return (
        ss_clean.join(
            ws_clean,
            (F.col("item") == F.col("witem"))
            & (F.col("cust") == F.col("wcust"))
            & (F.col("d_year") == F.col("wy")),
        )
        .filter(F.col("web_qty") > 0)
        .select("d_year", "item", "cust", "store_qty", "web_qty")
    )


@query(
    "tpcds_q80_promo_channel_rollup",
    oracle=_with(
        "store_sales", "store_returns", "catalog_sales", "catalog_returns",
        "web_sales", "web_returns", "promotion", "date_dim"
    )
    + """
    , legs AS (
      SELECT 'store' AS channel,
             CAST(ss_ext_sales_price * 100 AS BIGINT) AS sales,
             CAST(COALESCE(sr_return_amt * 100, 0) AS BIGINT) AS returns,
             CAST(ss_net_profit * 100 AS BIGINT)
               - CAST(COALESCE(sr_net_loss * 100, 0) AS BIGINT) AS profit
      FROM store_sales
      LEFT JOIN store_returns ON ss_ticket_number = sr_ticket_number
                             AND ss_item_sk = sr_item_sk
      LEFT JOIN promotion ON ss_promo_sk = p_promo_sk
      JOIN date_dim ON ss_sold_date_sk = d_date_sk
      WHERE d_year = 2001
        AND (p_promo_sk IS NULL OR p_channel_tv = 'N')
      UNION ALL
      SELECT 'catalog',
             CAST(cs_ext_sales_price * 100 AS BIGINT),
             CAST(COALESCE(cr_return_amount * 100, 0) AS BIGINT),
             CAST(cs_net_profit * 100 AS BIGINT)
               - CAST(COALESCE(cr_net_loss * 100, 0) AS BIGINT)
      FROM catalog_sales
      LEFT JOIN catalog_returns ON cs_order_number = cr_order_number
                               AND cs_item_sk = cr_item_sk
      LEFT JOIN promotion ON cs_promo_sk = p_promo_sk
      JOIN date_dim ON cs_sold_date_sk = d_date_sk
      WHERE d_year = 2001
        AND (p_promo_sk IS NULL OR p_channel_tv = 'N')
      UNION ALL
      SELECT 'web',
             CAST(ws_ext_sales_price * 100 AS BIGINT),
             CAST(COALESCE(wr_return_amt * 100, 0) AS BIGINT),
             CAST(ws_net_profit * 100 AS BIGINT)
               - CAST(COALESCE(wr_net_loss * 100, 0) AS BIGINT)
      FROM web_sales
      LEFT JOIN web_returns ON ws_order_number = wr_order_number
                           AND ws_item_sk = wr_item_sk
      LEFT JOIN promotion ON ws_promo_sk = p_promo_sk
      JOIN date_dim ON ws_sold_date_sk = d_date_sk
      WHERE d_year = 2001
        AND (p_promo_sk IS NULL OR p_channel_tv = 'N')
    )
    SELECT channel,
           CAST(SUM(sales) AS BIGINT) AS sales_cents,
           CAST(SUM(returns) AS BIGINT) AS returns_cents,
           CAST(SUM(profit) AS BIGINT) AS profit_cents
    FROM legs
    GROUP BY ROLLUP(channel)
    """,
)
def tpcds_q80(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q80 shape: promotion-gated channel totals with returns
    netted at LINE grain (unlike Q77's entity grain) and a channel
    ROLLUP.

    Each channel left-joins its returns on the composite line key and
    its promotion row (gate: no promo or non-TV promo), then the
    three line streams union into the rollup. The line-grain netting
    is the wide work — one composite-key join per channel; the
    promotion gate is a broadcast.
    """
    dd = F.broadcast(
        _t(spark, "date_dim").filter(F.col("d_year") == 2001).select("d_date_sk")
    )
    promo = F.broadcast(
        _t(spark, "promotion").select("p_promo_sk", "p_channel_tv")
    )

    def leg(fact, pfx, rfact, rpfx, rkey, ramt, channel):
        f_ = _t(spark, fact)
        r_ = _t(spark, rfact).select(
            f"{rpfx}_{rkey}", f"{rpfx}_item_sk", ramt, f"{rpfx}_net_loss"
        )
        # Date-first reorder (same shuffle-volume rule as q75): the
        # broadcast 1-year filter runs before the composite-key
        # returns join, so ~5/6 of fact rows never enter the only wide
        # exchange. Left-join filtering on the left side commutes.
        joined = (
            f_.join(dd, F.col(f"{pfx}_sold_date_sk") == dd.d_date_sk)
            .join(
                r_,
                (F.col(f"{pfx}_{rkey}") == F.col(f"{rpfx}_{rkey}"))
                & (F.col(f"{pfx}_item_sk") == F.col(f"{rpfx}_item_sk")),
                "left",
            )
            .join(promo, F.col(f"{pfx}_promo_sk") == promo.p_promo_sk, "left")
            .filter(
                F.col("p_promo_sk").isNull() | (F.col("p_channel_tv") == "N")
            )
        )
        return joined.select(
            F.lit(channel).alias("channel"),
            (F.col(f"{pfx}_ext_sales_price") * 100).cast("bigint").alias("sales"),
            F.coalesce(
                (F.col(ramt) * 100).cast("bigint"), F.lit(0)
            ).alias("returns"),
            (
                (F.col(f"{pfx}_net_profit") * 100).cast("bigint")
                - F.coalesce(
                    (F.col(f"{rpfx}_net_loss") * 100).cast("bigint"), F.lit(0)
                )
            ).alias("profit"),
        )

    legs = (
        leg("store_sales", "ss", "store_returns", "sr", "ticket_number",
            "sr_return_amt", "store")
        .unionByName(
            leg("catalog_sales", "cs", "catalog_returns", "cr", "order_number",
                "cr_return_amount", "catalog")
        )
        .unionByName(
            leg("web_sales", "ws", "web_returns", "wr", "order_number",
                "wr_return_amt", "web")
        )
    )
    return legs.rollup("channel").agg(
        F.sum("sales").cast("bigint").alias("sales_cents"),
        F.sum("returns").cast("bigint").alias("returns_cents"),
        F.sum("profit").cast("bigint").alias("profit_cents"),
    )


@query(
    "tpcds_q85_web_return_reasons",
    oracle=_with(
        "web_sales", "web_returns", "customer_demographics", "reason", "date_dim"
    )
    + """
    SELECT r_reason_desc,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ws_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(SUM(CAST(wr_refunded_cash * 100 AS BIGINT)) AS BIGINT)
             AS refund_cents,
           CAST(SUM(CAST(wr_fee * 100 AS BIGINT)) AS BIGINT) AS fee_cents
    FROM web_sales
    JOIN web_returns ON ws_order_number = wr_order_number
                    AND ws_item_sk = wr_item_sk
    JOIN customer_demographics ON wr_refunded_cdemo_sk = cd_demo_sk
    JOIN reason ON wr_reason_sk = r_reason_sk
    WHERE ((cd_marital_status = 'M' AND ws_sales_price BETWEEN 0 AND 5000)
        OR (cd_marital_status = 'S' AND ws_sales_price BETWEEN 2500 AND 7500)
        OR (cd_marital_status = 'D' AND ws_sales_price BETWEEN 5000 AND 10000))
    GROUP BY 1
    """,
)
def tpcds_q85(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q85 shape: web return reasons under demographic-coupled
    price brackets.

    The returns⋈sales composite-key join resolved through the
    REFUNDED party's demographics (the spec's distinguishing detail —
    the return carries its own demographic key, not the buyer's),
    with Q48-style OR-of-AND brackets coupling marital status to the
    sale price band, rolled up per return reason. Reason and
    demographics broadcast; the line join is the one wide exchange.
    The spec's education/address legs repeat the same bracket pattern
    and its year gate empties the ~16 surviving composite-key matches
    at the materialized scale (documented reductions).
    """
    cd = F.broadcast(
        _t(spark, "customer_demographics").select("cd_demo_sk", "cd_marital_status")
    )
    rs = F.broadcast(_t(spark, "reason").select("r_reason_sk", "r_reason_desc"))
    ws = _t(spark, "web_sales").select(
        "ws_order_number", "ws_item_sk", "ws_quantity", "ws_sales_price",
    )
    wr = _t(spark, "web_returns").select(
        "wr_order_number", "wr_item_sk", "wr_refunded_cdemo_sk",
        "wr_reason_sk", "wr_refunded_cash", "wr_fee",
    )
    p = F.col("ws_sales_price")
    bracket = (
        ((F.col("cd_marital_status") == "M") & p.between(0, 5000))
        | ((F.col("cd_marital_status") == "S") & p.between(2500, 7500))
        | ((F.col("cd_marital_status") == "D") & p.between(5000, 10000))
    )
    return (
        ws.join(
            wr,
            (ws.ws_order_number == wr.wr_order_number)
            & (ws.ws_item_sk == wr.wr_item_sk),
        )
        .join(cd, wr.wr_refunded_cdemo_sk == cd.cd_demo_sk)
        .join(rs, wr.wr_reason_sk == rs.r_reason_sk)
        .filter(bracket)
        .groupBy("r_reason_desc")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("ws_quantity").cast("bigint")).alias("sum_qty"),
            F.sum((F.col("wr_refunded_cash") * 100).cast("bigint")).alias(
                "refund_cents"
            ),
            F.sum((F.col("wr_fee") * 100).cast("bigint")).alias("fee_cents"),
        )
    )
