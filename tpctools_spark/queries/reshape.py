"""Reshaping & incremental-maintenance operators.

Time-series gap-fill with carry-forward, MERGE-style corpus upsert,
deterministic per-group reservoir sampling, the CUBE grouping lattice,
and wide→long UNPIVOT — the maintenance/reshaping verbs around the
core analytics. All exact-arithmetic, all oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tpctools_spark.catalog import table
from tpctools_spark.queries._util import money
from tpctools_spark.registry import query


@query(
    "events_gapfill",
    oracle="""
    WITH daily AS (
      SELECT user_id,
             CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
             CAST(COUNT(*) AS BIGINT) AS day_events,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE), 2)
               AS day_value
      FROM events GROUP BY 1, 2
    ), bounds AS (
      SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY user_id
    ), grid AS (
      SELECT user_id, UNNEST(range(d0, d1 + 1)) AS day FROM bounds
    )
    SELECT g.user_id, g.day,
           CAST(COALESCE(day_events, 0) AS BIGINT) AS n_events,
           day_value,
           LAST_VALUE(day_value IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
    FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
    """,
)
def events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + gap-fill: every user gets a dense daily
    grid between their first and last event; missing days carry the
    last observed daily total forward (``LAST_VALUE IGNORE NULLS``).

    The dense grid comes from ``explode(sequence(d0, d1))`` on the
    per-user bounds — generated distributed, sized by each user's own
    span, never a driver-side calendar. Days are exact integer
    epoch-day arithmetic (no date parsing in the hot path). The
    carry-forward window re-uses the (user, day) partitioning the
    left join just produced, so the whole op is two shuffles: the
    daily rollup and the grid join. On a cluster the same plan
    gap-fills billions of series — per-series state is one running
    value inside the window operator.
    """
    ev = table(spark, sf_dir, "events")
    day = F.floor(F.unix_timestamp(F.col("ts")) / 86400).cast("bigint")
    daily = ev.groupBy("user_id", day.alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("day_events"),
        F.round(F.sum(money(F.col("value"))).cast("double"), 2).alias("day_value"),
    )
    bounds = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = bounds.select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.coalesce("day_events", F.lit(0)).cast("bigint").alias("n_events"),
            "day_value",
            F.last("day_value", ignorenulls=True).over(w).alias("filled_value"),
        )
    )


@query(
    "corpus_upsert",
    oracle="""
    WITH incoming AS (
      SELECT doc_id, text || ' [rev2]' AS text
      FROM documents WHERE doc_id % 10 = 0
      UNION ALL
      SELECT doc_id + 1000000, 'new doc ' || CAST(doc_id AS VARCHAR)
      FROM documents WHERE doc_id % 50 = 0
    )
    SELECT COALESCE(i.doc_id, b.doc_id) AS doc_id,
           CASE WHEN i.doc_id IS NULL THEN 'keep'
                WHEN b.doc_id IS NULL THEN 'insert'
                ELSE 'update' END AS action,
           CAST(CASE WHEN i.doc_id IS NULL THEN 1 ELSE 2 END AS BIGINT) AS version,
           md5(COALESCE(i.text, b.text)) AS fp
    FROM documents b FULL OUTER JOIN incoming i ON b.doc_id = i.doc_id
    """,
)
def corpus_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-style corpus upsert: an incoming batch updates matched
    docs, inserts unmatched ones, and untouched rows pass through —
    the relational core of ``MERGE INTO`` (Delta/Iceberg run exactly
    this full-outer-join plan under ACID commit protocols; the commit
    is storage-layer, the dataflow is this). See README "Lakehouse
    table formats: the emulation mapping" for the full primitive↔query
    table and what changes when a real format is present.

    The incoming batch is derived deterministically from the corpus
    (every 10th doc revised, every 50th doc spawning a brand-new id)
    so the oracle can rebuild it. One key-partitioned shuffle joins
    base and batch; at scale the batch side is typically small enough
    to broadcast, flipping the plan to map-side merge automatically.
    Output carries the post-merge fingerprint so content (not just
    membership) is verified.
    """
    base = table(spark, sf_dir, "documents").select("doc_id", "text")
    updates = (
        base.filter(F.col("doc_id") % 10 == 0)
        .select("doc_id", F.concat(F.col("text"), F.lit(" [rev2]")).alias("text"))
    )
    inserts = base.filter(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.lit("new doc "), F.col("doc_id").cast("string")).alias("text"),
    )
    incoming = updates.unionByName(inserts).select(
        F.col("doc_id").alias("i_id"), F.col("text").alias("i_text")
    )
    merged = base.join(incoming, base.doc_id == incoming.i_id, "full_outer")
    return merged.select(
        F.coalesce("i_id", "doc_id").alias("doc_id"),
        F.when(F.col("i_id").isNull(), "keep")
        .when(F.col("doc_id").isNull(), "insert")
        .otherwise("update")
        .alias("action"),
        F.when(F.col("i_id").isNull(), 1).otherwise(2).cast("bigint").alias("version"),
        F.md5(F.encode(F.coalesce("i_text", "text"), "utf-8")).alias("fp"),
    )


@query(
    "sample_reservoir_group",
    oracle="""
    SELECT lang, doc_id, CAST(rk AS BIGINT) AS rk FROM (
      SELECT lang, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents
    ) WHERE rk <= 5
    """,
)
def sample_reservoir_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-group sampling ("give me 5 examples per
    language"): rank by a cryptographic hash of the stable key and
    keep the top k — reservoir-sampling semantics without randomness,
    so the sample is reproducible and engine-independent.

    One shuffle (the per-group window); Spark turns the rank≤k filter
    into a per-partition top-k (WindowGroupLimit), so each executor
    retains only k rows per group before the exchange — the reservoir
    property, derived by the optimizer. The md5 order stands in for a
    seeded uniform draw; doc_id breaks (never-observed) hash ties.
    """
    docs = table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.encode(F.col("doc_id").cast("string"), "utf-8")), "doc_id"
    )
    return (
        docs.select("lang", "doc_id", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 5)
        .select("lang", "doc_id", F.col("rk").cast("bigint").alias("rk"))
    )


@query(
    "agg_cube",
    oracle="""
    SELECT lang, source,
           CAST(GROUPING(lang) AS BIGINT) AS g_lang,
           CAST(GROUPING(source) AS BIGINT) AS g_source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY CUBE(lang, source)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CUBE lattice over (lang, source) — all four grouping
    combinations in one pass, completing the grouping family next to
    the registered ROLLUP and GROUPING SETS queries. GROUPING flags
    are projected so NULL-valued dimension members stay
    distinguishable from subtotal rows."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.cube("lang", "source")
        .agg(
            F.grouping("lang").cast("bigint").alias("g_lang"),
            F.grouping("source").cast("bigint").alias("g_source"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("n_chars").cast("bigint")).alias("total_chars"),
        )
        .select("lang", "source", "g_lang", "g_source", "n_docs", "total_chars")
    )


@query(
    "agg_unpivot",
    oracle="""
    WITH long AS (
      SELECT 'l_extendedprice' AS charge_type, l_extendedprice AS amount
      FROM lineitem
      UNION ALL
      SELECT 'l_discount', l_discount FROM lineitem
      UNION ALL
      SELECT 'l_tax', l_tax FROM lineitem
    )
    SELECT charge_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(CAST(amount AS DECIMAL(12,2))) AS DOUBLE), 2) AS total
    FROM long GROUP BY charge_type
    """,
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long UNPIVOT (melt): lineitem's three charge columns
    rotated into (charge_type, amount) rows, then re-aggregated —
    the inverse of the registered pivot query.

    Uses Spark's native ``DataFrame.unpivot`` (Expand under the hood:
    one scan emits all three rows per input, no union of three scans
    — the oracle's UNION ALL form is the portable equivalent, which
    DuckDB's optimizer likewise collapses). Decimal-cast sums keep
    the three different value scales exact under one common type.
    """
    li = table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        [],
        ["l_extendedprice", "l_discount", "l_tax"],
        "charge_type",
        "amount",
    )
    return long.groupBy("charge_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(money(F.col("amount"))).cast("double"), 2).alias("total"),
    )


@query(
    "reshape_incremental_agg",
    oracle="""
    SELECT o_custkey,
           COUNT(*) AS n_orders,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 2)
             AS total_spent
    FROM orders
    GROUP BY o_custkey
    """,
)
def reshape_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: a pre-aggregated state table
    (the historical 90%) merged with a new delta batch (the fresh 10%)
    by combining MERGEABLE partials — count adds, decimal sums add —
    instead of re-aggregating history. The materialized-view /
    foreachBatch-upsert pattern: at 100 TB the nightly refresh touches
    only the delta, and the oracle proves merged-incremental ==
    full-recompute exactly (decimal partials are order- and
    split-independent).

    The split is deterministic (orderkey residue); both paths are
    aggregates + one keyed union-agg — the merge itself is the same
    map-side-combinable shape as the original aggregation.
    """
    o = table(spark, sf_dir, "orders")
    hist = o.filter(F.col("o_orderkey") % 10 != 0)
    delta = o.filter(F.col("o_orderkey") % 10 == 0)

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy("o_custkey").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(money(F.col("o_totalprice"))).alias("_sum_dec"),
        )

    merged = (
        partials(hist)
        .unionByName(partials(delta))
        .groupBy("o_custkey")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("_sum_dec").alias("_sum_dec"),
        )
    )
    return merged.select(
        "o_custkey",
        "n_orders",
        F.round(F.col("_sum_dec").cast("double"), 2).alias("total_spent"),
    )


@query(
    "reshape_cdc_compact",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_id, event_type, value, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn,
             CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_ops
      FROM events
    )
    SELECT user_id, event_id AS last_event_id, event_type AS last_op,
           value AS last_value, epoch_us(ts) AS last_ts_us, n_ops
    FROM ranked WHERE rn = 1 AND event_type <> 'error'
    """,
)
def reshape_cdc_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture log compaction with delete tombstones: the
    event stream is a keyed change log (every row upserts its user's
    state; ``error`` rows are tombstones), and compaction materializes
    the current snapshot — latest surviving row per key, keys whose
    final op is a tombstone disappear entirely.

    This is the other half of the lakehouse pair: `corpus_upsert` is
    MERGE (base ⋈ batch), this is log→snapshot (no base table at all —
    the log IS the source of truth, the Kafka-compacted-topic /
    Debezium-feed shape). README section "Lakehouse table formats: the
    emulation mapping" maps both onto Delta CDF / Iceberg changelog
    primitives. One hash exchange on the key serves both the
    row_number and the per-key op count (shared window partition);
    ties broken by event_id so replays are deterministic. At 100 TB
    compaction runs per key-range partition and the shuffle carries
    each key's rows once — no driver state, no iteration.

    Timestamps are emitted as epoch microseconds (bigint) so the value
    hash is timezone-independent under any driver session.
    """
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    wc = Window.partitionBy("user_id")
    ranked = ev.select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        "ts",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).cast("bigint").alias("n_ops"),
    )
    return ranked.filter(
        (F.col("rn") == 1) & (F.col("event_type") != "error")
    ).select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_op"),
        F.col("value").alias("last_value"),
        F.unix_micros("ts").alias("last_ts_us"),
        "n_ops",
    )


@query(
    "reshape_snapshot_diff",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn_all,
             CASE WHEN ts < TIMESTAMP '2024-01-29' THEN
               ROW_NUMBER() OVER (PARTITION BY user_id,
                                  (ts < TIMESTAMP '2024-01-29')
                                  ORDER BY ts DESC, event_id DESC)
             END AS rn_v1
      FROM events
    ),
    st AS (
      SELECT user_id,
             MAX(CASE WHEN rn_v1 = 1 AND event_type <> 'error'
                      THEN event_id END) AS v1_id,
             MAX(CASE WHEN rn_all = 1 AND event_type <> 'error'
                      THEN event_id END) AS v2_id
      FROM ranked
      GROUP BY user_id
    ),
    classed AS (
      SELECT user_id,
             CASE
               WHEN v1_id IS NULL AND v2_id IS NOT NULL THEN 'insert'
               WHEN v1_id IS NOT NULL AND v2_id IS NULL THEN 'delete'
               WHEN v1_id = v2_id THEN 'unchanged'
               ELSE 'update'
             END AS change
      FROM st
      WHERE v1_id IS NOT NULL OR v2_id IS NOT NULL
    )
    SELECT change,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(user_id) AS BIGINT) AS key_checksum
    FROM classed
    GROUP BY change
    """,
)
def reshape_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff → change feed: materialize TWO versions of the
    keyed state (the compacted event log as of Jan 29 and as of
    end-of-log, error rows = delete tombstones) and classify every key
    as insert / update / delete / unchanged — the inverse of
    ``reshape_cdc_compact`` (which folds a change feed INTO a
    snapshot), and the engine-level shape of Delta CDF's
    "diff two table versions" read.

    The scale trick: both versions come from ONE scan and ONE shuffle
    — a single groupBy(key) computes two conditional ``max_by``
    states (the v1 aggregate just carries a time-cutoff FILTER), so
    the diff never joins two materialized snapshots. At 100 TB that
    halves the IO and removes the join entirely; the classification
    is a per-key scalar CASE. Tombstone semantics make 'delete' a
    real class: a key whose latest row is an error exists in neither
    snapshot (dropped) or only in v1 (deleted since the cutoff).
    """
    ev = table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-29").cast("timestamp")
    ordkey = F.struct(F.col("ts"), F.col("event_id"))
    payload = F.struct(F.col("event_id"), F.col("event_type"))
    live = F.col("event_type") != "error"
    st = ev.groupBy("user_id").agg(
        F.max_by(
            F.when(F.col("ts") < cutoff, payload),
            F.when(F.col("ts") < cutoff, ordkey),
        ).alias("s1"),
        F.max_by(payload, ordkey).alias("s2"),
    )
    v1 = F.when(F.col("s1.event_type") != "error", F.col("s1.event_id"))
    v2 = F.when(F.col("s2.event_type") != "error", F.col("s2.event_id"))
    classed = (
        st.select(
            "user_id", v1.alias("v1_id"), v2.alias("v2_id")
        )
        .filter(F.col("v1_id").isNotNull() | F.col("v2_id").isNotNull())
        .select(
            "user_id",
            F.when(
                F.col("v1_id").isNull() & F.col("v2_id").isNotNull(),
                F.lit("insert"),
            )
            .when(
                F.col("v1_id").isNotNull() & F.col("v2_id").isNull(),
                F.lit("delete"),
            )
            .when(F.col("v1_id") == F.col("v2_id"), F.lit("unchanged"))
            .otherwise(F.lit("update"))
            .alias("change"),
        )
    )
    return classed.groupBy("change").agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("user_id").cast("bigint").alias("key_checksum"),
    )
