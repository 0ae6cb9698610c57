"""Data-quality expectations and schema-evolution scans.

The production-pipeline bookends: declarative constraint audits over
incoming tables (the Deequ/Great-Expectations shape, computed as ONE
conditional-aggregation scan per table) and reading a dataset whose
schema grew new columns across batches (``mergeSchema``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tpctools_spark.catalog import table
from tpctools_spark.queries.scans import _scratch_dir
from tpctools_spark.queries._util import trunc_digits
from tpctools_spark.registry import query

_LANGS = ("en", "de", "es", "fr", "zh")
_EVENT_TYPES = ("view", "click", "purchase", "signup", "error")


@query(
    "quality_expectations",
    oracle=f"""
    WITH d AS (
      SELECT CAST(COUNT(*) - COUNT(DISTINCT doc_id) AS BIGINT) AS doc_id_unique,
             CAST(COUNT(*) - COUNT(text) AS BIGINT) AS text_not_null,
             CAST(SUM(CASE WHEN n_chars IS NULL OR n_chars <= 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_chars_positive,
             CAST(SUM(CASE WHEN lang IS NULL
                           OR lang NOT IN {_LANGS!r}
                           THEN 1 ELSE 0 END) AS BIGINT) AS lang_in_domain,
             CAST(SUM(CASE WHEN n_chars <> length(text)
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_chars_consistent
      FROM documents
    ), e AS (
      SELECT CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT)
               AS event_id_unique,
             CAST(SUM(CASE WHEN value IS NULL OR value < 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS value_non_negative,
             CAST(SUM(CASE WHEN event_type IS NULL
                           OR event_type NOT IN {_EVENT_TYPES!r}
                           THEN 1 ELSE 0 END) AS BIGINT) AS type_in_domain
      FROM events
    )
    SELECT * FROM (
      SELECT 'documents' AS tbl, 'doc_id_unique' AS check_name,
             doc_id_unique AS violations FROM d
      UNION ALL SELECT 'documents', 'text_not_null', text_not_null FROM d
      UNION ALL SELECT 'documents', 'n_chars_positive', n_chars_positive FROM d
      UNION ALL SELECT 'documents', 'lang_in_domain', lang_in_domain FROM d
      UNION ALL SELECT 'documents', 'n_chars_consistent', n_chars_consistent FROM d
      UNION ALL SELECT 'events', 'event_id_unique', event_id_unique FROM e
      UNION ALL SELECT 'events', 'value_non_negative', value_non_negative FROM e
      UNION ALL SELECT 'events', 'type_in_domain', type_in_domain FROM e
    ) checks
    """,
)
def quality_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality audit: uniqueness, completeness,
    range, domain, and cross-column consistency checks as one report
    relation (table, check, violation count).

    The Deequ shape done Spark-natively: ALL of a table's checks
    compute in ONE conditional-aggregation scan (never one job per
    check), then the single wide row explodes into per-check rows.
    Two tables → two scans → eight checks; adding a check adds a
    column to the aggregate, not a pass over the data. At 100 TB the
    audit costs exactly one read of each audited table.
    """
    docs = table(spark, sf_dir, "documents")
    d = docs.agg(
        (F.count(F.lit(1)) - F.countDistinct("doc_id")).alias("doc_id_unique"),
        (F.count(F.lit(1)) - F.count("text")).alias("text_not_null"),
        F.sum(
            F.when(F.col("n_chars").isNull() | (F.col("n_chars") <= 0), 1)
            .otherwise(0)
        ).alias("n_chars_positive"),
        F.sum(
            F.when(
                F.col("lang").isNull() | ~F.col("lang").isin(*_LANGS), 1
            ).otherwise(0)
        ).alias("lang_in_domain"),
        F.sum(
            F.when(F.col("n_chars") != F.length("text"), 1).otherwise(0)
        ).alias("n_chars_consistent"),
    )
    ev = table(spark, sf_dir, "events")
    e = ev.agg(
        (F.count(F.lit(1)) - F.countDistinct("event_id")).alias("event_id_unique"),
        F.sum(
            F.when(F.col("value").isNull() | (F.col("value") < 0), 1).otherwise(0)
        ).alias("value_non_negative"),
        F.sum(
            F.when(
                F.col("event_type").isNull()
                | ~F.col("event_type").isin(*_EVENT_TYPES),
                1,
            ).otherwise(0)
        ).alias("type_in_domain"),
    )

    def melt(agg: DataFrame, tbl: str, names: list[str]) -> DataFrame:
        pairs = F.array(
            *[
                F.struct(
                    F.lit(n).alias("check_name"),
                    F.col(n).cast("bigint").alias("violations"),
                )
                for n in names
            ]
        )
        return agg.select(F.explode(pairs).alias("c")).select(
            F.lit(tbl).alias("tbl"),
            F.col("c.check_name").alias("check_name"),
            F.col("c.violations").alias("violations"),
        )

    return melt(
        d, "documents",
        ["doc_id_unique", "text_not_null", "n_chars_positive",
         "lang_in_domain", "n_chars_consistent"],
    ).unionByName(
        melt(e, "events",
             ["event_id_unique", "value_non_negative", "type_in_domain"])
    )


@query(
    "scan_schema_evolution",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(quality) AS BIGINT) AS n_scored,
           CAST(SUM(CAST(COALESCE(quality, 0) AS BIGINT)) AS BIGINT)
             AS quality_sum
    FROM (
      SELECT doc_id, lang, CAST(NULL AS BIGINT) AS quality
      FROM documents WHERE doc_id % 2 = 0
      UNION ALL
      SELECT doc_id, lang, CAST(n_chars % 100 AS BIGINT)
      FROM documents WHERE doc_id % 2 = 1
    )
    GROUP BY lang
    """,
)
def scan_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution across batches: batch 1 lands without the
    ``quality`` column, batch 2 adds it; ``mergeSchema`` reads both
    under one unified schema with NULLs where the column predates.

    The standard lakehouse grow-only evolution path. The oracle
    reconstructs the same union semantics from the source table, so
    the merged read is value-checked, not just schema-checked. At
    scale, mergeSchema's footer-union planning cost is per-FILE;
    production tables pin the merged schema in a metastore — the read
    semantics verified here are identical.
    """
    out = _scratch_dir("evolve")
    docs = table(spark, sf_dir, "documents")
    docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang").write.mode(
        "overwrite"
    ).parquet(os.path.join(out, "docs", "batch=1"))
    docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id",
        "lang",
        (F.col("n_chars") % 100).cast("bigint").alias("quality"),
    ).write.mode("overwrite").parquet(os.path.join(out, "docs", "batch=2"))
    merged = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(out, "docs")
    )
    return merged.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count("quality").alias("n_scored"),
        F.sum(F.coalesce("quality", F.lit(0))).cast("bigint").alias("quality_sum"),
    )


@query(
    "quality_outlier_iqr",
    oracle="""
    WITH fences AS (
      SELECT event_type,
             quantile_cont(value, 0.25) AS q1,
             quantile_cont(value, 0.75) AS q3
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN e.value < f.q1 - 1.5 * (f.q3 - f.q1)
                           OR e.value > f.q3 + 1.5 * (f.q3 - f.q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           f.q1 - 1.5 * (f.q3 - f.q1) AS fence_lo,
           f.q3 + 1.5 * (f.q3 - f.q1) AS fence_hi
    FROM events e JOIN fences f USING (event_type)
    GROUP BY e.event_type, f.q1, f.q3
    """,
)
def quality_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier profiling per series: flag values outside
    [q1 − 1.5·IQR, q3 + 1.5·IQR].

    The standard numeric-anomaly screen in data-quality suites. Exact
    interpolated percentiles (Spark ``percentile`` ≡ DuckDB
    ``quantile_cont``, bitwise — proven by agg_percentile) feed a
    group-count-sized fence table broadcast back onto the events; the
    fence arithmetic is the same IEEE mul/sub on both engines, so even
    boundary-sitting values classify identically. Two passes over the
    events (percentile agg, then flag+count) — at 100 TB you'd swap
    pass one for approx_percentile and keep the same shape.
    """
    ev = table(spark, sf_dir, "events")
    fences = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.25)").alias("q1"),
        F.expr("percentile(value, 0.75)").alias("q3"),
    )
    lo = F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))
    hi = F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))
    return (
        ev.join(F.broadcast(fences), "event_type")
        .groupBy("event_type", "q1", "q3")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.when(
                    (F.col("value") < lo) | (F.col("value") > hi), 1
                ).otherwise(0)
            ).alias("n_outliers"),
        )
        .select(
            "event_type",
            "n_events",
            "n_outliers",
            lo.alias("fence_lo"),
            hi.alias("fence_hi"),
        )
    )


@query(
    "quality_benford_digits",
    oracle="""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                  AS BIGINT) AS d
      FROM orders WHERE o_totalprice >= 1
    ),
    obs AS (
      SELECT d, COUNT(*) AS n FROM digits GROUP BY d
    ),
    tot AS (SELECT SUM(n) AS total FROM obs)
    SELECT obs.d AS leading_digit, obs.n AS n_values,
           (CAST(floor(CAST(obs.n AS DOUBLE) / tot.total * 10000) AS DOUBLE) / 10000)
             AS observed_p,
           (CAST(floor(log10(1.0 + 1.0 / obs.d) * 10000) AS DOUBLE) / 10000)
             AS benford_p
    FROM obs CROSS JOIN tot
    """,
)
def quality_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law screen: leading-digit distribution of order totals
    vs the log10(1+1/d) expectation — the classic fabricated-or-
    corrupted-numeric detector for ingested financial/metric columns.

    One projection (leading digit via string head of the integer part)
    + one 9-group aggregate; the total arrives as a one-row broadcast
    cross join, so the whole screen is two map-side-combinable passes
    regardless of table size. Output pairs observed vs expected
    probability per digit (4-decimal truncation, cross-engine safe).
    """
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    digits = o.select(
        F.substring(
            F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
        ).cast("bigint").alias("d")
    )
    obs = digits.groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    tot = obs.agg(F.sum("n").alias("total"))
    return (
        obs.crossJoin(F.broadcast(tot))
        .select(
            F.col("d").alias("leading_digit"),
            F.col("n").alias("n_values"),
            trunc_digits(F.col("n").cast("double") / F.col("total"), 4).alias(
                "observed_p"
            ),
            trunc_digits(
                F.log10(F.lit(1.0) + F.lit(1.0) / F.col("d")), 4
            ).alias("benford_p"),
        )
    )


@query(
    "quality_observe_metrics",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(*) FILTER (o_totalprice <= 0) AS n_nonpositive,
           COUNT(*) FILTER (o_orderdate IS NULL) AS n_null_dates,
           CAST(COUNT(*) FILTER (o_orderpriority = '1-URGENT') AS BIGINT)
             AS n_urgent
    FROM orders
    """,
)
def quality_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-extra-pass data-quality counters via the Observation API:
    metrics are accumulated DURING a job's normal scan (here a noop
    write of the orders table), not by a second aggregation pass — at
    100 TB this is the difference between free quality telemetry and
    doubling the pipeline's I/O.

    ``df.observe(...)`` attaches named aggregate expressions to the
    plan; the listener delivers their values when the action completes.
    The observed values come back as one bounded driver-side row
    (the same bounded-state pattern as the k-means centroids) and are
    re-emitted as a DataFrame so the oracle can value-check that
    observation == a real aggregation pass.
    """
    from pyspark.sql import Observation

    o = table(spark, sf_dir, "orders")
    obs = Observation("quality")
    observed = o.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.count_if(F.col("o_totalprice") <= 0).alias("n_nonpositive"),
        F.count_if(F.col("o_orderdate").isNull()).alias("n_null_dates"),
        # DISTINCT aggregates are rejected in observed metrics (they
        # need an expand/shuffle; observation is map-side only) — use
        # approx_count_distinct there; here a plain conditional count.
        F.count_if(F.col("o_orderpriority") == "1-URGENT").alias("n_urgent"),
    )
    # The "real work" the metrics piggyback on — a full pass that would
    # run anyway (write, transform, etc.); noop keeps it I/O-free here.
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get  # blocks until the action above delivered the metrics
    return spark.createDataFrame(
        [
            (
                m["n_rows"],
                m["n_nonpositive"],
                m["n_null_dates"],
                m["n_urgent"],
            )
        ],
        "n_rows BIGINT, n_nonpositive BIGINT, n_null_dates BIGINT, n_urgent BIGINT",
    )


@query(
    "quality_profile_columns",
    oracle="""
    SELECT 'lang' AS column_name, COUNT(*) AS n_rows,
           COUNT(*) FILTER (lang IS NULL) AS n_null,
           COUNT(*) FILTER (trim(COALESCE(lang, '')) = '') AS n_blank,
           COUNT(DISTINCT lang) AS n_distinct
    FROM documents
    UNION ALL
    SELECT 'source', COUNT(*),
           COUNT(*) FILTER (source IS NULL),
           COUNT(*) FILTER (trim(COALESCE(source, '')) = ''),
           COUNT(DISTINCT source)
    FROM documents
    UNION ALL
    SELECT 'n_chars', COUNT(*),
           COUNT(*) FILTER (n_chars IS NULL),
           0,
           COUNT(DISTINCT n_chars)
    FROM documents
    """,
)
def quality_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column completeness/cardinality profile (the Deequ/Great-
    Expectations profiling shape): one row per column with null, blank,
    and distinct counts — the first thing run against any new 100 TB
    feed.

    ONE scan: all per-column metrics are conditional aggregates in a
    single pass (count-distincts expand inside one aggregation), then
    the wide row unpivots to the per-column report. Never one scan per
    column — at scale that multiplies I/O by the column count.
    """
    d = table(spark, sf_dir, "documents")
    blank = lambda c: F.count_if(F.trim(F.coalesce(F.col(c), F.lit(""))) == "")  # noqa: E731
    wide = d.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_if(F.col("lang").isNull()).alias("lang_null"),
        blank("lang").alias("lang_blank"),
        F.countDistinct("lang").alias("lang_distinct"),
        F.count_if(F.col("source").isNull()).alias("source_null"),
        blank("source").alias("source_blank"),
        F.countDistinct("source").alias("source_distinct"),
        F.count_if(F.col("n_chars").isNull()).alias("n_chars_null"),
        F.countDistinct("n_chars").alias("n_chars_distinct"),
    )
    return wide.selectExpr(
        """stack(3,
             'lang',    n_rows, lang_null,    lang_blank,   lang_distinct,
             'source',  n_rows, source_null,  source_blank, source_distinct,
             'n_chars', n_rows, n_chars_null, CAST(0 AS BIGINT), n_chars_distinct
           ) AS (column_name, n_rows, n_null, n_blank, n_distinct)"""
    )


# ---------------------------------------------------------------------------
# quality_ks_test

_KS_A = "click"
_KS_B = "purchase"
# Reject at α=0.05: D > 1.358·sqrt((n1+n2)/(n1·n2)). Squaring both
# sides gives D² · 10⁴ > 18442 · (n1+n2)/(n1·n2) (1.358² = 1.8442
# exactly at 4 decimals). With the CDFs quantized to the fixed scale
# _KS_S (t = ⌊c·S/n⌋, dq = max|t1−t2| ≤ S), the test becomes
# dq² · 10⁴ > 18442 · (n1+n2) · S² / (n1·n2); comparing against the
# FLOOR of the right side is exactly equivalent (for integers A and a
# rational B/C: A > ⌊B/C⌋ ⟺ A·C > B), and every intermediate is
# bounded independent of data size: dq²·10⁴ ≤ 10²⁰, the floored
# quotient ≤ 18442·2·S² ≈ 3.7·10²⁰, the numerator
# 18442·(n1+n2)·S² < 10³⁸ up to ~10¹⁸ total rows. No overflow at any
# realistic scale — the old formulation's ds = max|c1·n2 − c2·n1|
# grew as n1·n2 and blew DECIMAL(38,0) at ~10⁸ rows per cohort.
_KS_CRIT_X10K = 18442
_KS_S = 100_000_000  # CDF quantization scale: D resolved to 1e-8
# The floored-quotient form's result fits int64 only when
# min(n1,n2) ≥ 50 (bound 18442·S²·(1/n1+1/n2) ≤ 7.4·10¹⁸); below
# that, cohorts are tiny so the direct product form is itself bounded
# (dq²·10⁴·n1·n2 ≤ 5·10³⁶ for cohorts up to 10¹⁵ rows). Both engines
# take the same data-determined branch.
_KS_SMALL_N = 50


@query(
    "quality_ks_test",
    oracle=f"""
    WITH src AS (
      SELECT CAST(floor(value * 100) AS BIGINT) AS cell,
             CASE WHEN event_type = '{_KS_A}' THEN 1 ELSE 0 END AS f1,
             CASE WHEN event_type = '{_KS_B}' THEN 1 ELSE 0 END AS f2
      FROM events WHERE event_type IN ('{_KS_A}', '{_KS_B}')
    ), per_cell AS (
      SELECT cell, SUM(f1) AS s1, SUM(f2) AS s2
      FROM src GROUP BY cell
    ), cdf AS (
      SELECT SUM(s1) OVER (ORDER BY cell
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c1,
             SUM(s2) OVER (ORDER BY cell
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c2
      FROM per_cell
    ), tot AS (
      SELECT CAST(COUNT(*) FILTER (f1 = 1) AS BIGINT) AS n1,
             CAST(COUNT(*) FILTER (f2 = 1) AS BIGINT) AS n2
      FROM src
    ), dq AS (
      SELECT tot.n1, tot.n2,
             MAX(abs(  CAST(cdf.c1 AS HUGEINT) * {_KS_S} // tot.n1
                     - CAST(cdf.c2 AS HUGEINT) * {_KS_S} // tot.n2))
               AS d_q
      FROM cdf, tot
      GROUP BY tot.n1, tot.n2
    )
    SELECT n1, n2, CAST(d_q AS BIGINT) AS d_q8,
           (CAST(floor(CAST(d_q AS DOUBLE) / {_KS_S} * 1000000) AS DOUBLE)
              / 1000000) AS d_stat,
           CASE WHEN least(n1, n2) < {_KS_SMALL_N} THEN
             CAST(d_q AS HUGEINT) * d_q * 10000 * n1 * n2
               > CAST({_KS_CRIT_X10K} AS HUGEINT) * (n1 + n2)
                 * {_KS_S} * {_KS_S}
           ELSE
             CAST(d_q AS HUGEINT) * d_q * 10000
               > CAST({_KS_CRIT_X10K} AS HUGEINT) * (n1 + n2)
                 * {_KS_S} * {_KS_S} // (CAST(n1 AS HUGEINT) * n2)
           END AS reject_05
    FROM dq
    """,
)
def quality_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov test between two event cohorts'
    value distributions on a fixed cent grid — the distribution-shift
    gate, shaped so no stage grows past a domain bound.

    Scale posture (the whole point of this formulation):

    - Values quantize to a FIXED grid (⌊value·100⌋ cents), so the
      distinct-cell census the ordered window rides is bounded by the
      value domain (~50k cells here), not by the row count — at 100 TB
      the window input is the same size as at sf0.001.
    - CDFs quantize to the fixed scale _KS_S: t = ⌊c·S/n⌋ by exact
      integer floor division, so the statistic d_q = max|t1−t2| ≤ S is
      bounded by CONSTRUCTION, unlike the classic ds = max|c1·n2−c2·n1|
      which grows as n1·n2 and overflowed DECIMAL(38,0) at ~10⁸ rows
      per cohort. D is resolved to 1/S = 10⁻⁸ (well under any
      actionable effect size; the α=0.05 critical value at 10¹² rows
      per cohort is ≈ 1.9·10⁻⁶).
    - The α=0.05 decision is exact on the quantized statistic at any
      scale: for integer A and rational B/C, A > ⌊B/C⌋ ⟺ A·C > B, so
      comparing d_q²·10⁴ against the floored quotient is the true
      inequality with every intermediate bounded (see _KS_CRIT_X10K /
      _KS_SMALL_N notes). No overflow path exists, ANSI or not.

    Cross-engine: Spark runs the divisions as decimal `div` (exact
    integral division → bigint), DuckDB as HUGEINT `//` — both exact
    floor division on nonnegative integers, bit-identical.
    """
    from pyspark.sql.window import Window

    src = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin(_KS_A, _KS_B))
        .select(
            F.floor(F.col("value") * 100).cast("bigint").alias("cell"),
            F.when(F.col("event_type") == _KS_A, 1).otherwise(0).alias("f1"),
            F.when(F.col("event_type") == _KS_B, 1).otherwise(0).alias("f2"),
        )
    )
    per_cell = src.groupBy("cell").agg(
        F.sum("f1").alias("s1"), F.sum("f2").alias("s2")
    )
    w = Window.orderBy("cell").rowsBetween(Window.unboundedPreceding, 0)
    cdf = per_cell.select(
        F.sum("s1").over(w).alias("c1"), F.sum("s2").over(w).alias("c2")
    )
    tot = src.agg(
        F.sum("f1").cast("bigint").alias("n1"),
        F.sum("f2").cast("bigint").alias("n2"),
    )
    dec = "decimal(38,0)"
    t1 = F.expr(f"cast(c1 as {dec}) * {_KS_S} div n1")
    t2 = F.expr(f"cast(c2 as {dec}) * {_KS_S} div n2")
    d_q = F.max(F.abs(t1 - t2))
    s2_lit = f"cast({_KS_CRIT_X10K} as {dec}) * (n1 + n2) * {_KS_S}L * {_KS_S}L"
    return (
        cdf.crossJoin(F.broadcast(tot))
        .groupBy("n1", "n2")
        .agg(d_q.alias("d_q"))
        .select(
            "n1",
            "n2",
            F.col("d_q").cast("bigint").alias("d_q8"),
            trunc_digits(F.col("d_q").cast("double") / _KS_S, 6).alias(
                "d_stat"
            ),
            F.expr(
                f"""
                CASE WHEN least(n1, n2) < {_KS_SMALL_N} THEN
                  cast(d_q as {dec}) * d_q * 10000 * n1 * n2 > {s2_lit}
                ELSE
                  cast(d_q as {dec}) * d_q * 10000
                    > ({s2_lit}) div (cast(n1 as {dec}) * n2)
                END
                """
            ).alias("reject_05"),
        )
    )


# ---------------------------------------------------------------------------
# quality_cusum_changepoint

_CUSUM_K_CENTS = 6000  # reference level: slightly above the ~50.0 mean
_CUSUM_H_CENTS = 20000  # alarm threshold


@query(
    "quality_cusum_changepoint",
    oracle=f"""
    WITH x AS (
      SELECT user_id, ts, event_id,
             CAST(round(value * 100) AS BIGINT) - {_CUSUM_K_CENTS} AS y
      FROM events
    ), p AS (
      SELECT user_id, ts, event_id,
             SUM(y) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt
      FROM x
    ), s AS (
      SELECT user_id, ts,
             pt - LEAST(MIN(pt) OVER (PARTITION BY user_id
               ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS st
      FROM p
    )
    SELECT user_id,
           CAST(MAX(st) AS BIGINT) AS max_cusum_cents,
           CAST(SUM(CASE WHEN st > {_CUSUM_H_CENTS} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_over,
           CAST(MIN(CASE WHEN st > {_CUSUM_H_CENTS} THEN epoch_us(ts) END)
                AS BIGINT) AS first_alarm_us
    FROM s
    GROUP BY user_id
    HAVING MAX(st) > {_CUSUM_H_CENTS}
    """,
)
def quality_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM change-point detection per user: alarm when the
    cumulative excess over a reference level k crosses threshold h —
    the sequential drift detector (Page 1954) behind burst/fraud
    screens.

    The textbook recursion S_t = max(0, S_{{t-1}} + x_t − k) looks
    inherently sequential, but it has a closed window form:
    S_t = P_t − min(0, min_{{j≤t}} P_j) with P the plain cumulative sum
    of (x_t − k) — so the whole detector is two ordered windows over
    one user_id exchange, no iteration, no UDF. Values are exact cents
    (2-decimal doubles ×100), so every S_t is a bit-identical integer
    in both engines. Output: per alarming user, the peak statistic,
    samples over threshold, and the first alarm time (epoch µs).
    """
    from pyspark.sql.window import Window

    x = table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        (F.round(F.col("value") * 100).cast("bigint") - _CUSUM_K_CENTS).alias(
            "y"
        ),
    )
    wp = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    p = x.select(
        "user_id", "ts", "event_id", F.sum("y").over(wp).alias("pt")
    )
    wm = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    s = p.select(
        "user_id",
        "ts",
        (
            F.col("pt") - F.least(F.min("pt").over(wm), F.lit(0).cast("bigint"))
        ).alias("st"),
    )
    return (
        s.groupBy("user_id")
        .agg(
            F.max("st").cast("bigint").alias("max_cusum_cents"),
            F.sum(F.when(F.col("st") > _CUSUM_H_CENTS, 1).otherwise(0))
            .cast("bigint")
            .alias("n_over"),
            F.min(
                F.when(F.col("st") > _CUSUM_H_CENTS, F.unix_micros("ts"))
            )
            .cast("bigint")
            .alias("first_alarm_us"),
        )
        .filter(F.col("max_cusum_cents") > _CUSUM_H_CENTS)
    )


# ---------------------------------------------------------------------------
# quality_autocorr_lag1

_AC_MIN_N = 10


@query(
    "quality_autocorr_lag1",
    oracle=f"""
    WITH pairs AS (
      SELECT user_id,
             CAST(round(value * 100) AS BIGINT) AS x,
             LEAD(CAST(round(value * 100) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS y
      FROM events
    ), m AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM pairs WHERE y IS NOT NULL
      GROUP BY user_id
      HAVING COUNT(*) >= {_AC_MIN_N}
    )
    SELECT user_id, n,
           (CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
              / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                 * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) * 1000000)
              AS DOUBLE) / 1000000) AS r_lag1
    FROM m
    WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
    """,
)
def quality_autocorr_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 serial correlation of each user's event-value series —
    the independence screen behind bot/replay detection (human streams
    decorrelate; scripted ones don't).

    Consecutive pairs come from one LEAD over the per-user order (one
    key exchange, deterministic tie-break by event_id); everything
    after is the sufficient-statistics pattern: six exact integer
    moments per user (values in cents), then Pearson r as one
    projection. The variance terms n·Σx²−(Σx)² stay under 2⁵³, so the
    int→double conversions are exact and each sqrt/divide is a single
    correctly-rounded IEEE op — bit-identical across engines, same
    trick as `events_ab_ttest`. At 100 TB: one shuffle, user-bounded
    window state, map-side-combinable moment agg.
    """
    from pyspark.sql.window import Window

    cents = F.round(F.col("value") * 100).cast("bigint")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = table(spark, sf_dir, "events").select(
        "user_id", cents.alias("x"), F.lead(cents).over(w).alias("y")
    ).filter(F.col("y").isNotNull())
    m = (
        pairs.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("x").cast("bigint").alias("sx"),
            F.sum("y").cast("bigint").alias("sy"),
            F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
            F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
            F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        )
        .filter(F.col("n") >= _AC_MIN_N)
    )
    varx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return (
        m.filter((varx > 0) & (vary > 0))
        .select(
            "user_id",
            "n",
            trunc_digits(
                num.cast("double")
                / (F.sqrt(varx.cast("double")) * F.sqrt(vary.cast("double"))),
                6,
            ).alias("r_lag1"),
        )
    )


# ---------------------------------------------------------------------------
# quality_k_anonymity

_KANON_K = 5


@query(
    "quality_k_anonymity",
    oracle=f"""
    WITH classes AS (
      SELECT user_id % 50 AS user_bucket, event_type,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day_num,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM events
      GROUP BY 1, 2, 3
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(SUM(CASE WHEN k < {_KANON_K} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_risky_classes,
           CAST(SUM(CASE WHEN k < {_KANON_K} THEN k ELSE 0 END) AS BIGINT)
             AS n_risky_rows,
           CAST(MIN(k) AS BIGINT) AS min_k
    FROM classes
    """,
)
def quality_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier tuple (coarsened
    user bucket, event type, day): every equivalence class with fewer
    than k={_KANON_K} rows is a re-identification risk — the privacy
    screen run BEFORE a dataset leaves the pipeline, complementing
    `pipeline_pii_scrub` (which removes direct identifiers; this
    measures what the remaining quasi-identifiers still leak).

    One map-side-combinable groupBy over the quasi-identifier tuple,
    then a single-row census (classes, risky classes, affected rows,
    worst k). Day numbers are integer epoch-day arithmetic — no
    timezone/rendering dependence. At 100 TB the class table is the
    only shuffled relation; generalization ladders (coarser buckets
    until min_k ≥ k) just re-run this same aggregate per rung.
    """
    classes = (
        table(spark, sf_dir, "events")
        .select(
            (F.col("user_id") % 50).alias("user_bucket"),
            "event_type",
            F.floor(F.unix_micros("ts") / 86_400_000_000)
            .cast("bigint")
            .alias("day_num"),
        )
        .groupBy("user_bucket", "event_type", "day_num")
        .agg(F.count(F.lit(1)).cast("bigint").alias("k"))
    )
    return classes.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.sum(F.when(F.col("k") < _KANON_K, 1).otherwise(0))
        .cast("bigint")
        .alias("n_risky_classes"),
        F.sum(F.when(F.col("k") < _KANON_K, F.col("k")).otherwise(0))
        .cast("bigint")
        .alias("n_risky_rows"),
        F.min("k").cast("bigint").alias("min_k"),
    )


@query(
    "quality_chisq_uniformity",
    oracle="""
    WITH hist AS (
      SELECT event_type, EXTRACT(hour FROM ts) AS hh, COUNT(*) AS obs
      FROM events GROUP BY event_type, EXTRACT(hour FROM ts)
    ), stats AS (
      SELECT event_type, CAST(SUM(obs) AS BIGINT) AS n,
             CAST(SUM(obs * obs) AS BIGINT) AS sum_sq
      FROM hist GROUP BY event_type
    )
    SELECT event_type, n,
           CAST(floor((24.0 * sum_sq / n - n) * 10000) AS DOUBLE) / 10000
             AS chi2,
           CAST(23 AS INT) AS dof
    FROM stats
    """,
)
def quality_chisq_uniformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square goodness-of-fit of hour-of-day traffic vs uniform.

    The seasonality screen behind "is this event source organic or
    scripted?": a bot replaying a dump hits a few hours hard and blows
    up χ². Uses the algebraic identity
    Σ(obs − n/24)²/(n/24) = 24·Σobs²/n − n, so the statistic is
    computed from two EXACT integer aggregates — the only double op is
    one division, truncated to 4 digits, making the oracle comparison
    exact rather than within-tolerance.

    Scale: two cheap aggregations (24·|types| intermediate rows), all
    map-side combinable; no window, no double accumulation drift.
    """
    hist = (
        table(spark, sf_dir, "events")
        .groupBy("event_type", F.hour("ts").alias("hh"))
        .agg(F.count(F.lit(1)).alias("obs"))
    )
    stats = hist.groupBy("event_type").agg(
        F.sum("obs").alias("n"),
        F.sum(F.col("obs") * F.col("obs")).alias("sum_sq"),
    )
    return stats.select(
        "event_type",
        "n",
        trunc_digits(
            F.lit(24.0) * F.col("sum_sq") / F.col("n") - F.col("n"), 4
        ).alias("chi2"),
        F.lit(23).cast("int").alias("dof"),
    )


@query(
    "quality_dp_noisy_counts",
    oracle="""
    WITH grp AS (
      SELECT source, COUNT(*) AS true_n, MIN(doc_id) AS seed
      FROM documents GROUP BY source
    ), noise AS (
      SELECT source, true_n,
             CAST((seed * 654435761 + 11 * 2654435789 + 97) % 1000000007
                  AS DOUBLE) / 1000000007 AS u1,
             CAST((seed * 654435761 + 12 * 2654435789 + 97) % 1000000007
                  AS DOUBLE) / 1000000007 AS u2
      FROM grp
    )
    SELECT source,
           GREATEST(
             CAST(floor((true_n + 2.0 * (u1 + u2 - 1.0)) * 100) AS DOUBLE)
               / 100, 0.0) AS noisy_n
    FROM noise
    """,
)
def quality_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential-privacy-shaped noisy histogram of documents per source.

    The release-gate counterpart of quality_k_anonymity: per-group
    counts (sensitivity 1) plus additive noise of scale b=2 (≈1/ε,
    ε=0.5), post-processed to the non-negative cone. The noise here is
    a DETERMINISTIC triangular(−b, b) stand-in — two arithmetic-hash
    uniforms summed — so both engines derive bit-identical releases and
    the pipeline is value-testable end to end; production swaps the
    hash uniforms for true Laplace draws (same plan, one expression).
    The true count never leaves the aggregation — only the noised,
    clamped value is projected.

    Scale: one map-side-combinable aggregation; noise is a per-group
    scalar expression, no shuffle beyond the groupBy.
    """
    p = 1_000_000_007
    a, b_, c = 654_435_761, 2_654_435_789, 97
    grp = (
        table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("true_n"),
            F.min("doc_id").alias("seed"),
        )
    )

    def u(salt: int):
        return (
            ((F.col("seed") * a + salt * b_ + c) % p).cast("double") / p
        )

    noisy = F.col("true_n") + 2.0 * (u(11) + u(12) - 1.0)
    return grp.select(
        "source",
        F.greatest(trunc_digits(noisy, 2), F.lit(0.0)).alias("noisy_n"),
    )


@query(
    "quality_seasonal_zscore",
    oracle="""
    WITH cents AS (
      SELECT event_id, event_type, EXTRACT(hour FROM ts) AS hh,
             CAST(round(value * 100) AS BIGINT) AS v
      FROM events
    ), stats AS (
      SELECT event_type, hh,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(v) AS BIGINT) AS s,
             CAST(SUM(v * v) AS BIGINT) AS ss
      FROM cents GROUP BY event_type, hh
    )
    SELECT c.event_id, c.event_type, c.hh,
           CAST(floor(
             (c.v * t.n - t.s) * sqrt((t.n - 1.0) / t.n)
               / sqrt(CAST(t.n * t.ss - t.s * t.s AS DOUBLE)) * 10000
           ) AS DOUBLE) / 10000 AS z
    FROM cents c JOIN stats t USING (event_type, hh)
    WHERE t.n > 1
      AND abs((c.v * t.n - t.s) * sqrt((t.n - 1.0) / t.n)
              / sqrt(CAST(t.n * t.ss - t.s * t.s AS DOUBLE))) > 2.5
    """,
)
def quality_seasonal_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-aware anomaly screen: z-score each event against its
    (event_type, hour-of-day) peer group, flag |z| > 2.5.

    The screen quality_anomaly_mad can't do: a $500 purchase at 3am is
    anomalous even if $500 purchases are normal at noon — seasonal
    peer-grouping catches it. The z-score is computed by the
    integer-algebra form z = (v·n − S)·√((n−1)/n)/√(n·Σv² − S²) over
    exact cents, so the only FP ops are two sqrts and a division on
    identical inputs — bit-deterministic, value-checked exactly.

    Scale: peer-group stats are |types|×24 rows broadcast back onto the
    stream; one map-side-combinable aggregation, no window, no second
    pass over raw events.
    """
    cents = table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.hour("ts").alias("hh"),
        F.round(F.col("value") * 100).cast("bigint").alias("v"),
    )
    stats = cents.groupBy("event_type", "hh").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("ss"),
    )
    z = (
        (F.col("v") * F.col("n") - F.col("s"))
        * F.sqrt((F.col("n") - 1.0) / F.col("n"))
        / F.sqrt(
            (F.col("n") * F.col("ss") - F.col("s") * F.col("s")).cast(
                "double"
            )
        )
    )
    return (
        cents.join(F.broadcast(stats), ["event_type", "hh"])
        .filter((F.col("n") > 1) & (F.abs(z) > 2.5))
        .select(
            "event_id",
            "event_type",
            "hh",
            trunc_digits(z, 4).alias("z"),
        )
    )


@query(
    "quality_mann_whitney",
    oracle="""
    WITH cents AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS v,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS s1
      FROM events WHERE event_type IN ('purchase', 'view')
    ), per_v AS (
      SELECT v, CAST(SUM(s1) AS BIGINT) AS c1,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM cents GROUP BY v
    ), ranked AS (
      SELECT v, c1, c,
             CAST(COALESCE(SUM(c) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cumbefore
      FROM per_v
    ), tot AS (
      SELECT CAST(SUM(c1) AS BIGINT) AS n1,
             CAST(SUM(c - c1) AS BIGINT) AS n2,
             CAST(SUM(c) AS BIGINT) AS n,
             CAST(SUM(c1 * (2 * cumbefore + c + 1)) AS BIGINT) AS r1x2,
             CAST(SUM(c * c * c - c) AS BIGINT) AS tie3
      FROM ranked
    )
    SELECT n1, n2,
           r1x2 - n1 * (n1 + 1) AS u1x2,
           CAST(floor(
             (r1x2 - n1 * (n1 + 1) - CAST(n1 AS DOUBLE) * n2) / 2
             / sqrt(CAST(n1 AS DOUBLE) * n2
                    * ((CAST(n AS DOUBLE) + 1) * n * (n - 1) - tie3)
                    / (12.0 * n * (n - 1)))
             * 10000) AS DOUBLE) / 10000 AS z
    FROM tot
    """,
)
def quality_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank test: do purchase and view values come from
    the same distribution? The non-parametric complement of the
    parametric events_ab_ttest and the distribution-shape KS test —
    robust to the heavy tails transaction values always have.

    Rank algebra stays EXACT: ranks come from cumulative counts over
    the DISTINCT cents values (average tie ranks scaled by 2 to stay
    integer), so U is exact (emitted as 2·U1), and the tie-corrected
    normal approximation z touches doubles only in the final
    sqrt/divide — value-checked exactly.

    Scale: the raw stream reduces to one row per distinct cents value
    (bounded domain) before the ranking window, so the unpartitioned
    cumulative sum runs over a value-domain-sized relation, not the
    event log; everything else is one-row algebra.
    """
    cents = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "view"))
        .select(
            F.round(F.col("value") * 100).cast("bigint").alias("v"),
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("s1"),
        )
    )
    per_v = cents.groupBy("v").agg(
        F.sum("s1").alias("c1"), F.count(F.lit(1)).alias("c")
    )
    from pyspark.sql.window import Window as W

    wb = W.orderBy("v").rowsBetween(W.unboundedPreceding, -1)
    ranked = per_v.select(
        "v",
        "c1",
        "c",
        F.coalesce(F.sum("c").over(wb), F.lit(0)).alias("cumbefore"),
    )
    tot = ranked.agg(
        F.sum("c1").alias("n1"),
        F.sum(F.col("c") - F.col("c1")).alias("n2"),
        F.sum("c").alias("n"),
        F.sum(
            F.col("c1") * (2 * F.col("cumbefore") + F.col("c") + 1)
        ).alias("r1x2"),
        F.sum(
            F.col("c") * F.col("c") * F.col("c") - F.col("c")
        ).alias("tie3"),
    )
    n1d = F.col("n1").cast("double")
    nd = F.col("n").cast("double")
    u1x2 = F.col("r1x2") - F.col("n1") * (F.col("n1") + 1)
    var = (
        n1d
        * F.col("n2")
        * ((nd + 1) * F.col("n") * (F.col("n") - 1) - F.col("tie3"))
        / (12.0 * F.col("n") * (F.col("n") - 1))
    )
    z = (u1x2 - n1d * F.col("n2")) / 2 / F.sqrt(var)
    return tot.select(
        "n1",
        "n2",
        u1x2.alias("u1x2"),
        trunc_digits(z, 4).alias("z"),
    )


@query(
    "quality_referential_integrity",
    oracle="""
    SELECT * FROM (
      SELECT 'orders.o_custkey -> customer.c_custkey' AS fk_edge,
             CAST((SELECT COUNT(*) FROM orders o
                   WHERE o.o_custkey IS NOT NULL
                     AND NOT EXISTS (SELECT 1 FROM customer c
                                     WHERE c.c_custkey = o.o_custkey))
                  AS BIGINT) AS n_orphans,
             CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_rows
      UNION ALL
      SELECT 'lineitem.l_orderkey -> orders.o_orderkey',
             CAST((SELECT COUNT(*) FROM lineitem l
                   WHERE l.l_orderkey IS NOT NULL
                     AND NOT EXISTS (SELECT 1 FROM orders o
                                     WHERE o.o_orderkey = l.l_orderkey))
                  AS BIGINT),
             CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT)
      UNION ALL
      SELECT 'customer.c_nationkey -> nation.n_nationkey',
             CAST((SELECT COUNT(*) FROM customer c
                   WHERE c.c_nationkey IS NOT NULL
                     AND NOT EXISTS (SELECT 1 FROM nation n
                                     WHERE n.n_nationkey = c.c_nationkey))
                  AS BIGINT),
             CAST((SELECT COUNT(*) FROM customer) AS BIGINT)
    ) t
    """,
)
def quality_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key orphan audit across the star schema's edges.

    The cross-TABLE data-quality check quality_expectations (per-table)
    can't express: for each declared FK edge, how many child rows
    reference a parent that doesn't exist. Orphans are what silently
    vanish from inner joins — auditing them is how a warehouse notices
    partial loads and broken CDC feeds before dashboards do.

    Shape: one LEFT ANTI join per edge (never EXISTS-per-row), each
    reduced to a single count — at 100 TB the parent key sides are
    dimension-sized broadcasts (or shuffled semi joins for fact→fact
    edges), and the audit reads each table once.
    """
    edges = [
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("customer", "c_nationkey", "nation", "n_nationkey"),
    ]
    out = None
    for child, ck, parent, pk in edges:
        c = table(spark, sf_dir, child)
        p = table(spark, sf_dir, parent).select(pk).distinct()
        orphans = (
            c.filter(F.col(ck).isNotNull())
            .join(p, c[ck] == p[pk], "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
        )
        row = orphans.crossJoin(
            F.broadcast(c.agg(F.count(F.lit(1)).alias("n_rows")))
        ).select(
            F.lit(f"{child}.{ck} -> {parent}.{pk}").alias("fk_edge"),
            F.col("n_orphans").cast("bigint"),
            F.col("n_rows").cast("bigint"),
        )
        out = row if out is None else out.unionByName(row)
    return out


@query(
    "quality_join_size_profile",
    oracle="""
    WITH o AS (
      SELECT o_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS c
      FROM orders GROUP BY o_orderkey
    ),
    l AS (
      SELECT l_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem GROUP BY l_orderkey
    ),
    prof AS (
      SELECT o.k, o.c * l.c AS contrib FROM o JOIN l ON o.k = l.k
    )
    SELECT CAST(SUM(contrib) AS BIGINT) AS join_rows,
           CAST(COUNT(*) AS BIGINT) AS n_matched_keys,
           CAST(MAX(contrib) AS BIGINT) AS max_key_rows,
           CAST(MIN(k) FILTER (WHERE contrib =
                (SELECT MAX(contrib) FROM prof)) AS BIGINT) AS heaviest_key,
           CAST((SELECT COUNT(*) FROM o) - COUNT(*) AS BIGINT)
             AS n_left_only_keys,
           CAST((SELECT COUNT(*) FROM l) - COUNT(*) AS BIGINT)
             AS n_right_only_keys
    FROM prof
    """,
)
def quality_join_size_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join pre-flight: the EXACT output cardinality and skew profile
    of orders⋈lineitem on the order key — computed WITHOUT running the
    join, from per-side key histograms.

    The 100 TB habit this encodes: before launching a fact⋈fact
    shuffle, join the two key profiles (each a map-side-combinable
    groupBy that is orders of magnitude smaller than its input) and
    read off Σ c_left·c_right — the true join size — plus the single
    heaviest key's contribution, the number you compare against a
    task's memory budget to decide between plain shuffle, AQE skew
    split, or salting. The profile join itself shuffles only distinct
    keys. Matched/left-only/right-only key counts double as
    referential-integrity telemetry. All arithmetic is integer-exact.
    """
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    oc = o.groupBy(F.col("o_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("c_o")
    )
    lc = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("c_l")
    )
    # One full-outer join of the two compact profiles carries matched
    # AND unmatched keys into a single final aggregation — no separate
    # driver-side .count() actions, one shuffle on the key.
    both = oc.join(lc, "k", "full_outer")
    matched = F.col("c_o").isNotNull() & F.col("c_l").isNotNull()
    contrib = F.when(matched, F.col("c_o") * F.col("c_l"))
    return both.agg(
        F.sum(contrib).cast("bigint").alias("join_rows"),
        F.count(contrib).alias("n_matched_keys"),
        F.max(contrib).cast("bigint").alias("max_key_rows"),
        # Ordering is NULL for unmatched keys, so max_by skips them
        # (like MAX) and yields NULL when zero keys match — matching
        # the oracle's ARG_MAX-over-empty behavior instead of letting
        # struct null-ordering pick an arbitrary unmatched key.
        F.max_by(
            "k",
            F.when(
                matched,
                F.struct(contrib.alias("c"), (-F.col("k")).alias("nk")),
            ),
        )
        .cast("bigint")
        .alias("heaviest_key"),
        F.sum(F.col("c_l").isNull().cast("int"))
        .cast("bigint")
        .alias("n_left_only_keys"),
        F.sum(F.col("c_o").isNull().cast("int"))
        .cast("bigint")
        .alias("n_right_only_keys"),
    )


# ---------------------------------------------------------------------------
# quality_fdr_bh — Benjamini–Hochberg step-up over exact Chebyshev bounds

_FDR_S = 100_000_000  # p-values live on this fixed integer scale
_FDR_ALPHA_INV = 20  # α = 0.05 → p ≤ i/(20·m) ⟺ 20·m·p_q ≤ i·S


def _fdr_bh_from(base: DataFrame) -> DataFrame:
    """BH step-up over per-segment Chebyshev p-bounds; ``base`` must
    have (segment STRING, cents BIGINT). Shared by the registered query
    and the planted-shift property test."""
    from pyspark.sql.window import Window

    dec = "decimal(38,0)"
    c = F.col("cents").cast(dec)
    seg = base.groupBy("segment").agg(
        F.count(F.lit(1)).cast(dec).alias("n"), F.sum(c).alias("s")
    )
    tot = base.agg(
        F.count(F.lit(1)).cast(dec).alias("nn"),
        F.sum(c).alias("t"),
        F.sum(c * c).alias("u"),
    )
    # Spark's `div` ALWAYS returns BIGINT — even on DECIMAL operands —
    # and silently WRAPS when the true quotient exceeds int64 in a
    # non-ANSI session. So every quotient here is VALUE-bounded by
    # construction (milli-cent means ≤ 10⁸, milli-cent² moments
    # ≤ 2.5·10¹⁵ for cents ≤ 10⁵), never row-count-dependent; the big
    # numerators stay DECIMAL(38,0) where width is honest.
    scored = seg.crossJoin(tot).select(
        "segment",
        F.col("n").cast("bigint").alias("n"),
        F.expr("s * 1000 div n").alias("mu_i"),
        F.expr("s * 1000 div n - t * 1000 div nn").alias("d"),
        F.expr(
            "u * 1000000 div nn - (t * 1000 div nn) * (t * 1000 div nn)"
        ).alias("v"),
    )
    p = (
        F.when(F.col("d") == 0, F.lit(_FDR_S))
        .when(F.expr(f"cast(v as {dec}) >= cast(n as {dec}) * d * d"), F.lit(_FDR_S))
        .otherwise(
            F.expr(f"cast(v as {dec}) * {_FDR_S} div (cast(n as {dec}) * d * d)")
        )
        .cast("bigint")
    )
    pvals = scored.select(
        "segment",
        F.col("n").alias("n_rows"),
        F.col("mu_i").cast("bigint").alias("mean_millicents"),
        p.alias("p_scaled"),
    )
    w = Window.orderBy("p_scaled", "segment")
    ranked = pvals.select(
        "*",
        F.row_number().over(w).cast("bigint").alias("rnk"),
        F.count(F.lit(1))
        .over(Window.partitionBy().rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .alias("m"),
    )
    cutoff = ranked.agg(
        F.max(
            F.when(
                F.col("p_scaled") * _FDR_ALPHA_INV * F.col("m")
                <= F.col("rnk") * _FDR_S,
                F.col("rnk"),
            ).otherwise(F.lit(0).cast("bigint"))
        ).alias("k_rej")
    )
    return (
        ranked.crossJoin(cutoff)
        .select(
            "segment",
            "n_rows",
            "mean_millicents",
            "p_scaled",
            "rnk",
            (F.col("rnk") <= F.col("k_rej")).alias("rejected"),
        )
        .orderBy("rnk")
    )


@query(
    "quality_fdr_bh",
    oracle=f"""
    WITH base AS (
      SELECT event_type || ':' ||
               CAST(COALESCE(CAST(props->>'$.k' AS BIGINT), -1) % 10
                    AS VARCHAR) AS segment,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    seg AS (
      SELECT segment, CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(CAST(cents AS HUGEINT)) AS HUGEINT) AS s
      FROM base GROUP BY segment
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS nn,
             CAST(SUM(CAST(cents AS HUGEINT)) AS HUGEINT) AS t,
             CAST(SUM(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS u
      FROM base
    ),
    scored AS (
      SELECT segment, n,
             s * 1000 // n AS mu_i,
             s * 1000 // n - t * 1000 // nn AS d,
             u * 1000000 // nn
               - (t * 1000 // nn) * (t * 1000 // nn) AS v
      FROM seg, tot
    ),
    pvals AS (
      SELECT segment, CAST(n AS BIGINT) AS n_rows,
             CAST(mu_i AS BIGINT) AS mean_millicents,
             CAST(CASE WHEN d = 0 THEN {_FDR_S}
                       WHEN v >= n * d * d THEN {_FDR_S}
                       ELSE v * {_FDR_S} // (n * d * d) END AS BIGINT)
               AS p_scaled
      FROM scored
    ),
    ranked AS (
      SELECT segment, n_rows, mean_millicents, p_scaled,
             CAST(ROW_NUMBER() OVER (ORDER BY p_scaled, segment) AS BIGINT)
               AS rnk,
             CAST(COUNT(*) OVER () AS BIGINT) AS m
      FROM pvals
    ),
    cutoff AS (
      SELECT MAX(CASE WHEN p_scaled * {_FDR_ALPHA_INV} * m <= rnk * {_FDR_S}
                      THEN rnk ELSE 0 END) AS k_rej
      FROM ranked
    )
    SELECT segment, n_rows, mean_millicents, p_scaled, rnk,
           rnk <= k_rej AS rejected
    FROM ranked, cutoff
    ORDER BY rnk
    """,
)
def quality_fdr_bh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini–Hochberg FDR step-up over per-segment mean-shift
    tests — the multiple-testing control a production drift monitor
    needs once it watches hundreds of segments at once (testing 50
    segments at α=0.05 yields ~2.5 false alarms per run uncorrected).

    Each (event_type × props.k mod 10) segment tests "segment mean
    value ≠ global mean". The p-value is the exact Chebyshev bound
    p ≤ σ²/(n·δ²) — conservative but DISTRIBUTION-FREE and computable
    in pure integer arithmetic on a fixed scale (milli-cents, p on
    scale 1e8), so the entire decision — sort, rank, step-up cutoff
    k = max{i : p₍ᵢ₎ ≤ i·α/m} — is bit-identical in both engines: no
    erf, no FP tail areas, no truncation boundaries. Milli (not
    micro) scale is deliberate: Spark's `div` always yields BIGINT,
    and every milli-scale quotient is value-bounded by construction
    (mean ≤ 10⁸ milli-cents, moments ≤ 10¹⁶ milli-cents² for cents
    ≤ 10⁵) — micro scale would push E[c²]·10¹² past int64 and wrap.
    On the uniform fixtures every segment correctly ACCEPTS
    (Chebyshev at these n rejects only real shifts); the
    planted-shift property test drives the rejection path
    (tests/test_structural_guards.py::test_fdr_bh_planted_shift_rejects).

    Scale posture: one scan → per-segment (n, Σcents) + one global
    (N, T, Σcents²) moment row (map-side combinable); everything
    after runs on the ≤55-row domain-bounded segment census (the
    unpartitioned rank window rides that census, never data-sized —
    plan-sweep allowlisted like the KS cent-grid). All intermediates
    bounded in DECIMAL(38,0)/HUGEINT up to 10¹² rows/segment with
    cents ≤ 10⁵: u·10⁶ ≤ 2.5·10²⁸, n·d² ≤ 2.5·10²⁸ — inside
    DECIMAL(38,0); quotients only materialize when v < n·d² so they
    fit BIGINT by construction.
    """
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    base = ev.select(
        F.concat_ws(
            ":",
            F.col("event_type"),
            (F.coalesce(k, F.lit(-1)) % 10).cast("string"),
        ).alias("segment"),
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    return _fdr_bh_from(base)
