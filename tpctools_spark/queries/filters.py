"""§2.B.2 — projection / filter / predicates.

Both queries compile to a single parquet scan with pushed filters and a
pruned ``ReadSchema`` — verify with ``df.explain("formatted")``. At 100 TB
these run at scan speed; no shuffle is involved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tpctools_spark.catalog import table
from tpctools_spark.queries._util import money, rate, trunc_digits
from tpctools_spark.registry import query


@query(
    "project_rename_cast",
    oracle="""
    SELECT c_custkey AS cust_id,
           CAST(c_nationkey AS BIGINT) AS nation_id,
           upper(c_mktsegment) AS segment,
           ROUND(c_acctbal, 2) AS acctbal
    FROM customer
    """,
)
def project_rename_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """select / alias / cast — the typed-CSV coercion of reference A1
    (src/lib.rs:55-58) made explicit as a projection."""
    return table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("cust_id"),
        F.col("c_nationkey").cast("bigint").alias("nation_id"),
        F.upper("c_mktsegment").alias("segment"),
        F.round("c_acctbal", 2).alias("acctbal"),
    )


@query(
    "filter_pred",
    oracle="""
    SELECT CAST(floor(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                           * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) * 100) AS DOUBLE) / 100
             AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
      AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
      AND l_discount BETWEEN 0.02 AND 0.04
      AND l_quantity < 25
      AND l_returnflag IN ('A', 'N')
    """,
)
def filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped conjunctive predicates (range + BETWEEN + IN).

    All five predicates push down into the parquet scan; the aggregate is
    a partial+final sum with no grouping — the cheapest possible plan.
    """
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate").cast("date") >= F.lit("1997-01-01").cast("date"))
            & (F.col("l_shipdate").cast("date") < F.lit("1998-01-01").cast("date"))
            & F.col("l_discount").between(0.02, 0.04)
            & (F.col("l_quantity") < 25)
            & F.col("l_returnflag").isin("A", "N")
        )
        .agg(
            trunc_digits(
                F.sum(money(F.col("l_extendedprice")) * rate(F.col("l_discount"))).cast(
                    "double"
                ),
                2,
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@query(
    "sample_hash_split",
    oracle="""
    WITH bucketed AS (
      SELECT doc_id, lang, (doc_id * 2654435761) % 100 AS bucket
      FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'valid'
                ELSE 'test' END AS split
    FROM bucketed
    WHERE bucket >= 80
    """,
)
def sample_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/valid/test assignment by multiplicative hash.

    The split is a pure function of the stable row key (Knuth's 2^32/φ
    multiplier, exact int64 arithmetic — no engine-specific hash, no
    rand()), so membership is reproducible across engines, runs, and
    repartitionings, and a row never migrates between splits when the
    corpus grows. The predicate evaluates at the scan: selecting the
    10%+10% eval slices never shuffles or materializes the 80%.
    """
    docs = table(spark, sf_dir, "documents")
    bucket = F.pmod(F.col("doc_id") * F.lit(2654435761), F.lit(100))
    return (
        docs.select(
            "doc_id",
            "lang",
            F.when(bucket < 80, "train")
            .when(bucket < 90, "valid")
            .otherwise("test")
            .alias("split"),
        )
        .filter(bucket >= 80)
    )


# Poisson(1) inverse-CDF thresholds, floor(CDF(k) * 1e6) for k = 0..7:
# a uniform draw u ∈ [0, 1e6) maps to replication count
# k = #{t in thresholds : u >= t}. P(k=8) truncates ~1e-5 of mass —
# documented cap, identical in both engines.
_POIS1_CDF_1E6 = [367879, 735758, 919698, 981011, 996340, 999405, 999916, 999989]
_BOOT_REPS = 8
# Mixing prime for the (key, rep) draw. An affine map alone
# (k·A + rep·B mod 1e6) would make one row's B replicate draws a
# LATTICE — perfectly correlated, so the replicate spread understates
# the true resampling variance. The quadratic round (h² mod P) is
# nonlinear in rep, decorrelating replicates while staying exact
# bigint arithmetic in both engines (h < P ≈ 1e9 ⇒ h² < 1e18 fits).
_BOOT_P = 1_000_000_007


def _poisson_bootstrap_sql() -> str:
    ks = " + ".join(
        f"CAST(u >= {t} AS BIGINT)" for t in _POIS1_CDF_1E6
    )
    return f"""
    WITH base AS (
      SELECT o_orderkey,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               AS cents
      FROM orders
    ),
    mixed AS (
      SELECT r.rep, b.cents,
             (b.o_orderkey * 2654435761 + (r.rep + 1) * 96431)
               % {_BOOT_P} AS h
      FROM base b, (SELECT unnest(generate_series(0, {_BOOT_REPS - 1}))
                    AS rep) r
    ),
    draws AS (
      SELECT rep, cents, ((h * h % {_BOOT_P}) * 97 + h) % {_BOOT_P}
               % 1000000 AS u
      FROM mixed
    ),
    weighted AS (SELECT rep, cents, {ks} AS w FROM draws)
    SELECT rep,
           CAST(SUM(w) AS BIGINT) AS n_eff,
           CAST(SUM(w * cents) AS BIGINT) AS sum_cents,
           CAST(SUM(w * cents) AS DOUBLE) / CAST(SUM(w) AS DOUBLE)
             AS boot_mean_cents
    FROM weighted
    GROUP BY rep
    ORDER BY rep
    """


@query("sample_poisson_bootstrap", oracle=_poisson_bootstrap_sql())
def sample_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap: B resampled replicates of a population mean in
    ONE pass, with NO resampling shuffle — the only bootstrap that works
    when the data cannot be materialized B times.

    Classic bootstrap draws N rows with replacement per replicate —
    an O(B·N) shuffle of data. The Poisson approximation replaces the
    multinomial with per-row independent Poisson(1) replication
    WEIGHTS: each row contributes to replicate r with weight k drawn
    from Poisson(1), computed row-locally, so the whole estimate is one
    explode(B) + one map-side-combinable weighted aggregation — B·P
    partial rows shuffle, never the data. The draw hashes (stable key,
    replicate) through an affine-then-QUADRATIC mix mod a prime (see
    _BOOT_P: affine alone would lattice-correlate one row's replicates)
    and the exact integer inverse CDF (floor(CDF·1e6) thresholds), so
    every replicate is reproducible across engines, runs, and
    repartitionings — no rand(), no seed plumbing. Counts and cent-sums are exact integers; the mean
    is a single IEEE division of two bigints, bit-stable cross-engine.
    The spread of ``boot_mean_cents`` across the B rows IS the standard
    error a 100 TB pipeline reports without a second pass.
    """
    base = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    h = (
        F.col("o_orderkey") * F.lit(2654435761).cast("bigint")
        + (F.col("rep") + 1) * 96431
    ) % _BOOT_P
    draws = base.select(
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_REPS - 1))).alias("rep"),
        F.col("o_orderkey"),
    ).select(
        "rep",
        "cents",
        h.alias("h"),
    ).select(
        "rep",
        "cents",
        (
            ((F.col("h") * F.col("h") % _BOOT_P) * 97 + F.col("h"))
            % _BOOT_P
            % 1000000
        ).alias("u"),
    )
    w = sum(
        (F.col("u") >= t).cast("bigint") for t in _POIS1_CDF_1E6
    )
    return (
        draws.select("rep", "cents", w.alias("w"))
        .groupBy("rep")
        .agg(
            F.sum("w").cast("bigint").alias("n_eff"),
            F.sum(F.col("w") * F.col("cents")).cast("bigint").alias("sum_cents"),
            (
                F.sum(F.col("w") * F.col("cents")).cast("double")
                / F.sum("w").cast("double")
            ).alias("boot_mean_cents"),
        )
        .orderBy("rep")
    )
