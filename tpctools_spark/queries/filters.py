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
