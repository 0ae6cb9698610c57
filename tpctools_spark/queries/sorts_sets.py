"""§2.B.6 — sort / limit / top-k / set operations.

The driver's value-hash is order-insensitive, so sortedness is verified
via a materialized rank column (SURVEY.md §2.B.6). ``topk_limit``
compiles to TakeOrderedAndProject — each partition keeps k rows, the
driver merges; no global sort at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tpctools_spark.catalog import table
from tpctools_spark.queries._util import global_rank
from tpctools_spark.registry import query


@query(
    "sort_multi_key",
    oracle="""
    SELECT c_custkey, c_mktsegment, ROUND(c_acctbal, 2) AS acctbal,
           ROW_NUMBER() OVER (ORDER BY c_mktsegment ASC,
                              c_acctbal DESC NULLS LAST, c_custkey) AS sort_rank
    FROM customer
    """,
)
def sort_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with explicit null placement, verified via rank.

    The global ROW_NUMBER is the verification device for the
    order-insensitive hash; customer-cardinality grows with the data,
    so it is computed with the two-pass distributed rank
    (``global_rank``: range-partitioned local windows + broadcast
    per-partition offsets) — never a single-partition window.
    """
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    return global_rank(
        cust,
        [
            F.col("c_mktsegment").asc(),
            F.col("c_acctbal").desc_nulls_last(),
            F.col("c_custkey"),
        ],
        rn="sort_rank",
    ).select(
        "c_custkey",
        "c_mktsegment",
        F.round("c_acctbal", 2).alias("acctbal"),
        "sort_rank",
    )


@query(
    "topk_limit",
    oracle="""
    SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def topk_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 orders by price (TakeOrderedAndProject).

    Ties broken by o_orderkey so the row set is deterministic.
    """
    return (
        table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 2).alias("totalprice"),
        )
    )


_UNION_ORACLE_BODY = """
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'FURNITURE'
      {kw}
      SELECT c_custkey FROM customer WHERE c_acctbal > 5000
"""


@query(
    "set_union_all",
    oracle=f"""
    SELECT c_custkey, COUNT(*) AS multiplicity
    FROM ({_UNION_ORACLE_BODY.format(kw="UNION ALL")})
    GROUP BY c_custkey
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag semantics) — multiplicity 2 marks the overlap."""
    c = table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "FURNITURE").select("c_custkey")
    b = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return (
        a.unionByName(b)
        .groupBy("c_custkey")
        .agg(F.count(F.lit(1)).alias("multiplicity"))
    )


@query(
    "set_union_distinct",
    oracle=_UNION_ORACLE_BODY.format(kw="UNION"),
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (set semantics) — unionByName + distinct."""
    c = table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "FURNITURE").select("c_custkey")
    b = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return a.unionByName(b).distinct()


@query(
    "set_intersect",
    oracle=_UNION_ORACLE_BODY.format(kw="INTERSECT"),
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (TPC-DS Q8/Q38 pattern) — compiles to a left-semi join."""
    c = table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "FURNITURE").select("c_custkey")
    b = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return a.intersect(b)


@query(
    "set_except",
    oracle=_UNION_ORACLE_BODY.format(kw="EXCEPT"),
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (TPC-DS Q87 pattern) — compiles to a left-anti join."""
    c = table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "FURNITURE").select("c_custkey")
    b = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return a.exceptAll(b).distinct()


@query(
    "set_intersect_all",
    oracle="""
    SELECT o_custkey FROM (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      INTERSECT ALL
      SELECT o_custkey FROM orders WHERE o_totalprice > 100000
    ) t
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag semantics: a key appearing m times on the
    left and n on the right survives min(m, n) times. The multiplicity
    matters whenever rows carry weight (billing lines, samples): the
    DISTINCT form silently collapses it. Compiles to a hash join on
    (value, replicated min-count), not a distinct." """
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_totalprice") > 100000).select("o_custkey")
    return a.intersectAll(b)


@query(
    "set_except_all",
    oracle="""
    SELECT o_custkey FROM (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      EXCEPT ALL
      SELECT o_custkey FROM orders WHERE o_totalprice > 100000
    ) t
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag difference: m left copies minus n right copies
    leaves max(m − n, 0) survivors, the semantics reconciliation
    workloads need (every unmatched occurrence is a discrepancy to
    count, not a key to report once)."""
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_totalprice") > 100000).select("o_custkey")
    return a.exceptAll(b)
