"""Correlated / scalar subqueries via the raw-SQL interface.

The engine's ``spark.sql`` entry point (views from
:func:`tpctools_spark.catalog.register_views`) — exercising Catalyst's
subquery decorrelation (SURVEY.md §4.2), which rewrites correlated
EXISTS/scalar subqueries into joins + aggregates. Each query is ONE
ANSI-SQL string executed verbatim by both Spark and the DuckDB oracle,
so the check also proves dialect-portable SQL support.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from tpctools_spark.catalog import register_views
from tpctools_spark.registry import query

# TPC-H Q17 shape: parts whose small orders fall under 20% of that
# part's average quantity — correlated SCALAR subquery per outer row.
_Q17_SQL = """
SELECT l.l_partkey,
       COUNT(*) AS n_small_orders,
       ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE), 2)
         AS small_order_revenue
FROM lineitem l
WHERE l.l_quantity < (
    SELECT 0.2 * AVG(l2.l_quantity)
    FROM lineitem l2
    WHERE l2.l_partkey = l.l_partkey
)
GROUP BY l.l_partkey
"""

# TPC-H Q4 shape: order priorities counted over orders having at least
# one line shipped after a cutoff — correlated EXISTS.
_Q4_SQL = """
SELECT o.o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE CAST(o.o_orderdate AS DATE) >= DATE '1997-01-01'
  AND CAST(o.o_orderdate AS DATE) < DATE '1997-07-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND CAST(l.l_shipdate AS DATE) > DATE '1998-06-01'
  )
GROUP BY o.o_orderpriority
"""


def _run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(sql)


@query("subquery_scalar_correlated", oracle=_Q17_SQL)
def subquery_scalar_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (TPC-H Q17 shape).

    Catalyst decorrelates the per-part average into one aggregate over
    lineitem joined back on partkey — two scans, one shuffle each,
    instead of a subquery per row. AVG of a double is order-dependent
    in the last bits, but the 0.2·avg threshold sits far from any
    l_quantity value (integers 1..50 in the fixtures), so the predicate
    cannot flip between engines.
    """
    return _run_sql(spark, sf_dir, _Q17_SQL)


@query("subquery_exists_correlated", oracle=_Q4_SQL)
def subquery_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS (TPC-H Q4 shape) → decorrelated to a left-semi
    join on orderkey; both date predicates push to their scans."""
    return _run_sql(spark, sf_dir, _Q4_SQL)


_ANY_ALL_ORACLE = """
SELECT s_suppkey, s_name,
       s_acctbal > ALL (SELECT c_acctbal FROM customer
                        WHERE c_nationkey = s_nationkey
                          AND c_mktsegment = 'MACHINERY') AS beats_all,
       s_acctbal > ANY (SELECT c_acctbal FROM customer
                        WHERE c_nationkey = s_nationkey
                          AND c_mktsegment = 'MACHINERY') AS beats_any
FROM supplier
"""


@query("subquery_any_all", oracle=_ANY_ALL_ORACLE)
def subquery_any_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantified comparisons (`> ALL` / `> ANY`) — the one classic
    subquery form Spark SQL does not parse, lowered to its join
    equivalent: each supplier against the MACHINERY customers of its
    own nation.

    The reduction is the textbook one — `x > ALL (S)` ⇔ `x > max(S)`,
    `x > ANY (S)` ⇔ `x > min(S)` — but the empty-set semantics are the
    part naive rewrites get wrong: ALL over an empty set is TRUE, ANY
    is FALSE. The MACHINERY segment filter deliberately leaves some
    nations customer-less so both paths are exercised; the left join's
    NULL aggregate is resolved by COALESCE to each quantifier's
    empty-set identity. (With NULLs in the subquery column the
    quantifier would be three-valued; c_acctbal is NOT NULL in the
    schema, which is what licenses the min/max rewrite.)

    Scale: the per-nation extrema table is nation-cardinality (tiny),
    broadcast to the supplier scan — zero shuffles on the big side.
    """
    from pyspark.sql import functions as F

    from tpctools_spark.catalog import table

    cust = table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "MACHINERY"
    )
    extrema = cust.groupBy("c_nationkey").agg(
        F.max("c_acctbal").alias("mx"), F.min("c_acctbal").alias("mn")
    )
    sup = table(spark, sf_dir, "supplier")
    return (
        sup.join(
            F.broadcast(extrema),
            sup.s_nationkey == extrema.c_nationkey,
            "left",
        )
        .select(
            "s_suppkey",
            "s_name",
            F.coalesce(F.col("s_acctbal") > F.col("mx"), F.lit(True)).alias(
                "beats_all"
            ),
            F.coalesce(F.col("s_acctbal") > F.col("mn"), F.lit(False)).alias(
                "beats_any"
            ),
        )
    )


_NOT_IN_NULL_SQL = """
SELECT
  (SELECT COUNT(*) FROM customer WHERE c_custkey NOT IN
     (SELECT o_custkey FROM orders WHERE o_totalprice > 450000))
    AS not_in_clean,
  (SELECT COUNT(*) FROM customer WHERE c_custkey NOT IN
     (SELECT o_custkey FROM orders WHERE o_totalprice > 450000
      UNION ALL SELECT CAST(NULL AS BIGINT)))
    AS not_in_with_null
"""


@query("subquery_not_in_null_aware", oracle=_NOT_IN_NULL_SQL)
def subquery_not_in_null_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN under three-valued logic — the classic NULL trap, and a
    distinct physical operator in Spark (null-aware anti join).

    `x NOT IN (S)` is `x <> s1 AND x <> s2 AND …`: one NULL in S makes
    every conjunct UNKNOWN, so the predicate never passes and the result
    is EMPTY — not "all rows except the matches" as the naive anti-join
    rewrite would return. The query states both sides of the trap in one
    row: the clean subquery gives the expected survivor count, the
    null-planted one must give exactly 0. Catalyst compiles the latter
    to a null-aware anti join (broadcast + null-check fast path) rather
    than a plain LeftAnti — the same SQL text runs verbatim on both
    engines, so the semantics (not just the count) are cross-checked.

    Scale: both branches are anti joins of customer against an orders
    aggregate; the subquery side is the broadcast build side.
    """
    return _run_sql(spark, sf_dir, _NOT_IN_NULL_SQL)


_RECURSIVE_CTE_SQL = """
WITH RECURSIVE months(m) AS (
  SELECT DATE '1996-01-01'
  UNION ALL
  SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM months
  WHERE m < DATE '1997-12-01'
)
SELECT CAST(year(m) * 100 + month(m) AS BIGINT) AS ym,
       CAST(COALESCE(r.cnt, 0) AS BIGINT) AS n_orders,
       CAST(COALESCE(r.rev_d, 0.0) AS DOUBLE) AS revenue
FROM months LEFT JOIN (
  SELECT year(CAST(o_orderdate AS DATE)) * 100
           + month(CAST(o_orderdate AS DATE)) AS ym2,
         COUNT(*) AS cnt,
         ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 2)
           AS rev_d
  FROM orders GROUP BY 1
) r ON year(m) * 100 + month(m) = r.ym2
"""


@query("subquery_recursive_cte", oracle=_RECURSIVE_CTE_SQL)
def subquery_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (WITH RECURSIVE, new in Spark 4) — a 24-month
    calendar spine generated by the recursion itself, left-joined to
    monthly order revenue so empty months surface as explicit zeros.

    The recursion is the SQL-standard iterate-until-empty loop — the
    same construct that expresses org charts, BOM explosions, and
    transitive closures — running natively in Catalyst (UnionLoop)
    rather than through a driver-side Python loop. The identical SQL
    text runs on the DuckDB oracle, so the engines' recursion semantics
    (anchor + step, termination) are value-checked against each other.

    Scale: the recursive spine is calendar-sized (constant); the
    monthly aggregate is one hash shuffle of orders; the join
    broadcasts the spine.
    """
    return _run_sql(spark, sf_dir, _RECURSIVE_CTE_SQL)


# LATERAL top-N-per-group: each customer's 3 highest-value orders via a
# correlated LATERAL derived table with ORDER BY + LIMIT — the SQL:1999
# construct that expresses per-row subtable computations. One SQL text,
# both engines.
_LATERAL_TOPN_SQL = """
SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey,
       ROUND(CAST(t.o_totalprice AS DOUBLE), 2) AS price
FROM customer c,
LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 3
) t
"""


@query("subquery_lateral_topn", oracle=_LATERAL_TOPN_SQL)
def subquery_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL join with per-row ORDER BY + LIMIT: each customer's top-3
    orders by value — the standard top-N-per-group in its SQL:1999
    correlated-derived-table form.

    What the check proves: Catalyst DECORRELATES the lateral — the
    physical plan is a partitioned ``WindowGroupLimit`` (rank ≤ 3 per
    customer key, state bounded at N per group) feeding one hash join,
    NOT a per-outer-row subquery execution and NOT a nested loop
    (verified: 0 CartesianProduct / 0 BNLJ in the executed plan). That
    rewrite is what makes the construct usable at 100 TB: top-N runs
    as one shuffle on the correlation key. The deterministic tie-break
    (price DESC, then order key) makes the picked rows — not just the
    aggregate — engine-exact, and the identical SQL text runs verbatim
    on the DuckDB oracle, which evaluates LATERAL natively.
    """
    return _run_sql(spark, sf_dir, _LATERAL_TOPN_SQL)
