"""Driver contract for the spark-graft builder (PySpark target).

Backed by :mod:`tpctools_spark` — a PySpark-native engine covering the
reference surface of ``datafusion-contrib/tpctools`` (SURVEY.md §2.A)
plus the declared analytic/LLM-pipeline inventory (SURVEY.md §2.B).
Every oracle-checked query lives in ``tpctools_spark/queries/`` with its
DuckDB twin registered alongside it.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

FLAGSHIP_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on sf0.001."""
    from tpctools_spark.registry import spark_queries

    return spark_queries()["agg_group_sum"](spark, FLAGSHIP_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from tpctools_spark.registry import spark_queries

    return spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB ANSI-SQL twins for every SQL-expressible query."""
    from tpctools_spark.registry import oracle_queries

    return oracle_queries()
