"""Benchmark facade: the reference's ``Tpc`` trait as a Python ABC.

Parity with ``/root/reference/src/lib.rs:28-43`` (trait: table names,
schema lookup, table extension, generate) and ``src/main.rs:113-118``
(``create_benchmark`` string dispatch). ``generate`` runs natively on
Spark instead of shelling out to dbgen/dsdgen, and each benchmark also
exposes ``convert`` (the lib.rs free functions, scoped per benchmark).
"""

from __future__ import annotations

from abc import ABC, abstractmethod

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


class Tpc(ABC):
    """A benchmark: named tables with declared schemas and a native,
    partition-invariant generator (reference trait src/lib.rs:28-43)."""

    #: raw-file extension of the external generator's output
    table_ext: str

    @abstractmethod
    def table_names(self) -> list[str]: ...

    @abstractmethod
    def schema(self, table: str) -> StructType: ...

    @abstractmethod
    def build_table(
        self, spark: SparkSession, table: str, scale: float, partitions: int
    ) -> DataFrame: ...

    @abstractmethod
    def generate(
        self,
        spark: SparkSession,
        scale: float,
        partitions: int,
        output_dir: str,
        **kw,
    ) -> dict[str, float]: ...

    def convert(
        self,
        spark: SparkSession,
        input_dir: str,
        output_dir: str,
        **kw,
    ) -> dict[str, float]:
        """Raw pipe-delimited dirs → parquet for this benchmark's tables."""
        from tpctools_spark.convert import convert_to_parquet

        schemas = {t: self.schema(t) for t in self.table_names()}
        kw.setdefault("table_ext", self.table_ext)
        return convert_to_parquet(
            spark, input_dir, output_dir,
            tables=self.table_names(), schemas=schemas, **kw,
        )


class TpcH(Tpc):
    """TPC-H: 8 tables (reference src/tpch.rs:134-138)."""

    table_ext = ".tbl"

    def table_names(self) -> list[str]:
        from tpctools_spark.schemas import TPCH_TABLE_NAMES

        return TPCH_TABLE_NAMES

    def schema(self, table: str) -> StructType:
        from tpctools_spark.schemas import TPCH_REFERENCE

        return TPCH_REFERENCE[table]

    def build_table(self, spark, table, scale, partitions):
        from tpctools_spark.generate import build_table

        return build_table(spark, table, scale, partitions)

    def generate(self, spark, scale, partitions, output_dir, **kw):
        from tpctools_spark.generate import generate

        return generate(spark, scale, partitions, output_dir, **kw)


class TpcDs(Tpc):
    """TPC-DS: 24 tables (reference src/tpcds.rs:106-133)."""

    table_ext = ".dat"

    def table_names(self) -> list[str]:
        from tpctools_spark.schemas_tpcds import TPCDS_TABLE_NAMES

        return TPCDS_TABLE_NAMES

    def schema(self, table: str) -> StructType:
        from tpctools_spark.schemas_tpcds import TPCDS

        return TPCDS[table]

    def build_table(self, spark, table, scale, partitions):
        from tpctools_spark.generate_tpcds import build_tpcds_table

        return build_tpcds_table(spark, table, scale, partitions)

    def generate(self, spark, scale, partitions, output_dir, **kw):
        from tpctools_spark.generate_tpcds import generate_tpcds

        return generate_tpcds(spark, scale, partitions, output_dir, **kw)


def create_benchmark(name: str) -> Tpc:
    """String → benchmark dispatch (reference src/main.rs:113-118)."""
    key = name.lower()
    if key in ("tpch", "tpc-h"):
        return TpcH()
    if key in ("tpcds", "tpc-ds"):
        return TpcDs()
    raise ValueError(f"invalid benchmark name: {name}")
