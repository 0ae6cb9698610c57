"""Custom Python DataSource (Spark 4 DataSource V2 Python API).

A deterministic partitioned "sensor feed" source, written entirely in
Python against ``pyspark.sql.datasource`` — the API that lets a team
ship a custom connector (internal service, proprietary format, REST
feed) without touching the JVM. The reference's only sources are CSV
and Parquet (``/root/reference/src/lib.rs:55-58, 181-205``); this
demonstrates the extension point a Spark-native engine offers beyond
that fixed menu.

Scale design: the source reports N independent ``InputPartition``s and
each executor reads only its own partition's rows (a pure function of
(partition id, row offset) — no driver-side data, no state). Readers
on a real connector would map partitions to shards/offset ranges the
same way; filter pushdown arrives via ``pushFilters`` in newer APIs.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

SENSOR_SCHEMA = "reading_id BIGINT, sensor_id BIGINT, reading DOUBLE"

# Deterministic reading: pure integer arithmetic, replicable in SQL.
_P = 1_000_000_007
_A = 654_435_747


class SensorFeedReader(DataSourceReader):
    def __init__(self, options):
        self._n_parts = int(options.get("partitions", "4"))
        self._rows_per_part = int(options.get("rowsperpartition", "250"))
        self._n_sensors = int(options.get("sensors", "16"))

    def partitions(self):
        return [InputPartition(i) for i in range(self._n_parts)]

    def read(self, partition):
        base = partition.value * self._rows_per_part
        for off in range(self._rows_per_part):
            rid = base + off
            h = (rid * _A) % _P
            yield (rid, h % self._n_sensors, float(h % 10_000) / 100.0)


class SensorFeedSource(DataSource):
    """``spark.read.format("sensor_feed")`` after
    ``spark.dataSource.register(SensorFeedSource)``."""

    @classmethod
    def name(cls) -> str:
        return "sensor_feed"

    def schema(self) -> str:
        return SENSOR_SCHEMA

    def reader(self, schema) -> SensorFeedReader:
        return SensorFeedReader(self.options)
