"""The streaming family on the RocksDB state store.

Local runs default to the in-memory HDFS-backed state store; a real
cluster runs RocksDB (bounded executor memory, changelog checkpoints).
This proves the registered stateful streaming shapes produce IDENTICAL
results on the scale-grade backend — the conf is per-query-start, so
one session flips it and compares.
"""

from __future__ import annotations

import pytest

from tpctools_spark.registry import spark_queries

SF = "/root/testdata/sf0.001"
_ROCKS = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)
_CONF = "spark.sql.streaming.stateStore.providerClass"


@pytest.mark.parametrize(
    "name",
    ["stream_stateful_count", "stream_session_window", "stream_dedup_watermark"],
)
def test_stateful_stream_matches_on_rocksdb(spark, name):
    qs = spark_queries()
    default_rows = sorted(map(tuple, qs[name](spark, SF).collect()))
    old = spark.conf.get(_CONF, None)
    spark.conf.set(_CONF, _ROCKS)
    try:
        rocks_rows = sorted(map(tuple, qs[name](spark, SF).collect()))
    finally:
        if old is None:
            spark.conf.unset(_CONF)
        else:
            spark.conf.set(_CONF, old)
    assert rocks_rows == default_rows and len(rocks_rows) > 0
