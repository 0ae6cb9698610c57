"""The table loader must never surface TIMESTAMP_NTZ, even when the
caller's session pins NTZ inference on (a driver-owned session did in
round 3 and two event-time queries died on ``unix_micros``)."""

from __future__ import annotations

from pyspark.sql.types import TimestampNTZType, TimestampType

from tpctools_spark.catalog import table

SF = "/root/testdata/sf0.001"


def test_events_ts_is_ltz_under_ntz_pinned_session(spark):
    real_set = spark.conf.set
    orig = spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled", "true")

    def pinned(k, v):
        if k == "spark.sql.parquet.inferTimestampNTZ.enabled":
            return  # simulate a caller session that rejects the pin
        real_set(k, v)

    spark.conf.set = pinned
    try:
        real_set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        df = table(spark, SF, "events")
        assert isinstance(df.schema["ts"].dataType, TimestampType)
        assert not any(
            isinstance(f.dataType, TimestampNTZType) for f in df.schema.fields
        )
        # epoch arithmetic must resolve (this is what round 3 lost)
        from pyspark.sql import functions as F

        df.select(F.unix_micros("ts")).limit(1).collect()
    finally:
        spark.conf.set = real_set
        real_set("spark.sql.parquet.inferTimestampNTZ.enabled", orig)


def test_orders_orderdate_is_ltz_under_ntz_pinned_session(spark):
    orig = spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    real_set = spark.conf.set
    try:
        real_set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        spark.conf.set = lambda k, v: None  # every conf.set refused
        df = table(spark, SF, "orders")
        assert isinstance(df.schema["o_orderdate"].dataType, TimestampType)
    finally:
        spark.conf.set = real_set
        real_set("spark.sql.parquet.inferTimestampNTZ.enabled", orig)
