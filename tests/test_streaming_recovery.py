"""Restart-recovery for the foreachBatch incremental view.

The one streaming property the availableNow drains don't touch: kill
the query MID-DRAIN, restart it from the same checkpoint, and prove
the merged view still equals the batch aggregate. foreachBatch is
at-least-once — the in-flight batch replays on restart — so this only
holds because the merge commits one generation dir per batch id via
atomic rename and skips already-committed ids.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from tpctools_spark.catalog import table
from tpctools_spark.queries.streaming_demo import (
    read_merge_view,
    start_merge_view,
)

SF = "/root/testdata/sf0.001"
N_FILES = 12


def _start(spark, landing, out, schema):
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # force one micro-batch per file
        .parquet(landing)
        .withWatermark("ts", "10 minutes")
    )
    return start_merge_view(stream, out)


def test_foreach_batch_view_survives_mid_drain_restart(spark, tmp_path):
    ev = table(spark, SF, "events").select("event_id", "ts", "event_type", "value")
    landing = str(tmp_path / "landing")
    ev.repartition(N_FILES).write.parquet(landing)
    want = {
        r.event_type: (r.n, r.v)
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(
                F.sum(F.col("value").cast("decimal(12,2)")).cast("double"), 2
            ).alias("v"),
        )
        .collect()
    }

    out = str(tmp_path / "view")
    os.makedirs(out, exist_ok=True)
    schema = spark.read.parquet(landing).schema

    # First run: stop as soon as at least one generation is committed —
    # with 12 single-file batches the drain is still in flight.
    q = _start(spark, landing, out, schema)
    deadline = time.monotonic() + 120
    while time.monotonic() < deadline:
        if any(d.startswith("view-") for d in os.listdir(out)):
            break
        time.sleep(0.05)
    q.stop()
    q.awaitTermination()
    committed_early = [d for d in os.listdir(out) if d.startswith("view-")]
    assert committed_early, "no batch committed before the kill"

    # Resume from the SAME checkpoint: replayed + remaining batches must
    # converge the view to the exact batch aggregate.
    q2 = _start(spark, landing, out, schema)
    q2.awaitTermination()

    got = {
        r.event_type: (r.n_events, r.total_value)
        for r in read_merge_view(spark, out).collect()
    }
    assert got == want
