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


def _cdc_agg(stream):
    """The stream_cdc_compact aggregation applied to an arbitrary
    event stream (same expressions as the registered query)."""
    last = F.expr(
        "max_by(struct(event_id, event_type, value, unix_micros(ts) AS ts_us),"
        " struct(ts, event_id))"
    )
    return (
        stream.groupBy("user_id")
        .agg(
            last.alias("last"),
            F.count(F.lit(1)).cast("bigint").alias("n_ops"),
        )
        .filter(F.col("last.event_type") != "error")
        .select(
            "user_id",
            F.col("last.event_id").alias("last_event_id"),
            F.col("last.event_type").alias("last_op"),
            F.col("last.value").alias("last_value"),
            F.col("last.ts_us").alias("last_ts_us"),
            "n_ops",
        )
    )


def _stop_mid_drain(q, deadline_s: float = 120.0) -> None:
    """Stop a running stream as soon as at least one micro-batch has
    committed (recentProgress non-empty)."""
    deadline = time.monotonic() + deadline_s
    while time.monotonic() < deadline:
        if q.recentProgress:
            break
        time.sleep(0.05)
    q.stop()
    q.awaitTermination()
    assert q.recentProgress, "no batch committed before the kill"


def test_cdc_compact_resumes_from_checkpoint(spark, tmp_path):
    """stream_cdc_compact's aggregation is stateful (per-key max_by);
    killing the query mid-drain and restarting from the SAME
    checkpoint must restore the state store and converge the snapshot
    to the batch answer — the durability contract a CDC compactor
    actually relies on."""
    from pyspark.sql import Window

    ev = table(spark, SF, "events").select(
        "event_id", "user_id", "event_type", "value", "ts"
    )
    landing = str(tmp_path / "cdc_landing")
    ev.repartition(N_FILES).write.parquet(landing)
    schema = spark.read.parquet(landing).schema
    ckpt = str(tmp_path / "cdc_ckpt")

    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    ranked = ev.withColumn("rn", F.row_number().over(w)).withColumn(
        "n_ops", F.count(F.lit(1)).over(Window.partitionBy("user_id"))
    )
    want = {
        (r.user_id, r.event_id, r.event_type, r.value, int(r.n_ops))
        for r in ranked.filter(
            (F.col("rn") == 1) & (F.col("event_type") != "error")
        ).collect()
    }

    def start(name: str):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
        )
        return (
            _cdc_agg(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    q = start("cdc_rec_run1")
    _stop_mid_drain(q)

    q2 = start("cdc_rec_run2")
    q2.awaitTermination()
    got = {
        (r.user_id, r.last_event_id, r.last_op, r.last_value, int(r.n_ops))
        for r in spark.table("cdc_rec_run2").collect()
    }
    assert got == want


def test_python_datasource_stream_resumes_from_checkpoint(spark, tmp_path):
    """The custom Python streaming source's offset contract under
    interrupted-drain recovery: with advanceperpoll=1 each availableNow
    run consumes exactly one more micro-batch, so stopping after 3 of
    10 batches and restarting from the same checkpoint must resume
    from the COMMITTED offset (the restarted reader re-learns its
    position from Spark's commit/partitions callbacks, never from
    initialOffset) and converge the aggregate to the full feed."""
    from tpctools_spark.sources import SensorStreamSource

    try:
        spark.dataSource.register(SensorStreamSource)
    except Exception:  # noqa: BLE001 — already registered
        pass

    want: dict[int, tuple[int, float]] = {}
    for rid in range(1000):
        h = (rid * 654435747) % 1000000007
        sid = h % 16
        n, tot = want.get(sid, (0, 0.0))
        want[sid] = (n + 1, tot + (h % 10000) / 100.0)
    want_set = {(s, n, round(t, 2)) for s, (n, t) in want.items()}

    ckpt = str(tmp_path / "sensor_ckpt")

    def drain_once(name: str):
        feed = (
            spark.readStream.format("sensor_feed_stream")
            .option("rowsperbatch", "100")
            .option("batches", "10")
            .option("sensors", "16")
            .option("advanceperpoll", "1")
            .load()
        )
        agg = feed.groupBy("sensor_id").agg(
            F.count(F.lit(1)).alias("n_readings"),
            F.round(
                F.sum(F.col("reading").cast("decimal(12,2)")).cast("double"),
                2,
            ).alias("total_reading"),
        )
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sum(r.n_readings for r in spark.table(name).collect())

    # Interrupted drain: 3 one-batch runs, then "crash" (stop running).
    seen = 0
    for i in range(3):
        seen = drain_once(f"sensor_rec_a{i}")
    assert seen == 300, seen  # 3 of 10 batches — mid-feed by design

    # Resume from the same checkpoint until the feed is exhausted; the
    # cap is loud: >7 more runs means offsets regressed or stalled.
    for i in range(7):
        seen = drain_once(f"sensor_rec_b{i}")
        if seen == 1000:
            break
    assert seen == 1000, seen

    got = {
        (r.sensor_id, r.n_readings, r.total_reading)
        for r in spark.table(f"sensor_rec_b{i}").collect()
    }
    assert got == want_set


def test_jsonl_sink_exactly_once_under_task_retry(tmp_path):
    """Kill-and-retry proof for the custom write path: the FIRST
    attempt of one write task stages a partial file and crashes; the
    retry succeeds. After commit the directory must hold exactly one
    copy of every row — no duplicates, no partial-file rows, no staged
    garbage. Runs in a subprocess because task retries need a
    ``local[2,2]`` master (the shared test session is local[4] =
    maxFailures 1) and a SparkContext is a process singleton."""
    import subprocess
    import sys
    import textwrap

    script = textwrap.dedent(
        """
        import json, os, sys
        sys.path.insert(0, "/root/repo")
        from pyspark.sql import SparkSession
        from tpctools_spark.sources import JsonDirSinkSource, JsonDirWriter

        out = sys.argv[1]
        marker = sys.argv[2]

        class FaultyWriter(JsonDirWriter):
            def write(self, iterator):
                rows = list(iterator)
                ids = [r[0] for r in rows]
                if ids and min(ids) == 0 and not os.path.exists(marker):
                    # First attempt of the partition holding id 0:
                    # stage a PARTIAL file (the mid-write crash
                    # residue a retry must not expose), then die.
                    os.makedirs(self._staging(), exist_ok=True)
                    part = os.path.join(self._staging(), "attempt-dead.jsonl")
                    with open(part, "w", encoding="utf-8") as fh:
                        for r in rows[: len(rows) // 2]:
                            fh.write(
                                json.dumps(dict(zip(self._cols, tuple(r))))
                                + "\\n"
                            )
                    open(marker, "w").close()
                    raise RuntimeError("planted first-attempt failure")
                return super().write(iter(rows))

        class FaultySink(JsonDirSinkSource):
            @classmethod
            def name(cls):
                return "jsonl_dir_faulty"

            def writer(self, schema, overwrite):
                return FaultyWriter(self.options, schema)

        spark = (
            SparkSession.builder.master("local[2,2]")
            .config("spark.ui.enabled", "false")
            .config("spark.sql.shuffle.partitions", "4")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        spark.dataSource.register(FaultySink)
        df = spark.range(0, 1000, 1, 4).selectExpr(
            "id AS event_id", "id % 7 AS user_id"
        )
        df.write.format("jsonl_dir_faulty").option("path", out).mode(
            "append"
        ).save()
        back = spark.read.schema("event_id BIGINT, user_id BIGINT").json(out)
        rows = back.collect()
        got = sorted(r.event_id for r in rows)
        assert os.path.exists(marker), "fault was never planted"
        assert len(rows) == 1000, f"row count {len(rows)} != 1000"
        assert got == list(range(1000)), "duplicate or missing ids"
        assert not os.path.exists(os.path.join(out, "_staging")), (
            "staged garbage survived commit"
        )
        print("EXACTLY_ONCE_OK")
        spark.stop()
        """
    )
    out = str(tmp_path / "sink")
    marker = str(tmp_path / "killed_once")
    proc = subprocess.run(
        [sys.executable, "-c", script, out, marker],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert "EXACTLY_ONCE_OK" in proc.stdout, (
        f"stdout:\n{proc.stdout[-2000:]}\nstderr:\n{proc.stderr[-2000:]}"
    )


def test_stream_reader_offset_monotone_under_hostile_restart_order():
    """The sources.py offset-clamp contract (r9-ADVICE low), pinned as
    a pure protocol test — no Spark session needed.

    An incremental ``SensorStreamReader`` re-learns its position from
    the commit/partitions callbacks Spark replays on restart. The
    hazard: a Spark version that polls latestOffset on a FRESH reader
    BEFORE replaying those callbacks would see ``_seen == 0`` and
    could hand out an offset BELOW the checkpointed start. The reader
    floors ``_seen`` from partitions' START offset (not just
    end/commit), so the first planned range re-floors it and every
    later poll is monotone and ≥ the checkpointed position.
    """
    from tpctools_spark.sources import SensorStreamReader

    opts = {"rowsperbatch": "10", "batches": "20", "advanceperpoll": "2"}

    # Incarnation 1: normal protocol up to a committed offset of 4.
    r1 = SensorStreamReader(dict(opts))
    assert r1.initialOffset() == {"batch": 0}
    assert r1.latestOffset() == {"batch": 2}
    parts = r1.partitions({"batch": 0}, {"batch": 2})
    assert [p.value for p in parts] == [(0, 1), (1, 2)]
    r1.commit({"batch": 2})
    assert r1.latestOffset() == {"batch": 4}
    r1.partitions({"batch": 2}, {"batch": 4})
    r1.commit({"batch": 4})

    # Incarnation 2 (restart): HOSTILE order — latestOffset polled
    # before any callback replay. The fresh reader knows nothing yet,
    # so the poll may expose less than the checkpoint (2 here), but it
    # must never make Spark go backwards: Spark plans from ITS
    # checkpointed start, and that plan call re-floors the reader.
    r2 = SensorStreamReader(dict(opts))
    early = r2.latestOffset()["batch"]
    assert early == 2  # below checkpoint: harmless, Spark ignores it
    # Spark replays the checkpointed range (start=4) before reading on.
    r2.partitions({"batch": 4}, {"batch": 4})
    assert r2.latestOffset()["batch"] == 6  # re-floored: 4 + advance
    # Monotone from here on, interleaved with commits.
    seen = 0
    for _ in range(12):
        nxt = r2.latestOffset()["batch"]
        assert nxt >= seen, f"latestOffset regressed {seen} -> {nxt}"
        r2.partitions({"batch": seen}, {"batch": nxt})
        r2.commit({"batch": nxt})
        seen = nxt
    # Capped at the feed size, never beyond.
    assert seen <= 20
    r3 = SensorStreamReader(dict(opts))
    r3.partitions({"batch": 20}, {"batch": 20})
    assert r3.latestOffset()["batch"] == 20


def test_dsir_router_resumes_from_checkpoint(spark, tmp_path):
    """Crash the DSIR ingest router between a batch's parquet write
    and its offset commit, restart from the same checkpoint, and prove
    the routed output still equals the one-shot batch score (the
    r10-VERDICT recovery gap for the family's streaming form).

    The crash is INJECTED deterministically: the first incarnation's
    scorer raises AFTER landing its first batch, so that batch's
    offset never commits and the restart must re-execute it —
    side-effects included. This is the at-least-once replay that
    forced the router's sink from mode("append") (which double-counted
    the replayed batch's documents) to per-batch-id overwrite dirs.
    A plain stop() mid-drain does NOT reliably open this window (the
    offset commit usually wins the race), which is why the fault is
    injected rather than raced.
    """
    import pyspark.errors

    from pyspark.sql import functions as F

    from tpctools_spark.queries.pipeline import _dsir_hashed, _dsir_lam
    from tpctools_spark.queries.streaming_demo import (
        _dsir_route_read,
        _dsir_route_start,
        _dsir_score_fn,
    )

    docs = table(spark, SF, "documents").select("doc_id", "text", "lang")
    is_in = F.col("doc_id") % 7 == 0
    lam = _dsir_lam(_dsir_hashed(docs.filter(~is_in))).cache()
    lam.count()

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    marker = str(tmp_path / "crashed_once")
    docs.filter(is_in).repartitionByRange(8, "doc_id").write.parquet(in_dir)

    want = {
        (r["doc_id"], r["n_bigrams"], r["imp"])
        for r in _dsir_hashed(docs.filter(is_in))
        .join(F.broadcast(lam), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(F.col("lam").cast("decimal(25,16)"))
            .cast("double")
            .alias("imp"),
        )
        .collect()
    }

    inner = _dsir_score_fn(lam, out_dir)

    def faulty(bdf, batch_id):
        inner(bdf, batch_id)  # side-effect lands...
        if not os.path.exists(marker):
            with open(marker, "w") as f:
                f.write("x")
            # ...then the "process dies" before the offset commit.
            raise RuntimeError("injected crash after write, before commit")

    schema = docs.schema
    q = _dsir_route_start(
        spark, schema, in_dir, out_dir, ckpt, lam, score_fn=faulty
    )
    try:
        q.awaitTermination()
        raise AssertionError("injected crash did not surface")
    except pyspark.errors.exceptions.captured.StreamingQueryException:
        pass
    assert os.path.exists(marker), "fault was never injected"

    q2 = _dsir_route_start(spark, schema, in_dir, out_dir, ckpt, lam)
    q2.awaitTermination()
    lam.unpersist()

    got_rows = _dsir_route_read(spark, out_dir).collect()
    got = {(r["doc_id"], r["n_bigrams"], r["imp"]) for r in got_rows}
    # Row-count equality matters — an at-least-once replay that
    # duplicates rows would still pass a set compare.
    assert len(got_rows) == len(want), (
        f"{len(got_rows)} rows for {len(want)} documents — replayed "
        "batch double-counted"
    )
    assert got == want


def test_incremental_dedup_resumes_from_checkpoint(spark, tmp_path):
    """The admission stream's twin of the DSIR-router recovery test:
    crash between a batch's decision write and its offset commit,
    restart from the same checkpoint, and prove the admitted output
    is row-exact against the one-shot scoring — the replay must not
    double-count the in-flight batch's documents.
    """
    import pyspark.errors

    from pyspark.sql import functions as F

    from tpctools_spark.generate_corpus import gen_documents
    from tpctools_spark.queries.streaming_demo import (
        _incr_admit_fn,
        _incr_dedup_index,
        _incr_dedup_start,
    )

    docs = gen_documents(spark, 500)
    is_batch = (F.col("doc_id") % 7 == 0) & (F.col("doc_id") > 0)
    corpus = docs.filter(~is_batch)
    incoming = docs.filter(is_batch)
    capped, pc, sizes_c, fps_c = _incr_dedup_index(corpus)

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    marker = str(tmp_path / "crashed_once")
    incoming.repartitionByRange(8, "doc_id").write.parquet(in_dir)

    # Expected: the same admit logic applied to ALL incoming docs at
    # once (decisions depend only on (doc, standing index), so the
    # one-shot scoring equals the drained union by construction).
    exp_dir = str(tmp_path / "expected")
    _incr_admit_fn(capped, pc, sizes_c, fps_c, exp_dir)(incoming, 0)
    want_rows = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(exp_dir)
        .collect()
    )
    want = {(r["doc_id"], r["decision"]) for r in want_rows}

    inner = _incr_admit_fn(capped, pc, sizes_c, fps_c, out_dir)

    def faulty(bdf, batch_id):
        inner(bdf, batch_id)  # decision lands...
        if not os.path.exists(marker):
            with open(marker, "w") as f:
                f.write("x")
            # ...then the "process dies" before the offset commit.
            raise RuntimeError("injected crash after write, before commit")

    q = _incr_dedup_start(spark, docs.schema, in_dir, ckpt, faulty)
    try:
        q.awaitTermination()
        raise AssertionError("injected crash did not surface")
    except pyspark.errors.exceptions.captured.StreamingQueryException:
        pass
    assert os.path.exists(marker), "fault was never injected"

    q2 = _incr_dedup_start(spark, docs.schema, in_dir, ckpt, inner)
    q2.awaitTermination()

    got_rows = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(out_dir)
        .collect()
    )
    got = {(r["doc_id"], r["decision"]) for r in got_rows}
    assert len(got_rows) == len(want_rows), (
        f"{len(got_rows)} rows for {len(want_rows)} documents — "
        "replayed batch double-counted"
    )
    assert got == want


# ---- r12: injected-crash recovery for the remaining stateful streams ----

def _stage_ts_ordered_chunks(df, in_dir: str, n: int = 8) -> None:
    """Write *df* as *n* ascending-ts range-partitioned files and stamp
    strictly increasing mtimes so FileStreamSource (which orders by
    modification time) delivers them oldest-ts-first. Time-ordered
    arrival means no event is ever behind the watermark, so the drained
    streaming result must equal the one-shot batch answer exactly."""
    import glob

    df.repartitionByRange(n, "ts").write.parquet(in_dir)
    parts = sorted(glob.glob(os.path.join(in_dir, "part-*")))
    assert len(parts) >= 2, "need multiple files for multiple batches"
    base = time.time() - 3600
    for i, p in enumerate(parts):
        os.utime(p, (base + i * 10, base + i * 10))


def _committed_dir_sink(out: str, prefix: str):
    """foreachBatch sink committing one ``<prefix>-<batch_id>`` dir per
    micro-batch via atomic rename; a replayed batch id skips the
    EXTERNAL side effect only.

    Stateful-operator nuance (Spark 4 enforces this via
    STATE_STORE_COMMIT_VALIDATION_FAILED): the replayed batch must
    still be FULLY PROCESSED — every state-store partition has to
    re-commit its version for the replayed batch id — so the skip
    branch drains the batch through a noop sink instead of returning
    early. An early return would be exactly the "swallowing the batch"
    bug the validator exists to catch."""

    def fn(bdf, batch_id):
        committed = os.path.join(out, f"{prefix}-{batch_id}")
        if os.path.exists(committed):
            bdf.write.format("noop").mode("overwrite").save()
            return
        tmp = os.path.join(out, f"tmp-{batch_id}")
        bdf.write.mode("overwrite").parquet(tmp)
        os.rename(tmp, committed)

    return fn


def _crash_once_after(fn, marker: str):
    def faulty(bdf, batch_id):
        fn(bdf, batch_id)  # side-effect lands...
        if not os.path.exists(marker):
            with open(marker, "w") as f:
                f.write("x")
            # ...then the "process dies" before the offset commit.
            raise RuntimeError("injected crash after write, before commit")

    return faulty


def _drive_with_crash(spark, transform, schema, in_dir, ckpt, sink, marker,
                      mode):
    """Start the stream with a crash-once sink, assert the crash
    surfaced, then restart from the SAME checkpoint with the clean sink
    and drain to completion."""
    import pyspark.errors

    def start(fn):
        ev = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        return (
            transform(ev)
            .writeStream.foreachBatch(fn)
            .outputMode(mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    q = start(_crash_once_after(sink, marker))
    try:
        q.awaitTermination()
        raise AssertionError("injected crash did not surface")
    except pyspark.errors.exceptions.captured.StreamingQueryException:
        pass
    assert os.path.exists(marker), "fault was never injected"
    q2 = start(sink)
    q2.awaitTermination()


def test_stream_stream_join_resumes_from_checkpoint(spark, tmp_path):
    """Crash the purchase×click stream-stream join between a batch's
    output write and its offset commit, restart from the checkpoint,
    and prove the union of committed batch outputs is row-exact against
    the one-shot batch join — the dual-watermark join state must replay
    the in-flight batch without duplicating its matches."""
    import glob

    from tpctools_spark.queries.streaming_demo import _purchase_click_join

    ev = table(spark, SF, "events").select(
        "event_id", "user_id", "event_type", "ts", "value"
    )
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    os.makedirs(out_dir)
    _stage_ts_ordered_chunks(ev, in_dir)

    want_rows = _purchase_click_join(ev).collect()
    want = {tuple(r) for r in want_rows}
    assert want_rows, "fixture yields no purchase-click matches"

    _drive_with_crash(
        spark, _purchase_click_join, ev.schema, in_dir,
        str(tmp_path / "ckpt"), _committed_dir_sink(out_dir, "batch"),
        str(tmp_path / "crashed_once"), "append",
    )

    out_schema = _purchase_click_join(ev).schema
    dirs = sorted(glob.glob(os.path.join(out_dir, "batch-*")))
    got_rows = [
        tuple(r)
        for d in dirs
        # explicit schema: a zero-match batch commits a dir with no
        # data files, which schema inference would refuse to read
        for r in spark.read.schema(out_schema).parquet(d).collect()
    ]
    assert len(got_rows) == len(want_rows), (
        f"{len(got_rows)} rows for {len(want_rows)} matches — replayed "
        "batch double-counted"
    )
    assert set(got_rows) == want


def test_session_window_resumes_from_checkpoint(spark, tmp_path):
    """The session-window twin: crash mid-drain, restart from the
    checkpoint, and prove the final complete-mode view equals the batch
    sessionization — the session-MERGE state (sessions spanning
    micro-batch boundaries get merged in the store) must survive the
    replay."""
    from tpctools_spark.queries.streaming_demo import (
        _latest_view_gen,
        _session_window_agg,
    )

    ev = table(spark, SF, "events").select("user_id", "ts")
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    os.makedirs(out_dir)
    _stage_ts_ordered_chunks(ev, in_dir)

    want_rows = _session_window_agg(ev).collect()
    want = {tuple(r) for r in want_rows}
    assert want_rows, "fixture yields no sessions"

    _drive_with_crash(
        spark, _session_window_agg, ev.schema, in_dir,
        str(tmp_path / "ckpt"), _committed_dir_sink(out_dir, "view"),
        str(tmp_path / "crashed_once"), "complete",
    )

    latest = _latest_view_gen(out_dir)
    assert latest is not None
    got_rows = spark.read.parquet(os.path.join(out_dir, latest)).collect()
    got = {tuple(r) for r in got_rows}
    assert len(got_rows) == len(want_rows), (
        f"{len(got_rows)} sessions for {len(want_rows)} — state lost or "
        "double-merged across the replay"
    )
    assert got == want
