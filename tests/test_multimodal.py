"""Multimodal plumbing: batch shapes, determinism, fan-out cardinality."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, n=20):
    df = spark.createDataFrame(
        [(i, f"payload body {i} " * (i + 1)) for i in range(n)],
        "doc_id long, text string",
    )
    return df.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
    )


def test_extract_features_one_row_per_input(spark):
    from tpctools_spark.multimodal import extract_features

    out = extract_features(_docs(spark)).collect()
    assert len(out) == 20
    assert all(r.decoder == "stub-v1" and r.n_bytes > 0 for r in out)


def test_frame_sample_fan_out(spark):
    from tpctools_spark.multimodal import FRAMES_PER_DOC, sample_frames

    out = sample_frames(_docs(spark).drop("media_type")).collect()
    assert len(out) == 20 * FRAMES_PER_DOC
    per_doc = {}
    for r in out:
        per_doc.setdefault(r.doc_id, []).append(r.frame_index)
    assert all(sorted(v) == list(range(FRAMES_PER_DOC)) for v in per_doc.values())


def test_resize_deterministic_and_partition_invariant(spark):
    from tpctools_spark.multimodal import resize_media

    a = {(r.doc_id, r.payload_out) for r in
         resize_media(_docs(spark).repartition(1), 64, 64).collect()}
    b = {(r.doc_id, r.payload_out) for r in
         resize_media(_docs(spark).repartition(7), 64, 64).collect()}
    assert a == b and len(a) == 20


def test_decode_raises_for_real_media_types(spark):
    import pytest

    from tpctools_spark.multimodal import decode_media

    with pytest.raises(NotImplementedError):
        decode_media(b"\x89PNG", "image/png")


def test_audio_segment_fanout_covers_all_bytes(spark):
    from tpctools_spark.multimodal import AUDIO_SEGMENT_SAMPLES, segment_audio

    docs = _docs(spark).drop("media_type")
    sizes = {r.doc_id: r.n for r in docs.selectExpr(
        "doc_id", "length(payload) AS n").collect()}
    out = segment_audio(docs).collect()
    per_doc = {}
    for r in out:
        per_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, segs in per_doc.items():
        n = sizes[doc_id]
        expect = (n + AUDIO_SEGMENT_SAMPLES - 1) // AUDIO_SEGMENT_SAMPLES
        assert len(segs) == expect
        # segments tile the payload exactly: all full-size but the last
        assert sum(s.n_samples for s in segs) == n
        assert all(s.peak >= 64 or s.energy >= 0 for s in segs)
