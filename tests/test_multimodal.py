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
