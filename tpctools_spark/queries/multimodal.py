"""§2.B.9 — multimodal columns: cross-modal joins and binary plumbing.

``multimodal_join`` joins the text and vector modalities relationally.
``multimodal_decode`` demonstrates the binary-column pattern: media as
opaque ``binary`` with typed metadata, processed by an Arrow-batched
``mapInPandas`` decode stage. The container has no image/audio codecs,
so the decode step is a clearly-marked deterministic stub
(tpctools_spark.multimodal) — the Spark plumbing (schema, batching,
partitioning) is real and tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tpctools_spark.catalog import table
from tpctools_spark.registry import query


@query(
    "multimodal_join",
    oracle="""
    SELECT d.doc_id, d.lang, e.label,
           CAST(d.n_chars AS BIGINT) AS n_chars,
           CAST(len(e.embedding) AS BIGINT) AS dim
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    WHERE d.lang IN ('en', 'de') AND e.label < 5
    """,
)
def multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text⋈vector modality join with predicates on both sides.

    Filters push into both parquet scans before the equi-join on the
    shared id; at scale both sides would be bucketed on the id so the
    join needs no shuffle at all.
    """
    d = table(spark, sf_dir, "documents").filter(F.col("lang").isin("en", "de"))
    e = table(spark, sf_dir, "embeddings").filter(F.col("label") < 5)
    return d.join(e, d.doc_id == e.vec_id).select(
        "doc_id",
        "lang",
        "label",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.size("embedding").cast("bigint").alias("dim"),
    )


@query(
    "multimodal_decode",
    oracle="""
    SELECT doc_id,
           'text/plain' AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           substring(sha256(text), 1, 16) AS content_digest,
           CASE WHEN octet_length(encode(text)) = 0 THEN 0.0
                ELSE CAST(list_sum([unicode(c)
                                    for c in string_split_regex(text, '')])
                          AS DOUBLE) / octet_length(encode(text))
           END AS feat_mean_byte,
           'stub-v1' AS decoder
    FROM documents
    """,
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column pipeline: text → binary payload → mapInPandas
    feature extraction (stub decoder), the shape of an image/audio
    feature pass at 100 TB.

    Oracle: payloads are UTF-8 of ASCII-only fixture text, so byte
    stats and sha256 digests are reproducible from SQL (code point ==
    byte); the mean is an exact int-sum / int-count double division on
    both sides.
    """
    from tpctools_spark.multimodal import extract_features

    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
    )
    return extract_features(docs)


@query(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id,
           CAST(i AS BIGINT) AS frame_index,
           CAST((n * i) // 3 AS BIGINT) AS byte_offset,
           substring(sha256(substring(text, CAST((n * i) // 3 AS INTEGER) + 1, 64)),
                     1, 16) AS frame_digest
    FROM (SELECT doc_id, text, octet_length(encode(text)) AS n
          FROM documents
          WHERE octet_length(encode(text)) > 0),
         (SELECT unnest(range(3)) AS i)
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fan-out binary pipeline: each payload yields FRAMES_PER_DOC frame
    rows (video keyframe-sampling shape) via a single mapInPandas stage
    whose output cardinality is decoder-controlled.

    Oracle: ASCII fixture text makes the byte windows reproducible as
    substrings, so each sampled frame digest has an exact SQL twin.
    """
    from tpctools_spark.multimodal import sample_frames

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return sample_frames(docs)


_BIN_DOCS = 20


@query(
    "scan_binary_files",
    oracle=f"""
    SELECT 'doc_' || doc_id || '.bin' AS file_name,
           CAST(strlen(text) AS BIGINT) AS length,
           md5(text) AS content_md5
    FROM documents WHERE doc_id < {_BIN_DOCS}
    """,
)
def scan_binary_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw media ingestion via Spark's built-in ``binaryFile`` source:
    a directory of opaque blobs becomes a relation of (path, mtime,
    length, content) with the bytes as a first-class binary column —
    the landing-zone entry point of every multimodal pipeline, before
    decode/feature stages (``multimodal_decode``) take over.

    The fixture blobs are staged from document text (a bounded,
    documented stand-in for media files arriving from an external
    store); the SCAN is the real distributed path — Spark splits the
    file listing across the cluster, each task reads its files and
    computes length + content digest without the bytes ever visiting
    the driver. At 100 TB the same plan streams object-store blobs;
    ``pathGlobFilter``/``recursiveFileLookup`` handle layout, and the
    4 MB+ per-file regime amortizes the per-file open.
    """
    import os

    from tpctools_spark.queries.scans import _stable_scratch

    stage = os.path.join(_stable_scratch("binfiles"), "blobs")
    os.makedirs(stage, exist_ok=True)
    docs = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _BIN_DOCS)
        .select("doc_id", "text")
        .collect()
    )
    # Bounded landing-zone emulation (N=20 blobs); real media files
    # arrive from outside the engine — writing them is not the op.
    for r in docs:
        with open(os.path.join(stage, f"doc_{r['doc_id']}.bin"), "wb") as f:
            f.write(r["text"].encode("utf-8"))
    blobs = spark.read.format("binaryFile").load(stage)
    return blobs.select(
        F.element_at(F.split("path", "/"), -1).alias("file_name"),
        F.col("length").cast("bigint").alias("length"),
        F.md5("content").alias("content_md5"),
    )


_PHASH_ORACLE = """
    WITH codes AS (
      SELECT doc_id,
             [unicode(c) for c in string_split_regex(text, '')] AS cs
      FROM documents
    ),
    base AS (
      SELECT doc_id, cs, len(cs) AS n,
             CAST(list_sum(cs) AS DOUBLE) / len(cs) AS tmean
      FROM codes WHERE len(cs) > 0
    ),
    hashed AS (
      SELECT doc_id,
             CAST((CASE WHEN (((1*n)//8) - ((0*n)//8)) > 0 AND CAST(list_sum(cs[((0*n)//8)+1:((1*n)//8)]) AS DOUBLE)/(((1*n)//8) - ((0*n)//8)) > tmean THEN 1 ELSE 0 END)
             + (CASE WHEN (((2*n)//8) - ((1*n)//8)) > 0 AND CAST(list_sum(cs[((1*n)//8)+1:((2*n)//8)]) AS DOUBLE)/(((2*n)//8) - ((1*n)//8)) > tmean THEN 2 ELSE 0 END)
             + (CASE WHEN (((3*n)//8) - ((2*n)//8)) > 0 AND CAST(list_sum(cs[((2*n)//8)+1:((3*n)//8)]) AS DOUBLE)/(((3*n)//8) - ((2*n)//8)) > tmean THEN 4 ELSE 0 END)
             + (CASE WHEN (((4*n)//8) - ((3*n)//8)) > 0 AND CAST(list_sum(cs[((3*n)//8)+1:((4*n)//8)]) AS DOUBLE)/(((4*n)//8) - ((3*n)//8)) > tmean THEN 8 ELSE 0 END)
             + (CASE WHEN (((5*n)//8) - ((4*n)//8)) > 0 AND CAST(list_sum(cs[((4*n)//8)+1:((5*n)//8)]) AS DOUBLE)/(((5*n)//8) - ((4*n)//8)) > tmean THEN 16 ELSE 0 END)
             + (CASE WHEN (((6*n)//8) - ((5*n)//8)) > 0 AND CAST(list_sum(cs[((5*n)//8)+1:((6*n)//8)]) AS DOUBLE)/(((6*n)//8) - ((5*n)//8)) > tmean THEN 32 ELSE 0 END)
             + (CASE WHEN (((7*n)//8) - ((6*n)//8)) > 0 AND CAST(list_sum(cs[((6*n)//8)+1:((7*n)//8)]) AS DOUBLE)/(((7*n)//8) - ((6*n)//8)) > tmean THEN 64 ELSE 0 END)
             + (CASE WHEN (((8*n)//8) - ((7*n)//8)) > 0 AND CAST(list_sum(cs[((7*n)//8)+1:((8*n)//8)]) AS DOUBLE)/(((8*n)//8) - ((7*n)//8)) > tmean THEN 128 ELSE 0 END) AS BIGINT) AS phash
      FROM base
      UNION ALL
      SELECT doc_id, CAST(0 AS BIGINT) FROM codes WHERE len(cs) = 0
    )
    SELECT phash, COUNT(*) AS n_docs, MIN(doc_id) AS keep_doc_id
    FROM hashed GROUP BY phash
"""


@query("multimodal_phash_dedup", oracle=_PHASH_ORACLE)
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-dup bucketing over binary payloads: aHash
    fingerprints (slice-mean threshold bits, packed) computed in an
    Arrow-batched ``mapInPandas`` stage, then bucket dedup by hash —
    the image-dedup pipeline shape (decode → tiny-grid hash → bucket
    join), with the codec stubbed as byte slices (multimodal.py).

    The hash stage is embarrassingly parallel and emits 8 bytes per
    media row; the dedup groupBy shuffles hashes, never payloads. The
    oracle rebuilds the identical bits from code points (ASCII payload
    => code point == byte), so the whole binary pipeline is
    value-checked, not rows-only.
    """
    from tpctools_spark.multimodal import perceptual_hash

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    hashed = perceptual_hash(docs)
    return hashed.groupBy("phash").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("keep_doc_id"),
    )


@query(
    "multimodal_resize",
    oracle="""
    SELECT doc_id, 'text/plain' AS media_type,
           CAST(64 AS BIGINT) AS width, CAST(64 AS BIGINT) AS height,
           substring(sha256(text || '64x64'), 1, 16) AS payload_out
    FROM documents
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize/transcode plumbing: 1:1 Arrow-batched payload transform
    with decoder-owned geometry (stub codec emits the digest a real
    resample would transform; multimodal.resize_media). One narrow
    mapInPandas stage, no shuffle — the bytes cross the Python
    boundary once per batch.
    """
    from tpctools_spark.multimodal import resize_media

    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
    )
    return resize_media(docs, 64, 64)


@query(
    "multimodal_audio_segment",
    oracle="""
    SELECT doc_id,
           CAST(i AS BIGINT) AS segment_index,
           CAST(octet_length(encode(seg)) AS BIGINT) AS n_samples,
           CAST(list_sum([(unicode(c) - 64) * (unicode(c) - 64)
                          for c in string_split_regex(seg, '')])
                AS BIGINT) AS energy,
           CAST(list_max([unicode(c)
                          for c in string_split_regex(seg, '')])
                AS BIGINT) AS peak
    FROM (
      SELECT doc_id, i, substring(text, CAST(i * 100 AS INTEGER) + 1, 100) AS seg
      FROM (SELECT doc_id, text, octet_length(encode(text)) AS n
            FROM documents),
           (SELECT unnest(range(100)) AS i)
      WHERE i * 100 < n
    )
    """,
)
def multimodal_audio_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio modality through the binary pipeline: waveform payloads
    segmented into fixed 100-sample windows with exact integer energy
    and peak per segment (stub PCM decoder — see
    ``tpctools_spark.multimodal.segment_audio``). Completes the
    modality matrix: image (decode/resize/phash), video
    (frame_sample), audio (this).

    Oracle: ASCII fixture text makes each byte window a substring and
    byte == code point, so segment energy/peak have exact SQL twins.
    The range(100) spine in the oracle caps segments per doc at 100 —
    fixture docs are ≤ a few hundred bytes, far under the cap (the
    Spark side has no cap; a longer payload would emit more rows).
    """
    from tpctools_spark.multimodal import segment_audio

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return segment_audio(docs)
