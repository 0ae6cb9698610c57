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

import os

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


@query(
    "multimodal_chunk_cdc",
    oracle="""
    WITH cs AS (
      SELECT doc_id, string_split_regex(text, '') AS l FROM documents
    ), codes AS (
      SELECT doc_id,
             unnest([{'pos': i, 'ch': l[i]} for i in
                     range(1, len(l) + 1)], recursive := true)
      FROM cs
    ), lagged AS (
      SELECT doc_id, pos, ch, unicode(ch) AS c0,
             LEAD(unicode(ch), 1) OVER w AS c1,
             LEAD(unicode(ch), 2) OVER w AS c2,
             LEAD(unicode(ch), 3) OVER w AS c3
      FROM codes
      WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ), marked AS (
      SELECT doc_id, pos, ch,
             CAST(SUM(CASE WHEN pos >= 2 AND c3 IS NOT NULL
                  AND (c0 * 29791 + c1 * 961 + c2 * 31 + c3) % 16 = 0
                  THEN 1 ELSE 0 END)
                  OVER (PARTITION BY doc_id ORDER BY pos) AS INT)
               AS chunk_id
      FROM lagged
    ), chunks AS (
      SELECT doc_id, chunk_id,
             md5(string_agg(ch, '' ORDER BY pos)) AS fp,
             CAST(COUNT(*) AS BIGINT) AS clen
      FROM marked GROUP BY doc_id, chunk_id
    ), dfreq AS (
      SELECT fp, COUNT(DISTINCT doc_id) AS nd FROM chunks GROUP BY fp
    )
    SELECT c.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN d.nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_shared_chunks,
           CAST(SUM(CASE WHEN d.nd > 1 THEN c.clen ELSE 0 END) AS BIGINT)
             AS shared_chars
    FROM chunks c JOIN dfreq d USING (fp)
    GROUP BY c.doc_id
    """,
)
def multimodal_chunk_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (the rsync/LBFS/backup-dedup trick):
    split each payload at positions where a rolling content hash hits a
    boundary pattern, fingerprint the chunks, and measure cross-document
    chunk sharing.

    Why content-defined beats fixed-size blocks: inserting one byte
    shifts every fixed block boundary after it (no block matches again),
    but CDC boundaries move WITH the content — shared regions keep
    identical chunks, which is what makes block-level dedup of large
    binary/media payloads work. Expected chunk length is the boundary
    modulus (16 chars here; ~8 KB in production).

    Engineering: the chunker is a vectorized numpy pass inside
    mapInPandas (Arrow batches, no per-byte Python loop) — the shape
    real binary CDC uses at 100 TB, running embarrassingly parallel per
    document. The DuckDB twin re-derives the identical rolling hash
    through a per-char window, so chunk boundaries, fingerprints, and
    the sharing census are all value-checked.
    """
    import pandas as pd  # noqa: PLC0415

    from pyspark.sql.types import (  # noqa: PLC0415
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("chunk_id", IntegerType()),
            StructField("fp", StringType()),
            StructField("clen", LongType()),
        ]
    )

    def chunker(batches):
        import hashlib  # noqa: PLC0415

        import numpy as np  # noqa: PLC0415

        for pdf in batches:
            out = {"doc_id": [], "chunk_id": [], "fp": [], "clen": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                n = len(text)
                if n == 0:  # SQL twin emits no rows for empty payloads
                    continue
                if n >= 4:
                    c = np.fromiter(map(ord, text), dtype=np.int64, count=n)
                    h = (
                        c[: n - 3] * 29791
                        + c[1 : n - 2] * 961
                        + c[2 : n - 1] * 31
                        + c[3:]
                    )
                    m = np.zeros(n, dtype=bool)
                    m[1 : n - 3] = h[1:] % 16 == 0
                    cuts = np.nonzero(m)[0]
                else:
                    cuts = np.array([], dtype=np.int64)
                start = 0
                for cid, end in enumerate(list(cuts) + [n]):
                    chunk = text[start:end]
                    out["doc_id"].append(doc_id)
                    out["chunk_id"].append(cid)
                    out["fp"].append(
                        hashlib.md5(chunk.encode("utf-8")).hexdigest()
                    )
                    out["clen"].append(len(chunk))
                    start = end
            yield pd.DataFrame(out)

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    chunks = docs.mapInPandas(chunker, schema)
    dfreq = chunks.groupBy("fp").agg(
        F.countDistinct("doc_id").alias("nd")
    )
    return (
        chunks.join(dfreq, "fp")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum((F.col("nd") > 1).cast("int"))
            .cast("bigint")
            .alias("n_shared_chunks"),
            F.sum(
                F.when(F.col("nd") > 1, F.col("clen")).otherwise(0)
            )
            .cast("bigint")
            .alias("shared_chars"),
        )
    )


@query(
    "multimodal_arrow_bytes",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(list_min([unicode(c) for c in string_split_regex(text, '')
                          if c != '']) AS BIGINT) AS min_byte,
           CAST(list_max([unicode(c) for c in string_split_regex(text, '')
                          if c != '']) AS BIGINT) AS max_byte
    FROM documents
    """,
)
def multimodal_arrow_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-native binary pass (``mapInArrow``): per-payload byte
    stats computed straight off the Arrow RecordBatch buffers.

    ``mapInPandas`` (the decode stub's path) converts every batch to
    pandas and back; ``mapInArrow`` hands the raw Arrow batch to
    Python, which is the right interface for media codecs — a decoder
    wants the binary buffer zero-copy, not a pandas Series of Python
    bytes objects. The numpy view over each payload buffer is such a
    zero-copy read. Oracle: payloads are UTF-8 of ASCII fixture text,
    so byte extrema equal code-point extrema in SQL.

    Scale: row-local (no shuffle); batch size rides
    spark.sql.execution.arrow.maxRecordsPerBatch, so executor memory is
    bounded regardless of corpus size.
    """
    import numpy as np
    import pyarrow as pa

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )

    def batches(it):
        for batch in it:
            ids = batch.column(0)
            n, mn, mx = [], [], []
            for cell in batch.column(1):
                buf = np.frombuffer(cell.as_py(), dtype=np.uint8)
                n.append(len(buf))
                mn.append(int(buf.min()) if len(buf) else None)
                mx.append(int(buf.max()) if len(buf) else None)
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    pa.array(n, pa.int64()),
                    pa.array(mn, pa.int64()),
                    pa.array(mx, pa.int64()),
                ],
                ["doc_id", "n_bytes", "min_byte", "max_byte"],
            )

    return docs.mapInArrow(
        batches, "doc_id bigint, n_bytes bigint, min_byte bigint, max_byte bigint"
    )


@query(
    "multimodal_tar_shards",
    oracle="""
    SELECT doc_id // 100 AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS payload_bytes,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(MAX(doc_id) AS BIGINT) AS last_doc
    FROM documents
    GROUP BY doc_id // 100
    """,
)
def multimodal_tar_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset-style tar sharding, round-tripped: pack each block of
    100 documents into one POSIX tar shard (an ``applyInPandas``
    writer, one tar per key group), then re-discover the shards with a
    ``binaryFile`` scan and re-parse every member with a stdlib
    ``tarfile`` reader inside ``mapInPandas`` — the storage layout
    multimodal training loaders (WebDataset et al.) stream, where
    thousands of small media files become sequential-IO shards.

    The plumbing is the point and all of it is real: grouped Arrow
    batches on the write side (each group materializes one shard —
    bounded by the shard size, not the table), opaque-binary ingestion
    plus per-batch member parsing on the read side, shard id recovered
    from the filename. Payloads are the documents' UTF-8 bytes
    standing in for media blobs (same pattern as multimodal_decode's
    stub contract). At scale the scratch dir is an object-store
    prefix; shard size (100 members) is the knob balancing loader
    parallelism against per-object overhead. The oracle states the
    invariant the round-trip must preserve: every member accounted
    for, byte-for-byte sizes, per shard.
    """
    import pandas as pd

    from tpctools_spark.queries.scans import _scratch_dir

    out = _scratch_dir("tar-shards")

    def write_shards(key, pdf):
        import io
        import os
        import tarfile

        (shard,) = key
        pdf = pdf.sort_values("doc_id")
        path = os.path.join(out, f"shard-{shard:06d}.tar")
        n = 0
        total = 0
        with tarfile.open(path, "w") as tf:
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                payload = text.encode("utf-8")
                info = tarfile.TarInfo(name=f"{doc_id}.txt")
                info.size = len(payload)
                info.mtime = 0  # deterministic shard bytes
                tf.addfile(info, io.BytesIO(payload))
                n += 1
                total += len(payload)
        return pd.DataFrame({"shard": [shard], "n": [n], "b": [total]})

    d = table(spark, sf_dir, "documents").select(
        F.expr("doc_id DIV 100").alias("shard"), "doc_id", "text"
    )
    # The in-group sort (pandas-side, bounded by shard size) makes
    # member order — and therefore shard bytes — reproducible.
    written = d.groupBy("shard").applyInPandas(
        write_shards, "shard long, n long, b long"
    )
    written.count()  # materialize the shard files before scanning them

    def parse_members(batch_iter):
        import io
        import os
        import tarfile

        for pdf in batch_iter:
            shards, names, sizes = [], [], []
            for path, content in zip(pdf["path"], pdf["content"]):
                shard = int(
                    os.path.basename(path).removeprefix("shard-").removesuffix(".tar")
                )
                with tarfile.open(fileobj=io.BytesIO(bytes(content))) as tf:
                    for m in tf.getmembers():
                        shards.append(shard)
                        names.append(m.name)
                        sizes.append(m.size)
            yield pd.DataFrame(
                {"shard": shards, "member": names, "n_bytes": sizes}
            )

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.tar")
        .load(out)
    )
    members = files.select("path", "content").mapInPandas(
        parse_members, "shard long, member string, n_bytes long"
    )
    return members.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum("n_bytes").cast("bigint").alias("payload_bytes"),
        F.min(F.regexp_extract("member", r"^([0-9]+)", 1).cast("bigint")).alias(
            "first_doc"
        ),
        F.max(F.regexp_extract("member", r"^([0-9]+)", 1).cast("bigint")).alias(
            "last_doc"
        ),
    )
