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


@query("multimodal_decode")  # stubbed decode → rows-only
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column pipeline: text → binary payload → mapInPandas
    feature extraction (stub decoder), the shape of an image/audio
    feature pass at 100 TB."""
    from tpctools_spark.multimodal import extract_features

    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
    )
    return extract_features(docs)


@query("multimodal_frame_sample")  # stubbed decode → rows-only
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fan-out binary pipeline: each payload yields FRAMES_PER_DOC frame
    rows (video keyframe-sampling shape) via a single mapInPandas stage
    whose output cardinality is decoder-controlled."""
    from tpctools_spark.multimodal import sample_frames

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return sample_frames(docs)
