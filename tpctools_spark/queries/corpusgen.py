"""Corpus-domain generator contract demos (§2.A A8/A9 extended).

Each key materializes a fixed-size slice of the pure-function-of-id
corpus generator (tpctools_spark.generate_corpus) and is value-checked
against a DuckDB re-derivation of the same arithmetic — the exact
contract the TPC-H/TPC-DS generators already honor, extended to the
documents/embeddings/events domain so the dedup/ANN/event operators
can be scale-tested without driver fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tpctools_spark.generate_corpus import (
    EVENT_TYPES,
    VOCAB,
    _A,
    _B,
    _BASE_US,
    _C,
    _P,
    _SPAN_US,
    _sql_h,
    gen_documents,
    gen_embeddings,
    gen_events,
)
from tpctools_spark.registry import query

_N_DOCS = 500
_N_VECS = 500
_N_EVENTS = 1000

_SQL_VOCAB = "[" + ", ".join(f"'{w}'" for w in VOCAB) + "]"
_SQL_TYPES = "[" + ", ".join(f"'{t}'" for t in EVENT_TYPES) + "]"


@query(
    "generate_documents",
    oracle=f"""
    WITH ids AS (SELECT unnest(range(0, {_N_DOCS})) AS i),
    base AS (
      SELECT i, CASE WHEN i % 7 = 0 AND i > 0 THEN i - 1 ELSE i END AS b
      FROM ids
    ), prep AS (
      SELECT i, b, ({_sql_h('b', '0')}) % 60 + 20 AS n FROM base
    ), texted AS (
      SELECT i, b, n,
             array_to_string(list_transform(range(1, CAST(n AS INTEGER) + 1),
               p -> ({_SQL_VOCAB})[({_sql_h('b', 'p')}) % {len(VOCAB)} + 1]),
               ' ') AS body
      FROM prep
    )
    SELECT i AS doc_id,
           'src' || CAST(i % 20 AS VARCHAR) AS source,
           (['en', 'de', 'fr', 'es'])[({_sql_h('i', '7')}) % 4 + 1] AS lang,
           CAST(len(string_split(
             CASE WHEN i % 7 = 0 AND i > 0
                  THEN body || ' ' || ({_SQL_VOCAB})[i % {len(VOCAB)} + 1]
                  ELSE body END, ' ')) AS BIGINT) AS n_words,
           CASE WHEN i % 7 = 0 AND i > 0
                THEN body || ' ' || ({_SQL_VOCAB})[i % {len(VOCAB)} + 1]
                ELSE body END AS text
    FROM texted
    """,
)
def generate_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus generator contract: {_N_DOCS} documents with planted
    near-dups (every 7th doc = predecessor + one marker word), every
    byte a pure function of doc_id — partition-invariant, SQL-twinned.
    """
    return gen_documents(spark, _N_DOCS)


@query(
    "generate_embeddings",
    oracle=f"""
    WITH ids AS (SELECT unnest(range(0, {_N_VECS})) AS i)
    SELECT i % 10 AS label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(16 AS BIGINT) AS dim,
           CAST(SUM((i % 10) * 1000 + 37
                    - ((i % 10) * 1000 + 37) // 997 * 997 - 498
                    + ({_sql_h('i', '1')}) % 401 - 200) AS BIGINT)
             AS comp1_fx_sum
    FROM ids GROUP BY i % 10
    """,
)
def generate_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding generator contract: label-clustered vectors
    (centroid + bounded hash noise). Checked per label: vector count,
    dimension, and the EXACT fixed-point sum of the first component —
    recovered from the emitted doubles by round(x·1000), which is
    lossless because every component is (a+b)/1000 with |a+b| < 1000.
    """
    emb = gen_embeddings(spark, _N_VECS, dim=16)
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.max(F.size("embedding")).cast("bigint").alias("dim"),
        F.sum(F.round(F.element_at("embedding", 1) * 1000))
        .cast("bigint")
        .alias("comp1_fx_sum"),
    )


@query(
    "generate_events",
    oracle=f"""
    WITH ids AS (SELECT unnest(range(0, {_N_EVENTS})) AS i)
    SELECT i AS event_id,
           ({_sql_h('i', '1')}) % 500 AS user_id,
           {_BASE_US} + ({_sql_h('i', '2')}) % {_SPAN_US} AS ts_us,
           ({_SQL_TYPES})[({_sql_h('i', '3')}) % {len(EVENT_TYPES)} + 1]
             AS event_type,
           ({_sql_h('i', '4')}) % 30000 AS value_cents
    FROM ids
    """,
)
def generate_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-log generator contract: hash-assigned users, one-week
    timestamp spread in epoch micros (timezone-proof), integer-cents
    values — full-row value check against the SQL re-derivation.
    """
    return gen_events(spark, _N_EVENTS)
