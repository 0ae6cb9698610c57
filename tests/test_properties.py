"""Property-based tests (hypothesis) for the determinism contracts.

These are the invariants everything else leans on: cross-engine FP
truncation (oracle hash-equality), partition-invariant generation (the
dbgen -C/-S chunking contract, SURVEY.md §5.2), and the pure-arithmetic
split hash (stable sampling membership). Each example batches many
generated values into one Spark job so the suite stays fast.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

finite_doubles = st.floats(
    min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
)


@settings(max_examples=3, deadline=None)
@given(st.lists(finite_doubles, min_size=1, max_size=200))
def test_trunc_digits_cross_engine(spark, xs):
    """floor(x·100)/100 is bit-identical in Spark and DuckDB for any
    finite double — the property that makes oracle value-hashes safe."""
    from tpctools_spark.queries._util import trunc_digits

    df = spark.createDataFrame([(i, x) for i, x in enumerate(xs)], "i long, x double")
    got = {
        r["i"]: r["t"]
        for r in df.select("i", trunc_digits(F.col("x"), 2).alias("t")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE vals (i BIGINT, x DOUBLE)")
    con.executemany("INSERT INTO vals VALUES (?, ?)", list(enumerate(xs)))
    want = dict(
        con.sql(
            "SELECT i, CAST(floor(x * 100) AS DOUBLE) / 100 FROM vals"
        ).fetchall()
    )
    assert got == want


@settings(max_examples=4, deadline=None)
@given(
    table=st.sampled_from(["region", "nation", "supplier", "part"]),
    p1=st.integers(min_value=1, max_value=48),
    p2=st.integers(min_value=1, max_value=48),
)
def test_generation_partition_invariance(spark, table, p1, p2):
    """generate(sf, p1) ≡ generate(sf, p2) as a row set for ANY partition
    counts — the dbgen -C/-S contract re-expressed."""
    from tpctools_spark.generate import build_table

    def rowset_hash(p):
        df = build_table(spark, table, 0.001, p)
        return (
            df.select(F.sum(F.xxhash64(*df.columns)).alias("h")).collect()[0]["h"],
            df.count(),
        )

    assert rowset_hash(p1) == rowset_hash(p2)


@settings(max_examples=20, deadline=None)
@given(st.integers(min_value=0, max_value=2**31))
def test_split_hash_engine_agnostic(doc_id):
    """The Knuth multiplicative split bucket is plain int64 arithmetic —
    Python, DuckDB, and (by the sample_hash_split oracle run) Spark all
    agree, and the product never overflows int64."""
    py = (doc_id * 2654435761) % 100
    dk = duckdb.sql(f"SELECT ({doc_id} * 2654435761) % 100").fetchone()[0]
    assert py == dk
    assert doc_id * 2654435761 < 2**63


def test_split_hash_spark_agrees(spark):
    ids = list(range(0, 5000, 7))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r["doc_id"]: r["b"]
        for r in df.select(
            "doc_id",
            F.pmod(F.col("doc_id") * F.lit(2654435761), F.lit(100)).alias("b"),
        ).collect()
    }
    assert got == {i: (i * 2654435761) % 100 for i in ids}


def test_bpe_encode_invariants(spark):
    """Merging can only shrink the token stream: tokens <= chars,
    compression >= 1, and totals are consistent per source."""
    from tpctools_spark.registry import spark_queries

    rows = spark_queries()["text_bpe_encode"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert r.total_tokens <= r.total_chars
        assert r.compression >= 1.0
        assert r.n_docs > 0


def test_fixture_schemas_identical_across_sfs(spark):
    """Schema drift guard: every fixture table must present the same
    schema through catalog.table at every driver scale factor."""
    from tpctools_spark.catalog import table

    tables = [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]
    sfs = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    for t in tables:
        schemas = {
            sf: [(f.name, f.dataType.simpleString()) for f in table(spark, sf, t).schema.fields]
            for sf in sfs
        }
        vals = list(schemas.values())
        assert vals[0] == vals[1], (t, schemas)
