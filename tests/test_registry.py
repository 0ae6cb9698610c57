"""Driver-contract tests: registry shape and __spark_entry__ surface."""

from __future__ import annotations


def test_every_oracle_has_a_query():
    from tpctools_spark.registry import oracle_queries, spark_queries

    missing = set(oracle_queries()) - set(spark_queries())
    assert not missing, f"oracles without spark queries: {missing}"


def test_inventory_size():
    from tpctools_spark.registry import oracle_queries, spark_queries

    assert len(spark_queries()) >= 60
    assert len(oracle_queries()) >= 48


def test_entry_module_surface():
    import __spark_entry__ as m

    qs = m.queries()
    os_ = m.oracle_sql()
    assert callable(m.entry)
    assert set(os_) <= set(qs)
    for name, fn in qs.items():
        assert callable(fn), name


def test_entry_flagship_runs(spark):
    import __spark_entry__ as m

    df = m.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "l_returnflag" in df.columns
