"""Plan + behavioral assertions for the SQL-surface completions:
bag set ops, LISTAGG, GROUPS frame, ANY/ALL quantifiers, interval math.

Each of these lowers a SQL feature Spark lacks (or exposes one it hides)
to a composition of native operators — the tests lock both the identity
that makes the lowering correct and the physical shape that makes it
scale.
"""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    df.collect()
    s = df._jdf.queryExecution().executedPlan().toString()
    return s.split("+- == Initial Plan ==")[0]


def test_bag_set_ops_multiplicity_identity(spark):
    """min(m,n) + max(m-n,0) = m: INTERSECT ALL and EXCEPT ALL of the
    same pair must partition the left bag exactly."""
    from tpctools_spark.catalog import table
    from tpctools_spark.registry import spark_queries

    qs = spark_queries()
    n_inter = qs["set_intersect_all"](spark, SF).count()
    n_except = qs["set_except_all"](spark, SF).count()
    from pyspark.sql import functions as F

    n_left = (
        table(spark, SF, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .count()
    )
    assert n_inter + n_except == n_left
    # and the ALL forms must differ from the DISTINCT collapse
    distinct_inter = (
        qs["set_intersect_all"](spark, SF).distinct().count()
    )
    assert n_inter > distinct_inter  # real multiplicity survived


def test_listagg_is_window_group_limited(spark):
    """The top-5 pre-filter must reach the window sort (WindowGroupLimit)
    so per-group aggregation state stays bounded; the concatenation must
    be deterministically ordered."""
    from tpctools_spark.registry import spark_queries

    df = spark_queries()["agg_listagg"](spark, SF)
    plan = _plan(df)
    assert "WindowGroupLimit" in plan
    rows = df.collect()
    assert rows
    for r in rows:
        names = r.top_names.split(",")
        assert 1 <= len(names) <= 5
        assert names == sorted(names)


def test_groups_frame_matches_peer_group_semantics(spark):
    """Every row in a (user, ts) peer group must report the same frame
    value, and that value must equal the sum of the current + previous
    peer group — checked against an independent pandas computation."""
    import pandas as pd

    from tpctools_spark.registry import spark_queries

    got = (
        spark_queries()["window_groups_frame"](spark, SF)
        .toPandas()
        .set_index("event_id")["grp_rolling_value"]
    )
    ev = pd.read_parquet(f"{SF}/events.parquet")[
        ["event_id", "user_id", "ts", "value"]
    ]
    cents = (ev["value"] * 100).round().astype("int64")
    ev = ev.assign(cents=cents)
    g = (
        ev.groupby(["user_id", "ts"], sort=True)["cents"]
        .sum()
        .groupby(level=0)
        .apply(lambda s: s.rolling(2, min_periods=1).sum())
    )
    g.index = g.index.droplevel(0)
    expect = ev.set_index(["user_id", "ts"]).join(g.rename("roll"))
    expect = expect.set_index("event_id")["roll"] / 100.0
    assert len(got) == len(expect)
    diffs = (got - expect.reindex(got.index)).abs()
    assert float(diffs.max()) < 1e-9


def test_any_all_empty_set_identities(spark):
    """A supplier in a nation with no MACHINERY customers must get the
    quantifier identities: beats_all=True, beats_any=False — the case
    naive max/min rewrites break. The extrema side must broadcast."""
    from pyspark.sql import functions as F

    from tpctools_spark.catalog import table
    from tpctools_spark.registry import spark_queries

    df = spark_queries()["subquery_any_all"](spark, SF)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan

    cust_nations = {
        r.c_nationkey
        for r in table(spark, SF, "customer")
        .filter(F.col("c_mktsegment") == "MACHINERY")
        .select("c_nationkey")
        .distinct()
        .collect()
    }
    sup = {
        r.s_suppkey: r.s_nationkey
        for r in table(spark, SF, "supplier")
        .select("s_suppkey", "s_nationkey")
        .collect()
    }
    empty_sups = [k for k, n in sup.items() if n not in cust_nations]
    assert empty_sups, "fixture should leave some nation customer-less"
    rows = {r.s_suppkey: r for r in df.collect()}
    for k in empty_sups:
        assert rows[k].beats_all is True
        assert rows[k].beats_any is False


def test_interval_arith_clamps_and_iso_fields(spark):
    """Month-end clamping and ISO field ranges."""
    import datetime as dt

    from tpctools_spark.registry import spark_queries

    rows = spark_queries()["scalar_interval_arith"](spark, SF).collect()
    assert rows
    for r in rows:
        nm = dt.date.fromisoformat(r.next_month)
        me = dt.date.fromisoformat(r.month_end)
        # month_end is genuinely the last day of some month
        assert (me + dt.timedelta(days=1)).day == 1
        assert 1 <= r.qtr <= 4
        assert 1 <= r.iso_week <= 53
        assert 1 <= r.iso_dow <= 7
        assert nm.day <= 31


def test_not_in_null_aware_semantics(spark):
    """The null-planted NOT IN must return zero survivors while the
    clean one keeps customers without big orders — same SQL, two
    truth values apart."""
    from tpctools_spark.registry import spark_queries

    r = spark_queries()["subquery_not_in_null_aware"](spark, SF).collect()[0]
    assert r.not_in_with_null == 0
    assert r.not_in_clean > 0


def test_not_in_compiles_to_null_aware_anti_join(spark):
    """The null-planted NOT IN must compile to Catalyst's null-aware
    anti join (the trailing `true` on the LeftAnti broadcast join is
    the isNullAwareAntiJoin flag) — not a plain anti join, which would
    return wrong (non-empty) results under three-valued logic."""
    from tpctools_spark.registry import spark_queries

    df = spark_queries()["subquery_not_in_null_aware"](spark, SF)
    plan = _plan(df)
    assert "LeftAnti, BuildRight, true" in plan
