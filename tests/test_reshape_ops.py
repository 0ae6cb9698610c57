"""Semantic invariants for the reshaping/incremental operators."""

from __future__ import annotations

from tpctools_spark.registry import spark_queries


def test_gapfill_grid_is_dense(spark, sf_dir):
    """Every user's day sequence is contiguous; gap rows have zero
    events and inherit the previous day's value."""
    rows = spark_queries()["events_gapfill"](spark, sf_dir).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user
    for days in by_user.values():
        days.sort(key=lambda r: r.day)
        seq = [r.day for r in days]
        assert seq == list(range(seq[0], seq[-1] + 1))
        last_seen = None
        for r in days:
            if r.n_events == 0:
                assert r.day_value is None
                assert r.filled_value == last_seen
            else:
                assert r.filled_value == r.day_value
                last_seen = r.day_value


def test_upsert_partitions_actions(spark, sf_dir):
    """keep/update/insert form a partition of the merged key space with
    the derived-batch cardinalities."""
    rows = spark_queries()["corpus_upsert"](spark, sf_dir).collect()
    actions = {}
    for r in rows:
        actions.setdefault(r.action, set()).add(r.doc_id)
    base_n = 500 if "0.01" in sf_dir else None
    assert actions["update"] == {d for d in actions["update"] if d % 10 == 0}
    assert all(d >= 1000000 for d in actions["insert"])
    assert not (actions["keep"] & actions["update"])
    for r in rows:
        assert r.version == (1 if r.action == "keep" else 2)
    if base_n:
        assert len(actions["keep"]) + len(actions["update"]) == base_n


def test_reservoir_plan_and_k(spark, sf_dir):
    """Optimizer derives the reservoir property (WindowGroupLimit) and
    every group yields at most k=5 rows, reproducibly."""
    q = spark_queries()["sample_reservoir_group"]
    df = q(spark, sf_dir)
    rows = df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    per_lang: dict[str, int] = {}
    for r in rows:
        per_lang[r.lang] = per_lang.get(r.lang, 0) + 1
    assert all(v <= 5 for v in per_lang.values())
    assert {r.doc_id for r in rows} == {r.doc_id for r in q(spark, sf_dir).collect()}


def test_cube_lattice_counts(spark, sf_dir):
    """CUBE emits all four grouping combinations and the grand total
    equals the corpus size."""
    rows = spark_queries()["agg_cube"](spark, sf_dir).collect()
    combos = {(r.g_lang, r.g_source) for r in rows}
    assert combos == {(0, 0), (0, 1), (1, 0), (1, 1)}
    grand = [r for r in rows if r.g_lang == 1 and r.g_source == 1]
    assert len(grand) == 1
    detail_sum = sum(r.n_docs for r in rows if r.g_lang == 0 and r.g_source == 0)
    assert grand[0].n_docs == detail_sum
