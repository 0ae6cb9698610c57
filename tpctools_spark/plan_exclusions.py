"""Canonical list of queries excluded from static plan auditing.

Both the blanket plan sweep (``tests/test_plan_sweep.py``) and the
committed fingerprint artifact (``scripts/plan_fingerprints.py`` →
``PLANS.json``) skip queries whose CONSTRUCTION is side-effecting —
planning them in an audit session would write scratch/warehouse tables,
start streams, or execute observation passes. One prefix → one reason,
defined once here so the two consumers cannot drift and the artifact
lists every exclusion with its justification; coverage is auditable as
``len(fingerprints) + len(excluded) == len(registry)``
(``tests/test_plan_sweep.py::test_plans_artifact_covers_registry``).

The list was narrowed empirically (r10): construction of every
candidate was probed for triggered jobs and created files, and eleven
previously-excluded queries (``sample_*``, ``reshape_*``,
``corpus_upsert``, ``join_range_bucketed``, ``generate_table``,
``layout_zorder_address``) proved construction-pure — they are now
fingerprinted and swept like any other query.

Each excluded query still has correctness coverage: the oracle sweep
runs all of them end-to-end, and dedicated tests assert their specific
plan/behavior properties.
"""

from __future__ import annotations

# prefix -> why queries with that prefix cannot be statically planned
# in a shared audit session.
PLAN_EXCLUDED_PREFIXES: dict[str, str] = {
    "stream_": (
        "constructs and runs a Structured Streaming micro-batch "
        "(memory sink / foreachBatch) at build time; covered by "
        "tests/test_streaming_recovery.py and test_streaming_rocksdb.py"
    ),
    "sink_": (
        "executes a write (parquet/orc/custom sink variants) at build "
        "time and reads its effect back; commit/layout behavior has "
        "dedicated tests in tests/test_new_ops_plans.py"
    ),
    "scan_csv": (
        "stages scratch CSV input files at build time (typed scan and "
        "quarantine demos)"
    ),
    "scan_json": "stages scratch JSON-lines input files at build time",
    "scan_binary": "stages scratch binary blob files at build time",
    "scan_schema": (
        "stages scratch parquet with drifting schemas at build time "
        "(merge-evolution demo)"
    ),
    "join_bucketed": (
        "writes bucketed warehouse tables at build time; the "
        "shuffle-free sort-merge plan is asserted in "
        "tests/test_scale_patterns.py"
    ),
    "join_dpp_partitioned": (
        "writes a partitioned warehouse table at build time; the "
        "dynamic-partition-pruning subquery is asserted in "
        "tests/test_mining_plans.py"
    ),
    "join_bloom_pruned": (
        "writes scratch tables at build time; the runtime bloom-filter "
        "pruning plan is asserted in tests/test_mining_plans.py"
    ),
    "quality_observe": (
        "executes the observed pass at build time (df.observe metrics "
        "only materialize on an action)"
    ),
    "quality_expectations": (
        "executes the expectation pass at build time (observation "
        "collect), same constraint as quality_observe"
    ),
}


def plan_exclusion_reason(name: str) -> str | None:
    """The exclusion reason for a query name, or None if it is
    fingerprint-eligible."""
    for prefix, reason in PLAN_EXCLUDED_PREFIXES.items():
        if name.startswith(prefix):
            return reason
    return None
