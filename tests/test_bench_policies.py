"""Pins for bench.py's measurement-protocol policies.

bench.py is a script, not a library, but its policies decide what the
per-round artifact CLAIMS — these tests keep the claims honest without
running the suite:

- ``sf1_rep_policy``: the per-query rep count under the draining soft
  budget (the r9-ADVICE low: a single "passes" scalar overstated the
  protocol for late-alphabet queries; the artifact now records what
  each min was a min OF, and this pins the thresholds that feed it).
- The compact-line key list must not advertise retired entries (the
  fused ``sim_pq_50k`` was retired in r11 for the build/probe split).
"""

from __future__ import annotations

import bench


def test_sf1_rep_policy_thresholds():
    budget = 750.0
    # Fresh suite: 3 back-to-back reps.
    assert bench.sf1_rep_policy(0.0, budget) == 3
    assert bench.sf1_rep_policy(0.54 * budget, budget) == 3
    # Past 55% of budget: 2.
    assert bench.sf1_rep_policy(0.55 * budget, budget) == 2
    assert bench.sf1_rep_policy(0.74 * budget, budget) == 2
    # Past 75%: 1 — never 0; the budget check that SKIPS a query
    # entirely lives outside the policy and records the skip count.
    assert bench.sf1_rep_policy(0.75 * budget, budget) == 1
    assert bench.sf1_rep_policy(10 * budget, budget) == 1


def test_sf1_rep_policy_scales_with_budget():
    # Thresholds are fractions of the budget, not absolutes.
    for budget in (100.0, 750.0, 3000.0):
        assert bench.sf1_rep_policy(0.5 * budget, budget) == 3
        assert bench.sf1_rep_policy(0.6 * budget, budget) == 2
        assert bench.sf1_rep_policy(0.8 * budget, budget) == 1


def test_compact_keys_drop_retired_pq_fused_entry():
    assert "sim_pq_50k" not in bench.COMPACT_KEYS
    assert "sim_pq_build_50k" in bench.COMPACT_KEYS
    assert "sim_pq_probe_50k" in bench.COMPACT_KEYS
