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


def test_calibration_verdict_clean_run_has_no_warning():
    out = bench._calibration_verdict(0.6, 0.65, ref=0.65)
    assert out["start"] == 0.6 and out["end"] == 0.65
    assert out["ref"] == 0.65
    assert "warning" not in out


def test_calibration_verdict_flags_mid_suite_drift():
    # start/end disagree >1.2x -> load changed mid-suite.
    out = bench._calibration_verdict(0.6, 0.9, ref=0.65)
    assert "warning" in out and "mid-suite" in out["warning"]


def test_calibration_verdict_flags_contended_host():
    # Both samples steady but >1.5x the committed reference -> the
    # r12-driver failure mode: uniformly inflated timings.
    out = bench._calibration_verdict(1.6, 1.62, ref=0.65)
    assert "warning" in out and "contended" in out["warning"]


def test_calibration_verdict_survives_failed_sample():
    # A failed calibration records -1.0; must not divide by zero or
    # emit a bogus drift warning that hides the real story.
    out = bench._calibration_verdict(-1.0, 0.6, ref=0.65)
    assert out["start"] == -1.0


def test_calibration_ref_is_committed():
    # The reference value is part of the artifact contract: a driver
    # re-run compares against the same constant this repo committed.
    assert 0.3 <= bench._CALIB_REF_S <= 1.5
