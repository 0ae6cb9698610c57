"""Round-close gate: run EVERY check in the only order that cannot
produce a stale snapshot, failing loudly on the first red step.

The round-12 close committed three freshly-registered queries AFTER
the final sweep — one of them (`quality_fdr_bh`) had never executed
and crashed on every invocation, and the README inventory went stale.
This script encodes the invariant that prevents that class of mistake:

    sweep (all SFs + hostile) → pytest → inventory regen (must be a
    no-op) → bench solo-run

Nothing may register a `@query` after step 1; step 3 fails if the
committed README does not already match the registry, so a
"register-then-forget" lands red instead of silently stale.

Usage:
    python scripts/round_close.py            # full gate (~40-60 min)
    python scripts/round_close.py --no-bench # skip the bench step
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(label: str, cmd: list[str], env: dict | None = None) -> None:
    print(f"\n=== round_close: {label} ===", flush=True)
    t0 = time.time()
    e = dict(os.environ)
    if env:
        e.update(env)
    rc = subprocess.call(cmd, cwd=REPO, env=e)
    dt = time.time() - t0
    if rc != 0:
        print(f"!!! round_close FAILED at step '{label}' (rc={rc}, {dt:.0f}s)")
        sys.exit(rc)
    print(f"=== {label}: OK ({dt:.0f}s) ===", flush=True)


def main() -> int:
    no_bench = "--no-bench" in sys.argv
    py = sys.executable

    # 1. Full oracle sweeps. Order: smallest first (fastest feedback),
    #    then the driver-emulating hostile session, then the budgeted
    #    sf0.1 sweep that catches cardinality-dependent plan bugs.
    run("sweep sf0.001", [py, "scripts/check_oracle.py", "/root/testdata/sf0.001"])
    run(
        "sweep sf0.001 HOSTILE",
        [py, "scripts/check_oracle.py", "/root/testdata/sf0.001"],
        env={"ORACLE_HOSTILE": "1"},
    )
    run("sweep sf0.01", [py, "scripts/check_oracle.py", "/root/testdata/sf0.01"])
    run(
        "sweep sf0.1 (budgeted)",
        [py, "scripts/check_oracle.py", "/root/testdata/sf0.1"],
        env={"ORACLE_BUDGET_S": os.environ.get("ORACLE_BUDGET_S", "1500")},
    )

    # 2. The pytest suite — plan sweeps, smoke, property tests,
    #    registry/README consistency.
    run("pytest", [py, "-m", "pytest", "tests/", "-x", "-q"])

    # 3. Inventory regen must be a NO-OP against the working tree: if
    #    it changes README.md, the inventory was stale at close time.
    run("inventory regen", [py, "scripts/gen_readme_inventory.py"])
    # Diff against HEAD, not just the index: a stale README that was
    # staged-but-not-committed (or a regen staged over a stale commit)
    # must still fail the gate.
    rc = subprocess.call(
        ["git", "diff", "--exit-code", "--stat", "HEAD", "--", "README.md"],
        cwd=REPO,
    )
    if rc != 0:
        print(
            "!!! round_close FAILED: README inventory was stale "
            "(gen_readme_inventory.py changed it — commit the regen, "
            "then re-run round_close)"
        )
        return 1

    # 4. Plan fingerprints: regenerate PLANS.json (pre-checkpoint
    #    trees, normalized expr ids). Unlike the README step this does
    #    NOT fail on a diff — plan changes are legitimate — but an
    #    uncommitted diff here means a plan changed without review:
    #    inspect `git diff PLANS.json` and commit it with the round.
    run("plan fingerprints", [py, "scripts/plan_fingerprints.py"])
    subprocess.call(
        ["git", "diff", "--stat", "HEAD", "--", "PLANS.json"], cwd=REPO
    )

    # 5. Bench, solo run (caller must ensure no other Spark JVM on the
    #    box — see SURVEY §6 round-11 note).
    if not no_bench:
        run("bench sf0.1", [py, "bench.py"])

    print("\n=== round_close: ALL GREEN ===")
    return 0


if __name__ == "__main__":
    sys.exit(main())
