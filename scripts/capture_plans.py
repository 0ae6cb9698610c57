"""Capture .explain("formatted") output for named registry queries.

Usage:
    python scripts/capture_plans.py OUTDIR SUFFIX query [query ...]

Writes OUTDIR/<query>_<SUFFIX>.txt for each named query, built against
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1). Run from a repo (or
worktree) root so the local tpctools_spark package is the one imported —
that is how the round-13 *_before.txt files were produced from the
round-12 close commit.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.getcwd())

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    outdir, suffix, *names = sys.argv[1:]
    os.makedirs(outdir, exist_ok=True)
    from tpctools_spark.registry import spark_queries
    from tpctools_spark.session import get_spark

    spark = get_spark("plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    qs = spark_queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
