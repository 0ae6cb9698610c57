"""Local emulation of the driver's correctness gate.

Runs every registered query on Spark and (when an oracle exists) the
DuckDB twin, then compares row count, column names, exact values
(order-insensitive, columns sorted by name) AND the pandas/Arrow dtypes
of both results. The driver's value hash is type-sensitive — DuckDB
HUGEINT (Arrow decimal128) vs Spark int64 hash-mismatches even on equal
values — and it crashes on nested (list/map) cells, so both conditions
are hard FAILs here too.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(rows: list[tuple], colnames: list[str]) -> list[tuple]:
    """Sort columns by name, normalize cell values, sort rows."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def norm(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return repr(round(v, 9))
        if isinstance(v, bool):
            return str(v)
        if isinstance(v, (int, str)):
            return str(v)
        try:  # Decimal, date, datetime, arrays…
            return str(v)
        except Exception:
            return repr(v)

    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return sorted(out)


def _dtype_key(s: pd.Series) -> str:
    """Hash-equivalence class of a column the way the driver's
    type-sensitive hash sees it: all int widths hash alike, all float
    widths alike, but int vs float vs Decimal(object) vs str differ."""
    if s.dtype == object:
        for v in s:
            if v is None:
                continue
            if isinstance(v, (list, dict, np.ndarray, set, tuple)):
                return "NESTED"
            return f"object:{type(v).__name__}"
        return "object:empty"
    kind = s.dtype.kind  # i/u → int, f → float, b → bool, M → datetime
    return {"i": "int", "u": "int", "f": "float", "b": "bool", "M": "datetime"}.get(
        kind, str(s.dtype)
    )


def _frame_dtypes(df: pd.DataFrame) -> dict[str, str]:
    return {c: _dtype_key(df[c]) for c in df.columns}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod

    if os.environ.get("ORACLE_HOSTILE"):
        # Driver-emulation mode: a PLAIN Spark 4 session — ANSI on,
        # NTZ parquet inference on, non-UTC host timezone — the exact
        # environment the external correctness driver runs queries in.
        # get_spark()'s forgiving confs can mask bugs (int32 overflow
        # wraps instead of erroring, NTZ never appears); this mode
        # surfaces them.
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master(
                f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
            )
            .appName("oracle-check-hostile")
            .config("spark.ui.enabled", "false")
            .config("spark.sql.ansi.enabled", "true")
            .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
            .config("spark.sql.session.timeZone", "America/New_York")
            .config("spark.driver.memory", "16g")
            .getOrCreate()
        )
    else:
        from tpctools_spark.session import get_spark

        spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures, passes, rows_only = [], [], []

    # Soft wall-clock budget (seconds) for big-SF sweeps: when
    # exceeded, remaining queries are SKIPPED (counted and reported,
    # never silently) so a budgeted sf0.1 sweep can ride the round
    # gate without starving it. Unset = no budget.
    budget_s = float(os.environ.get("ORACLE_BUDGET_S", "0") or 0)
    sweep_t0 = time.time()
    skipped_for_budget = 0

    for name, fn in qs.items():
        if only and name not in only:
            continue
        if budget_s and time.time() - sweep_t0 > budget_s:
            skipped_for_budget += 1
            continue
        t0 = time.time()
        try:
            # The repo cache convention (see pipeline._dsir_per_doc /
            # dedup.dedup_lsh_cosine): query builders may .cache()
            # multi-consumer streams and rely on the HARNESS clearing
            # between queries. Without this, a full 400-query sweep
            # accumulates every cached DataFrame for the whole session
            # (r11 ADVICE) — MEMORY_AND_DISK spills rather than OOMs,
            # but disk/memory grows monotonically and later timings lie.
            spark.catalog.clearCache()
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            spdf = sdf.toPandas()
            srows = [tuple(r) for r in spdf.itertuples(index=False, name=None)]
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL {name}: spark error: {str(e)[:500]}")
            continue
        dt = time.time() - t0

        sdtypes = _frame_dtypes(spdf)
        nested = [c for c, k in sdtypes.items() if k == "NESTED"]
        if nested:
            failures.append((name, f"driver-unhashable nested cells in {nested}"))
            print(f"FAIL {name}: nested (list/map) output cells {nested} crash the driver hasher")
            continue

        if name not in oracles:
            rows_only.append(name)
            print(f"ROWS {name}: {len(srows)} rows, cols={scols} ({dt:.1f}s)")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = rel.columns
            dpdf = rel.arrow().to_pandas()
            drows = [tuple(r) for r in dpdf.itertuples(index=False, name=None)]
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL {name}: duckdb error: {str(e)[:500]}")
            continue

        if sorted(scols) != sorted(dcols):
            failures.append((name, f"columns {sorted(scols)} != {sorted(dcols)}"))
            print(f"FAIL {name}: column mismatch\n  spark: {sorted(scols)}\n  duck:  {sorted(dcols)}")
            continue
        ddtypes = _frame_dtypes(dpdf)
        mism = {
            c: (sdtypes[c], ddtypes[c])
            for c in scols
            if sdtypes[c] != ddtypes[c]
        }
        if mism:
            failures.append((name, f"dtype mismatch {mism}"))
            print(f"FAIL {name}: dtype mismatch (type-sensitive driver hash): {mism}")
            continue
        if len(srows) != len(drows):
            failures.append((name, f"rowcount {len(srows)} != {len(drows)}"))
            print(f"FAIL {name}: rowcount spark={len(srows)} duck={len(drows)}")
            continue
        ns, nd = normalize(srows, scols), normalize(drows, dcols)
        if ns != nd:
            diff = [(a, b) for a, b in zip(ns, nd) if a != b][:3]
            failures.append((name, f"value mismatch, first diffs: {diff}"))
            print(f"FAIL {name}: value mismatch ({len([1 for a,b in zip(ns,nd) if a!=b])} rows differ)")
            for a, b in diff:
                print(f"  spark: {a}\n  duck:  {b}")
            continue
        passes.append(name)
        print(f"PASS {name}: {len(srows)} rows ({dt:.1f}s)")

    budget_note = (
        f", {skipped_for_budget} SKIPPED (budget {budget_s:.0f}s hit)"
        if skipped_for_budget
        else ""
    )
    print(
        f"\n== {len(passes)} oracle-pass, {len(rows_only)} rows-only, "
        f"{len(failures)} FAIL{budget_note} =="
    )
    for name, why in failures:
        print(f"  FAIL {name}: {why[:300]}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
