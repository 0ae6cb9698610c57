"""CLI: ``generate`` / ``convert`` subcommands (reference parity).

Mirrors the reference's StructOpt surface (``/root/reference/src/main.rs:22-119``):

    python -m tpctools_spark.cli generate --benchmark tpch -s 0.01 \\
        -n 8 --output /tmp/raw [--format parquet|csv]
    python -m tpctools_spark.cli convert --benchmark tpch \\
        --input /tmp/raw --output /tmp/pq \\
        --format parquet --compression snappy

Differences by design: no ``--generator-path`` (no external dbgen/dsdgen
binary — generation is native Spark, SURVEY.md §2.A A8/A9), and
``generate`` can emit parquet directly (the reference needs a separate
convert pass).
"""

from __future__ import annotations

import argparse
import sys


def _benchmark_tables(name: str) -> list[str]:
    # Dispatch parity: create_benchmark, src/main.rs:113-118.
    if name.lower() in ("tpch", "tpc-h"):
        from tpctools_spark.schemas import TPCH_TABLE_NAMES

        return TPCH_TABLE_NAMES
    if name.lower() in ("tpcds", "tpc-ds"):
        from tpctools_spark.schemas_tpcds import TPCDS_TABLE_NAMES

        return TPCDS_TABLE_NAMES
    if name.lower() == "corpus":
        from tpctools_spark.generate_corpus import CORPUS_TABLE_NAMES

        return CORPUS_TABLE_NAMES
    raise SystemExit(f"invalid benchmark name: {name}")


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="tpctools_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("generate", help="Generate benchmark data (src/main.rs:24-43)")
    g.add_argument("--benchmark", default="tpch")
    g.add_argument("-s", "--scale", type=float, required=True)
    g.add_argument("-n", "--partitions", type=int, required=True)
    g.add_argument("--output", required=True)
    g.add_argument("--format", default="parquet", choices=["parquet", "csv"])
    g.add_argument("--compression", default="snappy")

    c = sub.add_parser("convert", help="Convert .tbl dirs to parquet/csv (src/main.rs:45-58)")
    c.add_argument("--benchmark", default="tpch")
    c.add_argument("--input", required=True)
    c.add_argument("--output", required=True)
    c.add_argument("--format", default="parquet", choices=["parquet", "csv"])
    c.add_argument("--compression", default="snappy")

    q = sub.add_parser(
        "query",
        help="Run a registered query from the SURVEY §2.B inventory "
        "(engine extension beyond the reference CLI)",
    )
    q.add_argument("--name", help="query name (see --list)")
    q.add_argument("--list", action="store_true", help="list registered queries")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    q.add_argument("--output", help="write result here (else print to stdout)")
    q.add_argument("--format", default="parquet", choices=["parquet", "csv", "json"])
    q.add_argument("--limit", type=int, default=20, help="stdout row cap")

    args = p.parse_args(argv)

    if args.cmd == "query":
        from tpctools_spark.registry import oracle_queries, spark_queries

        queries = spark_queries()
        if args.list or not args.name:
            oracles = oracle_queries()
            for name in sorted(queries):
                kind = "oracle" if name in oracles else "rows-only"
                print(f"{name}\t{kind}")
            return 0
        if args.name not in queries:
            raise SystemExit(f"unknown query: {args.name} (try --list)")
        from tpctools_spark.session import get_spark

        spark = get_spark(f"tpctools-query-{args.name}")
        spark.sparkContext.setLogLevel("ERROR")
        import time

        t0 = time.perf_counter()
        df = queries[args.name](spark, args.sf_dir)
        if args.output:
            df.write.mode("overwrite").format(args.format).save(args.output)
            print(f"query {args.name}: wrote {args.output} "
                  f"({time.perf_counter() - t0:.3f}s)")
        else:
            df.show(args.limit, truncate=False)
            print(f"query {args.name}: {time.perf_counter() - t0:.3f}s")
        return 0

    tables = _benchmark_tables(args.benchmark)

    from tpctools_spark.session import get_spark

    spark = get_spark(f"tpctools-{args.cmd}")
    tpcds = args.benchmark.lower() in ("tpcds", "tpc-ds")
    if args.cmd == "generate":
        if args.benchmark.lower() == "corpus":
            from tpctools_spark.generate_corpus import generate as gen
        elif tpcds:
            from tpctools_spark.generate_tpcds import generate_tpcds as gen
        else:
            from tpctools_spark.generate import generate as gen

        timings = gen(
            spark, args.scale, args.partitions, args.output,
            tables=tables, fmt=args.format, compression=args.compression,
        )
    else:
        from tpctools_spark.convert import convert_to_parquet

        schemas = None
        table_ext = ".tbl"
        if tpcds:
            from tpctools_spark.schemas_tpcds import TPCDS

            schemas, table_ext = TPCDS, ".dat"  # dsdgen layout, src/tpcds.rs:89-99
        timings = convert_to_parquet(
            spark, args.input, args.output,
            tables=tables, schemas=schemas, fmt=args.format,
            compression=args.compression, table_ext=table_ext,
        )
    for name, dt in timings.items():
        # Wall-time print parity: src/lib.rs:214, src/tpch.rs:87-90.
        print(f"{args.cmd} {name}: {dt:.3f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
