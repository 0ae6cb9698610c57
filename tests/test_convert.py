"""Converter parity: typed pipe-CSV scan → parquet sink, `ignore` drop."""

from __future__ import annotations

import os

import pytest

from tpctools_spark.convert import convert_table, convert_to_parquet, scan_tbl
from tpctools_spark.schemas import TPCH_REFERENCE

REGION_TBL = (
    "0|AFRICA|lar deposits blithely|\n"
    "1|AMERICA|hs use ironic requests|\n"
    "2|ASIA|ges. thinly even pinto beans|\n"
)


@pytest.fixture()
def tbl_dir(tmp_path):
    """A dbgen-style layout: <dir>/region.tbl/part-0.tbl with trailing |."""
    d = tmp_path / "raw" / "region.tbl"
    d.mkdir(parents=True)
    (d / "part-0.tbl").write_text(REGION_TBL)
    return str(tmp_path / "raw")


def test_scan_reads_typed_rows(spark, tbl_dir):
    df = scan_tbl(spark, os.path.join(tbl_dir, "region.tbl"), TPCH_REFERENCE["region"])
    rows = {r.r_regionkey: r.r_name for r in df.collect()}
    assert rows == {0: "AFRICA", 1: "AMERICA", 2: "ASIA"}
    # trailing | lands in the nullable ignore column, as in the reference
    assert df.schema["ignore"].nullable


def test_convert_drops_ignore_and_roundtrips(spark, tbl_dir, tmp_path):
    out = str(tmp_path / "pq" / "region.parquet")
    convert_table(spark, os.path.join(tbl_dir, "region.tbl"),
                  TPCH_REFERENCE["region"], out)
    back = spark.read.parquet(out)
    assert "ignore" not in back.columns
    assert back.count() == 3
    assert dict((r.r_regionkey, r.r_comment) for r in back.collect())[2].startswith("ges.")


def test_convert_all_tables_loop(spark, tbl_dir, tmp_path):
    out = str(tmp_path / "pq2")
    timings = convert_to_parquet(spark, tbl_dir, out, tables=["region"])
    assert set(timings) == {"region"}
    assert spark.read.parquet(f"{out}/region.parquet").count() == 3


def test_missing_input_fails_fast(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        convert_to_parquet(spark, str(tmp_path), str(tmp_path / "o"), tables=["region"])


def test_bad_compression_rejected(spark, tbl_dir, tmp_path):
    with pytest.raises(ValueError, match="unsupported compression"):
        convert_table(spark, os.path.join(tbl_dir, "region.tbl"),
                      TPCH_REFERENCE["region"], str(tmp_path / "x"),
                      compression="lzo")


def test_existing_output_rejected(spark, tbl_dir, tmp_path):
    out = str(tmp_path / "pq3" / "region.parquet")
    convert_table(spark, os.path.join(tbl_dir, "region.tbl"),
                  TPCH_REFERENCE["region"], out)
    with pytest.raises(Exception):  # reference panics on existing output
        convert_table(spark, os.path.join(tbl_dir, "region.tbl"),
                      TPCH_REFERENCE["region"], out)


def test_cli_generate_then_convert_csv_roundtrip(spark, tmp_path):
    """End-to-end: generate csv → convert to parquet → typed equality."""
    from tpctools_spark.generate import build_table, generate

    raw = str(tmp_path / "raw")
    generate(spark, 0.001, 2, raw, tables=["nation"], fmt="csv")
    # generate writes <out>/nation.csv; the converter expects .tbl ext
    os.rename(f"{raw}/nation.csv", f"{raw}/nation.tbl")
    out = str(tmp_path / "pq4")
    # generated csv has no trailing '|' → scan without the ignore field
    from pyspark.sql.types import StructType

    schema = StructType([f for f in TPCH_REFERENCE["nation"].fields if f.name != "ignore"])
    convert_to_parquet(spark, raw, out, tables=["nation"],
                       schemas={"nation": schema}, file_ext=".csv")
    back = spark.read.parquet(f"{out}/nation.parquet")
    want = {(r.n_nationkey, r.n_name) for r in build_table(spark, "nation", 0.001, 1).collect()}
    got = {(r.n_nationkey, r.n_name) for r in back.collect()}
    assert got == want


def test_benchmark_facade(spark):
    """Tpc ABC parity: names, schemas, build, dispatch (src/lib.rs:28-43)."""
    import pytest as _pytest

    from tpctools_spark.benchmark import TpcDs, TpcH, create_benchmark

    h = create_benchmark("tpc-h")
    assert isinstance(h, TpcH) and len(h.table_names()) == 8
    assert h.schema("lineitem")["l_orderkey"].dataType.typeName() == "long"
    assert h.build_table(spark, "region", 0.001, 1).count() == 5

    ds = create_benchmark("tpcds")
    assert isinstance(ds, TpcDs) and len(ds.table_names()) == 24
    assert ds.schema("store_sales").fieldNames()[0] == "ss_sold_date_sk"

    with _pytest.raises(ValueError):
        create_benchmark("tpcx")


def test_benchmark_facade_convert(spark, tbl_dir, tmp_path):
    from tpctools_spark.benchmark import create_benchmark

    out = str(tmp_path / "facade_pq")
    bench = create_benchmark("tpch")
    # only region exists in the fixture dir; convert just that table
    from tpctools_spark.convert import convert_to_parquet

    timings = convert_to_parquet(
        spark, tbl_dir, out, tables=["region"],
        schemas={"region": bench.schema("region")}, parallel=2,
    )
    assert set(timings) == {"region"}
    assert spark.read.parquet(f"{out}/region.parquet").count() == 3


def test_convert_orc_json_roundtrip(spark, tbl_dir, tmp_path):
    """Beyond-reference formats: the same typed scan sinks to ORC and
    JSON and reads back value-identical."""
    from tpctools_spark.convert import convert_table
    from tpctools_spark.schemas import TPCH_REFERENCE

    want = {(0, "AFRICA"), (1, "AMERICA"), (2, "ASIA")}
    for fmt, reader in (("orc", spark.read.orc), ("json", spark.read.json)):
        out = str(tmp_path / f"region_{fmt}")
        convert_table(
            spark, f"{tbl_dir}/region.tbl", TPCH_REFERENCE["region"], out, fmt=fmt
        )
        back = reader(out)
        got = {(int(r.r_regionkey), r.r_name) for r in back.collect()}
        assert got == want


def test_cli_query_list_and_run(spark, tmp_path, capsys):
    """`query --list` enumerates the registry; `query --name` writes the
    result relation to the requested sink."""
    from tpctools_spark.cli import main
    from tpctools_spark.registry import spark_queries

    assert main(["query", "--list"]) == 0
    out = capsys.readouterr().out
    assert "agg_group_sum\toracle" in out
    assert len(out.strip().splitlines()) == len(spark_queries())

    dest = str(tmp_path / "q_out")
    assert (
        main(
            ["query", "--name", "filter_pred",
             "--sf-dir", "/root/testdata/sf0.001",
             "--output", dest, "--format", "parquet"]
        )
        == 0
    )
    assert spark.read.parquet(dest).count() > 0
