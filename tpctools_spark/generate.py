"""Deterministic partition-parallel TPC-H-style data generation.

Reference parity: ``tpctools generate`` spawns one OS process per
partition running the official ``dbgen`` binary with chunking flags
``-C <parts> -S <i>`` (``/root/reference/src/tpch.rs:35-132``). The
defining property of that contract is **partition invariance**: the
union of all chunks is the same dataset regardless of how many chunks
you ask for.

Spark-first re-expression: every table is ``spark.range(n, numPartitions=p)``
followed by pure column expressions of ``id`` (xxhash64-seeded picks,
pmod ranges, date arithmetic, decimal money). Because ``range`` splits
the id space deterministically and every column is a pure function of
``id``, the generated *row set* is bit-identical for any partition count
— the dbgen ``-C/-S`` contract, without the external binary, at
task-per-partition parallelism with zero shuffles.

Cross-table consistency without joins:

- every FK lands in its parent's key range by construction;
- ``orders.o_totalprice`` is the exact decimal sum of its lineitems'
  ``extendedprice·(1-discount)·(1+tax)`` because both tables evaluate
  the *same* per-(orderkey, linenumber) formulas — orders folds them
  with ``F.aggregate`` over ``sequence(1, n_lines)``, lineitem explodes
  the same sequence. No join, no shuffle, still consistent.

Schemas: reference-parity ``TPCH_REFERENCE`` (src/tpch.rs:140-241)
minus the ``ignore`` CSV artifact column (SURVEY.md §1.3 deviation).
"""

from __future__ import annotations

import time

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from tpctools_spark.schemas import MONEY, TPCH_REFERENCE

# TPC-H cardinality contract (rows per unit scale factor).
ROWS_PER_SF = {
    "supplier": 10_000,
    "part": 200_000,
    "customer": 150_000,
    "orders": 1_500_000,
    # partsupp = 4 × part; lineitem = 1..7 per order (expected 4).
}

# Public TPC-H spec constants (region/nation names, segments, priorities).
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
NATIONS = [  # (name, regionkey) — TPC-H spec order, nationkey = index
    ("ALGERIA", 0), ("ARGENTINA", 1), ("BRAZIL", 1), ("CANADA", 1),
    ("EGYPT", 4), ("ETHIOPIA", 0), ("FRANCE", 3), ("GERMANY", 3),
    ("INDIA", 2), ("INDONESIA", 2), ("IRAN", 4), ("IRAQ", 4),
    ("JAPAN", 2), ("JORDAN", 4), ("KENYA", 0), ("MOROCCO", 0),
    ("MOZAMBIQUE", 0), ("PERU", 1), ("CHINA", 2), ("ROMANIA", 3),
    ("SAUDI ARABIA", 4), ("VIETNAM", 2), ("RUSSIA", 3),
    ("UNITED KINGDOM", 3), ("UNITED STATES", 1),
]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
SHIP_MODES = ["REG AIR", "AIR", "RAIL", "SHIP", "TRUCK", "MAIL", "FOB"]
SHIP_INSTRUCT = ["DELIVER IN PERSON", "COLLECT COD", "NONE", "TAKE BACK RETURN"]
CONTAINERS = ["SM CASE", "SM BOX", "MED BAG", "MED BOX", "LG CASE", "LG BOX",
              "JUMBO PKG", "WRAP JAR"]
P_TYPES = ["STANDARD ANODIZED TIN", "SMALL PLATED COPPER", "MEDIUM BURNISHED BRASS",
           "ECONOMY POLISHED STEEL", "PROMO BRUSHED NICKEL", "LARGE ANODIZED STEEL",
           "STANDARD BURNISHED COPPER", "PROMO PLATED TIN"]
P_NAME_WORDS = ["almond", "antique", "aquamarine", "azure", "beige", "bisque",
                "black", "blanched", "blue", "blush", "brown", "burlywood",
                "burnished", "chartreuse", "chiffon", "chocolate", "coral",
                "cornflower", "cream", "cyan", "dark", "deep", "dim", "dodger",
                "drab", "firebrick", "floral", "forest", "frosted", "gainsboro",
                "ghost", "goldenrod", "green", "grey", "honeydew", "hot",
                "indian", "ivory", "khaki", "lace"]
COMMENT_WORDS = ["carefully", "quickly", "furiously", "slyly", "blithely",
                 "ironic", "final", "pending", "regular", "express", "bold",
                 "even", "special", "silent", "daring", "requests", "deposits",
                 "packages", "accounts", "instructions", "theodolites", "pinto",
                 "beans", "foxes", "ideas", "platelets", "asymptotes", "sleep",
                 "wake", "nag", "haggle", "cajole", "integrate", "detect",
                 "across", "above", "against", "along", "the", "never"]

def _id() -> Column:
    return F.col("id")


def _h(seed: int, *cols: Column) -> Column:
    """Seeded 64-bit hash — the one PRNG primitive (deterministic)."""
    return F.xxhash64(F.lit(seed), *cols)


def _u(seed: int, n: int, *cols: Column) -> Column:
    """Uniform integer in [0, n) as a pure function of (seed, cols)."""
    return F.pmod(_h(seed, *cols), F.lit(n))


def _pick(seed: int, words: list[str], *cols: Column) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.element_at(arr, (_u(seed, len(words), *cols) + 1).cast("int"))


def _money(seed: int, lo_cents: int, hi_cents: int, *cols: Column) -> Column:
    cents = F.lit(lo_cents) + _u(seed, hi_cents - lo_cents + 1, *cols)
    return (cents.cast("decimal(13,0)") / 100).cast(MONEY)


def _comment(seed: int, n_words: int, *cols: Column) -> Column:
    return F.concat_ws(
        " ", *[_pick(seed + 101 * i, COMMENT_WORDS, *cols) for i in range(n_words)]
    )


def _phone(seed: int, nationkey: Column) -> Column:
    return F.concat(
        (nationkey + 10).cast("string"), F.lit("-"),
        F.lpad(_u(seed, 900, nationkey, _id()).cast("string"), 3, "0"), F.lit("-"),
        F.lpad(_u(seed + 1, 1000, _id()).cast("string"), 3, "0"), F.lit("-"),
        F.lpad(_u(seed + 2, 10000, _id()).cast("string"), 4, "0"),
    )


def _pad_key(prefix: str, key: Column) -> Column:
    return F.concat(F.lit(prefix), F.lpad(key.cast("string"), 9, "0"))


START_DATE = "1992-01-01"  # TPC-H date domain start
N_ORDER_DATES = 2406 - 151  # orderdate ∈ [1992-01-01, 1998-08-02] (spec)


# --- shared per-(orderkey, linenumber) line formulas; used by BOTH
# lineitem (exploded) and orders (folded into o_totalprice).
def _line_qty(o: Column, j: Column) -> Column:
    return (_u(11, 50, o, j) + 1).cast("decimal(13,0)").cast(MONEY)


def _line_price(o: Column, j: Column) -> Column:
    """extendedprice = quantity × unit retail price (900.00–2000.99)."""
    unit_cents = F.lit(90_000) + _u(12, 110_100, o, j)
    return (_line_qty(o, j) * (unit_cents.cast("decimal(13,0)") / 100)).cast(
        "decimal(15,2)"
    )


def _line_discount(o: Column, j: Column) -> Column:
    return (_u(13, 11, o, j).cast("decimal(13,0)") / 100).cast("decimal(4,2)")


def _line_tax(o: Column, j: Column) -> Column:
    return (_u(14, 9, o, j).cast("decimal(13,0)") / 100).cast("decimal(4,2)")


def _line_total(o: Column, j: Column) -> Column:
    """price·(1-disc)·(1+tax), rounded to cents — one canonical rounding
    both the lineitem rows and the orders fold share."""
    return (
        _line_price(o, j)
        * (F.lit(1).cast("decimal(4,2)") - _line_discount(o, j))
        * (F.lit(1).cast("decimal(4,2)") + _line_tax(o, j))
    ).cast("decimal(17,2)")


def _n_lines(o: Column) -> Column:
    return (_u(10, 7, o) + 1).cast("int")


def _order_date(o: Column) -> Column:
    return F.date_add(F.to_date(F.lit(START_DATE)), _u(15, N_ORDER_DATES, o).cast("int"))


def _range(spark: SparkSession, n: int, partitions: int) -> DataFrame:
    return spark.range(0, n, numPartitions=max(1, min(partitions, n)))


def build_table(
    spark: SparkSession, name: str, scale: float, partitions: int
) -> DataFrame:
    """One TPC-H-style table as a lazy DataFrame (no shuffle anywhere)."""
    n_supp = max(1, int(ROWS_PER_SF["supplier"] * scale))
    n_part = max(1, int(ROWS_PER_SF["part"] * scale))
    n_cust = max(1, int(ROWS_PER_SF["customer"] * scale))
    n_ord = max(1, int(ROWS_PER_SF["orders"] * scale))

    if name == "region":
        df = _range(spark, len(REGIONS), 1)
        return df.select(
            _id().alias("r_regionkey"),
            F.element_at(
                F.array(*[F.lit(r) for r in REGIONS]), (_id() + 1).cast("int")
            ).alias("r_name"),
            _comment(20, 6, _id()).alias("r_comment"),
        )

    if name == "nation":
        df = _range(spark, len(NATIONS), 1)
        names = F.array(*[F.lit(n) for n, _ in NATIONS])
        rkeys = F.array(*[F.lit(r) for _, r in NATIONS])
        return df.select(
            _id().alias("n_nationkey"),
            F.element_at(names, (_id() + 1).cast("int")).alias("n_name"),
            F.element_at(rkeys, (_id() + 1).cast("int")).cast("long").alias("n_regionkey"),
            _comment(21, 8, _id()).alias("n_comment"),
        )

    if name == "supplier":
        df = _range(spark, n_supp, partitions)
        key = _id() + 1
        nation = _u(30, len(NATIONS), key)
        return df.select(
            key.alias("s_suppkey"),
            _pad_key("Supplier#", key).alias("s_name"),
            F.concat(_pick(31, COMMENT_WORDS, key), F.lit(" st "),
                     _u(32, 1000, key).cast("string")).alias("s_address"),
            nation.alias("s_nationkey"),
            _phone(33, nation).alias("s_phone"),
            _money(34, -99_999, 999_999, key).alias("s_acctbal"),
            _comment(35, 10, key).alias("s_comment"),
        )

    if name == "part":
        df = _range(spark, n_part, partitions)
        key = _id() + 1
        return df.select(
            key.alias("p_partkey"),
            F.concat_ws(
                " ", *[_pick(40 + i, P_NAME_WORDS, key) for i in range(5)]
            ).alias("p_name"),
            F.concat(F.lit("Manufacturer#"),
                     (_u(45, 5, key) + 1).cast("string")).alias("p_mfgr"),
            F.concat(F.lit("Brand#"), (_u(45, 5, key) + 1).cast("string"),
                     (_u(46, 5, key) + 1).cast("string")).alias("p_brand"),
            _pick(47, P_TYPES, key).alias("p_type"),
            (_u(48, 50, key) + 1).cast("int").alias("p_size"),
            _pick(49, CONTAINERS, key).alias("p_container"),
            _money(50, 90_000, 200_099, key).alias("p_retailprice"),
            _comment(51, 5, key).alias("p_comment"),
        )

    if name == "partsupp":
        # 4 suppliers per part; supplier chosen by a spec-style stride so
        # every supplier serves ~4·n_part/n_supp parts.
        df = _range(spark, n_part * 4, partitions)
        partkey = (_id() / 4).cast("long") + 1
        j = F.pmod(_id(), F.lit(4))
        suppkey = F.pmod(
            partkey + j * ((n_supp // 4) + 1) + _u(60, 7, partkey, j), F.lit(n_supp)
        ) + 1
        return df.select(
            partkey.alias("ps_partkey"),
            suppkey.alias("ps_suppkey"),
            (_u(61, 9999, partkey, j) + 1).cast("int").alias("ps_availqty"),
            _money(62, 100, 100_000, partkey, j).alias("ps_supplycost"),
            _comment(63, 12, partkey, j).alias("ps_comment"),
        )

    if name == "customer":
        df = _range(spark, n_cust, partitions)
        key = _id() + 1
        nation = _u(70, len(NATIONS), key)
        return df.select(
            key.alias("c_custkey"),
            _pad_key("Customer#", key).alias("c_name"),
            F.concat(_pick(71, COMMENT_WORDS, key), F.lit(" ave "),
                     _u(72, 1000, key).cast("string")).alias("c_address"),
            nation.alias("c_nationkey"),
            _phone(73, nation).alias("c_phone"),
            _money(74, -99_999, 999_999, key).alias("c_acctbal"),
            _pick(75, SEGMENTS, key).alias("c_mktsegment"),
            _comment(76, 12, key).alias("c_comment"),
        )

    if name == "orders":
        df = _range(spark, n_ord, partitions)
        key = _id() + 1
        odate = _order_date(key)
        total = F.aggregate(
            F.sequence(F.lit(1), _n_lines(key)),
            F.lit(0).cast("decimal(17,2)"),
            lambda acc, j: (acc + _line_total(key, j)).cast("decimal(17,2)"),
        )
        return df.select(
            key.alias("o_orderkey"),
            (_u(80, n_cust, key) + 1).alias("o_custkey"),
            F.when(odate < F.lit("1995-06-17"), F.lit("F"))
            .otherwise(F.lit("O")).alias("o_orderstatus"),
            total.cast(MONEY).alias("o_totalprice"),
            odate.alias("o_orderdate"),
            _pick(81, PRIORITIES, key).alias("o_orderpriority"),
            _pad_key("Clerk#", _u(82, max(1, n_ord // 1000), key) + 1).alias("o_clerk"),
            F.lit(0).alias("o_shippriority"),
            _comment(83, 10, key).alias("o_comment"),
        )

    if name == "lineitem":
        df = _range(spark, n_ord, partitions)
        o = _id() + 1
        df = df.select(
            o.alias("o"), _order_date(o).alias("odate"),
            F.explode(F.sequence(F.lit(1), _n_lines(o))).alias("j"),
        )
        o, j, odate = F.col("o"), F.col("j"), F.col("odate")
        ship = F.date_add(odate, (_u(16, 121, o, j) + 1).cast("int"))
        receipt = F.date_add(ship, (_u(17, 30, o, j) + 1).cast("int"))
        # dbgen's referential contract: every (l_partkey, l_suppkey) pair
        # exists in partsupp. Pick one of the part's 4 partsupp slots and
        # reproduce that row's supplier formula (same seed 60) exactly.
        lpart = _u(18, n_part, o, j) + 1
        slot = _u(19, 4, o, j)
        lsupp = (
            F.pmod(
                lpart + slot * ((n_supp // 4) + 1) + _u(60, 7, lpart, slot),
                F.lit(n_supp),
            )
            + 1
        )
        return df.select(
            o.alias("l_orderkey"),
            lpart.alias("l_partkey"),
            lsupp.alias("l_suppkey"),
            j.cast("int").alias("l_linenumber"),
            _line_qty(o, j).cast(MONEY).alias("l_quantity"),
            _line_price(o, j).cast(MONEY).alias("l_extendedprice"),
            _line_discount(o, j).cast(MONEY).alias("l_discount"),
            _line_tax(o, j).cast(MONEY).alias("l_tax"),
            F.when(receipt < F.lit("1995-06-17"),
                   F.when(_u(25, 2, o, j) == 0, "R").otherwise("A"))
            .otherwise(F.lit("N")).alias("l_returnflag"),
            F.when(ship < F.lit("1995-06-17"), "F").otherwise("O").alias("l_linestatus"),
            ship.alias("l_shipdate"),
            F.date_add(odate, (_u(26, 92, o, j) + 1).cast("int")).alias("l_commitdate"),
            receipt.alias("l_receiptdate"),
            _pick(27, SHIP_INSTRUCT, o, j).alias("l_shipinstruct"),
            _pick(28, SHIP_MODES, o, j).alias("l_shipmode"),
            _comment(29, 6, o, j).alias("l_comment"),
        )

    raise ValueError(f"unknown table {name!r}; expected one of {list(TPCH_REFERENCE)}")


def generate(
    spark: SparkSession,
    scale: float,
    partitions: int,
    output_dir: str,
    tables: list[str] | None = None,
    fmt: str = "parquet",
    compression: str = "snappy",
) -> dict[str, float]:
    """Generate tables to ``<output_dir>/<table>.parquet`` (or ``.csv``).

    Reference CLI parity: ``tpctools generate --benchmark tpch -s SF -n P``
    (``src/main.rs:22-43``); wall-time per table is returned the way the
    reference prints it (``src/tpch.rs:87-90``).
    """
    timings: dict[str, float] = {}
    for name in tables or list(TPCH_REFERENCE):
        t0 = time.perf_counter()
        df = build_table(spark, name, scale, partitions)
        writer = df.write.mode("overwrite").option("compression", compression)
        if fmt == "parquet":
            writer.parquet(f"{output_dir}/{name}.parquet")
        elif fmt == "csv":
            writer.option("delimiter", "|").csv(f"{output_dir}/{name}.csv")
        else:
            raise ValueError(f"unsupported format {fmt!r}")
        timings[name] = time.perf_counter() - t0
    return timings
