"""Deterministic partition-parallel TPC-DS-style data generation.

Reference parity: ``TpcDs::generate`` shells out to ``dsdgen -SCALE sf
-CHILD i -PARALLEL n``, one OS process per partition
(``/root/reference/src/tpcds.rs:34-104``). As with the TPC-H generator
(see :mod:`tpctools_spark.generate`), the Spark re-expression is
``spark.range(n, numPartitions=p)`` + pure column expressions of ``id``
— partition-invariant by construction, shuffle-free, one task per
partition.

Unlike TPC-H (hand-built per table), TPC-DS synthesis is **schema
driven**: all 24 tables (``schemas_tpcds.TPCDS``, 425 columns) get
deterministic values derived from column name + type — surrogate keys
from ``id``, foreign keys ranged into the referenced table's
cardinality (suffix→table map), business ids as padded key strings,
enums/words for varchars, ranged ints/decimals/dates, with ~4% nulls in
nullable attribute columns. ``date_dim`` and ``time_dim`` are built as
true calendar/clock dimensions (derived year/month/day/hour/... from
the key) so generated facts join and roll up the way TPC-DS queries
expect.

Documented deviation from dsdgen: value *distributions* are uniform
hashes, not the spec's skewed streams — this generator replaces the
external binary's role (deterministic data at scale with correct
shapes, key ranges, and referential structure), not its exact bytes.
Predicate-bearing dimension columns do carry spec value domains
(``SPEC_DOMAINS``/``SPEC_INT_RANGES``: genders, marital/education
status, categories, states, zips, dependent counts), and fact date
keys land in the spec's 1998-2003 activity window, so TPC-DS query
predicates select realistic slices.
"""

from __future__ import annotations

import time
import zlib

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DateType, DecimalType, IntegerType, LongType, StringType

from tpctools_spark.generate import COMMENT_WORDS, _h
from tpctools_spark.schemas_tpcds import TPCDS

# Base cardinalities at sf=1 (TPC-DS spec, Appendix table sizes). Tables
# marked fixed=True keep spec size at every scale factor (dimension
# tables whose content is scale-independent, e.g. the calendar).
CARDINALITY: dict[str, tuple[int, bool]] = {
    "call_center": (6, False),
    "catalog_page": (11_718, False),
    "catalog_sales": (1_441_548, False),
    "catalog_returns": (144_067, False),
    "customer": (100_000, False),
    "customer_address": (50_000, False),
    "customer_demographics": (1_920_800, True),
    "date_dim": (73_049, True),
    "income_band": (20, True),
    "household_demographics": (7_200, True),
    "inventory": (11_745_000, False),
    "store": (12, False),
    "ship_mode": (20, True),
    "reason": (35, False),
    "promotion": (300, False),
    "item": (18_000, False),
    "store_sales": (2_880_404, False),
    "store_returns": (287_514, False),
    "web_page": (60, False),
    "warehouse": (5, False),
    "time_dim": (86_400, True),
    "web_site": (30, False),
    "web_sales": (719_384, False),
    "web_returns": (71_763, False),
}

# FK suffix → referenced table (cardinality source). Longest suffix wins.
FK_SUFFIX: dict[str, str] = {
    "_date_sk": "date_dim",
    "_time_sk": "time_dim",
    "_item_sk": "item",
    "_customer_sk": "customer",
    "_cdemo_sk": "customer_demographics",
    "_hdemo_sk": "household_demographics",
    "_addr_sk": "customer_address",
    "_address_sk": "customer_address",
    "_store_sk": "store",
    "_warehouse_sk": "warehouse",
    "_promo_sk": "promotion",
    "_reason_sk": "reason",
    "_ship_mode_sk": "ship_mode",
    "_mode_sk": "ship_mode",
    "_web_page_sk": "web_page",
    "_page_sk": "catalog_page",
    "_web_site_sk": "web_site",
    "_site_sk": "web_site",
    "_call_center_sk": "call_center",
    "_income_band_sk": "income_band",
    "_band_sk": "income_band",
}

DATE_SK_EPOCH = 2_415_022  # Julian day of 1900-01-02, TPC-DS d_date_sk origin

# dsdgen confines business activity to the 1998-2003 sales window even
# though date_dim spans two centuries; date FKs land here so year/moy
# predicates select realistic slices instead of ~0.5% of a 200-year
# uniform spread. Offsets are days from the d_date_sk origin.
DATE_FK_START = 35_793  # 1998-01-01
DATE_FK_DAYS = 2_191  # through 2003-12-31

# Own surrogate key per dimension table. Fact tables (sales/returns/
# inventory) have composite keys of FKs + ticket/order numbers — every
# *_sk column there is a foreign key, never the row id.
DIM_PK: dict[str, str] = {
    "call_center": "cc_call_center_sk",
    "catalog_page": "cp_catalog_page_sk",
    "customer": "c_customer_sk",
    "customer_address": "ca_address_sk",
    "customer_demographics": "cd_demo_sk",
    "date_dim": "d_date_sk",
    "income_band": "ib_income_band_sk",
    "household_demographics": "hd_demo_sk",
    "inventory": "",
    "store": "s_store_sk",
    "ship_mode": "sm_ship_mode_sk",
    "reason": "r_reason_sk",
    "promotion": "p_promo_sk",
    "item": "i_item_sk",
    "web_page": "wp_web_page_sk",
    "warehouse": "w_warehouse_sk",
    "time_dim": "t_time_sk",
    "web_site": "web_site_sk",
}
ENUM_WORDS = COMMENT_WORDS  # reuse the word pool for varchar attributes

# Spec value domains for the dimension columns TPC-DS predicates hit
# (dsdgen's distribution files, e.g. cd_gender ∈ {M,F}); columns not
# listed fall back to the generic word pool. Column names are unique
# across the 24-table schema, so a flat map suffices.
SPEC_DOMAINS: dict[str, list[str]] = {
    "cd_gender": ["M", "F"],
    "cd_marital_status": ["S", "M", "D", "W", "U"],
    "cd_education_status": [
        "Primary", "Secondary", "College", "2 yr Degree",
        "4 yr Degree", "Advanced Degree", "Unknown",
    ],
    "cd_credit_rating": ["Low Risk", "High Risk", "Good", "Unknown"],
    "hd_buy_potential": [
        "0-500", "501-1000", "1001-5000", "5001-10000", ">10000", "Unknown",
    ],
    "i_category": [
        "Books", "Children", "Electronics", "Home", "Jewelry",
        "Men", "Music", "Shoes", "Sports", "Women",
    ],
    "ca_state": [
        "AL", "CA", "FL", "GA", "IL", "IN", "KS", "KY", "MI", "MN",
        "MO", "NC", "NE", "NY", "OH", "OK", "PA", "TN", "TX", "VA",
    ],
    "s_state": ["AL", "GA", "MI", "MN", "NC", "OH", "SD", "TN", "TX", "WA"],
    "ca_location_type": ["apartment", "condo", "single family"],
    "ca_country": ["United States"],
    "c_preferred_cust_flag": ["Y", "N"],
    "p_channel_dmail": ["Y", "N"],
    "p_channel_email": ["Y", "N"],
    "p_channel_tv": ["Y", "N"],
    "sm_type": ["EXPRESS", "NEXT DAY", "OVERNIGHT", "REGULAR", "TWO DAY", "LIBRARY"],
}

# Spec ranges for small-domain integer attributes (dsdgen keeps
# dependent/vehicle counts in single digits); value = exclusive upper
# bound, values start at 0.
SPEC_INT_RANGES: dict[str, int] = {
    "hd_dep_count": 10,
    "hd_vehicle_count": 5,
    "cd_dep_count": 7,
    "cd_dep_employed_count": 7,
    "cd_dep_college_count": 7,
}


# TPC-DS spec Database Scaling table (v2.13 §3.2, Table 3-2): the
# dimension tables below grow SUBLINEARLY with the scale factor —
# customer at sf1000 is 12 M rows, not the 100 M a linear base×sf rule
# would give. Anchors are the spec's published row counts at the
# discrete scale factors {1, 10, 100, 1000, 3000, 10000}; between
# anchors rows_for interpolates log-log (the spec only defines the
# discrete points — documented choice), beyond 10000 it extends the
# last segment's log-log slope, and below sf1 it pro-rates the sf1
# count (test/bench fixtures at sf<1 keep their historical sizes).
# Note web_site's sf100 dip (42 → 24) is per spec — sites retire.
# Reference parity: src/tpcds.rs:34-104 generates at a fixed scale and
# never encodes the scaling table; this engine must, because query
# planning (broadcast-vs-shuffle calculus) depends on true dimension
# cardinalities at large sf.
_SPEC_SCALE_POINTS = (1.0, 10.0, 100.0, 1_000.0, 3_000.0, 10_000.0)
SPEC_SUBLINEAR_ROWS: dict[str, tuple[int, ...]] = {
    "call_center": (6, 24, 30, 42, 48, 54),
    "catalog_page": (11_718, 12_000, 20_400, 30_000, 36_000, 40_000),
    "customer": (100_000, 500_000, 2_000_000, 12_000_000, 30_000_000, 65_000_000),
    "customer_address": (50_000, 250_000, 1_000_000, 6_000_000, 15_000_000, 32_500_000),
    "item": (18_000, 102_000, 204_000, 300_000, 360_000, 402_000),
    "promotion": (300, 500, 1_000, 1_500, 1_800, 2_000),
    "reason": (35, 45, 55, 65, 67, 70),
    "store": (12, 102, 402, 1_002, 1_350, 1_500),
    "warehouse": (5, 10, 15, 20, 22, 25),
    "web_page": (60, 200, 2_040, 3_000, 3_600, 4_002),
    "web_site": (30, 42, 24, 54, 66, 78),
}


def _interp_spec(anchors: tuple[int, ...], scale: float) -> int:
    """Log-log interpolation through the spec anchor points; beyond the
    last anchor, continue the final segment's slope."""
    import math

    pts = _SPEC_SCALE_POINTS
    if scale >= pts[-1]:
        i = len(pts) - 2
    else:
        i = max(j for j in range(len(pts) - 1) if pts[j] <= scale)
    s0, s1 = pts[i], pts[i + 1]
    r0, r1 = anchors[i], anchors[i + 1]
    t = (math.log(scale) - math.log(s0)) / (math.log(s1) - math.log(s0))
    return max(1, round(math.exp(math.log(r0) + t * (math.log(r1) - math.log(r0)))))


def rows_for(table: str, scale: float) -> int:
    base, fixed = CARDINALITY[table]
    if fixed:
        return base
    if scale > 1.0:
        if table == "inventory":
            # Spec: inventory = 261 weekly snapshots × (item/2) ×
            # warehouses; exact at every anchor (sf1: 261×9000×5 =
            # 11,745,000 … sf1000: 261×150000×20 = 783,000,000).
            return 261 * (rows_for("item", scale) // 2) * rows_for(
                "warehouse", scale
            )
        anchors = SPEC_SUBLINEAR_ROWS.get(table)
        if anchors is not None:
            return _interp_spec(anchors, scale)
    return max(1, int(base * scale))


def _seed(table: str, column: str) -> int:
    return zlib.crc32(f"{table}.{column}".encode())


def _u(seed: int, n: int, *cols: Column) -> Column:
    return F.pmod(_h(seed, *cols), F.lit(n))


def _maybe_null(c: Column, seed: int, key: Column, nullable: bool) -> Column:
    if not nullable:
        return c
    return F.when(_u(seed ^ 0xA5A5, 25, key) == 0, F.lit(None)).otherwise(c)


def _date_dim(key: Column) -> dict[str, Column]:
    """True calendar columns derived from the surrogate key."""
    d = F.date_add(F.to_date(F.lit("1900-01-02")), (key - 1).cast("int"))
    month_seq = (F.year(d) - 1900) * 12 + F.month(d) - 1
    return {
        "d_date_sk": (key + DATE_SK_EPOCH - 1).cast("int"),
        "d_date_id": F.concat(F.lit("D"), F.lpad((key + DATE_SK_EPOCH - 1).cast("string"), 16, "0")),
        "d_date": d,
        "d_month_seq": month_seq.cast("int"),
        "d_week_seq": ((key - 1) / 7 + 1).cast("int"),
        "d_quarter_seq": (month_seq / 3 + 1).cast("int"),
        "d_year": F.year(d),
        "d_dow": (F.dayofweek(d) - 1).cast("int"),
        "d_moy": F.month(d),
        "d_dom": F.dayofmonth(d),
        "d_qoy": F.quarter(d),
        "d_fy_year": F.year(d),
        "d_fy_quarter_seq": (month_seq / 3 + 1).cast("int"),
        "d_fy_week_seq": ((key - 1) / 7 + 1).cast("int"),
        "d_day_name": F.date_format(d, "EEEE"),
        "d_quarter_name": F.concat(F.year(d).cast("string"), F.lit("Q"),
                                   F.quarter(d).cast("string")),
        "d_holiday": F.lit("N"),
        "d_weekend": F.when(F.dayofweek(d).isin(1, 7), "Y").otherwise("N"),
        "d_following_holiday": F.lit("N"),
        "d_first_dom": (key - F.dayofmonth(d) + 1 + DATE_SK_EPOCH - 1).cast("int"),
        "d_last_dom": (key - F.dayofmonth(d) + F.dayofmonth(F.last_day(d))
                       + DATE_SK_EPOCH - 1).cast("int"),
        "d_same_day_ly": (key - 365 + DATE_SK_EPOCH - 1).cast("int"),
        "d_same_day_lq": (key - 91 + DATE_SK_EPOCH - 1).cast("int"),
        "d_current_day": F.lit("N"),
        "d_current_week": F.lit("N"),
        "d_current_month": F.lit("N"),
        "d_current_quarter": F.lit("N"),
        "d_current_year": F.lit("N"),
    }


def _time_dim(key: Column) -> dict[str, Column]:
    t = (key - 1).cast("int")  # seconds since midnight, 0..86399
    hour = (t / 3600).cast("int")
    return {
        "t_time_sk": t,
        "t_time_id": F.concat(F.lit("T"), F.lpad(t.cast("string"), 16, "0")),
        "t_time": t,
        "t_hour": hour,
        "t_minute": ((t % 3600) / 60).cast("int"),
        "t_second": (t % 60).cast("int"),
        "t_am_pm": F.when(hour < 12, "AM").otherwise("PM"),
        "t_shift": F.when(hour < 8, "third").when(hour < 16, "first").otherwise("second"),
        "t_sub_shift": F.when(hour < 6, "night").when(hour < 12, "morning")
        .when(hour < 18, "afternoon").otherwise("evening"),
        "t_meal_time": F.when(hour.isin(6, 7, 8), "breakfast")
        .when(hour.isin(11, 12, 13), "lunch")
        .when(hour.isin(17, 18, 19), "dinner").otherwise(F.lit(None)),
    }


def _synth(table: str, fname: str, dtype, nullable: bool, key: Column,
           scale: float, pk_name: str) -> Column:
    """Generic deterministic value for one column (non-calendar tables)."""
    seed = _seed(table, fname)
    if fname == pk_name:
        return key.cast("int") if isinstance(dtype, IntegerType) else key
    if fname.endswith("_sk"):
        target = next(
            (t for sfx, t in sorted(FK_SUFFIX.items(), key=lambda kv: -len(kv[0]))
             if fname.endswith(sfx)),
            None,
        )
        if target is not None:
            if target == "date_dim":
                fk = DATE_SK_EPOCH + DATE_FK_START + _u(seed, DATE_FK_DAYS, key)
            elif target == "time_dim":
                fk = _u(seed, rows_for(target, scale), key)  # 0-based
            else:
                fk = _u(seed, rows_for(target, scale), key) + 1
            return _maybe_null(fk.cast("int"), seed, key, nullable)
        return _maybe_null((_u(seed, 10_000, key) + 1).cast("int"), seed, key, nullable)
    if fname.endswith(("_number", "_ticket_number", "_order_number")):
        # group ~4 fact lines per ticket/order
        return ((key - 1) / 4 + 1).cast("long" if isinstance(dtype, LongType) else "int")
    if isinstance(dtype, StringType):
        if fname.endswith("_id") and not nullable:
            return F.concat(F.lit(table[:2].upper()), F.lpad(key.cast("string"), 16, "0"))
        if fname.endswith("_zip"):
            return _maybe_null(
                F.lpad((_u(seed, 99_999, key) + 1).cast("string"), 5, "0"),
                seed, key, nullable,
            )
        pool = SPEC_DOMAINS.get(fname, ENUM_WORDS)
        word = F.element_at(
            F.array(*[F.lit(w) for w in pool]),
            (_u(seed, len(pool), key) + 1).cast("int"),
        )
        return _maybe_null(word, seed, key, nullable)
    if isinstance(dtype, DecimalType):
        hi = 10 ** min(dtype.precision - dtype.scale, 4) * 100
        v = (_u(seed, hi, key).cast("decimal(13,0)") / 100).cast(dtype)
        return _maybe_null(v, seed, key, nullable)
    if isinstance(dtype, DateType):
        v = F.date_add(F.to_date(F.lit("1998-01-02")), _u(seed, 1800, key).cast("int"))
        return _maybe_null(v, seed, key, nullable)
    if isinstance(dtype, (IntegerType, LongType)):
        if fname in SPEC_INT_RANGES:
            v = _u(seed, SPEC_INT_RANGES[fname], key).cast("int")
        else:
            v = (_u(seed, 1000, key) + 1).cast(
                "int" if isinstance(dtype, IntegerType) else "long"
            )
        return _maybe_null(v, seed, key, nullable)
    raise TypeError(f"no synthesis rule for {table}.{fname}: {dtype}")


def build_tpcds_table(
    spark: SparkSession, name: str, scale: float, partitions: int
) -> DataFrame:
    """One TPC-DS table as a lazy, partition-invariant DataFrame."""
    schema = TPCDS[name]
    n = rows_for(name, scale)
    df = spark.range(0, n, numPartitions=max(1, min(partitions, n)))
    key = F.col("id") + 1

    if name == "date_dim":
        special = _date_dim(key)
    elif name == "time_dim":
        special = _time_dim(key)
    else:
        special = {}

    pk_name = DIM_PK.get(name, "")
    cols = []
    for f in schema.fields:
        c = special.get(f.name)
        if c is None:
            c = _synth(name, f.name, f.dataType, f.nullable, key, scale, pk_name)
        cols.append(c.cast(f.dataType).alias(f.name))
    return df.select(*cols)


def generate_tpcds(
    spark: SparkSession,
    scale: float,
    partitions: int,
    output_dir: str,
    tables: list[str] | None = None,
    fmt: str = "parquet",
    compression: str = "snappy",
) -> dict[str, float]:
    """Generate TPC-DS tables to ``<out>/<table>.parquet`` (or ``.csv``).

    CLI parity: ``tpctools generate --benchmark tpcds`` (src/main.rs:113-118
    dispatch; src/tpcds.rs:34-104 generation)."""
    timings: dict[str, float] = {}
    for name in tables or list(TPCDS):
        t0 = time.perf_counter()
        df = build_tpcds_table(spark, name, scale, partitions)
        writer = df.write.mode("overwrite").option("compression", compression)
        if fmt == "parquet":
            writer.parquet(f"{output_dir}/{name}.parquet")
        elif fmt == "csv":
            writer.option("delimiter", "|").csv(f"{output_dir}/{name}.csv")
        else:
            raise ValueError(f"unsupported format {fmt!r}")
        timings[name] = time.perf_counter() - t0
    return timings
