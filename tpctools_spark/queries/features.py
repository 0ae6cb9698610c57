"""§2.B.9 extension — feature-engineering operators for ML training prep.

The four encodings every tabular/text feature pipeline needs before a
model sees the data: one-hot expansion, per-group standardization,
leave-one-out target encoding, and the feature-hashing trick. All are
pure DataFrame compositions (no UDFs), deterministic by construction,
and value-checked exactly against DuckDB twins.

Like the rest of §2.B.9 this goes beyond the reference's own surface
(``/root/reference/src/lib.rs`` is generate/convert only) — it is the
downstream consumer the engine exists to feed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tpctools_spark.catalog import table
from tpctools_spark.queries._util import global_rank, trunc_digits
from tpctools_spark.registry import query

# Closed vocabulary of the events fixture — one-hot needs a static
# column set (a data-driven pivot would make the output schema a
# function of the data, which breaks both SQL twins and any trained
# model's input contract; production pipelines pin the vocabulary the
# same way, at feature-store registration time).
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "feature_onehot",
    oracle="""
    SELECT event_id,
           CAST(event_type = 'click' AS INT) AS is_click,
           CAST(event_type = 'error' AS INT) AS is_error,
           CAST(event_type = 'purchase' AS INT) AS is_purchase,
           CAST(event_type = 'signup' AS INT) AS is_signup,
           CAST(event_type = 'view' AS INT) AS is_view
    FROM events
    """,
)
def feature_onehot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-hot encoding of a categorical over a pinned vocabulary.

    Row-local projection — no shuffle at all; whole-stage codegen emits
    the indicators inline with the scan. Unknown categories (schema
    drift) encode as all-zeros rather than erroring, the
    feature-store-safe behavior.
    """
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        *[
            (F.col("event_type") == t).cast("int").alias(f"is_{t}")
            for t in EVENT_TYPES
        ],
    )


@query(
    "feature_standardize",
    oracle="""
    WITH stats AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS s,
             CAST(SUM(CAST(value AS DECIMAL(12,2))
                      * CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS ss
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           CAST(floor(
             (value - s / n) / sqrt((ss - s * s / n) / (n - 1)) * 10000
           ) AS DOUBLE) / 10000 AS z_value
    FROM events e JOIN stats USING (event_type)
    """,
)
def feature_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-category z-score standardization: (x − μ)/σ with sample σ.

    The moments come from EXACT decimal sums (2-decimal money inputs ⇒
    sum and sum-of-squares are exact), so both engines start the double
    arithmetic from identical values and the z-score is
    bit-deterministic — checked exactly, not within tolerance.

    Scale: one map-side-combinable aggregation produces |categories|
    stat rows, broadcast back onto the stream; the event log itself
    never shuffles. The same shape serves any per-entity normalization
    at 100 TB (stats side stays tiny).
    """
    ev = table(spark, sf_dir, "events")
    vdec = F.col("value").cast("decimal(12,2)")
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(vdec).cast("double").alias("s"),
        F.sum(vdec * vdec).cast("double").alias("ss"),
    )
    mu = F.col("s") / F.col("n")
    sd = F.sqrt(
        (F.col("ss") - F.col("s") * F.col("s") / F.col("n"))
        / (F.col("n") - 1)
    )
    return ev.join(F.broadcast(stats), "event_type").select(
        "event_id",
        "event_type",
        trunc_digits((F.col("value") - mu) / sd, 4).alias("z_value"),
    )


@query(
    "feature_target_encode",
    oracle="""
    WITH grp AS (
      SELECT o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS s
      FROM orders GROUP BY o_orderpriority
    ), overall AS (
      SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
               / COUNT(*) AS gmean
      FROM orders
    )
    SELECT o.o_orderkey, o.o_orderpriority,
           CAST(floor(
             (g.s - o.o_totalprice + 10.0 * gl.gmean) / (g.n - 1 + 10.0)
             * 100
           ) AS DOUBLE) / 100 AS te_priority
    FROM orders o
    JOIN grp g USING (o_orderpriority), overall gl
    """,
)
def feature_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding with additive smoothing.

    Encodes o_orderpriority by the mean o_totalprice of the OTHER rows
    in its group, shrunk toward the global mean with pseudo-count m=10:
    te = (Σ_grp − x + m·μ_global)/(n_grp − 1 + m). Leave-one-out plus
    smoothing is the standard leakage-resistant form — the row's own
    target never contributes to its feature, and rare categories decay
    to the prior.

    Scale: group sums are |categories| rows broadcast onto the fact
    scan; the global mean is a one-row broadcast (allowlisted BNLJ).
    Exact decimal sums make the encoding bit-deterministic.
    """
    o = table(spark, sf_dir, "orders")
    pdec = F.col("o_totalprice").cast("decimal(12,2)")
    grp = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(pdec).cast("double").alias("s"),
    )
    glob = o.agg(
        (F.sum(pdec).cast("double") / F.count(F.lit(1))).alias("gmean")
    )
    te = (
        F.col("s") - F.col("o_totalprice") + 10.0 * F.col("gmean")
    ) / (F.col("n") - 1 + 10.0)
    return (
        o.join(F.broadcast(grp), "o_orderpriority")
        .crossJoin(F.broadcast(glob))
        .select(
            "o_orderkey",
            "o_orderpriority",
            trunc_digits(te, 2).alias("te_priority"),
        )
    )


@query(
    "feature_hash_bucket",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS tok
      FROM documents
    )
    SELECT doc_id,
           CAST(CAST(('0x' || substring(md5(tok), 1, 15)) AS BIGINT) % 64
                AS INT) AS bucket,
           COUNT(*) AS tf
    FROM toks
    GROUP BY doc_id, bucket
    """,
)
def feature_hash_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature hashing ("hashing trick"): tokens → 64 hash buckets with
    term frequencies — a fixed-width sparse text representation with no
    vocabulary pass.

    The reason this wins at 100 TB: a vocabulary-based vectorizer needs
    a global distinct-and-index over billions of tokens (a giant
    shuffle plus a broadcast dictionary); hashing needs neither — the
    bucket is a pure function of the token bytes (md5 prefix mod
    buckets, the repo's cross-engine string-hash idiom), so the whole
    featurization is one explode + one map-side-combinable count.
    Collisions are the accepted trade (bucket count is the knob).
    """
    toks = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.explode(
            F.split(F.lower(F.trim(F.col("text"))), " ")
        ).alias("tok"),
    )
    bucket = (
        F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("bigint") % 64
    ).cast("int")
    return (
        toks.select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


@query(
    "feature_quantile_bucket",
    oracle="""
    WITH c AS (
      SELECT o_orderkey,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               AS cents
      FROM orders
    ),
    r AS (
      SELECT o_orderkey, cents,
             ROW_NUMBER() OVER (ORDER BY cents, o_orderkey) AS rn,
             COUNT(*) OVER () AS n
      FROM c
    )
    SELECT CAST(((rn - 1) * 10) // n AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(cents) AS lo_cents,
           MAX(cents) AS hi_cents
    FROM r
    GROUP BY bucket
    ORDER BY bucket
    """,
)
def feature_quantile_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quantile) bucketing of a continuous feature — the
    decile assignment every monotonic-binning / WoE / calibration
    pipeline starts from.

    Exact rank-based binning, not approx_percentile: the bucket is
    ``((rank-1)·K) div N`` over the total order (cents, key) — the same
    closed form both engines evaluate, so bucket membership is
    bit-deterministic and ties are broken by the stable row key, never
    by partition layout. The global rank comes from the two-pass
    distributed ``_util.global_rank`` (range exchange + per-partition
    ranks + prefix-summed offsets), NOT a single-partition window —
    the oracle's ``ROW_NUMBER() OVER (ORDER BY ...)`` is the semantic
    twin, but its physical plan would funnel every row through one
    task, which is exactly what a 100 TB binning cannot do. N rides a
    one-row broadcast. Output is the K-row bucket census with exact
    integer-cent edges (a production run would also persist the edges
    as the model's binning contract).
    """
    cents = (
        F.col("o_totalprice").cast("decimal(12,2)") * 100
    ).cast("bigint")
    c = table(spark, sf_dir, "orders").select(
        "o_orderkey", cents.alias("cents")
    )
    ranked = global_rank(
        c, [F.col("cents").asc(), F.col("o_orderkey").asc()], rn="rn"
    )
    # One-row total-count broadcast (the BNLJ the allowlist justifies):
    # every bucket boundary needs N, a scalar.
    n = c.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    return (
        ranked.crossJoin(F.broadcast(n))
        .select(
            F.expr("CAST(((rn - 1) * 10) div n AS INT)").alias("bucket"),
            "cents",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("cents").alias("lo_cents"),
            F.max("cents").alias("hi_cents"),
        )
        .orderBy("bucket")
    )


@query(
    "feature_mutual_info",
    oracle="""
    WITH feats AS (
      SELECT 'hour_bucket' AS feature, hour(ts) // 6 AS bucket,
             event_type AS label FROM events
      UNION ALL
      SELECT 'value_band', CAST(floor(value) AS BIGINT) // 100, event_type
      FROM events
      UNION ALL
      SELECT 'user_band', user_id % 8, event_type FROM events
    ),
    joint AS (
      SELECT feature, bucket, label, CAST(COUNT(*) AS BIGINT) AS c_xy
      FROM feats GROUP BY feature, bucket, label
    ),
    marg AS (
      SELECT feature, bucket, label, c_xy,
             SUM(c_xy) OVER (PARTITION BY feature) AS n,
             SUM(c_xy) OVER (PARTITION BY feature, bucket) AS c_x,
             SUM(c_xy) OVER (PARTITION BY feature, label) AS c_y
      FROM joint
    )
    SELECT feature,
           CAST(floor(SUM((CAST(c_xy AS DOUBLE) / n)
                          * ln(CAST(c_xy AS DOUBLE) * n
                               / (CAST(c_x AS DOUBLE) * c_y)))
                      * 1000000) AS DOUBLE) / 1000000 AS mi_nats,
           CAST(COUNT(DISTINCT bucket) AS BIGINT) AS n_buckets,
           CAST(COUNT(*) AS BIGINT) AS n_cells
    FROM marg
    GROUP BY feature
    """,
)
def feature_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information I(feature; label) for three candidate
    bucketed features against the event-type label — the
    feature-selection screen a training pipeline runs before paying
    for an encoding.

    Shape at scale: the raw table collapses immediately to the joint
    contingency table (one map-side-combinable groupBy whose size is
    bucket×label cardinality, independent of row count); marginals are
    window sums OVER the tiny joint table, never the raw data. The
    only floating point is the final Σ p·ln(p/(pₓ·p_y)) over dozens of
    cells — both engines sum the same terms and the result is
    truncated at 1e-6, far above any accumulation-order noise. The
    union-all of three projections scans events once per feature;
    at 100 TB you'd fuse them into one pass with a grouping-sets
    shape, traded here for per-feature clarity.
    """
    ev = table(spark, sf_dir, "events")
    parts = []
    for fname, expr in [
        ("hour_bucket", F.expr("hour(ts) DIV 6")),
        ("value_band", F.expr("CAST(floor(value) AS BIGINT) DIV 100")),
        ("user_band", F.col("user_id") % 8),
    ]:
        parts.append(
            ev.select(
                F.lit(fname).alias("feature"),
                expr.cast("bigint").alias("bucket"),
                F.col("event_type").alias("label"),
            )
        )
    u = parts[0].unionByName(parts[1]).unionByName(parts[2])
    joint = u.groupBy("feature", "bucket", "label").agg(
        F.count(F.lit(1)).alias("c_xy")
    )
    w_n = Window.partitionBy("feature")
    w_x = Window.partitionBy("feature", "bucket")
    w_y = Window.partitionBy("feature", "label")
    marg = joint.select(
        "feature",
        "bucket",
        "c_xy",
        F.sum("c_xy").over(w_n).alias("n"),
        F.sum("c_xy").over(w_x).alias("c_x"),
        F.sum("c_xy").over(w_y).alias("c_y"),
    )
    term = (F.col("c_xy").cast("double") / F.col("n")) * F.log(
        F.col("c_xy").cast("double")
        * F.col("n")
        / (F.col("c_x").cast("double") * F.col("c_y"))
    )
    return marg.groupBy("feature").agg(
        trunc_digits(F.sum(term), 6).alias("mi_nats"),
        F.countDistinct("bucket").alias("n_buckets"),
        F.count(F.lit(1)).alias("n_cells"),
    )
