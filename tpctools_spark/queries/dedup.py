"""§2.B.9 — deduplication family for training-data pipelines.

Five dedup strategies over the ``documents`` corpus, each with the scale
path spelled out:

- exact:       hash-groupBy on normalized text — one shuffle on the hash.
- minhash+LSH: shingle → minhash signature → band buckets → bucket join.
  Candidate generation never compares all pairs; cost is driven by
  bucket occupancy, which the band/row parameters control.
- simhash:     64-bit signature via per-bit majority vote; near-dups
  collide on 16-bit bands (hamming ≤ 3 guarantee with 4 bands).
- n-gram jaccard: inverted index on word 3-grams (selective keys) —
  the prefix-filter family; exact similarity, no all-pairs scan.
- embedding cosine: label-blocked exact cosine (at scale the blocking
  key comes from a coarse quantizer/IVF instead of a label).

Everything is built-in expressions (xxhash64, HOFs) — no Python UDFs in
any hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tpctools_spark.catalog import table
from tpctools_spark.queries._util import trunc_digits
from tpctools_spark.registry import query

N_MINHASH = 32  # signature length
MINHASH_BANDS = 8  # 8 bands × 4 rows


def _words(col: str = "text") -> F.Column:
    """Single-space tokenization of normalized text (mirrors the oracle's
    ``string_split(lower(trim(text)), ' ')`` exactly)."""
    return F.split(F.lower(F.trim(F.col(col))), " ")


@query(
    "dedup_exact",
    oracle="""
    SELECT sha256(lower(trim(text))) AS content_hash,
           CAST(MIN(doc_id) AS BIGINT) AS keep_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: sha256 of normalized text, keep the lowest doc_id.

    One hash-shuffle on the digest; at 100 TB the digest (32 bytes)
    shuffles instead of the document bodies.
    """
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.sha2(F.lower(F.trim(F.col("text"))), 256).alias("content_hash"),
            "doc_id",
        )
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def _shingles(w: F.Column) -> F.Column:
    """Word 3-gram shingles of a token array (null-safe via concat)."""
    return F.transform(
        F.when(F.size(w) >= 3, F.sequence(F.lit(1), F.size(w) - 2)).otherwise(
            F.array().cast("array<int>")
        ),
        lambda i: F.concat(
            F.element_at(w, i),
            F.lit(" "),
            F.element_at(w, i + 1),
            F.lit(" "),
            F.element_at(w, i + 2),
        ),
    )


def _minhash_signatures(docs: DataFrame) -> DataFrame:
    """doc_id → array<long> of N_MINHASH minhashes over 3-gram shingles.

    Shape: explode shingles → 2 base hashes per shingle → groupBy doc_id
    with 32 ``min(h1 + i·h2)`` aggregates (the classic 2-universal
    minhash family — 2 string hashes, 32 derived functions).

    Why this shape: the whole pipeline stays inside whole-stage codegen
    (split/explode/xxhash64/hash-agg are all JVM-generated code).
    The tempting shuffle-free alternative — nested higher-order
    functions computing all 32 mins row-local — runs ~5× slower because
    HOF lambdas are interpreted per element. The one shuffle here is
    benign at any scale: partial (map-side) aggregation collapses each
    doc to 32 longs before the exchange, so shuffle bytes are
    O(n_docs·32·8), independent of document length. No array_distinct:
    MIN over a multiset equals MIN over its set. Shingles (not unigrams)
    keep inter-document Jaccard — and therefore LSH bucket occupancy —
    low, so candidate generation stays near-linear.
    """
    shingles = F.filter(_shingles(_words()), lambda s: s.isNotNull())
    hashed = docs.select("doc_id", F.explode(shingles).alias("s")).select(
        "doc_id",
        F.xxhash64(F.lit(1), "s").alias("h1"),
        F.xxhash64(F.lit(2), "s").alias("h2"),
    )
    mins = [
        F.min(F.col("h1") + F.lit(i) * F.col("h2")).alias(f"mh_{i}")
        for i in range(N_MINHASH)
    ]
    sig = hashed.groupBy("doc_id").agg(*mins)
    return sig.select(
        "doc_id", F.array(*[f"mh_{i}" for i in range(N_MINHASH)]).alias("signature")
    )


@query("dedup_minhash")  # hash-function specific → rows-only
def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-duplicate candidate pairs.

    Pipeline: shingle → 32-hash signature → 8 bands of 4 → band-hash
    buckets → self-join within buckets → signature agreement estimates
    Jaccard. Only documents sharing a band bucket are ever compared.
    """
    docs = table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    # Cache the signatures: three consumers (band projection + both
    # rejoin legs) would otherwise recompute the shingle/agg pipeline.
    sig = _minhash_signatures(docs).cache()

    rows_per_band = N_MINHASH // MINHASH_BANDS
    # Only (doc_id, band, bucket) flows through the self-join — the wide
    # signature arrays rejoin afterwards on the (small) candidate set.
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[
                                F.element_at("signature", b * rows_per_band + r + 1)
                                for r in range(rows_per_band)
                            ]
                        ).alias("bucket"),
                    )
                    for b in range(MINHASH_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")

    left = bands.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
    right = bands.select(F.col("doc_id").alias("doc_b"), "band", "bucket")
    cand = (
        left.join(right, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    pairs = cand.join(
        sig.select(F.col("doc_id").alias("doc_a"), F.col("signature").alias("sig_a")),
        "doc_a",
    ).join(
        sig.select(F.col("doc_id").alias("doc_b"), F.col("signature").alias("sig_b")),
        "doc_b",
    )
    est = F.round(
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda a, b: a == b),
                lambda x: x,
            )
        ).cast("double")
        / F.lit(float(N_MINHASH)),
        4,
    )
    return (
        pairs.select("doc_a", "doc_b", est.alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= 0.5)
    )


@query("dedup_simhash")  # hash-function specific → rows-only
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document (per-bit majority vote over token
    hashes), plus its 4×16-bit band keys for hamming-≤3 bucketing.

    The vote is an aggregation over exploded tokens — fully JVM-side;
    the signature assembles via bit arithmetic, no UDF.
    """
    docs = table(spark, sf_dir, "documents")
    tokens = docs.select("doc_id", F.explode(_words()).alias("word")).withColumn(
        "h", F.xxhash64("word")
    )
    # Per bit: sum of +1/-1 votes; bit set iff the vote is positive.
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(
                -1
            )
        ).alias(f"v_{i}")
        for i in range(64)
    ]
    voted = tokens.groupBy("doc_id").agg(
        *votes, F.count(F.lit(1)).alias("n_tokens")
    )
    sim = None
    for i in range(64):
        bit = F.when(F.col(f"v_{i}") > 0, F.lit(1).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        term = F.shiftleft(bit, i)
        sim = term if sim is None else sim.bitwiseXOR(term)
    out = voted.select("doc_id", "n_tokens", sim.alias("simhash"))
    return out.select(
        "doc_id",
        "n_tokens",
        "simhash",
        *[
            F.shiftright(F.col("simhash"), 16 * b)
            .bitwiseAND(F.lit(0xFFFF))
            .alias(f"band_{b}")
            for b in range(4)
        ],
    )


# Document-frequency ceiling for the inverted index: a gram shared by k
# docs yields O(k²) rows out of the postings self-join, so one hot
# boilerplate shingle in 10⁶ docs would be 10¹² candidate pairs. Grams
# with df > τ are dropped from candidate generation (standard
# prefix-filter practice); recall tradeoff: a pair whose ONLY shared
# grams are boilerplate hot grams is no longer reported — at a 0.2
# Jaccard threshold such pairs are overwhelmingly non-duplicates.
JACCARD_DF_CAP = 50


def _jaccard_pairs(
    spark: SparkSession, sf_dir: str, caches: list | None = None
) -> DataFrame:
    """Near-dup candidate pairs (doc_a < doc_b, jacc ≥ 0.2) with the
    raw `jacc` double column — shared by the pair query and the
    connected-components clustering.

    ``caches``: optional list the function appends its cached
    DataFrames to, so callers that fully consume the result inside
    their own lifetime (cluster components) can unpersist them."""
    # The corpus arrives as one small parquet file → one input partition;
    # spread it so shingling uses every core (at 100 TB the input is
    # already many splits and this repartition is a no-op to remove).
    docs = table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    # Per-doc distinct gram set and its size, entirely row-local —
    # array_distinct replaces a 260k-row DISTINCT shuffle, and carrying
    # n (the set size) through the join replaces a sizes aggregation +
    # two rejoin shuffles. The whole pipeline has exactly two exchanges:
    # the postings self-join on gram and the pair-count aggregation.
    gs = F.array_distinct(F.filter(_shingles(_words()), lambda s: s.isNotNull()))
    # Cache at the gram-array level: without the barrier CollapseProject
    # inlines the (interpreted) shingle+array_distinct pipeline into all
    # three consumers (the size filter, the n column, the explode) and
    # into both join legs — 6 evaluations per row instead of 1.
    base = docs.select("doc_id", gs.alias("gs")).filter(F.size("gs") > 0).cache()
    if caches is not None:
        caches.append(base)
    prep = base.select(
        "doc_id", F.size("gs").alias("n"), F.explode("gs").alias("gram")
    )
    # df-cap (JACCARD_DF_CAP): hash-aggregate postings per gram (map-side
    # partial → the shuffled df table is |distinct grams|, not |postings|),
    # keep only the hot grams (tiny by construction — every row is ≥ τ
    # docs' worth of postings), and broadcast-anti-join them away. The
    # postings never shuffle for this step; doc gram-set sizes `n` stay
    # FULL sizes so the Jaccard denominator is unaffected by the cap.
    hot = (
        prep.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > JACCARD_DF_CAP)
        .select("gram")
    )
    kept = prep.join(F.broadcast(hot), "gram", "left_anti")
    a = kept.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"), "gram")
    b = kept.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"), "gram")
    shared = (
        a.join(b, "gram")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    jacc = F.col("n_shared").cast("double") / (
        F.col("na") + F.col("nb") - F.col("n_shared")
    )
    return shared.filter(jacc >= 0.2).select("doc_a", "doc_b", jacc.alias("jacc"))


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH grams AS (
      SELECT DISTINCT doc_id, gram FROM (
        SELECT doc_id,
               UNNEST(list_transform(
                 range(1, greatest(len(w) - 1, 1)),
                 i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gram
        FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') AS w FROM documents)
      ) WHERE gram IS NOT NULL
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id
    ), hot AS (
      SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) > {JACCARD_DF_CAP}
    ), kept AS (
      SELECT * FROM grams WHERE gram NOT IN (SELECT gram FROM hot)
    ), shared AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
      FROM kept a JOIN kept b ON a.gram = b.gram AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           CAST(floor(CAST(n_shared AS DOUBLE) / (sa.n + sb.n - n_shared) * 10000) AS DOUBLE) / 10000 AS jaccard
    FROM shared
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_shared AS DOUBLE) / (sa.n + sb.n - n_shared) >= 0.2
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard near-dup pairs via an inverted index.

    3-gram shingles are selective keys, so the self-join touches only
    documents that actually share a shingle (prefix-filtering family) —
    never the full n² pair space. Grams seen in more than
    ``JACCARD_DF_CAP`` docs are excluded from candidate generation (the
    hot-gram quadratic guard; see the constant's comment for the recall
    tradeoff). Jaccard is an exact integer ratio, so the threshold
    decision is FP-safe against the oracle.
    """
    return _jaccard_pairs(spark, sf_dir).select(
        "doc_a", "doc_b", trunc_digits(F.col("jacc"), 4).alias("jaccard")
    )


@query(
    "dedup_embedding",
    oracle="""
    WITH prep AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
             CAST(list_sum(list_transform(embedding,
                    x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(25,16))))
                  AS DOUBLE) AS sq_norm
      FROM embeddings
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           CAST(floor(CAST(list_sum(list_transform(list_zip(a.e, b.e),
                   p -> CAST(p[1] * p[2] AS DECIMAL(25,16)))) AS DOUBLE)
                 / (sqrt(a.sq_norm) * sqrt(b.sq_norm)) * 10000) AS DOUBLE) / 10000 AS cosine
    FROM prep a JOIN prep b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE CAST(list_sum(list_transform(list_zip(a.e, b.e),
            p -> CAST(p[1] * p[2] AS DECIMAL(25,16)))) AS DOUBLE)
          / (sqrt(a.sq_norm) * sqrt(b.sq_norm)) >= 0.5
    """,
)
def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, blocked by label.

    The label acts as the coarse blocking key (at 100 TB: an IVF/k-means
    cell id) — candidate pairs exist only within a block. Dot products
    accumulate per-element products as exact decimals, so Spark and the
    oracle agree bit-for-bit and the threshold cannot flip on FP order.
    """
    emb = table(spark, sf_dir, "embeddings")
    e = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    sq_norm = F.aggregate(
        F.col("embedding"),
        F.lit(0).cast("decimal(25,16)"),
        lambda acc, x: (
            acc + (x.cast("double") * x.cast("double")).cast("decimal(25,16)")
        ).cast("decimal(25,16)"),
    ).cast("double")
    prep = emb.select(
        "vec_id", "label", e.alias("e"), sq_norm.alias("sq_norm")
    )
    a = prep.select(
        F.col("vec_id").alias("vec_a"),
        F.col("label").alias("label_a"),
        F.col("e").alias("ea"),
        F.col("sq_norm").alias("na"),
    )
    b = prep.select(
        F.col("vec_id").alias("vec_b"),
        F.col("label").alias("label_b"),
        F.col("e").alias("eb"),
        F.col("sq_norm").alias("nb"),
    )
    dot = F.aggregate(
        F.zip_with("ea", "eb", lambda x, y: (x * y).cast("decimal(25,16)")),
        F.lit(0).cast("decimal(25,16)"),
        lambda acc, x: (acc + x).cast("decimal(25,16)"),
    ).cast("double")
    cosine = dot / (F.sqrt(F.col("na")) * F.sqrt(F.col("nb")))
    return (
        a.join(b, (F.col("label_a") == F.col("label_b")) & (F.col("vec_a") < F.col("vec_b")))
        .withColumn("cosine_raw", cosine)
        .filter(F.col("cosine_raw") >= 0.5)
        .select("vec_a", "vec_b", trunc_digits(F.col("cosine_raw"), 4).alias("cosine"))
    )


@query(
    "dedup_cluster_components",
    oracle=f"""
    WITH RECURSIVE grams AS (
      SELECT DISTINCT doc_id, gram FROM (
        SELECT doc_id,
               UNNEST(list_transform(
                 range(1, greatest(len(w) - 1, 1)),
                 i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gram
        FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') AS w FROM documents)
      ) WHERE gram IS NOT NULL
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id
    ), hot AS (
      SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) > {JACCARD_DF_CAP}
    ), kept AS (
      SELECT * FROM grams WHERE gram NOT IN (SELECT gram FROM hot)
    ), shared AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
      FROM kept a JOIN kept b ON a.gram = b.gram AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), pairs AS (
      SELECT doc_a, doc_b FROM shared
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE CAST(n_shared AS DOUBLE) / (sa.n + sb.n - n_shared) >= 0.2
    ), edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b, doc_a FROM pairs
    ), reach(node, label) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
    ), comp AS (
      SELECT node AS doc_id, MIN(label) AS cluster_id FROM reach GROUP BY node
    )
    SELECT doc_id, cluster_id,
           CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size,
           doc_id = cluster_id AS keep
    FROM comp
    """,
)
def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters: connected components over the Jaccard pair
    graph, canonical (lowest-id) doc elected per cluster.

    The missing last step of a dedup pipeline — pairs alone don't say
    which docs to drop when A~B~C but A≁C. Components come from
    min-label propagation: each round every node adopts the smallest
    label among itself and its neighbors (one shuffle per round:
    edges ⋈ labels → min-agg on dst). Labels are monotone decreasing,
    so the global SUM(label) is a convergence witness — the loop stops
    when it stops falling, after O(component diameter) rounds. Near-dup
    components have tiny diameters (dup chains, not paths), so this
    runs 2-4 rounds at any corpus size; for adversarially long chains
    the same loop would swap in large-star/small-star rounds.
    Driver-side state is one scalar per round — never the labels.

    Oracle: DuckDB computes the same components by recursive-CTE
    transitive closure (min reachable label); both engines agree
    because the component minimum is partitioning-invariant.
    Output: every doc with its cluster id, cluster size, and a `keep`
    flag electing the canonical representative.
    """
    from pyspark.sql.window import Window

    docs = table(spark, sf_dir, "documents").select("doc_id")
    pair_caches: list[DataFrame] = []
    pairs = _jaccard_pairs(spark, sf_dir, caches=pair_caches).select(
        "doc_a", "doc_b"
    )
    edges = (
        pairs.unionByName(
            pairs.select(
                F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
            )
        )
        .toDF("src", "dst")
        .cache()
    )
    labels = docs.select("doc_id", F.col("doc_id").alias("cluster_id")).cache()
    prev_sum = labels.agg(F.sum("cluster_id")).collect()[0][0]
    while True:
        prop = (
            edges.join(labels, edges.src == labels.doc_id)
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        new_labels = (
            labels.join(prop, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"), F.coalesce("nbr_min", "cluster_id")
                ).alias("cluster_id"),
            )
            .cache()
        )
        cur_sum = new_labels.agg(F.sum("cluster_id")).collect()[0][0]
        labels.unpersist()
        labels = new_labels
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    # The loop consumed edges and the shingle base fully (the final
    # labels generation is materialized in cache by its sum-agg above) —
    # release them so back-to-back multi-query sessions don't accumulate
    # dead cached RDDs. `labels` itself must STAY cached: the returned
    # DataFrame reads it.
    edges.unpersist()
    for c in pair_caches:
        c.unpersist()
    w = Window.partitionBy("cluster_id")
    return labels.select(
        "doc_id",
        "cluster_id",
        F.count(F.lit(1)).over(w).cast("long").alias("cluster_size"),
        (F.col("doc_id") == F.col("cluster_id")).alias("keep"),
    )


# Cosine-LSH signature geometry: 16 deterministic ±1 hyperplanes over
# the 64-dim embeddings, banded 4×4. Plane signs come from an
# arithmetic hash (i·2654435761 mod 97 — a bijection over any 97
# consecutive i, so ~balanced), NOT an RNG: both engines can rebuild
# the exact same planes, which is what makes this LSH oracle-able.
_LSH_PLANES = 16
_LSH_DIM = 64
_LSH_BAND_BITS = 4


def _lsh_sign_is_pos(i: int | object) -> str:
    return f"(({i}) * 2654435761) % 97 < 48"


@query(
    "dedup_lsh_cosine",
    oracle="""
    WITH prep AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
             CAST(list_sum(list_transform(embedding,
                    x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(25,16))))
                  AS DOUBLE) AS sq_norm
      FROM embeddings
    ), sig AS (
      SELECT vec_id, """
    + ", ".join(
        "CASE WHEN list_sum(list_transform(range(1, 65), d -> "
        f"CAST(e[d] * (CASE WHEN (({p} * 64 + d) * 2654435761) % 97 < 48 "
        f"THEN 1 ELSE -1 END) AS DECIMAL(25,16)))) >= 0 THEN 1 ELSE 0 END AS b{p}"
        for p in range(_LSH_PLANES)
    )
    + """
      FROM prep
    ), bands AS (
    """
    + "\n      UNION ALL\n".join(
        f"      SELECT vec_id, {g} AS band, "
        + " + ".join(f"b{4 * g + j} * {1 << j}" for j in range(4))
        + " AS band_key FROM sig"
        for g in range(_LSH_PLANES // _LSH_BAND_BITS)
    )
    + """
    ), cand AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key
       AND a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b,
           CAST(floor(CAST(list_sum(list_transform(list_zip(pa.e, pb.e),
                   p -> CAST(p[1] * p[2] AS DECIMAL(25,16)))) AS DOUBLE)
                 / (sqrt(pa.sq_norm) * sqrt(pb.sq_norm)) * 10000) AS DOUBLE) / 10000
             AS cosine
    FROM cand
    JOIN prep pa ON pa.vec_id = vec_a
    JOIN prep pb ON pb.vec_id = vec_b
    WHERE CAST(list_sum(list_transform(list_zip(pa.e, pb.e),
            p -> CAST(p[1] * p[2] AS DECIMAL(25,16)))) AS DOUBLE)
          / (sqrt(pa.sq_norm) * sqrt(pb.sq_norm)) >= 0.5
    """,
)
def dedup_lsh_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs via random-hyperplane (SimHash-for-
    cosine) LSH: 16 deterministic ±1 planes → 16 sign bits → 4 bands
    of 4 bits → candidate pairs only within matching (band, key)
    buckets → exact-decimal cosine rescoring.

    The cosine twin of ``dedup_minhash`` (Jaccard) and the unblocked
    complement of ``dedup_embedding`` (which trusts a label/IVF cell):
    LSH needs NO pre-existing blocking column — the signature IS the
    blocking key, with recall controlled by bands × bits
    (P[match] = 1-(1-(1-θ/π)^bits)^bands). Plane signs are an
    arithmetic hash of (plane, dim), so Spark and DuckDB build
    bit-identical signatures — the whole pipeline, not just the
    rescoring, is oracle-checked; signature sums accumulate in exact
    decimal so a boundary sign can't flip on FP order.

    Scale: one scan computes all 16 signature sums as map-side
    partial aggregates after a posexplode (O(N·D) work, O(N·16)
    shuffle bytes); the self-join touches only same-bucket pairs.
    At 100 TB, band bits grow ~log N to hold bucket sizes constant —
    the knob is a constant here, the plan shape is unchanged.
    """
    emb = table(spark, sf_dir, "embeddings")
    e = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    sq_norm = F.aggregate(
        F.col("embedding"),
        F.lit(0).cast("decimal(25,16)"),
        lambda acc, x: (
            acc + (x.cast("double") * x.cast("double")).cast("decimal(25,16)")
        ).cast("decimal(25,16)"),
    ).cast("double")
    prep = emb.select("vec_id", e.alias("e"), sq_norm.alias("sq_norm")).cache()

    # (vec_id, pos, val) stream; pos is 1-based to match the oracle.
    comps = prep.select(
        "vec_id", F.posexplode("e").alias("pos0", "val")
    ).select("vec_id", (F.col("pos0") + 1).alias("d"), "val")
    sums = []
    for p in range(_LSH_PLANES):
        i = (F.lit(p * _LSH_DIM).cast("bigint") + F.col("d")) * F.lit(2654435761)
        sign = F.when(F.pmod(i, F.lit(97)) < 48, 1).otherwise(-1)
        sums.append(
            F.sum((F.col("val").cast("decimal(25,16)") * sign)).alias(f"s{p}")
        )
    sig = comps.groupBy("vec_id").agg(*sums)
    bit = lambda p: (F.col(f"s{p}") >= 0).cast("int")  # noqa: E731
    band_structs = F.array(
        *[
            F.struct(
                F.lit(g).alias("band"),
                sum(bit(4 * g + j) * (1 << j) for j in range(4)).alias("band_key"),
            )
            for g in range(_LSH_PLANES // _LSH_BAND_BITS)
        ]
    )
    bands = sig.select("vec_id", F.explode(band_structs).alias("bk")).select(
        "vec_id", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key")
    )
    a = bands.select(
        F.col("vec_id").alias("vec_a"), "band", "band_key"
    )
    b = bands.select(
        F.col("vec_id").alias("vec_b"), "band", "band_key"
    )
    cand = (
        a.join(b, ["band", "band_key"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    pa = prep.select(
        F.col("vec_id").alias("ia"), F.col("e").alias("ea"),
        F.col("sq_norm").alias("na"),
    )
    pb = prep.select(
        F.col("vec_id").alias("ib"), F.col("e").alias("eb"),
        F.col("sq_norm").alias("nb"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("ea"), F.col("eb"), lambda x, y: x * y),
        F.lit(0).cast("decimal(25,16)"),
        lambda acc, x: (acc + x.cast("decimal(25,16)")).cast("decimal(25,16)"),
    ).cast("double")
    cos = dot / (F.sqrt(F.col("na")) * F.sqrt(F.col("nb")))
    return (
        cand.join(pa, cand.vec_a == pa.ia)
        .join(pb, cand.vec_b == pb.ib)
        .withColumn("cosine_raw", cos)
        .filter(F.col("cosine_raw") >= 0.5)
        .select("vec_a", "vec_b", trunc_digits(F.col("cosine_raw"), 4).alias("cosine"))
    )
