"""Graph analytics over relational data — §2.B.10 extensions.

Iterative graph algorithms are usually rows-only (float accumulation
order diverges across engines), so both ops here are built in EXACT
integer arithmetic: ranks live in fixed-point micro-units and every
division is integer division, making each power-iteration round
bit-identical in Spark and DuckDB — the same trick the TPC-DS shapes
use for money (integer cents).

Scale design: edges are the distinct part↔supplier bipartite projection
of lineitem — one map-side-combinable DISTINCT, then each PageRank round
is one join + one aggregation on the node key (the classic Pregel
message round as a shuffle); the iteration count is fixed (3), so the
whole plan is a static 3-round DAG with no driver-side state at all.
Triangle counting orients edges low→high id, so each wedge is generated
once and the heaviest join is bounded by degree-ordered wedge counts —
the standard skew guard for triangle enumeration at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tpctools_spark.catalog import table
from tpctools_spark.queries._util import maybe_local_checkpoint
from tpctools_spark.registry import query

# Fixed-point scale: ranks are integers in units of 1e-9 of total mass.
_PR_SCALE = 1_000_000_000
_PR_ROUNDS = 3


def _pagerank_sql() -> str:
    """DuckDB twin: identical integer power iteration, unrolled."""
    rounds = []
    prev = "r0"
    for t in range(1, _PR_ROUNDS + 1):
        rounds.append(f"""
    contrib{t} AS (
      SELECT e.dst AS node, SUM({prev}.rank // {prev}.outdeg) AS inflow
      FROM edges e JOIN {prev} ON e.src = {prev}.node
      GROUP BY e.dst
    ),
    r{t} AS (
      SELECT n.node, n.outdeg,
             CAST((CAST({_PR_SCALE} AS BIGINT) * 15 // 100) // (SELECT cnt FROM nn)
               + (85 * CAST(COALESCE(c.inflow, 0) AS BIGINT)) // 100 AS BIGINT) AS rank
      FROM r0 n LEFT JOIN contrib{t} c USING (node)
    )""")
        prev = f"r{t}"
    return f"""
    WITH pairs AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ),
    edges AS (
      SELECT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst FROM pairs
      UNION ALL
      SELECT l_suppkey * 2 + 1 AS src, l_partkey * 2 AS dst FROM pairs
    ),
    deg AS (
      SELECT src AS node, COUNT(*) AS outdeg FROM edges GROUP BY src
    ),
    nn AS (SELECT COUNT(*) AS cnt FROM deg),
    r0 AS (
      SELECT node, outdeg,
             CAST({_PR_SCALE} // (SELECT cnt FROM nn) AS BIGINT) AS rank
      FROM deg
    ),{",".join(rounds)}
    SELECT node, rank AS rank_ppb
    FROM {prev}
    ORDER BY rank DESC, node ASC
    LIMIT 20
    """


@query("graph_pagerank_power", oracle=_pagerank_sql())
def graph_pagerank_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 fixed power-iteration rounds, damping 0.85) over the
    part↔supplier bipartite graph projected from lineitem.

    Each round is one Pregel superstep expressed relationally:
    edges ⋈ ranks on the source key, SUM of integer contributions per
    destination, then teleport + damping — one shuffle per round, both
    sides partitioned by the node key so AQE can coalesce. Ranks are
    fixed-point integers (parts-per-billion of total mass) and every
    step uses integer division, so the result is bit-identical across
    engines and partitionings — no float accumulation anywhere. The
    DuckDB oracle unrolls the same three rounds as chained CTEs.

    At 100 TB the edge list shuffles once per round and the rank table
    is node-sized; for high iteration counts you would cache ranks and
    checkpoint every ~5 rounds to truncate lineage — with a fixed
    3-round DAG neither is needed.
    """
    li = table(spark, sf_dir, "lineitem")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    fwd = pairs.select(
        (F.col("l_partkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    )
    rev = pairs.select(
        (F.col("l_suppkey") * 2 + 1).alias("src"),
        (F.col("l_partkey") * 2).alias("dst"),
    )
    # NOT cached, measured on purpose: the edge list appears once per
    # round in the nested plan, but materializing ~1M rows to the
    # in-memory columnar cache costs MORE than re-running the cheap
    # scan+distinct+union thrice (A/B same-process at sf0.1: plain
    # ~3.0s vs cached ~5.5-7.4s warm). r13: localCheckpoint is the
    # form that DOES win — row blocks, no columnar encode, and the
    # 4-use plan (deg + 3 rounds) collapses to one materialization
    # (interleaved A/B at sf0.1: faster 6/6 pairs, min 2.27 → 2.01 s,
    # identical top-20). Blocks are edge-list-sized and executor-local;
    # freed by ContextCleaner when the result DF is dropped — same
    # trade as `_min_label_components`' loop checkpoints.
    edges = maybe_local_checkpoint(fwd.unionByName(rev))
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    # One-row node count, broadcast into every round's teleport term.
    nn = deg.agg(F.count(F.lit(1)).alias("cnt"))
    ranks = deg.crossJoin(F.broadcast(nn)).select(
        "node",
        "outdeg",
        "cnt",
        F.expr(f"{_PR_SCALE} div cnt").alias("rank"),
    )
    for _ in range(_PR_ROUNDS):
        contrib = (
            edges.join(ranks, edges.src == ranks.node)
            .select(F.col("dst").alias("node"), F.expr("rank div outdeg").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            ranks.join(contrib, "node", "left")
            .select(
                "node",
                "outdeg",
                "cnt",
                (
                    # teleport mass precomputed in Python — an inline
                    # int32 literal product would overflow Spark's ANSI
                    # arithmetic before promotion to bigint
                    F.expr(f"{_PR_SCALE * 15 // 100} div cnt")
                    + F.expr("(85 * coalesce(inflow, CAST(0 AS BIGINT))) div 100")
                ).alias("rank"),
            )
        )
    return (
        ranks.orderBy(F.desc("rank"), F.asc("node"))
        .limit(20)
        .select("node", F.col("rank").alias("rank_ppb"))
    )


@query(
    "graph_triangle_count",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT l_suppkey % 97 AS a, l_partkey % 97 AS b
      FROM lineitem WHERE l_suppkey % 97 <> l_partkey % 97
    ),
    edges AS (
      SELECT DISTINCT LEAST(a, b) AS lo, GREATEST(a, b) AS hi FROM pairs
    ),
    wedges AS (
      SELECT e1.lo AS x, e1.hi AS y, e2.hi AS z
      FROM edges e1 JOIN edges e2 ON e1.hi = e2.lo
    )
    SELECT COUNT(*) AS n_triangles
    FROM wedges w JOIN edges e ON w.x = e.lo AND w.z = e.hi
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting by oriented wedge closure — the density /
    clustering primitive (spam-farm detection, community cohesion).

    Edges are oriented low-id → high-id so every triangle is counted
    exactly once and the wedge join fans out only from each node's
    higher neighbors (the degree-orientation trick that keeps the
    wedge count near m^1.5 instead of Σdeg² on skewed graphs; at real
    scale you orient by (degree, id) — same plan, one extra broadcast
    of the degree table). Two equi-joins + one count: wedges build on
    the shared middle vertex, then close against the edge set. The
    graph maps supplier and part keys into one shared residue space
    (mod 97), giving a dense non-bipartite graph that actually
    contains triangles at fixture scale.
    """
    li = table(spark, sf_dir, "lineitem")
    pairs = (
        li.select(
            (F.col("l_suppkey") % 97).alias("a"), (F.col("l_partkey") % 97).alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    # r13 A/B NEUTRAL — localCheckpoint(edges) (the pagerank/BFS win)
    # measured NOT sign-stable here (faster 4/5, min 0.480 vs 0.472 s
    # at sf0.1): the three `edges` consumers share the mod-97 distinct
    # EXCHANGE via shuffle-stage reuse, and the post-shuffle re-agg is
    # ≤4.6k rows — there is no re-derivation to save. Left plain.
    edges = pairs.select(
        F.least("a", "b").alias("lo"), F.greatest("a", "b").alias("hi")
    ).distinct()
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    wedges = e1.join(e2, F.col("e1.hi") == F.col("e2.lo")).select(
        F.col("e1.lo").alias("x"), F.col("e1.hi").alias("y"), F.col("e2.hi").alias("z")
    )
    closer = edges.select(F.col("lo").alias("x"), F.col("hi").alias("z"))
    return wedges.join(closer, ["x", "z"]).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )


# ---------------------------------------------------------------------------
# graph_bfs_distance

_BFS_ROUNDS = 3
_BFS_INF = 1 << 30  # unreached sentinel (integer, exact in both engines)
_BFS_SEED_MAX = 20  # seeds: part-side nodes 2·partkey ≤ 20 (partkeys 1-10)


def _bfs_sql() -> str:
    """DuckDB twin: the same 3 relaxation rounds, unrolled as CTEs."""
    rounds = []
    prev = "d0"
    for t in range(1, _BFS_ROUNDS + 1):
        rounds.append(f"""
    p{t} AS (
      SELECT e.dst AS node, MIN({prev}.d) + 1 AS nd
      FROM edges e JOIN {prev} ON e.src = {prev}.node
      WHERE {prev}.d < {_BFS_INF}
      GROUP BY e.dst
    ),
    d{t} AS (
      SELECT n.node, LEAST(n.d, COALESCE(p{t}.nd, {_BFS_INF})) AS d
      FROM {prev} n LEFT JOIN p{t} ON n.node = p{t}.node
    )""")
        prev = f"d{t}"
    return f"""
    WITH pairs AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ),
    edges AS (
      SELECT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst FROM pairs
      UNION ALL
      SELECT l_suppkey * 2 + 1 AS src, l_partkey * 2 AS dst FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    d0 AS (
      SELECT node,
             CASE WHEN node % 2 = 0 AND node <= {_BFS_SEED_MAX}
                  THEN 0 ELSE {_BFS_INF} END AS d
      FROM nodes
    ),{",".join(rounds)}
    SELECT d AS dist, CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(SUM(node) AS BIGINT) AS sum_node
    FROM {prev} WHERE d < {_BFS_INF}
    GROUP BY d
    """


@query("graph_bfs_distance", oracle=_bfs_sql())
def graph_bfs_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS hop distance (3 fixed relaxation rounds) over
    the same part↔supplier bipartite graph as `graph_pagerank_power`.

    Each round is one Pregel superstep: frontier (nodes with a finite
    distance) joins edges on the source key, MIN(d)+1 per destination,
    then element-wise LEAST against the previous labels — distances
    are monotone non-increasing integers, so every round is
    bit-deterministic and partitioning-invariant. The WHERE d < INF
    frontier filter keeps each round's join sized by the reached set,
    not the node set — on a 100 TB graph the early rounds touch only
    the expanding ball around the seeds. Fixed round count = static
    3-round DAG, no driver-side state (contrast with
    `dedup_cluster_components`, which needs a convergence witness
    because component diameters are data-dependent; BFS to depth k is
    depth-bounded by construction). Output is the per-distance node
    census (count + id-sum) — compact at any scale.

    Edge list: columnar cache was the r11 measured loss (see the
    PageRank note), but the r13 localCheckpoint A/B won sign-stable
    (faster 6/6 interleaved pairs at sf0.1, min 2.32 → 1.71 s,
    identical census) — the 4 consumers (nodes + 3 rounds) read one
    row-block materialization instead of re-deriving scan+distinct+
    union each time.
    """
    li = table(spark, sf_dir, "lineitem")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    edges = maybe_local_checkpoint(
        pairs.select(
            (F.col("l_partkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        ).unionByName(
            pairs.select(
                (F.col("l_suppkey") * 2 + 1).alias("src"),
                (F.col("l_partkey") * 2).alias("dst"),
            )
        )
    )
    nodes = edges.select("src").distinct().select(F.col("src").alias("node"))
    labels = nodes.select(
        "node",
        F.when(
            (F.col("node") % 2 == 0) & (F.col("node") <= _BFS_SEED_MAX), 0
        )
        .otherwise(_BFS_INF)
        .cast("bigint")
        .alias("d"),
    )
    for _ in range(_BFS_ROUNDS):
        prop = (
            edges.join(
                labels.filter(F.col("d") < _BFS_INF),
                edges.src == F.col("node"),
            )
            .groupBy(F.col("dst").alias("node"))
            .agg((F.min("d") + 1).alias("nd"))
        )
        labels = labels.join(prop, "node", "left").select(
            "node",
            F.least(F.col("d"), F.coalesce("nd", F.lit(_BFS_INF))).alias("d"),
        )
    return (
        labels.filter(F.col("d") < _BFS_INF)
        .groupBy(F.col("d").alias("dist"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.sum("node").cast("bigint").alias("sum_node"),
        )
    )


# ---------------------------------------------------------------------------
# graph_label_propagation

_LPA_ROUNDS = 3


def _lpa_sql() -> str:
    """DuckDB twin: the same 3 synchronous LPA rounds, unrolled."""
    rounds = []
    prev = "l0"
    for t in range(1, _LPA_ROUNDS + 1):
        rounds.append(f"""
    c{t} AS (
      SELECT e.dst AS node, l.label, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM edges e JOIN {prev} l ON e.src = l.node
      GROUP BY e.dst, l.label
    ),
    m{t} AS (SELECT node, MAX(cnt) AS mc FROM c{t} GROUP BY node),
    l{t} AS (
      SELECT c.node, MIN(c.label) AS label
      FROM c{t} c JOIN m{t} m ON c.node = m.node AND c.cnt = m.mc
      GROUP BY c.node
    )""")
        prev = f"l{t}"
    summaries = " UNION ALL ".join(
        f"""
    SELECT {t} AS round,
           CAST(COUNT(DISTINCT label) AS BIGINT) AS n_communities,
           (SELECT CAST(MAX(sz) AS BIGINT) FROM (
              SELECT COUNT(*) AS sz FROM l{t} GROUP BY label) s{t}
           ) AS max_size,
           CAST(SUM(label) AS BIGINT) AS label_checksum
    FROM l{t}"""
        for t in range(1, _LPA_ROUNDS + 1)
    )
    return f"""
    WITH pairs AS (
      SELECT DISTINCT l_suppkey % 97 AS a, l_partkey % 97 AS b
      FROM lineitem WHERE l_suppkey % 97 <> l_partkey % 97
    ),
    edges AS (
      SELECT a AS src, b AS dst FROM pairs
      UNION
      SELECT b AS src, a AS dst FROM pairs
    ),
    l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges),{",".join(rounds)}
    {summaries}
    ORDER BY round
    """


@query("graph_label_propagation", oracle=_lpa_sql())
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation (3 fixed
    rounds) over the mod-97 residue graph of `graph_triangle_count`.

    Classic LPA breaks ties randomly and is therefore irreproducible;
    this formulation is bit-deterministic: each round every node takes
    the neighbor label with the highest count, ties broken by SMALLEST
    label — expressed as two aggregations (per-(node,label) counts,
    then max-count per node, then min label among the maxima), never a
    per-node window and never a random draw. Labels are integer node
    ids throughout, so every round is exact and partitioning-invariant,
    and the DuckDB oracle unrolls the identical rounds as CTEs.

    Scale shape: one Pregel superstep = one edges⋈labels shuffle on the
    node key plus two map-side-combinable aggregations; the label table
    is node-sized. Synchronous (Jacobi) updates rather than the
    sequential sweep of the original paper — the only LPA that
    distributes. The output is the per-round coarsening trajectory
    (community count, largest community, label checksum), which pins
    every intermediate label table, not just the fixed point — on a
    dense graph min-label LPA legitimately coarsens toward one giant
    community, so the trajectory is the informative (and the testable)
    object. Each row is node-bounded at any data scale.
    """
    li = table(spark, sf_dir, "lineitem")
    pairs = (
        li.select(
            (F.col("l_suppkey") % 97).alias("a"), (F.col("l_partkey") % 97).alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    # r13 A/B NEUTRAL — localCheckpoint(edges) measured not sign-stable
    # (faster 4/5, min 2.678 vs 2.591 s at sf0.1): same reason as
    # `graph_triangle_count` — the per-round consumers reuse the mod-97
    # distinct's shuffle output, so only a tiny (≤97-node) re-agg would
    # be saved. Left plain.
    edges = (
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(pairs.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .distinct()
    )
    labels = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    summaries = []
    for t in range(1, _LPA_ROUNDS + 1):
        counts = (
            edges.join(labels, edges.src == labels.node)
            .groupBy(F.col("dst").alias("node"), "label")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        )
        top = counts.groupBy("node").agg(F.max("cnt").alias("mc"))
        labels = (
            counts.join(top, "node")
            .filter(F.col("cnt") == F.col("mc"))
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            # Node-bounded (≤97 rows here, |V| in general) and consumed
            # twice — by round t+1 AND by round t's trajectory summary.
            # Without the cache each summary branch re-derives every
            # earlier round through the union, turning R rounds into
            # R(R+1)/2 round-computations. This is the lineage-
            # truncation point the PageRank docstring defers ("cache
            # ranks ... with a fixed 3-round DAG neither is needed") —
            # here the fan-out makes it needed at R=3.
            .cache()
        )
        sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("sz"))
        summaries.append(
            sizes.agg(
                F.lit(t).alias("round"),
                F.count(F.lit(1)).cast("bigint").alias("n_communities"),
                F.max("sz").cast("bigint").alias("max_size"),
                F.sum(F.col("label") * F.col("sz")).cast("bigint").alias(
                    "label_checksum"
                ),
            )
        )
    out = summaries[0]
    for s in summaries[1:]:
        out = out.unionByName(s)
    return out.orderBy("round")
