"""Iterative graph analytics as DataFrame loops (north-star scope: the
reference is a graph DATABASE with point traversals —
/root/reference/src/Edgy/Operations.hs:273-287 — but ships no graph
ALGORITHMS; BASELINE.json's spark_approach calls for GraphX-style analytics).

Implemented GraphFrames/Pregel-style, but engine-native: each algorithm is a
loop of DataFrame joins ("aggregateMessages" = join edges to vertex state,
groupBy destination, aggregate), with ``localCheckpoint`` per iteration to
truncate lineage — the standard pattern for iterative algorithms on Spark.

Determinism stance (oracle parity): every algorithm is either integer-only
(hash-min CC labels, BFS hop counts, triangle counts) or runs in SCALED
INTEGER arithmetic (PageRank: ranks are BIGINT micro-units, contributions
use integer division) — sums of integers are order-independent, so a
distributed reduction matches DuckDB's single-threaded recursive CTE /
unrolled-iteration SQL bit-for-bit.  Float PageRank would differ in low
bits per partitioning; scaled-integer PageRank cannot.

Test graph: the part co-purchase graph — an undirected edge between two
parts when some order contains both with quantity >= 48 (sparse by
construction: ~650 vertices / ~430 edges at sf0.01, component diameter < 12).

Scale notes:
- Edge generation self-joins lineitem on orderkey — one shuffle, and the
  per-order pair explosion is bounded by order size (AQE splits stragglers).
- Hash-min CC converges in O(diameter) rounds; each round is one join +
  one groupBy(min) on (node, label) pairs — narrow rows.  (For graphs with
  huge diameters the two-phase large-star/small-star variant converges in
  O(log n) rounds; the message pattern below is the same, so swapping the
  update rule is local.)
- localCheckpoint materializes each round's state, preventing the
  exponential lineage/replan blowup that kills naive iterative Spark jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from edgy_spark.catalog import register
from edgy_spark.sources import load

QTY_THRESHOLD = 48
PR_SCALE = 10**12  # PageRank unit: 1.0 == 10^12 (BIGINT micro-ranks)
PR_ITERS = 5

_EDGES_SQL = f"""
  SELECT DISTINCT l1.l_partkey AS src, l2.l_partkey AS dst
  FROM lineitem l1 JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey
   AND l1.l_partkey < l2.l_partkey
  WHERE l1.l_quantity >= {QTY_THRESHOLD} AND l2.l_quantity >= {QTY_THRESHOLD}
"""

# Sibling CTE pair (DuckDB's recursive WITH rejects a nested WITH inside a
# CTE body, so `edges` must be hoisted to the same level as `undirected`).
_UND_CTES = f"""
    edges AS ({_EDGES_SQL}),
    undirected AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges)
"""


def copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical (src < dst) co-purchase edges over parts.

    Posting-list formulation (same shape as the dedup pair generator): ONE
    scan of lineitem, one shuffle to group parts per order, pairs exploded
    from each order's list.  A self-join would scan and shuffle the fact
    table twice; per-order lists are bounded by order size, so the explode
    cannot blow up.
    """
    l = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= QTY_THRESHOLD)
        .select("l_orderkey", "l_partkey")
    )
    per_order = l.groupBy("l_orderkey").agg(F.collect_set("l_partkey").alias("parts"))
    return (
        per_order.filter(F.size("parts") >= 2)
        .select(F.explode("parts").alias("src"), "parts")
        .select("src", F.explode("parts").alias("dst"))
        .filter(F.col("src") < F.col("dst"))
        .distinct()
    )


def undirect(edges: DataFrame) -> DataFrame:
    """Expand canonical edges to both directions (symmetric adjacency)."""
    return edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


# Vertex-state partition count for iteration steps.  The co-purchase graph
# is orders of magnitude smaller than the fact table it derives from, so the
# default shuffle width would schedule mostly-empty tasks each round; at
# cluster scale this should be sized ~ |V| / target-partition-rows (AQE
# coalescing achieves the same effect on the shuffle side).
ITER_PARTITIONS = 8


def _checkpoint(df: DataFrame) -> DataFrame:
    """Materialize iteration state (few partitions) and truncate lineage."""
    return df.coalesce(ITER_PARTITIONS).localCheckpoint(eager=True)


# ---------------------------------------------------------------------------
# Connected components (hash-min label propagation)
# ---------------------------------------------------------------------------

def _hint(df: DataFrame, broadcast_state: bool) -> DataFrame:
    """Broadcast hint for vertex-state joins.

    Checkpointed DataFrames lose Catalyst size statistics (a LogicalRDD
    reports the default huge sizeInBytes), so WITHOUT an explicit hint every
    per-round join becomes a full shuffle exchange of a few-thousand-row
    state — stage latency, not data volume, then dominates the loop.  The
    derived graph here is orders of magnitude smaller than its source fact
    table, so broadcasting is right; for a graph whose vertex state exceeds
    executor memory pass ``broadcast_state=False`` to fall back to shuffled
    hash joins (the message pattern is identical).
    """
    return F.broadcast(df) if broadcast_state else df


def connected_components(
    edges: DataFrame, max_iter: int = 30, broadcast_state: bool = True
) -> DataFrame:
    """(node, component) with component = min node id in the component.

    Hash-min with pointer jumping: each round every node adopts the
    smallest label among itself and its neighbors (hash-min, O(diameter)
    alone), then follows its label's OWN label one step (path compression).
    Labels only ever decrease toward the component minimum, so the fixpoint
    is unchanged, but long chains collapse exponentially — rounds scale
    ~O(log diameter), the same effect the large-star/small-star algorithm
    achieves.  Fixpoint detected by an empty change-set.
    """
    und = _checkpoint(undirect(edges)).persist()
    labels = (
        und.select(F.col("src").alias("node")).distinct().withColumn("label", F.col("node"))
    )
    labels = _checkpoint(labels)

    def step(lbl: DataFrame) -> DataFrame:
        nbr_min = (
            und.join(_hint(lbl, broadcast_state), und.src == lbl.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("label").alias("nbr_min"))
        )
        cand = (
            lbl.select("node", "label")
            .join(_hint(nbr_min, broadcast_state), "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nbr_min", F.col("label"))).alias("label"),
            )
        )
        # pointer jumping: label <- label(label); the parent lookup uses the
        # input round's labels, which is sound because any label value is
        # an upper bound of its own component minimum.
        parent = lbl.select(F.col("node").alias("p_node"), F.col("label").alias("p_label"))
        return (
            cand.join(_hint(parent, broadcast_state), cand.label == F.col("p_node"), "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("p_label", F.col("label"))).alias("label"),
            )
        )

    for _ in range(max_iter):
        # two propagation steps per materialization round: halves the
        # checkpoint + convergence-check overhead per label hop, which
        # dominates when the vertex state is small
        old = labels.select("node", F.col("label").alias("old"))
        new_labels = (
            step(step(labels)).join(_hint(old, broadcast_state), "node")
            .select("node", "label", (F.col("label") != F.col("old")).alias("chg"))
        )
        new_labels = _checkpoint(new_labels)
        # change detection on the already-materialized state — no extra join
        changed = new_labels.filter("chg").limit(1).count()
        labels = new_labels.select("node", "label")
        if changed == 0:
            break
    und.unpersist()
    return labels.select("node", F.col("label").alias("component"))


@register(
    "graph_connected_components",
    oracle=f"""
    WITH RECURSIVE
    {_UND_CTES},
    verts AS (SELECT DISTINCT src AS node FROM undirected),
    reach(node, label) AS (
      SELECT node, node FROM verts
      UNION
      SELECT u.dst, r.label FROM reach r JOIN undirected u ON u.src = r.node)
    SELECT node, MIN(label) AS component FROM reach GROUP BY node ORDER BY node
    """,
    tags=("graph", "iterative", "components"),
    bench=True,
)
def graph_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the co-purchase graph (hash-min vs a
    DuckDB recursive-CTE transitive closure)."""
    return connected_components(copurchase_edges(spark, sf_dir)).orderBy("node")


# ---------------------------------------------------------------------------
# BFS / single-source shortest hop distances
# ---------------------------------------------------------------------------

BFS_MAX_DEPTH = 12


def bfs_distances(
    edges: DataFrame, max_depth: int = BFS_MAX_DEPTH, broadcast_state: bool = True
) -> DataFrame:
    """(node, dist) minimum hop counts from the smallest node id in the
    graph; nodes unreachable within max_depth are omitted.

    Bellman-Ford-style relaxation: after k rounds all distances <= k are
    exact, so max_depth rounds bound the search identically to the
    oracle's depth-capped recursive CTE; a converged (unchanged) state is
    a fixpoint, so stopping early cannot change the result.
    """
    und = _checkpoint(undirect(edges)).persist()
    source = und.agg(F.min("src").alias("s"))
    dist = (
        und.select(F.col("src").alias("node")).distinct()
        .join(F.broadcast(source), F.col("node") == F.col("s"), "left_semi")
        .withColumn("dist", F.lit(0).cast("long"))
    )
    dist = _checkpoint(dist)
    prev_reached = 1
    for _ in range(max_depth):
        cand = (
            und.join(_hint(dist, broadcast_state), und.src == dist.node)
            .groupBy(F.col("dst").alias("node"))
            .agg((F.min("dist") + 1).alias("cand"))
        )
        # full outer keeps both already-settled and newly-reached nodes;
        # full outer cannot broadcast, but both sides are post-aggregation
        # state-sized so this is the round's one small shuffle
        dist = (
            dist.join(cand, "node", "full_outer")
            .select(
                "node",
                F.least(
                    F.coalesce("dist", F.col("cand")), F.coalesce("cand", F.col("dist"))
                ).alias("dist"),
            )
        )
        dist = _checkpoint(dist)
        # BFS frontiers only ever grow the reached set; a round that reaches
        # no new node has converged (all shortest distances are final).
        reached = dist.count()
        if reached == prev_reached:
            break
        prev_reached = reached
    und.unpersist()
    return dist


@register(
    "graph_bfs_distances",
    oracle=f"""
    WITH RECURSIVE
    {_UND_CTES},
    source AS (SELECT MIN(src) AS s FROM undirected),
    walk(node, dist) AS (
      SELECT s, 0 FROM source
      UNION
      SELECT u.dst, w.dist + 1 FROM walk w JOIN undirected u ON u.src = w.node
      WHERE w.dist < {BFS_MAX_DEPTH})
    SELECT node, CAST(MIN(dist) AS BIGINT) AS dist
    FROM walk GROUP BY node ORDER BY node
    """,
    tags=("graph", "iterative", "bfs"),
)
def graph_bfs_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop distances from the smallest part in the co-purchase graph."""
    return bfs_distances(copurchase_edges(spark, sf_dir)).orderBy("node")


# ---------------------------------------------------------------------------
# PageRank (scaled-integer, undirected)
# ---------------------------------------------------------------------------

def pagerank_scaled(
    edges: DataFrame, iters: int = PR_ITERS, broadcast_state: bool = True
) -> DataFrame:
    """(node, rank) after ``iters`` synchronous PageRank rounds with
    damping 0.85, in BIGINT units of 1/PR_SCALE.

    rank_0 = SCALE div n;
    rank_{k+1} = (15*SCALE) div (100*n) + (85 * sum(contribs)) div 100,
    contrib = rank div degree.  All operations are integer, so the result
    is independent of partitioning AND matches the oracle's unrolled SQL
    exactly — the reason this engine's PageRank is scaled-integer.
    """
    und = _checkpoint(undirect(edges)).persist()
    verts = und.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("deg"))
    n_df = verts.agg(F.count(F.lit(1)).alias("n"))
    state = (
        verts.crossJoin(F.broadcast(n_df))
        .select("node", "deg", "n", F.expr(f"{PR_SCALE} div n").alias("rank"))
    )
    state = _checkpoint(state)
    for _ in range(iters):
        contrib = state.select(F.col("node").alias("cnode"), F.expr("rank div deg").alias("c"))
        msgs = (
            und.join(_hint(contrib, broadcast_state), und.src == F.col("cnode"))
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("c").alias("s"))
        )
        state = (
            state.drop("rank")
            .join(_hint(msgs, broadcast_state), "node", "left")
            .select(
                "node", "deg", "n",
                (
                    F.expr(f"{15 * PR_SCALE} div (100 * n)")
                    + F.expr("(85 * coalesce(s, 0)) div 100")
                ).alias("rank"),
            )
        )
        state = _checkpoint(state)
    und.unpersist()
    return state.select("node", "rank")


def _pagerank_oracle() -> str:
    cte = [
        _UND_CTES.strip().rstrip(","),
        "deg AS (SELECT src AS node, COUNT(*) AS deg FROM undirected GROUP BY src)",
        "nn AS (SELECT COUNT(*) AS n FROM deg)",
        f"r0 AS (SELECT node, deg, n, {PR_SCALE} // n AS rank FROM deg, nn)",
    ]
    for i in range(1, PR_ITERS + 1):
        cte.append(
            f"m{i} AS (SELECT u.dst AS node, SUM(r.rank // r.deg) AS s "
            f"FROM undirected u JOIN r{i-1} r ON u.src = r.node GROUP BY u.dst)"
        )
        cte.append(
            f"r{i} AS (SELECT r.node, r.deg, r.n, "
            f"{15 * PR_SCALE} // (100 * r.n) + (85 * COALESCE(m.s, 0)) // 100 AS rank "
            f"FROM r{i-1} r LEFT JOIN m{i} m ON m.node = r.node)"
        )
    return (
        "WITH " + ",\n".join(cte)
        + f"\nSELECT node, CAST(rank AS BIGINT) AS rank FROM r{PR_ITERS} ORDER BY node"
    )


@register(
    "graph_pagerank",
    oracle=_pagerank_oracle(),
    tags=("graph", "iterative", "pagerank"),
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-round damped PageRank over the co-purchase graph in scaled-integer
    arithmetic (bit-identical to the oracle's unrolled iterations)."""
    return pagerank_scaled(copurchase_edges(spark, sf_dir)).orderBy("node")


# ---------------------------------------------------------------------------
# Triangle counting
# ---------------------------------------------------------------------------

def triangle_count(edges: DataFrame) -> DataFrame:
    """Global triangle count on canonical (src < dst) edges: each triangle
    a<b<c is counted once via the wedge join (a,b)+(b,c) closed by (a,c)."""
    e1 = edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = edges.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = edges.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    return (
        e1.join(e2, "b")
        .join(e3, ["a", "c"], "left_semi")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


@register(
    "graph_triangle_count",
    oracle=f"""
    WITH edges AS ({_EDGES_SQL})
    SELECT COUNT(*) AS n_triangles
    FROM edges e1
    JOIN edges e2 ON e2.src = e1.dst
    JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst
    """,
    tags=("graph", "triangles"),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count of the co-purchase graph (wedge join + closure
    semi-join — the scalable formulation; no per-node adjacency collection)."""
    return triangle_count(copurchase_edges(spark, sf_dir))
