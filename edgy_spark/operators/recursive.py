"""Recursive CTE queries — the SQL-native iterative surface.

Spark 4's ``WITH RECURSIVE`` (SQL standard fixed-point recursion) is the
third iterative surface in this engine, next to the manual k-hop join
unroll (operators/graph_queries.py) and the checkpointed DataFrame
fixpoint harness (operators/graph_algos.run_fixpoint).  Where the
reference exposes traversal through point operations (`getRelated`
chains, /root/reference/src/Edgy.hs:31-40) and the demo walks fixed-depth
friend-of-friend hops (/root/reference/app/Main.hs:150-170), a SQL user
of THIS engine can express unbounded-depth closures declaratively and
let the engine iterate to the fixed point.

The same ANSI text runs on both engines — the Spark callable and the
DuckDB oracle share one template, parameterized only by table names —
so the driver's value-hash gate checks Spark's recursive execution
against an independent recursive executor, not against a rephrasing.

Execution model and the 100 TB stance: Spark runs each recursive step as
a distributed union-append job (AQE re-plans per step), so a step is a
full shuffle stage — fine for the bounded-depth closures here.  For
unbounded iteration over billion-edge graphs, ``run_fixpoint`` remains
the right surface: it localCheckpoints per round to truncate lineage and
bounds state width, which the SQL surface cannot control.  Both
hierarchy recursion (acyclic, terminates naturally) and cyclic-graph
reachability (explicit depth cap + MIN-level dedup, the standard
SQL-recursion idiom for cyclic inputs) are covered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from edgy_spark.catalog import register
from edgy_spark.operators.graph_algos import QTY_THRESHOLD
from edgy_spark.sources import load

#: Spark's recursion guard (default 100) comfortably covers both queries:
#: the hierarchy forest is depth 2 and reachability is depth-capped below.
REACH_MAX_HOPS = 3

# Shared ANSI template — region -> nation -> customer forest, rolled up by
# recursive descent.  Node ids are typed strings so one uniform edge table
# carries all three levels; customers aggregate their orders as leaf
# values; the closure pairs every ancestor with every buying descendant.
# The forest is acyclic so UNION ALL recursion terminates at the fixed
# point in both engines with no cap.
_HIERARCHY_SQL = """
WITH RECURSIVE
  edges AS (
    SELECT 'R' || CAST(r_regionkey AS STRING) AS parent,
           'N' || CAST(n_nationkey AS STRING) AS child
    FROM {nation} JOIN {region} ON n_regionkey = r_regionkey
    UNION ALL
    SELECT 'N' || CAST(c_nationkey AS STRING) AS parent,
           'C' || CAST(c_custkey AS STRING) AS child
    FROM {customer}
  ),
  leaf_val AS (
    SELECT 'C' || CAST(o_custkey AS STRING) AS node,
           SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS val
    FROM {orders} GROUP BY o_custkey
  ),
  closure AS (
    SELECT parent AS root, child AS node FROM edges
    UNION ALL
    SELECT c.root, e.child FROM closure c JOIN edges e ON e.parent = c.node
  )
SELECT c.root AS node_id,
       COUNT(*) AS n_buying_descendants,
       CAST(ROUND(SUM(v.val), 2) AS DOUBLE) AS subtree_revenue
FROM closure c JOIN leaf_val v ON v.node = c.node
GROUP BY c.root
ORDER BY node_id
"""

# Directed co-purchase edges: the same graph as graph_scc_members
# (graph_algos._DEDGES_SQL — kept textually in lockstep), which has real
# cycles, so the recursion needs the standard cyclic-input idiom: an
# explicit hop cap bounds path re-expansion and MIN(lvl) collapses the
# multiple paths to each node into its BFS level.
_REACH_SQL = f"""
WITH RECURSIVE
  edges AS (
    SELECT DISTINCT l1.l_partkey AS src, l2.l_partkey AS dst
    FROM {{lineitem}} l1 JOIN {{lineitem}} l2 ON l1.l_orderkey = l2.l_orderkey
     AND l1.l_partkey <> l2.l_partkey
    WHERE l1.l_quantity >= {QTY_THRESHOLD} AND l2.l_quantity >= {QTY_THRESHOLD}
      AND l1.l_quantity >= l2.l_quantity
  ),
  seeds AS (SELECT DISTINCT src FROM edges WHERE src % 41 = 0),
  reach AS (
    SELECT src AS root, src AS node, 0 AS lvl FROM seeds
    UNION ALL
    SELECT r.root, e.dst, r.lvl + 1
    FROM reach r JOIN edges e ON e.src = r.node
    WHERE r.lvl < {REACH_MAX_HOPS}
  ),
  min_hops AS (
    SELECT root, node, MIN(lvl) AS hops FROM reach GROUP BY root, node
  )
SELECT root,
       COUNT(*) AS n_reached,
       CAST(SUM(hops) AS BIGINT) AS total_min_hops,
       CAST(MAX(hops) AS BIGINT) AS eccentricity_capped
FROM min_hops
GROUP BY root
ORDER BY root
"""


def _run(spark: SparkSession, sf_dir: str, template: str, tables: list[str]) -> DataFrame:
    views = {}
    for t in tables:
        name = f"_rec_{t}"
        load(spark, sf_dir, t).createOrReplaceTempView(name)
        views[t] = name
    return spark.sql(template.format(**views))


@register(
    "recursive_hierarchy_rollup",
    oracle=_HIERARCHY_SQL.format(
        region="region", nation="nation", customer="customer", orders="orders"
    ),
    tags=("recursive", "hierarchy", "sql"),
)
def recursive_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtree rollup via ``WITH RECURSIVE``: every node of
    the region->nation->customer forest gets the exact-decimal revenue and
    buying-descendant count of its subtree, computed by recursive
    ancestor/descendant closure — the SQL-native form of the reference's
    `getRelated` descent (/root/reference/src/Edgy.hs:31-36).

    Scale: the closure fans each leaf to its ancestor chain, so rows =
    leaves x depth (here 3 levels — bounded), and the rollup is a single
    hash aggregate over that; each recursion step is one AQE-planned
    distributed join of the frontier against the (broadcast-sized) edge
    table.  The exact-DECIMAL convention (functions/exact.py) makes the
    double bit-identical across engines and partitionings.
    """
    return _run(
        spark, sf_dir, _HIERARCHY_SQL, ["region", "nation", "customer", "orders"]
    )


@register(
    "recursive_copurchase_reach",
    oracle=_REACH_SQL.format(lineitem="lineitem"),
    tags=("recursive", "graph", "sql"),
    bench=True,
)
def recursive_copurchase_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-depth reachability on a CYCLIC directed graph via
    ``WITH RECURSIVE``: per seed part, how many parts its co-purchase
    influence reaches within {REACH_MAX_HOPS} hops, with total and max
    BFS level — the SQL-native twin of graph_bfs_distances (which runs
    the same computation on the checkpointed DataFrame fixpoint harness,
    operators/graph_algos.py).

    The graph is graph_scc_members' directed co-purchase graph, so cycles
    are real: termination comes from the explicit hop cap, correctness
    from MIN(lvl) collapsing multi-path visits — the standard recursive-
    SQL idiom for cyclic inputs.  Scale: path re-expansion is bounded by
    cap x mean out-degree per seed; for unbounded closures on big graphs
    use run_fixpoint, whose per-round checkpoint truncation the SQL
    surface cannot express (module docstring).
    """
    return _run(spark, sf_dir, _REACH_SQL, ["lineitem"])
