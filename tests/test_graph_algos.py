"""Unit tests for the generic iterative graph algorithms on a hand-built
graph (independent of the star-schema fixtures, so expected values are
checkable by eye).

Graph (canonical src<dst edges):

    component A: 1-2, 2-3, 1-3, 3-4   (triangle 1-2-3 plus a tail to 4)
    component B: 10-11
    component C: 20 (isolated -> absent: vertices are induced from edges)
"""

from __future__ import annotations

from edgy_spark.operators.graph_algos import (
    PR_SCALE,
    bfs_distances,
    connected_components,
    pagerank_scaled,
    triangle_count,
)

EDGES = [(1, 2), (2, 3), (1, 3), (3, 4), (10, 11)]


def _edges_df(spark):
    return spark.createDataFrame(EDGES, "src long, dst long")


def test_connected_components(spark):
    got = {
        (r.node, r.component)
        for r in connected_components(_edges_df(spark)).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)}


def test_bfs_distances_from_min_node(spark):
    got = {(r.node, r.dist) for r in bfs_distances(_edges_df(spark)).collect()}
    # source = min node (1); component B is unreachable and must be absent
    assert got == {(1, 0), (2, 1), (3, 1), (4, 2)}


def test_triangle_count(spark):
    assert triangle_count(_edges_df(spark)).collect()[0].n_triangles == 1


def test_pagerank_scaled_properties(spark):
    ranks = {r.node: r.rank for r in pagerank_scaled(_edges_df(spark)).collect()}
    assert set(ranks) == {1, 2, 3, 4, 10, 11}
    # all ranks positive; degree-3 node 3 outranks the degree-1 tail node 4
    assert all(v > 0 for v in ranks.values())
    assert ranks[3] > ranks[4]
    # symmetric pair 10-11 must tie exactly (integer arithmetic)
    assert ranks[10] == ranks[11]
    # total mass stays within [0.8, 1.05] of SCALE (integer floor leaks a
    # little mass; teleport re-injects it)
    total = sum(ranks.values())
    assert 0.8 * PR_SCALE < total < 1.05 * PR_SCALE
