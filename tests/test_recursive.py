"""WITH RECURSIVE operators (operators/recursive.py): Spark's recursive
CTE semantics pinned on crafted graphs, plus the two catalog queries'
structural invariants at the smoke scale (value-level correctness vs
DuckDB's independent recursive executor is the driver sim's job)."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def test_recursion_cycle_cap_and_min_level(spark):
    """The cyclic-input idiom the reach query relies on: a 3-cycle with a
    depth cap terminates, and MIN(lvl) yields true BFS levels even though
    UNION ALL re-visits nodes along longer paths."""
    spark.sql(
        "SELECT * FROM VALUES (1,2),(2,3),(3,1),(2,4) AS t(src, dst)"
    ).createOrReplaceTempView("_cyc_edges")
    rows = spark.sql(
        """
        WITH RECURSIVE r AS (
          SELECT 1 AS node, 0 AS lvl
          UNION ALL
          SELECT e.dst, r.lvl + 1
          FROM r JOIN _cyc_edges e ON e.src = r.node
          WHERE r.lvl < 6
        )
        SELECT node, MIN(lvl) AS lvl FROM r GROUP BY node ORDER BY node
        """
    ).collect()
    assert [(r.node, r.lvl) for r in rows] == [(1, 0), (2, 1), (3, 2), (4, 2)]


def test_hierarchy_rollup_conserves_revenue(spark):
    """Each level of the forest partitions the one below it, so total
    subtree revenue must be identical across the region, nation, and
    customer levels, and every parent's descendant count must equal the
    sum over its children."""
    from edgy_spark.operators.recursive import recursive_hierarchy_rollup

    rows = recursive_hierarchy_rollup(spark, SF_SMOKE).collect()
    assert rows, "empty rollup"
    by_level: dict[str, list] = {"R": [], "N": [], "C": []}
    for r in rows:
        by_level[r.node_id[0]].append(r)
    totals = {
        lvl: round(sum(r.subtree_revenue for r in rs), 2)
        for lvl, rs in by_level.items()
        if rs
    }
    assert len(set(totals.values())) == 1, totals
    counts = {
        lvl: sum(r.n_buying_descendants for r in rs)
        for lvl, rs in by_level.items()
        if rs
    }
    assert len(set(counts.values())) == 1, counts
    # customer-level "subtrees" are the leaves themselves
    assert all(r.n_buying_descendants == 1 for r in by_level["C"])


def test_copurchase_reach_contains_seeds_at_level_zero(spark):
    """Every root reaches itself at level 0, the capped eccentricity never
    exceeds the hop cap, and counts are consistent with the hop sums."""
    from edgy_spark.operators.recursive import (
        REACH_MAX_HOPS,
        recursive_copurchase_reach,
    )

    rows = recursive_copurchase_reach(spark, SF_SMOKE).collect()
    assert rows, "no seeds reached anything (fixture too small?)"
    for r in rows:
        assert r.root % 41 == 0
        assert r.n_reached >= 1  # the seed itself, at hops 0
        assert 0 <= r.eccentricity_capped <= REACH_MAX_HOPS
        # sum of min-hops over n_reached nodes, one of which is hops 0
        assert r.total_min_hops <= (r.n_reached - 1) * REACH_MAX_HOPS
