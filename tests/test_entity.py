"""Entity-resolution operators (operators/entity.py): blocking semantics
and banded-threshold equivalence on crafted dictionaries, plus cluster
partition invariants at smoke scale (value correctness vs DuckDB is the
driver sim's job)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _dict_df(spark, names):
    return spark.createDataFrame(
        [(n, i + 1) for i, n in enumerate(names)], "name string, n_parts long"
    )


def test_fuzzy_pairs_blocking_and_distance(spark):
    """Pairs are canonical (name_a < name_b), carry true edit distance,
    and appear iff SOME pass co-blocks them: 'red bolt'/'hot bolt' share
    the last word (dist 3, kept), 'red bolt'/'red gear' the first (dist 4,
    over threshold, dropped), 'wild card'/'tame deck' share nothing —
    never compared even though someone might want them."""
    from edgy_spark.operators.entity import fuzzy_name_pairs

    names = _dict_df(spark, ["red bolt", "hot bolt", "red gear", "wild card", "tame deck"])
    got = {
        (r.name_a, r.name_b): (r.dist, r.parts_a, r.parts_b)
        for r in fuzzy_name_pairs(names).collect()
    }
    assert got == {("hot bolt", "red bolt"): (3, 2, 1)}


def test_fuzzy_pairs_threshold_matches_plain_filter(spark):
    """The banded levenshtein(-1 past cap) path must equal the naive
    compute-then-filter form on the real dictionary."""
    from edgy_spark.operators.entity import ER_MAX_DIST, fuzzy_name_pairs

    from edgy_spark.sources import load

    names = (
        load(spark, SF_SMOKE, "part")
        .groupBy(F.col("p_name").alias("name"))
        .agg(F.count("*").alias("n_parts"))
    )
    banded = {
        (r.name_a, r.name_b, r.dist) for r in fuzzy_name_pairs(names).collect()
    }
    plain = fuzzy_name_pairs(names, max_dist=100).filter(
        F.col("dist") <= ER_MAX_DIST
    )
    assert banded == {(r.name_a, r.name_b, r.dist) for r in plain.collect()}
    assert banded, "no fuzzy pairs at smoke scale"


def test_fuzzy_clusters_partition_the_dictionary(spark):
    """Clusters partition the distinct-name dictionary: name counts and
    row support sum back to the dictionary totals, and every cluster id
    is itself a dictionary name (the lexicographic minimum reached)."""
    from edgy_spark.operators.entity import er_fuzzy_name_clusters
    from edgy_spark.sources import load

    part = load(spark, SF_SMOKE, "part")
    n_names = part.select("p_name").distinct().count()
    n_rows = part.count()
    all_names = {r.p_name for r in part.select("p_name").distinct().collect()}

    rows = er_fuzzy_name_clusters(spark, SF_SMOKE).collect()
    assert sum(r.n_names for r in rows) == n_names
    assert sum(r.n_parts for r in rows) == n_rows
    assert all(r.cluster_id in all_names for r in rows)
    # singleton names (no fuzzy neighbor) must survive as their own cluster
    assert min(all_names) in {r.cluster_id for r in rows}
