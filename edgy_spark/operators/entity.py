"""Entity resolution — fuzzy string matching with blocking.

The record-linkage step every training-data pipeline runs against entity
dictionaries (author names, site titles, product strings): find name
pairs that are probably the same entity despite typos/variants, then
link them into clusters.  The reference's closest surface is the
scan+filter+assert-unique name lookup (/root/reference/app/Main.hs:124-133,
exact match only); this module adds the approximate form.

Design for 100 TB:
- ER runs on the DISTINCT-name dictionary, never the fact rows — the
  dictionary's cardinality is orders of magnitude below the corpus
  (64 distinct part names at any SF here; author/product dictionaries
  plateau the same way), so the expensive pairwise step is bounded by
  vocabulary, not data volume.
- Candidate generation is multi-pass BLOCKING (by first word, by last
  word — union of passes), the standard ER recipe: a pair is compared
  only if some pass co-blocks it, so there is never an all-pairs join.
  Misses are only pairs agreeing on NO blocking key — the documented
  trade of every blocking scheme.
- The comparison is Spark's JVM-side ``levenshtein`` with the THRESHOLD
  argument: the banded DP short-circuits to -1 once the distance
  provably exceeds the cap, turning O(len^2) into O(len*cap) per pair —
  the right shape when blocks are occasionally large.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from edgy_spark.catalog import register
from edgy_spark.sources import load

#: Maximum edit distance for a candidate match.
ER_MAX_DIST = 3
#: Hop cap for the recursive fuzzy-closure clustering (vocabulary-sized
#: graphs here have tiny diameters; both engines run the same cap, so the
#: semantics — "linked within ER_CLUSTER_HOPS fuzzy hops" — are identical).
ER_CLUSTER_HOPS = 6

_FIRST_WORD = r"^(\S+)"
_LAST_WORD = r"(\S+)$"


def fuzzy_name_pairs(names: DataFrame, max_dist: int = ER_MAX_DIST) -> DataFrame:
    """Blocked fuzzy self-join over a (name, n_rows) dictionary: emit
    canonical (name_a < name_b) pairs within ``max_dist`` edits that share
    a first- or last-word blocking key."""
    keyed = names.select(
        "name", "n_parts", F.regexp_extract("name", _FIRST_WORD, 1).alias("bkey")
    ).unionAll(
        names.select(
            "name", "n_parts", F.regexp_extract("name", _LAST_WORD, 1).alias("bkey")
        )
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.name") < F.col("b.name")),
        )
        .select(
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
            F.col("a.n_parts").alias("parts_a"),
            F.col("b.n_parts").alias("parts_b"),
        )
        .distinct()
    )
    # banded DP: -1 when the distance provably exceeds max_dist
    dist = F.levenshtein("name_a", "name_b", max_dist)
    return (
        pairs.withColumn("dist", dist.cast("long"))
        .filter(F.col("dist") >= 0)
        .select("name_a", "name_b", "dist", "parts_a", "parts_b")
    )


@register(
    "er_fuzzy_part_name_pairs",
    oracle=rf"""
    WITH names AS (
      SELECT p_name AS name, COUNT(*) AS n_parts FROM part GROUP BY p_name
    ),
    keyed AS (
      SELECT name, n_parts, regexp_extract(name, '^(\S+)', 1) AS bkey FROM names
      UNION ALL
      SELECT name, n_parts, regexp_extract(name, '(\S+)$', 1) AS bkey FROM names
    ),
    pairs AS (
      SELECT DISTINCT a.name AS name_a, b.name AS name_b,
             a.n_parts AS parts_a, b.n_parts AS parts_b
      FROM keyed a JOIN keyed b ON a.bkey = b.bkey AND a.name < b.name
    )
    SELECT name_a, name_b,
           CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist,
           parts_a, parts_b
    FROM pairs
    WHERE levenshtein(name_a, name_b) <= {ER_MAX_DIST}
    ORDER BY name_a, name_b
    """,
    tags=("entity-resolution", "fuzzy-join", "blocking"),
)
def er_fuzzy_part_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy duplicate-name candidates over the part-name dictionary:
    multi-pass blocking (first word, last word) then banded-threshold
    Levenshtein <= {ER_MAX_DIST}, each pair carrying both names' row
    support (the weight a merge decision needs).

    Scale: the dictionary aggregate is the only pass over the fact table
    (map-side combinable groupBy); everything after runs on vocabulary
    cardinality.  The oracle mirrors the blocking exactly, so the gate
    checks the real candidate set, not just the survivors.
    """
    names = (
        load(spark, sf_dir, "part")
        .groupBy(F.col("p_name").alias("name"))
        .agg(F.count("*").alias("n_parts"))
    )
    return fuzzy_name_pairs(names).orderBy("name_a", "name_b")


# Fuzzy clustering: link pairs into entities via recursive closure.  The
# SAME ANSI text runs on Spark and the DuckDB oracle (the recursive.py
# pattern): undirected fuzzy edges, bounded-hop reachability, cluster id
# = MIN(name) reached — a deterministic union-find substitute that both
# engines execute independently.
_CLUSTER_SQL = rf"""
WITH RECURSIVE
  names AS (
    SELECT p_name AS name, COUNT(*) AS n_parts FROM {{part}} GROUP BY p_name
  ),
  keyed AS (
    SELECT name, regexp_extract(name, '^(\S+)', 1) AS bkey FROM names
    UNION ALL
    SELECT name, regexp_extract(name, '(\S+)$', 1) AS bkey FROM names
  ),
  pairs AS (
    SELECT DISTINCT a.name AS name_a, b.name AS name_b
    FROM keyed a JOIN keyed b ON a.bkey = b.bkey AND a.name < b.name
    WHERE levenshtein(a.name, b.name) <= {ER_MAX_DIST}
  ),
  und AS (
    SELECT name_a AS src, name_b AS dst FROM pairs
    UNION ALL
    SELECT name_b AS src, name_a AS dst FROM pairs
  ),
  reach AS (
    SELECT name AS start, name AS node, 0 AS lvl FROM names
    UNION ALL
    SELECT r.start, u.dst, r.lvl + 1
    FROM reach r JOIN und u ON u.src = r.node
    WHERE r.lvl < {ER_CLUSTER_HOPS}
  ),
  clusters AS (
    SELECT start AS name, MIN(node) AS cluster_id FROM reach GROUP BY start
  )
SELECT c.cluster_id,
       COUNT(*) AS n_names,
       CAST(SUM(n.n_parts) AS BIGINT) AS n_parts
FROM clusters c JOIN names n ON n.name = c.name
GROUP BY c.cluster_id
ORDER BY c.cluster_id
"""


@register(
    "er_fuzzy_name_clusters",
    oracle=_CLUSTER_SQL.format(part="part"),
    tags=("entity-resolution", "recursive", "clustering"),
)
def er_fuzzy_name_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity clusters from the fuzzy pairs: names linked within
    {ER_CLUSTER_HOPS} fuzzy hops collapse to one cluster (id = the
    lexicographic minimum name reached), each cluster reporting its
    variant count and total row support — the output a canonicalization
    step consumes.

    Runs the SAME recursive SQL on both engines (operators/recursive.py's
    pattern).  Scale: the closure iterates over the vocabulary-sized
    fuzzy graph (avg degree ~3 here), not the corpus; for dictionaries
    big enough to need checkpointed iteration, connected_components on
    run_fixpoint is the escape hatch (operators/graph_algos.py).
    """
    load(spark, sf_dir, "part").createOrReplaceTempView("_er_part")
    return spark.sql(_CLUSTER_SQL.format(part="_er_part"))
