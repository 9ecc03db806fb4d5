"""Similarity search over the ``embeddings`` table (north-star scope).

Two paths, both pure JVM-side expressions (F.zip_with/F.aggregate folds —
no Python UDF in the scoring loop):

- brute-force cosine top-k: the correctness baseline; a (queries × corpus)
  join + per-query window top-k.  At 100 TB the query side is small and
  broadcast, so the corpus is scanned once, embarrassingly parallel.
- random-hyperplane LSH ANN: 16-bit signatures from md5-derived
  pseudo-random planes; candidates share a signature bucket, then exact
  re-rank inside the bucket.  Sub-linear candidate sets at scale; recall
  is checked against brute force in tests/test_similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from edgy_spark.catalog import register
from edgy_spark.functions.hashing import h60, h60_sql
from edgy_spark.functions.vectors import cosine_similarity, dot
from edgy_spark.sources import load

_COS_SQL = """
  list_sum(list_transform(list_zip(q.embedding, c.embedding),
           p -> p[1]::DOUBLE * p[2]::DOUBLE))
  / (sqrt(list_sum(list_transform(q.embedding, x -> x::DOUBLE * x::DOUBLE)))
     * sqrt(list_sum(list_transform(c.embedding, x -> x::DOUBLE * x::DOUBLE))))
"""


@register(
    "sim_bruteforce_topk",
    oracle=f"""
    SELECT query_id, neighbor_id, cos_sim, rank
    FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {_COS_SQL} AS cos_sim,
             ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                ORDER BY {_COS_SQL} DESC, c.vec_id) AS rank
      FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < 8)
    WHERE rank <= 10
    ORDER BY query_id, rank
    """,
    tags=("similarity", "ann", "topk"),
    bench=True,
)
def sim_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for 8 query vectors — the ANN baseline.

    Scale: queries broadcast; one pass over the corpus; per-query top-k via
    window with rank pushdown (WindowGroupLimit) instead of a global sort.
    """
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce"))
    sim = cosine_similarity(F.col("qe"), F.col("ce"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .orderBy("query_id", "rank")
    )


# -- random-hyperplane LSH --------------------------------------------------
# Signature machinery lives in functions/lsh.py (single source of truth,
# shared with operators.dedup's embedding blocking — importing it never
# triggers catalog registration, keeping insertion order deterministic).

from edgy_spark.functions.lsh import hyperplane_signature, sig_sql as _sig_sql  # noqa: E402


@register(
    "sim_lsh_bucket_candidates",
    oracle=f"""
    WITH sig AS {_sig_sql()}
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
    FROM sig a JOIN sig b ON a.sig = b.sig AND a.vec_id < b.vec_id
    ORDER BY vec_a, vec_b
    """,
    tags=("similarity", "ann", "lsh"),
)
def sim_lsh_bucket_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH: 12-bit sign signatures → same-bucket candidate
    pairs.  The signature is 12 in-row array folds over literal plane
    coefficients — zero shuffles to compute, one shuffle to bucket-join.
    Sub-quadratic ANN scale path; exact re-rank happens inside buckets.
    """
    e = load(spark, sf_dir, "embeddings")
    sig = e.select("vec_id", hyperplane_signature().alias("sig"))
    a = sig.select(F.col("vec_id").alias("vec_a"), "sig")
    b = sig.select(F.col("vec_id").alias("vec_b"), "sig")
    return (
        a.join(b, "sig")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .orderBy("vec_a", "vec_b")
    )


# -- IVF (inverted-file) ANN ------------------------------------------------

K_CELLS = 16   # coarse cells; production: sqrt(N) k-means centroids
N_PROBE = 4    # cells searched per query
N_QUERIES = 8
TOP_K = 10


def _cos2(x: str, y: str) -> str:
    return f"""
      list_sum(list_transform(list_zip({x}, {y}), p -> p[1]::DOUBLE * p[2]::DOUBLE))
      / (sqrt(list_sum(list_transform({x}, v -> v::DOUBLE * v::DOUBLE)))
         * sqrt(list_sum(list_transform({y}, v -> v::DOUBLE * v::DOUBLE))))
    """


@register(
    "sim_ivf_topk",
    oracle=f"""
    WITH cent AS (
      SELECT vec_id AS cell, embedding AS cemb FROM embeddings WHERE vec_id < {K_CELLS}),
    asg AS (
      SELECT vec_id, cell FROM (
        SELECT e.vec_id, c.cell,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_cos2('e.embedding', 'c.cemb')} DESC, c.cell) AS rn
        FROM embeddings e CROSS JOIN cent c) WHERE rn = 1),
    probe AS (
      SELECT query_id, cell FROM (
        SELECT q.vec_id AS query_id, c.cell,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                  ORDER BY {_cos2('q.embedding', 'c.cemb')} DESC, c.cell) AS rn
        FROM embeddings q CROSS JOIN cent c WHERE q.vec_id < {N_QUERIES}) WHERE rn <= {N_PROBE}),
    scored AS (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             {_cos2('q.embedding', 'n.embedding')} AS cos_sim,
             ROW_NUMBER() OVER (PARTITION BY p.query_id
                                ORDER BY {_cos2('q.embedding', 'n.embedding')} DESC,
                                         a.vec_id) AS rank
      FROM probe p
      JOIN asg a ON a.cell = p.cell AND a.vec_id <> p.query_id
      JOIN embeddings q ON q.vec_id = p.query_id
      JOIN embeddings n ON n.vec_id = a.vec_id)
    SELECT query_id, neighbor_id, cos_sim, rank
    FROM scored WHERE rank <= {TOP_K}
    ORDER BY query_id, rank
    """,
    tags=("similarity", "ann", "ivf"),
)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN top-k: coarse-quantize the corpus into K_CELLS cells,
    search only each query's N_PROBE nearest cells, exact cosine re-rank
    inside them.

    Cells here are seeded deterministically by the first K_CELLS vectors
    (so the whole pipeline — assignment, probing, ranking — is replicated
    bit-for-bit in the oracle); a production deployment would swap in
    k-means centroids without touching the query path.

    Scale: centroids broadcast everywhere.  Cell assignment is a broadcast
    nested-loop + map-side partial max_by — the ONE wide shuffle carries a
    single (vec_id, cell) row per vector.  Queries probe N_PROBE/K_CELLS
    of the corpus (~25% here; ~sqrt(N) cells at production K), making the
    scan per query sub-linear — the classic IVF trade: recall vs probes is
    checked in tests/test_similarity.py.
    """
    e = load(spark, sf_dir, "embeddings")
    cent = e.filter(F.col("vec_id") < K_CELLS).select(
        F.col("vec_id").alias("cell"), F.col("embedding").alias("cemb")
    )
    cs = cosine_similarity(F.col("embedding"), F.col("cemb"))
    # argmax(cos, tie -> smallest cell) via struct-ordered max_by: same
    # selection the oracle's ROW_NUMBER(ORDER BY cos DESC, cell) makes
    asg = (
        e.crossJoin(F.broadcast(cent))
        .groupBy("vec_id")
        .agg(
            F.max_by(
                "cell", F.struct(cs.alias("cs"), (-F.col("cell")).alias("nc"))
            ).alias("cell")
        )
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qemb")
    )
    qcs = cosine_similarity(F.col("qemb"), F.col("cemb"))
    wprobe = Window.partitionBy("query_id").orderBy(F.desc("qc"), F.asc("cell"))
    probe = (
        q.crossJoin(F.broadcast(cent))
        .select("query_id", "qemb", "cell", qcs.alias("qc"))
        .withColumn("rn", F.row_number().over(wprobe))
        .filter(F.col("rn") <= N_PROBE)
        .select("query_id", "qemb", "cell")
    )
    n = e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("nemb"))
    sim = cosine_similarity(F.col("qemb"), F.col("nemb"))
    wrank = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        F.broadcast(probe)
        .join(asg.withColumnRenamed("vec_id", "neighbor_id"), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .join(n, "neighbor_id")
        .select("query_id", "neighbor_id", sim.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(wrank))
        .filter(F.col("rank") <= TOP_K)
        .orderBy("query_id", "rank")
    )
