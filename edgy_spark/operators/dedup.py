"""Deduplication operators over ``documents`` / ``embeddings`` (north-star
LLM-pipeline scope; no reference counterpart).

Scale design:
- exact dedup: hash-groupBy — one shuffle on a 16-byte key, no text moves.
- n-gram Jaccard: shingle → explode → inverted-index self-join on shingle →
  per-pair intersection counts.  The join key is the shingle hash, so the
  shuffle carries (hash, doc_id) pairs, never documents; hot shingles are
  the skew risk and AQE skew-join splits them.
- MinHash+LSH: per-doc signature via k md5-derived hash functions (one
  explode + groupBy-min), banded into buckets; candidate pairs only join
  within a bucket — the classic sub-quadratic near-dup path.
- SimHash: 60-bit weighted bit-vote fingerprint; near-dups = small Hamming
  distance, bucketed by fingerprint chunks.
- embedding near-dup: double-precision cosine on a blocked pair join.

All hashes are md5-derived (functions/hashing.h60) so every stage is
bit-reproducible in the DuckDB oracle — including the full MinHash/LSH
pipeline, which is expressed twice end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from edgy_spark.catalog import register
from edgy_spark.functions.hashing import h60, h60_sql
from edgy_spark.functions.vectors import cosine_similarity
from edgy_spark.sources import load

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

@register(
    "dedup_exact_groups",
    oracle="""
    SELECT fp AS normalized_fp, COUNT(*) AS n_copies, MIN(doc_id) AS keeper_doc_id
    FROM (SELECT doc_id,
                 md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp
          FROM documents)
    GROUP BY fp
    HAVING COUNT(*) >= 1
    ORDER BY normalized_fp
    """,
    tags=("dedup", "exact"),
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (normalized) dedup via hash-groupBy; keeper = min doc_id.
    At 100 TB: shuffle moves 16-byte digests, not documents."""
    d = load(spark, sf_dir, "documents")
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    return (
        d.select("doc_id", F.md5(norm.cast("binary")).alias("normalized_fp"))
        .groupBy("normalized_fp")
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min("doc_id").alias("keeper_doc_id"))
        .orderBy("normalized_fp")
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup (inverted-index join)
# ---------------------------------------------------------------------------

_SHINGLES_SQL = """
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(w) - 2, 0) + 1),
           i -> array_to_string(w[i:i+2], ' '))) AS shingles
  FROM (SELECT doc_id,
               regexp_split_to_array(lower(trim(text)), '\\s+') AS w
        FROM documents)
"""

@register(
    "dedup_ngram_jaccard_pairs",
    oracle=f"""
    WITH sh AS ({_SHINGLES_SQL}),
    ex AS (SELECT doc_id, unnest(shingles) AS s, len(shingles) AS n FROM sh),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             COUNT(*) AS n_common, ANY_VALUE(a.n) AS n_a, ANY_VALUE(b.n) AS n_b
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT doc_a, doc_b,
           CAST(n_common AS DOUBLE) / (n_a + n_b - n_common) AS jaccard
    FROM common
    WHERE CAST(n_common AS DOUBLE) / (n_a + n_b - n_common) >= 0.5
    ORDER BY doc_a, doc_b
    """,
    tags=("dedup", "jaccard"),
    bench=True,
)
def dedup_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-word-shingle Jaccard near-dup pairs (τ=0.5) via inverted-index
    self-join — shingle → explode → join on shingle → count/union."""
    d = load(spark, sf_dir, "documents")
    words = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(words) - 2, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(words, i, 3)),
        )
    )
    sh = d.select("doc_id", shingles.alias("shingles")).select(
        "doc_id", F.explode("shingles").alias("s"), F.size("shingles").alias("n")
    )
    a = sh.select(F.col("doc_id").alias("doc_a"), "s", F.col("n").alias("n_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), "s", F.col("n").alias("n_b"))
    common = (
        a.join(b, "s")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.any_value(F.col("n_a")).alias("na"),
            F.any_value(F.col("n_b")).alias("nb"),
        )
    )
    jac = F.col("n_common").cast("double") / (F.col("na") + F.col("nb") - F.col("n_common"))
    return (
        common.select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.5)
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH (fully oracle-replicated, md5-derived hash family)
# ---------------------------------------------------------------------------

N_HASHES = 16
N_BANDS = 4  # rows per band = 4 → catches jaccard ≳ 0.5 with good recall

_MINHASH_SQL = f"""
  WITH sh AS ({_SHINGLES_SQL}),
  ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh WHERE len(shingles) > 0),
  sig AS (
    SELECT doc_id, h.i AS i, MIN({h60_sql("h.i || ':' || ex.s")}) AS mh
    FROM ex, (SELECT unnest(range({N_HASHES})) AS i) h
    GROUP BY doc_id, h.i),
  bands AS (
    SELECT doc_id, i // {N_HASHES // N_BANDS} AS band,
           string_agg(mh::VARCHAR, ',' ORDER BY i) AS bucket_key
    FROM sig GROUP BY doc_id, i // {N_HASHES // N_BANDS})
"""

@register(
    "dedup_minhash_lsh_pairs",
    oracle=f"""
    {_MINHASH_SQL}
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.bucket_key = b.bucket_key
         AND a.doc_id < b.doc_id
    ORDER BY doc_a, doc_b
    """,
    tags=("dedup", "minhash", "lsh"),
    bench=True,
)
def dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH candidate pairs: shingle→minhash(16)→band(4)→bucket join.

    Sub-quadratic at scale: only docs sharing a band bucket ever meet.  The
    md5-derived hash family makes the whole pipeline bit-reproducible in the
    oracle (same signatures, same buckets, same pairs).
    """
    d = load(spark, sf_dir, "documents")
    words = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(words) - 2, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(words, i, 3)),
        )
    )
    ex = (
        d.select("doc_id", shingles.alias("shingles"))
        .filter(F.size("shingles") > 0)
        .select("doc_id", F.explode("shingles").alias("s"))
    )
    hashes = spark.range(N_HASHES).select(F.col("id").alias("i"))
    sig = (
        ex.crossJoin(F.broadcast(hashes))
        .select(
            "doc_id",
            "i",
            h60(F.concat(F.col("i").cast("string"), F.lit(":"), F.col("s"))).alias("h"),
        )
        .groupBy("doc_id", "i")
        .agg(F.min("h").alias("mh"))
    )
    rows_per_band = N_HASHES // N_BANDS
    bands = (
        sig.withColumn("band", (F.col("i") / rows_per_band).cast("long"))
        .groupBy("doc_id", "band")
        .agg(
            F.concat_ws(
                ",", F.transform(F.array_sort(
                    F.collect_list(F.struct("i", "mh"))
                ), lambda x: x["mh"].cast("string"))
            ).alias("bucket_key")
        )
    )
    a = bands.select(F.col("doc_id").alias("doc_a"), "band", "bucket_key")
    b = bands.select(F.col("doc_id").alias("doc_b"), "band", "bucket_key")
    return (
        a.join(b, ["band", "bucket_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

N_SIMHASH_BITS = 32

@register(
    "dedup_simhash_fingerprints",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, unnest(list_distinct(
               regexp_split_to_array(lower(trim(text)), '\\s+'))) AS word
      FROM documents),
    h AS (SELECT doc_id, {h60_sql("word")} AS hw FROM w),
    bits AS (
      SELECT doc_id, b.i AS bit,
             SUM(CASE WHEN (hw >> b.i) & 1 = 1 THEN 1 ELSE -1 END) AS vote
      FROM h, (SELECT unnest(range({N_SIMHASH_BITS})) AS i) b
      GROUP BY doc_id, b.i)
    SELECT doc_id,
           SUM(CASE WHEN vote > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS simhash
    FROM bits GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("dedup", "simhash"),
)
def dedup_simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per document (bit-vote over word hashes); near-dups
    have small Hamming distance — compare with bit_count(xor) downstream."""
    d = load(spark, sf_dir, "documents")
    words = F.array_distinct(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
    w = d.select("doc_id", F.explode(words).alias("word"))
    h = w.select("doc_id", h60(F.col("word")).alias("hw"))
    bits = spark.range(N_SIMHASH_BITS).select(F.col("id").alias("bit"))
    votes = (
        h.crossJoin(F.broadcast(bits))
        .groupBy("doc_id", "bit")
        .agg(
            F.sum(
                F.when(F.expr("shiftright(hw, cast(bit as int)) % 2 = 1"), 1)
                .otherwise(-1)
            ).alias("vote")
        )
    )
    return (
        votes.groupBy("doc_id")
        .agg(
            F.sum(
                F.when(
                    F.col("vote") > 0,
                    F.expr("shiftleft(cast(1 as bigint), cast(bit as int))"),
                ).otherwise(F.lit(0).cast("long"))
            ).alias("simhash")
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------

_COS_SQL = """
  list_sum(list_transform(list_zip(a.embedding, b.embedding),
           p -> p[1]::DOUBLE * p[2]::DOUBLE))
  / (sqrt(list_sum(list_transform(a.embedding, x -> x::DOUBLE * x::DOUBLE)))
     * sqrt(list_sum(list_transform(b.embedding, x -> x::DOUBLE * x::DOUBLE))))
"""

@register(
    "dedup_embedding_neardup_pairs",
    oracle=f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, {_COS_SQL} AS cos_sim
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {_COS_SQL} >= 0.9
    ORDER BY vec_a, vec_b
    """,
    tags=("dedup", "embedding"),
)
def dedup_embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicates: cosine ≥ 0.9 within label blocks.

    Blocking on ``label`` stands in for an ANN/IVF partition at scale — the
    pair join is per-block, not global.  Double-precision JVM fold matches
    the oracle bit-for-bit (see functions/vectors).
    """
    e = load(spark, sf_dir, "embeddings")
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("label"), F.col("embedding").alias("ea"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("label"), F.col("embedding").alias("eb"))
    sim = cosine_similarity(F.col("ea"), F.col("eb"))
    return (
        a.join(b, "label")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", sim.alias("cos_sim"))
        .filter(F.col("cos_sim") >= 0.9)
        .orderBy("vec_a", "vec_b")
    )
