r"""Deduplication operators over ``documents`` / ``embeddings`` (north-star
LLM-pipeline scope; no reference counterpart).

Scale design:
- exact dedup: hash-groupBy — one shuffle on a 16-byte key, no text moves.
- n-gram Jaccard: shingle → explode → group by shingle-hash → emit pairs per
  posting list → per-pair intersection counts.  The shuffle carries
  (hash, doc_id) pairs, never documents; the posting-list groupBy computes
  the shingle pipeline ONCE (a self-join would execute it twice).
  Stop-shingles are dropped by a document-frequency cap (JACC_MAX_DF,
  same pattern as the containment operator's CONT_MAX_DF) so no posting
  list's pair explosion exceeds one bounded task (AQE splits shuffles,
  not a single row's generator output).  The cap is applied identically
  in the oracle, since dropping ubiquitous shingles changes which rare
  pairs retain evidence; per-doc denominators move with it so the capped
  metric stays internally consistent.
- MinHash+LSH: 2 md5-derived base hashes per shingle expanded into a
  k=16 family by double hashing (Kirsch–Mitzenhacher: h1 + i*h2 mod 2^60),
  signatures via ONE groupBy(doc_id) with 16 min() aggregates (map-side
  partial — no k-fold row explosion), banded into buckets; candidate pairs
  emitted per bucket — the classic sub-quadratic near-dup path.
- SimHash: 32-bit weighted bit-vote fingerprint; near-dups = small Hamming
  distance, bucketed by fingerprint chunks.
- embedding near-dup: double-precision cosine on a blocked pair join.

Shingling uses zip_with over three shifted word arrays — linear per doc.
(A transform(sequence, i -> slice(words, i, 3)) formulation is O(len^2)
because each slice re-copies; measured 4x slower.)

All hashes are md5-derived (functions/hashing.h60) so every stage is
bit-reproducible in the DuckDB oracle — including the full MinHash/LSH
pipeline, which is expressed twice end-to-end.

Tokenization contract, stated: word splitting uses ``\s+`` in both
engines, whose character classes agree on the fixture corpus (space, tab,
newline, CR) but NOT on every Unicode/control whitespace — Java's ``\s``
matches vertical tab (U+000B), DuckDB's RE2 does not.  A corpus containing
such characters must be normalized upstream (the PII patterns in
functions/textprep.py show the explicit-character-class alternative) or
the per-row fingerprints can differ between engines for those rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from edgy_spark.catalog import register
from edgy_spark.functions.hashing import h60, h60_sql
from edgy_spark.functions.vectors import cosine_similarity, cosine_sql
from edgy_spark.sources import load

# ---------------------------------------------------------------------------
# embedding-cosine near-dup (self-contained hyperplane-LSH blocking)
# ---------------------------------------------------------------------------

_COS_SQL = cosine_sql("a.embedding", "b.embedding")

# Band layout over functions.lsh.hyperplane_signature()'s 12-bit signature:
# 3 bands x 4 bits.  Candidates share >= 1 band (classic LSH OR-of-ANDs);
# at cos >= 0.95 the per-band collision prob is (1 - theta/pi)^4 ~ 0.65, so
# >=1-of-3 bands fires with p ~ 0.96 (checked by the planted-near-dup test).
# A production corpus raises N_PLANES/band width (e.g. 64 planes, 4x16-bit
# bands -> 65k buckets per band) without touching the query shape.
EMB_N_BANDS = 3
EMB_BAND_BITS = 4
# The synthetic fixture has no true near-duplicates (max pair cosine ~ 0.51
# at sf0.01), so the registered query uses tau=0.3 to exercise the full
# blocking + re-rank path on non-empty output; embedding_neardup_pairs()
# defaults to the production threshold 0.9.
EMB_FIXTURE_TAU = 0.3


def _emb_pair_ctes(tau: float) -> str:
    """Oracle CTE chain mirroring the Spark blocking bit-for-bit:
    12-bit signature → band keys → distinct same-band pairs → exact cosine."""
    from edgy_spark.functions.lsh import sig_sql as _sig_sql

    mask = (1 << EMB_BAND_BITS) - 1
    return f"""
    esig AS {_sig_sql()},
    ebands AS (
      SELECT vec_id, b.band, (sig >> (b.band * {EMB_BAND_BITS})) & {mask} AS key
      FROM esig, (SELECT unnest(range({EMB_N_BANDS})) AS band) b),
    ecand AS (
      SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
      FROM ebands x JOIN ebands y
        ON x.band = y.band AND x.key = y.key AND x.vec_id < y.vec_id),
    epairs AS (
      SELECT vec_a, vec_b, {_COS_SQL} AS cos_sim
      FROM ecand
      JOIN embeddings a ON a.vec_id = vec_a
      JOIN embeddings b ON b.vec_id = vec_b
      WHERE {_COS_SQL} >= {tau})
"""


def embedding_neardup_pairs(
    spark: SparkSession,
    sf_dir: str,
    tau: float = 0.9,
    n_bands: int = EMB_N_BANDS,
    band_bits: int = EMB_BAND_BITS,
) -> DataFrame:
    """Embedding near-duplicates with self-contained LSH blocking: slice the
    random-hyperplane signature (functions.lsh.hyperplane_signature) into
    ``n_bands`` bit-bands, emit candidate pairs per band bucket, exact-cosine
    re-rank, keep pairs with cosine >= ``tau``.

    No ground-truth column is consulted — this runs on any corpus with an
    ``embedding`` column.  Scale: the signature is 12 in-row folds (zero
    shuffles); banding shuffles (band, key, vec_id) triples only; embeddings
    are re-joined ONLY for surviving candidate pairs, so the all-pairs join
    never materializes.  Same posting-list pair emission as the MinHash path
    (single scan of the bucket table, no self-join).
    """
    from edgy_spark.functions.lsh import hyperplane_signature

    e = load(spark, sf_dir, "embeddings")
    from edgy_spark.functions.lsh import N_PLANES

    if n_bands * band_bits > N_PLANES:
        # the signature is exactly N_PLANES bits; bands beyond it would
        # read a constant 0 key, collapsing every vector into ONE bucket
        # — the quadratic blowup this blocking exists to prevent
        raise ValueError(
            f"n_bands*band_bits = {n_bands * band_bits} exceeds the "
            f"{N_PLANES}-bit signature; raise N_PLANES in functions/lsh.py "
            "(and its oracle twin) first"
        )
    mask = (1 << band_bits) - 1
    sig = e.select("vec_id", hyperplane_signature().alias("sig"))
    band_arr = F.array(
        *[
            F.struct(
                F.lit(b).cast("long").alias("band"),
                F.shiftright(F.col("sig"), b * band_bits)
                .bitwiseAND(F.lit(mask))
                .alias("key"),
            )
            for b in range(n_bands)
        ]
    )
    bands = sig.select("vec_id", F.explode(band_arr).alias("b")).select(
        "vec_id", F.col("b.band").alias("band"), F.col("b.key").alias("key")
    )
    buckets = (
        bands.groupBy("band", "key")
        .agg(F.collect_list("vec_id").alias("vecs"))
        .filter(F.size("vecs") >= 2)
    )
    cand = (
        buckets.select(F.explode("vecs").alias("vec_a"), "vecs")
        .select("vec_a", F.explode("vecs").alias("vec_b"))
        .filter(F.col("vec_a") < F.col("vec_b"))
        .distinct()
    )
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    sim = cosine_similarity(F.col("ea"), F.col("eb"))
    return (
        cand.join(a, "vec_a")
        .join(b, "vec_b")
        .select("vec_a", "vec_b", sim.alias("cos_sim"))
        .filter(F.col("cos_sim") >= tau)
    )


@register(
    "dedup_embedding_neardup_pairs",
    oracle=f"""
    WITH {_emb_pair_ctes(EMB_FIXTURE_TAU)}
    SELECT vec_a, vec_b, cos_sim FROM epairs
    ORDER BY vec_a, vec_b
    """,
    tags=("dedup", "embedding", "lsh"),
)
def dedup_embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs over hyperplane-signature band blocking —
    see :func:`embedding_neardup_pairs`.  Registered at the fixture
    threshold (EMB_FIXTURE_TAU) so the oracle row is non-trivial on the
    synthetic corpus; production calls use the 0.9 default.
    """
    return embedding_neardup_pairs(
        spark, sf_dir, tau=EMB_FIXTURE_TAU
    ).orderBy("vec_a", "vec_b")


@register(
    "dedup_embedding_cluster_keepers",
    oracle=f"""
    WITH RECURSIVE {_emb_pair_ctes(EMB_FIXTURE_TAU)},
    und AS (SELECT vec_a AS s, vec_b AS d FROM epairs
            UNION SELECT vec_b, vec_a FROM epairs),
    reach(node, label) AS (
      SELECT s, s FROM (SELECT DISTINCT s FROM und)
      UNION
      SELECT u.d, r.label FROM reach r JOIN und u ON u.s = r.node)
    SELECT node AS vec_id, MIN(label) AS keeper_vec_id
    FROM reach GROUP BY node
    ORDER BY vec_id
    """,
    tags=("dedup", "embedding", "graph", "pipeline"),
)
def dedup_embedding_cluster_keepers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end embedding dedup map: signature-blocked near-dup pairs →
    connected components over the pair graph → per-vector canonical keeper
    (component minimum) — the embedding twin of
    :func:`dedup_minhash_cluster_keepers`, and the shape a real corpus
    dedup ships (transitive near-dup groups collapse to one keeper).

    Scale: the pair graph is a tiny fraction of the corpus (band-colliding,
    cosine-passing pairs only), so CC iterates on a broadcast-sized vertex
    state; the heavy work stays in the one-pass signature/banding pipeline.
    """
    from edgy_spark.operators.graph_algos import connected_components

    pairs = embedding_neardup_pairs(spark, sf_dir, tau=EMB_FIXTURE_TAU)
    edges = pairs.select(F.col("vec_a").alias("src"), F.col("vec_b").alias("dst"))
    comps = connected_components(edges)
    return (
        comps.select(
            F.col("node").alias("vec_id"), F.col("component").alias("keeper_vec_id")
        )
        .orderBy("vec_id")
    )


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
# shared shingling (word 3-grams)
# ---------------------------------------------------------------------------

def _words() -> Column:
    return F.split(F.lower(F.trim(F.col("text"))), r"\s+")


def _shingles() -> Column:
    """Distinct word-3-gram shingles — the distinct view of the positional
    k-gram stream (one shifted-slice construction, shared with the span
    operator's ``_kgrams`` below)."""
    return F.array_distinct(_kgrams(3))


_SHINGLES_SQL = """
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(w) - 2, 0) + 1),
           i -> array_to_string(w[i:i+2], ' '))) AS shingles
  FROM (SELECT doc_id,
               regexp_split_to_array(lower(trim(text)), '\\s+') AS w
        FROM documents)
"""


def _spread(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Rebalance a coarsely-partitioned scan before CPU-heavy per-row work —
    ONLY when the scan is under-parallel.

    The documents table is one small parquet file locally (1 input split);
    shingling is the dominant CPU cost, so a round-robin repartition to the
    session's shuffle width keeps all cores busy.  At 100 TB the scan
    already has thousands of splits, and an unconditional ``repartition``
    would shuffle the ENTIRE text payload once before shingling — pure
    waste, and a violation of this module's "shuffles carry keys, never
    payloads" rule.  So: repartition only when the scan has fewer splits
    than the session's shuffle width (tests/test_properties.py::
    test_spread_is_noop_when_scan_is_wide pins the at-scale no-op).
    """
    target = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup (posting-list pair generation)
# ---------------------------------------------------------------------------

JACC_TAU = 0.5
# Stop-shingle cap: shingles appearing in more than this many documents are
# dropped from the UNIVERSE (numerator and denominators alike).  This is the
# containment operator's CONT_MAX_DF pattern: it bounds every posting list,
# hence every pair-emission bucket runs in one bounded task — the scale
# control the module docstring demands.  Unlike containment, DF=1 shingles
# stay in the universe: they can never pair, but they are real evidence of
# DIFFERENCE and must keep deflating the Jaccard denominator.  Corollary:
# on a corpus with no shingle over the cap (the sf fixtures: max DF = 7 at
# sf0.01) the capped metric equals the exact uncapped Jaccard.
JACC_MAX_DF = 100


@register(
    "dedup_ngram_jaccard_pairs",
    oracle=f"""
    WITH sh AS ({_SHINGLES_SQL}),
    ex AS (SELECT doc_id, {h60_sql('unnest(shingles)')} AS hs FROM sh),
    df AS (SELECT hs FROM ex GROUP BY hs HAVING COUNT(*) <= {JACC_MAX_DF}),
    kept AS (SELECT e.doc_id, e.hs FROM ex e JOIN df USING (hs)),
    nsz AS (SELECT doc_id, COUNT(*) AS n FROM kept GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM kept a JOIN kept b ON a.hs = b.hs AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT doc_a, doc_b,
           CAST(n_common AS DOUBLE) / (na.n + nb.n - n_common) AS jaccard
    FROM common
    JOIN nsz na ON na.doc_id = doc_a
    JOIN nsz nb ON nb.doc_id = doc_b
    WHERE CAST(n_common AS DOUBLE) / (na.n + nb.n - n_common) >= {JACC_TAU}
    ORDER BY doc_a, doc_b
    """,
    tags=("dedup", "jaccard"),
    bench=True,
)
def dedup_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-word-shingle Jaccard near-dup pairs (τ=0.5), stop-shingle capped.

    Inverted-index formulation without a self-join: group (shingle-hash →
    posting list of docs), emit each list's pairs, count per pair.  One pass
    over the shingle pipeline, shuffles carry only (60-bit hash, doc_id) —
    the oracle joins on the same md5-derived hash so both engines see
    identical buckets.

    Scale control: posting lists longer than JACC_MAX_DF (stop-shingles)
    are dropped from the universe — numerator AND denominators, so the
    metric stays internally consistent (two identical boilerplate-heavy
    documents still score 1.0 on their kept shingles, rather than being
    pushed under τ by a denominator that counts evidence the numerator is
    forbidden to use).  Per-doc sizes are therefore recomputed over the
    kept universe (one extra count shuffle), mirroring
    dedup_shingle_containment_pairs.  Every pair-emission bucket is now
    ≤ C(JACC_MAX_DF, 2) rows, so no single task inherits a stop-shingle's
    quadratic explosion — the failure mode the pre-cap version documented
    but did not prevent.

    The old 2× length prefilter is subsumed: J ≥ τ already implies
    kept-sizes within 1/τ of each other, and with bounded buckets there is
    no blowup left for a pre-shuffle prune to save.  (A prefilter on FULL
    sizes would be lossy under the cap: a pair can be 2×-imbalanced in raw
    shingles yet identical on the kept universe.)
    """
    d = _spread(spark, load(spark, sf_dir, "documents"))
    ex = (
        d.select("doc_id", _shingles().alias("sh"))
        .select("doc_id", F.explode("sh").alias("s"))
        .select(h60(F.col("s")).alias("hs"), "doc_id")
    )
    # DF <= cap keeps singletons (they deflate denominators); pair emission
    # below additionally needs >= 2.
    posting = (
        ex.groupBy("hs")
        .agg(F.collect_list("doc_id").alias("docs"))
        .filter(F.size("docs") <= JACC_MAX_DF)
    )
    # NOTE (r14 optimization round): the posting table feeds both the
    # size branch and the pair branch, and only the PRE-aggregation
    # exchange is runtime-reused — each consumer stage re-runs the
    # collect_list aggregation.  Both candidate fixes were tried and
    # MEASURED WORSE: (a) a .repartition(F.col("hs")) barrier is
    # optimized out (the child already satisfies hashpartitioning(hs) at
    # the same width — plan verified unchanged) and a materializing
    # barrier would pin a data-sized table; (b) a single-consumer
    # formulation emitting size markers and pairs from ONE
    # flatten/transform generator into one shared (a, b) exchange
    # regressed 2.68 → 3.71 s at sf0.1 (paired A/B, min of 3): the
    # generator MATERIALIZES each bucket's O(L²) struct array where the
    # double explode streams it, and the count aggregation above the
    # shared exchange re-executes once per consumer anyway.  The
    # duplicated reduce-side agg stands as the cheapest evil.
    nsz = (
        posting.select(F.explode("docs").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    common = (
        posting.filter(F.size("docs") >= 2)
        .select(F.explode("docs").alias("doc_a"), "docs")
        .select("doc_a", F.explode("docs").alias("doc_b"))
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    na = nsz.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    nb = nsz.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("n_common").cast("double") / (F.col("na") + F.col("nb") - F.col("n_common"))
    return (
        common.join(na, "doc_a")
        .join(nb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= JACC_TAU)
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH (fully oracle-replicated, md5-derived double-hash family)
# ---------------------------------------------------------------------------

N_HASHES = 16
N_BANDS = 4  # rows per band = 4 → catches jaccard ≳ 0.5 with good recall
_H2_MOD = 1 << 58  # keep h1 + 15*h2 < 2^63 (no int64 overflow, ANSI-safe)
_MH_MOD = 1 << 60


# shared CTE chain: shingles → double-hash family → in-row signatures →
# band buckets → candidate pairs (used by the pairs query and the cluster op)
_MINHASH_PAIR_CTES = f"""
    sh AS ({_SHINGLES_SQL}),
    ex AS (SELECT doc_id, {h60_sql('unnest(shingles)')} AS h1,
                  {h60_sql("'x' || unnest(shingles)")} % {_H2_MOD} AS h2
           FROM sh WHERE len(shingles) > 0),
    sig AS (
      SELECT doc_id,
             {', '.join(f'MIN((h1 + {i} * h2) % {_MH_MOD}) AS mh{i}' for i in range(N_HASHES))}
      FROM ex GROUP BY doc_id),
    bands AS (
      SELECT doc_id, b.band,
             CASE b.band
               {' '.join(f"WHEN {bi} THEN mh{bi*4}::VARCHAR || ',' || mh{bi*4+1}::VARCHAR || ',' || mh{bi*4+2}::VARCHAR || ',' || mh{bi*4+3}::VARCHAR" for bi in range(N_BANDS))}
             END AS bucket_key
      FROM sig, (SELECT unnest(range({N_BANDS})) AS band) b),
    cand_pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bucket_key = b.bucket_key
           AND a.doc_id < b.doc_id)
"""


@register(
    "dedup_minhash_lsh_pairs",
    oracle=f"""
    WITH {_MINHASH_PAIR_CTES}
    SELECT doc_a, doc_b FROM cand_pairs
    ORDER BY doc_a, doc_b
    """,
    tags=("dedup", "minhash", "lsh"),
    bench=True,
)
def dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH candidate pairs: shingle→minhash(16)→band(4)→bucket pairs.

    Sub-quadratic at scale: only docs sharing a band bucket ever meet.
    The k=16 family derives from TWO md5 hashes per shingle via double
    hashing (h1 + i*h2 mod 2^60) — 2 md5s per shingle instead of 16 — and
    the ENTIRE signature is computed in-row (array_min over zip_with of the
    per-shingle hash arrays): zero shuffles and zero row explosion before
    band bucketing, vs 16x explode + (doc, i) shuffle for the aggregate
    formulation (measured 3x slower) or one giant 16-min groupBy codegen
    method (measured 6x slower).  Pairs come from bucket posting lists, so
    the signature pipeline executes once (a self-join would run it twice).
    Bit-reproducible in the oracle end-to-end.
    """
    return _minhash_pairs(spark, sf_dir).orderBy("doc_a", "doc_b")


def _minhash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, band, bucket_key) LSH band rows for every document with at
    least one shingle — the shared signature pipeline behind the pairs
    query, the cluster-keeper op, and the incremental probe (which joins
    an incoming batch's bands against an index corpus's)."""
    d = _spread(spark, load(spark, sf_dir, "documents"))
    hashed = (
        d.select("doc_id", _shingles().alias("sh"))
        .filter(F.size("sh") > 0)
        .select(
            "doc_id",
            F.transform("sh", lambda s: h60(s)).alias("h1s"),
            F.transform(
                "sh", lambda s: F.pmod(h60(F.concat(F.lit("x"), s)), F.lit(_H2_MOD))
            ).alias("h2s"),
        )
    )
    # whole signature in-row: minhash i = min over shingles of (h1+i*h2)%M.
    # The two md5s per shingle are computed ONCE into h1s/h2s; the 16
    # family members are cheap integer passes over those arrays — no row
    # explosion, no (doc, i) shuffle at all.
    def _mh(i: int):
        return F.array_min(
            F.zip_with("h1s", "h2s", lambda a, b: F.pmod(a + F.lit(i) * b, F.lit(_MH_MOD)))
        ).alias(f"mh{i}")

    mh = [_mh(i) for i in range(N_HASHES)]
    sig = hashed.select("doc_id", *mh)
    rpb = N_HASHES // N_BANDS
    band_structs = F.array(
        *[
            F.struct(
                F.lit(bi).cast("long").alias("band"),
                F.concat_ws(
                    ",", *[F.col(f"mh{bi * rpb + j}").cast("string") for j in range(rpb)]
                ).alias("bucket_key"),
            )
            for bi in range(N_BANDS)
        ]
    )
    return sig.select(
        "doc_id", F.explode(band_structs).alias("b")
    ).select("doc_id", F.col("b.band").alias("band"), F.col("b.bucket_key").alias("bucket_key"))


def _minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unordered LSH candidate pairs (shared by the pairs query and the
    cluster-keeper op, which feeds them into connected components)."""
    bands = _minhash_bands(spark, sf_dir)
    buckets = (
        bands.groupBy("band", "bucket_key")
        .agg(F.collect_list("doc_id").alias("docs"))
        .filter(F.size("docs") >= 2)
    )
    return (
        buckets.select(F.explode("docs").alias("doc_a"), "docs")
        .select("doc_a", F.explode("docs").alias("doc_b"))
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


@register(
    "dedup_minhash_cluster_keepers",
    oracle=f"""
    WITH RECURSIVE {_MINHASH_PAIR_CTES},
    und AS (SELECT doc_a AS s, doc_b AS d FROM cand_pairs
            UNION SELECT doc_b, doc_a FROM cand_pairs),
    reach(node, label) AS (
      SELECT s, s FROM (SELECT DISTINCT s FROM und)
      UNION
      SELECT u.d, r.label FROM reach r JOIN und u ON u.s = r.node)
    SELECT node AS doc_id, MIN(label) AS keeper_doc_id
    FROM reach GROUP BY node
    ORDER BY doc_id
    """,
    tags=("dedup", "minhash", "graph", "pipeline"),
)
def dedup_minhash_cluster_keepers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dup removal map: LSH candidate pairs → connected
    components over the pair graph → per-doc canonical keeper (component
    minimum).  Docs in no candidate pair are their own keeper and are
    omitted (identity rows add nothing).

    This is the capstone composition a pretraining corpus dedup actually
    ships: transitively-connected near-dup groups collapse to ONE keeper
    even when A~B and B~C but A!~C (single-pair filters keep A and C —
    wrong for corpus dedup).

    Scale: the pair graph is orders of magnitude smaller than the corpus
    (only bucket-colliding docs), so the iterative CC runs on a
    broadcast-sized vertex state while the heavy lifting stays in the
    one-pass signature/banding pipeline.  Oracle: same pair CTEs + a
    recursive-CTE transitive closure.
    """
    from edgy_spark.operators.graph_algos import connected_components

    pairs = _minhash_pairs(spark, sf_dir)
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    comps = connected_components(edges)
    return (
        comps.select(F.col("node").alias("doc_id"), F.col("component").alias("keeper_doc_id"))
        .orderBy("doc_id")
    )


#: Incremental split: doc_id % INC_MOD == 0 plays the INCOMING batch, the
#: rest the already-indexed corpus.
INC_MOD = 10


@register(
    "dedup_incremental_new_docs",
    oracle=f"""
    WITH {_MINHASH_PAIR_CTES},
    hits AS (
      SELECT n.doc_id, COUNT(DISTINCT o.doc_id) AS n_index_matches
      FROM bands n JOIN bands o
        ON n.band = o.band AND n.bucket_key = o.bucket_key
           AND o.doc_id % {INC_MOD} <> 0
      WHERE n.doc_id % {INC_MOD} = 0
      GROUP BY n.doc_id)
    SELECT d.doc_id,
           CAST(COALESCE(h.n_index_matches, 0) AS BIGINT) AS n_index_matches,
           h.n_index_matches IS NULL AS kept
    FROM (SELECT doc_id FROM documents WHERE doc_id % {INC_MOD} = 0) d
    LEFT JOIN hits h ON h.doc_id = d.doc_id
    ORDER BY d.doc_id
    """,
    tags=("dedup", "minhash", "incremental", "pipeline"),
    bench=True,
)
def dedup_incremental_new_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup — the production shape: an INCOMING batch
    (doc_id % {INC_MOD} == 0 stands in for today's crawl) is probed
    against the band buckets of the already-INDEXED corpus; a new doc is
    kept only if none of its {N_BANDS} band buckets collides with any
    index doc.  Nothing is recomputed over the index side's pairs — at
    100 TB the index bands are a STORED table maintained append-only
    (each kept batch unions its bands in), so per-batch cost is
    signature(batch) + one equi-join on (band, bucket_key) against the
    bucket table, never a corpus-wide re-dedup; cand_pairs-style
    all-corpus pair emission never runs.  Here both sides derive from
    one documents scan and split by id, which also lets the oracle share
    the exact signature CTEs of dedup_minhash_lsh_pairs.

    Shingle-less docs have no bands, collide with nothing, and are kept —
    the LEFT JOIN from the full incoming id set pins that.
    """
    bands = _minhash_bands(spark, sf_dir)
    incoming = bands.filter(F.col("doc_id") % INC_MOD == 0)
    index = bands.filter(F.col("doc_id") % INC_MOD != 0).select(
        "band", "bucket_key", F.col("doc_id").alias("index_doc_id")
    )
    hits = (
        incoming.join(index, ["band", "bucket_key"])
        .groupBy("doc_id")
        .agg(F.count_distinct("index_doc_id").alias("n_index_matches"))
    )
    all_new = (
        load(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") % INC_MOD == 0)
    )
    return (
        all_new.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_index_matches", F.lit(0)).cast("long").alias("n_index_matches"),
            F.col("n_index_matches").isNull().alias("kept"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

N_SIMHASH_BITS = 64  # Manku et al. (WWW'07) web-scale configuration

# the fingerprint pipeline as a reusable oracle CTE chain (shared by the
# fingerprints query and the banded near-dup pairs).  64 bits come from two
# independent 60-bit md5 hashes (low 32 bits each, the second salted with a
# prefix — the same two-hash trick the minhash family uses at dedup.py:425).
# Bit 63 is the BIGINT sign bit: DuckDB raises on `1::BIGINT << 63`, so that
# term is spelled as the min-long literal; the vote sum stays in range
# because bits 0..62 total at most 2^63 - 1 before the negative term lands.
_SIMHASH_CTES = f"""
    w AS (
      SELECT doc_id, unnest(list_distinct(
               regexp_split_to_array(lower(trim(text)), '\\s+'))) AS word
      FROM documents),
    h AS (SELECT doc_id, {h60_sql("word")} AS hw1,
                 {h60_sql("'x' || word")} AS hw2 FROM w),
    bits AS (
      SELECT doc_id, b.i AS bit,
             SUM(CASE WHEN ((CASE WHEN b.i < 32 THEN hw1 >> b.i
                             ELSE hw2 >> (b.i - 32) END) & 1) = 1
                 THEN 1 ELSE -1 END) AS vote
      FROM h, (SELECT unnest(range({N_SIMHASH_BITS})) AS i) b
      GROUP BY doc_id, b.i),
    fp AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN vote > 0 THEN
                    (CASE WHEN bit = 63 THEN (-9223372036854775807 - 1)
                     ELSE (1::BIGINT << bit) END)
                  ELSE 0 END) AS BIGINT) AS simhash
      FROM bits GROUP BY doc_id)
"""


@register(
    "dedup_simhash_fingerprints",
    oracle=f"""
    WITH {_SIMHASH_CTES}
    SELECT doc_id, simhash FROM fp ORDER BY doc_id
    """,
    tags=("dedup", "simhash"),
)
def dedup_simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document (bit-vote over word hashes, the Manku
    et al. WWW'07 width); near-dups have small Hamming distance — compare
    with bit_count(xor) downstream.

    Two md5-derived 32-bit halves per distinct word, all 64 bit-votes from
    ONE groupBy(doc_id) (map-side partial) — no per-(doc, bit) shuffle.
    """
    return _simhash_fp(spark, sf_dir).orderBy("doc_id")


def _simhash_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, simhash) — the shared fingerprint pipeline (see
    dedup_simhash_fingerprints for the algorithm notes).  Bit 63 is the
    sign bit: its term is the min-long literal, added LAST so the running
    sum of bits 0..62 (at most 2^63 - 1) never overflows under ANSI mode —
    mirrored exactly in the oracle CTE."""
    d = _spread(spark, load(spark, sf_dir, "documents"))
    words = F.array_distinct(_words())
    h = (
        d.select("doc_id", F.explode(words).alias("word"))
        .select(
            "doc_id",
            h60(F.col("word")).alias("hw1"),
            h60(F.concat(F.lit("x"), F.col("word"))).alias("hw2"),
        )
    )
    votes = h.groupBy("doc_id").agg(*[
        F.sum(
            F.when(
                F.expr(
                    f"shiftright(hw1, {i}) % 2 = 1"
                    if i < 32
                    else f"shiftright(hw2, {i - 32}) % 2 = 1"
                ),
                1,
            ).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(N_SIMHASH_BITS)
    ])
    fp = None
    for i in range(N_SIMHASH_BITS):
        const = -(1 << 63) if i == 63 else (1 << i)
        term = F.when(F.col(f"v{i}") > 0, F.lit(const).cast("long")).otherwise(F.lit(0).cast("long"))
        fp = term if fp is None else fp + term
    return votes.select("doc_id", fp.alias("simhash"))


# ---------------------------------------------------------------------------
# shingle containment (subset-duplicate detection)
# ---------------------------------------------------------------------------

CONT_TAU = 0.8   # containment threshold wrt the smaller document
CONT_MAX_DF = 100  # stop-shingle cap: drop shingles appearing in > this many docs


@register(
    "dedup_shingle_containment_pairs",
    oracle=f"""
    WITH sh AS ({_SHINGLES_SQL}),
    ex AS (SELECT doc_id, {h60_sql('unnest(shingles)')} AS hs FROM sh),
    df AS (SELECT hs FROM ex GROUP BY hs
           HAVING COUNT(*) BETWEEN 2 AND {CONT_MAX_DF}),
    kept AS (SELECT e.doc_id, e.hs FROM ex e JOIN df USING (hs)),
    nsz AS (SELECT doc_id, COUNT(*) AS n FROM kept GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM kept a JOIN kept b ON a.hs = b.hs AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT doc_a, doc_b,
           CAST(n_common AS DOUBLE) / na.n AS cont_a,
           CAST(n_common AS DOUBLE) / nb.n AS cont_b
    FROM common
    JOIN nsz na ON na.doc_id = doc_a
    JOIN nsz nb ON nb.doc_id = doc_b
    WHERE GREATEST(CAST(n_common AS DOUBLE) / na.n,
                   CAST(n_common AS DOUBLE) / nb.n) >= {CONT_TAU}
    ORDER BY doc_a, doc_b
    """,
    tags=("dedup", "containment"),
    bench=True,  # r08: the DF-capped dedup pattern, tracked round-over-round
)
def dedup_shingle_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup detection by shingle CONTAINMENT:
    cont(A→B) = |S_A ∩ S_B| / |S_A| — catches a document embedded inside a
    larger one (quotes, boilerplate wrappers, concatenated dumps), which
    symmetric Jaccard misses because the size imbalance caps J at
    |small|/|big|.  Emits unordered pairs whose max-direction containment
    reaches CONT_TAU, with both directions' scores.

    No lossless length prefilter exists for containment (that asymmetry is
    the point), so the scale control is the stop-shingle DF cap: shingles in
    more than CONT_MAX_DF documents are dropped from the universe (both the
    intersection AND the denominators, keeping the metric internally
    consistent) — the classic inverted-index mitigation that bounds every
    posting list, hence every pair-emission bucket.  Shuffles carry
    (60-bit hash, doc_id) only; same posting-list pair emission as the
    Jaccard/MinHash paths, never a self-join of the corpus.
    """
    d = _spread(spark, load(spark, sf_dir, "documents"))
    ex = (
        d.select("doc_id", _shingles().alias("sh"))
        .select("doc_id", F.explode("sh").alias("s"))
        .select("doc_id", h60(F.col("s")).alias("hs"))
    )
    posting = (
        ex.groupBy("hs")
        .agg(F.collect_list("doc_id").alias("docs"))
        .filter((F.size("docs") >= 2) & (F.size("docs") <= CONT_MAX_DF))
    )
    # r14: the single-consumer marker-generator formulation regressed here
    # too (2.91 → 4.11 s at sf0.1, paired A/B — see the NOTE in
    # dedup_ngram_jaccard_pairs); the duplicated posting aggregation stays.
    kept = posting.select(F.explode("docs").alias("doc_id"), "hs")
    nsz = kept.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    common = (
        posting.select(F.explode("docs").alias("doc_a"), "docs")
        .select("doc_a", F.explode("docs").alias("doc_b"))
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    na = nsz.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    nb = nsz.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    cont_a = F.col("n_common").cast("double") / F.col("na")
    cont_b = F.col("n_common").cast("double") / F.col("nb")
    return (
        common.join(na, "doc_a")
        .join(nb, "doc_b")
        .select("doc_a", "doc_b", cont_a.alias("cont_a"), cont_b.alias("cont_b"))
        .filter(F.greatest("cont_a", "cont_b") >= CONT_TAU)
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# benchmark decontamination (broadcast eval-shingle semi-join)
# ---------------------------------------------------------------------------

# Deterministic pseudo-benchmark: every 50th document plays the eval set.
# In production this is a separate (small) benchmark table; the query shape
# is identical — only the eval-side source changes.
DECON_EVAL_MOD = 50
DECON_EVAL_REM = 7
DECON_MIN_OVERLAP = 2


@register(
    "pipeline_decontaminate_overlap",
    oracle=f"""
    WITH sh AS ({_SHINGLES_SQL}),
    ex AS (SELECT doc_id, {h60_sql('unnest(shingles)')} AS hs FROM sh),
    ev AS (SELECT doc_id AS eval_id, hs FROM ex
           WHERE doc_id % {DECON_EVAL_MOD} = {DECON_EVAL_REM}),
    corpus AS (SELECT doc_id, hs FROM ex
               WHERE doc_id % {DECON_EVAL_MOD} != {DECON_EVAL_REM}),
    ov AS (SELECT c.doc_id, e.eval_id, COUNT(*) AS n_overlap
           FROM corpus c JOIN ev e USING (hs) GROUP BY 1, 2)
    SELECT doc_id, eval_id, CAST(n_overlap AS BIGINT) AS n_overlap
    FROM ov WHERE n_overlap >= {DECON_MIN_OVERLAP}
    ORDER BY doc_id, eval_id
    """,
    tags=("pipeline", "dedup", "decontamination"),
)
def pipeline_decontaminate_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing >=
    DECON_MIN_OVERLAP distinct word-3-gram shingles with any eval-set
    document — the standard pre-training hygiene step that removes test-set
    leakage before a model ever sees the corpus.

    100 TB shape: eval benchmarks are MB-sized while the corpus is the
    100 TB side, so the eval shingle hashes are BROADCAST and the corpus's
    exploded shingle stream joins them with no corpus shuffle at all; the
    only exchange is the narrow (doc_id, eval_id) overlap count.  Compare
    the pair-dedup operators above, which must shuffle posting lists —
    decontamination is structurally cheaper because one side is tiny.

    The contaminated doc ids feed an anti-join upstream (drop or quarantine)
    exactly like dedup keeper lists; n_overlap is reported so reviewers can
    tier the response (hard-drop vs flag) by overlap mass.
    """
    d = _spread(spark, load(spark, sf_dir, "documents"))
    ex = (
        d.select("doc_id", F.explode(_shingles()).alias("s"))
        .select("doc_id", h60(F.col("s")).alias("hs"))
    )
    is_eval = (F.col("doc_id") % DECON_EVAL_MOD) == DECON_EVAL_REM
    ev = ex.filter(is_eval).select(F.col("doc_id").alias("eval_id"), "hs")
    corpus = ex.filter(~is_eval)
    return (
        corpus.join(F.broadcast(ev), "hs")
        .groupBy("doc_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .filter(F.col("n_overlap") >= DECON_MIN_OVERLAP)
        .orderBy("doc_id", "eval_id")
    )


# ---------------------------------------------------------------------------
# span-level duplicate detection (substring dedup, Lee et al. 2021 shape)
# ---------------------------------------------------------------------------

SPAN_K = 8  # span = word-8-gram (the fixture's 50-token-span stand-in)


def _kgrams(k: int) -> Column:
    """ALL word-``k``-grams of ``text`` with multiplicity, position order —
    the span stream substring-dedup counts over (``_shingles`` above is the
    distinct 3-gram view of this).  Linear-time: one running concat over
    ``k`` shifted slices via chained ``zip_with`` (a
    ``transform(sequence, i -> slice(...))`` formulation re-copies per
    position — O(len*k) array copies; see module docstring)."""
    w = _words()
    n = F.greatest(F.size(w) - (k - 1), F.lit(0))
    acc = F.slice(w, 1, n)
    for j in range(2, k + 1):
        acc = F.zip_with(
            acc, F.slice(w, j, n), lambda a, b: F.concat(a, F.lit(" "), b)
        )
    return acc


@register(
    "dedup_duplicate_spans",
    oracle=rf"""
    WITH w AS (SELECT doc_id,
                      regexp_split_to_array(lower(trim(text)), '\s+') AS w
               FROM documents),
    g AS (SELECT doc_id,
                 unnest(list_transform(
                   range(1, greatest(len(w) - {SPAN_K - 1}, 0) + 1),
                   i -> array_to_string(w[i:i+{SPAN_K - 1}], ' '))) AS gram
          FROM w),
    per AS (SELECT doc_id, {h60_sql('gram')} AS hs, COUNT(*) AS c
            FROM g GROUP BY 1, 2),
    corpus AS (SELECT hs, SUM(c) AS gcnt FROM per GROUP BY hs)
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_spans,
           CAST(SUM(CASE WHEN gcnt >= 2 THEN c ELSE 0 END) AS BIGINT)
             AS n_dup_spans,
           CAST(SUM(CASE WHEN gcnt >= 2 THEN c ELSE 0 END) AS DOUBLE)
             / SUM(c) AS dup_frac
    FROM per JOIN corpus USING (hs)
    GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("dedup", "spans"),
    bench=True,  # the substring-granularity dedup pattern, tracked per round
)
def dedup_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplication profile per document: how many of a
    document's word-SPAN_K-gram spans (counted at every position, with
    multiplicity) occur more than once in the corpus — across documents OR
    repeated within one.  This is the span-granularity dedup of
    "Deduplicating Training Data Makes Language Models Better" (Lee et al.
    2021) re-expressed relationally: their suffix-array pass finds repeated
    substrings; a fixed-k span stream finds the same mass with engine-native
    aggregation, and ``dup_frac`` is the per-document removal/penalty
    signal (docs above a threshold get span-pruned or dropped).

    Scale (100 TB): NO pair emission anywhere — unlike the pairwise dedup
    family above, corpus span counting is a window over the RAW span
    stream partitioned by span hash (r14: one hs exchange instead of a
    pre-aggregation exchange plus the window's — see the inline note) —
    a window instead of a groupBy+self-join, saving the join's second
    shuffle of the per-doc counts; every shuffle row is a narrow
    (60-bit hash, doc id) pair and text never leaves the scan stage.
    The hs partition holds one row per OCCURRENCE, so a span seen 10^9
    times across the corpus is 10^9 rows in its partition — bounded per
    document by that document's length (the within-doc multiplicity map-
    side combining used to dedup, ~1.1-1.3x on natural text), but a
    degenerate corpus-wide hot span can still make its window partition
    large; if that profile ever appears, reintroduce the per-(doc, hs)
    pre-count for the hot keys only (two-level skew aggregation).  A
    stop-span needs no DF cap because nothing explodes per posting.  The
    cross-engine tokenization contract is the module docstring's;
    determinism is exact-integer (counts and count-ratios).
    """
    from pyspark.sql import Window

    d = _spread(spark, load(spark, sf_dir, "documents"))
    # r14: the corpus count windows over the RAW span stream — the old
    # per-(doc_id, hs) pre-aggregation forced its own (doc_id, hs)
    # exchange BEFORE the window's hs exchange, so the span rows shuffled
    # twice to be counted once.  Windowing the raw (doc_id, hs) rows
    # directly drops that exchange (3 data shuffles → 2); the bytes the
    # one remaining hs exchange carries grow only by each document's
    # INTERNAL span repetition (the part map-side combining deduped,
    # ~1.1-1.3x on text), far less than a whole second exchange, and a
    # single document's multiplicity is bounded by its length so no hash
    # partition can balloon.  gcnt over raw rows == the old SUM(c), and
    # the per-doc sums count identical integers, so results are
    # bit-identical.
    g = d.select("doc_id", F.explode(_kgrams(SPAN_K)).alias("g")).select(
        "doc_id", h60(F.col("g")).alias("hs")
    )
    gcnt = F.count(F.lit(1)).over(Window.partitionBy("hs"))
    dup_c = F.when(F.col("gcnt") >= 2, F.lit(1)).otherwise(F.lit(0))
    return (
        g.withColumn("gcnt", gcnt)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spans"),
            F.sum(dup_c).alias("n_dup_spans"),
        )
        .select(
            "doc_id",
            "n_spans",
            "n_dup_spans",
            (F.col("n_dup_spans").cast("double") / F.col("n_spans")).alias(
                "dup_frac"
            ),
        )
        .orderBy("doc_id")
    )


TRIM_SPAN_MIN = 2  # corpus occurrences at/above which a span is "duplicated"


@register(
    "dedup_trim_duplicate_spans",
    oracle=rf"""
    WITH w AS (SELECT doc_id,
                      regexp_split_to_array(lower(trim(text)), '\s+') AS w
               FROM documents),
    g AS (SELECT doc_id, pos,
                 {h60_sql(f"array_to_string(w[pos:pos+{SPAN_K - 1}], ' ')")} AS hs
          FROM (SELECT doc_id, w,
                       unnest(range(1, greatest(len(w) - {SPAN_K - 1}, 0) + 1)) AS pos
                FROM w)),
    st AS (SELECT doc_id, pos,
                  COUNT(*) OVER (PARTITION BY hs) AS gcnt,
                  ROW_NUMBER() OVER (PARTITION BY hs ORDER BY doc_id, pos) AS rn
           FROM g),
    dropw AS (SELECT DISTINCT doc_id, unnest(range(pos, pos + {SPAN_K})) AS wp
              FROM st WHERE gcnt >= {TRIM_SPAN_MIN} AND rn > 1),
    droplist AS (SELECT doc_id, list(wp) AS drops FROM dropw GROUP BY doc_id)
    SELECT w.doc_id,
           COALESCE(array_to_string(
             list_filter(
               list_transform(range(1, len(w.w) + 1),
                 i -> CASE WHEN d.drops IS NOT NULL AND list_contains(d.drops, i)
                           THEN NULL ELSE w.w[i] END),
               x -> x IS NOT NULL), ' '), '') AS trimmed_text,
           CAST(len(w.w) AS BIGINT) AS n_words,
           CAST(COALESCE(len(d.drops), 0) AS BIGINT) AS n_words_dropped
    FROM w LEFT JOIN droplist d USING (doc_id)
    ORDER BY doc_id
    """,
    tags=("dedup", "spans", "trim"),
)
def dedup_trim_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level dedup that REMOVES the duplicated text (Lee et al. 2021's
    actual pipeline step — :func:`dedup_duplicate_spans` above only
    profiles it).  Every word covered by a duplicated word-SPAN_K-gram
    occurrence loses its place UNLESS that occurrence is the span's
    corpus-wide first (minimum (doc_id, position)); each document's
    trimmed text is reassembled in-row from its surviving word positions.

    Scale (100 TB): the duplicate decision is the profile operator's
    hash-partition window (narrow (hs, doc_id, pos) rows, count-sized
    partitions, NO pair emission); dropped word positions explode at most
    SPAN_K rows per dropped occurrence and collapse to one per-document
    drop list; reassembly is a single in-row filter + join over the word
    array — text crosses exactly one shuffle (the per-doc drop-list join),
    never the span window.  First-occurrence keeping makes the output a
    deterministic pure function of the corpus on both engines.
    """
    from pyspark.sql import Window

    d = _spread(spark, load(spark, sf_dir, "documents"))
    w = d.select("doc_id", _words().alias("w"))
    occ = d.select(
        "doc_id", F.posexplode(_kgrams(SPAN_K)).alias("p0", "g")
    ).select(
        "doc_id",
        (F.col("p0") + 1).cast("long").alias("pos"),
        h60(F.col("g")).alias("hs"),
    )
    st = occ.withColumn(
        "gcnt", F.count(F.lit(1)).over(Window.partitionBy("hs"))
    ).withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("hs").orderBy("doc_id", "pos")),
    )
    dropw = (
        st.filter((F.col("gcnt") >= TRIM_SPAN_MIN) & (F.col("rn") > 1))
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (SPAN_K - 1))
            ).alias("wp"),
        )
        .distinct()
    )
    droplist = dropw.groupBy("doc_id").agg(F.collect_list("wp").alias("drops"))
    keep = lambda x, i: F.col("drops").isNull() | ~F.array_contains(  # noqa: E731
        F.col("drops"), (i + 1).cast("long")
    )
    return (
        w.join(droplist, "doc_id", "left")
        .select(
            "doc_id",
            F.array_join(F.filter("w", keep), " ").alias("trimmed_text"),
            F.size("w").cast("long").alias("n_words"),
            F.coalesce(F.size("drops"), F.lit(0)).cast("long").alias(
                "n_words_dropped"
            ),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# prefix-filtered set-similarity join (PPJoin-family, EXACT)
# ---------------------------------------------------------------------------

PFX_K = 5            # token = distinct word-5-gram shingle (hashed)
PFX_TAU_NUM = 1      # Jaccard threshold 1/2, kept in exact integers so the
PFX_TAU_DEN = 2      # prefix length is engine-portable arithmetic


def _pfx_prefix_tokens(tok: DataFrame, sz: DataFrame) -> DataFrame:
    """Each document's PREFIX under the global rarity order: tokens ranked
    by (corpus document-frequency ASC, hash ASC); prefix length
    = n - ceil(tau * n) + 1.  The prefix-filter theorem (Chaudhuri et al.
    2006 / Xiao et al. 2008): any pair with J >= tau shares at least one
    token inside BOTH prefixes under one global total order — so joining
    prefixes only is EXACT, no false negatives, while frequent tokens
    (the posting lists that explode) almost never make a prefix."""
    from pyspark.sql import Window

    df_freq = tok.groupBy("hs").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy(F.asc("df"), F.asc("hs"))
    # ceil(tau * n) in EXACT integer arithmetic (ceil(a/b) = (a+b-1) div b)
    ceil_tau_n = F.expr(
        f"(n * {PFX_TAU_NUM} + {PFX_TAU_DEN - 1}) DIV {PFX_TAU_DEN}"
    )
    return (
        tok.join(df_freq, "hs")
        .join(sz, "doc_id")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= F.col("n") - ceil_tau_n + 1)
        .select("doc_id", "hs")
    )


@register(
    "dedup_prefix_filter_jaccard_pairs",
    oracle=rf"""
    WITH w AS (SELECT doc_id,
                      regexp_split_to_array(lower(trim(text)), '\s+') AS w
               FROM documents),
    tok AS (SELECT DISTINCT doc_id, {h60_sql('t')} AS hs FROM (
      SELECT doc_id, unnest(list_transform(
               range(1, greatest(len(w) - {PFX_K - 1}, 0) + 1),
               i -> array_to_string(w[i:i+{PFX_K - 1}], ' '))) AS t
      FROM w)),
    sz AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
    pair AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
      FROM tok a JOIN tok b ON a.hs = b.hs AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jaccard
    FROM pair
    JOIN sz sa ON sa.doc_id = doc_a
    JOIN sz sb ON sb.doc_id = doc_b
    WHERE inter * {PFX_TAU_DEN} >= (sa.n + sb.n - inter) * {PFX_TAU_NUM}
    ORDER BY doc_a, doc_b
    """,
    tags=("dedup", "jaccard", "prefix-filter"),
)
def dedup_prefix_filter_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Jaccard >= 1/2 pairs over word-5-gram shingle sets by PREFIX
    FILTERING — the PPJoin-family algorithm, and the third point in this
    module's design space: MinHash-LSH is sub-quadratic but approximate;
    the DF-capped Jaccard operator is exact only over the capped universe;
    prefix filtering is EXACT over the FULL universe and still never
    joins full posting lists.  Candidates come from joining only each
    document's PREFIX (its n - ceil(tau*n) + 1 globally-RAREST tokens):
    the prefix-filter theorem guarantees every qualifying pair collides
    there, while the high-frequency tokens that make posting lists
    explode almost never reach a prefix.  Survivors are verified with an
    exact intersection count restricted to the (broadcast) candidate
    list, and the threshold test is exact integer cross-multiplication.

    The oracle is the NAIVE exact join (full posting lists) — equality of
    results IS the no-false-negative proof, run fresh per round.

    Scale: two narrow shuffles to rank tokens (df join + per-doc window),
    prefix posting lists for the one pair-emitting join, candidates
    broadcast into the verification joins so only candidate documents'
    tokens flow.  A pathological prefix posting list (a token rare
    everywhere yet shared by millions of docs) is bounded by the same
    optional DF cap pattern as the capped operators if ever needed.
    """
    d = _spread(spark, load(spark, sf_dir, "documents"))
    tok = (
        d.select("doc_id", F.explode(F.array_distinct(_kgrams(PFX_K))).alias("t"))
        .select("doc_id", h60(F.col("t")).alias("hs"))
    )
    sz = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    prefix = _pfx_prefix_tokens(tok, sz)
    cand = (
        prefix.groupBy("hs")
        .agg(F.collect_list("doc_id").alias("docs"))
        .filter(F.size("docs") >= 2)
        .select(F.explode("docs").alias("doc_a"), "docs")
        .select("doc_a", F.explode("docs").alias("doc_b"))
        .filter(F.col("doc_a") < F.col("doc_b"))
        .distinct()
    )
    ta = tok.select(F.col("doc_id").alias("doc_a"), "hs")
    tb = tok.select(F.col("doc_id").alias("doc_b"), "hs")
    inter = (
        F.broadcast(cand)
        .join(ta, "doc_a")
        .join(tb, ["doc_b", "hs"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sz.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sz.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    union_sz = F.col("na") + F.col("nb") - F.col("inter")
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(F.col("inter") * PFX_TAU_DEN >= union_sz * PFX_TAU_NUM)
        .select(
            "doc_a", "doc_b",
            (F.col("inter").cast("double") / union_sz).alias("jaccard"),
        )
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# semantic dedup (SemDeDup: cluster with the trained quantizer, prune
# near-identical points within each cluster)
# ---------------------------------------------------------------------------

# Fixture threshold — the synthetic corpus has no true semantic dups (max
# pair cosine ~0.51), so the registered query runs at 0.3 to exercise the
# full cluster->prune path on non-empty output; semantic_prune() defaults
# to the paper's ~0.95 regime.
SEM_FIXTURE_TAU = 0.3


def semantic_prune(
    spark: SparkSession, sf_dir: str, tau: float = 0.95
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): k-means-cluster the embedding corpus,
    then within each cluster drop every point that is cosine-similar
    (>= ``tau``) to a lower-id point of the same cluster — semantic
    near-duplicates land in the same cell, so the quadratic pruning pass
    runs per-cluster, never corpus-wide.  The paper breaks ties toward the
    centroid; this implementation uses vec_id order as the deterministic
    keep-priority so the result is reproducible under any partitioning
    (and oracle-expressible).

    Returns one row per corpus vector: (vec_id, cell, dup_of, is_kept)
    where dup_of is the smallest same-cell vec_id that shadows it (NULL
    for keepers).

    Scale: reuses the IVF trainer (hash-sampled Lloyd rounds, k tiny
    centroid rows to the driver per round); assignment is one broadcast
    join over the corpus; the prune self-join shuffles on cell and is
    quadratic ONLY within a cell — production sizing picks k ~ N/target
    so cells stay O(10^4) rows (the paper uses 50k clusters for LAION),
    exactly how this plan keeps every task bounded at 100 TB.
    """
    from edgy_spark.functions.vectors import l2_norm
    from edgy_spark.operators.similarity import (
        _scored_cells,
        train_ivf_centroids,
    )
    from edgy_spark.plans.spread import spread_if_narrow

    e = spread_if_narrow(load(spark, sf_dir, "embeddings"))
    cents = train_ivf_centroids(spark, sf_dir)
    # r14: in-row assignment against the flat centroid literal (the
    # similarity module's scorer): the membership table is ONE
    # scan → project — no broadcast join for the argmax and no
    # (vec_id, cell) ⋈ embeddings self-join to re-attach the vector,
    # because the scorer keeps the embedding in the same row
    members = e.select(
        "vec_id", "embedding", l2_norm(F.col("embedding")).alias("__ne")
    ).select(
        "vec_id",
        F.array_max(_scored_cells(cents, F.col("embedding"), F.col("__ne")))[
            "cell"
        ].alias("cell"),
        "embedding",
    )
    a = members.select(
        F.col("vec_id"), F.col("cell"), F.col("embedding").alias("ea")
    )
    b = members.select(
        F.col("vec_id").alias("vec_b"),
        F.col("cell").alias("cell_b"),
        F.col("embedding").alias("eb"),
    )
    dup = (
        a.join(
            b,
            (F.col("cell") == F.col("cell_b"))
            & (F.col("vec_b") < F.col("vec_id"))
            & (cosine_similarity(F.col("ea"), F.col("eb")) >= tau),
        )
        .groupBy("vec_id")
        .agg(F.min("vec_b").alias("dup_of"))
    )
    return (
        members.select("vec_id", "cell")
        .join(dup, "vec_id", "left")
        .select(
            "vec_id",
            "cell",
            "dup_of",
            F.col("dup_of").isNull().cast("int").alias("is_kept"),
        )
    )


def _sem_oracle() -> str:
    from edgy_spark.operators.similarity import KM_ROUNDS, _km_ctes

    cos = cosine_sql("a.embedding", "b.embedding")
    return f"""
    WITH {_km_ctes()},
    members AS (
      SELECT g.vec_id, g.cell, e.embedding
      FROM asg_{KM_ROUNDS} g JOIN embeddings e USING (vec_id)),
    dup AS (
      SELECT a.vec_id, MIN(b.vec_id) AS dup_of
      FROM members a JOIN members b
        ON a.cell = b.cell AND b.vec_id < a.vec_id
       AND {cos} >= {SEM_FIXTURE_TAU}
      GROUP BY a.vec_id)
    SELECT m.vec_id, m.cell, d.dup_of,
           CAST(d.dup_of IS NULL AS INT) AS is_kept
    FROM members m LEFT JOIN dup d USING (vec_id)
    ORDER BY m.vec_id
    """


@register(
    "dedup_semantic_prune",
    oracle=_sem_oracle(),
    tags=("dedup", "embedding", "semantic", "kmeans", "pipeline"),
)
def dedup_semantic_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the trained-quantizer clusters at the fixture
    threshold — see :func:`semantic_prune` (production calls use the 0.95
    default).  The oracle unrolls the identical Lloyd rounds
    (integer-stable centroid means make them bit-identical) and mirrors
    the within-cluster prune join."""
    return semantic_prune(spark, sf_dir, tau=SEM_FIXTURE_TAU).orderBy("vec_id")


# ---------------------------------------------------------------------------
# SimHash near-dup pairs (byte-band blocking + Hamming verify)
# ---------------------------------------------------------------------------

SIMHASH_N_BANDS = 4        # 4 x 16-bit bands over the 64-bit fingerprint
SIMHASH_MAX_HAMMING = 3    # < SIMHASH_N_BANDS differing bits, so banding is
#                            EXHAUSTIVE by pigeonhole (recall = 1): at most
#                            3 bands can differ, >= 1 of 4 is identical
SIMHASH_MAX_BUCKET = 100   # posting-list cap: skip band buckets holding more
#                            docs than this (the CONT_MAX_DF pattern) — a
#                            degenerate key (boilerplate-heavy corpora) can
#                            otherwise collapse N docs into one O(N^2) bucket


@register(
    "dedup_simhash_neardup_pairs",
    oracle=f"""
    WITH {_SIMHASH_CTES},
    bands AS (
      SELECT doc_id, b.band,
             (simhash >> (b.band * 16)) & 65535 AS key
      FROM fp, (SELECT unnest(range({SIMHASH_N_BANDS})) AS band) b),
    bkt AS (
      SELECT band, key FROM bands GROUP BY band, key
      HAVING COUNT(*) BETWEEN 2 AND {SIMHASH_MAX_BUCKET}),
    kept AS (SELECT x.doc_id, x.band, x.key FROM bands x JOIN bkt USING (band, key)),
    cand AS (
      SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      FROM kept x JOIN kept y
        ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id)
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM cand
    JOIN fp a ON a.doc_id = doc_a
    JOIN fp b ON b.doc_id = doc_b
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_MAX_HAMMING}
    ORDER BY doc_a, doc_b
    """,
    tags=("dedup", "simhash", "lsh"),
)
def dedup_simhash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-duplicate pairs: band the 64-bit fingerprints as
    4 x 16-bit keys, emit candidates sharing >= 1 band, verify with exact
    Hamming distance (bit_count of xor) <= SIMHASH_MAX_HAMMING — the
    downstream step dedup_simhash_fingerprints' docstring promises.

    Recall contract: a pair at Hamming distance d can differ in at most d
    bands, so with d < SIMHASH_N_BANDS at least one band is identical and
    banding finds EVERY qualifying pair — the pigeonhole Manku et al.
    (WWW'07) use for web-scale simhash dedup, at their exact configuration
    (64-bit fingerprints, k=3, 4 blocks).  16-bit keys give 65,536 buckets
    PER BAND, so expected bucket occupancy stays ~N/65536 per band instead
    of the 8-bit layout's N/256.  The one deliberate recall exception:
    buckets over SIMHASH_MAX_BUCKET docs are skipped entirely (same
    stop-list economics as CONT_MAX_DF) — a degenerate key never explodes
    into O(bucket^2) pairs, and the oracle mirrors the cap so both engines
    see the identical candidate set.

    Scale: fingerprints computed once (one groupBy); band keys are in-row;
    bucket sizes come from a map-side-combinable count (no collect_list —
    no bucket array is ever materialized); the candidate self-join runs
    only over kept buckets; fingerprints re-join only surviving candidates.
    """
    fp = _simhash_fp(spark, sf_dir)
    band_arr = F.array(
        *[
            F.struct(
                F.lit(b).cast("long").alias("band"),
                F.shiftright(F.col("simhash"), b * 16)
                .bitwiseAND(F.lit(65535))
                .alias("key"),
            )
            for b in range(SIMHASH_N_BANDS)
        ]
    )
    bands = fp.select("doc_id", F.explode(band_arr).alias("b")).select(
        "doc_id", F.col("b.band").alias("band"), F.col("b.key").alias("key")
    )
    kept_buckets = (
        bands.groupBy("band", "key")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n").between(2, SIMHASH_MAX_BUCKET))
        .select("band", "key")
    )
    kept = bands.join(kept_buckets, ["band", "key"])
    cand = (
        kept.alias("x")
        .join(
            kept.alias("y"),
            on=[
                F.col("x.band") == F.col("y.band"),
                F.col("x.key") == F.col("y.key"),
                F.col("x.doc_id") < F.col("y.doc_id"),
            ],
        )
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )
    fa = fp.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"))
    fb = fp.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"))
    hamming = F.bit_count(F.expr("ha ^ hb")).cast("long")
    return (
        cand.join(fa, "doc_a")
        .join(fb, "doc_b")
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# provenance dedup: canonical URLs + per-host caps (r11)
# ---------------------------------------------------------------------------

#: per-host document cap for pipeline_host_cap_sample (C4/RefinedWeb-style
#: domain caps: no single host may dominate the training mix)
HOST_CAP = 10

#: query parameters stripped by URL canonicalization — campaign tags and
#: click identifiers that vary per crawl visit without changing content
_TRACKING_RE = r"^(utm_[^=]*|fbclid|gclid|ref)="


def _raw_url(id_col: str = "doc_id") -> Column:
    """Deterministic raw URL synthesized in-row from ``id_col`` (the
    fixture tables carry no URL column; same synthesis pattern as the
    codec queries).  ``g = doc_id % 211`` fixes the CANONICAL identity
    (scheme, host, non-default port, path, real params) so ~2.4 docs per
    group collide after canonicalization, while everything a canonicalizer
    must strip — host case, default ports, tracking params, param order,
    fragments, trailing slashes — varies per ``doc_id``.  The oracle
    rebuilds the identical string in SQL, so the canonicalizer itself is
    what the value-hash checks."""
    d = F.col(id_col)
    g = d % 211
    scheme = F.when(g % 2 == 1, F.lit("https")).otherwise(F.lit("http"))
    hostbase = F.concat(F.lit("www.site"), (g % 13).cast("string"), F.lit(".example"))
    host_raw = (
        F.when(d % 3 == 0, F.upper(hostbase))
        .when(d % 3 == 1, F.replace(hostbase, F.lit("site"), F.lit("SITE")))
        .otherwise(hostbase)
    )
    port_raw = (
        F.when(g % 5 == 0, F.lit(":8080"))
        .when((d % 2 == 0) & (g % 2 == 1), F.lit(":443"))
        .when(d % 2 == 0, F.lit(":80"))
        .otherwise(F.lit(""))
    )
    path_raw = F.concat(
        F.lit("/p"), (g % 7).cast("string"),
        F.lit("/doc"), (g % 11).cast("string"),
        F.when(d % 7 == 0, F.lit("/")).otherwise(F.lit("")),
    )
    real = F.concat(
        F.lit("&id="), (g % 9).cast("string"),
        F.when(g % 3 == 0, F.concat(F.lit("&page="), (g % 4).cast("string")))
        .otherwise(F.lit("")),
    )
    tracking = F.concat(
        F.when(d % 2 == 0, F.concat(F.lit("&utm_source=s"), (d % 23).cast("string")))
        .otherwise(F.lit("")),
        F.when(d % 5 == 0, F.concat(F.lit("&fbclid=f"), d.cast("string")))
        .otherwise(F.lit("")),
    )
    qs = F.when(d % 4 < 2, F.concat(tracking, real)).otherwise(F.concat(real, tracking))
    frag = (
        F.when(d % 4 == 0, F.concat(F.lit("#sec"), (d % 6).cast("string")))
        .otherwise(F.lit(""))
    )
    return F.concat(
        scheme, F.lit("://"), host_raw, port_raw, path_raw,
        F.lit("?"), F.substring(qs, 2, 1_000_000), frag,
    )


def _canonical_parts(url: Column) -> tuple[Column, Column]:
    """``(canonical_url, host)`` from a raw URL string — the actual
    canonicalization under test, all JVM-side built-ins (zero Python in
    the row path): drop the fragment, lowercase scheme + host, strip
    scheme-default ports (http:80 / https:443), trim trailing slashes,
    drop tracking params, and sort the survivors so param order never
    splits a dup group."""
    no_frag = F.regexp_replace(url, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(no_frag, r"^([A-Za-z]+)://", 1))
    host = F.lower(F.regexp_extract(no_frag, r"^[A-Za-z]+://([^/?:]*)", 1))
    port = F.regexp_extract(no_frag, r"^[A-Za-z]+://[^/?:]*:([0-9]+)", 1)
    path = F.regexp_replace(
        F.regexp_extract(no_frag, r"^[A-Za-z]+://[^/?]*([^?]*)", 1), r"/+$", ""
    )
    qs = F.regexp_extract(no_frag, r"\?(.*)$", 1)
    keep = F.filter(
        F.split(qs, "&"), lambda p: (p != "") & ~p.rlike(_TRACKING_RE)
    )
    params = F.array_join(F.array_sort(keep), "&")
    canon_port = F.when(
        (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443")),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))
    canonical = F.concat(
        scheme, F.lit("://"), host, canon_port, path,
        F.when(params == "", F.lit("")).otherwise(F.concat(F.lit("?"), params)),
    )
    return canonical, host


def _url_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> (doc_id, canonical_url, host)."""
    d = load(spark, sf_dir, "documents").select("doc_id")
    canonical, host = _canonical_parts(_raw_url())
    return d.select("doc_id", canonical.alias("canonical_url"), host.alias("host"))


#: DuckDB mirror of _raw_url + _canonical_parts, ending at the ``curl``
#: CTE (doc_id, canonical_url, host) — queries append their own SELECT.
#: ``url_base_sql`` below retargets it to any (table, id) pair.
_URL_BASE_SQL = r"""
    WITH u AS (
      SELECT doc_id, doc_id % 211 AS g,
             '&id=' || CAST(doc_id % 211 % 9 AS VARCHAR) ||
               CASE WHEN doc_id % 211 % 3 = 0
                    THEN '&page=' || CAST(doc_id % 211 % 4 AS VARCHAR)
                    ELSE '' END AS re,
             CASE WHEN doc_id % 2 = 0
                  THEN '&utm_source=s' || CAST(doc_id % 23 AS VARCHAR)
                  ELSE '' END ||
             CASE WHEN doc_id % 5 = 0
                  THEN '&fbclid=f' || CAST(doc_id AS VARCHAR)
                  ELSE '' END AS trk
      FROM documents
    ), raw AS (
      SELECT doc_id,
        CASE WHEN g % 2 = 1 THEN 'https' ELSE 'http' END || '://' ||
        CASE doc_id % 3
          WHEN 0 THEN upper('www.site' || CAST(g % 13 AS VARCHAR) || '.example')
          WHEN 1 THEN replace('www.site' || CAST(g % 13 AS VARCHAR) || '.example',
                              'site', 'SITE')
          ELSE 'www.site' || CAST(g % 13 AS VARCHAR) || '.example' END ||
        CASE WHEN g % 5 = 0 THEN ':8080'
             WHEN doc_id % 2 = 0 AND g % 2 = 1 THEN ':443'
             WHEN doc_id % 2 = 0 THEN ':80'
             ELSE '' END ||
        '/p' || CAST(g % 7 AS VARCHAR) || '/doc' || CAST(g % 11 AS VARCHAR) ||
        CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END ||
        '?' || substr(CASE WHEN doc_id % 4 < 2 THEN trk || re ELSE re || trk END, 2) ||
        CASE WHEN doc_id % 4 = 0 THEN '#sec' || CAST(doc_id % 6 AS VARCHAR)
             ELSE '' END AS raw_url
      FROM u
    ), parts AS (
      SELECT doc_id,
        lower(regexp_extract(no_frag, '^([A-Za-z]+)://', 1)) AS scheme,
        lower(regexp_extract(no_frag, '^[A-Za-z]+://([^/?:]*)', 1)) AS host,
        regexp_extract(no_frag, '^[A-Za-z]+://[^/?:]*:([0-9]+)', 1) AS port,
        regexp_replace(
          regexp_extract(no_frag, '^[A-Za-z]+://[^/?]*([^?]*)', 1), '/+$', '') AS path,
        regexp_extract(no_frag, '\?(.*)$', 1) AS qs
      FROM (SELECT doc_id, regexp_replace(raw_url, '#.*$', '') AS no_frag FROM raw)
    ), curl AS (
      SELECT doc_id, host,
        scheme || '://' || host ||
        CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
                  OR (scheme = 'https' AND port = '443')
             THEN '' ELSE ':' || port END ||
        path ||
        CASE WHEN p = '' THEN '' ELSE '?' || p END AS canonical_url
      FROM (SELECT *,
              array_to_string(list_sort(list_filter(str_split(qs, '&'),
                x -> x <> '' AND NOT regexp_matches(
                       x, '^(utm_[^=]*|fbclid|gclid|ref)='))), '&') AS p
            FROM parts)
    )
"""


def url_base_sql(table: str = "documents", id_col: str = "doc_id") -> str:
    """The canonical-URL CTE chain over an arbitrary ``(table, id)`` pair —
    the streaming crawl-frontier twin canonicalizes event URLs with the
    SAME algorithm and oracle text (streaming/events.py)."""
    return _URL_BASE_SQL.replace("doc_id", id_col).replace(
        "FROM documents", f"FROM {table}"
    )


@register(
    "dedup_url_canonical_groups",
    oracle=_URL_BASE_SQL
    + """
    SELECT canonical_url,
           CAST(COUNT(*) AS BIGINT) AS dup_count,
           MIN(doc_id) AS keeper_doc_id
    FROM curl
    GROUP BY canonical_url
    HAVING COUNT(*) > 1
    """,
    tags=("dedup", "provenance", "url"),
)
def dedup_url_canonical_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Provenance-level dedup (C4 / RefinedWeb hygiene): canonicalize each
    document's URL in-row, group identical canonical URLs, keeper = min
    doc_id.  Content dedup cannot see these groups — two crawls of one
    page differ only in tracking params / host case / fragment.

    Scale: the canonicalization is pure string expressions inside
    whole-stage codegen; the only shuffle carries (canonical_url, count)
    after a map-side partial count — documents never move."""
    return (
        _url_docs(spark, sf_dir)
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("dup_count"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
        .filter(F.col("dup_count") > 1)
    )


@register(
    "pipeline_host_cap_sample",
    oracle=_URL_BASE_SQL
    + f"""
    SELECT host, doc_id, kept_rank
    FROM (SELECT host, doc_id,
                 CAST(row_number() OVER (
                   PARTITION BY host
                   ORDER BY (doc_id % 1000003) * 2654435761 % 1000003, doc_id
                 ) AS BIGINT) AS kept_rank
          FROM curl)
    WHERE kept_rank <= {HOST_CAP}
    """,
    tags=("pipeline", "provenance", "sampling"),
)
def pipeline_host_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host document cap: keep at most HOST_CAP docs per host, chosen
    by a deterministic salted hash (not doc order, which correlates with
    crawl time).  The multiplier arithmetic stays under 2^63
    ((doc_id % 1000003) * 2654435761 < 2.7e15) so both engines compute it
    exactly — no float, no overflow.

    Scale: rank <= K compiles to partial+final WindowGroupLimit (pinned in
    tests/test_plans.py), so each map task keeps K rows per host BEFORE
    the shuffle — the exchange carries at most K * n_hosts rows per task,
    never the corpus, and there is no global sort."""
    from pyspark.sql.window import Window

    docs = _url_docs(spark, sf_dir)
    hk = ((F.col("doc_id") % 1000003) * F.lit(2654435761) % 1000003).alias("hk")
    w = Window.partitionBy("host").orderBy("hk", "doc_id")
    return (
        docs.select("host", "doc_id", hk)
        .withColumn("kept_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("kept_rank") <= HOST_CAP)
        .select("host", "doc_id", "kept_rank")
    )


@register(
    "dedup_host_dup_rate",
    oracle=_URL_BASE_SQL
    + r"""
    , fp AS (SELECT c.host,
                    md5(lower(regexp_replace(trim(d.text), '\s+', ' ', 'g'))) AS f
             FROM curl c JOIN documents d USING (doc_id))
    SELECT host,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT f) AS BIGINT) AS n_unique,
           CAST((COUNT(*) - COUNT(DISTINCT f)) * 1000000 // COUNT(*) AS BIGINT)
             AS dup_rate_e6
    FROM fp GROUP BY host
    """,
    tags=("dedup", "provenance", "profile"),
)
def dedup_host_dup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level exact-duplicate profile: for each host, how much of its
    crawl is verbatim repeats (normalized-text fingerprints, the
    dedup_exact_groups convention).  The per-host dup rate is the standard
    crawl-quality signal for deciding host caps; exact e6 fixed-point so
    the value-hash is cross-engine stable.

    Scale: host and fingerprint are both in-row expressions, so this is
    ONE scan of documents and one shuffle on (host, fp) for the distinct,
    then a map-side combinable per-host count — 16-byte digests move,
    documents don't (review r11: the first cut self-joined on doc_id,
    scanning the corpus twice)."""
    d = load(spark, sf_dir, "documents")
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    _, host = _canonical_parts(_raw_url())
    return (
        d.select(host.alias("host"), F.md5(norm.cast("binary")).alias("f"))
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("f").alias("n_unique"),
        )
        .select(
            "host",
            "n_docs",
            "n_unique",
            F.expr("(n_docs - n_unique) * 1000000L div n_docs").alias("dup_rate_e6"),
        )
    )
