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
from edgy_spark.functions.vectors import (
    cosine_similarity,
    dot,
    cosine_sql,
    int8_codes_sql,
    int8_scale_sql,
    l2_norm,
)
from edgy_spark.sources import load

_COS_SQL = cosine_sql("q.embedding", "c.embedding")


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

from edgy_spark.functions.lsh import DIM, hyperplane_signature, sig_sql as _sig_sql  # noqa: E402


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
    # posting-list pair emission, not a self-join: a self-join would scan
    # the corpus and compute the 12-fold signature TWICE (one lineage per
    # side); grouping by signature computes it once — the same pattern the
    # dedup pair generators use
    buckets = (
        sig.groupBy("sig")
        .agg(F.collect_list("vec_id").alias("vecs"))
        .filter(F.size("vecs") >= 2)
    )
    return (
        buckets.select(F.explode("vecs").alias("vec_a"), "vecs")
        .select("vec_a", F.explode("vecs").alias("vec_b"))
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
    return cosine_sql(x, y)


def _py_l2_norm(vec: list[float]) -> float:
    """Driver-side twin of :func:`l2_norm`'s fold: same IEEE doubles, same
    left-to-right accumulation order, same correctly-rounded sqrt — so a
    centroid norm precomputed here is BIT-IDENTICAL to the expression
    ``l2_norm(cemb_literal)`` both engines would evaluate (division and
    sqrt are correctly rounded; sums reassociate only if the order
    changes, which this fold forbids)."""
    import math

    acc = 0.0
    for x in vec:
        acc += float(x) * float(x)
    return math.sqrt(acc)


def _scored_cells(cents: list[tuple[int, list[float]]], emb, ne):
    """array<struct<cs,nc,cell>> scoring ``emb`` against every centroid,
    IN-ROW: the centroid table rides as one flat literal (constant-folded
    to a single array value — NOT the r08 per-term unrolled arithmetic
    whose 16×DIM expression trees cost ~2.4s of planning per round; here
    the arithmetic is one ``transform`` lambda regardless of K), so
    assignment needs no join and no shuffle at all — at 100 TB the cell
    assignment becomes scan → project, embarrassingly parallel.

    ``ne`` is the row vector's norm column, hoisted by the caller so the
    per-centroid work is ONE dot-product fold instead of the full cosine
    (which would re-fold the row norm K times and the centroid norm every
    row); centroid norms are precomputed driver-side (:func:`_py_l2_norm`,
    bit-identical to the in-plan fold).  cs = dot/(ne*nc) multiplies and
    divides in exactly :func:`cosine_similarity`'s order, so scores —
    and therefore every argmax/tie decision the oracle replays — are
    unchanged to the last bit.  Struct order (cs, nc=-cell) makes
    ``array_max`` pick max-cos with ties to the smallest cell: the same
    selection as the oracle's ROW_NUMBER(ORDER BY cos DESC, cell)."""
    # ONE F.expr over a SQL literal string, not K×(DIM+2) F.lit calls:
    # per-element Column construction costs a py4j round-trip each
    # (~1,000 driver-side calls ≈ 0.4s PER build at K=16/DIM=64 — r14
    # measurement), while one parse of the equivalent literal text is
    # milliseconds.  repr(float) round-trips through the SQL parser's
    # Double.parseDouble exactly, so the centroid doubles are unchanged.
    # The ~0.3s the ANALYZER spends type-checking the K×DIM literal
    # nodes per build is the price of a true fold-to-literal: a
    # string-packed table decoded by split/cast analyzes in ms but the
    # lambda-bearing decode is NOT foldable, so it would re-execute per
    # CORPUS row on the assignment path (review r14) — per-row zero
    # cost wins at scale.
    def _d(x: float) -> str:
        return repr(float(x)) + "D"

    tab = F.expr(
        "array(" + ", ".join(
            "named_struct('cell', {c}L, 'nc', {nc}, 'cemb', array({emb}))".format(
                c=int(c),
                nc=_d(_py_l2_norm(ce)),
                emb=", ".join(_d(x) for x in ce),
            )
            for c, ce in cents
        ) + ")"
    )
    return F.transform(
        tab,
        lambda c: F.struct(
            (dot(emb, c["cemb"]) / (ne * c["nc"])).alias("cs"),
            (-c["cell"]).alias("nc"),
            c["cell"].alias("cell"),
        ),
    )


def _assign_cells(e: DataFrame, cents: list[tuple[int, list[float]]]) -> DataFrame:
    """(vec_id, cell): assign every corpus vector to its max-cosine cell —
    scan → project via the in-row literal scorer (:func:`_scored_cells`),
    ZERO shuffles (r14: the r13 broadcast nested-loop + max_by shape
    materialized K copies of every embedding row and paid a corpus-wide
    groupBy exchange for what is a pure per-row computation)."""
    return e.select(
        "vec_id",
        F.col("embedding"),
        l2_norm(F.col("embedding")).alias("__ne"),
    ).select(
        "vec_id",
        F.array_max(_scored_cells(cents, F.col("embedding"), F.col("__ne")))[
            "cell"
        ].alias("cell"),
    )


def _probe_cells(e: DataFrame, cents: list[tuple[int, list[float]]]) -> DataFrame:
    """(query_id, qemb, cell): each query's N_PROBE nearest cells — the
    in-row scorer sorted descending and sliced (struct order (cs, -cell)
    descending == the oracle's ORDER BY cos DESC, cell ASC)."""
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qemb"),
        l2_norm(F.col("embedding")).alias("__ne"),
    )
    top = F.slice(
        F.reverse(
            F.array_sort(_scored_cells(cents, F.col("qemb"), F.col("__ne")))
        ),
        1,
        N_PROBE,
    )
    return q.select(
        "query_id",
        "qemb",
        F.explode(F.transform(top, lambda s: s["cell"])).alias("cell"),
    )


def _ivf_search(e: DataFrame, cents: list[tuple[int, list[float]]]) -> DataFrame:
    """IVF search given the driver-side centroid list: assign the corpus to
    nearest cells, probe each query's N_PROBE nearest cells, exact cosine
    re-rank inside them."""
    asg = _assign_cells(e, cents)
    probe = _probe_cells(e, cents)
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
    bit-for-bit in the oracle); :func:`sim_ivf_trained_topk` is the
    production variant with Lloyd-trained centroids on the same query path.

    Scale: centroids broadcast everywhere.  Cell assignment is a broadcast
    nested-loop + map-side partial max_by — the ONE wide shuffle carries a
    single (vec_id, cell) row per vector.  Queries probe N_PROBE/K_CELLS
    of the corpus (~25% here; ~sqrt(N) cells at production K), making the
    scan per query sub-linear — the classic IVF trade: recall vs probes is
    checked in tests/test_similarity.py.
    """
    from edgy_spark.plans.spread import spread_if_narrow

    e = spread_if_narrow(load(spark, sf_dir, "embeddings"))
    cents = _seed_centroids(e)
    return _ivf_search(e, cents)


# -- trained IVF (fixed-seed Lloyd k-means) ---------------------------------

KM_ROUNDS = 2   # Lloyd refinement rounds (unrolled in the oracle SQL too)
FP_BITS = 20    # fixed-point quantum for the integer-stable centroid mean
_FPQ = 1 << FP_BITS

# r09: Lloyd trains on a deterministic 1/TRAIN_SAMPLE_MOD hash-sample of the
# corpus — the standard 100 TB recipe (a coarse quantizer needs a few dozen
# examples per centroid, not every vector; FAISS trains on a sample and
# assigns the rest).  Membership is a pure function of vec_id via the
# engine-portable md5 hash, so the oracle draws the IDENTICAL sample; the
# salt decouples this draw from every other hash-sampler in the repo.
# Below TRAIN_MIN_ROWS sampled rows (~30 per centroid) sampling would
# starve the cells — both engines then fall back to full-corpus training
# via the same count predicate, so tiny fixtures keep r08-identical
# centroids while any corpus of real size trains on the sample.
TRAIN_SAMPLE_MOD = 4
#: Lloyd training-sample materialization ceiling (rows): samples at or
#: under this localCheckpoint once and every training round scans the
#: in-memory blocks; larger samples keep the per-round columnar re-scan
#: (materializing TBs of executor memory is the worse trade there).
TRAIN_CACHE_ROWS_CONF = "spark.edgy.kmeans.cacheSampleRows"
TRAIN_CACHE_ROWS_DEFAULT = 2_000_000
TRAIN_SALT = "|ivftrain"
TRAIN_MIN_ROWS = 30 * K_CELLS


def _train_sample_with_count(e: DataFrame) -> tuple[DataFrame, int | None]:
    """The deterministic Lloyd training sample (see TRAIN_SAMPLE_MOD),
    with the full corpus as the small-fixture fallback.  Returns
    ``(sample, n_rows)`` where ``n_rows`` is the sample's size when the
    sampled branch is taken and ``None`` on the (tiny, fixture-scale)
    full-corpus fallback — the count already runs to decide the branch,
    so threading it out costs nothing and lets the trainer decide
    whether the sample is small enough to materialize as iteration
    state."""
    in_sample = (
        F.pmod(
            h60(F.concat(F.col("vec_id").cast("string"), F.lit(TRAIN_SALT))),
            F.lit(TRAIN_SAMPLE_MOD),
        )
        == 0
    )
    sampled = e.filter(in_sample)
    # one metadata-cheap count decides the branch; a pure function of the
    # data, mirrored by the oracle's COUNT(*) subquery
    n = sampled.count()
    if n >= TRAIN_MIN_ROWS:
        return sampled, n
    return e, None


def _train_sample(e: DataFrame) -> DataFrame:
    """Sample-only view of :func:`_train_sample_with_count`."""
    return _train_sample_with_count(e)[0]


def _train_sample_sql() -> str:
    keyed = f"vec_id::VARCHAR || '{TRAIN_SALT}'"
    member = f"{h60_sql(keyed)} % {TRAIN_SAMPLE_MOD} = 0"
    return (
        f"SELECT * FROM embeddings WHERE "
        f"(SELECT COUNT(*) FROM embeddings WHERE {member}) < {TRAIN_MIN_ROWS} "
        f"OR {member}"
    )


def _seed_centroids(e: DataFrame) -> list[tuple[int, list[float]]]:
    """The deterministic first-K seed centroids, collected driver-side
    (K_CELLS rows — dimension-sized, the same collect the Lloyd trainer
    has always made)."""
    return [
        (int(r["cell"]), [float(x) for x in r["cemb"]])
        for r in e.filter(F.col("vec_id") < K_CELLS)
        .select(F.col("vec_id").alias("cell"), F.col("embedding").alias("cemb"))
        .collect()
    ]


def train_ivf_centroids(
    spark: SparkSession,
    sf_dir: str,
    k: int = K_CELLS,
    rounds: int = KM_ROUNDS,
) -> list[tuple[int, list[float]]]:
    """Fixed-seed Lloyd k-means over a deterministic hash-sample of
    ``embeddings``, pure DataFrame-side.

    Init = the first ``k`` vectors by vec_id (deterministic seed); each round
    reassigns every SAMPLED vector (1/TRAIN_SAMPLE_MOD of the corpus — the
    r09 change: training a coarse quantizer needs a sample, not the corpus,
    and the full-corpus scan per Lloyd round was the single most expensive
    term in the r08 bench) to its max-cosine cell (r14: the in-row
    FLAT-LITERAL scorer ``_scored_cells`` — one constant-folded centroid
    array consumed by a single transform lambda, NOT the r08 per-term
    unrolled trees whose 16×DIM arithmetic cost ~2.4s of planning per
    round, and without r09-r13's broadcast crossJoin + per-vector groupBy
    exchange) and recomputes cell means.  Only the k tiny
    centroid rows are collected per round; the corpus never leaves the
    executors, and the full corpus is still assigned to the trained cells
    exactly once by the caller's search.

    The mean is integer-stable: elements are quantized to round(v * 2^20) as
    BIGINT (dyadic scaling of a double is exact, and round-half-away on
    identical doubles agrees across engines), summed exactly (order-free),
    and divided back in double.  This makes centroids bit-identical between
    Spark and the DuckDB oracle regardless of partitioning — a plain float
    mean would drift in the low bits and flip downstream argmax ties.
    Quantization loss is ~1e-6 relative, irrelevant for coarse cells; sums
    stay under 2^53 up to ~2^40 rows per cell (raise FP_BITS' budget by
    sharding the sum if a cell ever exceeds that).

    Empty cells drop out (both engines drop them identically); k shrinks
    rather than resampling, keeping the unrolled oracle expressible.
    """
    from concurrent.futures import ThreadPoolExecutor

    from edgy_spark.plans.spread import spread_if_narrow

    e = spread_if_narrow(load(spark, sf_dir, "embeddings"))

    def _seed() -> list[tuple[int, list[float]]]:
        if k == K_CELLS:
            return _seed_centroids(e)
        return [
            (int(r["cell"]), [float(x) for x in r["cemb"]])
            for r in e.filter(F.col("vec_id") < k)
            .select(F.col("vec_id").alias("cell"), F.col("embedding").alias("cemb"))
            .collect()
        ]

    # The seed collect and the training-sample count are INDEPENDENT
    # driver jobs (guide §2.6: actions are only sequential because the
    # driver calls them sequentially) — submit both and let the scheduler
    # overlap them; each is dimension-/metadata-sized driver latency, so
    # the overlap trims a whole job's wall time off every trainer call.
    # inheritable_thread_target (ADVICE r14): under pyspark's pinned
    # thread mode, bare pool threads do NOT inherit the caller's local
    # properties (job group/tags, scheduler pool — used for cancellation)
    # and each leaves a lazily-reclaimed companion JVM thread; the wrapper
    # propagates the properties and cleans the JVM thread up on exit.
    from pyspark.util import inheritable_thread_target

    with ThreadPoolExecutor(max_workers=2) as pool:
        seed_f = pool.submit(inheritable_thread_target(_seed))
        sample_f = pool.submit(
            inheritable_thread_target(lambda: _train_sample_with_count(e))
        )
        cents = seed_f.result()
        et, n_sample = sample_f.result()
    dim = len(cents[0][1])
    # Materialize the training set ONCE when it is small enough to hold
    # as iteration state (guide §5: cache what is reused and expensive
    # to recompute): every Lloyd round then scans the cached blocks
    # instead of re-reading the corpus, re-paying the conditional
    # spread exchange, and re-hashing the sample filter — at fixture
    # scale this removed ~0.5s per round.  Above the threshold
    # (production: a sample in the TBs) rounds keep the scan-per-round
    # shape — re-reading a columnar scan beats pinning TBs of executor
    # memory; threshold overridable per session for clusters where the
    # memory trade goes the other way.
    cache_rows = int(
        spark.conf.get(TRAIN_CACHE_ROWS_CONF, str(TRAIN_CACHE_ROWS_DEFAULT))
    )
    cached = n_sample is None or n_sample <= cache_rows
    if cached:
        # persist (NOT localCheckpoint): lineage survives, so an
        # executor loss mid-training recomputes the lost blocks instead
        # of failing the job, and the blocks are RELEASED in the finally
        # below rather than lingering until driver GC (review r14).  The
        # first round's job materializes the cache.
        from pyspark import StorageLevel

        et = et.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        cents = _lloyd_rounds(et, cents, dim, rounds)
    finally:
        if cached:
            et.unpersist()
    return cents


def _lloyd_rounds(
    et: DataFrame,
    cents: list[tuple[int, list[float]]],
    dim: int,
    rounds: int,
) -> list[tuple[int, list[float]]]:
    """The Lloyd refinement loop (see :func:`train_ivf_centroids`)."""
    for _ in range(rounds):
        # in-row argmax against the round's centroid literal
        # (_scored_cells: same cos values and tie order as the r13
        # broadcast crossJoin + max_by, with no row replication and no
        # per-vector groupBy exchange — each round is now ONE stage of
        # scan → project feeding the per-cell mean aggregation)
        asg = et.select(
            "embedding", l2_norm(F.col("embedding")).alias("__ne")
        ).select(
            F.array_max(
                _scored_cells(cents, F.col("embedding"), F.col("__ne"))
            )["cell"].alias("cell"),
            "embedding",
        )
        # per-cell elementwise sums via posexplode, NOT a dim-wide agg
        # list: 1 + dim aggregate expressions cost ~1s of Catalyst
        # ANALYSIS per round at dim=64 (r14 measurement) while this
        # fixed half-dozen-node plan analyzes in milliseconds, and
        # posexplode emits bare (cell, pos, v) rows — no copy of the
        # full embedding array per generated row (review r14).
        # Embeddings are fixed-dimension (the contract every consumer
        # and the unrolled oracle already assume), so n per (cell, pos)
        # equals the old per-cell row count and the quantized sums,
        # counts, and centroid means are bit-identical.
        expl = asg.select(
            "cell",
            F.posexplode(F.col("embedding")).alias("pos", "v"),
        )
        rows = (
            expl.groupBy("cell", "pos")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.round(F.col("v").cast("double") * _FPQ, 0).cast("long")
                ).alias("s"),
            )
            .collect()
        )
        sums: dict[int, list] = {}
        counts: dict[int, int] = {}
        for r in rows:
            c = int(r["cell"])
            sums.setdefault(c, [0.0] * dim)[int(r["pos"])] = float(r["s"])
            counts[c] = int(r["n"])
        cents = sorted(
            (c, [(s / _FPQ) / counts[c] for s in svals])
            for c, svals in sums.items()
        )
    return cents


def _km_ctes() -> str:
    """Oracle CTE chain mirroring train_ivf_centroids round-for-round:
    ivftrain = the deterministic hash-sample Lloyd trains on (r09);
    cent_0 = first-K seed; asg_r = argmax-cosine assignment of the SAMPLE
    vs cent_r for the training rounds, of the FULL corpus for the final
    round the search consumes; cent_{r+1} = per-cell elementwise mean via
    the same fixed-point (round(v * 2^20) BIGINT) sums, so every round's
    centroids are bit-identical to the Spark side."""
    ctes = [
        f"""ivftrain AS (
      {_train_sample_sql()})""",
        f"""cent_0 AS (
      SELECT vec_id AS cell, embedding AS cemb FROM embeddings WHERE vec_id < {K_CELLS})""",
    ]
    for r in range(KM_ROUNDS + 1):
        src = "embeddings" if r == KM_ROUNDS else "ivftrain"
        ctes.append(f"""asg_{r} AS (
      SELECT vec_id, cell FROM (
        SELECT e.vec_id, c.cell,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_cos2('e.embedding', 'c.cemb')} DESC, c.cell) AS rn
        FROM {src} e CROSS JOIN cent_{r} c) WHERE rn = 1)""")
        if r == KM_ROUNDS:
            break
        ctes.append(f"""cent_{r + 1} AS (
      SELECT cell, list(m ORDER BY pos) AS cemb FROM (
        SELECT a.cell, i.pos,
               (CAST(SUM(CAST(ROUND(CAST(e.embedding[i.pos] AS DOUBLE) * {_FPQ}, 0) AS BIGINT)) AS DOUBLE)
                / {float(_FPQ)}) / COUNT(*) AS m
        FROM asg_{r} a JOIN ivftrain e USING (vec_id)
        CROSS JOIN (SELECT unnest(range(1, {DIM + 1})) AS pos) i
        GROUP BY a.cell, i.pos)
      GROUP BY cell)""")
    return ",\n    ".join(ctes)


@register(
    "sim_ivf_trained_topk",
    oracle=f"""
    WITH {_km_ctes()},
    probe AS (
      SELECT query_id, cell FROM (
        SELECT q.vec_id AS query_id, c.cell,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                  ORDER BY {_cos2('q.embedding', 'c.cemb')} DESC, c.cell) AS rn
        FROM embeddings q CROSS JOIN cent_{KM_ROUNDS} c WHERE q.vec_id < {N_QUERIES}) WHERE rn <= {N_PROBE}),
    scored AS (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             {_cos2('q.embedding', 'n.embedding')} AS cos_sim,
             ROW_NUMBER() OVER (PARTITION BY p.query_id
                                ORDER BY {_cos2('q.embedding', 'n.embedding')} DESC,
                                         a.vec_id) AS rank
      FROM probe p
      JOIN asg_{KM_ROUNDS} a ON a.cell = p.cell AND a.vec_id <> p.query_id
      JOIN embeddings q ON q.vec_id = p.query_id
      JOIN embeddings n ON n.vec_id = a.vec_id)
    SELECT query_id, neighbor_id, cos_sim, rank
    FROM scored WHERE rank <= {TOP_K}
    ORDER BY query_id, rank
    """,
    tags=("similarity", "ann", "ivf", "kmeans"),
)
def sim_ivf_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-k over TRAINED centroids: fixed-seed Lloyd k-means
    (train_ivf_centroids, KM_ROUNDS rounds, integer-stable means) followed
    by the same probe-limited search as :func:`sim_ivf_topk`.

    This is the production ANN path — the seeded variant exists so the full
    pipeline stays oracle-expressible without iteration, while this one
    unrolls the k-means rounds into the oracle SQL (possible because the
    fixed-point centroid means are bit-identical across engines).

    Scale: training is rounds x (1/TRAIN_SAMPLE_MOD sample map + one
    k x DIM-long shuffle); search probes N_PROBE/k of the corpus.  Recall
    vs brute force is pinned in tests/test_similarity.py.
    """
    from edgy_spark.plans.spread import spread_if_narrow

    e = spread_if_narrow(load(spark, sf_dir, "embeddings"))
    cents = train_ivf_centroids(spark, sf_dir)
    return _ivf_search(e, cents)


# -- IVF-PQ: trained cells + int8 asymmetric scoring + exact re-rank --------

SHORTLIST = 24  # approximate-score candidates kept per query for exact re-rank


@register(
    "sim_ivfpq_topk",
    oracle=f"""
    WITH {_km_ctes()},
    probe AS (
      SELECT query_id, cell FROM (
        SELECT q.vec_id AS query_id, c.cell,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                  ORDER BY {_cos2('q.embedding', 'c.cemb')} DESC, c.cell) AS rn
        FROM embeddings q CROSS JOIN cent_{KM_ROUNDS} c WHERE q.vec_id < {N_QUERIES}) WHERE rn <= {N_PROBE}),
    codes AS (
      SELECT e.vec_id,
             {int8_codes_sql('e.embedding', 's.scale')} AS codes
      FROM embeddings e JOIN (
        SELECT vec_id, {int8_scale_sql('embedding')} AS scale
        FROM embeddings) s ON s.vec_id = e.vec_id),
    codesn AS (
      SELECT vec_id, codes,
             sqrt(list_sum(list_transform(codes, c -> c::DOUBLE * c::DOUBLE))) AS code_norm
      FROM codes),
    shortlist AS (
      SELECT query_id, neighbor_id FROM (
        SELECT p.query_id, a.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY p.query_id ORDER BY
                 (list_sum(list_transform(list_zip(q.embedding, c.codes),
                           pr -> pr[1]::DOUBLE * pr[2]::DOUBLE))
                  / (sqrt(list_sum(list_transform(q.embedding, v -> v::DOUBLE * v::DOUBLE)))
                     * c.code_norm)) DESC,
                 a.vec_id) AS rn
        FROM probe p
        JOIN asg_{KM_ROUNDS} a ON a.cell = p.cell AND a.vec_id <> p.query_id
        JOIN embeddings q ON q.vec_id = p.query_id
        JOIN codesn c ON c.vec_id = a.vec_id) WHERE rn <= {SHORTLIST}),
    scored AS (
      SELECT s.query_id, s.neighbor_id,
             {_cos2('q.embedding', 'n.embedding')} AS cos_sim,
             ROW_NUMBER() OVER (PARTITION BY s.query_id
                                ORDER BY {_cos2('q.embedding', 'n.embedding')} DESC,
                                         s.neighbor_id) AS rank
      FROM shortlist s
      JOIN embeddings q ON q.vec_id = s.query_id
      JOIN embeddings n ON n.vec_id = s.neighbor_id)
    SELECT query_id, neighbor_id, cos_sim, rank
    FROM scored WHERE rank <= {TOP_K}
    ORDER BY query_id, rank
    """,
    tags=("similarity", "ann", "ivf", "pq", "quantization"),
    bench=True,  # r08: the 100 TB ANN composition, tracked round-over-round
)
def sim_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN top-k — the actual 100 TB ANN architecture, composing the
    trained coarse quantizer with int8 fine scoring:

    1. Lloyd-trained cells (:func:`train_ivf_centroids`) + N_PROBE probing,
       exactly as :func:`sim_ivf_trained_topk`.
    2. ASYMMETRIC int8 scoring inside probed cells: the query stays float,
       candidates are symmetric max-abs int8 codes.  Per-vector scaling
       makes the scale CANCEL in cosine — approx_cos = Σ(qᵢ·codeᵢ) /
       (‖q‖·√Σcodeᵢ²) — so scoring touches only the 4×-smaller integer
       codes, never the float embeddings.
    3. Exact re-rank of the SHORTLIST best approximate candidates per query
       against their true float vectors (TOP_K of SHORTLIST).

    Scale: the memory-bound candidate scan (step 2) reads int8 codes —
    4× the vectors per byte of bandwidth — while the float embeddings are
    fetched for only SHORTLIST rows per query (a point-lookup join).
    Determinism: codes are integers; approximate scores fold in array order
    on both engines; ties break by vec_id.  Quantization recall vs brute
    force is pinned in tests/test_similarity.py.
    """
    from edgy_spark.plans.spread import spread_if_narrow

    e = spread_if_narrow(load(spark, sf_dir, "embeddings"))
    cents = train_ivf_centroids(spark, sf_dir)
    asg = _assign_cells(e, cents)
    probe = _probe_cells(e, cents)

    from edgy_spark.functions.vectors import int8_codes, int8_scale

    codes = (
        e.select(
            F.col("vec_id").alias("neighbor_id"),
            int8_scale(F.col("embedding")).alias("scale"),
            "embedding",
        )
        .select(
            "neighbor_id",
            int8_codes(F.col("embedding"), F.col("scale")).alias("codes"),
        )
        .select("neighbor_id", "codes", l2_norm(F.col("codes")).alias("code_norm"))
    )

    approx = dot(F.col("qemb"), F.col("codes")) / (
        l2_norm(F.col("qemb")) * F.col("code_norm")
    )
    wshort = Window.partitionBy("query_id").orderBy(
        F.desc("approx"), F.asc("neighbor_id")
    )
    shortlist = (
        F.broadcast(probe)
        .join(asg.withColumnRenamed("vec_id", "neighbor_id"), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .join(codes, "neighbor_id")
        .select("query_id", "qemb", "neighbor_id", approx.alias("approx"))
        .withColumn("rn", F.row_number().over(wshort))
        .filter(F.col("rn") <= SHORTLIST)
        .select("query_id", "qemb", "neighbor_id")
    )

    n = e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("nemb"))
    sim = cosine_similarity(F.col("qemb"), F.col("nemb"))
    wrank = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        shortlist.join(n, "neighbor_id")
        .select("query_id", "neighbor_id", sim.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(wrank))
        .filter(F.col("rank") <= TOP_K)
        .orderBy("query_id", "rank")
    )


# -- int8 embedding quantization --------------------------------------------

@register(
    "sim_embedding_int8_quantize",
    oracle=f"""
    WITH q AS (
      SELECT vec_id, {int8_scale_sql('embedding')} AS scale
      FROM embeddings),
    enc AS (
      SELECT e.vec_id, q.scale,
             {int8_codes_sql('e.embedding', 'q.scale')} AS codes
      FROM embeddings e JOIN q ON e.vec_id = q.vec_id)
    SELECT vec_id, scale,
           CAST(list_max(list_transform(codes, c -> abs(c))) AS BIGINT) AS max_code,
           CAST(list_sum(list_transform(codes, c -> c * c)) AS BIGINT) AS code_sq_sum
    FROM enc
    ORDER BY vec_id
    """,
    tags=("similarity", "quantization"),
)
def sim_embedding_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column: per-vector
    max-abs scale, codes = round(v / scale * 127) ∈ [-127, 127] — the 4x
    memory/bandwidth lever for ANN at 100 TB (int8 codes + one float scale
    per vector instead of float32[64]; dot products run on integers and
    rescale by scale_a*scale_b/127^2).

    Emits per-vector proof terms instead of the 64 codes: the scale, the
    max |code| (must be exactly 127 — the max-abs element saturates by
    construction), and the integer sum of squared codes (the quantized
    self-dot every int8 scorer uses).  All in-row transforms, zero
    shuffles beyond the presentation sort; division and rounding are
    IEEE-identical across engines, and integer sums are order-free.
    """
    from edgy_spark.functions.vectors import int8_codes, int8_scale

    e = load(spark, sf_dir, "embeddings")
    return (
        e.select("vec_id", int8_scale(F.col("embedding")).alias("scale"), "embedding")
        .select(
            "vec_id", "scale",
            int8_codes(F.col("embedding"), F.col("scale")).alias("codes"),
        )
        .select(
            "vec_id",
            "scale",
            F.array_max(F.transform("codes", F.abs)).cast("long").alias("max_code"),
            F.aggregate(
                F.transform("codes", lambda c: c * c),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ).alias("code_sq_sum"),
        )
        .orderBy("vec_id")
    )


# -- Johnson-Lindenstrauss random projection (deterministic sign matrix) -----

RP_DIM = 8       # reduced dimensionality (DIM=64 -> 8: 8x less bandwidth)
RP_SALT = "|rp1"


def _rp_signs() -> list[list[float]]:
    """The +-1 projection matrix, a pure function of (row, column, salt)
    via md5 parity — both engines embed the identical literals, so the
    'random' projection needs no RNG state and redraws by changing the
    salt (the Achlioptas 2001 sign-matrix JL construction)."""
    import hashlib

    return [
        [
            1.0
            if int(hashlib.md5(f"{i}|{j}{RP_SALT}".encode()).hexdigest()[0], 16) % 2 == 0
            else -1.0
            for i in range(DIM)
        ]
        for j in range(RP_DIM)
    ]


_RP_SIGNS = _rp_signs()


def rp_project(emb) -> "F.Column":
    """RP_DIM in-row sign-dot folds — no shuffle, no UDF.  Unscaled (the
    JL 1/sqrt(d) factor cancels in cosine)."""
    return F.array(*[
        dot(emb, F.array(*[F.lit(s) for s in row])) for row in _RP_SIGNS
    ])


def _rp_proj_sql(emb: str) -> str:
    cols = []
    for row in _RP_SIGNS:
        lits = "[" + ", ".join(f"{s:.1f}" for s in row) + "]"
        cols.append(
            f"list_sum(list_transform(list_zip({emb}, {lits}),"
            f" p -> p[1]::DOUBLE * p[2]::DOUBLE))"
        )
    return "[" + ",\n             ".join(cols) + "]"


@register(
    "sim_jl_projection_topk",
    oracle=f"""
    WITH proj AS (
      SELECT vec_id, {_rp_proj_sql('embedding')} AS p
      FROM embeddings)
    SELECT query_id, neighbor_id, proj_cos, rank FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {cosine_sql('q.p', 'c.p')} AS proj_cos,
             ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                ORDER BY {cosine_sql('q.p', 'c.p')} DESC,
                                         c.vec_id) AS rank
      FROM proj q JOIN proj c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < {N_QUERIES})
    WHERE rank <= {TOP_K}
    ORDER BY query_id, rank
    """,
    tags=("similarity", "ann", "projection", "jl"),
)
def sim_jl_projection_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k candidate generation in a Johnson-Lindenstrauss-reduced space:
    every embedding is projected DIM -> RP_DIM by a deterministic +-1 sign
    matrix (Achlioptas), and the brute-force cosine top-k runs on the
    8x-smaller vectors — the standard bandwidth lever when even int8 codes
    are too wide for a first-pass candidate scan.  At 100 TB the projected
    table is what gets cached hot; survivors re-rank against full vectors
    exactly like IVF-PQ's shortlist stage.

    Determinism: the sign matrix is md5-parity literals embedded in BOTH
    engines; projections are the shared left-fold dot; identical doubles
    in, identical ranks out.  Scale: projection is in-row (zero shuffles),
    the scan is one pass with broadcast queries, top-k is
    TakeOrderedAndProject via the rank-filter window.
    """
    e = load(spark, sf_dir, "embeddings")
    p = e.select("vec_id", rp_project(F.col("embedding")).alias("p"))
    q = p.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("p").alias("qp")
    )
    c = p.select(F.col("vec_id").alias("neighbor_id"), F.col("p").alias("cp"))
    sim = cosine_similarity(F.col("qp"), F.col("cp"))
    w = Window.partitionBy("query_id").orderBy(F.desc("proj_cos"), F.asc("neighbor_id"))
    return (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("proj_cos"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .orderBy("query_id", "rank")
    )


# -- k-NN label evaluation ---------------------------------------------------

KNN_EVAL_K = 10
KNN_EVAL_PROBES = 64  # vec_id < this = the held-out probe set


@register(
    "sim_knn_label_accuracy",
    oracle=f"""
    WITH nn AS (
      SELECT query_id, actual, nl FROM (
        SELECT q.vec_id AS query_id, q.label AS actual, c.label AS nl,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                  ORDER BY {_COS_SQL} DESC, c.vec_id) AS rank
        FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        WHERE q.vec_id < {KNN_EVAL_PROBES})
      WHERE rank <= {KNN_EVAL_K}),
    votes AS (
      SELECT query_id, actual, nl, COUNT(*) AS v
      FROM nn GROUP BY query_id, actual, nl),
    pred AS (
      SELECT query_id, actual, nl AS predicted FROM (
        SELECT query_id, actual, nl, 
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY v DESC, nl) AS pk
        FROM votes)
      WHERE pk = 1)
    SELECT CAST(actual AS BIGINT) AS label,
           COUNT(*) AS n_probes,
           CAST(SUM(CASE WHEN predicted = actual THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct
    FROM pred GROUP BY actual ORDER BY label
    """,
    tags=("similarity", "knn", "eval", "embedding"),
)
def sim_knn_label_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-quality evaluation by k-NN label vote: for each probe
    vector, the KNN_EVAL_K cosine-nearest neighbors vote on its label
    (majority, smaller label on ties) and the per-label accuracy is
    rolled up — the standard representation-quality probe a training
    pipeline runs after producing an embedding column (does the space
    cluster by label?).

    Exactness: cosine scores are in-row array folds (deterministic
    summation order → identical doubles in both engines); ranking and
    voting are integer windows.  Scale: the probe set broadcasts like
    sim_bruteforce_topk — ONE corpus scan, per-probe top-k via
    WindowGroupLimit, vote + accuracy are tiny aggregations.  Swap the
    brute-force candidate stage for the IVF shortlist to evaluate at
    full corpus scale.
    """
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < KNN_EVAL_PROBES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("label").alias("actual"),
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        F.col("label").alias("nl"),
    )
    sim = cosine_similarity(F.col("qe"), F.col("ce"))
    w_rank = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    nn = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "actual", "nl", sim.alias("cos_sim"), "neighbor_id")
        .withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= KNN_EVAL_K)
    )
    votes = nn.groupBy("query_id", "actual", "nl").agg(
        F.count(F.lit(1)).alias("v")
    )
    w_vote = Window.partitionBy("query_id").orderBy(F.desc("v"), F.asc("nl"))
    pred = (
        votes.withColumn("pk", F.row_number().over(w_vote))
        .filter(F.col("pk") == 1)
        .select("query_id", "actual", F.col("nl").alias("predicted"))
    )
    return (
        pred.groupBy(F.col("actual").cast("long").alias("label"))
        .agg(
            F.count(F.lit(1)).alias("n_probes"),
            F.sum(
                F.when(F.col("predicted") == F.col("actual"), 1).otherwise(0)
            ).cast("long").alias("n_correct"),
        )
        .orderBy("label")
    )
