"""Approximate / sketch operators — the actual 100 TB scale path.

Exact ``COUNT(DISTINCT)`` and exact percentiles need a full shuffle of the
keyed data (or a full sort); at 100 TB the standard answer is mergeable
sketches: HyperLogLog for cardinality, GK/t-digest summaries for quantiles.
Spark ships both (``approx_count_distinct``, ``hll_sketch_agg`` +
``hll_union_agg`` [Apache DataSketches], ``percentile_approx``), and they
aggregate map-side with tiny fixed-size state — the shuffle carries
kilobyte sketches instead of the key universe.

Oracle strategy: a hash-exact comparator cannot check an estimate directly,
so each query emits (a) the EXACT value, hash-checked against DuckDB, and
(b) a boolean asserting the sketch estimate landed inside its published
error bound, which the oracle asserts as a constant TRUE.  That keeps the
driver's exact gate meaningful while still executing the sketch path for
real.  (Both sketch aggregates are deterministic for fixed input data —
hashing is seed-fixed and the merges are commutative — so the booleans are
stable across partitionings.)

No reference counterpart (cdsmith/edgy's complete API is src/Edgy.hs:12-46
— no aggregation at all); scope comes from BASELINE.json's north-star list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from edgy_spark.catalog import register
from edgy_spark.functions.exact import dec
from edgy_spark.sources import load

# ---------------------------------------------------------------------------
# HLL cardinality with error bound
# ---------------------------------------------------------------------------

@register(
    "sketch_distinct_users_bounded",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_exact,
           TRUE AS approx_within_3se
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("sketch", "hll", "aggregation"),
)
def sketch_distinct_users_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type distinct users: exact count (hash-checked) alongside an
    HLL++ ``approx_count_distinct`` (rsd=0.05) asserted within a
    3-standard-error radius (3 x 5% = 15% of exact — the ~99.7% band
    for the estimator; the column name says what is actually asserted).

    Scale: the exact branch shuffles every (event_type, user_id) pair; the
    HLL branch shuffles one ~kB sketch per event_type per map task.  At
    100 TB only the sketch branch survives — the exact column here is the
    local-correctness anchor the oracle can hash.
    """
    ev = load(spark, sf_dir, "events").select("event_type", "user_id")
    agg = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_exact"),
        F.approx_count_distinct("user_id", rsd=0.05).alias("n_approx"),
    )
    ok = (
        F.abs(F.col("n_approx") - F.col("n_exact"))
        <= 0.05 * 3 * F.col("n_exact")  # 3 standard-error radius (rsd=0.05)
    )
    return (
        agg.select("event_type", "n_exact", ok.alias("approx_within_3se"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# DataSketches HLL: build per-day partial sketches, merge across days
# ---------------------------------------------------------------------------

@register(
    "sketch_hll_mergeable_rollup",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_exact,
           COUNT(DISTINCT CAST(ts AS DATE)) AS n_days,
           TRUE AS merged_within_5pct
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("sketch", "hll", "rollup"),
)
def sketch_hll_mergeable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-aggregated rollup pattern: build one DataSketches HLL sketch
    per (event_type, day), then ``hll_union_agg`` the daily partials into a
    per-type estimate — exactly how a 100 TB pipeline maintains daily
    sketch tables and answers range-cardinality queries without rescanning
    raw events.  The estimate is asserted within 5% of the exact count
    (lgConfigK=14 → rsd ~0.8%, so 5% is a safe bound); day count is exact.
    """
    ev = load(spark, sf_dir, "events").select(
        "event_type", "user_id", F.to_date("ts").alias("day")
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sketch")
    )
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("n_merged"),
        F.count(F.lit(1)).alias("n_days"),
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_exact")
    )
    joined = merged.join(exact, "event_type")
    ok = F.abs(F.col("n_merged") - F.col("n_exact")) <= 0.05 * F.col("n_exact")
    return (
        joined.select("event_type", "n_exact", "n_days", ok.alias("merged_within_5pct"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# approximate quantiles with error bound
# ---------------------------------------------------------------------------

@register(
    "sketch_price_quantile_bounded",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           quantile_cont(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT), 0.5)
             AS p50_cents_exact,
           TRUE AS approx_within_rank_bound
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("sketch", "percentile", "aggregation"),
)
def sketch_price_quantile_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median order value per priority: exact percentile over integer cents
    (hash-checked; interpolation at rank+0.5 is binary-exact) alongside
    ``percentile_approx`` (GK summary, accuracy=10000) asserted within a
    1%-of-spread bound.

    Scale: exact percentile sorts each group; the GK sketch is a bounded
    ~accuracy-sized mergeable summary built map-side — the 100 TB path.
    """
    o = load(spark, sf_dir, "orders")
    cents = (dec("o_totalprice", 2, 12) * 100).cast("long")
    agg = (
        o.select("o_orderpriority", cents.alias("cents"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.percentile("cents", 0.5).alias("p50_cents_exact"),
            F.percentile_approx("cents", F.lit(0.5), F.lit(10000)).alias("p50_approx"),
            F.max("cents").alias("hi"),
            F.min("cents").alias("lo"),
        )
    )
    ok = F.abs(F.col("p50_approx") - F.col("p50_cents_exact")) <= (
        0.01 * (F.col("hi") - F.col("lo")) + 1
    )
    return (
        agg.select(
            "o_orderpriority",
            "n_orders",
            "p50_cents_exact",
            ok.alias("approx_within_rank_bound"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# heavy hitters (approx_top_k frequency sketch)
# ---------------------------------------------------------------------------

HH_K = 10
HH_SKETCH_K = 50          # probe depth: > vocab here, << vocab in production
HH_MAX_TRACKED = 65536    # sketch capacity (mergeable, ~kB per partition)


@register(
    "sketch_heavy_hitters_words",
    oracle=f"""
    WITH w AS (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+'))
                 AS word FROM documents),
    c AS (SELECT word, COUNT(*) AS n_exact FROM w GROUP BY word)
    SELECT word, n_exact, TRUE AS sketch_agrees
    FROM c ORDER BY n_exact DESC, word LIMIT {HH_K}
    """,
    tags=("sketch", "heavy-hitters", "text"),
)
def sketch_heavy_hitters_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K most frequent corpus words: exact counts (hash-checked)
    alongside an ``approx_top_k`` frequency sketch asserted to agree.

    The heavy-hitters sketch is THE way to find hot keys / hot tokens /
    hot URLs at 100 TB: it is mergeable (map-side partials, kilobytes per
    partition) where the exact branch must shuffle the full token stream.
    This fixture's vocabulary fits the sketch capacity, so the estimates
    are exactly the true counts and ``sketch_agrees`` asserts equality; at
    production vocabularies the same query shape holds with the assertion
    relaxed to the sketch's epsilon band.  The probe depth (50) exceeds K
    so rank-boundary ties cannot hide a true heavy hitter from the
    membership check.
    """
    d = load(spark, sf_dir, "documents")
    w = d.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("word")
    )
    exact = (
        w.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .orderBy(F.desc("n_exact"), "word")
        .limit(HH_K)
    )
    sketch = (
        w.agg(
            F.expr(
                f"approx_top_k(word, {HH_SKETCH_K}, {HH_MAX_TRACKED})"
            ).alias("tk")
        )
        .select(F.explode("tk").alias("e"))
        .select(F.col("e.item").alias("word"), F.col("e.count").alias("n_est"))
    )
    return (
        exact.join(F.broadcast(sketch), "word", "left")
        .select(
            "word",
            "n_exact",
            # a heavy hitter MISSING from the sketch is a disagreement
            # (FALSE), not an unknown (NULL == x would yield NULL)
            (
                F.col("n_est").isNotNull()
                & (F.col("n_est") == F.col("n_exact"))
            ).alias("sketch_agrees"),
        )
        .orderBy(F.desc("n_exact"), "word")
    )


# ---------------------------------------------------------------------------
# count-min sketch (point-frequency estimates over a keyed stream)
# ---------------------------------------------------------------------------

CMS_EPS = 0.001     # estimate slack: eps * total adds
CMS_CONF = 0.99
CMS_SEED = 42
CMS_TOP = 10


@register(
    "sketch_count_min_user_counts",
    oracle=f"""
    SELECT CAST(user_id AS BIGINT) AS user_id,
           COUNT(*) AS n_exact,
           TRUE AS cms_within_eps
    FROM events
    GROUP BY user_id
    ORDER BY n_exact DESC, user_id
    LIMIT {CMS_TOP}
    """,
    tags=("sketch", "count-min", "aggregation"),
)
def sketch_count_min_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event counts for the top-{CMS_TOP} users: exact counts
    (hash-checked) alongside a Count-Min sketch probe asserted inside the
    CMS guarantee (estimate >= exact, and <= exact + eps * total-adds).

    The CMS is the point-frequency twin of approx_top_k's heavy-hitter
    list: fixed (d x w) integer cells, built with ``count_min_sketch``
    map-side partials that merge by cell-wise addition — so at 100 TB the
    shuffle carries one ~100 kB sketch per task while the exact branch
    shuffles every (user, 1).  Probing goes through Spark's own JVM sketch
    (``CountMinSketch.readFrom`` via the gateway — the sketch is a single
    driver-sized binary row, like similarity.py's k centroid collects);
    keys are added and probed as strings so both sides hash identically.
    Fixed seed + commutative merges make the estimates deterministic
    across partitionings.
    """
    ev = load(spark, sf_dir, "events").select(
        F.col("user_id").cast("long").alias("user_id")
    )
    exact = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .orderBy(F.desc("n_exact"), "user_id")
        .limit(CMS_TOP)
    )
    sk_row = ev.agg(
        F.count_min_sketch(
            F.col("user_id").cast("string"),
            F.lit(CMS_EPS),
            F.lit(CMS_CONF),
            F.lit(CMS_SEED),
        ).alias("s"),
        F.count(F.lit(1)).alias("total"),
    ).head()
    jcms = spark._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytes(sk_row["s"])
    )
    slack = int(CMS_EPS * sk_row["total"]) + 1
    top = exact.collect()  # CMS_TOP rows — the k-sized probe set, ONE run
    # the exact aggregation already executed for the collect; assemble the
    # k-row result driver-side instead of re-executing the plan in a join
    probed = [
        (
            r["user_id"],
            r["n_exact"],
            r["n_exact"]
            <= int(jcms.estimateCount(str(r["user_id"])))
            <= r["n_exact"] + slack,
        )
        for r in top
    ]
    return spark.createDataFrame(
        probed, "user_id long, n_exact long, cms_within_eps boolean"
    ).orderBy(F.desc("n_exact"), "user_id")


# ---------------------------------------------------------------------------
# HLL set algebra: intersection estimates via inclusion-exclusion
# ---------------------------------------------------------------------------

#: Audience-overlap pairs probed by the intersection estimator.
HLL_IX_PAIRS = [("view", "purchase"), ("click", "purchase"), ("signup", "error")]
HLL_IX_RSD = 0.05


@register(
    "sketch_hll_intersection_users",
    oracle="""
    WITH sets AS (SELECT user_id, event_type FROM events GROUP BY ALL)
    SELECT a.type_a, a.type_b, a.n_exact_intersection, TRUE AS approx_within_bound
    FROM (
      SELECT 'view' AS type_a, 'purchase' AS type_b,
             (SELECT COUNT(*) FROM (SELECT user_id FROM sets WHERE event_type='view'
                                    INTERSECT
                                    SELECT user_id FROM sets WHERE event_type='purchase'))
               AS n_exact_intersection
      UNION ALL
      SELECT 'click', 'purchase',
             (SELECT COUNT(*) FROM (SELECT user_id FROM sets WHERE event_type='click'
                                    INTERSECT
                                    SELECT user_id FROM sets WHERE event_type='purchase'))
      UNION ALL
      SELECT 'signup', 'error',
             (SELECT COUNT(*) FROM (SELECT user_id FROM sets WHERE event_type='signup'
                                    INTERSECT
                                    SELECT user_id FROM sets WHERE event_type='error'))
    ) a
    ORDER BY type_a, type_b
    """,
    tags=("sketch", "hll", "set-algebra"),
)
def sketch_hll_intersection_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap by HLL set algebra: |A n B| estimated as
    est(A) + est(B) - est(A u B) (inclusion-exclusion over three HLL++
    estimates — HLLs union losslessly but cannot intersect, so this is
    THE sketch recipe for overlap), asserted against the exact
    intersection within a conservative radius of
    3 * rsd * (est(A) + est(B) + est(AuB)) — each term's ~99.7% band,
    summed, since inclusion-exclusion error compounds absolutely (the
    estimate's RELATIVE error degrades as the overlap shrinks relative
    to the union; the bound stays honest either way).

    Scale: one pass over events — the exact branch shuffles distinct
    (user, type) pairs and per-user type sets; the sketch branch ships
    three ~kB sketches per pair per map task.  At 100 TB the exact
    branch drops and per-type HLL sketches come precomputed from the
    mergeable rollup (sketch_hll_mergeable_rollup) — intersection then
    costs three sketch merges, zero data passes.
    """
    ev = load(spark, sf_dir, "events").select("event_type", "user_id")

    def _u(types: list[str]):
        return F.when(F.col("event_type").isin(types), F.col("user_id"))

    # per-user type sets: ONE distinct shuffle feeds every exact count
    usersets = ev.groupBy("user_id").agg(
        F.collect_set("event_type").alias("types")
    )
    rows = []
    for ta, tb in HLL_IX_PAIRS:
        exact = usersets.filter(
            F.array_contains("types", ta) & F.array_contains("types", tb)
        ).agg(F.count(F.lit(1)).alias("n_exact_intersection"))
        ests = ev.agg(
            F.approx_count_distinct(_u([ta]), rsd=HLL_IX_RSD).alias("ea"),
            F.approx_count_distinct(_u([tb]), rsd=HLL_IX_RSD).alias("eb"),
            F.approx_count_distinct(_u([ta, tb]), rsd=HLL_IX_RSD).alias("eab"),
        )
        est = ests.select(
            (F.col("ea") + F.col("eb") - F.col("eab")).alias("ix_est"),
            (F.col("ea") + F.col("eb") + F.col("eab")).alias("bound_base"),
        )
        rows.append(
            exact.crossJoin(est).select(  # two single-row locals
                F.lit(ta).alias("type_a"),
                F.lit(tb).alias("type_b"),
                "n_exact_intersection",
                (
                    F.abs(F.col("ix_est") - F.col("n_exact_intersection"))
                    <= 3 * HLL_IX_RSD * F.col("bound_base")
                ).alias("approx_within_bound"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out.orderBy("type_a", "type_b")
