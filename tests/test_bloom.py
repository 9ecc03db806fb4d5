"""Bloom-filter join pruning (plans/bloom.py): no false negatives, real
pruning, transparent composition with the exact join, singleton broadcast."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from edgy_spark.plans.bloom import DEFAULT_BITS, bloom_build, bloom_prune


def _frames(spark):
    # probe: 5000 rows over keys 0..999; build: the 100 keys divisible by 10
    probe = spark.range(0, 5000).select(
        (F.col("id") % 1000).alias("k"), F.col("id").alias("p_val")
    )
    build = spark.range(0, 100).select((F.col("id") * 10).alias("k"))
    return probe, build


def test_no_false_negatives(spark):
    """Every probe row whose key IS in the build set must survive the prune."""
    probe, build = _frames(spark)
    bloom = bloom_build(build, "k")
    pruned = bloom_prune(probe, "k", bloom)
    true_matches = probe.join(build.distinct(), "k", "left_semi")
    missed = true_matches.exceptAll(pruned.select("k", "p_val"))
    assert missed.count() == 0


def test_prunes_most_non_matches(spark):
    """With 100 keys in a 64 Ki-bit filter (k=3) the fp rate is far below
    1%; at 10% true selectivity the pruned row count must sit close to the
    true match count — certainly under double it."""
    probe, build = _frames(spark)
    bloom = bloom_build(build, "k")
    n_pruned = bloom_prune(probe, "k", bloom).count()
    n_true = probe.join(build.distinct(), "k", "left_semi").count()
    assert n_true <= n_pruned < 2 * n_true
    assert n_pruned < probe.count()


def test_composed_join_equals_plain_join(spark):
    """Prune → exact join == plain join, multiplicity included (the
    transparency property the registered query's oracle hashes)."""
    probe, build = _frames(spark)
    bloom = bloom_build(build, "k")
    composed = bloom_prune(probe, "k", bloom).join(build, "k")
    plain = probe.join(build, "k")
    assert sorted(map(tuple, composed.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_empty_build_side_prunes_everything(spark):
    probe, build = _frames(spark)
    bloom = bloom_build(build.filter(F.lit(False)), "k")
    assert bloom_prune(probe, "k", bloom).count() == 0


def test_filter_is_one_broadcast_row_and_no_shuffle_on_probe(spark):
    """The bitset must be a single row riding a broadcast nested-loop join;
    the probe side must reach it without an exchange of its own.  Plan text
    prints parent-then-children with the STREAMED child first, so the probe
    subtree is the segment between the join line and the broadcast wrapper
    of the build side — the bloom-build aggregation's own (tiny) exchanges
    live after that wrapper and are expected."""
    import re

    probe, build = _frames(spark)
    bloom = bloom_build(build, "k")
    assert bloom.count() == 1
    plan = bloom_prune(probe, "k", bloom)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    after = plan.split("BroadcastNestedLoopJoin", 1)[1]
    streamed = re.split(r"Broadcast(?:Exchange|QueryStage)", after, 1)[0]
    assert "Range" in streamed  # the probe subtree was actually captured
    assert "Exchange" not in streamed  # probe feeds the prune shuffle-free


def test_null_keys_are_transparent(spark):
    """NULL build keys must not crash the build (and set no bits); NULL
    probe keys are dropped by the prune exactly as the exact join drops
    them — the transparency contract covers null keys too."""
    probe, build = _frames(spark)
    null_row = spark.sql("SELECT CAST(NULL AS BIGINT) AS k")
    build_n = build.unionByName(null_row)
    probe_n = probe.unionByName(null_row.select("k", F.lit(-1).alias("p_val")))
    bloom = bloom_build(build_n, "k")
    composed = bloom_prune(probe_n, "k", bloom).join(build_n, "k")
    plain = probe_n.join(build_n, "k")
    assert sorted(map(tuple, composed.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_rejects_bad_bit_sizes(spark):
    probe, build = _frames(spark)
    with pytest.raises(ValueError):
        bloom_build(build, "k", n_bits=1000)  # not a power of two
    with pytest.raises(ValueError):
        bloom_prune(probe, "k", bloom_build(build, "k"), n_bits=32)


def test_probe_accepts_default_and_custom_sizes(spark):
    """Same data, smaller filter: still zero false negatives (fp rate just
    rises), and sizes must match between build and probe for correctness."""
    probe, build = _frames(spark)
    for n_bits in (1 << 10, DEFAULT_BITS):
        bloom = bloom_build(build, "k", n_bits=n_bits)
        pruned = bloom_prune(probe, "k", bloom, n_bits=n_bits)
        true_matches = probe.join(build.distinct(), "k", "left_semi")
        assert true_matches.exceptAll(pruned.select("k", "p_val")).count() == 0
