"""salted_join must equal the plain join exactly (multiplicity included),
and skew_profile must surface the heavy hitter."""

from __future__ import annotations

from pyspark.sql import functions as F

from edgy_spark.plans.skew import salted_join, skew_profile


def _skewed_frames(spark):
    # probe: key 7 owns ~90% of rows; build: a few rows per key incl. dups
    probe = spark.range(0, 2000).select(
        F.when(F.col("id") < 1800, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("p_val"),
    )
    build = spark.range(0, 120).select(
        (F.col("id") % 60).alias("k"), F.col("id").alias("b_val")
    )
    return probe, build


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_inner_join_equals_plain(spark):
    probe, build = _skewed_frames(spark)
    plain = probe.join(build, "k", "inner")
    salted = salted_join(probe, build, "k", n_salts=8, hot_threshold_rows=100)
    assert _sorted_rows(salted.select("k", "p_val", "b_val")) == _sorted_rows(
        plain.select("k", "p_val", "b_val")
    )


def test_salted_left_join_equals_plain(spark):
    probe, build = _skewed_frames(spark)
    # make some probe keys unmatched on the build side
    build = build.filter(F.col("k") != 3)
    plain = probe.join(build, "k", "left")
    salted = salted_join(probe, build, "k", n_salts=8, hot_threshold_rows=100, how="left")
    assert _sorted_rows(salted.select("k", "p_val", "b_val")) == _sorted_rows(
        plain.select("k", "p_val", "b_val")
    )


def test_salted_join_actually_salts(spark):
    """The hot key's probe rows must spread over >1 salt bucket."""
    probe, build = _skewed_frames(spark)
    hot = (
        probe.groupBy("k").agg(F.count(F.lit(1)).alias("n")).filter(F.col("n") >= 100)
    )
    assert hot.count() == 1  # sanity: exactly one hot key (7)
    p_salted = probe.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in probe.columns]), F.lit(8)).cast("int"),
    )
    n_buckets = (
        p_salted.filter(F.col("k") == 7).select("__salt").distinct().count()
    )
    assert n_buckets > 1


def test_salt_assignment_is_reproducible(spark):
    """The salt is a pure function of the row (pmod(xxhash64(*cols), n)) —
    two independent evaluations deal identical rows to identical salts, so
    retries/AQE replans rebuild the same physical layout."""
    probe, _ = _skewed_frames(spark)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in probe.columns]), F.lit(8)).cast("int")
    a = sorted(map(tuple, probe.withColumn("__salt", salt).collect()))
    b = sorted(map(tuple, probe.withColumn("__salt", salt).collect()))
    assert a == b


def test_skew_profile_finds_heavy_hitter(spark):
    probe, _ = _skewed_frames(spark)
    top = skew_profile(probe, "k", top=3).collect()
    assert top[0]["k"] == 7
    assert top[0]["row_share"] > 0.8
    assert top[0]["skew_multiple"] > 10
