"""Property-based pins (hypothesis) for the semantics the engine's
correctness story leans on:

- bag algebra: ``exceptAll`` must implement Haskell ``Data.List.(\\)``'s
  one-occurrence-per-right-element multiset difference (SURVEY §7.4 trap 1 —
  the reference's ``missingTools`` depends on it, app/Main.hs:157);
- union is bag-additive, anti-join removes every occurrence (the documented
  delta between ``minus_bag`` and ``anti`` in edgy_spark.query);
- the exact-DECIMAL aggregation convention is partitioning-invariant: the
  same sum, bit-for-bit, no matter how rows are distributed — the property
  that lets a 1000-executor reduction hash-match a single-threaded oracle.
"""

from __future__ import annotations

from collections import Counter
from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from edgy_spark.functions.exact import dec, to_dbl

bag = st.lists(st.integers(min_value=0, max_value=5), max_size=12)

PROP = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _bag_df(spark, xs):
    return spark.createDataFrame([(int(x),) for x in xs], "id long") if xs else \
        spark.createDataFrame([], "id long")


def _counts(df) -> Counter:
    return Counter(r.id for r in df.collect())


@PROP
@given(a=bag, b=bag)
def test_except_all_is_haskell_bag_difference(spark, a, b):
    got = _counts(_bag_df(spark, a).exceptAll(_bag_df(spark, b)))
    ca, cb = Counter(a), Counter(b)
    want = Counter({v: ca[v] - cb[v] for v in ca if ca[v] - cb[v] > 0})
    assert got == want


@PROP
@given(a=bag, b=bag)
def test_union_all_is_bag_additive(spark, a, b):
    got = _counts(_bag_df(spark, a).unionAll(_bag_df(spark, b)))
    assert got == Counter(a) + Counter(b)


@PROP
@given(a=bag, b=bag)
def test_anti_join_removes_all_occurrences(spark, a, b):
    got = _counts(
        _bag_df(spark, a).join(_bag_df(spark, b), "id", "left_anti")
    )
    want = Counter({v: c for v, c in Counter(a).items() if v not in set(b)})
    assert got == want


cents = st.lists(
    st.integers(min_value=-10**9, max_value=10**9), min_size=1, max_size=40
)


@PROP
@given(xs=cents, nparts=st.integers(min_value=1, max_value=7))
def test_decimal_sum_is_partitioning_invariant(spark, xs, nparts):
    """SUM over exact DECIMAL equals the true rational sum for ANY partition
    layout — double summation would drift with reduction order instead."""
    vals = [x / 100 for x in xs]  # 2-decimal doubles, the money-column shape
    df = spark.createDataFrame([(v,) for v in vals], "v double").repartition(nparts)
    got = df.agg(to_dbl(F.sum(dec("v", 2)), 2).alias("s")).collect()[0].s
    want = float(sum(Decimal(x) for x in xs) / 100)
    assert got == want
