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


# -- storage model property -------------------------------------------------

# small op vocabulary: each element is (kind, payload)
_store_ops = st.lists(
    st.one_of(
        st.tuples(st.just("txn_add"), st.integers(0, 99)),         # new node via Engine
        st.tuples(st.just("bulk_append"), st.integers(0, 99)),     # writer append
        st.tuples(st.just("maintain"), st.just(0)),                # compact+vacuum
    ),
    min_size=1,
    max_size=6,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_store_ops)
def test_store_matches_model_under_random_interleavings(spark, tmp_path_factory, ops):
    """Random interleavings of Engine transactions, data-source bulk
    appends, and maintenance must always read back exactly the model's
    name multiset, and the id counter never collides."""
    from edgy_spark.demo import demo_schema
    from edgy_spark.graph import Engine
    from edgy_spark.sources.pysource import register_edgy_source

    register_edgy_source(spark)
    root = str(tmp_path_factory.mktemp("prop") / "db")
    engine = Engine(spark, root, demo_schema())
    model: list[str] = []
    for i, (kind, v) in enumerate(ops):
        if kind == "txn_add":
            name = f"T{i}_{v}"
            engine.run(lambda t, name=name, v=v: t.new_node("Person", name=name, age=v))
            model.append(name)
        elif kind == "bulk_append":
            name = f"B{i}_{v}"
            # the writer enforces ids >= the store's id cursor (collision +
            # CDC-slice invariant), so a well-behaved bulk loader reads the
            # cursor first — as this one does
            bulk_id = engine.store.snapshot().manifest["next_id"]
            (
                spark.createDataFrame(
                    [(bulk_id, name, v)], "id long, name string, age long"
                )
                .write.format("edgy")
                .option("root", root)
                .option("table", "n_Person")
                .mode("append")
                .save()
            )
            model.append(name)
        else:
            engine.store.compact(min_files=4)
            engine.store.vacuum(retain_versions=2)
    got = sorted(r["name"] for r in engine.snapshot().nodes("Person").collect())
    assert got == sorted(model)
    ids = [r["id"] for r in engine.snapshot().nodes("Person").collect()]
    assert len(ids) == len(set(ids)), "id collision"


def test_spread_is_noop_when_scan_is_wide(spark):
    """_spread must NOT shuffle a scan that is already at least as parallel
    as the session — at 100 TB an unconditional repartition would move the
    entire text payload once before any work."""
    from edgy_spark.operators.dedup import _spread

    target = int(spark.conf.get("spark.sql.shuffle.partitions"))
    wide = spark.range(1000).repartition(target + 4)
    assert _spread(spark, wide) is wide  # identical object: no-op
    narrow = spark.range(1000).coalesce(1)
    assert _spread(spark, narrow).rdd.getNumPartitions() == target
