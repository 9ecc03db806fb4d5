"""Unit pins for the chunked parallel-prefix combinator (plans/prefix.py).

The catalog queries built on it (parts_pareto_classes, orders_rfm_segments)
are oracle-gated end-to-end; these tests pin the combinator itself against
the single-window reference semantics on adversarial shapes — heavy metric
ties (many rows per chunk boundary), n not divisible by k, n < k, and a
constant metric (every row in chunk 0).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from edgy_spark.plans.prefix import ntile_expr, ranked_prefix


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, v long, w long")


def _rows(n, seed=7):
    # deterministic pseudo-random with heavy ties: v in a 5-value domain
    rows = []
    x = seed
    for i in range(n):
        x = (x * 1103515245 + 12345) % (2**31)
        rows.append((i, x % 5, x % 1000))
    return rows


def test_ranked_prefix_matches_single_window_rank_and_cum(spark):
    df = _df(spark, _rows(257))
    for descending in (False, True):
        got = ranked_prefix(
            df, "v", descending=descending, tiebreak=["id"],
            rank_col="rk", prefix="w", cum_col="cum", total_col="tot",
            n_chunks=8,
        )
        order = [F.desc("v") if descending else F.asc("v"), F.asc("id")]
        ref_w = Window.orderBy(*order)
        ref = df.select(
            "id",
            F.row_number().over(ref_w).cast("long").alias("rk"),
            F.sum("w").over(
                ref_w.rowsBetween(Window.unboundedPreceding, 0)
            ).alias("cum"),
        )
        got_m = {r["id"]: (r["rk"], int(r["cum"]), int(r["tot"]), r["n_total"])
                 for r in got.collect()}
        tot = sum(r[2] for r in _rows(257))
        for r in ref.collect():
            rk, cum, t, n = got_m[r["id"]]
            assert (rk, cum) == (r["rk"], int(r["cum"])), (descending, r["id"])
            assert t == tot and n == 257


def test_ntile_expr_matches_spark_ntile(spark):
    # n = 257 (not divisible), k in {2, 5, 7}; also n < k via a slice
    for n, k in [(257, 5), (257, 2), (257, 7), (3, 5)]:
        df = _df(spark, _rows(n))
        got = ranked_prefix(
            df, "v", descending=True, tiebreak=["id"],
            rank_col="rk", n_col="n", n_chunks=8,
        ).select("id", ntile_expr("rk", "n", k).alias("b"))
        ref_w = Window.orderBy(F.desc("v"), F.asc("id"))
        ref = df.select("id", F.ntile(k).over(ref_w).cast("long").alias("b"))
        got_m = {r["id"]: r["b"] for r in got.collect()}
        for r in ref.collect():
            assert got_m[r["id"]] == r["b"], (n, k, r["id"])


def test_ranked_prefix_constant_metric_fans_out_by_tiebreak(spark):
    # hi == lo is the WORST skew case: with metric-only chunking every row
    # would serialize into chunk 0 (the review-r13 skew floor).  The
    # tiebreak refinement must spread the single value across chunks while
    # ranks stay the tiebreak order.
    df = _df(spark, [(i, 42, i * 10) for i in range(20)])
    got = ranked_prefix(
        df, "v", descending=True, tiebreak=["id"],
        rank_col="rk", prefix="w", cum_col="cum", total_col="tot",
        n_chunks=8, chunk_col="ck",
    )
    rows = {r["id"]: r for r in got.collect()}
    cum = 0
    for i in range(20):
        cum += i * 10
        assert rows[i]["rk"] == i + 1
        assert int(rows[i]["cum"]) == cum
    spread = {r["ck"] for r in rows.values()}
    assert len(spread) >= 6  # 20 rows over 8 tiebreak-range sub-chunks
    assert max(
        sum(1 for r in rows.values() if r["ck"] == c) for c in spread
    ) <= 3


def test_ranked_prefix_rejects_non_integral_tiebreak(spark):
    # a silently-NULL chunk id would DROP rows through the offsets join
    # (review r13 second pass) — the combinator must refuse loudly instead
    import pytest

    df = spark.createDataFrame(
        [(i, 1, f"k{i}") for i in range(5)], "id long, v long, name string"
    )
    with pytest.raises(ValueError, match="integral"):
        ranked_prefix(df, "v", descending=False, tiebreak=["name"])


def test_ranked_prefix_empty_tiebreak_unique_metric(spark):
    # a unique metric needs no tiebreak: ranks must come out exact with
    # plain value-range chunking (pre-refinement behavior preserved)
    df = _df(spark, [(i, 1000 - i, i) for i in range(30)])
    got = ranked_prefix(
        df, "v", descending=True, tiebreak=[], rank_col="rk", n_chunks=8
    )
    for r in got.collect():
        assert r["rk"] == r["id"] + 1  # v = 1000 - id, descending


def test_ranked_prefix_low_cardinality_metric_subchunks(spark):
    # 2-value modal metric, n_chunks=8 → 4 sub-chunks per value: the modal
    # value's population must fan out, and chunk-major order must equal
    # the global (metric desc, id asc) order so ranks are exact.
    rows_in = [(i, 1 if i % 5 else 0, i) for i in range(40)]
    df = _df(spark, rows_in)
    got = ranked_prefix(
        df, "v", descending=True, tiebreak=["id"],
        rank_col="rk", n_col="n", n_chunks=8, chunk_col="ck",
    )
    ref_w = Window.orderBy(F.desc("v"), F.asc("id"))
    ref = {r["id"]: r["rk"] for r in df.select(
        "id", F.row_number().over(ref_w).cast("long").alias("rk")
    ).collect()}
    got_rows = got.collect()
    for r in got_rows:
        assert r["rk"] == ref[r["id"]], r["id"]
    modal_chunks = {r["ck"] for r in got_rows if r["id"] % 5}
    assert len(modal_chunks) >= 3  # 32 modal rows spread over sub-chunks


def test_ranked_prefix_null_sort_key_raises_not_drops(spark):
    # a NULL metric or first-tiebreak value would NULL the chunk id and
    # the inner offsets join would silently drop the row — the combinator
    # must raise at runtime instead (review r13 ADVICE)
    import pytest

    bad_metric = spark.createDataFrame(
        [(1, 10, 0), (2, None, 0)], "id long, v long, w long"
    )
    with pytest.raises(Exception, match="NULL"):
        ranked_prefix(bad_metric, "v", descending=True, tiebreak=["id"]).collect()

    bad_tb = spark.createDataFrame(
        [(1, 10, 0), (None, 10, 0)], "id long, v long, w long"
    )
    with pytest.raises(Exception, match="NULL"):
        ranked_prefix(bad_tb, "v", descending=True, tiebreak=["id"]).collect()
