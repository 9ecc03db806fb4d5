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


def test_ranked_prefix_constant_metric_single_chunk(spark):
    # hi == lo: the span denominator is 1 and every row lands in chunk 0;
    # rank must still be the tiebreak order
    df = _df(spark, [(i, 42, i * 10) for i in range(20)])
    got = ranked_prefix(
        df, "v", descending=True, tiebreak=["id"],
        rank_col="rk", prefix="w", cum_col="cum", total_col="tot",
    )
    rows = {r["id"]: r for r in got.collect()}
    cum = 0
    for i in range(20):
        cum += i * 10
        assert rows[i]["rk"] == i + 1
        assert int(rows[i]["cum"]) == cum
