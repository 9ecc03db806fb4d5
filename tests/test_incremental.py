"""Incremental aggregate maintenance (operators/incremental.py) over the
engine's full change capture: a maintained rollup must equal the
from-scratch recompute bit-for-bit across inserts, group-moving updates,
no-op updates, and deletes — applied in several maintenance steps."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from edgy_spark.graph import Engine
from edgy_spark.operators.incremental import (
    maintain_rollup,
    rollup_aggregate,
)
from edgy_spark.schema import Attr, GraphSchema, NodeType, optional


def _schema() -> GraphSchema:
    return GraphSchema(
        (NodeType("Acct", (Attr("region"), optional("balance", "long", default=0))),)
    )


def _rows(df):
    rows = map(tuple, df.select("region", "n", "sum_balance").collect())
    # NULL region sorts last (tuples with None don't compare to str)
    return sorted(rows, key=lambda t: (t[0] is None, t[0] or "", t[1], t[2]))


def test_maintained_rollup_equals_recompute_across_steps(spark, tmp_path):
    engine = Engine(spark, str(tmp_path / "db"), _schema(), capture_cdc="full")

    made = engine.run(
        lambda t: [
            t.new_node("Acct", region=r, balance=b)
            for r, b in (("eu", 10), ("eu", 5), ("us", 7))
        ]
    )
    v1 = engine.store.current_version()
    agg = rollup_aggregate(
        engine.snapshot().nodes("Acct"), ["region"], ["balance"]
    ).localCheckpoint()
    assert _rows(agg) == [("eu", 2, 15), ("us", 1, 7)]

    # step 2: insert + measure update + GROUP-MOVING update + no-op update
    def step2(t):
        t.new_node("Acct", region="ap", balance=100)
        t.set_attribute(made[0], "balance", 11)   # eu: 10 -> 11
        t.set_attribute(made[2], "region", "eu")  # us -> eu (7 moves)
        t.set_attribute(made[1], "balance", 5)    # no-op: cancels exactly

    engine.run(step2)
    # step 3 (separate commit): delete one account
    engine.run(lambda t: t.delete_node(made[1]))  # eu loses (1, 5)

    agg, v = maintain_rollup(
        engine.store, "n_Acct", agg, ["region"], ["balance"], v1
    )
    want = rollup_aggregate(engine.snapshot().nodes("Acct"), ["region"], ["balance"])
    assert _rows(agg) == _rows(want) == [("ap", 1, 100), ("eu", 2, 18)]
    # "us" emptied out and must have VANISHED, not linger at n=0
    assert not [r for r in agg.collect() if r["region"] == "us"]

    # maintain again from the new cursor: a group dying and reappearing
    engine.run(lambda t: t.new_node("Acct", region="us", balance=1))
    agg, v = maintain_rollup(engine.store, "n_Acct", agg, ["region"], ["balance"], v)
    want = rollup_aggregate(engine.snapshot().nodes("Acct"), ["region"], ["balance"])
    assert _rows(agg) == _rows(want)
    assert v == engine.store.current_version()


def test_maintenance_requires_full_capture_for_updates(spark, tmp_path):
    """Postimage-only capture cannot subtract an updated row's old
    contribution — the maintainer must fail loudly, not double-count."""
    engine = Engine(spark, str(tmp_path / "db"), _schema(), capture_cdc=True)
    a = engine.run(lambda t: t.new_node("Acct", region="eu", balance=10))
    v1 = engine.store.current_version()
    agg = rollup_aggregate(engine.snapshot().nodes("Acct"), ["region"], ["balance"])
    engine.run(lambda t: t.set_attribute(a, "balance", 99))
    with pytest.raises(ValueError, match="PREIMAGES"):
        maintain_rollup(engine.store, "n_Acct", agg, ["region"], ["balance"], v1)
    # insert/delete-only ranges stay maintainable without preimages
    engine2 = Engine(spark, str(tmp_path / "db2"), _schema(), capture_cdc=True)
    b = engine2.run(lambda t: t.new_node("Acct", region="eu", balance=1))
    v1 = engine2.store.current_version()
    agg = rollup_aggregate(engine2.snapshot().nodes("Acct"), ["region"], ["balance"])
    engine2.run(lambda t: t.new_node("Acct", region="eu", balance=2))
    engine2.run(lambda t: t.delete_node(b))
    agg, _ = maintain_rollup(engine2.store, "n_Acct", agg, ["region"], ["balance"], v1)
    assert _rows(agg) == [("eu", 1, 2)]


def test_full_capture_feed_carries_preimages_and_replicas_filter_them(spark, tmp_path):
    """capture_cdc='full' adds update_preimage rows to table_changes and
    the upsert stream (Delta CDF shape); a replica builder that filters
    them still converges to engine state."""
    from edgy_spark.sources.pysource import register_edgy_source

    engine = Engine(spark, str(tmp_path / "db"), _schema(), capture_cdc="full")
    a = engine.run(lambda t: t.new_node("Acct", region="eu", balance=10))
    register_edgy_source(spark)
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")

    def run_stream():
        q = (
            spark.readStream.format("edgy")
            .option("root", engine.store.root)
            .option("table", "n_Acct")
            .option("mode", "upsert")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_stream()  # pin offset at CURRENT
    engine.run(lambda t: t.set_attribute(a, "balance", 99))
    run_stream()
    rows = spark.read.parquet(out).collect()
    kinds = {r["_change"] for r in rows}
    assert kinds == {"update_preimage", "update_postimage"}
    pre = next(r for r in rows if r["_change"] == "update_preimage")
    post = next(r for r in rows if r["_change"] == "update_postimage")
    assert (pre["balance"], post["balance"]) == (10, 99)
    # replica apply: filter preimages (Delta CDF contract), then upsert
    replica = {}
    for r in rows:
        if r["_change"] == "delete":
            replica.pop(r["id"], None)
        elif r["_change"] != "update_preimage":
            replica[r["id"]] = r["balance"]
    want = {r["id"]: r["balance"] for r in engine.snapshot().nodes("Acct").collect()}
    assert replica == want


def test_null_group_keys_merge_null_safely(spark, tmp_path):
    """Review r08: a NULL group key must stay ONE group through the
    delta-apply join (groupBy semantics), not split into duplicate rows."""
    sch = GraphSchema(
        (
            NodeType(
                "Acct",
                (
                    Attr("name"),
                    optional("region", "string"),  # no default: unset -> NULL
                    optional("balance", "long", default=0),
                ),
            ),
        )
    )
    engine = Engine(spark, str(tmp_path / "db"), sch, capture_cdc="full")
    engine.run(
        lambda t: [
            t.new_node("Acct", name="a", balance=5),          # region NULL
            t.new_node("Acct", name="b", region="eu", balance=1),
        ]
    )
    v1 = engine.store.current_version()
    agg = rollup_aggregate(engine.snapshot().nodes("Acct"), ["region"], ["balance"])
    engine.run(lambda t: t.new_node("Acct", name="c", balance=7))
    agg, _ = maintain_rollup(engine.store, "n_Acct", agg, ["region"], ["balance"], v1)
    want = rollup_aggregate(engine.snapshot().nodes("Acct"), ["region"], ["balance"])
    assert _rows(agg) == _rows(want)
    nulls = [r for r in agg.collect() if r["region"] is None]
    assert len(nulls) == 1 and (nulls[0]["n"], nulls[0]["sum_balance"]) == (2, 12)


@pytest.mark.slow  # r15: ~45-50s wall; see pyproject addopts
def test_stream_maintained_rollup_is_live_and_exactly_once(spark, tmp_path):
    """foreachBatch materialized view over the upsert stream, seeded with
    the recompute at an explicit version and started with the matching
    startVersion (no seed/pin gap): after each availableNow run the view
    equals the full recompute of the table, and re-running the stream from
    the same checkpoint (restart replay) never double-applies a batch.
    Unseeded maintenance is refused loudly."""
    import os

    import pytest as _pytest

    from edgy_spark.operators.incremental import (
        read_maintained_rollup,
        seed_rollup,
        stream_maintain_rollup,
    )
    from edgy_spark.sources.pysource import register_edgy_source

    engine = Engine(spark, str(tmp_path / "db"), _schema(), capture_cdc="full")
    made = engine.run(
        lambda t: [
            t.new_node("Acct", region=r, balance=b)
            for r, b in (("eu", 10), ("us", 7))
        ]
    )
    register_edgy_source(spark)
    agg_dir = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")
    apply = stream_maintain_rollup(spark, agg_dir, ["region"], ["balance"])

    def run_stream(start_version=None):
        r = (
            spark.readStream.format("edgy")
            .option("root", engine.store.root)
            .option("table", "n_Acct")
            .option("mode", "upsert")
        )
        if start_version is not None:
            r = r.option("startVersion", str(start_version))
        q = (
            r.load()
            .writeStream.foreachBatch(apply)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # unseeded maintenance must refuse loudly (once a batch has changes)
    engine.run(lambda t: t.new_node("Acct", region="eu", balance=3))
    os.makedirs(agg_dir, exist_ok=True)
    with _pytest.raises(Exception, match="seed"):
        run_stream(start_version=1)
    import shutil

    shutil.rmtree(ckpt)  # discard the failed attempt's checkpoint

    # seed at an explicit version; commits may land BETWEEN seeding and
    # the stream start — the startVersion handshake keeps them covered
    seed_v = seed_rollup(engine.store, "n_Acct", agg_dir, ["region"], ["balance"])
    engine.run(lambda t: t.set_attribute(made[1], "region", "eu"))  # us -> eu
    run_stream(start_version=seed_v)  # first batch already has the move
    engine.run(lambda t: t.delete_node(made[0]))
    run_stream(start_version=seed_v)

    def recompute():
        return _rows(
            rollup_aggregate(
                engine.snapshot().nodes("Acct"), ["region"], ["balance"]
            )
        )

    assert _rows(read_maintained_rollup(spark, agg_dir)) == recompute()
    assert recompute() == [("eu", 2, 10)]  # us vanished from the view

    # a group dying and reappearing stays correct (baseline prevents the
    # negative-count drop)
    engine.run(lambda t: t.new_node("Acct", region="us", balance=2))
    run_stream(start_version=seed_v)
    assert _rows(read_maintained_rollup(spark, agg_dir)) == recompute()

    # restart replay: same checkpoint, no new commits -> view unchanged
    before = _rows(read_maintained_rollup(spark, agg_dir))
    run_stream(start_version=seed_v)
    assert _rows(read_maintained_rollup(spark, agg_dir)) == before

    # superseded snapshot dirs pruned to the retain window
    from edgy_spark.operators.incremental import RETAIN_ROLLUP_VERSIONS

    vdirs = [n for n in os.listdir(agg_dir) if n.startswith("v") and n[1:].isdigit()]
    assert len(vdirs) <= RETAIN_ROLLUP_VERSIONS
