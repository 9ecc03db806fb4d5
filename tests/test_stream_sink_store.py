"""writeStream.format('edgy'): streaming ingestion into the versioned store
— one version per non-empty micro-batch, exactly-once across restarts and
replayed batch commits, interleaving cleanly with every other committer."""

from __future__ import annotations

import os

import pytest

from edgy_spark.demo import big_bang, demo_schema
from edgy_spark.graph import Engine
from edgy_spark.sources.pysource import register_edgy_source


@pytest.fixture()
def engine(spark, tmp_path):
    e = Engine(spark, str(tmp_path / "db"), demo_schema())
    e.run(big_bang)
    register_edgy_source(spark)
    return e


PERSON_SCHEMA = "id long, name string, age long"


def _run_sink(spark, tmp_path, engine, chunks, stream_dir="feed", ckpt="ckpt"):
    """Stage ``chunks`` as files in one monitored dir and drain them into
    the store with an availableNow run over a shared checkpoint."""
    feed = str(tmp_path / stream_dir)
    os.makedirs(feed, exist_ok=True)
    for i, rows in enumerate(chunks):
        if rows is None:
            continue  # already staged by an earlier run
        part = str(tmp_path / f"{stream_dir}-part{i}")
        spark.createDataFrame(rows, PERSON_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(part)
        src = next(f for f in os.listdir(part) if f.endswith(".parquet"))
        os.rename(os.path.join(part, src), os.path.join(feed, f"{i:03d}.parquet"))
    stream = (
        spark.readStream.schema(PERSON_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    q = (
        stream.writeStream.format("edgy")
        .option("root", engine.store.root)
        .option("table", "n_Person")
        .option("checkpointLocation", str(tmp_path / ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _names(engine):
    return sorted(r["name"] for r in engine.snapshot().nodes("Person").collect())


def test_stream_sink_appends_one_version_per_batch(spark, tmp_path, engine):
    v0 = engine.store.current_version()
    _run_sink(
        spark, tmp_path, engine,
        [[(100, "Zed", 50)], [(101, "Yan", 51)]],
    )
    assert engine.store.current_version() == v0 + 2  # one version per file-batch
    assert _names(engine) == ["Bob", "Jane", "Jose", "Yan", "Zed"]
    # the id cursor advanced past streamed ids: engine txns can't collide
    ann = engine.run(lambda t: t.new_node("Person", name="Ann", age=1))
    assert ann.id >= 102
    # replay-guard state is recorded and carried by the engine commit above
    assert engine.snapshot().manifest["stream_batches"]


def test_stream_sink_exactly_once_across_restart(spark, tmp_path, engine):
    _run_sink(spark, tmp_path, engine, [[(100, "Zed", 50)]])
    v1 = engine.store.current_version()
    # restart over the same checkpoint with no new input: nothing commits
    _run_sink(spark, tmp_path, engine, [None])
    assert engine.store.current_version() == v1
    assert _names(engine).count("Zed") == 1
    # new input after the restart commits exactly once more
    _run_sink(spark, tmp_path, engine, [None, [(101, "Yan", 51)]])
    assert engine.store.current_version() == v1 + 1
    assert _names(engine).count("Yan") == 1


def test_replayed_batch_commit_is_a_noop(spark, tmp_path, engine):
    """Crash-after-publish: Spark re-runs the batch with the same batchId;
    the manifest's stream_batches guard must swallow the duplicate — even
    when OTHER commits landed in between."""
    from edgy_spark.sources.pysource import EdgyStreamWriter, _WriteMessage

    import pyarrow as pa
    import pyarrow.parquet as pq

    root = engine.store.root
    w = EdgyStreamWriter(
        root, "n_Person", spark.createDataFrame([], PERSON_SCHEMA).schema, "s1"
    )

    def stage(rows, fname):
        pq.write_table(
            pa.table(
                {
                    "id": pa.array([r[0] for r in rows], pa.int64()),
                    "name": pa.array([r[1] for r in rows]),
                    "age": pa.array([r[2] for r in rows], pa.int64()),
                }
            ),
            os.path.join(root, w.staging, fname),
        )
        return [_WriteMessage(fname, len(rows), rows[-1][0], rows[0][0], True)]

    msgs = stage([(100, "Zed", 50)], "part-a.parquet")
    w.commit(msgs, 0)
    v1 = engine.store.current_version()
    # an unrelated engine commit interleaves (and must carry the guard)
    engine.run(lambda t: t.new_node("Person", name="Ann", age=1))
    # the replayed commit of batch 0 publishes nothing
    msgs2 = stage([(100, "Zed", 50)], "part-b.parquet")
    w.commit(msgs2, 0)
    assert engine.store.current_version() == v1 + 1  # only the engine commit
    assert _names(engine).count("Zed") == 1


def test_stream_sink_drops_stale_secondary_index(spark, tmp_path):
    engine = Engine(
        spark, str(tmp_path / "db"), demo_schema(),
        index_attrs={"Person": ["name"]},
    )
    engine.run(big_bang)
    register_edgy_source(spark)
    assert engine.snapshot().attr_index("Person", "name") is not None
    _run_sink(spark, tmp_path, engine, [[(100, "Zed", 50)]])
    snap = engine.snapshot()
    assert snap.attr_index("Person", "name") is None  # stale index dropped
    from edgy_spark.query import NodeSet

    hit = NodeSet.lookup(snap, engine.schema, "Person", name="Zed")
    assert [r["name"] for r in hit.df.collect()] == ["Zed"]  # scan fallback


def test_stream_sink_rejects_schema_drift(spark, tmp_path, engine):
    feed = str(tmp_path / "bad-feed")
    os.makedirs(feed)
    part = str(tmp_path / "bad-part")
    bad = "id long, name string, age string"  # age re-typed vs stored footers
    spark.createDataFrame([(100, "Zed", "old")], bad).coalesce(1).write.mode(
        "overwrite"
    ).parquet(part)
    src = next(f for f in os.listdir(part) if f.endswith(".parquet"))
    os.rename(os.path.join(part, src), os.path.join(feed, "000.parquet"))
    stream = spark.readStream.schema(bad).parquet(feed)
    q = (
        stream.writeStream.format("edgy")
        .option("root", engine.store.root)
        .option("table", "n_Person")
        .option("checkpointLocation", str(tmp_path / "bad-ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="rejected"):
        q.awaitTermination(120)
