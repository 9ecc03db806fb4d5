"""Zone-map file skipping in the edgy data source: the writer collects
per-file [min, max] column stats while the batches stream through (the
Delta/Iceberg design) and commits them as the immutable version
directory's ``_zones.json``; the batch reader then skips whole files at
PLANNING time — no task, no footer read — when a pushed filter cannot
match.  Pruning must never drop a row: absent entries, foreign sidecars,
and type mismatches all fail open."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThan, LessThan

from edgy_spark.demo import big_bang, demo_schema
from edgy_spark.graph import Engine
from edgy_spark.sources.pysource import (
    ZONES_FILE,
    EdgyReader,
    _resolve_table_path,
    register_edgy_source,
)

import pytest

# r15 (driver verify budget): zone-map sidecar write/prune integration —
# multi-second Spark/store wall time per test; excluded from the default
# run by pyproject's `-m 'not slow'`, run explicitly with `pytest -m slow`.
pytestmark = pytest.mark.slow


def _store(spark, tmp_path):
    engine = Engine(spark, str(tmp_path / "db"), demo_schema())
    engine.run(big_bang)
    register_edgy_source(spark)
    return engine


def _bulk_overwrite(spark, root, rows, n_files):
    (
        spark.createDataFrame(rows, "id long, name string, age long")
        .repartitionByRange(n_files, "id")
        .write.format("edgy")
        .option("root", root)
        .option("table", "n_Person")
        .mode("overwrite")
        .save()
    )


def _reader(spark, root, filters):
    path = _resolve_table_path(root, "n_Person", None)
    schema = (
        spark.read.format("edgy")
        .option("root", root)
        .option("table", "n_Person")
        .load()
        .schema
    )
    r = EdgyReader(path, schema)
    rejected = list(r.pushFilters(filters))
    assert rejected == []  # all test filters are pushable comparisons
    return r, path


ROWS = [(i, f"name{i:04d}", 20 + i % 50) for i in range(0, 400)]


def test_writer_commits_zone_sidecar(spark, tmp_path):
    engine = _store(spark, tmp_path)
    _bulk_overwrite(spark, engine.store.root, ROWS, n_files=4)
    path = _resolve_table_path(engine.store.root, "n_Person", None)
    with open(os.path.join(path, ZONES_FILE)) as f:
        zones = json.load(f)
    files = [n for n in os.listdir(path) if n.endswith(".parquet")]
    assert set(zones) == set(files) and len(files) == 4
    for stats in zones.values():
        assert set(stats) == {"id", "name", "age"}
        lo, hi = stats["id"]
        assert 0 <= lo <= hi <= 399
    # range-partitioned by id -> per-file id ranges are disjoint
    spans = sorted(tuple(s["id"]) for s in zones.values())
    assert all(a[1] < b[0] for a, b in zip(spans, spans[1:]))


def test_reader_prunes_files_at_planning_time(spark, tmp_path):
    engine = _store(spark, tmp_path)
    root = engine.store.root
    _bulk_overwrite(spark, root, ROWS, n_files=4)

    r, path = _reader(spark, root, [LessThan(("id",), 50)])
    pruned = r.partitions()
    assert len(pruned) == 1  # 3 of 4 range-files excluded, no task for them

    # a contradiction prunes EVERY file -> the no-op sentinel partition
    r2, _ = _reader(spark, root, [GreaterThan(("id",), 10_000)])
    assert [p.path for p in r2.partitions()] == [path]

    # string zones prune too
    r3, _ = _reader(spark, root, [EqualTo(("name",), "zzzz")])
    assert [p.path for p in r3.partitions()] == [path]

    # end-to-end through Spark: pruned reads return exactly the right rows
    df = (
        spark.read.format("edgy")
        .option("root", root)
        .option("table", "n_Person")
        .load()
    )
    assert df.filter(F.col("id") < 50).count() == 50
    assert df.filter(F.col("id") > 10_000).count() == 0
    assert {r["name"] for r in df.filter(F.col("id") == 399).collect()} == {
        "name0399"
    }


def test_zone_pruning_never_drops_rows(spark, tmp_path):
    """Property sweep: for random filter values, the pruned source read
    equals the Python-side ground truth computed from the raw rows."""
    engine = _store(spark, tmp_path)
    root = engine.store.root
    _bulk_overwrite(spark, root, ROWS, n_files=5)
    df = (
        spark.read.format("edgy")
        .option("root", root)
        .option("table", "n_Person")
        .load()
    )
    import random

    rng = random.Random(8)
    for _ in range(6):
        v = rng.randint(-10, 410)
        op = rng.choice(["<", "<=", ">", ">=", "=="])
        cond = {
            "<": F.col("id") < v,
            "<=": F.col("id") <= v,
            ">": F.col("id") > v,
            ">=": F.col("id") >= v,
            "==": F.col("id") == v,
        }[op]
        py = {
            "<": lambda i: i < v,
            "<=": lambda i: i <= v,
            ">": lambda i: i > v,
            ">=": lambda i: i >= v,
            "==": lambda i: i == v,
        }[op]
        got = sorted(r["id"] for r in df.filter(cond).collect())
        want = sorted(i for i, _, _ in ROWS if py(i))
        assert got == want, f"id {op} {v}"


def test_append_carries_zone_entries_forward(spark, tmp_path):
    engine = _store(spark, tmp_path)
    root = engine.store.root
    _bulk_overwrite(spark, root, ROWS, n_files=3)
    extra = [(i, f"name{i:04d}", 99) for i in range(1000, 1100)]
    (
        spark.createDataFrame(extra, "id long, name string, age long")
        .coalesce(1)
        .write.format("edgy")
        .option("root", root)
        .option("table", "n_Person")
        .mode("append")
        .save()
    )
    path = _resolve_table_path(root, "n_Person", None)
    with open(os.path.join(path, ZONES_FILE)) as f:
        zones = json.load(f)
    files = [n for n in os.listdir(path) if n.endswith(".parquet")]
    assert len(files) == 4 and set(zones) == set(files)
    # old files' carried stats + the new file's stats all prune:
    r, _ = _reader(spark, root, [GreaterThan(("id",), 999)])
    assert len(r.partitions()) == 1

    # one fresh load() per action: Spark 4.1 reuses a Python source's
    # latest planned scan for FILTERLESS plans on the same DataFrame, so a
    # filtered action poisons later unfiltered ones (see
    # test_pysource.test_spark_reuses_filtered_scan_for_filterless_plans)
    def df():
        return (
            spark.read.format("edgy")
            .option("root", root)
            .option("table", "n_Person")
            .load()
        )

    assert df().filter(F.col("id") > 999).count() == 100
    assert df().count() == 500


def test_missing_sidecar_only_disables_pruning(spark, tmp_path):
    engine = _store(spark, tmp_path)
    root = engine.store.root
    _bulk_overwrite(spark, root, ROWS, n_files=4)
    path = _resolve_table_path(root, "n_Person", None)
    os.unlink(os.path.join(path, ZONES_FILE))
    r, _ = _reader(spark, root, [LessThan(("id",), 50)])
    assert len(r.partitions()) == 4  # nothing pruned...
    df = (
        spark.read.format("edgy")
        .option("root", root)
        .option("table", "n_Person")
        .load()
        .filter(F.col("id") < 50)
    )
    assert df.count() == 50  # ...and nothing wrong


def test_engine_commits_write_footer_derived_zones(spark, tmp_path):
    """Tables written by the Engine's own commit path get a sidecar too —
    derived from the parquet footers at commit time (metadata-only reads),
    so point commits and compaction keep the file skipping bulk loads get
    from their Arrow tasks.  Values read correctly through it, and an
    impossible id prunes every file."""
    engine = _store(spark, tmp_path)
    root = engine.store.root
    path = _resolve_table_path(root, "n_Person", None)
    with open(os.path.join(path, ZONES_FILE)) as f:
        zones = json.load(f)
    data_entries = {
        f: s for f, s in zones.items() if s.get("__rows__") != [0, 0]
    }
    assert data_entries and all("id" in s for s in data_entries.values())
    # binary/timestamp-ish columns are absent, never wrong: every recorded
    # bound is a JSON-safe scalar; empty part files carry the __rows__
    # marker so the planner can skip them under any predicate
    for stats in data_entries.values():
        for lo, hi in stats.values():
            assert isinstance(lo, (int, float, str))
            assert isinstance(hi, (int, float, str))
    df = (
        spark.read.format("edgy")
        .option("root", root)
        .option("table", "n_Person")
        .load()
        .filter(F.col("age") > 0)
    )
    assert {r["name"] for r in df.collect()} == {"Bob", "Jane", "Jose"}
    r, sentinel = _reader(spark, root, [GreaterThan(("id",), 10_000_000)])
    assert [p.path for p in r.partitions()] == [sentinel]


def test_stream_writer_messages_carry_zone_stats(spark, tmp_path):
    """The streaming sink collects the same per-file stats as the bulk
    writer (shared _WriteMessage/_promote_staging path), so stream-ingested
    versions prune too."""
    from pyspark.sql import Row
    from pyspark.sql.types import StructType

    from edgy_spark.sources.pysource import EdgyStreamWriter

    engine = _store(spark, tmp_path)
    schema = (
        StructType()
        .add("id", "long")
        .add("name", "string")
        .add("age", "long")
    )
    w = EdgyStreamWriter(engine.store.root, "n_Person", schema, "zone-test")
    msg = w.write(iter([Row(id=7, name="Kim", age=41),
                        Row(id=9, name="Lee", age=39)]))
    assert msg.zones == {"id": [7, 9], "name": ["Kim", "Lee"], "age": [39, 41]}


def test_foreign_shaped_sidecar_only_disables_pruning(spark, tmp_path):
    """Valid JSON of the WRONG shape (a foreign writer's sidecar) must
    disable pruning, never crash planning (review r08)."""
    engine = _store(spark, tmp_path)
    root = engine.store.root
    _bulk_overwrite(spark, root, ROWS, n_files=3)
    path = _resolve_table_path(root, "n_Person", None)
    for payload in ('["f.parquet"]', '{"a.parquet": [1, 2, 3]}',
                    '{"a.parquet": "zap"}', '{"a.parquet": {"id": 7}}'):
        with open(os.path.join(path, ZONES_FILE), "w") as f:
            f.write(payload)
        r, _ = _reader(spark, root, [LessThan(("id",), 50)])
        assert len(r.partitions()) == 3, payload  # nothing pruned
    df = (
        spark.read.format("edgy")
        .option("root", root)
        .option("table", "n_Person")
        .load()
        .filter(F.col("id") < 50)
    )
    assert df.count() == 50


def test_compaction_regenerates_zone_sidecar(spark, tmp_path):
    """OPTIMIZE must not destroy the pruning metadata a load created: the
    compacted version's directory carries a fresh footer-derived sidecar
    and an impossible-id read still prunes to the no-op sentinel."""
    engine = _store(spark, tmp_path)
    root = engine.store.root
    # fragment the table so compact() rewrites it
    for i in range(3):
        rows = [(1000 + i * 10 + j, f"x{i}_{j}", 30) for j in range(4)]
        (
            spark.createDataFrame(rows, "id long, name string, age long")
            .repartition(4)
            .write.format("edgy")
            .option("root", root)
            .option("table", "n_Person")
            .mode("append")
            .save()
        )
    snap = engine.store.compact(min_files=2)
    assert snap is not None, "compaction did not trigger"
    path = _resolve_table_path(root, "n_Person", None)
    with open(os.path.join(path, ZONES_FILE)) as f:
        zones = json.load(f)
    assert zones
    r, sentinel = _reader(spark, root, [GreaterThan(("id",), 10_000_000)])
    assert [p.path for p in r.partitions()] == [sentinel]
    df = (
        spark.read.format("edgy")
        .option("root", root)
        .option("table", "n_Person")
        .load()
    )
    assert df.count() == 15  # 3 big_bang + 12 appended, none lost
