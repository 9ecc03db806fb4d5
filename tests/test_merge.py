"""GraphStore.merge_nodes — the Delta-style three-clause MERGE as one
transactional commit: matched+condition deletes, matched updates, unmatched
inserts with fresh engine ids, full-shape CDC from the same join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from edgy_spark.schema import Attr, GraphSchema, NodeType, optional
from edgy_spark.storage import ConflictError, GraphStore


def _schema() -> GraphSchema:
    return GraphSchema(
        node_types=(
            NodeType(
                "Person",
                (Attr("name"), Attr("age", "long"), optional("city")),
            ),
        ),
        relations=(),
    )


def _store(spark, tmp_path) -> GraphStore:
    store = GraphStore(spark, str(tmp_path / "db"), _schema())
    base = store.snapshot()
    seed = spark.createDataFrame(
        [
            (1, "ann", 30, "berlin"),
            (2, "bob", 41, "paris"),
            (3, "cho", 25, "tokyo"),
        ],
        "id long, name string, age long, city string",
    )
    store.commit(base, {"n_Person": seed}, next_id=4)
    return store


def test_merge_updates_inserts_and_deletes_in_one_commit(spark, tmp_path):
    store = _store(spark, tmp_path)
    source = spark.createDataFrame(
        [
            ("bob", 42, "lyon"),      # matched -> update
            ("cho", 0, "osaka"),      # matched + delete_where -> delete
            ("dee", 19, "madrid"),    # unmatched -> insert
        ],
        "name string, age long, city string",
    )
    snap = store.merge_nodes(
        "Person", source, on="name", delete_where="_src_age = 0"
    )
    rows = {r["name"]: r for r in snap.nodes("Person").collect()}
    assert set(rows) == {"ann", "bob", "dee"}
    assert rows["ann"]["age"] == 30 and rows["ann"]["city"] == "berlin"
    assert rows["bob"]["age"] == 42 and rows["bob"]["city"] == "lyon"
    # fresh engine id from the manifest counter, counter advanced
    assert rows["dee"]["id"] == 4
    assert snap.manifest["next_id"] == 5


def test_merge_cdc_records_the_full_delta_cdf_shape(spark, tmp_path):
    store = _store(spark, tmp_path)
    source = spark.createDataFrame(
        [("bob", 42, "lyon"), ("cho", 0, "osaka"), ("dee", 19, "madrid")],
        "name string, age long, city string",
    )
    snap = store.merge_nodes(
        "Person", source, on="name", delete_where="_src_age = 0"
    )
    changes = store.table_changes(
        "n_Person", snap.version - 1, snap.version
    ).collect()
    by_kind = {}
    for r in changes:
        by_kind.setdefault(r["_change"], []).append(r)
    assert {r["name"] for r in by_kind["insert"]} == {"dee"}
    assert {r["name"] for r in by_kind["delete"]} == {"cho"}
    pre = {r["name"]: r for r in by_kind["update_preimage"]}
    post = {r["name"]: r for r in by_kind["update_postimage"]}
    assert pre["bob"]["age"] == 41 and post["bob"]["age"] == 42
    assert pre["bob"]["id"] == post["bob"]["id"] == 2


def test_merge_absent_source_columns_keep_target_values(spark, tmp_path):
    store = _store(spark, tmp_path)
    # source carries only (name, age): city must survive on matched rows,
    # and default (optional -> '') on inserts
    source = spark.createDataFrame(
        [("ann", 31), ("eve", 22)], "name string, age long"
    )
    snap = store.merge_nodes("Person", source, on="name")
    rows = {r["name"]: r for r in snap.nodes("Person").collect()}
    assert rows["ann"]["age"] == 31 and rows["ann"]["city"] == "berlin"
    assert rows["eve"]["age"] == 22 and rows["eve"]["city"] == ""


def test_merge_rejects_duplicate_source_keys_and_unknown_columns(
    spark, tmp_path
):
    store = _store(spark, tmp_path)
    dup = spark.createDataFrame(
        [("bob", 1), ("bob", 2)], "name string, age long"
    )
    with pytest.raises(ValueError, match="duplicate"):
        store.merge_nodes("Person", dup, on="name")
    bad = spark.createDataFrame([("bob", 1)], "name string, salary long")
    with pytest.raises(ValueError, match="unknown"):
        store.merge_nodes("Person", bad, on="name")


def test_merge_conflicts_like_any_commit(spark, tmp_path):
    store = _store(spark, tmp_path)
    stale = store.snapshot()
    # another writer commits first
    store.merge_nodes(
        "Person",
        spark.createDataFrame([("fay", 50)], "name string, age long"),
        on="name",
    )
    with pytest.raises(ConflictError):
        store.merge_nodes(
            "Person",
            spark.createDataFrame([("gus", 60)], "name string, age long"),
            on="name",
            base=stale,
        )


def test_merge_is_idempotent_reapplied_source_changes_nothing(spark, tmp_path):
    store = _store(spark, tmp_path)
    source = spark.createDataFrame(
        [("bob", 42, "lyon"), ("dee", 19, "madrid")],
        "name string, age long, city string",
    )
    s1 = store.merge_nodes("Person", source, on="name")
    s2 = store.merge_nodes("Person", source, on="name")
    a = sorted(map(tuple, s1.nodes("Person").collect()))
    b = sorted(
        (r["id"], r["name"], r["age"], r["city"])
        for r in s2.nodes("Person").collect()
    )
    assert a == b
    # no new ids were burned by the idempotent re-apply (no inserts)
    assert s2.manifest["next_id"] == s1.manifest["next_id"]


def test_merge_cdc_feeds_incremental_rollup_maintenance(spark, tmp_path):
    """Composition pin: a MERGE's full-shape CDC must drive
    operators/incremental.py's delta-apply to the same rollup a
    from-scratch recompute produces — updates subtract their preimage,
    deletes vanish, inserted groups appear."""
    from edgy_spark.operators.incremental import (
        maintain_rollup,
        rollup_aggregate,
    )

    store = _store(spark, tmp_path)
    base_version = store.current_version()
    agg0 = rollup_aggregate(
        store.snapshot().nodes("Person"), ["city"], ["age"]
    )
    snap = store.merge_nodes(
        "Person",
        spark.createDataFrame(
            [("bob", 42, "lyon"), ("cho", 0, "osaka"), ("dee", 19, "madrid")],
            "name string, age long, city string",
        ),
        on="name",
        delete_where="_src_age = 0",
    )
    maintained, upto = maintain_rollup(
        store, "n_Person", agg0, ["city"], ["age"], from_version=base_version
    )
    assert upto == snap.version
    recomputed = rollup_aggregate(snap.nodes("Person"), ["city"], ["age"])
    got = sorted(map(tuple, maintained.collect()))
    want = sorted(map(tuple, recomputed.collect()))
    assert got == want


def test_stream_merge_into_store_exactly_once(spark, tmp_path):
    """Streaming upsert maintenance: replay chunks of a source table as a
    real file stream, MERGE each micro-batch into the store via
    foreachBatch, and verify (1) the final table equals the sequential
    batch merges, (2) a crash-replay of an applied batch is skipped by the
    manifest's stream-batch cursor — specifically the delete-clause hazard
    (re-applying would re-insert the deleted row)."""
    from edgy_spark.streaming.sink import stream_merge_into_store

    store = _store(spark, tmp_path)
    chunks = [
        [("bob", 42, "lyon"), ("dee", 19, "madrid")],   # update + insert
        [("cho", 0, "osaka"), ("eve", 22, "quito")],    # delete + insert
    ]
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    for i, rows in enumerate(chunks):
        spark.createDataFrame(
            rows, "name string, age long, city string"
        ).coalesce(1).write.mode("overwrite").parquet(str(src_dir / f"c{i}"))
    schema = "name string, age long, city string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir / "c*"))
    )
    apply = stream_merge_into_store(
        store, "Person", on="name", stream_id="dimsync",
        delete_where="_src_age = 0",
    )
    q = (
        stream.writeStream.foreachBatch(apply)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = {r["name"]: r for r in store.snapshot().nodes("Person").collect()}
    assert set(rows) == {"ann", "bob", "dee", "eve"}  # cho deleted
    assert rows["bob"]["age"] == 42 and rows["eve"]["city"] == "quito"
    version_after = store.current_version()

    # crash-replay simulation: re-apply an old batch id — the cursor in the
    # manifest must skip it (NOT re-insert the deleted cho)
    replay = spark.createDataFrame(
        [("cho", 0, "osaka"), ("eve", 22, "quito")], schema
    )
    apply(replay, 0)
    apply(replay, 1)
    assert store.current_version() == version_after
    names = {r["name"] for r in store.snapshot().nodes("Person").collect()}
    assert "cho" not in names


import hypothesis.strategies as st
from hypothesis import HealthCheck, given, settings

_batch = st.dictionaries(
    st.sampled_from(["ann", "bob", "cho", "dee", "eve", "fay"]),
    st.tuples(st.integers(min_value=0, max_value=5),
              st.sampled_from(["x", "y", "z"])),
    min_size=1,
    max_size=4,
)


@settings(
    deadline=None, max_examples=4, suppress_health_check=list(HealthCheck)
)
@given(batches=st.lists(_batch, min_size=1, max_size=3))
def test_merge_matches_dict_model_under_random_batches(
    spark, tmp_path_factory, batches
):
    """Model-based MERGE semantics: a sequence of random source batches
    (age 0 = delete marker via delete_where) applied through merge_nodes
    must agree with a plain dict model — including the subtle case where
    an UNMATCHED row with the delete marker INSERTS (delete clauses apply
    only WHEN MATCHED, Delta semantics), and id assignment in key order
    from the manifest counter."""
    store = _store(spark, tmp_path_factory.mktemp("merge_model"))
    model = {
        "ann": (1, 30, "berlin"),
        "bob": (2, 41, "paris"),
        "cho": (3, 25, "tokyo"),
    }
    next_id = 4
    for batch in batches:
        src = spark.createDataFrame(
            [(n, a, c) for n, (a, c) in sorted(batch.items())],
            "name string, age long, city string",
        )
        store.merge_nodes(
            "Person", src, on="name", delete_where="_src_age = 0"
        )
        inserts = sorted(n for n in batch if n not in model)
        for n, (a, c) in sorted(batch.items()):
            if n in model:
                if a == 0:
                    del model[n]
                else:
                    model[n] = (model[n][0], a, c)
        for n in inserts:
            a, c = batch[n]
            model[n] = (next_id, a, c)
            next_id += 1
    got = sorted(
        (r["name"], r["id"], r["age"], r["city"])
        for r in store.snapshot().nodes("Person").collect()
    )
    want = sorted((n, i, a, c) for n, (i, a, c) in model.items())
    assert got == want
    assert store.snapshot().manifest["next_id"] == next_id


def test_merge_into_empty_store_inserts_everything(spark, tmp_path):
    """First merge against a store whose node table has never been written:
    every source row is unmatched -> inserted with ids from the fresh
    manifest counter (the empty-table schema still carries id)."""
    store = GraphStore(spark, str(tmp_path / "db"), _schema())
    snap = store.merge_nodes(
        "Person",
        spark.createDataFrame(
            [("bob", 41, "paris"), ("ann", 30, "berlin")],
            "name string, age long, city string",
        ),
        on="name",
    )
    rows = {r["name"]: r for r in snap.nodes("Person").collect()}
    assert rows["ann"]["id"] == 1 and rows["bob"]["id"] == 2  # key order
    assert snap.manifest["next_id"] == 3


def test_merge_null_delete_condition_updates_instead_of_dropping(
    spark, tmp_path
):
    """SQL MERGE three-valued logic: a delete_where that evaluates to NULL
    for a matched row means FALSE — the row is UPDATEd, never silently
    dropped without a CDC record (review r09b finding)."""
    store = _store(spark, tmp_path)
    source = spark.createDataFrame(
        [("bob", None, "lyon")], "name string, age long, city string"
    )
    snap = store.merge_nodes(
        "Person", source, on="name", delete_where="_src_age = 0"
    )
    rows = {r["name"]: r for r in snap.nodes("Person").collect()}
    assert "bob" in rows, "NULL condition must not delete"
    assert rows["bob"]["age"] is None and rows["bob"]["city"] == "lyon"
    kinds = {
        r["_change"]
        for r in store.table_changes(
            "n_Person", snap.version - 1, snap.version
        ).collect()
        if r["name"] == "bob"
    }
    assert kinds == {"update_preimage", "update_postimage"}


def test_merge_rejects_null_keys_with_a_specific_error(spark, tmp_path):
    store = _store(spark, tmp_path)
    src = spark.createDataFrame(
        [(None, 10, "x")], "name string, age long, city string"
    )
    with pytest.raises(ValueError, match="NULL"):
        store.merge_nodes("Person", src, on="name")


def test_merge_casts_source_columns_to_declared_types(spark, tmp_path):
    """A drifted input type (double age from a JSON feed) must land as the
    DECLARED long — a re-typed stored column would make the
    schema-evolution read path default the WHOLE column to NULL."""
    store = _store(spark, tmp_path)
    src = spark.createDataFrame(
        [("bob", 42.0), ("eve", 22.9)], "name string, age double"
    )
    snap = store.merge_nodes("Person", src, on="name")
    rows = {r["name"]: r for r in snap.nodes("Person").collect()}
    assert rows["bob"]["age"] == 42 and isinstance(rows["bob"]["age"], int)
    # pre-merge rows must still read their values (no column wipe)
    assert rows["ann"]["age"] == 30


def test_stream_merge_keep_latest_compacts_duplicate_keys(spark, tmp_path):
    """A micro-batch carrying several events for one key (the CDC reality)
    must keep-latest by the order column instead of poisoning the query."""
    from edgy_spark.streaming.sink import stream_merge_into_store

    store = _store(spark, tmp_path)
    apply = stream_merge_into_store(
        store, "Person", on="name", stream_id="s", latest_by="age"
    )
    batch = spark.createDataFrame(
        [("bob", 43, "nice"), ("bob", 42, "lyon"), ("gia", 28, "rome")],
        "name string, age long, city string",
    )
    apply(batch, 0)
    rows = {r["name"]: r for r in store.snapshot().nodes("Person").collect()}
    assert rows["bob"]["age"] == 43 and rows["bob"]["city"] == "nice"
    assert rows["gia"]["age"] == 28



def test_check_constraints_gate_every_writer(spark, tmp_path):
    """Declared CHECKs are commit-time gates: a violating MERGE, a
    violating raw commit, and a violating engine-free DataFrame all fail
    BEFORE publishing (no new version appears), a passing write goes
    through, and NULL evaluates as a violation unless the condition opts
    into permissiveness."""
    from edgy_spark.storage import CheckViolationError

    store = GraphStore(
        spark,
        str(tmp_path / "db"),
        _schema(),
        check_constraints={"Person": "age >= 0 AND age < 200"},
    )
    base = store.snapshot()
    seed = spark.createDataFrame(
        [(1, "ann", 30, "berlin")], "id long, name string, age long, city string"
    )
    store.commit(base, {"n_Person": seed}, next_id=2)
    v = store.current_version()

    # violating raw commit
    bad = spark.createDataFrame(
        [(1, "ann", -5, "berlin")], "id long, name string, age long, city string"
    )
    with pytest.raises(CheckViolationError, match="violate"):
        store.commit(store.snapshot(), {"n_Person": bad}, next_id=2)
    assert store.current_version() == v  # nothing published

    # violating MERGE
    with pytest.raises(CheckViolationError):
        store.merge_nodes(
            "Person",
            spark.createDataFrame([("bob", 900)], "name string, age long"),
            on="name",
        )
    assert store.current_version() == v

    # NULL age = violation by default
    with pytest.raises(CheckViolationError):
        store.merge_nodes(
            "Person",
            spark.createDataFrame(
                [("cho", None)], "name string, age long"
            ),
            on="name",
        )

    # passing merge commits fine
    snap = store.merge_nodes(
        "Person",
        spark.createDataFrame([("bob", 41)], "name string, age long"),
        on="name",
    )
    assert snap.version == v + 1
    assert {r["name"] for r in snap.nodes("Person").collect()} == {"ann", "bob"}


def test_check_constraints_permissive_null_opt_in(spark, tmp_path):
    store = GraphStore(
        spark,
        str(tmp_path / "db"),
        _schema(),
        check_constraints={"Person": "age IS NULL OR age >= 0"},
    )
    snap = store.merge_nodes(
        "Person",
        spark.createDataFrame([("dee", None)], "name string, age long"),
        on="name",
    )
    assert snap.nodes("Person").collect()[0]["age"] is None


def test_check_constraints_gate_engine_transactions(spark, tmp_path):
    """The engine-txn writer path is bound by the same declarative CHECK:
    a transaction staging a violating attribute fails at commit and
    publishes nothing."""
    from edgy_spark.graph import Engine
    from edgy_spark.schema import Attr, GraphSchema, NodeType
    from edgy_spark.storage import CheckViolationError

    schema = GraphSchema(
        node_types=(NodeType("Person", (Attr("name"), Attr("age", "long"))),),
        relations=(),
    )
    engine = Engine(
        spark,
        str(tmp_path / "db"),
        schema,
        check_constraints={"Person": "age >= 0"},
    )
    engine.run(lambda t: t.new_node("Person", name="ann", age=30))
    v = engine.store.current_version()
    with pytest.raises(CheckViolationError):
        engine.run(
            lambda t: t.new_node("Person", name="bad", age=-1), retries=0
        )
    assert engine.store.current_version() == v


def test_check_constraints_gate_bulk_writer_via_persisted_declaration(
    spark, tmp_path
):
    """The CHECK declaration is table metadata (persisted in every
    manifest), so the ecosystem bulk writer — which has no GraphStore
    object — enforces it on staged rows, and a session that re-opens the
    store WITHOUT re-declaring adopts the persisted set."""
    from edgy_spark.sources.pysource import register_edgy_source
    from edgy_spark.storage import CheckViolationError

    root = str(tmp_path / "db")
    store = GraphStore(
        spark, root, _schema(), check_constraints={"Person": "age >= 0"}
    )
    register_edgy_source(spark)

    bad = spark.createDataFrame(
        [(1, "ann", -3, "berlin")], "id long, name string, age long, city string"
    )
    with pytest.raises(Exception, match="violate CHECK"):
        (
            bad.write.format("edgy")
            .option("root", root)
            .option("table", "n_Person")
            .mode("append")
            .save()
        )
    assert store.current_version() == 0  # nothing published

    ok = spark.createDataFrame(
        [(1, "ann", 3, "berlin")], "id long, name string, age long, city string"
    )
    (
        ok.write.format("edgy")
        .option("root", root)
        .option("table", "n_Person")
        .mode("append")
        .save()
    )
    assert store.current_version() == 1

    # a re-opened store with no declaration ADOPTS the persisted checks
    reopened = GraphStore(spark, root, _schema())
    assert reopened.check_constraints == {"Person": "age >= 0"}
    with pytest.raises(CheckViolationError):
        reopened.merge_nodes(
            "Person",
            spark.createDataFrame([("eve", -1)], "name string, age long"),
            on="name",
        )


def test_check_redeclaration_persists_as_metadata_commit(spark, tmp_path):
    """Passing check_constraints explicitly on an EXISTING store (including
    {} to clear) publishes a metadata-only commit immediately, so
    manifest-driven writers (bulk loader, stream sink, txn finalize) never
    enforce a stale declaration (review r09 advice)."""
    from edgy_spark.sources.pysource import register_edgy_source

    root = str(tmp_path / "db")
    GraphStore(spark, root, _schema(), check_constraints={"Person": "age >= 0"})
    register_edgy_source(spark)

    # re-declare a DIFFERENT set: version bumps, manifest carries it NOW
    tightened = GraphStore(
        spark, root, _schema(), check_constraints={"Person": "age >= 10"}
    )
    assert tightened.current_version() == 1
    snap = tightened.snapshot()
    assert snap.manifest["checks"] == {"Person": "age >= 10"}
    assert snap.manifest["cdc"] == {}  # metadata-only: captured-empty delta
    assert snap.manifest["tables"] == {}  # no data rewritten

    # the ecosystem bulk writer (no GraphStore object) sees the NEW set
    bad = spark.createDataFrame(
        [(1, "kid", 5, "oslo")], "id long, name string, age long, city string"
    )
    with pytest.raises(Exception, match="violate CHECK"):
        (
            bad.write.format("edgy")
            .option("root", root)
            .option("table", "n_Person")
            .mode("append")
            .save()
        )
    assert tightened.current_version() == 1

    # clearing with {} also persists immediately; the same write now lands
    cleared = GraphStore(spark, root, _schema(), check_constraints={})
    assert cleared.current_version() == 2
    assert cleared.snapshot().manifest["checks"] == {}
    (
        bad.write.format("edgy")
        .option("root", root)
        .option("table", "n_Person")
        .mode("append")
        .save()
    )
    assert cleared.current_version() == 3

    # re-declaring the SAME set is a no-op (no empty commit spam)
    same = GraphStore(spark, root, _schema(), check_constraints={})
    assert same.current_version() == 3


def test_check_bootstrap_race_reconciles_checks(spark, tmp_path):
    """Two sessions racing the version-0 bootstrap with DIFFERENT check
    declarations: the loser detects the winner's v0 embeds another set and
    persists its own as a follow-up commit instead of returning silently
    (review r09 advice)."""
    import os

    root = str(tmp_path / "db")
    GraphStore(spark, root, _schema(), check_constraints={"Person": "age >= 0"})
    # simulate the loser's view: manifest.v0 exists but CURRENT does not
    # yet (the winner sits between its manifest link and pointer swap)
    os.remove(os.path.join(root, "CURRENT"))
    loser = GraphStore(
        spark, root, _schema(), check_constraints={"Person": "age >= 5"}
    )
    assert loser.current_version() == 1
    assert loser.snapshot().manifest["checks"] == {"Person": "age >= 5"}


def test_check_condition_validated_in_both_dialects_at_declaration(
    spark, tmp_path
):
    """A condition outside the Spark/DuckDB-common subset raises at
    DECLARATION time, not at some later write: Spark-side analysis catches
    unknown columns; DuckDB-side parsing catches Spark-only syntax (the
    ecosystem writers enforce there)."""
    with pytest.raises(ValueError, match="not valid Spark SQL"):
        GraphStore(
            spark,
            str(tmp_path / "a"),
            _schema(),
            check_constraints={"Person": "no_such_column > 0"},
        )
    with pytest.raises(ValueError, match="not valid DuckDB SQL"):
        GraphStore(
            spark,
            str(tmp_path / "b"),
            _schema(),
            check_constraints={"Person": "name rlike '^a'"},
        )


def test_enforce_manifest_checks_rejects_without_duckdb(tmp_path, monkeypatch):
    """A writer process that cannot import duckdb must REJECT a constrained
    write, never silently publish unvalidated rows (review r09 advice —
    check_constraints promises enforcement whatever the writer)."""
    import sys

    from edgy_spark.sources.pysource import _enforce_manifest_checks

    monkeypatch.setitem(sys.modules, "duckdb", None)  # import -> ImportError
    err = _enforce_manifest_checks(
        str(tmp_path),
        "staging",
        "n_Person",
        {"checks": {"Person": "age >= 0"}},
        ["part-0.parquet"],
    )
    assert err is not None and "duckdb is not importable" in err


def test_lost_bootstrap_without_declaration_adopts_winner_checks(
    spark, tmp_path
):
    """The loser of the v0 bootstrap race that declared NOTHING must adopt
    the winner's persisted declaration — not run with (and later publish)
    an empty set over it (review r10)."""
    import os

    root = str(tmp_path / "db")
    GraphStore(spark, root, _schema(), check_constraints={"Person": "age >= 0"})
    os.remove(os.path.join(root, "CURRENT"))  # winner crashed pre-publish
    loser = GraphStore(spark, root, _schema())
    assert loser.check_constraints == {"Person": "age >= 0"}
    with pytest.raises(Exception):
        loser.merge_nodes(
            "Person",
            spark.createDataFrame([("bad", -1)], "name string, age long"),
            on="name",
        )
