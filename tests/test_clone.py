"""GraphStore.clone — Delta-style SHALLOW CLONE: a new independent store
re-pointing at the source's current files by absolute path, zero bytes
copied; divergent writes stay isolated on both sides."""

from __future__ import annotations

import os

import pytest

from edgy_spark.demo import big_bang, demo_schema
from edgy_spark.graph import Engine
from edgy_spark.storage import GraphStore

# r15 (driver verify budget): clone/fsck/vacuum lifecycle integration —
# multi-second Spark/store wall time per test; excluded from the default
# run by pyproject's `-m 'not slow'`, run explicitly with `pytest -m slow`.
pytestmark = pytest.mark.slow


def _names(store, t="Person"):
    return sorted(r["name"] for r in store.snapshot().nodes(t).collect())


def test_clone_is_zero_copy_and_reads_equal(spark, tmp_path):
    engine = Engine(spark, str(tmp_path / "src"), demo_schema())
    engine.run(big_bang)
    src = engine.store
    clone = src.clone(str(tmp_path / "dst"))
    assert _names(clone) == _names(src)
    # zero bytes copied: the clone's data dir holds no table versions
    assert os.listdir(os.path.join(str(tmp_path / "dst"), "data")) == []
    # provenance recorded
    assert clone.snapshot().manifest["cloned_from"]["root"] == src.root


def test_clone_writes_are_isolated_both_ways(spark, tmp_path):
    engine = Engine(spark, str(tmp_path / "src"), demo_schema())
    engine.run(big_bang)
    src = engine.store
    clone = src.clone(str(tmp_path / "dst"))
    before = _names(src)

    clone.merge_nodes(
        "Person",
        spark.createDataFrame([("CloneOnly", 33)], "name string, age long"),
        on="name",
    )
    assert "CloneOnly" in _names(clone)
    assert _names(src) == before  # source untouched

    engine.run(lambda t: t.new_node("Person", name="SrcOnly", age=44))
    assert "SrcOnly" not in _names(clone)  # clone pinned to its manifests
    # the clone's new version dir lives under ITS root (appends localize
    # via hard-link/copy of the referenced source files)
    dirs = os.listdir(os.path.join(str(tmp_path / "dst"), "data"))
    assert any(d.startswith("n_Person") for d in dirs)


def test_clone_vacuum_never_touches_source(spark, tmp_path):
    engine = Engine(spark, str(tmp_path / "src"), demo_schema())
    engine.run(big_bang)
    src = engine.store
    clone = src.clone(str(tmp_path / "dst"))
    for i in range(3):
        clone.merge_nodes(
            "Person",
            spark.createDataFrame([(f"c{i}", 20 + i)], "name string, age long"),
            on="name",
        )
    src_data = sorted(os.listdir(os.path.join(src.root, "data")))
    clone.vacuum(retain_versions=1)
    assert sorted(os.listdir(os.path.join(src.root, "data"))) == src_data
    assert _names(src, "Person")  # source still reads fine


def test_clone_adopts_checks_and_rejects_double_clone(spark, tmp_path):
    from edgy_spark.storage import CheckViolationError

    src = GraphStore(
        spark,
        str(tmp_path / "src"),
        demo_schema(),
        check_constraints={"Person": "age >= 0"},
    )
    clone = src.clone(str(tmp_path / "dst"))
    assert clone.check_constraints == {"Person": "age >= 0"}
    with pytest.raises(CheckViolationError):
        clone.merge_nodes(
            "Person",
            spark.createDataFrame([("neg", -1)], "name string, age long"),
            on="name",
        )
    with pytest.raises(ValueError, match="already a store"):
        src.clone(str(tmp_path / "dst"))


def test_fsck_healthy_then_detects_vacuumed_source(spark, tmp_path):
    """fsck passes on a healthy store (deep included), and names the
    missing absolute paths when a clone's SOURCE vacuums files out from
    under it — the documented shallow-clone caveat, surfaced before a
    reader trips over it."""
    import shutil

    engine = Engine(spark, str(tmp_path / "src"), demo_schema())
    engine.run(big_bang)
    src = engine.store
    assert src.fsck(deep=True)["ok"]

    clone = src.clone(str(tmp_path / "dst"))
    assert clone.fsck(deep=True)["ok"]

    # simulate source vacuum retiring a table version the clone references
    rel = clone.snapshot().manifest["tables"]["n_Person"]
    shutil.rmtree(rel)  # absolute path into the source
    report = clone.fsck()
    assert not report["ok"]
    assert any("n_Person" in e and "missing directory" in e for e in report["errors"])


def test_fsck_deep_catches_stats_drift(spark, tmp_path):
    """deep fsck cross-checks footer row totals against the manifest's
    recorded stats."""
    import json
    import os

    engine = Engine(spark, str(tmp_path / "db"), demo_schema())
    engine.run(big_bang)
    store = engine.store
    v = store.current_version()
    mpath = os.path.join(store.root, f"manifest.v{v}.json")
    with open(mpath) as f:
        m = json.load(f)
    m["stats"]["n_Person"]["rows"] += 5  # corrupt the recorded count
    with open(mpath, "w") as f:
        json.dump(m, f)
    report = store.fsck(deep=True)
    assert not report["ok"]
    assert any("recorded stats rows" in e for e in report["errors"])


def test_clone_resumes_past_crash_residue_and_source_advance(spark, tmp_path):
    """Review r10b: the clone retry must survive BOTH crash shapes — a
    complete v0 whose source has since advanced (resume: the clone
    reflects the originally captured version), and an in-flight rejection
    message for arbiter residue rather than a permanent dead-end."""
    import json

    engine = Engine(spark, str(tmp_path / "src"), demo_schema())
    engine.run(big_bang)
    src = engine.store

    # crash between manifest put and CURRENT publish, then source advances
    dst = str(tmp_path / "dst")
    clone = src.clone(dst)
    captured = clone.snapshot().manifest["cloned_from"]["version"]
    os.remove(os.path.join(dst, "CURRENT"))  # simulate the crash
    engine.run(lambda t: t.new_node("Person", name="Later", age=9))
    resumed = src.clone(dst)  # source is one version ahead now
    assert resumed.snapshot().manifest["cloned_from"]["version"] == captured
    assert "Later" not in {
        r["name"] for r in resumed.snapshot().nodes("Person").collect()
    }

    # someone else's half-created clone still rejects with a clear error
    other = str(tmp_path / "other")
    os.makedirs(other, exist_ok=True)
    with open(os.path.join(other, "manifest.v0.json"), "w") as f:
        json.dump({"cloned_from": {"root": "/elsewhere", "version": 3}}, f)
    with pytest.raises(ValueError, match="different source"):
        src.clone(other)


# ---------------------------------------------------------------------------
# retention guard (r11): source vacuum must not dangle a registered clone
# ---------------------------------------------------------------------------

def _churn(spark, src, n=3):
    """Rewrite Person n times so pre-clone versions drop out of the
    source's own retention horizon."""
    for i in range(n):
        src.merge_nodes(
            "Person",
            spark.createDataFrame([(f"s{i}", 50 + i)], "name string, age long"),
            on="name",
        )


def test_source_vacuum_preserves_registered_clone_files(spark, tmp_path):
    engine = Engine(spark, str(tmp_path / "src"), demo_schema())
    engine.run(big_bang)
    src = engine.store
    clone = src.clone(str(tmp_path / "dst"))
    pinned = _names(clone)
    _churn(spark, src)
    src.vacuum(retain_versions=1)
    # the clone's absolute-path references survive the source vacuum and
    # it still reads the exact snapshot it captured
    assert _names(clone) == pinned
    assert clone.fsck()["ok"]


def test_release_clone_unpins_and_vacuum_sweeps(spark, tmp_path):
    engine = Engine(spark, str(tmp_path / "src"), demo_schema())
    engine.run(big_bang)
    src = engine.store
    clone = src.clone(str(tmp_path / "dst"))
    _churn(spark, src)
    kept = set(src.vacuum(retain_versions=1))
    assert not kept or all("v1" not in k for k in kept)  # pinned v* stayed
    assert src.release_clone(clone.root) is True
    assert src.release_clone(clone.root) is False  # already dropped
    removed = src.vacuum(retain_versions=1)
    assert removed  # the previously-pinned early versions sweep now
    assert clone.fsck()["ok"] is False  # detection still works post-release


def test_dead_clone_pin_ages_out_and_fsck_warns(spark, tmp_path):
    import shutil as _shutil
    import time as _time

    engine = Engine(spark, str(tmp_path / "src"), demo_schema())
    engine.run(big_bang)
    src = engine.store
    clone = src.clone(str(tmp_path / "dst"))
    reg = src._clone_reg_path(clone.root)
    assert os.path.exists(reg)
    _shutil.rmtree(clone.root)
    # fresh dead pin: still protected (clone may be mid-create elsewhere)
    assert any("missing clone" in w for w in src.fsck()["warnings"])
    src.vacuum(retain_versions=1)
    assert os.path.exists(reg)
    # aged out: vacuum drops the registration
    old = _time.time() - 100_000
    os.utime(reg, (old, old))
    src.vacuum(retain_versions=1)
    assert not os.path.exists(reg)


def test_release_clone_sweeps_legacy_and_duplicate_pins(spark, tmp_path):
    """release_clone removes EVERY registration matching the clone root —
    including a pre-r12 abspath-keyed file next to the realpath-keyed one
    — so mixed key schemes cannot leave a survivor pinning vacuum."""
    import hashlib
    import json
    import os

    engine = Engine(spark, str(tmp_path / "src"), demo_schema())
    engine.run(big_bang)
    src = engine.store
    clone_root = str(tmp_path / "clone")
    src.clone(clone_root)
    reg_dir = os.path.join(src.root, "_clones")
    assert len(os.listdir(reg_dir)) == 1
    # fabricate a legacy pin: same clone_root field, different key
    legacy_key = hashlib.sha1(b"legacy-spelling").hexdigest()[:16]
    with open(os.path.join(reg_dir, f"{legacy_key}.json"), "w") as f:
        json.dump(
            {"clone_root": os.path.realpath(clone_root),
             "source_version": 0, "tables": []},
            f,
        )
    assert len(os.listdir(reg_dir)) == 2
    assert src.release_clone(clone_root) is True
    assert [n for n in os.listdir(reg_dir) if n.endswith(".json")] == []
    # releasing again reports no pin
    assert src.release_clone(clone_root) is False
