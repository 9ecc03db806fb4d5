"""The runnable demo CLI (python -m edgy_spark.demo) — the reference's
executable (/root/reference/app/Main.hs:161-205) end to end: create, query,
and every mutation command, against a temp store."""

from __future__ import annotations

from edgy_spark.demo import main


def _query(capsys, spark, root, name):
    assert main(["--root", root, "query", name], spark=spark) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0] == f"{name} is missing:"
    return out[1:]


def test_demo_cli_full_workload(spark, tmp_path, capsys):
    root = str(tmp_path / "demo.db")
    assert main(["--root", root, "create"], spark=spark) == 0

    # golden query outputs (FIXTURES.md §1)
    assert _query(capsys, spark, root, "Bob") == ["Poker Chips"]
    assert _query(capsys, spark, root, "Jane") == ["Poker Chips"]

    # buy: Bob acquires the chips -> nothing missing
    assert main(["--root", root, "buy", "Bob", "Poker Chips"], spark=spark) == 0
    assert _query(capsys, spark, root, "Bob") == []
    # ...and Jane's friends still don't own them (friend = Jose only)
    assert _query(capsys, spark, root, "Jane") == ["Poker Chips"]

    # friend: Jane befriends Bob -> Bob's chips become available to her
    assert main(["--root", root, "friend", "Jane", "Bob"], spark=spark) == 0
    assert _query(capsys, spark, root, "Jane") == []

    # unfriend + discard round-trip back to missing
    assert main(["--root", root, "unfriend", "Jane", "Bob"], spark=spark) == 0
    assert main(["--root", root, "discard", "Bob", "Poker Chips"], spark=spark) == 0
    assert _query(capsys, spark, root, "Bob") == ["Poker Chips"]

    # marry / divorce execute cleanly (spouse is Optional-cardinality)
    assert main(["--root", root, "divorce", "Bob", "Jane"], spark=spark) == 0
    assert main(["--root", root, "marry", "Bob", "Jane"], spark=spark) == 0

    # bad usage
    assert main(["--root", root, "frobnicate"], spark=spark) == 1


def test_demo_maintain_command(spark, tmp_path):
    from edgy_spark.demo import main

    root = str(tmp_path / "db")
    assert main(["--root", root, "create"], spark=spark) == 0
    assert main(["--root", root, "buy", "Bob", "Poker Chips"], spark=spark) == 0
    assert main(["--root", root, "maintain"], spark=spark) == 0
    # store still reads after maintenance
    assert main(["--root", root, "query", "Bob"], spark=spark) == 0


def test_demo_changes_command(spark, tmp_path, capsys):
    """`changes` prints the captured row-level change feed in commit order
    (demo stores capture their CDC by default)."""
    root = str(tmp_path / "db")
    assert main(["--root", root, "create"], spark=spark) == 0
    capsys.readouterr()
    assert main(["--root", root, "changes"], spark=spark) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[-1] == "3 change(s)"  # bigBang's three Person inserts
    assert all("insert" in line for line in out[:-1])
    assert any("'Bob'" in line for line in out)


def test_demo_bulkload_command(spark, tmp_path, capsys):
    """`bulkload N1 N2 ...` loads people + their friendships atomically in
    ONE store version via the multi-table txn, and the engine reads the
    result like any other data."""
    from edgy_spark.demo import demo_schema
    from edgy_spark.graph import Engine

    root = str(tmp_path / "demo.db")
    assert main(["--root", root, "create"], spark=spark) == 0
    engine = Engine(spark, root, demo_schema(), capture_cdc=True)
    v0 = engine.store.current_version()
    assert main(["--root", root, "bulkload", "Pia", "Quinn"], spark=spark) == 0
    out = capsys.readouterr().out
    assert "atomically" in out
    assert engine.store.current_version() == v0 + 1  # ONE version for both
    txn = engine.read()
    by_name = {
        txn.get_attribute(n, "name"): n for n in txn.all_nodes("Person")
    }
    assert {n.id for n in txn.get_related(by_name["Pia"], "friend")} == {
        by_name["Quinn"].id
    }
