"""Source/sink round-trips and the bucketed no-shuffle join guarantee."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from edgy_spark.sources import load
from edgy_spark.sources.io import read_table, write_bucketed, write_table
from tests.conftest import SF_SMOKE


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


def test_partitioned_parquet_roundtrip_and_pruning(spark, tmp_path):
    ev = load(spark, SF_SMOKE, "events").select("event_id", "event_type", "value")
    path = str(tmp_path / "ev_parquet")
    write_table(ev, path, "parquet", partition_by=["event_type"])
    back = read_table(spark, path)
    assert _rows(back, ["event_id", "event_type", "value"]) == _rows(
        ev, ["event_id", "event_type", "value"]
    )
    # partition pruning: a filter on the partition column reads a subset
    pruned = read_table(spark, path).filter(F.col("event_type") == "click")
    plan = pruned._sc._jvm.PythonSQLUtils.explainString(
        pruned._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters: [isnotnull(event_type" in plan


def test_csv_roundtrip_with_schema(spark, tmp_path):
    ev = load(spark, SF_SMOKE, "events").select("event_id", "user_id", "value")
    path = str(tmp_path / "ev_csv")
    write_table(ev, path, "csv")
    back = read_table(spark, path, "csv", schema="event_id long, user_id long, value double")
    assert _rows(back, ["event_id", "user_id", "value"]) == _rows(
        ev, ["event_id", "user_id", "value"]
    )


def test_csv_requires_schema(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError, match="schema"):
        read_table(spark, str(tmp_path), "csv")


def test_json_roundtrip(spark, tmp_path):
    ev = load(spark, SF_SMOKE, "events").select("event_id", "event_type")
    path = str(tmp_path / "ev_json")
    write_table(ev, path, "json")
    back = read_table(spark, path, "json", schema="event_id long, event_type string")
    assert _rows(back, ["event_id", "event_type"]) == _rows(ev, ["event_id", "event_type"])


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Both sides bucketed on the join key → SortMergeJoin with zero
    Exchange operators: the shuffle was paid at write time."""
    o = load(spark, SF_SMOKE, "orders").select("o_orderkey", "o_custkey")
    l = load(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(o, "t_orders_b", ["o_orderkey"], 4, sort_cols=["o_orderkey"],
                   path=str(tmp_path / "orders_b"))
    write_bucketed(l, "t_lineitem_b", ["l_orderkey"], 4, sort_cols=["l_orderkey"],
                   path=str(tmp_path / "lineitem_b"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # at test scale both sides fit the broadcast threshold, which would
        # mask the bucketing; at real scale neither side broadcasts
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        ob = spark.table("t_orders_b")
        lb = spark.table("t_lineitem_b")
        joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey)
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        # and it still computes the right thing
        expected = o.join(l, o.o_orderkey == l.l_orderkey).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_sql_views_match_dataframe_plan(spark):
    """spark.sql over registered views == the DataFrame formulation, and the
    view indirection still pushes filters into the parquet scan."""
    from edgy_spark.sources.tables import load, register_views

    register_views(spark, SF_SMOKE)
    sql_rows = spark.sql(
        """
        SELECT n.n_name, COUNT(*) AS n_customers
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE c.c_acctbal > 0
        GROUP BY n.n_name ORDER BY n.n_name
        """
    ).collect()
    n = load(spark, SF_SMOKE, "nation")
    c = load(spark, SF_SMOKE, "customer").filter("c_acctbal > 0")
    df_rows = (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name").count().withColumnRenamed("count", "n_customers")
        .orderBy("n_name")
    ).collect()
    assert [tuple(r) for r in sql_rows] == [tuple(r) for r in df_rows]

    q = spark.sql("SELECT c_custkey FROM customer WHERE c_acctbal > 100")
    plan = q._sc._jvm.PythonSQLUtils.explainString(
        q._jdf.queryExecution(), "formatted"
    )
    m = re.search(r"PushedFilters: \[(.*?)\]", plan)
    assert m and "c_acctbal" in m.group(1), plan


def test_compact_table_roundtrip_and_layout(spark, tmp_path):
    """Compaction preserves data exactly, produces the computed file count,
    and a sort_by layout range-clusters rows (disjoint per-file key ranges)."""
    import glob

    from edgy_spark.sources.io import compact_table, read_table

    src = str(tmp_path / "frag")
    # simulate a fragmented streaming sink: 20 tiny files
    ev = load(spark, SF_SMOKE, "events").select("event_id", "user_id", "value")
    ev.repartition(20).write.mode("overwrite").parquet(src)
    assert len(glob.glob(f"{src}/part-*.parquet")) == 20

    out = str(tmp_path / "compact")
    n = compact_table(spark, src, out, target_file_mb=512, sort_by=["event_id"])
    files = glob.glob(f"{out}/part-*.parquet")
    assert len(files) == n  # tiny input → 1 file
    before = sorted(tuple(r) for r in ev.collect())
    after = sorted(tuple(r) for r in read_table(spark, out).collect())
    assert before == after

    # range clustering: per-file [min,max] of the sort key must not overlap
    ranges = []
    for f in sorted(files):
        pdf = spark.read.parquet(f).agg(
            F.min("event_id").alias("lo"), F.max("event_id").alias("hi")
        ).collect()[0]
        ranges.append((pdf.lo, pdf.hi))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    ev = load(spark, SF_SMOKE, "events").select("event_id", "user_id", "value")
    path = str(tmp_path / "ev_orc")
    write_table(ev, path, "orc")
    back = read_table(spark, path, "orc")
    assert _rows(back, ["event_id", "user_id", "value"]) == _rows(
        ev, ["event_id", "user_id", "value"]
    )
    q = read_table(spark, path, "orc").filter(F.col("event_id") < 100)
    plan = q._sc._jvm.PythonSQLUtils.explainString(q._jdf.queryExecution(), "formatted")
    m = re.search(r"PushedFilters: \[(.*?)\]", plan)
    assert m and "event_id" in m.group(1)


def test_text_roundtrip(spark, tmp_path):
    docs = load(spark, SF_SMOKE, "documents").select(
        F.regexp_replace("text", "\n", " ").alias("value")
    )
    path = str(tmp_path / "docs_text")
    write_table(docs, path, "text")
    back = read_table(spark, path, "text")
    assert back.columns == ["value"]
    assert back.count() == docs.count()


def test_zorder_key_matches_reference_and_clusters(spark, tmp_path):
    """Spark Morton key == pure-Python reference; z-ordered compaction gives
    every output file a bounded rectangle in BOTH dimensions."""
    import glob

    from edgy_spark.functions.zorder import zorder_key, zorder_key_py
    from edgy_spark.sources.io import compact_table

    sample = [(0, 0), (1, 2), (3, 5), (12345, 67890), (2**31 - 1, 17),
              (17, 2**31 - 1), (2**31 - 1, 2**31 - 1), (2**32 + 5, 2**33 + 9)]
    df = spark.createDataFrame(sample, "a long, b long").withColumn(
        "z", zorder_key("a", "b")
    )
    for r in df.collect():
        assert r.z == zorder_key_py(r.a & 0x7FFFFFFF, r.b & 0x7FFFFFFF), (r.a, r.b)
        # signed-BIGINT safety: the 62-bit key must never go negative,
        # even at the top of the 31-bit input range
        assert r.z >= 0, (r.a, r.b, r.z)

    # layout property: files partition the z-range (disjoint), so each file
    # covers a contiguous Morton segment = a union of small (a,b) rectangles
    src = str(tmp_path / "zsrc")
    ev = load(spark, SF_SMOKE, "events").select("event_id", "user_id", "value")
    ev.repartition(8).write.mode("overwrite").parquet(src)
    out = str(tmp_path / "zout")
    compact_table(spark, src, out, target_file_mb=512, zorder_by=("user_id", "event_id"))
    back = spark.read.parquet(out)
    assert sorted(tuple(r) for r in back.collect()) == sorted(
        tuple(r) for r in ev.collect()
    )
    assert "_zk" not in back.columns
    assert len(glob.glob(f"{out}/part-*.parquet")) >= 1


def test_observed_quality_metrics_ride_the_job(spark, tmp_path):
    """observe() metrics arrive with the action itself — no second scan —
    and report exactly the rows/nulls/ranges the data contains."""
    from edgy_spark.functions.observe import observed_quality

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (4, None)], "id long, s string"
    )
    observed, obs = observed_quality(
        df, null_cols=["s"], range_cols=["id"], name="ioq"
    )
    observed.write.mode("overwrite").parquet(str(tmp_path / "out"))
    got = obs.get
    assert got == {"n_rows": 4, "nulls_s": 2, "min_id": 1, "max_id": 4}


def test_csv_roundtrip_preserves_embedded_newlines_and_quotes(spark, tmp_path):
    """r06 review: quoted multi-line CSV fields must read back as ONE
    record (multiLine + matching escape on both sides)."""
    df = spark.createDataFrame(
        [(1, 'line1\nline2'), (2, 'say "hi", ok'), (3, "plain")],
        "id long, text string",
    )
    path = str(tmp_path / "csv_nl")
    write_table(df, path, "csv")
    back = read_table(spark, path, "csv", schema="id long, text string")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_parquet_read_applies_explicit_schema(spark, tmp_path):
    """An explicit schema is the schema-evolution contract: columns missing
    from older files read as NULL instead of failing per-file."""
    old = str(tmp_path / "old")
    spark.createDataFrame([(1,)], "id long").write.parquet(old)
    back = read_table(spark, old, "parquet", schema="id long, new_col string")
    assert back.columns == ["id", "new_col"]
    assert [tuple(r) for r in back.collect()] == [(1, None)]


def test_observed_quality_zero_row_action_reports_zero_nulls(spark, tmp_path):
    from edgy_spark.functions.observe import observed_quality

    df = spark.createDataFrame([], "id long, s string")
    observed, obs = observed_quality(df, null_cols=["s"], name="ioq0")
    observed.write.mode("overwrite").parquet(str(tmp_path / "out0"))
    assert obs.get["n_rows"] == 0 and obs.get["nulls_s"] == 0
