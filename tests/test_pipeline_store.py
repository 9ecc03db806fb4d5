"""End-to-end LLM-pipeline composition AGAINST THE STORE (VERDICT r09 #7):
the catalog's dedup/quality operators read driver parquet via ``load()``;
nothing had proven the full loop corpus-in-GraphStore -> ``format("edgy")``
read (zone-map pruning live) -> dedup/quality plan -> store write.  This
closes it, exercising the pinned Spark 4.1 filtered-scan-reuse hazard the
realistic way: one ``load()`` per action in a multi-action pipeline."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.datasource import GreaterThan

from edgy_spark.graph import Engine
from edgy_spark.schema import Attr, GraphSchema, NodeType
from edgy_spark.sources.pysource import (
    EdgyReader,
    _resolve_table_path,
    register_edgy_source,
)

DOC_SCHEMA = GraphSchema(
    node_types=(NodeType("Document", (Attr("text"), Attr("source"))),),
)

# 40 docs in 4 id-ranges: ids 10-19 curated originals, 100-109 crawl docs
# that EXACTLY duplicate them, 200-209 unique crawl docs, 300-309 junk
# (too short to survive the quality gate).
LONG = "the quick brown fox jumps over the lazy dog near the river bank"


def _corpus_rows():
    rows = []
    for i in range(10):
        rows.append((10 + i, f"{LONG} variant {i}", "curated"))
        rows.append((100 + i, f"{LONG} variant {i}", "crawl"))  # exact dup
        rows.append((200 + i, f"unique crawl document number {i} " + LONG, "crawl"))
        rows.append((300 + i, f"junk {i}", "crawl"))  # short -> dropped
    return rows


def _doc_reader(spark, root):
    return (
        spark.read.format("edgy")
        .option("root", root)
        .option("table", "n_Document")
    )


def test_store_corpus_dedup_quality_roundtrip(spark, tmp_path):
    engine = Engine(spark, str(tmp_path / "db"), DOC_SCHEMA)
    register_edgy_source(spark)
    root = engine.store.root

    # 1. bulk-load the corpus into the store, range-partitioned so the
    #    version dir holds several files with real zone-map stats
    (
        spark.createDataFrame(_corpus_rows(), "id long, text string, source string")
        .repartitionByRange(4, "id")
        .write.format("edgy")
        .option("root", root)
        .option("table", "n_Document")
        .mode("append")
        .save()
    )
    v_raw = engine.store.current_version()

    # 2. zone-map pruning is LIVE on the loaded corpus: a pushed id-range
    #    filter plans tasks for only the matching range-files...
    path = _resolve_table_path(root, "n_Document", None)
    schema = _doc_reader(spark, root).load().schema
    r = EdgyReader(path, schema)
    assert list(r.pushFilters([GreaterThan(("id",), 299)])) == []
    assert len(r.partitions()) == 1  # 3 of 4 range-files pruned at planning

    # ...and a THROUGH-SPARK filtered action returns exactly those rows
    junk_ids = {
        x.id for x in _doc_reader(spark, root).load().filter(F.col("id") > 299).collect()
    }
    assert junk_ids == {300 + i for i in range(10)}

    # 3. the dedup/quality plan reads its OWN fresh load() (the pinned
    #    Spark 4.1 hazard: the filtered action above would otherwise
    #    poison a filterless scan of the same loaded DataFrame)
    docs = _doc_reader(spark, root).load()
    assert docs.count() == 40  # filterless read is not poisoned

    # exact dedup (hash-groupBy, keep min id) + quality gate (>= 5 words)
    keepers = (
        docs.groupBy(F.md5(F.col("text")).alias("h"))
        .agg(F.min("id").alias("id"))
        .select("id")
    )
    cleaned = (
        docs.join(keepers, "id", "left_semi")
        .filter(F.size(F.split(F.trim(F.col("text")), r"\s+")) >= 5)
        .select("id", "text", "source")
    )

    # 4. write the cleaned corpus back as a new atomic store version
    (
        cleaned.write.format("edgy")
        .option("root", root)
        .option("table", "n_Document")
        .mode("overwrite")
        .save()
    )

    # curated originals beat their crawl duplicates (min id); junk is gone
    after = {x.id for x in _doc_reader(spark, root).load().collect()}
    assert after == {10 + i for i in range(10)} | {200 + i for i in range(10)}
    srcs = {
        x.source
        for x in _doc_reader(spark, root).load().filter(F.col("id") < 100).collect()
    }
    assert srcs == {"curated"}

    # 5. the raw corpus still time-travels (nothing rewritten in place),
    #    and the engine's own snapshot surface sees the cleaned table
    raw = (
        _doc_reader(spark, root)
        .option("version", str(v_raw))
        .load()
        .count()
    )
    assert raw == 40
    snap_ids = {x["id"] for x in engine.snapshot().nodes("Document").collect()}
    assert snap_ids == after
