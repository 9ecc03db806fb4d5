"""Generic source/sink surface: parquet / CSV / JSON readers and writers.

The reference's only "source/sink" is its write-behind file persistence
(/root/reference/app/Main.hs:163-164 via persistent-stm); queries never
leave the host program.  A Spark engine needs a real IO boundary, so this
module defines it once:

- ``read_table`` — format-dispatched reader returning a lazy DataFrame.
  Parquet is the native path (columnar, predicate/column pushdown, the
  TIMESTAMP(NANOS) legacy flag the driver's fixtures need).  CSV/JSON take
  an explicit schema by default — schema inference is a full extra pass
  over the data, which at 100 TB is a job in itself (``infer=True`` opts
  in for exploration).
- ``write_table`` — sink with Hive-style ``partition_by`` layout; readers
  of a partitioned layout get partition pruning for free (the partition
  column moves into directory names).
- ``write_bucketed`` — pre-shuffled, sorted bucket layout registered in the
  session catalog.  Two tables bucketed on the same key with the same
  bucket count join WITHOUT an exchange (tests/test_io.py pins the
  no-Exchange plan) — at 100 TB this converts every recurring fact-fact
  join on the bucket key from a full shuffle into a local zip of sorted
  buckets, the single biggest repeated-cost saving this engine offers.

Parquet files are written zstd-compressed (session default) and should be
sized by tuning ``spark.sql.files.maxPartitionBytes`` at read and AQE
coalescing at write — not by hand-picking file counts.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

__all__ = ["read_table", "write_table", "write_bucketed", "compact_table"]

_FORMATS = ("parquet", "orc", "csv", "json", "text")


def _check_format(fmt: str) -> None:
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; expected one of {_FORMATS}")


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    infer: bool = False,
) -> DataFrame:
    """Read ``path`` as a DataFrame.  CSV/JSON require ``schema`` unless
    ``infer=True`` (inference is an extra full scan — fine for exploration,
    wrong as a pipeline default)."""
    _check_format(fmt)
    reader = spark.read
    if schema is not None:
        # an explicit schema applies to EVERY format: for self-describing
        # parquet/orc it is the schema-evolution contract (missing columns
        # read as null, the declared types win) — silently discarding it
        # would make the result depend on which files happen to be present
        reader = reader.schema(schema)
    if fmt == "parquet":
        # TIMESTAMP(NANOS) parquet (the driver's fixtures) needs
        # spark.sql.legacy.parquet.nanosAsLong=true — set at session build
        # (edgy_spark.session.get_spark), NOT mutated here, so a read never
        # has session-wide side effects.  Plain sessions reading nanos
        # files get Spark's explicit unsupported-type error pointing at
        # that flag.
        return reader.parquet(path)
    if fmt == "orc":
        # columnar like parquet: pushdown/pruning apply, schema travels with
        # the files — no explicit schema needed
        return reader.orc(path)
    if fmt == "text":
        # raw corpora: one string row per line, fixed schema (value: string)
        return reader.text(path)
    if schema is None and not infer:
        raise ValueError(f"{fmt} read needs an explicit schema (or infer=True)")
    if fmt == "csv":
        # multiLine + explicit quote escape: a quoted field containing a
        # line break is ONE record on read, exactly as the writer produced
        # it (without this, embedded newlines split one logical row into
        # malformed physical rows)
        return (
            reader.option("header", "true")
            .option("multiLine", "true")
            .option("escape", '"')
            .option("inferSchema", str(infer and schema is None).lower())
            .csv(path)
        )
    return reader.json(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: Sequence[str] = (),
) -> None:
    """Write ``df`` to ``path``; ``partition_by`` produces Hive-style
    ``col=value`` directories so downstream filters on those columns prune
    whole directories instead of reading files."""
    _check_format(fmt)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        # escape='"' pairs with read_table's parser settings so embedded
        # quotes/newlines round-trip byte-exactly
        writer.option("header", "true").option("escape", '"').csv(path)
    elif fmt == "json":
        writer.json(path)
    elif fmt == "orc":
        writer.orc(path)
    elif fmt == "text":
        writer.text(path)  # single string column required
    else:
        writer.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` bucketed (and optionally sorted) on ``bucket_cols``
    as session-catalog table ``table``.

    Join two tables bucketed on the same key with equal ``n_buckets`` and
    Catalyst plans a SortMergeJoin with NO Exchange on either side — the
    shuffle was paid once at write time.  Pick ``n_buckets`` so one bucket
    of the LARGER table fits an executor core's working memory at target
    scale (e.g. 100 TB / 4096 buckets ≈ 25 GB per bucket pre-compression).
    """
    writer = df.write.mode(mode).bucketBy(int(n_buckets), *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)


def compact_table(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_mb: int = 512,
    sort_by: Sequence[str] = (),
    zorder_by: tuple[str, str] | None = None,
) -> int:
    """Rewrite a parquet location into ~``target_file_mb``-sized files,
    optionally range-clustered by ``sort_by`` (one dimension) or
    ``zorder_by`` (two dimensions, Morton-interleaved) — the small-files
    maintenance job
    every long-running 100 TB pipeline needs (streaming sinks and
    per-trigger appends accumulate kB-sized files whose per-file open/
    footer-read overhead eventually dwarfs the data read).

    Sizing is derived from the INPUT's real bytes (no data scan — just
    file metadata), so the job adapts to compression ratios.  With
    ``sort_by`` the rewrite also lays rows out for min/max row-group
    skipping on those columns: a filtered read touches only the row
    groups whose stats overlap the predicate.

    Returns the number of output partitions written.
    """
    df = read_table(spark, in_path)
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(in_path)
    fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())
    total_bytes = fs.getContentSummary(jvm_path).getLength()
    target = target_file_mb * 1024 * 1024
    n = max(1, -(-int(total_bytes) // target))  # ceiling division
    if zorder_by:
        # two-dimensional clustering: range-partition + sort on the Morton
        # interleave so every output file covers a small (a, b) rectangle —
        # min/max skipping then works for predicates on EITHER column
        from edgy_spark.functions.zorder import zorder_key

        if "__edgy_zk" in df.columns:  # never silently clobber a data column
            raise ValueError("input already has a __edgy_zk column")
        zk = zorder_key(*zorder_by).alias("__edgy_zk")
        out = (
            df.withColumn("__edgy_zk", zk)
            .repartitionByRange(n, "__edgy_zk")
            .sortWithinPartitions("__edgy_zk")
            .drop("__edgy_zk")
        )
    elif sort_by:
        # repartitionByRange + sortWithinPartitions = globally range-
        # clustered layout (each file owns a disjoint key range)
        out = df.repartitionByRange(n, *sort_by).sortWithinPartitions(*sort_by)
    elif df.rdd.getNumPartitions() == n:
        out = df  # already the right partition count: skip a full shuffle
    else:
        out = df.coalesce(n) if df.rdd.getNumPartitions() > n else df.repartition(n)
    out.write.mode("overwrite").parquet(out_path)
    return n
