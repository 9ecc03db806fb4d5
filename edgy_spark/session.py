"""SparkSession factory tuned for this engine.

Local testing runs ``local[$SPARK_GRAFT_CPUS]`` (default 32) but every
config below is chosen for the 1000-executor / 100 TB deployment story:

- AQE on: runtime shuffle-partition coalescing, skew-join splitting, and
  dynamic broadcast conversion replace hand-tuned partition counts.
- ``spark.sql.shuffle.partitions`` starts at 2x cores locally; at cluster
  scale AQE coalesces from a deliberately-high initial number, so the
  initial value only needs to be "not tiny".
- Arrow enabled for every pandas_udf / applyInPandas boundary (the only
  Python-side execution this engine allows; see edgy_spark.operators).
- Parquet pushdown/pruning left at defaults (on) — operators are written
  so filters and projections reach the scan (verified in tests/test_plans.py).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "DEFAULT_SF_DIR"]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _cpus() -> int:
    try:
        return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    except ValueError:
        return 32


def get_spark(app_name: str = "edgy-spark", cpus: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's standard config."""
    n = cpus or _cpus()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{n}]")
        .config("spark.sql.shuffle.partitions", str(max(2 * n, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # keep bucketed scans on even when no join/agg consumes the
        # distribution: the graph store's point adjacency reads rely on
        # bucket PRUNING (filter on the bucket key -> scan 1/N buckets,
        # tests/test_plans.py pins SelectedBucketsCount), which the
        # auto-bucketed-scan heuristic would silently turn off
        .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # the driver's fixture parquet carries TIMESTAMP(NANOS); read as
        # long nanos everywhere (sources.tables.load converts to µs ts).
        # Set here once so generic readers (sources.io.read_table) don't
        # mutate session state as a side effect; sources.tables.load still
        # sets it at read time for driver-owned plain sessions.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
    )
    return builder.getOrCreate()
