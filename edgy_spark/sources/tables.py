"""Parquet sources for the driver's synthetic star schema (TESTDATA.md).

Scale notes (100 TB stance):
- Reads go through ``spark.read.parquet`` so Catalyst owns predicate
  pushdown, column pruning, and partition pruning; nothing here ever
  collects to the driver.
- At cluster scale these would be partitioned table locations (e.g.
  lineitem partitioned by ship date); the loader is path-based so the
  same code serves both layouts.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension-sized tables that should be broadcast when joined against the
# fact tables (orders/lineitem/events).  At 100 TB the fact tables grow
# 1000x while these stay small, so the hint stays valid.
SMALL_DIMS = frozenset({"region", "nation", "supplier", "customer", "part"})


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.ts arrives as either parquet TIMESTAMP(NANOS) (older
        # fixtures — Spark's vectorized reader rejects it, so read as long
        # nanos and floor to µs, matching DuckDB's ns→µs truncation) or as
        # TIMESTAMP(MICROS) without UTC adjustment (current fixtures —
        # Spark 4 infers TIMESTAMP_NTZ).  Normalize both to a plain
        # TIMESTAMP with the session pinned to UTC, so downstream operators
        # (unix_micros, watermarks, window()) see ONE type under any
        # caller-provided SparkSession.  Set at read time so it works for
        # driver-owned plain sessions too.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str, suffix: str = "") -> None:
    """Expose every fixture table as a SQL temp view so queries can run
    through ``spark.sql`` directly — the full Spark SQL dialect (ANSI joins,
    window functions, grouping sets, lateral views) becomes the user-facing
    query language with zero engine code.

    Views are lazy: each still reads through :func:`load`, so predicate
    pushdown / column pruning apply per-query, and registering all ten
    tables costs one schema read each, no data scan.
    """
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(f"{t}{suffix}")
