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

def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize the fixtures' ``ts`` column to a plain ``TIMESTAMP``.

    ``events.ts`` arrives as either parquet TIMESTAMP(NANOS) (older fixtures
    — Spark's vectorized reader rejects it, so it is read as long nanos via
    the ``nanosAsLong`` conf and truncated toward zero to µs (``div 1000``), matching DuckDB's ns→µs
    truncation) or TIMESTAMP(MICROS) without UTC adjustment (current
    fixtures — Spark 4 infers TIMESTAMP_NTZ).  The single shared
    normalization point for the batch loader and the streaming reader, so a
    fixture format change can never make batch and streaming diverge.
    """
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if ts_type == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def ensure_utc_events_session(spark: SparkSession) -> None:
    """Pin the two confs the events table's ts semantics depend on.

    NTZ→TIMESTAMP casting, ``window()`` alignment, and ``date_format``
    output all read ``spark.sql.session.timeZone``; this engine defines
    event-time semantics in UTC (and the DuckDB oracle formats naively, so
    any other zone hash-mismatches).  Sessions built by
    :func:`edgy_spark.session.get_spark` already pin both confs at build
    time, making this a no-op; for a caller-provided session each conf is
    set ONLY when it differs — a documented side effect of reading the
    events table, kept deliberately minimal (see ADVICE: no blanket
    session mutation on every read).

    A set-then-restore around the load would NOT be sounder: the returned
    DataFrame is lazy, and ``session.timeZone`` is read at EXECUTION time —
    restoring it after ``load()`` returns would silently flip event-time
    semantics for every later action on the DataFrame.  Persisting the two
    confs is the only way a lazy plan can carry the UTC contract.
    """
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if spark.conf.get("spark.sql.session.timeZone") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table.

    Side effect (events only): pins ``spark.sql.session.timeZone=UTC`` and
    ``nanosAsLong`` on the session if not already set — event-time semantics
    are UTC by contract (see :func:`ensure_utc_events_session`).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        ensure_utc_events_session(spark)
        return normalize_event_ts(spark.read.parquet(path))
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
