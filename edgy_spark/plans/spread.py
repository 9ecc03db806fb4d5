"""Scale-adaptive input-parallelism spread (optimization guide §2.5).

A single small parquet file yields ONE scan partition, so every map-side
expression evaluated before the first exchange — shingling, hashing,
tokenization folds — serializes onto one core no matter how many the
cluster has.  The guide's remedy for deficient input parallelism is
"repartition immediately after the read"; at real scale a multi-file
table has native scan parallelism and the repartition would be a pure
waste, so the spread is CONDITIONAL on the scan's natural width: wide
inputs pass through untouched (zero added shuffle — the 100 TB plan is
unchanged), narrow fixture scans fan out to the cluster's parallelism.

The codec gates' ``_parallel_doc_ids`` (operators/multimodal.py) is the
id-only ancestor of this helper; this one carries payload columns, so
callers should ``select`` the columns they need BEFORE spreading to keep
the (fixture-sized) shuffle narrow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["spread_if_narrow"]


def spread_if_narrow(df: DataFrame, factor: int = 1) -> DataFrame:
    """Round-robin ``df`` to ``factor``× the cluster's default parallelism
    when (and only when) its natural partitioning is narrower than that.

    The width probe reads the JVM Dataset's own RDD partition count — a
    metadata-only planning step, no job (the ``df.rdd`` Python property
    would additionally build the Python-conversion pipeline).
    """
    target = df.sparkSession.sparkContext.defaultParallelism * factor
    if df._jdf.rdd().getNumPartitions() < target:
        return df.repartition(target)
    return df
