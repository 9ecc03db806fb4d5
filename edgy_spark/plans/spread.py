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
from pyspark.sql import functions as F

__all__ = ["spread_if_narrow", "sort_once"]


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


def sort_once(df: DataFrame, *keys: str) -> DataFrame:
    """Global sort that executes an expensive narrow child exactly ONCE.

    A global ``orderBy`` plans a range exchange whose partition bounds
    come from SAMPLING the exchange's input: Spark runs one extra job
    over the child subtree to collect sample keys, then the real
    shuffle-map pass runs the same subtree again.  Shuffle stages below
    are reused across the two jobs, so the double execution covers only
    the segment between the last exchange and the sort — but when that
    segment is the expensive part (a codec decode ``mapInPandas``, a
    tokenizer fold) the whole computation runs twice (measured exactly
    2.0x on the webp-lossy gate, r14).

    Interposing a hash exchange on the sort keys materializes the child
    as shuffle output once: the DAG scheduler feeds BOTH the sampling
    job and the sort's own map stage from that shuffle, so the heavy
    work executes once and the added exchange moves only the final
    scalar rows (the decode gates emit a handful of ints per document —
    at 100 TB this is the cheap decision-table shuffle of guide §8, not
    a payload move).  Results are identical: repartition changes only
    placement, and the final ``orderBy`` is the same total order.
    """
    return df.repartition(*[F.col(k) for k in keys]).orderBy(*keys)
