"""Zero-cost pipeline quality metrics via ``df.observe``.

A 100 TB pipeline cannot afford monitoring that re-scans: a separate
``count()`` / null-audit job doubles the read.  ``observe`` attaches
aggregate metrics to the SAME job — they are computed incrementally as
tasks stream rows, cost nothing beyond the expressions, and arrive on the
driver when the action finishes.  This is the mechanism behind every
"rows in vs rows out / null-rate" dashboard a production ingest needs.

Usage::

    df, obs = observed_quality(df, null_cols=["text", "lang"])
    df.write.parquet(out)          # the action
    obs.get                       # {'n_rows': ..., 'nulls_text': ..., ...}

The returned metrics dict blocks until the first action completes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed_quality(
    df: DataFrame,
    null_cols: Sequence[str] = (),
    range_cols: Sequence[str] = (),
    name: str = "quality",
) -> tuple[DataFrame, Observation]:
    """Attach row-count, per-column null-count, and per-column min/max
    metrics to ``df``'s next action.  Returns (observed df, Observation);
    read ``observation.get`` after the action.

    Metrics ride the existing job: no second scan, no shuffle — each is a
    map-side-combinable aggregate the executors fold as they go.
    """
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in null_cols:
        # coalesce: SUM over zero rows is NULL, and a monitoring consumer
        # doing arithmetic on the metric must see 0, not None
        metrics.append(
            F.coalesce(
                F.sum(F.col(c).isNull().cast("long")), F.lit(0)
            ).alias(f"nulls_{c}")
        )
    for c in range_cols:
        metrics.append(F.min(c).alias(f"min_{c}"))
        metrics.append(F.max(c).alias(f"max_{c}"))
    obs = Observation(name)
    return df.observe(obs, *metrics), obs
