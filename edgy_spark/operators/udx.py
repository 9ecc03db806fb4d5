"""Custom aggregate surface: grouped-agg Pandas UDFs (the UDAF form).

The engine's extension taxonomy (mirroring the reference, whose extension
surface is "all of Haskell" — attribute types and filters are arbitrary
host code, src/Edgy/Schema.hs:148-155):

- scalar row logic      → built-in pyspark.sql.functions (JVM, codegen)
- 1→N row expansion     → explode/posexplode natively; mapInPandas when the
                          expansion needs Python (multimodal frame ops)
- grouped map           → applyInPandas (multimodal_audio_energy)
- grouped AGGREGATE     → pandas_udf grouped-agg, shown here: Arrow ships
                          each group's column slices to one Python call
                          that returns one scalar — Catalyst treats it as
                          a first-class aggregate (partial aggregation is
                          not available for Python aggregates, so the
                          shuffle carries raw group rows; keep group
                          cardinality high / rows narrow, as here).

The showcase statistic is the Gini concentration of order value per
priority, in EXACT scaled-integer arithmetic: with x sorted ascending,
numerator = Σ (2i - n - 1)·x_i and denominator = n·Σx are both int64 — the
tie order among equal x values cancels out of the numerator, so the result
is deterministic under any partitioning, and the oracle reproduces it with
window functions.  (gini = num/den ∈ [0,1); emitted as the exact int pair
so the hash compare never touches a float division.)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from edgy_spark.catalog import register
from edgy_spark.functions.exact import dec
from edgy_spark.sources import load


def _gini_udfs():
    # built lazily: pandas_udf resolves its return type against the active
    # SparkSession, so module import must not require one

    @pandas_udf("long")
    def gini_numerator(v: pd.Series) -> int:
        xs = sorted(int(x) for x in v)
        n = len(xs)
        return sum((2 * i - n - 1) * x for i, x in enumerate(xs, start=1))

    @pandas_udf("long")
    def gini_denominator(v: pd.Series) -> int:
        xs = [int(x) for x in v]
        return len(xs) * sum(xs)

    return gini_numerator, gini_denominator


@register(
    "udaf_gini_order_concentration",
    oracle="""
    WITH c AS (
      SELECT o_orderpriority,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
      FROM orders),
    r AS (
      SELECT o_orderpriority, cents,
             row_number() OVER (PARTITION BY o_orderpriority ORDER BY cents) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM c)
    SELECT o_orderpriority,
           CAST(SUM((2 * rn - n - 1) * cents) AS BIGINT) AS gini_num,
           CAST(ANY_VALUE(n) * SUM(cents) AS BIGINT) AS gini_den
    FROM r
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("udaf", "pandas-udf", "aggregation"),
)
def udaf_gini_order_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority Gini concentration of order value via grouped-agg
    Pandas UDFs (exact integer numerator/denominator; see module doc)."""
    gini_numerator, gini_denominator = _gini_udfs()
    o = load(spark, sf_dir, "orders")
    cents = (dec("o_totalprice", 2, 12) * 100).cast("long")
    return (
        o.select("o_orderpriority", cents.alias("cents"))
        .groupBy("o_orderpriority")
        .agg(
            gini_numerator("cents").alias("gini_num"),
            gini_denominator("cents").alias("gini_den"),
        )
        .orderBy("o_orderpriority")
    )
