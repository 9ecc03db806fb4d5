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


# ---------------------------------------------------------------------------
# Python UDTF (the real @udtf API, PySpark 4): 1→N expansion with logic
# ---------------------------------------------------------------------------

UDTF_BLOCK = 128  # tokens per training window emitted by the UDTF


@register(
    "udtf_block_windows",
    oracle=f"""
    WITH d AS (SELECT doc_id,
                      len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
               FROM documents),
    i AS (SELECT doc_id, n_tokens,
                 unnest(range(1, CAST(ceil(n_tokens / {UDTF_BLOCK}.0) AS BIGINT) + 1))
                   AS i
          FROM d WHERE n_tokens > 0)
    SELECT doc_id,
           (i - 1) * {UDTF_BLOCK} AS block_start,
           least({UDTF_BLOCK}, n_tokens - (i - 1) * {UDTF_BLOCK}) AS block_len
    FROM i
    ORDER BY doc_id, block_start
    """,
    tags=("udx", "udtf", "pipeline"),
)
def udtf_block_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document training windows via a REAL Python UDTF (`@udtf` +
    LATERAL join): each (doc_id, n_tokens) row expands to one row per
    {UDTF_BLOCK}-token window — the per-document chunking step a tokenizer
    fan-out runs (compare pipeline_pack_blocks, which packs ACROSS
    documents).

    This operator exists to cover the UDTF third of the UDF/UDAF/UDTF
    surface with the genuine table-function API — arbitrary Python
    generator logic per input row, schema-checked output.  This particular
    expansion IS expressible JVM-side (sequence() + explode), and that is
    what a hot path should use; the UDTF form is the extension point for
    expansions that are not (per-row tokenizer calls, model-specific
    windowing).  Cost shape: rows stream through one Python worker pass —
    Arrow-batched buffering, no shuffle introduced by the expansion itself.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id long, block_start long, block_len long")
    class BlockWindows:
        def eval(self, doc_id, n_tokens):
            start = 0
            while start < (n_tokens or 0):
                ln = min(UDTF_BLOCK, n_tokens - start)
                yield doc_id, start, ln
                start += ln

    spark.udtf.register("block_windows", BlockWindows)
    d = load(spark, sf_dir, "documents")
    d.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tokens"),
    ).createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT w.doc_id, w.block_start, w.block_len
        FROM _udtf_docs, LATERAL block_windows(doc_id, n_tokens) w
        ORDER BY w.doc_id, w.block_start
        """
    )
