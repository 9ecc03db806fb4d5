"""Vector math over ``array<float>`` embedding columns — pure JVM-side
expressions (``aggregate``/``zip_with``), no Python UDFs, so similarity
scans stay inside whole-stage codegen and scale linearly with executors.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<numeric> columns (JVM-side fold)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


# -- int8 quantization (single source of truth, Spark + oracle SQL) ---------
#
# codes = round(v / scale * 127) with scale = max|v|; a ZERO vector gets
# all-zero codes explicitly — without the guard 0.0/0.0 is NaN in Spark
# (a CAST_INVALID_INPUT crash under ANSI mode) and NULL in DuckDB, i.e.
# engine-divergent.  Every consumer (the quantize op, IVF-PQ's shortlist
# scoring, and both oracles) builds from these two definitions, so the
# quantization rule cannot drift between sites.


def int8_scale(embedding: Column) -> Column:
    return F.array_max(F.transform(embedding, lambda x: F.abs(x.cast("double"))))


def int8_codes(embedding: Column, scale: Column) -> Column:
    return F.transform(
        embedding,
        lambda x: F.when(scale == 0, F.lit(0.0))
        .otherwise(F.round(x.cast("double") / scale * 127.0, 0))
        .cast("long"),
    )


def int8_scale_sql(embedding: str) -> str:
    return f"list_max(list_transform({embedding}, x -> abs(x::DOUBLE)))"


def int8_codes_sql(embedding: str, scale: str) -> str:
    return (
        f"list_transform({embedding}, x -> CASE WHEN {scale} = 0 THEN 0 "
        f"ELSE CAST(ROUND(x::DOUBLE / {scale} * 127.0, 0) AS BIGINT) END)"
    )


def cosine_sql(x: str, y: str) -> str:
    """DuckDB twin of :func:`cosine_similarity` — the ONE spelling of the
    cosine fragment every oracle embeds (aliased copies drift)."""
    return f"""
      list_sum(list_transform(list_zip({x}, {y}), p -> p[1]::DOUBLE * p[2]::DOUBLE))
      / (sqrt(list_sum(list_transform({x}, v -> v::DOUBLE * v::DOUBLE)))
         * sqrt(list_sum(list_transform({y}, v -> v::DOUBLE * v::DOUBLE))))
    """
