"""edgy_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference graph database (cdsmith/edgy),
re-expressed Spark-first for 100 TB scale.

Layout:
- ``schema``    — plan-time-validated property-graph schema DSL
  (parity with the reference's compile-time TypeErrors,
  /root/reference/src/Edgy/Schema.hs:341-345, 417-427, 568-582, 131-144).
- ``storage``   — versioned snapshot store (parquet + manifest) giving the
  reference's STM atomic-batch semantics (/root/reference/src/Edgy/Operations.hs:73-89).
- ``graph``     — the 12-operation surface (/root/reference/src/Edgy.hs:12-46).
- ``query``     — traversal-to-join compiler (scan/filter/hop/union/bag-diff).
- ``operators`` — dedup, similarity, text analysis, as-of/range joins,
  multimodal plumbing (north-star scope).
- ``streaming`` — Structured Streaming over the events table.
- ``plans``     — plan inspection / scale-assertions (pushdown, broadcast).
"""

from edgy_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
