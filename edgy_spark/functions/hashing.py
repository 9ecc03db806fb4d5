"""Cross-engine deterministic hashing.

Spark's ``xxhash64``/``hash`` and DuckDB's ``hash`` are different algorithms,
so oracle-checked sketches (minhash, simhash, fingerprints) derive integer
hashes from md5 instead — identical hex in both engines.  ``h60`` takes the
first 15 hex digits (60 bits, < 2^63, no sign issues).

SQL equivalent: ``('0x' || substr(md5(x), 1, 15))::BIGINT``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def h60(c: Column) -> Column:
    """60-bit integer hash of a string column via md5 (engine-portable)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def h60_sql(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"
