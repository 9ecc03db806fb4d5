"""Random-hyperplane LSH signature machinery, shared by the similarity
operators (bucketed ANN candidates) and the dedup operators (self-contained
embedding near-dup blocking).

Lives outside operators/ so importing it never triggers query registration —
operators.dedup can use the signature without pulling operators.similarity's
catalog entries in ahead of its own (registration order is visible to the
driver's correctness gate).

Both engines compute the IDENTICAL signature: the plane coefficients are
md5-derived literals embedded in the Spark plan and the DuckDB oracle SQL,
and the projection is a sequential in-row fold in both, so no distributed
float-sum ordering can flip a sign bit between engines.

PRECONDITION, stated: embeddings must be exactly DIM non-null floats.  On a
malformed row (short vector, NULL element) the two engines' fold semantics
differ — Spark's ``aggregate`` NULL-poisons the projection (every bit 0)
while DuckDB's ``list_sum`` skips NULLs — so the identical-signature
contract holds only for well-formed vectors.  The driver fixtures satisfy
this by construction; an ingest of untrusted embeddings should validate
``size(embedding) = DIM AND NOT exists(embedding, x -> x IS NULL)`` before
the signature stage, in both engines, so malformed rows are EXCLUDED rather
than signed divergently.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

N_PLANES = 12
DIM = 64


def plane_coefs() -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1], md5-derived."""
    import hashlib

    out = []
    for p in range(N_PLANES):
        row = []
        for d in range(DIM):
            h = int(hashlib.md5(f"{p}_{d}".encode()).hexdigest()[:15], 16)
            row.append((h % 2001 - 1000) / 1000.0)
        out.append(row)
    return out


def hyperplane_signature() -> Column:
    """The 12-bit random-hyperplane sign signature of ``embedding`` as a
    Column — 12 in-row array folds over literal plane coefficients, zero
    shuffles.  operators.similarity buckets ANN candidates on it;
    operators.dedup slices it into band keys as the self-contained blocking
    key for embedding near-dup (no ground-truth column needed at scale)."""
    sig_expr = None
    for p, coefs in enumerate(plane_coefs()):
        arr = F.array(*[F.lit(c) for c in coefs])
        proj = F.aggregate(
            F.zip_with(F.col("embedding"), arr, lambda x, c: x.cast("double") * c),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bit = F.when(proj > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
        sig_expr = bit if sig_expr is None else sig_expr + bit
    return sig_expr


def sig_sql() -> str:
    """DuckDB twin of :func:`hyperplane_signature`, as a ``(SELECT vec_id,
    sig FROM embeddings)`` subquery string for oracle CTEs."""
    parts = []
    for p, coefs in enumerate(plane_coefs()):
        lit = "[" + ", ".join(repr(c) for c in coefs) + "]::DOUBLE[]"
        proj = (
            f"list_sum(list_transform(list_zip(embedding, {lit}),"
            f" q -> q[1]::DOUBLE * q[2]))"
        )
        parts.append(f"(CASE WHEN {proj} > 0 THEN (1::BIGINT << {p}) ELSE 0 END)")
    return "(SELECT vec_id, (" + " + ".join(parts) + ") AS sig FROM embeddings)"
