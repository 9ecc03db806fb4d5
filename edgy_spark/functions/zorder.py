"""Z-order (Morton) key: bit-interleave two dimensions into one sort key.

Range-clustering a layout on ONE column (compact_table's sort_by) gives
min/max row-group skipping on that column only.  Interleaving the bits of
two columns and range-clustering on the interleaved key gives useful
locality on BOTH: any file covers a small rectangle of the (a, b) space,
so predicates on either dimension skip most files — the layout trick
behind Delta/Iceberg OPTIMIZE ZORDER, expressed here as pure Spark column
arithmetic (whole-stage codegen; no UDF).

Each input contributes its low 31 bits (inputs are masked, so values
>= 2^31 wrap rather than flipping the sign of the interleaved key: the
62-bit result always lands in the non-negative range of a signed BIGINT
and sorts correctly).  Negative or wider-than-31-bit dimensions must be
rank-encoded first — percent_rank * 2^31 — as real Z-order
implementations do; the fixtures' ids are small non-negative longs so
direct use is fine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# magic-mask spread, adjusted for 31-bit inputs (62-bit interleaved output)
_SPREAD_MASKS = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)

_INPUT_MASK = 0x7FFFFFFF  # low 31 bits: keeps bit 30 of dim b at position 61


def _spread_bits(c: Column) -> Column:
    """Spread the low 31 bits of ``c`` into the even bit positions of a
    64-bit long (classic Morton magic-mask sequence)."""
    x = c.cast("long").bitwiseAND(F.lit(_INPUT_MASK))
    for shift, mask in _SPREAD_MASKS:
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def zorder_key(a: Column | str, b: Column | str) -> Column:
    """62-bit Morton interleave of two 31-bit dimensions: bit i of ``a``
    lands at position 2i, bit i of ``b`` at 2i+1.  Always non-negative."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return _spread_bits(ca).bitwiseOR(F.shiftleft(_spread_bits(cb), 1))


def zorder_key_py(a: int, b: int) -> int:
    """Pure-Python reference for tests (bit-by-bit interleave)."""
    z = 0
    for i in range(31):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z
