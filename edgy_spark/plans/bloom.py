"""Bloom-filter join pruning — the shuffle-avoidance lever for selective
joins at 100 TB.

The reference never joins (single-process STM point reads,
/root/reference/src/Edgy.hs:12-46); this is engine-only scale toolkit,
sibling to plans/skew.py.

The pattern: a big probe side (orders at 100 TB) joins a filtered dimension
(customers in one segment).  A broadcast HASH join needs the dimension's
whole key set + payload on every executor; when that no longer fits, Spark
falls back to a full shuffle of BOTH sides.  A Bloom filter restores most of
the win: ``m`` BITS of state (fixed, tunable) summarize the build-side key
set, broadcast everywhere, and discard probe rows BEFORE the shuffle.  False
positives only cost wasted shuffle rows — the exact join afterwards removes
them — so the composition is semantically transparent, which is exactly what
the oracle checks (result == plain join, value-hash).

Spark's own runtime row-group/bloom pushdown (``spark.sql.optimizer.runtime.
bloomFilter.enabled``) does this opportunistically for shuffle joins; this
module is the EXPLICIT form, usable where the optimizer can't see the
selectivity (e.g. the build side is produced by engine code), and its bitset
is engine-portable (md5-derived ``h60`` hashing, functions/hashing.py) so a
DuckDB oracle can replicate the pruning decision bit-for-bit when a test
wants to pin the intermediate, not just the final join.

Layout: the filter is ONE row — ``map<long, long>`` from 64-bit word index
to word bits — built with one aggregation over the build keys (positions →
``bit_or`` partials combine map-side, so the shuffle carries at most
``m/64`` words per task).  Probing is an O(1) map lookup + bit test per
hash function, all JVM-side expressions inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from edgy_spark.functions.hashing import h60

__all__ = ["bloom_build", "bloom_prune"]

DEFAULT_BITS = 1 << 16  # 64 Kib = 8 KiB broadcast, ~1% fp at ~6.5k keys, k=3
N_HASHES = 3


def _positions(key: Column, n_bits: int) -> list[Column]:
    """k independent bit positions for one key (seeded, engine-portable)."""
    return [
        F.pmod(h60(F.concat(F.lit(f"bf{i}:"), key.cast("string"))), F.lit(n_bits))
        for i in range(N_HASHES)
    ]


def _check_bits(n_bits: int) -> None:
    if n_bits < 64 or n_bits & (n_bits - 1):
        raise ValueError(f"n_bits must be a power of two >= 64, got {n_bits}")


def bloom_build(build: DataFrame, key: str, n_bits: int = DEFAULT_BITS) -> DataFrame:
    """One-row DataFrame ``(bloom_bits: map<long,long>)`` summarizing the
    distinct values of ``build[key]``.

    Two aggregations: positions → per-word ``bit_or`` (map-side combine —
    the shuffle carries at most ``n_bits/64`` single-word rows per task),
    then the words fold into one map row.  An empty build side yields an
    EMPTY map, which ``bloom_prune`` treats as all-bits-clear.  NULL build
    keys are ignored, matching the equi-join the filter fronts (a NULL key
    never matches anything, so it must not set bits — and a null position
    would be an illegal map key); NULL probe keys already fail every bit
    test (their positions are NULL), so the prune drops them just as the
    exact join would.
    """
    _check_bits(n_bits)
    pos = build.filter(F.col(key).isNotNull()).select(
        F.explode(F.array(*_positions(F.col(key), n_bits))).alias("pos")
    )
    words = pos.groupBy(F.shiftright("pos", 6).alias("w")).agg(
        F.bit_or(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 64) AS INT))")
        ).alias("bits")
    )
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "bits"))).alias("bloom_bits")
    )


def bloom_prune(
    probe: DataFrame, key: str, bloom: DataFrame, n_bits: int = DEFAULT_BITS
) -> DataFrame:
    """Rows of ``probe`` whose ``key`` MIGHT be in the filter (no false
    negatives; false positives pass and must be removed by the exact join
    that follows).  ``bloom`` is the one-row output of :func:`bloom_build`
    with the same ``n_bits``; it rides a singleton broadcast, and each probe
    row tests k map-lookup bit probes inside codegen — no shuffle, no Python.
    """
    _check_bits(n_bits)
    pruned = probe.crossJoin(F.broadcast(bloom))
    tests = []
    for i, p in enumerate(_positions(F.col(key), n_bits)):
        c = f"_bf_pos{i}"
        pruned = pruned.withColumn(c, p)
        tests.append(
            F.expr(
                f"(coalesce(element_at(bloom_bits, shiftright({c}, 6)),"
                f" CAST(0 AS BIGINT))"
                f" & shiftleft(CAST(1 AS BIGINT), CAST(pmod({c}, 64) AS INT)))"
                " != 0"
            )
        )
    keep = tests[0]
    for t in tests[1:]:
        keep = keep & t
    drop = ["bloom_bits"] + [f"_bf_pos{i}" for i in range(N_HASHES)]
    return pruned.filter(keep).drop(*drop)
