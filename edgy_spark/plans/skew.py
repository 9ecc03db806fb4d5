"""Skew-handling primitives for 100 TB deployments.

The reference never shuffles (single-process STM, /root/reference/README.md:1)
so nothing here has a counterpart; this is the engine's scale toolkit.

Spark already covers most skew:

- map-side partial aggregation makes skewed ``groupBy`` keys cheap;
- AQE skew-join splitting handles skewed SORT-MERGE joins at runtime;
- broadcast joins sidestep skew entirely when one side is small.

The remaining hole is a shuffled join where the build side is too big to
broadcast AND one probe key dominates so heavily that a single task owns it
(AQE splits the partition, but every split still needs the same build rows).
``salted_join`` closes it the classic way: spread the hot probe keys over
``n_salts`` synthetic sub-keys and replicate ONLY the matching build rows to
each sub-key.  Replication is targeted by first profiling the probe side for
its heavy hitters, so the build side is not blindly exploded n-fold.

``skew_profile`` is the diagnostic used to decide any of this — it reports
per-key concentration from a sampled scan.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["skew_profile", "salted_join"]


def skew_profile(df: DataFrame, key: str | Sequence[str], top: int = 20) -> DataFrame:
    """Per-key concentration report: count, share of all rows, and the skew
    multiple vs a perfectly uniform key (share * n_distinct_keys).

    One aggregation pass; run it on a ``df.sample(...)`` for a quick look at
    a 100 TB table — heavy hitters survive any uniform sample.
    """
    keys = [key] if isinstance(key, str) else list(key)
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))
    totals = counts.agg(
        F.sum("n_rows").alias("total_rows"), F.count(F.lit(1)).alias("n_keys")
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            *keys,
            "n_rows",
            (F.col("n_rows") / F.col("total_rows")).alias("row_share"),
            (F.col("n_rows") * F.col("n_keys") / F.col("total_rows")).alias("skew_multiple"),
        )
        .orderBy(F.desc("n_rows"))
        .limit(top)
    )


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    n_salts: int = 16,
    hot_threshold_rows: int = 1_000_000,
    how: str = "inner",
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Inner/left join ``probe ⋈ build`` on ``key`` with hot probe keys
    salted across ``n_salts`` sub-partitions.

    Mechanics (three narrow steps, one extra small shuffle):

    1. profile: aggregate probe-side key counts, keep keys above
       ``hot_threshold_rows`` — by construction a tiny set (at most
       total_rows / threshold keys), safe to broadcast;
    2. salt: hot probe rows get ``salt = pmod(xxhash64(*salt_cols), n)``
       (default: all probe columns) — a pure function of the row, so the
       physical layout is bit-reproducible across retries and AQE replans
       (a random salt is result-equivalent but re-deals rows to different
       salts per run); cold rows get salt 0; build rows matching a hot key
       are replicated to all ``n_salts`` salts (explode of a literal range
       — only hot build rows replicate), cold build rows keep salt 0.

       The determinism trade, stated: BYTE-IDENTICAL hot probe rows hash
       to ONE salt, so if a hot key's rows are exact duplicates the salting
       cannot spread them.  Real fact tables carry a row discriminator
       (orderkey+linenumber, event_id, offset) — pass it as ``salt_cols``
       to guarantee spread; if your probe truly has millions of
       byte-identical rows, deduplicate-with-count first (cheaper than any
       join) or fall back to a random salt and give up layout
       reproducibility;
    3. join on (key, salt) — the hot key's probe rows now land in ``n``
       tasks, each holding one replica of the build rows for that key.

    Result equals ``probe.join(build, key, how)`` exactly (row multiplicity
    included); tests/test_skew.py asserts it.  Only ``inner`` and ``left``
    are offered — for right/full the roles should be flipped by the caller
    so salting stays on the probe side.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    scratch = {"__salt", "__salts", "__hot"}
    clash = scratch & (set(probe.columns) | set(build.columns))
    if clash:
        # never silently clobber-and-drop caller data (or mis-treat a
        # pre-existing __hot as the hot-key marker)
        raise ValueError(f"salted_join scratch column collision: {sorted(clash)}")

    hot = (
        probe.groupBy(key)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= hot_threshold_rows)
        .select(key, F.lit(True).alias("__hot"))
    )

    p = (
        probe.join(F.broadcast(hot), key, "left")
        .withColumn(
            "__salt",
            F.when(
                F.col("__hot").isNotNull(),
                F.pmod(
                    F.xxhash64(*[F.col(c) for c in (salt_cols or probe.columns)]),
                    F.lit(n_salts),
                ).cast("int"),
            ).otherwise(F.lit(0)),
        )
        .drop("__hot")
    )
    b = (
        build.join(F.broadcast(hot), key, "left")
        .withColumn(
            "__salts",
            F.when(
                F.col("__hot").isNotNull(),
                F.sequence(F.lit(0), F.lit(n_salts - 1)),
            ).otherwise(F.array(F.lit(0))),
        )
        .drop("__hot")
        .withColumn("__salt", F.explode(F.col("__salts").cast("array<int>")))
        .drop("__salts")
    )
    joined = p.join(b, [key, "__salt"], how)
    return joined.drop("__salt")
