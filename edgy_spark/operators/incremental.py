"""Incremental aggregate maintenance over the commit-time change feed —
materialized rollups updated by DELTA-APPLY instead of rescan.

At 100 TB the difference between re-scanning a fact table to refresh a
rollup and applying O(changed rows) deltas is the whole game: a day's
changes are megabytes while the table is terabytes.  The engine's
commit-time capture (``Engine(capture_cdc="full")`` — Delta CDF's full
shape, with ``update_preimage`` rows) makes additive aggregates exactly
maintainable:

    insert            -> +row
    delete            -> -row
    update_preimage   -> -old row      (subtract the old contribution)
    update_postimage  -> +new row      (add the new one)

An update that moves a row across groups therefore decrements the old
group and increments the new one; one that changes no grouped/measured
column cancels to zero.  Groups whose maintained count reaches zero are
dropped, so the maintained rollup equals the from-scratch recompute
bit-for-bit (integer/decimal measures; float sums would drift by
re-association, the same reason the engine's money math is DECIMAL).

The reference has no analogue (no aggregates at all); this is the
Spark-native materialized-view-maintenance pattern built on the store's
own CDC, parity with Delta Live Tables' incremental computation model.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ADD = ("insert", "update_postimage")
_SUB = ("delete", "update_preimage")


def rollup_aggregate(rows: DataFrame, group_cols: Sequence[str],
                     measures: Sequence[str]) -> DataFrame:
    """The from-scratch twin: ``n`` rows and ``sum_<m>`` per group.  Sums
    coalesce NULL measures to 0 so the incremental path (where a NULL
    contributes 0 in either direction) matches exactly."""
    return rows.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.coalesce(F.sum(F.coalesce(F.col(m), F.lit(0))), F.lit(0)).alias(f"sum_{m}")
            for m in measures
        ],
    )


def cdc_deltas(changes: DataFrame, group_cols: Sequence[str],
               measures: Sequence[str]) -> DataFrame:
    """Fold a change-feed slice into per-group signed deltas.  One
    narrow-row shuffle over O(changed rows) — never touches the table."""
    sign = (
        F.when(F.col("_change").isin(*_ADD), F.lit(1))
        .when(F.col("_change").isin(*_SUB), F.lit(-1))
        .otherwise(F.lit(0))
    )
    return changes.groupBy(*group_cols).agg(
        F.coalesce(F.sum(sign), F.lit(0)).alias("_d_n"),
        *[
            F.coalesce(F.sum(sign * F.coalesce(F.col(m), F.lit(0))), F.lit(0)).alias(f"_d_{m}")
            for m in measures
        ],
    )


def apply_deltas(agg: DataFrame, deltas: DataFrame,
                 group_cols: Sequence[str],
                 measures: Sequence[str]) -> DataFrame:
    """Merge signed deltas into a maintained rollup (full-outer on the
    group key: new groups appear, emptied groups vanish)."""
    merged = agg.join(deltas, list(group_cols), "full_outer")
    out = merged.select(
        *group_cols,
        (F.coalesce(F.col("n"), F.lit(0)) + F.coalesce(F.col("_d_n"), F.lit(0))).alias("n"),
        *[
            (
                F.coalesce(F.col(f"sum_{m}"), F.lit(0))
                + F.coalesce(F.col(f"_d_{m}"), F.lit(0))
            ).alias(f"sum_{m}")
            for m in measures
        ],
    )
    return out.filter(F.col("n") > 0)


def maintain_rollup(store, key: str, agg: DataFrame,
                    group_cols: Sequence[str], measures: Sequence[str],
                    from_version: int, to_version: int | None = None,
                    ) -> tuple[DataFrame, int]:
    """Advance a maintained rollup of table ``key`` from ``from_version``
    to ``to_version`` (default CURRENT) by applying the captured changes.
    Returns ``(new_agg, version)`` — persist both (the version is the
    cursor for the next maintenance run).

    Requires FULL capture (``Engine(capture_cdc="full")``) whenever the
    range contains updates: without ``update_preimage`` rows the old
    contribution of an updated row cannot be subtracted, so this fails
    loudly rather than silently double-counting."""
    to_version = store.current_version() if to_version is None else to_version
    changes = store.table_changes(key, from_version, to_version)
    kinds = {
        r["_change"]: r["cnt"]
        for r in changes.groupBy("_change").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    if kinds.get("update_postimage", 0) != kinds.get("update_preimage", 0):
        raise ValueError(
            f"incremental maintenance of {key!r} over versions "
            f"({from_version}, {to_version}] needs update PREIMAGES "
            "(Engine(capture_cdc='full')): postimages alone cannot "
            "subtract an updated row's old contribution.  Recompute from "
            "scratch with rollup_aggregate, then maintain from here on."
        )
    deltas = cdc_deltas(changes, group_cols, measures)
    return apply_deltas(agg, deltas, group_cols, measures), to_version


def stream_maintain_rollup(spark, agg_dir: str, group_cols: Sequence[str],
                           measures: Sequence[str]):
    """A ``foreachBatch`` function that maintains a LIVE materialized
    rollup at ``agg_dir`` from the upsert change stream
    (``readStream.format("edgy").option("mode", "upsert")`` on a
    ``capture_cdc="full"`` store) — the streaming completion of
    :func:`maintain_rollup`.

    MUST be seeded first: :func:`seed_rollup` materializes the recompute
    of the table AT the version the stream starts from (upsert mode starts
    changes-only at CURRENT, so baseline-at-CURRENT + change deltas is
    exactly consistent).  Seeding is REQUIRED, not optional — an empty
    start would mean "changes since the stream began", where a group whose
    running count goes negative gets dropped by :func:`apply_deltas` and
    silently resurrects wrong later; the baseline makes negative counts
    impossible.

    Exactly-once across restarts without relying on an idempotent sink:
    each applied micro-batch writes a NEW immutable version directory
    ``v{batch_id}`` and swaps a pointer file (``_current``, os.replace —
    the same pointer-cache pattern as the store's CURRENT); a replayed
    batch after a crash-restart sees ``batch_id <= applied`` and skips, so
    deltas are never double-applied.  Readers load via
    :func:`read_maintained_rollup` (pointer -> one version dir) and always
    see a complete snapshot.
    """
    import json
    import os

    def _pointer() -> tuple[int, str]:
        try:
            with open(os.path.join(agg_dir, "_current")) as f:
                meta = json.load(f)
            return meta["batch_id"], meta["dir"]
        except FileNotFoundError:
            raise ValueError(
                f"no seeded rollup at {agg_dir!r}: call seed_rollup with "
                "the table recompute BEFORE starting the maintenance "
                "stream (an unseeded view would drop transiently-negative "
                "groups and resurrect them wrong)"
            ) from None

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        applied, cur = _pointer()
        if batch_id <= applied:
            return  # restart replay: already folded into the rollup
        agg = spark.read.parquet(os.path.join(agg_dir, cur))
        pre = batch_df.filter(F.col("_change") == "update_preimage").count()
        post = batch_df.filter(F.col("_change") == "update_postimage").count()
        if pre != post:
            raise ValueError(
                "stream rollup maintenance needs update preimages "
                "(Engine(capture_cdc='full'))"
            )
        new = apply_deltas(
            agg, cdc_deltas(batch_df, group_cols, measures),
            group_cols, measures,
        )
        vdir = f"v{batch_id}"
        new.write.mode("overwrite").parquet(os.path.join(agg_dir, vdir))
        import tempfile

        fd, tmp = tempfile.mkstemp(dir=agg_dir)
        with os.fdopen(fd, "w") as f:
            json.dump({"batch_id": batch_id, "dir": vdir}, f)
        os.replace(tmp, os.path.join(agg_dir, "_current"))

    return apply


def seed_rollup(rows: DataFrame, agg_dir: str, group_cols: Sequence[str],
                measures: Sequence[str]) -> None:
    """Materialize the baseline for :func:`stream_maintain_rollup`: the
    from-scratch rollup of ``rows`` (read the table at the version the
    stream will start from) written as version ``seed`` with the pointer
    at batch -1."""
    import json
    import os
    import tempfile

    os.makedirs(agg_dir, exist_ok=True)
    rollup_aggregate(rows, group_cols, measures).write.mode(
        "overwrite"
    ).parquet(os.path.join(agg_dir, "vseed"))
    fd, tmp = tempfile.mkstemp(dir=agg_dir)
    with os.fdopen(fd, "w") as f:
        json.dump({"batch_id": -1, "dir": "vseed"}, f)
    os.replace(tmp, os.path.join(agg_dir, "_current"))


def read_maintained_rollup(spark, agg_dir: str) -> DataFrame:
    """Load the current snapshot of a stream-maintained rollup."""
    import json
    import os

    with open(os.path.join(agg_dir, "_current")) as f:
        meta = json.load(f)
    return spark.read.parquet(os.path.join(agg_dir, meta["dir"]))
