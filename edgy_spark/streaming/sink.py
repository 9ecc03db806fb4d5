"""Streaming sinks: checkpointed, idempotent parquet output — the
operational half of a production stream (the queries are in
edgy_spark.streaming.events / .stateful).

Exactly-once story (the standard Structured Streaming recipe):
- the CHECKPOINT (write-ahead offset log + commit log) makes batch replay
  deterministic: after a crash the engine re-runs only uncommitted batches
  with exactly the same input offsets;
- the SINK must be idempotent per batch so a re-run batch overwrites what a
  half-finished attempt wrote instead of appending twice.  ``foreachBatch``
  writing each micro-batch to its own ``batch_id=N`` partition directory
  with ``mode("overwrite")`` gives that: replay rewrites the same directory.
  (Delta/Iceberg get the same effect with txn-log commits; plain parquet
  needs the directory convention.)

At 100 TB the same pattern holds per-trigger: the partition directory write
is executor-parallel, nothing passes through the driver, and downstream
batch readers see the output as an ordinary partitioned parquet table
(partition pruning on batch_id included).

No reference counterpart (cdsmith/edgy is interactive/transactional only;
its complete API is src/Edgy.hs:12-46); scope from BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from edgy_spark.storage import ConflictError


def write_stream_exactly_once(
    stream_df: DataFrame, out_dir: str, checkpoint_dir: str
) -> None:
    """Drain a bounded stream to parquet with exactly-once semantics.

    Runs with ``trigger(availableNow=True)`` (process everything pending,
    then stop).  Restarting with the same checkpoint after the stream is
    drained is a no-op: every batch is in the commit log, so no directory
    is rewritten and no rows duplicate.
    """

    def write_batch(df: DataFrame, batch_id: int) -> None:
        df.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")

    (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def read_stream_output(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read the sink's output back as one table (batch_id becomes an
    auto-discovered partition column; drop it for value comparisons)."""
    return spark.read.parquet(out_dir).drop("batch_id")


def stream_merge_into_store(
    store,
    node_type: str,
    on: str,
    stream_id: str,
    delete_where: str | None = None,
    latest_by: str | None = None,
    max_retries: int = 5,
):
    """``foreachBatch`` factory: MERGE each micro-batch into the store's
    node table — streaming upsert maintenance of a dimension (the CDC-sync
    job every lakehouse runs), composing Structured Streaming with
    :meth:`GraphStore.merge_nodes`.

    Exactly-once across restarts WITHOUT an idempotent sink assumption:
    each merge commit stamps ``(stream_id, batch_id)`` into the manifest's
    carried-forward ``stream_batches`` cursor map — the same Delta
    idempotent-writes txn (appId, version) design the bulk stream writer
    uses — so the replay of an already-applied batch after a crash sees
    ``cursor >= batch_id`` in the CURRENT manifest (the commit point
    itself) and skips.  This matters specifically for merges with a DELETE
    clause: re-applying a batch whose match was deleted would re-INSERT
    it; updates/inserts alone are content-idempotent.

    Duplicate keys inside one micro-batch: merge_nodes rejects them (two
    rows updating one target row is non-deterministic), and a CDC feed
    WILL coalesce multiple events for a key into one batch (availableNow
    groups files; a restart regroups batch boundaries — a batch split
    that worked once is not stable).  ``latest_by`` names the event-order
    column (e.g. the source timestamp): the batch is pre-aggregated
    keep-latest per key, deterministically (remaining columns break
    ties), BEFORE merging — the standard CDC-compaction step.  Without
    ``latest_by``, exact duplicate rows (at-least-once redelivery) are
    dropped and genuinely CONFLICTING rows still fail the whole query —
    deliberately, because silently picking a winner without an order
    column would corrupt the dimension.

    Concurrent writers: on ConflictError the batch re-snapshots and
    re-applies (re-checking the cursor) up to ``max_retries`` — the
    engine's optimistic-retry semantics at micro-batch granularity.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    def apply(batch_df, batch_id: int) -> None:
        if latest_by is not None:
            if latest_by not in batch_df.columns:
                raise ValueError(
                    f"latest_by column {latest_by!r} is not in the batch "
                    f"schema {batch_df.columns}"
                )
            tiebreak = [
                c for c in batch_df.columns if c not in (on, latest_by)
            ]
            w = Window.partitionBy(on).orderBy(
                F.desc(
                    F.struct(F.col(latest_by), *[F.col(c) for c in tiebreak])
                )
            )
            batch_df = (
                batch_df.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
        else:
            batch_df = batch_df.dropDuplicates()
        for _ in range(max_retries):
            base = store.snapshot()
            if base.manifest.get("stream_batches", {}).get(stream_id, -1) >= batch_id:
                return  # crash-replay of an applied batch: exactly-once skip
            try:
                store.merge_nodes(
                    node_type,
                    batch_df,
                    on=on,
                    delete_where=delete_where,
                    base=base,
                    stream_batch=(stream_id, batch_id),
                )
                return
            except ConflictError:
                continue  # another committer won the version: re-snapshot
        raise ConflictError(
            f"stream merge lost {max_retries} optimistic races for batch "
            f"{batch_id} — raise max_retries or serialize the writers"
        )

    return apply
