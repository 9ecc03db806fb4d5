"""The threshold-crossing operator on Spark 4's ``transformWithState``
API — the successor to ``applyInPandasWithState`` (streaming/stateful.py)
and the form new stateful operators should take.

What the new API buys at 100 TB:

- **RocksDB-only state**: ``transformWithState`` requires the RocksDB
  state-store provider — state spills to local SSD instead of living in
  executor heap, so per-key state is bounded by disk, not memory (the
  HDFS-backed default caps state at executor heap and GC-thrashes past a
  few GB per executor).  Changelog checkpointing ships deltas, not full
  snapshots.
- **Typed state primitives**: named ``ValueState``/``ListState``/
  ``MapState`` per key instead of one opaque tuple — independent
  lifetimes, schema evolution per state variable.
- **First-class TTL**: ``getValueState(..., ttlDurationMs=...)`` retires
  idle state natively — the hand-rolled timeout dance in stateful.py's
  detector becomes a constructor argument.
- **Timers**: ``registerTimer``/``handleExpiredTimer`` decouple timeout
  logic from input processing (processing- or event-time).

Semantics here are identical to ``threshold_crossing_stream``: one output
row per user at the first event where the cumulative ``value`` reaches
THRESHOLD, integer-cents exact.  tests/test_streaming_v2.py asserts
equality with the driver-verified batch twin under the RocksDB provider.

Container note: the transformWithState Python worker speaks a protobuf
protocol to the JVM state server, and this build environment ships no
``google.protobuf`` (installs are not permitted; the real dependency is
declared in pyproject's ``streaming-v2`` extra).  Since r08 the
integration test runs HERE anyway: ``tests/_vendor/google/protobuf`` is a
minimal pure-Python protobuf runtime (wire format written from the public
spec) that pyspark's generated ``StateMessage_pb2`` imports unmodified —
cross-validated byte-for-byte against the JVM's real protobuf parser in
``test_mini_protobuf_wire_format_matches_jvm``.  The protobuf-free
processor-logic twin (``test_threshold_processor_logic_equals_batch_twin``)
remains as defense in depth, and with a genuine protobuf installed the
vendor shim steps aside.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from edgy_spark.streaming.stateful import _OUT_SCHEMA, THRESHOLD

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


class ThresholdProcessor(StatefulProcessor):
    """Per-user running total with exactly-one emission at first crossing."""

    def __init__(self, ttl_ms: int | None = None):
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        # one typed value-state per user; TTL (when set) is declarative —
        # the store retires idle keys without any timer bookkeeping here
        self._state = handle.getValueState(
            "agg", "cum_cents long, crossed boolean", ttlDurationMs=self._ttl_ms
        )

    def handleInputRows(
        self, key: Tuple, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        cum, crossed = self._state.get() if self._state.exists() else (0, False)
        for pdf in rows:
            if pdf.empty:
                continue
            if crossed:
                cents = np.rint(pdf["value"].to_numpy() * 100).astype("int64")
                cum += int(cents.sum())
                continue
            pdf = pdf.sort_values(["ts", "event_id"])
            cents = np.rint(pdf["value"].to_numpy() * 100).astype("int64")
            running = cum + cents.cumsum()
            cum = int(running[-1]) if len(running) else cum
            hits = np.nonzero(running >= THRESHOLD * 100)[0]
            if len(hits):
                i = int(hits[0])
                crossed = True
                ts = pdf["ts"].iloc[i]
                yield pd.DataFrame(
                    {
                        "user_id": [int(key[0])],
                        "cross_ts": [ts.strftime("%Y-%m-%d %H:%M:%S")],
                        "cum_at_cross": [running[i] / 100.0],
                    }
                )
        self._state.update((cum, crossed))

    def close(self) -> None:
        pass


def threshold_crossing_stream_v2(
    events: DataFrame, ttl_minutes: float | None = None
) -> DataFrame:
    """transformWithStateInPandas form of the threshold detector.  The
    session MUST run the RocksDB state-store provider (ROCKSDB_PROVIDER) —
    the API rejects the default HDFS-backed store.

    ``timeMode`` follows the TTL: state TTL is only legal under
    processing-time mode (Spark rejects ``ttlDurationMs`` with timeMode
    'None'), so passing ``ttl_minutes`` switches the mode."""
    ttl_ms = None if ttl_minutes is None else int(ttl_minutes * 60_000)
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=ThresholdProcessor(ttl_ms),
        outputStructType=_OUT_SCHEMA,
        outputMode="Append",
        timeMode="None" if ttl_ms is None else "ProcessingTime",
    )
