"""Custom stateful streaming operator: per-user threshold-crossing detector.

The reference has no streaming at all (its whole surface is the 12 STM
operations, /root/reference/src/Edgy.hs:12-46); this is north-star scope —
the "custom stateful operator" row of SURVEY.md §2.3, realized the idiomatic
Structured-Streaming way: ``applyInPandasWithState`` with an explicit,
bounded per-key state schema.

Semantics: for each user, emit ONE row at the first event where the user's
cumulative ``value`` reaches THRESHOLD.  This is deliberately not expressible
as a windowed aggregation — it needs ordered per-key running state that
survives across micro-batches — which is exactly what the GroupState API is
for.

Both forms exist with the same semantics:

- ``stream_first_threshold_crossing`` — batch form (window cumsum), oracle-
  checked by the driver against DuckDB;
- ``threshold_crossing_stream`` — the stateful streaming form, asserted
  equal to the batch form in tests/test_streaming.py, including a 2-batch
  replay that proves state carries across micro-batches.

Exactness: cumulative sums are kept in integer cents (int64) in the stream
and DECIMAL(18,2) in batch/oracle — bit-identical, order-independent per
the engine's exact-decimal convention (functions/exact.py).

Scale: state is one (int64, bool) pair per user — ~17 bytes/key, so 1e9
users ≈ 17 GB spread across the cluster's state stores; the shuffle is the
same single exchange on user_id a session-window would need.  On an OPEN
key universe that still grows without bound, so the production path passes
``ttl_minutes`` to retire idle keys via ProcessingTimeTimeout: a key idle
longer than the TTL is removed from the store, and exactly-once emission
holds for any key whose event gaps stay inside the TTL horizon (a key
returning after retirement restarts its sum — the standard streaming-state
trade, sized so the TTL comfortably exceeds real inter-event gaps).
``ttl_minutes=None`` keeps NoTimeout, making batch equivalence exact for
bounded replays; tests/test_streaming.py proves both: long-TTL replay ==
batch, and a tiny TTL really retires an idle key's state.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from edgy_spark.catalog import register
from edgy_spark.functions.exact import dec, to_dbl
from edgy_spark.sources import load

THRESHOLD = 1000  # cumulative `value` units that trigger the crossing event


@register(
    "stream_first_threshold_crossing",
    oracle=f"""
    WITH c AS (
      SELECT user_id, ts,
             SUM(CAST(value AS DECIMAL(18,2))) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) AS cum
      FROM events)
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS cross_ts,
           CAST(ROUND(MIN(cum), 2) AS DOUBLE) AS cum_at_cross
    FROM c WHERE cum >= {THRESHOLD}
    GROUP BY user_id ORDER BY user_id
    """,
    tags=("streaming", "stateful"),
)
def stream_first_threshold_crossing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stateful operator: first event per user whose
    running total reaches THRESHOLD.

    ``value`` is strictly positive in this dataset, so the cumulative sum is
    strictly increasing per user and MIN(ts)/MIN(cum) over crossed rows are
    exactly the first crossing — no argmin needed, which keeps the reduction
    a plain (map-side-partial) MIN in both engines.
    """
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.select("user_id", "ts", F.sum(dec("value", 2, 18)).over(w).alias("cum"))
        .filter(F.col("cum") >= THRESHOLD)
        .groupBy("user_id")
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("cross_ts"),
            to_dbl(F.min("cum")).alias("cum_at_cross"),
        )
        .orderBy("user_id")
    )


_OUT_SCHEMA = "user_id long, cross_ts string, cum_at_cross double"
_STATE_SCHEMA = "cum_cents long, crossed boolean, max_ts_ms long"


def _make_detector(ttl_ms: int | None, event_time: bool = False):
    """Build the per-user GroupState function (runs inside an Arrow-batched
    worker).

    State = (cumulative value in integer cents, crossed flag).  Within a
    micro-batch events are sorted by (ts, event_id); across batches the
    replayed source delivers per-user time order (test harness guarantee —
    a production deployment would put a watermark+sort upstream or accept
    bounded disorder).

    With ``ttl_ms`` set and ``event_time=False``, every state write re-arms
    a processing-time timeout; a key idle past the TTL is handed back with
    ``hasTimedOut`` and its state removed — the state store holds only
    recently-active keys.

    With ``event_time=True`` the horizon is EVENT time: each write arms the
    timeout at ``max(event ts seen for this key) + ttl``, and retirement
    fires when the stream's WATERMARK passes that horizon — wall-clock
    speed is irrelevant, so a historical backfill replayed at any pace
    retires exactly the keys a live run would have retired (the
    deterministic-replay property processing-time TTL cannot give).
    """

    def _detect_crossings(
        key: Tuple,
        pdf_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        if ttl_ms is not None and state.hasTimedOut:
            # idle past TTL: retire the key entirely (no data to process —
            # Spark only times out keys with no rows in this batch)
            state.remove()
            return
        cum, crossed, last_ts_ms = (
            state.get if state.exists else (0, False, 0)
        )
        # Arrow delivers one KEY's batch data as MULTIPLE chunks (capped by
        # arrow.maxRecordsPerBatch) in arbitrary shuffle order; the (ts,
        # event_id) sort must span the WHOLE batch, so concatenate before
        # sorting — a per-chunk sort finds the wrong first crossing when a
        # later-ts chunk arrives first.  Per-key-per-batch volume is what
        # any grouped-map op must hold in worker memory anyway.
        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True)
            last_ts_ms = max(last_ts_ms, int(pdf["ts"].max().value // 1_000_000))
            if crossed:
                # already emitted: just fold the sum so a late restart
                # resumes with the true total
                cents = np.rint(pdf["value"].to_numpy() * 100).astype("int64")
                cum += int(cents.sum())
            else:
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
                            "user_id": [key[0]],
                            "cross_ts": [ts.strftime("%Y-%m-%d %H:%M:%S")],
                            "cum_at_cross": [running[i] / 100.0],
                        }
                    )
        state.update((cum, crossed, last_ts_ms))
        if ttl_ms is not None:
            if event_time:
                # Spark rejects a timeout at/below the current watermark, so
                # a key whose events lag the global watermark arms at wm+1 —
                # it retires on the next batch, the earliest legal horizon.
                # last_ts_ms is the ALL-TIME max event ts for this key
                # (persisted in state), so a batch of late out-of-order
                # events can only extend the horizon, never regress it
                # below one already armed.
                horizon = last_ts_ms + ttl_ms
                state.setTimeoutTimestamp(
                    max(horizon, state.getCurrentWatermarkMs() + 1)
                )
            else:
                state.setTimeoutDuration(ttl_ms)

    return _detect_crossings


def threshold_crossing_stream(
    events: DataFrame,
    ttl_minutes: float | None = None,
    event_time_ttl: bool = False,
    watermark_delay: str | None = None,
) -> DataFrame:
    """Stateful streaming form: one output row per user at the micro-batch
    where their running total first reaches THRESHOLD.

    ``ttl_minutes`` enables the production state-TTL path (see module
    docstring): idle keys retire after the TTL, bounding the state store on
    an open key universe.  ``None`` keeps state forever (exact batch
    equivalence on bounded replays).

    ``event_time_ttl=True`` switches the TTL clock from processing time to
    EVENT time: a watermark (``watermark_delay`` behind max event ts) is
    attached and a key retires when the watermark passes
    ``last event ts + ttl``.  Backfills and live runs then retire the same
    keys at the same event-time horizons regardless of replay speed —
    processing-time TTL is wall-clock-dependent, which is fine live but
    wrong for replaying historical data.

    ``watermark_delay`` is REQUIRED with event_time_ttl, and it is a data-
    loss dial, not a tuning nicety: the stateful operator DROPS input rows
    older than the watermark, so a delay shorter than the source's real
    out-of-orderness silently undercounts (choose '0 seconds' only for
    strictly ordered replays, as the tests do).
    """
    ttl_ms = None if ttl_minutes is None else int(ttl_minutes * 60_000)
    if ttl_minutes is not None and ttl_ms <= 0:
        raise ValueError(
            f"ttl_minutes={ttl_minutes} floors to {ttl_ms} ms; Spark requires "
            "a positive timeout (pass None to disable TTL)"
        )
    if event_time_ttl:
        if ttl_ms is None:
            raise ValueError("event_time_ttl requires ttl_minutes")
        if watermark_delay is None:
            raise ValueError(
                "event_time_ttl requires an explicit watermark_delay — rows "
                "older than the watermark are DROPPED, so this must reflect "
                "the source's real out-of-orderness"
            )
        events = events.withWatermark("ts", watermark_delay)
        timeout = GroupStateTimeout.EventTimeTimeout
    elif ttl_ms is None:
        timeout = GroupStateTimeout.NoTimeout
    else:
        timeout = GroupStateTimeout.ProcessingTimeTimeout
    return events.groupBy("user_id").applyInPandasWithState(
        _make_detector(ttl_ms, event_time=event_time_ttl),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
