"""Structured Streaming forms must produce the same results as their
oracle-checked batch twins (replay-equivalence): the events parquet is
replayed as a bounded stream and the final state is compared."""

from __future__ import annotations

from edgy_spark.catalog import QUERIES, load_all_registrations
from edgy_spark.streaming.events import (
    read_events_stream,
    session_stream,
    tumbling_stream,
)
from tests.conftest import SF_SMOKE

load_all_registrations()


def _run_stream_to_memory(spark, stream_df, name: str):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"select * from {name}")


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_tumbling_stream_equals_batch(spark):
    stream = tumbling_stream(read_events_stream(spark, SF_SMOKE))
    got = _run_stream_to_memory(spark, stream, "tumbling_test")
    want = QUERIES["stream_tumbling_hour_counts"].fn(spark, SF_SMOKE)
    cols = ["window_start", "event_type", "n_events", "total_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_session_stream_equals_batch(spark):
    stream = session_stream(read_events_stream(spark, SF_SMOKE))
    got = _run_stream_to_memory(spark, stream, "session_test")
    want = QUERIES["stream_session_windows"].fn(spark, SF_SMOKE)
    cols = ["user_id", "session_start", "n_events"]
    assert _rows(got, cols) == _rows(want, cols)
