"""transformWithState (Spark 4 arbitrary stateful API) under the RocksDB
state-store provider: the new-API threshold op must equal the
driver-verified batch twin, including across micro-batch boundaries.

Gated on protobuf: transformWithStateInPandas's driver↔state-server
protocol imports google.protobuf, which this container lacks (no pip
installs allowed).  The operator itself (streaming/stateful_v2.py) is the
real implementation; where protobuf exists the test runs unmodified —
same importorskip pattern as the PIL-gated multimodal decode."""

from __future__ import annotations

import pytest

pytest.importorskip(
    "google.protobuf",
    reason="transformWithState state-server protocol needs protobuf "
    "(absent from this container; applyInPandasWithState twin covers "
    "semantics in test_streaming.py)",
)

from edgy_spark.catalog import QUERIES, load_all_registrations
from tests.conftest import SF_SMOKE
from tests.test_streaming import (
    _event_chunks_by_time,
    _rows,
    _run_append_stream,
    _write_replay_chunks,
)

load_all_registrations()


@pytest.fixture()
def rocksdb_session(spark):
    conf = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(conf, None)
    from edgy_spark.streaming.stateful_v2 import ROCKSDB_PROVIDER

    spark.conf.set(conf, ROCKSDB_PROVIDER)
    yield spark
    if prev is None:
        spark.conf.unset(conf)
    else:
        spark.conf.set(conf, prev)


def test_transform_with_state_equals_batch(rocksdb_session, tmp_path):
    spark = rocksdb_session
    from edgy_spark.streaming.stateful_v2 import threshold_crossing_stream_v2

    chunks, rows, cuts = _event_chunks_by_time(spark)
    stream = _write_replay_chunks(spark, tmp_path, chunks)
    got = _run_append_stream(
        spark, threshold_crossing_stream_v2(stream), "tws_threshold_test"
    )
    want = QUERIES["stream_first_threshold_crossing"].fn(spark, SF_SMOKE)
    cols = ["user_id", "cross_ts", "cum_at_cross"]
    assert _rows(got, cols) == _rows(want, cols)
    # state really crossed micro-batches (someone crossed after chunk 1)
    first_cut_ts = rows[cuts[0] - 1]["ts"]
    late = [r for r in want.collect() if r["cross_ts"] > str(first_cut_ts)]
    assert late, "split too late: every user crossed in micro-batch 1"
