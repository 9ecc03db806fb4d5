"""transformWithState (Spark 4 arbitrary stateful API) under the RocksDB
state-store provider: the new-API threshold op must equal the
driver-verified batch twin, including across micro-batch boundaries.

The state-server protocol imports google.protobuf, which this container
lacks (no pip, no network).  Since r08 that gate is closed by the vendored
mini protobuf runtime (tests/_vendor/google/protobuf/_minirt.py, wired up
in conftest.py): pyspark's generated StateMessage_pb2 imports unmodified
and the integration test runs for real — Python worker ↔ JVM state server
over the wire, RocksDB-backed.  With a real protobuf installed the vendor
shim steps aside (conftest prefers the genuine package).  The wire format
is additionally cross-validated against the JVM's real protobuf parser in
``test_mini_protobuf_wire_format_matches_jvm`` below."""

from __future__ import annotations

import pytest

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
    # the INTEGRATION path needs protobuf; conftest wires the vendored mini
    # runtime when no real one exists, so this importorskip only fires in
    # an environment where even the vendor path is unavailable
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState state-server protocol needs protobuf "
        "(real package or tests/_vendor mini runtime)",
    )
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


# ---------------------------------------------------------------------------
# Logic-level verification that does NOT need protobuf: drive the processor
# directly against a faked state handle, replaying the same micro-batch
# chunks the v1 test uses, and compare to the driver-verified batch twin.
# This executes every line of ThresholdProcessor in this container; only the
# Spark<->state-server protocol integration remains protobuf-gated above.
# ---------------------------------------------------------------------------


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self) -> bool:
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v) -> None:
        self._v = v


class _FakeHandle:
    """Stands in for StatefulProcessorHandle: named typed states per key."""

    def __init__(self):
        self.states: dict = {}
        self.ttls: dict = {}

    def getValueState(self, name, schema, ttlDurationMs=None):
        self.ttls[name] = ttlDurationMs
        return self.states.setdefault(name, _FakeValueState())


def test_threshold_processor_logic_equals_batch_twin(spark):
    """ThresholdProcessor (the transformWithState form) replayed chunk-by-
    chunk over per-user fake state must emit exactly the batch twin's rows —
    the same cross-micro-batch state-carry contract the gated integration
    test asserts, executed WITHOUT the protobuf state server."""
    import pandas as pd

    from edgy_spark.streaming.stateful_v2 import ThresholdProcessor

    chunks, _, _ = _event_chunks_by_time(spark)
    handles: dict[int, _FakeHandle] = {}
    out_frames: list[pd.DataFrame] = []
    for chunk in chunks:  # one micro-batch per chunk
        pdf = chunk.toPandas()
        for uid, group in pdf.groupby("user_id"):
            # Spark constructs/inits the processor per task; state persists
            # in the store across batches — the fake handle models that
            proc = ThresholdProcessor()
            proc.init(handles.setdefault(int(uid), _FakeHandle()))
            out_frames.extend(
                proc.handleInputRows((int(uid),), iter([group]), None)
            )
            proc.close()

    got = sorted(
        (int(r.user_id), r.cross_ts, float(r.cum_at_cross))
        for f in out_frames
        for r in f.itertuples()
    )
    want_df = QUERIES["stream_first_threshold_crossing"].fn(spark, SF_SMOKE)
    want = sorted(
        (int(r["user_id"]), r["cross_ts"], float(r["cum_at_cross"]))
        for r in want_df.collect()
    )
    assert got == want and len(got) > 0
    # the replay must have exercised the cross-batch state carry: at least
    # one EMITTED user's first chunk-with-events alone stayed under the
    # threshold, so their crossing required state carried from an earlier
    # micro-batch (a per-chunk-only check would pass even if state restore
    # regressed to always start from zero)
    import numpy as np

    from edgy_spark.streaming.stateful import THRESHOLD

    emitted = {uid for uid, _, _ in got}
    first_chunk_cents: dict[int, int] = {}
    for chunk in chunks:
        pdf = chunk.toPandas()
        for uid, group in pdf.groupby("user_id"):
            first_chunk_cents.setdefault(
                int(uid),
                int(np.rint(group["value"].to_numpy() * 100).astype("int64").sum()),
            )
    carried = [
        uid
        for uid in emitted
        if first_chunk_cents[uid] < THRESHOLD * 100
    ]
    assert carried, "every emitted user crossed inside one chunk: carry untested"


def test_mini_protobuf_wire_format_matches_jvm(spark):
    """Cross-engine validation of the vendored mini protobuf runtime: bytes
    it emits must parse in the JVM's REAL protobuf (the generated Java
    StateMessage classes Spark's state server uses), and JVM-serialized
    bytes must parse back identically — including an explicitly-set empty
    oneof message (Exists) and a negative int64."""
    pytest.importorskip("google.protobuf")
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    jsm = spark._sc._jvm.org.apache.spark.sql.execution.streaming.state.StateMessage

    # request shape the value-state client sends, incl. auto-vivified ttl
    cmd = sm.StateCallCommand()
    cmd.stateName = "myState"
    cmd.schema = '{"type":"struct"}'
    cmd.ttl.durationMs = 5000
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(getValueState=cmd)
    )
    data = req.SerializeToString()
    jreq = jsm.StateRequest.parseFrom(data)
    jcmd = jreq.getStatefulProcessorCall().getGetValueState()
    assert jcmd.getStateName() == "myState"
    assert jcmd.getTtl().getDurationMs() == 5000
    # canonical re-serialization by the JVM equals our bytes
    assert bytes(jreq.toByteArray()) == data

    # empty oneof member must survive (drives oneof dispatch server-side)
    lsc = sm.StateRequest(
        stateVariableRequest=sm.StateVariableRequest(
            listStateCall=sm.ListStateCall(stateName="s", exists=sm.Exists())
        )
    )
    jls = jsm.StateRequest.parseFrom(lsc.SerializeToString())
    assert jls.getStateVariableRequest().getListStateCall().hasExists()

    # JVM -> mini runtime, negative int64 + enum + repeated message
    jresp = (
        jsm.StateResponseWithLongTypeVal.newBuilder()
        .setStatusCode(7)
        .setErrorMessage("boom")
        .setValue(-123456789012345)
        .build()
    )
    back = sm.StateResponseWithLongTypeVal()
    back.ParseFromString(bytes(jresp.toByteArray()))
    assert (back.statusCode, back.errorMessage, back.value) == (
        7, "boom", -123456789012345
    )
