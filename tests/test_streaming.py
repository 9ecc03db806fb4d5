"""Structured Streaming forms must produce the same results as their
oracle-checked batch twins (replay-equivalence): the events parquet is
replayed as a bounded stream and the final state is compared."""

from __future__ import annotations

from pyspark.sql import functions as F

from edgy_spark.catalog import QUERIES, load_all_registrations
from edgy_spark.streaming.events import (
    read_events_stream,
    session_stream,
    tumbling_stream,
)
from tests.conftest import SF_SMOKE
import pytest

# r15 (driver verify budget): stateful-streaming equals-batch suites —
# multi-second Spark/store wall time per test; excluded from the default
# run by pyproject's `-m 'not slow'`, run explicitly with `pytest -m slow`.
pytestmark = pytest.mark.slow

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


def _run_append_stream(spark, stream_df, name: str):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"select * from {name}")


def test_stateful_threshold_stream_equals_batch(spark):
    from edgy_spark.streaming.stateful import threshold_crossing_stream

    stream = threshold_crossing_stream(read_events_stream(spark, SF_SMOKE))
    got = _run_append_stream(spark, stream, "threshold_test")
    want = QUERIES["stream_first_threshold_crossing"].fn(spark, SF_SMOKE)
    cols = ["user_id", "cross_ts", "cum_at_cross"]
    assert _rows(got, cols) == _rows(want, cols)


def _write_replay_chunks(spark, tmp_path, chunks):
    """Write each chunk DataFrame as one parquet file in a shared dir, named
    and mtime-ordered so maxFilesPerTrigger=1 replays them as sequential
    micro-batches.  Returns a bounded readStream over the dir."""
    import os

    stream_dir = str(tmp_path / "events_stream")
    os.makedirs(stream_dir)
    for i, chunk in enumerate(chunks):
        part = str(tmp_path / f"chunk{i}")
        chunk.coalesce(1).write.parquet(part)
        src = next(f for f in os.listdir(part) if f.endswith(".parquet"))
        dst = os.path.join(stream_dir, f"{i:03d}.parquet")
        os.rename(os.path.join(part, src), dst)
        os.utime(dst, (1700000000 + i * 100, 1700000000 + i * 100))
    schema = spark.read.parquet(stream_dir).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )


def _event_chunks_by_time(spark, n_early=1, n_total=3):
    """The sf-smoke events split into time-ordered chunks (1/5, 1/5, 3/5)."""
    from edgy_spark.sources import load

    ev = load(spark, SF_SMOKE, "events").orderBy("ts", "event_id")
    rows = ev.collect()
    cuts = [len(rows) // 5, (2 * len(rows)) // 5, len(rows)]
    chunks, start = [], 0
    for end in cuts:
        chunks.append(spark.createDataFrame(rows[start:end], ev.schema))
        start = end
    return chunks, rows, cuts


def test_stateful_state_survives_micro_batches(spark, tmp_path):
    """Split the events into three time-ordered files replayed one per
    micro-batch: most users cross mid-replay, so a correct result REQUIRES
    the cumulative state to carry across batches."""
    from edgy_spark.streaming.stateful import threshold_crossing_stream

    chunks, rows, cuts = _event_chunks_by_time(spark)
    stream = _write_replay_chunks(spark, tmp_path, chunks)
    got = _run_append_stream(
        spark, threshold_crossing_stream(stream), "threshold_multibatch_test"
    )
    # sanity: the replay really was incremental — some user crossed after
    # the first cut (cum at cut1 < THRESHOLD for at least one emitted user)
    want = QUERIES["stream_first_threshold_crossing"].fn(spark, SF_SMOKE)
    cols = ["user_id", "cross_ts", "cum_at_cross"]
    assert _rows(got, cols) == _rows(want, cols)
    first_cut_ts = rows[cuts[0] - 1]["ts"]
    late = [r for r in want.collect() if r["cross_ts"] > str(first_cut_ts)]
    assert late, "test split too late: every user crossed in micro-batch 1"


def test_stateful_ttl_long_horizon_equals_batch(spark, tmp_path):
    """Production TTL path, TTL far above the replay duration: identical to
    the batch twin — every crossed key emits exactly once, none retire
    mid-replay."""
    from edgy_spark.streaming.stateful import threshold_crossing_stream

    chunks, _, _ = _event_chunks_by_time(spark)
    stream = _write_replay_chunks(spark, tmp_path, chunks)
    got = _run_append_stream(
        spark,
        threshold_crossing_stream(stream, ttl_minutes=60),
        "threshold_ttl_long_test",
    )
    want = QUERIES["stream_first_threshold_crossing"].fn(spark, SF_SMOKE)
    cols = ["user_id", "cross_ts", "cum_at_cross"]
    got_rows = _rows(got, cols)
    assert got_rows == _rows(want, cols)
    assert len({r[0] for r in got_rows}) == len(got_rows), "duplicate emission"


def _run_append_stream_staged(spark, tmp_path, chunks, make_stream, pause_s=0.2):
    """Replay each chunk as a SEPARATE availableNow run over one shared
    checkpoint (state restores across runs), with a real wall-clock pause
    between runs.  A processing-time TTL shorter than the pause is then
    LOGICALLY guaranteed to have elapsed before the next batch processes —
    the timeout firing no longer depends on micro-batch scheduling latency
    (r05 ADVICE).  Returns all appended rows across runs.

    No-data micro-batches are disabled for the duration: with a
    milliseconds-scale timer armed, Spark otherwise schedules hundreds of
    empty timer-check batches per availableNow run (~2 min of pure
    overhead).  Timeouts then fire in the next DATA batch instead, which
    is exactly what the callers' scenarios rely on."""
    import os
    import time

    no_data_conf = "spark.sql.streaming.noDataMicroBatches.enabled"
    prev = spark.conf.get(no_data_conf, "true")
    spark.conf.set(no_data_conf, "false")
    try:
        return _run_staged_inner(spark, tmp_path, chunks, make_stream, pause_s)
    finally:
        spark.conf.set(no_data_conf, prev)


def _run_staged_inner(spark, tmp_path, chunks, make_stream, pause_s):
    import os
    import time

    stream_dir = str(tmp_path / "staged_stream")
    os.makedirs(stream_dir)
    ckpt = str(tmp_path / "staged_ckpt")
    out_dir = str(tmp_path / "staged_out")
    schema = chunks[0].schema
    for i, chunk in enumerate(chunks):
        part = str(tmp_path / f"staged_chunk{i}")
        chunk.coalesce(1).write.parquet(part)
        src = next(f for f in os.listdir(part) if f.endswith(".parquet"))
        os.rename(os.path.join(part, src), os.path.join(stream_dir, f"{i:03d}.parquet"))
        stream = spark.readStream.schema(schema).parquet(stream_dir)
        # file sink, not memory: the memory sink cannot recover a query
        # from an existing checkpoint, and state restore across runs is the
        # whole point here
        q = (
            make_stream(stream)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        if i < len(chunks) - 1:
            time.sleep(pause_s)
    return spark.read.parquet(out_dir).collect()


def test_stateful_ttl_retires_idle_keys(spark, tmp_path):
    """A tiny TTL must actually retire an idle key: user 1 accumulates 600
    in batch 1, is idle through batch 2 (timeout fires, state removed), and
    accumulates 600 more in batch 3 — with state retired the restarted sum
    never reaches 1000, so user 1 must NOT emit; with NoTimeout it must.

    Determinism (r05 ADVICE): batches run as separate availableNow runs
    over one shared checkpoint with a 0.2 s pause between runs, so the 3 ms
    TTL has LOGICALLY expired before batch 2 executes — user 1's
    retirement no longer rides on micro-batch scheduling latency.  And
    since timeouts fire for every expired idle key in ANY intervening
    batch (including empty ones), user 2 is designed to cross within a
    single batch (1100 in one event set) so its emission is state-
    independent; its batch-3 tail event (50) can't re-emit whether or not
    its own state survived."""
    import datetime as dt

    def ev(eid, uid, minute, value):
        return (eid, uid, dt.datetime(2024, 1, 1, 0, minute), float(value))

    schema = "event_id long, user_id long, ts timestamp, value double"
    chunks = [
        spark.createDataFrame([ev(1, 1, 0, 600.0)], schema),
        spark.createDataFrame([ev(2, 2, 10, 1100.0)], schema),
        spark.createDataFrame([ev(3, 1, 20, 600.0), ev(4, 2, 21, 50.0)], schema),
    ]
    from edgy_spark.streaming.stateful import threshold_crossing_stream

    got = _run_append_stream_staged(
        spark,
        tmp_path,
        chunks,
        lambda s: threshold_crossing_stream(s, ttl_minutes=0.00005),  # 3 ms
    )
    emitted = sorted(r["user_id"] for r in got)
    assert emitted == [2], f"expected only user 2 (exactly once), got {emitted}"

    nott_dir = tmp_path / "nott"
    nott_dir.mkdir()
    stream2 = _write_replay_chunks(spark, nott_dir, chunks)
    got2 = _run_append_stream(
        spark, threshold_crossing_stream(stream2), "threshold_nott_control_test"
    ).collect()
    assert sorted(r["user_id"] for r in got2) == [1, 2], "control: NoTimeout keeps state"


def _event_ttl_chunks(spark):
    """Four micro-batches engineered so an 8-minute EVENT-time TTL retires
    user 1 between its two bursts (watermark passes 0:08 while user 1 is
    idle) but never touches the continuously-active user 2:

      b1: u1@0:00 600, u2@0:01 100   (wm after: 0:01)
      b2: u2@0:10 950  -> u2 crosses (wm after: 0:10 > u1 horizon 0:08)
      b3: u2@0:15 50   -> u1 times out here (no data for it this batch)
      b4: u1@0:20 600 (fresh state, 600 < 1000 -> silent), u2@0:21 10
    """
    import datetime as dt

    def ev(eid, uid, minute, value):
        return (eid, uid, dt.datetime(2024, 1, 1, 0, minute), float(value))

    schema = "event_id long, user_id long, ts timestamp, value double"
    return [
        spark.createDataFrame([ev(1, 1, 0, 600.0), ev(2, 2, 1, 100.0)], schema),
        spark.createDataFrame([ev(3, 2, 10, 950.0)], schema),
        spark.createDataFrame([ev(4, 2, 15, 50.0)], schema),
        spark.createDataFrame([ev(5, 1, 20, 600.0), ev(6, 2, 21, 10.0)], schema),
    ]


def _run_append_stream_paced(spark, stream_df, name: str, interval: str):
    """Like _run_append_stream but with a processing-time trigger, so
    micro-batches are separated by real wall-clock gaps."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(processingTime=interval)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"select * from {name}")


def test_stateful_event_time_ttl_retires_at_watermark(spark, tmp_path):
    """EVENT-time TTL: user 1's state must retire when the WATERMARK passes
    last-event-ts + TTL, so its second burst restarts from zero and never
    emits; user 2 (active within the TTL) emits exactly once."""
    from edgy_spark.streaming.stateful import threshold_crossing_stream

    stream = _write_replay_chunks(spark, tmp_path, _event_ttl_chunks(spark))
    got = _run_append_stream(
        spark,
        threshold_crossing_stream(
            stream, ttl_minutes=8, event_time_ttl=True,
            watermark_delay="0 seconds",  # replay chunks are strictly time-ordered
        ),
        "threshold_evttl_test",
    ).collect()
    assert sorted(r["user_id"] for r in got) == [2]
    assert got[0]["cross_ts"] == "2024-01-01 00:10:00"


def test_stateful_event_time_ttl_is_replay_speed_invariant(spark, tmp_path):
    """The same backfill replayed fast (availableNow, back-to-back batches)
    and slow (processing-time trigger, ~1s wall-clock between batches) must
    retire the same keys and emit identical rows — the event-time horizon,
    not the wall clock, drives retirement.  (A processing-time TTL of under
    a second would emit user 1 in the fast run and drop it in the slow one.)
    """
    from edgy_spark.streaming.stateful import threshold_crossing_stream

    fast_dir = tmp_path / "fast"
    fast_dir.mkdir()
    fast = _run_append_stream(
        spark,
        threshold_crossing_stream(
            _write_replay_chunks(spark, fast_dir, _event_ttl_chunks(spark)),
            ttl_minutes=8,
            event_time_ttl=True,
            watermark_delay="0 seconds",  # strictly ordered replay
        ),
        "threshold_evttl_fast_test",
    )
    slow_dir = tmp_path / "slow"
    slow_dir.mkdir()
    slow = _run_append_stream_paced(
        spark,
        threshold_crossing_stream(
            _write_replay_chunks(spark, slow_dir, _event_ttl_chunks(spark)),
            ttl_minutes=8,
            event_time_ttl=True,
            watermark_delay="0 seconds",  # strictly ordered replay
        ),
        "threshold_evttl_slow_test",
        interval="1 second",
    )
    cols = ["user_id", "cross_ts", "cum_at_cross"]
    assert _rows(fast, cols) == _rows(slow, cols) == [(2, "2024-01-01 00:10:00", 1050.0)]


def test_exactly_once_parquet_sink_restart(spark, tmp_path):
    """Checkpointed foreachBatch sink: drain → restart with same checkpoint
    → byte-identical output (no duplicate batches, no new rows)."""
    from edgy_spark.streaming.events import read_events_stream
    from edgy_spark.streaming.sink import read_stream_output, write_stream_exactly_once

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src = read_events_stream(spark, SF_SMOKE).select(
        "event_id", "user_id", "event_type"
    )

    write_stream_exactly_once(src, out, ckpt)
    first = sorted(_rows(read_stream_output(spark, out), ["event_id", "user_id", "event_type"]))

    # restart against the same checkpoint: everything is committed, so the
    # second run must not rewrite or append anything
    write_stream_exactly_once(
        read_events_stream(spark, SF_SMOKE).select("event_id", "user_id", "event_type"),
        out,
        ckpt,
    )
    second = sorted(_rows(read_stream_output(spark, out), ["event_id", "user_id", "event_type"]))

    assert first == second
    # and the drained output equals the batch read of the same source
    from edgy_spark.sources import load

    batch = sorted(
        _rows(
            load(spark, SF_SMOKE, "events").select("event_id", "user_id", "event_type"),
            ["event_id", "user_id", "event_type"],
        )
    )
    assert first == batch


def test_stream_stream_join_equals_batch(spark):
    """Stream-stream attribution join (watermarked both sides) replays to
    exactly the batch join's pairs."""
    from edgy_spark.streaming.events import attribution_stream

    src = read_events_stream(spark, SF_SMOKE)
    stream = attribution_stream(
        src.filter("event_type = 'purchase'"), src.filter("event_type = 'click'")
    )
    got = _run_append_stream(spark, stream, "attrib_stream")
    want = QUERIES["stream_click_purchase_attribution"].fn(spark, SF_SMOKE)
    cols = ["purchase_id", "click_id", "user_id", "micros_between"]
    assert _rows(got, cols) == _rows(want, cols)


def test_sliding_stream_equals_batch(spark):
    from edgy_spark.streaming.events import sliding_stream

    stream = sliding_stream(read_events_stream(spark, SF_SMOKE))
    got = _run_stream_to_memory(spark, stream, "sliding_stream")
    want = QUERIES["stream_sliding_window_counts"].fn(spark, SF_SMOKE)
    cols = ["window_start", "n_events"]
    assert _rows(got, cols) == _rows(want, cols)


def test_dedup_stream_equals_batch(spark, tmp_path):
    """Replay the events with every 10th event re-delivered in a LATER
    micro-batch: dropDuplicatesWithinWatermark must restore exactly-once —
    final rows equal the batch twin's.  Duplicates land both inside the
    watermark (state hit) and behind it (late-drop); both paths dedupe."""
    from edgy_spark.sources import load
    from edgy_spark.streaming.events import (
        REDELIVER_MOD,
        REDELIVER_REM,
        dedup_stream,
    )

    ev = load(spark, SF_SMOKE, "events").orderBy("ts", "event_id")
    rows = ev.collect()
    cut = len(rows) // 2
    c1 = spark.createDataFrame(rows[:cut], ev.schema)
    dup1 = [r for r in rows[:cut] if r["event_id"] % REDELIVER_MOD == REDELIVER_REM]
    # batch 2 = second half PLUS redelivered copies of batch 1's subset
    c2 = spark.createDataFrame(rows[cut:] + dup1, ev.schema)
    dup2 = [r for r in rows[cut:] if r["event_id"] % REDELIVER_MOD == REDELIVER_REM]
    c3 = spark.createDataFrame(dup2, ev.schema)  # batch 3 = pure duplicates
    stream = _write_replay_chunks(spark, tmp_path, [c1, c2, c3])
    got = _run_append_stream(spark, dedup_stream(stream), "dedup_stream_test")
    want = QUERIES["stream_dedup_event_delivery"].fn(spark, SF_SMOKE)
    cols = ["event_id", "event_ts", "user_id", "event_type", "value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_stateful_threshold_under_rocksdb_state_store(spark, tmp_path):
    """The production state backend: the same stateful op, byte-identical
    results, with state in RocksDB (disk-bounded, changelog-checkpointed)
    instead of the executor-heap HDFS-backed default — the backend a
    100 TB deployment runs."""
    from edgy_spark.streaming.stateful import threshold_crossing_stream
    from edgy_spark.streaming.stateful_v2 import ROCKSDB_PROVIDER

    conf = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(conf, None)
    spark.conf.set(conf, ROCKSDB_PROVIDER)
    try:
        chunks, _, _ = _event_chunks_by_time(spark)
        stream = _write_replay_chunks(spark, tmp_path, chunks)
        got = _run_append_stream(
            spark, threshold_crossing_stream(stream), "threshold_rocksdb_test"
        )
        want = QUERIES["stream_first_threshold_crossing"].fn(spark, SF_SMOKE)
        cols = ["user_id", "cross_ts", "cum_at_cross"]
        assert _rows(got, cols) == _rows(want, cols)
    finally:
        if prev is None:
            spark.conf.unset(conf)
        else:
            spark.conf.set(conf, prev)


def _sentinel_flush(spark, ev, hours_ahead=10):
    """A future click AND purchase far past every attribution window:
    replayed as a LATER chunk they drag BOTH sides' watermarks across the
    whole fixture (the join's global watermark is the min of the two, so a
    click alone leaves late purchases unprovable) and force the outer
    join's null rows out.  user -1 matches nothing real, and the sentinel
    purchase itself sits inside its own still-open window, so neither
    sentinel can appear in the output."""
    import datetime

    from pyspark.sql import Row

    template = ev.orderBy("event_id").head().asDict()
    template.update(
        user_id=-1,
        ts=ev.agg({"ts": "max"}).head()[0] + datetime.timedelta(hours=hours_ahead),
    )
    rows = [
        Row(**{**template, "event_id": 10**9 + 2 * hours_ahead, "event_type": "click"}),
        Row(
            **{**template, "event_id": 10**9 + 2 * hours_ahead + 1, "event_type": "purchase"}
        ),
    ]
    return spark.createDataFrame(rows, ev.schema)


def test_outer_stream_join_equals_batch_anti(spark, tmp_path):
    """LEFT OUTER stream-stream join: after the watermark passes every
    purchase's attribution window (sentinel chunk), the emitted null rows
    are exactly the batch anti-join's unattributed purchases."""
    from edgy_spark.sources import load
    from edgy_spark.streaming.events import unattributed_stream

    ev = load(spark, SF_SMOKE, "events")
    got = _run_append_stream_staged(
        spark,
        tmp_path,
        # two flush chunks: the watermark advances at the END of the batch
        # that saw the sentinel, and state evicts (emitting the nulls) in
        # the NEXT batch — so forcing out rows inside the final window
        # takes one sentinel batch to move the watermark and one more to run
        [ev, _sentinel_flush(spark, ev), _sentinel_flush(spark, ev, hours_ahead=20)],
        lambda s: unattributed_stream(
            s.filter("event_type = 'purchase'"), s.filter("event_type = 'click'")
        ),
    )
    want = QUERIES["stream_unattributed_purchases"].fn(spark, SF_SMOKE)
    cols = ["purchase_id", "user_id", "purchase_ts"]
    assert sorted(tuple(r[c] for c in cols) for r in got) == _rows(want, cols)


def test_outer_stream_join_nulls_wait_for_watermark(spark, tmp_path):
    """Without the watermark-advancing chunk, NO null row may emit: a
    purchase is unmatched only once the click watermark proves no match
    can still arrive — never speculatively inside the same micro-batch."""
    from edgy_spark.sources import load
    from edgy_spark.streaming.events import unattributed_stream

    ev = load(spark, SF_SMOKE, "events")
    got = _run_append_stream_staged(
        spark,
        tmp_path,
        [ev],
        lambda s: unattributed_stream(
            s.filter("event_type = 'purchase'"), s.filter("event_type = 'click'")
        ),
    )
    assert len(got) == 0


def test_full_outer_stream_join_equals_batch(spark, tmp_path):
    """FULL OUTER stream-stream join: matches emit as they join, each
    side's orphans emit once the OTHER side's watermark proves no partner
    can arrive — after the sentinel flush chunks, the ledger equals the
    batch FULL OUTER join row-for-row.  (Sentinel rows ride user -1 and
    may themselves become provably-orphaned by the second flush; they are
    excluded — the fixture's ledger is the claim.)"""
    from edgy_spark.sources import load
    from edgy_spark.streaming.events import ledger_stream

    ev = load(spark, SF_SMOKE, "events")
    got = _run_append_stream_staged(
        spark,
        tmp_path,
        [ev, _sentinel_flush(spark, ev), _sentinel_flush(spark, ev, hours_ahead=20)],
        lambda s: ledger_stream(
            s.filter("event_type = 'purchase'"), s.filter("event_type = 'click'")
        ),
    )
    cols = ["purchase_id", "click_id", "user_id", "status"]

    def norm(r):  # null ids sort as -1 (they never collide with real ids)
        return tuple(-1 if r[c] is None else r[c] for c in cols)

    got_rows = sorted(norm(r) for r in got if r["user_id"] >= 0)
    want = QUERIES["stream_attribution_ledger"].fn(spark, SF_SMOKE)
    assert got_rows == sorted(norm(r) for r in want.collect())
    # all three statuses must actually occur, or the full-outer claim is
    # vacuous at this fixture scale
    statuses = {r[3] for r in got_rows}
    assert statuses == {"matched", "click_only", "purchase_only"}


def test_full_outer_orphans_wait_for_watermark(spark, tmp_path):
    """Without a watermark-advancing chunk, the full outer join may emit
    MATCHES but no orphan of either side — null-padded rows only become
    provable when the opposite watermark passes the window."""
    from edgy_spark.sources import load
    from edgy_spark.streaming.events import ledger_stream

    ev = load(spark, SF_SMOKE, "events")
    got = _run_append_stream_staged(
        spark,
        tmp_path,
        [ev],
        lambda s: ledger_stream(
            s.filter("event_type = 'purchase'"), s.filter("event_type = 'click'")
        ),
    )
    assert all(r["status"] == "matched" for r in got)


def test_stream_static_enrichment_equals_batch(spark):
    """Stream-static join mode: the purchase stream enriched against the
    batch-computed cohort dimension must equal the all-batch twin — no
    stream-stream state involved, the static side re-resolves per
    micro-batch."""
    from edgy_spark.operators.asof import user_cohort_dim
    from edgy_spark.sources import load
    from edgy_spark.streaming.events import enriched_stream

    dim = user_cohort_dim(load(spark, SF_SMOKE, "events"))
    purchases = read_events_stream(spark, SF_SMOKE).filter(
        F.col("event_type") == "purchase"
    )
    got = _run_stream_to_memory(
        spark, enriched_stream(purchases, dim), "enriched_test"
    )
    want = QUERIES["stream_enriched_cohort_revenue"].fn(spark, SF_SMOKE)
    cols = ["window_start", "cohort_week", "n_purchases", "revenue"]
    assert _rows(got, cols) == _rows(want, cols)


def test_url_dedup_stream_equals_batch(spark, tmp_path):
    """Crawl-frontier dedup (r11): replay the events in three time-ordered
    chunks — canonical-URL collisions land both inside one micro-batch and
    across batches, and first-wins keyed dedup must equal the batch twin's
    min-(ts, event_id) keeper for every canonical URL."""
    from edgy_spark.streaming.events import url_dedup_stream

    chunks, rows, cuts = _event_chunks_by_time(spark)
    stream = _write_replay_chunks(spark, tmp_path, chunks)
    got = _run_append_stream(
        spark, url_dedup_stream(stream, delay="365 days"), "url_dedup_test"
    )
    want = QUERIES["stream_url_dedup_first_seen"].fn(spark, SF_SMOKE)
    cols = ["canonical_url", "first_event_id", "first_ts"]
    assert _rows(got, cols) == _rows(want, cols)
    # sanity: some canonical URL's duplicates really did span a chunk cut
    from edgy_spark.operators.dedup import _canonical_parts, _raw_url
    from edgy_spark.sources import load

    canonical, _ = _canonical_parts(_raw_url("event_id"))
    ev = load(spark, SF_SMOKE, "events").withColumn("cu", canonical).collect()
    first_cut_ts = rows[cuts[0] - 1]["ts"]
    by_url = {}
    for r in ev:
        by_url.setdefault(r["cu"], []).append(r["ts"])
    spanning = [u for u, ts in by_url.items()
                if min(ts) <= first_cut_ts < max(ts)]
    assert spanning, "test split too early: no URL group spans the cut"
