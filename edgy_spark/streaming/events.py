"""Streaming operators over the ``events`` table.

Each operator exists in two forms with the SAME semantics:

- a batch form registered in the catalog (oracle-checked against DuckDB) —
  this is what the driver's correctness gate sees;
- a Structured Streaming form (``*_stream``) used by tests/test_streaming.py,
  which replays the parquet file as a stream and asserts the streaming
  result equals the batch result.

Scale: tumbling/sliding windows are map-side assignments + one shuffle on
(window, key); session windows shuffle on user.  Watermarks bound state so
a 100 TB/day stream holds only the open windows in memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from edgy_spark.catalog import register
from edgy_spark.functions.exact import dec, to_dbl
from edgy_spark.sources import load


@register(
    "stream_tumbling_hour_counts",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 6) AS DOUBLE) AS total_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    ORDER BY window_start, event_type
    """,
    tags=("streaming", "window", "tumbling"),
    bench=True,
)
def stream_tumbling_hour_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling-window counts per event type (batch form of
    ``tumbling_stream``)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            to_dbl(F.sum(dec("value", 6, 18)), 6).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


@register(
    "stream_sliding_window_counts",
    oracle="""
    WITH grid AS (
      SELECT unnest(generate_series(
        date_trunc('hour', (SELECT MIN(ts) FROM events)) - INTERVAL 1 HOUR,
        (SELECT MAX(ts) FROM events),
        INTERVAL 15 MINUTE)) AS window_start)
    SELECT strftime(g.window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(e.event_id) AS n_events
    FROM grid g JOIN events e
      ON e.ts >= g.window_start AND e.ts < g.window_start + INTERVAL 1 HOUR
    GROUP BY g.window_start
    ORDER BY window_start
    """,
    tags=("streaming", "window", "sliding"),
)
def stream_sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 15 min (each event lands in 4 windows).
    Spark assigns windows map-side via F.window(slide); the oracle builds
    the same grid explicitly.  Spark's epoch-aligned window starts coincide
    with the oracle's hour-aligned grid."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n_events",
        )
        .orderBy("window_start")
    )


@register(
    "stream_session_windows",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                     >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    sess AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM flagged)
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           COUNT(*) AS n_events
    FROM sess GROUP BY user_id, session_no
    ORDER BY user_id, session_start
    """,
    tags=("streaming", "window", "session"),
)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 30-min gap via F.session_window — Spark merges
    events closer than the gap; a new session starts when the gap is
    REACHED (>=), which the oracle mirrors."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


# ---------------------------------------------------------------------------
# Structured Streaming forms (exercised by tests/test_streaming.py)
# ---------------------------------------------------------------------------

def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay the events parquet as a bounded stream (1 file per trigger),
    with the SAME ts normalization as the batch loader
    (sources.tables.normalize_event_ts) so the replay-equivalence tests
    compare like with like under any fixture format."""
    from edgy_spark.sources.tables import ensure_utc_events_session, normalize_event_ts

    ensure_utc_events_session(spark)
    import os

    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    # the file-stream source wants a directory.  Two fixture layouts exist:
    # events.parquet as a single FILE (stream the sf dir with a glob on the
    # leaf name) or as a Spark-written DIRECTORY of part files (stream that
    # directory itself — the glob matches LEAF names, so filtering the sf
    # dir for 'events.parquet' would silently match nothing and produce an
    # empty stream while the batch twin reads fine).
    reader = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
    if os.path.isdir(path):
        stream = reader.parquet(path)
    else:
        stream = reader.option("pathGlobFilter", "events.parquet").parquet(sf_dir)
    return normalize_event_ts(stream)


def tumbling_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of stream_tumbling_hour_counts, with a watermark for
    late data (10 min) bounding window state."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            to_dbl(F.sum(dec("value", 6, 18)), 6).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_stream(events: DataFrame) -> DataFrame:
    """Streaming session windows (30-min gap) with watermark."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# stream-stream join: click → purchase attribution
# ---------------------------------------------------------------------------

ATTRIB_WINDOW_MIN = 30


@register(
    "stream_click_purchase_attribution",
    oracle=f"""
    SELECT p.event_id AS purchase_id,
           c.event_id AS click_id,
           p.user_id,
           epoch_us(p.ts) - epoch_us(c.ts) AS micros_between
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts <= p.ts
     AND c.ts >= p.ts - INTERVAL {ATTRIB_WINDOW_MIN} MINUTE
    ORDER BY purchase_id, click_id
    """,
    tags=("streaming", "join", "temporal"),
)
def stream_click_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution join (batch twin): every click by the same user in the
    30 minutes before a purchase.  The streaming form below is the
    stream-stream inner join with watermarks on BOTH sides — the time-range
    condition is what lets Structured Streaming expire buffered rows, so
    per-side state is bounded by (watermark + window) regardless of stream
    length: the property that makes this run forever on a 100 TB/day feed.
    """
    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    joined = p.join(
        c,
        (p.user_id == c.c_user)
        & (c.c_ts <= p.p_ts)
        & (c.c_ts >= p.p_ts - F.expr(f"INTERVAL {ATTRIB_WINDOW_MIN} MINUTES")),
    )
    return joined.select(
        "purchase_id",
        "click_id",
        "user_id",
        (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("micros_between"),
    ).orderBy("purchase_id", "click_id")


def attribution_stream(purchases: DataFrame, clicks: DataFrame) -> DataFrame:
    """Streaming twin: stream-stream inner join.  Both inputs are streams;
    watermarks (1h) plus the ts range condition bound each side's join
    state — Spark drops buffered clicks once the purchase-side watermark
    passes click.ts + 30min."""
    p = purchases.withWatermark("ts", "1 hour").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    c = clicks.withWatermark("ts", "1 hour").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    joined = p.join(
        c,
        (p.user_id == c.c_user)
        & (c.c_ts <= p.p_ts)
        & (c.c_ts >= p.p_ts - F.expr(f"INTERVAL {ATTRIB_WINDOW_MIN} MINUTES")),
    )
    return joined.select(
        "purchase_id",
        "click_id",
        "user_id",
        (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("micros_between"),
    )


def sliding_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of stream_sliding_window_counts (1h windows sliding
    15min, watermark 10min).  Each event maps to 4 windows map-side; state
    holds only windows newer than the watermark."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# exactly-once restore under at-least-once delivery (keyed stream dedup)
# ---------------------------------------------------------------------------

# deterministic duplicate injection: every event with id % 10 == 3 is
# "re-delivered" once, the at-least-once failure mode every real event bus
# (Kafka, Kinesis) exhibits on producer retry
REDELIVER_MOD = 10
REDELIVER_REM = 3


@register(
    "stream_dedup_event_delivery",
    oracle=f"""
    WITH delivered AS (
      SELECT * FROM events
      UNION ALL
      SELECT * FROM events WHERE event_id % {REDELIVER_MOD} = {REDELIVER_REM})
    SELECT DISTINCT event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS event_ts,
           user_id, event_type, value
    FROM delivered ORDER BY event_id
    """,
    tags=("streaming", "dedup", "exactly-once"),
)
def stream_dedup_event_delivery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of :func:`dedup_stream`: at-least-once delivery is
    simulated by re-delivering every 10th event, and keyed dedup restores
    exactly-once — one output row per event_id.

    The duplicates are bit-identical redeliveries, so a full-row DISTINCT
    equals a keyed first-wins dedup and both engines express it exactly."""
    ev = load(spark, sf_dir, "events")
    delivered = ev.unionAll(
        ev.filter(F.col("event_id") % REDELIVER_MOD == REDELIVER_REM)
    )
    return (
        delivered.select(
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("event_ts"),
            "user_id",
            "event_type",
            "value",
        )
        .distinct()
        .orderBy("event_id")
    )


def dedup_stream(events: DataFrame) -> DataFrame:
    """Streaming twin: ``dropDuplicatesWithinWatermark`` on the event key.

    The state store holds only keys younger than the 1-hour watermark — the
    bounded-state form every 100 TB/day ingest needs (a plain
    ``dropDuplicates`` keeps EVERY key forever and OOMs an open stream).
    The trade is explicit: a duplicate arriving later than the delay window
    is no longer caught, so size the watermark to the event bus's maximum
    redelivery lag.  Duplicates older than the watermark are dropped as
    late rows — also correct here, since the first delivery already
    emitted."""
    return (
        events.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select(
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("event_ts"),
            "user_id",
            "event_type",
            "value",
        )
    )


@register(
    "stream_unattributed_purchases",
    oracle=f"""
    SELECT p.event_id AS purchase_id,
           p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts
    FROM events p
    WHERE p.event_type = 'purchase'
      AND NOT EXISTS (
        SELECT 1 FROM events c
        WHERE c.event_type = 'click'
          AND c.user_id = p.user_id
          AND c.ts <= p.ts
          AND c.ts >= p.ts - INTERVAL {ATTRIB_WINDOW_MIN} MINUTE)
    ORDER BY purchase_id
    """,
    tags=("streaming", "join", "outer", "temporal"),
)
def stream_unattributed_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases with NO qualifying click (batch twin: anti-join on the
    attribution condition).  The streaming form below is the LEFT OUTER
    stream-stream join — the shape the inner join can't express: "tell me
    what never matched" requires the engine to hold each purchase until
    the click-side watermark proves no match can still arrive, then emit
    the null row exactly once.  State stays bounded by watermark + window,
    so the unmatched-detector runs forever on an unbounded feed.
    """
    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    anti = p.join(
        c,
        (p.user_id == c.c_user)
        & (c.c_ts <= p.p_ts)
        & (c.c_ts >= p.p_ts - F.expr(f"INTERVAL {ATTRIB_WINDOW_MIN} MINUTES")),
        "left_anti",
    )
    return anti.select(
        "purchase_id",
        "user_id",
        F.date_format("p_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
    ).orderBy("purchase_id")


def unattributed_stream(purchases: DataFrame, clicks: DataFrame) -> DataFrame:
    """Streaming twin: LEFT OUTER stream-stream join, watermarks on both
    sides.  A purchase row buffers until the click watermark passes its
    attribution window; if nothing matched by then, Spark emits it once
    with null click columns — the filter keeps exactly those.  The
    equality with the batch anti-join (and that nulls CANNOT emit before
    the watermark advances past the window) is pinned by
    tests/test_streaming.py."""
    p = purchases.withWatermark("ts", "1 hour").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    c = clicks.withWatermark("ts", "1 hour").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    joined = p.join(
        c,
        (p.user_id == c.c_user)
        & (c.c_ts <= p.p_ts)
        & (c.c_ts >= p.p_ts - F.expr(f"INTERVAL {ATTRIB_WINDOW_MIN} MINUTES")),
        "leftOuter",
    )
    return joined.filter(F.col("click_id").isNull()).select(
        "purchase_id",
        "user_id",
        F.date_format("p_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
    )


@register(
    "stream_attribution_ledger",
    oracle=f"""
    SELECT p.event_id AS purchase_id,
           c.event_id AS click_id,
           COALESCE(p.user_id, c.user_id) AS user_id,
           CASE WHEN p.event_id IS NULL THEN 'click_only'
                WHEN c.event_id IS NULL THEN 'purchase_only'
                ELSE 'matched' END AS status
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
    FULL OUTER JOIN
         (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
      ON c.user_id = p.user_id
         AND c.ts <= p.ts
         AND c.ts >= p.ts - INTERVAL {ATTRIB_WINDOW_MIN} MINUTE
    ORDER BY user_id, COALESCE(purchase_id, -1), COALESCE(click_id, -1)
    """,
    tags=("streaming", "join", "full-outer", "temporal"),
)
def stream_attribution_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete attribution ledger (batch twin: FULL OUTER join on the
    attribution condition): every matched click/purchase pair PLUS every
    click that never converted PLUS every purchase never attributed, each
    row labeled.  Completes the stream-stream join matrix — inner
    (stream_click_purchase_attribution), left outer
    (stream_unattributed_purchases), and full outer — reconciliation
    between two feeds where BOTH sides' orphans matter (the billing /
    clearing-house shape).

    The streaming form is :func:`ledger_stream`; replay equivalence and
    watermark-gated orphan emission are pinned in tests/test_streaming.py.
    """
    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    joined = p.join(
        c,
        (p.p_user == c.c_user)
        & (c.c_ts <= p.p_ts)
        & (c.c_ts >= p.p_ts - F.expr(f"INTERVAL {ATTRIB_WINDOW_MIN} MINUTES")),
        "full_outer",
    )
    return (
        joined.select(
            "purchase_id",
            "click_id",
            F.coalesce("p_user", "c_user").alias("user_id"),
            F.when(F.col("purchase_id").isNull(), F.lit("click_only"))
            .when(F.col("click_id").isNull(), F.lit("purchase_only"))
            .otherwise(F.lit("matched"))
            .alias("status"),
        )
        .orderBy(
            "user_id",
            F.coalesce("purchase_id", F.lit(-1)),
            F.coalesce("click_id", F.lit(-1)),
        )
    )


def ledger_stream(purchases: DataFrame, clicks: DataFrame) -> DataFrame:
    """Streaming twin: FULL OUTER stream-stream join, watermarks on both
    sides.  Matches emit as they join; each side's orphans emit exactly
    once after the OTHER side's watermark proves no partner can still
    arrive.  State on both sides stays bounded by watermark + window, so
    the reconciler runs forever on unbounded feeds."""
    p = purchases.withWatermark("ts", "1 hour").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    c = clicks.withWatermark("ts", "1 hour").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    joined = p.join(
        c,
        (p.p_user == c.c_user)
        & (c.c_ts <= p.p_ts)
        & (c.c_ts >= p.p_ts - F.expr(f"INTERVAL {ATTRIB_WINDOW_MIN} MINUTES")),
        "fullOuter",
    )
    return joined.select(
        "purchase_id",
        "click_id",
        F.coalesce("p_user", "c_user").alias("user_id"),
        F.when(F.col("purchase_id").isNull(), F.lit("click_only"))
        .when(F.col("click_id").isNull(), F.lit("purchase_only"))
        .otherwise(F.lit("matched"))
        .alias("status"),
    )


# ---------------------------------------------------------------------------
# stream-static enrichment join: purchases enriched with a batch dimension
# ---------------------------------------------------------------------------


@register(
    "stream_enriched_cohort_revenue",
    oracle="""
    WITH dim AS (
      SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
      FROM events GROUP BY user_id)
    SELECT strftime(date_trunc('hour', e.ts), '%Y-%m-%d %H:%M:%S')
             AS window_start,
           strftime(d.cohort_week, '%Y-%m-%d') AS cohort_week,
           COUNT(*) AS n_purchases,
           CAST(ROUND(SUM(CAST(e.value AS DECIMAL(18,6))), 6) AS DOUBLE)
             AS revenue
    FROM events e JOIN dim d USING (user_id)
    WHERE e.event_type = 'purchase'
    GROUP BY 1, 2
    ORDER BY window_start, cohort_week
    """,
    tags=("streaming", "join", "stream-static", "enrichment"),
)
def stream_enriched_cohort_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the STREAM-STATIC enrichment join — the fourth join
    mode in the streaming matrix (alongside inner/left/full outer
    stream-stream): a purchase stream enriched against a batch-computed
    user dimension (signup-cohort week), rolled up to hourly revenue per
    cohort.  ``enriched_stream`` is the streaming form; the replay test
    pins stream == batch.

    Scale: the static dimension is loaded once per micro-batch and
    broadcast when small (user dims usually are after aggregation); the
    stream side only carries purchases.  No stream-stream state at all —
    this is the cheap join mode and the first one a production pipeline
    reaches for.
    """
    from edgy_spark.operators.asof import user_cohort_dim

    ev = load(spark, sf_dir, "events")
    dim = user_cohort_dim(ev)
    pur = ev.filter(F.col("event_type") == "purchase")
    return (
        pur.join(dim, "user_id")
        .groupBy(F.window("ts", "1 hour").alias("w"), "cohort_week")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            to_dbl(F.sum(dec("value", 6, 18)), 6).alias("revenue"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "n_purchases",
            "revenue",
        )
        .orderBy("window_start", "cohort_week")
    )


def enriched_stream(purchases: DataFrame, dim: DataFrame) -> DataFrame:
    """Streaming form: watermarked purchase stream inner-joined to the
    STATIC dimension (no state — Spark re-reads/broadcasts the batch side
    per micro-batch), then windowed per-cohort revenue."""
    return (
        purchases.withWatermark("ts", "10 minutes")
        .join(dim, "user_id")
        .groupBy(F.window("ts", "1 hour").alias("w"), "cohort_week")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            to_dbl(F.sum(dec("value", 6, 18)), 6).alias("revenue"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "n_purchases",
            "revenue",
        )
    )


LATE_GRACE_MIN = 15  # lateness tolerance: the watermark delay being audited


@register(
    "events_late_arrival_audit",
    oracle=f"""
    WITH o AS (
      SELECT event_type, ts,
             MAX(ts) OVER (PARTITION BY user_id ORDER BY event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) AS hwm
      FROM events)
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN ts < hwm - INTERVAL {LATE_GRACE_MIN} MINUTE
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_late
    FROM o GROUP BY event_type ORDER BY event_type
    """,
    tags=("streaming", "watermark", "observability"),
)
def events_late_arrival_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-sizing observability: per event type, how many events
    arrive more than LATE_GRACE_MIN behind their user's running
    high-water mark (arrival order = event_id)?  These are exactly the
    rows a per-user watermark of that delay would DROP — the audit a
    team runs on historical data before choosing ``withWatermark``'s
    delay, and re-runs to monitor drift.

    Scale: ONE per-user window (a single hash exchange on user_id — the
    stream's natural key), then a map-side-combinable rollup per type.
    Timestamp comparisons are exact integers in both engines.
    """
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    hwm = F.max("ts").over(w)
    late = F.col("ts") < F.col("hwm") - F.expr(
        f"INTERVAL {LATE_GRACE_MIN} MINUTE"
    )
    return (
        ev.select("event_type", "ts", hwm.alias("hwm"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(late, 1).otherwise(0)).cast("long").alias("n_late"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# streaming crawl-frontier dedup on canonical URLs (r11)
# ---------------------------------------------------------------------------

def _event_canonical_url():
    from edgy_spark.operators.dedup import _canonical_parts, _raw_url

    canonical, _host = _canonical_parts(_raw_url("event_id"))
    return canonical


def _url_dedup_oracle() -> str:
    from edgy_spark.operators.dedup import url_base_sql

    return url_base_sql("events", "event_id") + """
    , keyed AS (
      SELECT c.canonical_url, e.event_id,
             strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
             ROW_NUMBER() OVER (PARTITION BY c.canonical_url
                                ORDER BY e.ts, e.event_id) AS rk
      FROM curl c JOIN events e USING (event_id)
      WHERE e.event_id IS NOT NULL AND e.ts IS NOT NULL)
    SELECT canonical_url,
           CAST(event_id AS BIGINT) AS first_event_id,
           ts_s AS first_ts
    FROM keyed WHERE rk = 1
    ORDER BY canonical_url
    """


@register(
    "stream_url_dedup_first_seen",
    oracle=_url_dedup_oracle(),
    tags=("streaming", "dedup", "provenance", "url"),
)
def stream_url_dedup_first_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of :func:`url_dedup_stream` — the crawl-frontier
    hygiene step AS A STREAM OPERATION: each event carries a synthesized
    raw URL (dedup._raw_url over event_id: same canonical identity
    collides across tracking params / host case / fragments), and the
    first fetch per CANONICAL url wins.  First = min (ts, event_id), the
    arrival order a time-ordered replay delivers, so the streaming twin's
    replay-equivalence test (tests/test_streaming.py) pins batch ==
    stream on the same chunked corpus.

    Scale: canonicalization is in-row JVM string expressions; the only
    shuffle keys on canonical_url, and rank=1 compiles to the
    WindowGroupLimit pre-prune."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("canonical_url").orderBy("ts", "event_id")
    return (
        # NULL keys out up front: Spark sorts NULLS FIRST, DuckDB NULLS
        # LAST, and the oracle's USING join drops NULL ids anyway — the
        # seasonal/CUSUM convention (a fixture rotation must not flip the
        # hash on rows neither engine orders the same way).
        ev.filter(F.col("event_id").isNotNull() & F.col("ts").isNotNull())
        .withColumn("canonical_url", _event_canonical_url())
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "canonical_url",
            F.col("event_id").alias("first_event_id"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
        )
        .orderBy("canonical_url")
    )


def url_dedup_stream(events: DataFrame, delay: str = "1 hour") -> DataFrame:
    """Streaming twin: canonicalize in-row, then keyed first-wins dedup on
    the canonical URL within the watermark (``dropDuplicatesWithinWatermark``
    — bounded state, exactly like :func:`dedup_stream`).  ``delay`` is the
    re-crawl horizon: a fetch of the same canonical URL arriving more than
    ``delay`` of event time after the last one is re-emitted — the
    frontier semantics you want (content may have changed), and the knob
    that bounds state at 100 TB/day.  The replay-equivalence test pins
    batch == stream under a delay covering the whole fixture span (state
    must carry across micro-batches); the 1-hour default is the
    production-shaped bound."""
    return (
        events.withColumn("canonical_url", _event_canonical_url())
        .withWatermark("ts", delay)
        .dropDuplicatesWithinWatermark(["canonical_url"])
        .select(
            "canonical_url",
            F.col("event_id").alias("first_event_id"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
        )
    )
