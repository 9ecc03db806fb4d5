"""Temporal join operators: as-of join, interval/range join, sessionization.

The reference has no join algorithms at all (SURVEY §2.3 — traversal is
pointer-chasing); these are the time-series operators a Spark engine needs
that Spark lacks as built-ins, implemented as compositions of existing
DataFrame ops (SURVEY's custom-operator rule (a) — no UDFs needed):

- as-of join: union-and-window ("piggyback") algorithm — O(n log n) with a
  single shuffle on the by-key, instead of the naive range-join explosion.
  This is the standard scalable formulation: tag both sides, sort within
  the by-key partition by (ts, side), and carry the last right-side row
  forward with last_value(ignore nulls).
- range join: equi-join on the by-key + interval predicate (Catalyst turns
  the equality into the shuffle key, the range into a post-filter).
- sessionization: gap-based session ids via lag + running sum — one window
  over (user, ts).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from edgy_spark.catalog import register
from edgy_spark.functions.exact import dec, to_dbl
from edgy_spark.plans.prefix import ntile_expr, ranked_prefix
from edgy_spark.sources import load


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_cols: dict[str, str],
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Generic as-of join: for each left row, the latest right row with
    ``right.on <= left.on`` within the same ``by`` group.

    Union-and-window: right rows sort before left rows at equal timestamps
    (side flag 0 < 1), so equal-ts rights are visible — matching DuckDB's
    ``ASOF JOIN ... ON l.ts >= r.ts`` semantics.

    All ``right_cols`` come from ONE matched right row (they ride a single
    struct through one shared window pass — adding columns adds no extra
    sort), and a matched row whose carried value is legitimately NULL
    carries that NULL, exactly like a relational as-of join (the struct is
    the row-presence marker, so NULL values cannot be skipped over for an
    older row's value).

    Determinism: right rows must be unique per (by, on) — pre-aggregate
    like the call sites do — OR pass ``tiebreak`` (right source columns,
    descending-last-wins) so duplicates resolve identically every run.
    """
    lcols = left.columns
    tiebreak = tiebreak or []
    marker = F.struct(
        *[F.col(src).alias(dst) for src, dst in right_cols.items()]
    ).alias("__asof_row")
    r = right.select(by, on, *tiebreak, marker).withColumn("_side", F.lit(0))
    l = left.withColumn("_side", F.lit(1)).withColumn(
        "__asof_row", F.lit(None).cast(dict(r.dtypes)["__asof_row"])
    )
    for t in tiebreak:
        if t not in l.columns:
            l = l.withColumn(t, F.lit(None).cast(dict(r.dtypes)[t]))
    passthrough = [c for c in lcols if c not in (by, on) and c not in tiebreak]
    unioned = l.select(
        by, on, "_side", *tiebreak, *passthrough, "__asof_row"
    ).unionByName(
        r.select(
            by, on, "_side", *tiebreak,
            *[
                F.lit(None).cast(dict(l.dtypes)[c]).alias(c)
                for c in passthrough
            ],
            "__asof_row",
        )
    )
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("_side").asc(), *[F.col(t).asc() for t in tiebreak])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = unioned.withColumn(
        "__asof_row", F.last("__asof_row", ignorenulls=True).over(w)
    )
    return (
        out.filter(F.col("_side") == 1)
        .select(
            *[c for c in lcols],
            *[
                F.col("__asof_row").getField(dst).alias(dst)
                for dst in right_cols.values()
            ],
        )
    )


@register(
    "asof_purchase_last_error",
    oracle="""
    SELECT p.event_id, p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS last_error_ts,
           e.event_id AS last_error_event_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (
      SELECT user_id, ts, MAX(event_id) AS event_id
      FROM events WHERE event_type = 'error' GROUP BY user_id, ts) e
      ON p.user_id = e.user_id AND p.ts >= e.ts
    ORDER BY p.event_id
    """,
    tags=("asof", "join", "temporal"),
    bench=True,
)
def asof_purchase_last_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase, the most recent error at-or-before it per user —
    the canonical as-of join, via the union-and-window algorithm."""
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    errors = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("err_id"))  # dedup equal-ts rights
    )
    # the matched row's ts rides the same window struct as its id — no
    # second pass, no join-back (extra carried columns are free)
    joined = asof_join(
        purchases,
        errors.withColumn("err_ts", F.col("ts")),
        on="ts",
        by="user_id",
        right_cols={"err_id": "last_error_event_id", "err_ts": "err_ts"},
    )
    out = joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.date_format("err_ts", "yyyy-MM-dd HH:mm:ss").alias("last_error_ts"),
        "last_error_event_id",
    )
    return out.orderBy("event_id")


@register(
    "range_join_signup_followups",
    oracle="""
    SELECT s.event_id AS signup_event_id, s.user_id,
           COUNT(f.event_id) AS n_followups_1h,
           CAST(ROUND(SUM(CAST(f.value AS DECIMAL(18,6))), 6) AS DOUBLE) AS followup_value
    FROM (SELECT * FROM events WHERE event_type = 'signup') s
    LEFT JOIN events f
      ON f.user_id = s.user_id
     AND f.ts > s.ts AND f.ts <= s.ts + INTERVAL 1 HOUR
    GROUP BY s.event_id, s.user_id
    ORDER BY signup_event_id
    """,
    tags=("range-join", "join", "temporal"),
)
def range_join_signup_followups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: activity within 1 hour after each signup, per user.
    Equi-key on user_id carries the shuffle; the time range is a post-join
    predicate (Catalyst's standard range-join shape)."""
    ev = load(spark, sf_dir, "events")
    s = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_event_id"),
        F.col("user_id"),
        F.col("ts").alias("s_ts"),
    )
    f = ev.select(
        F.col("user_id").alias("f_user"), F.col("ts").alias("f_ts"),
        F.col("event_id").alias("f_id"), F.col("value").alias("f_value"),
    )
    joined = s.join(
        f,
        (s.user_id == f.f_user)
        & (f.f_ts > s.s_ts)
        & (f.f_ts <= s.s_ts + F.expr("INTERVAL 1 HOUR")),
        "left",
    )
    return (
        joined.groupBy("signup_event_id", "user_id")
        .agg(
            F.count("f_id").alias("n_followups_1h"),
            to_dbl(F.sum(dec("f_value", 6, 18)), 6).alias("followup_value"),
        )
        .orderBy("signup_event_id")
    )


@register(
    "sessionize_events",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    sessions AS (
      SELECT user_id, ts, event_id,
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
      FROM flagged)
    SELECT user_id, session_no,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_last,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_no
    ORDER BY user_id, session_no
    """,
    tags=("session", "window", "temporal"),
    bench=True,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) via lag + running sum —
    the batch twin of Structured Streaming's session_window (see
    edgy_spark.streaming.events for the streaming form)."""
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            # microsecond-exact gap, matching the oracle's INTERVAL compare
            | (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)) > 1_800_000_000),
            1,
        ).otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_no",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        sessions.groupBy("user_id", "session_no")
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_last"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id", "session_no")
    )


# -- funnel analysis --------------------------------------------------------
FUNNEL_GAP_DAYS = 7


@register(
    "events_funnel_conversion",
    oracle=f"""
    WITH v AS (
      SELECT user_id, MIN(ts) AS view_ts
      FROM events WHERE event_type = 'view' GROUP BY user_id),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS click_ts
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click'
        AND e.ts > v.view_ts
        AND e.ts <= v.view_ts + INTERVAL {FUNNEL_GAP_DAYS} DAY
      GROUP BY e.user_id),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS purchase_ts
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase'
        AND e.ts > c.click_ts
        AND e.ts <= c.click_ts + INTERVAL {FUNNEL_GAP_DAYS} DAY
      GROUP BY e.user_id)
    SELECT v.user_id,
           strftime(v.view_ts, '%Y-%m-%d %H:%M:%S') AS view_ts,
           strftime(c.click_ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
           strftime(p.purchase_ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           CAST(1 + (c.user_id IS NOT NULL)::INT + (p.user_id IS NOT NULL)::INT
                AS BIGINT) AS steps_completed
    FROM v LEFT JOIN c ON v.user_id = c.user_id
           LEFT JOIN p ON v.user_id = p.user_id
    ORDER BY v.user_id
    """,
    tags=("temporal", "funnel", "events"),
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence funnel: first view → earliest click within
    FUNNEL_GAP_DAYS of it → earliest purchase within FUNNEL_GAP_DAYS of the
    click, per user — the product-analytics step-matching query (each step
    must occur strictly AFTER the previous step, not merely co-occur).

    Scale: three conditional MIN aggregations and two left joins, every one
    keyed on user_id — co-partitioned, so AQE reuses one exchange layout;
    no window over the full event stream and event rows are filtered to
    their step's type before any shuffle.
    """
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    gap = F.expr(f"INTERVAL {FUNNEL_GAP_DAYS} DAYS")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("view_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter((F.col("ts") > F.col("view_ts")) & (F.col("ts") <= F.col("view_ts") + gap))
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter((F.col("ts") > F.col("click_ts")) & (F.col("ts") <= F.col("click_ts") + gap))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    steps = (
        F.lit(1)
        + F.col("click_ts").isNotNull().cast("int")
        + F.col("purchase_ts").isNotNull().cast("int")
    ).cast("long")
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            F.date_format("view_ts", "yyyy-MM-dd HH:mm:ss").alias("view_ts"),
            F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
            F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
            steps.alias("steps_completed"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# cogrouped-Arrow as-of join (the grouped custom-logic escape hatch)
# ---------------------------------------------------------------------------

@register(
    "cogroup_asof_purchase_last_click",
    oracle="""
    SELECT p.event_id, p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS last_click_ts,
           c.event_id AS last_click_event_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (
      SELECT user_id, ts, MAX(event_id) AS event_id
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts) c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    ORDER BY p.event_id
    """,
    tags=("asof", "cogroup", "pandas-udf"),
)
def cogroup_asof_purchase_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase, the most recent click at-or-before it per user —
    the SAME declarative contract as ``asof_purchase_last_error``, executed
    through Spark's remaining grouped-UDF surface: ``cogroup(...)
    .applyInPandas`` with a per-user ``pd.merge_asof``.

    This is the escape hatch for per-group logic the built-in composition
    can't express (custom matching rules, model scoring over aligned
    pairs); for a plain as-of the union-and-window form above is the
    skew-safe default — here each user's rows must fit one Arrow group.
    Scale: ONE shuffle of each side on the by-key, Arrow-batched transfer,
    O(n+m) merge per group after the in-group sort; no driver collection.
    Determinism: equal-ts clicks pre-aggregate to MAX(event_id), matching
    the oracle's tie-break exactly.
    """
    import pandas as pd

    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").cast("long").alias("user_id"),
        "ts",
        F.col("event_id").cast("long").alias("event_id"),
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .groupBy(F.col("user_id").cast("long").alias("user_id"), "ts")
        .agg(F.max("event_id").cast("long").alias("click_id"))
    )

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "event_id": pd.Series(dtype="Int64"),
                "user_id": pd.Series(dtype="Int64"),
                "purchase_ts": pd.Series(dtype="object"),
                "last_click_ts": pd.Series(dtype="object"),
                "last_click_event_id": pd.Series(dtype="Int64"),
            }
        )
        if left.empty:  # right-only group: no purchases, no output rows
            return empty

        def shape(m: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame(
                {
                    "event_id": m["event_id"].astype("Int64"),
                    "user_id": m["user_id"].astype("Int64"),
                    "purchase_ts": m["ts"].dt.strftime("%Y-%m-%d %H:%M:%S"),
                    "last_click_ts": (
                        m["c_ts"].dt.strftime("%Y-%m-%d %H:%M:%S")
                        if "c_ts" in m
                        else pd.Series([None] * len(m), index=m.index)
                    ),
                    "last_click_event_id": (
                        m["click_id"] if "click_id" in m else pd.Series([None] * len(m), index=m.index)
                    ),
                }
            )
            for c in ("purchase_ts", "last_click_ts"):
                out[c] = out[c].where(out[c].notna(), None)
            out["last_click_event_id"] = out["last_click_event_id"].astype("Int64")
            return out

        # SQL semantics for null keys: NULL user_id / NULL ts never equals
        # or orders against anything, so those purchases keep their row with
        # null click columns (the oracle's LEFT ASOF does the same) instead
        # of crashing merge_asof ('merge keys contain null') or the int cast
        unmatched = left["user_id"].isna() | left["ts"].isna()
        pieces = []
        if unmatched.any():
            pieces.append(shape(left[unmatched]))
        matchable = left[~unmatched].sort_values("ts", kind="mergesort")
        if not matchable.empty:
            r = right[right["ts"].notna()].sort_values("ts", kind="mergesort")
            m = pd.merge_asof(
                matchable,
                r[["ts", "click_id"]].rename(columns={"ts": "c_ts"}),
                left_on="ts",
                right_on="c_ts",
                direction="backward",
                allow_exact_matches=True,
            )
            pieces.append(shape(m))
        return pd.concat(pieces, ignore_index=True) if pieces else empty

    joined = (
        p.groupby("user_id")
        .cogroup(c.groupby("user_id"))
        .applyInPandas(
            merge,
            schema=(
                "event_id long, user_id long, purchase_ts string, "
                "last_click_ts string, last_click_event_id long"
            ),
        )
    )
    return joined.orderBy("event_id")


# ---------------------------------------------------------------------------
# time-bucket gap-fill rollup (the hypertable downsample + LOCF read)
# ---------------------------------------------------------------------------

GAPFILL_USER_MOD = 10  # roll up every 10th user: output stays compare-sized


@register(
    "events_gapfill_rollup",
    oracle=f"""
    WITH ev AS (SELECT user_id, event_id, date_trunc('hour', ts) AS bucket
                FROM events WHERE user_id % {GAPFILL_USER_MOD} = 0),
    hourly AS (SELECT user_id, bucket, COUNT(*) AS n, MAX(event_id) AS max_id
               FROM ev GROUP BY 1, 2),
    span AS (SELECT user_id, MIN(bucket) AS lo, MAX(bucket) AS hi
             FROM hourly GROUP BY 1),
    grid AS (SELECT user_id,
                    unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
             FROM span)
    SELECT g.user_id,
           strftime(g.bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
           CAST(COALESCE(h.n, 0) AS BIGINT) AS n_events,
           CASE WHEN h.n IS NULL THEN 1 ELSE 0 END AS is_gap,
           CAST(last_value(h.max_id IGNORE NULLS) OVER (
                  PARTITION BY g.user_id ORDER BY g.bucket
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS last_seen_event_id
    FROM grid g LEFT JOIN hourly h USING (user_id, bucket)
    ORDER BY user_id, bucket
    """,
    tags=("events", "timeseries", "gapfill"),
)
def events_gapfill_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hypertable read pattern (TimescaleDB's ``time_bucket_gapfill`` +
    ``locf``): downsample each user's event stream to hourly buckets, emit
    a row for EVERY hour in the user's observed span — including silent
    ones — and carry the last observation forward across the gaps (here
    the latest ``event_id``; `is_gap` flags synthesized rows).  Gap-aware
    rollups are what dashboards, SLO monitors, and feature pipelines read:
    a missing hour must surface as zero, not vanish.

    Spark has no gapfill built-in; the composition is (1) one map-side-
    combinable hourly count, (2) the per-user dense hour grid from
    ``sequence(min, max, interval 1 hour)`` — bounded by span/bucket, so a
    year of retention is ≤8.8k rows per user regardless of event volume —
    (3) a LEFT join of grid to counts, (4) LOCF as ``last(ignorenulls)``
    over the user partition.  Everything shuffles on user_id(+bucket):
    three user-keyed exchanges, no driver loop, no UDF.  The first grid
    row always holds an event (the span starts at an observed bucket), so
    the carried value is never null.
    """
    ev = load(spark, sf_dir, "events").filter(
        F.col("user_id") % GAPFILL_USER_MOD == 0
    )
    hourly = (
        ev.groupBy("user_id", F.date_trunc("hour", "ts").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("event_id").alias("max_id"),
        )
    )
    grid = (
        hourly.groupBy("user_id")
        .agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
        .select(
            "user_id",
            F.explode(
                F.expr("sequence(lo, hi, interval 1 hour)")
            ).alias("bucket"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["user_id", "bucket"], "left")
        .select(
            "user_id",
            F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
            F.col("n").isNull().cast("int").alias("is_gap"),
            F.last("max_id", ignorenulls=True).over(w).alias(
                "last_seen_event_id"
            ),
        )
        .orderBy("user_id", "bucket")
    )


# ---------------------------------------------------------------------------
# rolling z-score anomaly detection (exact integer arithmetic)
# ---------------------------------------------------------------------------

ANOM_WINDOW = 20  # trailing history rows per user (current row excluded)
ANOM_MIN_N = 12   # minimum history before a row can be judged
ANOM_T2 = 9       # threshold on z^2 (|z| > 3 sigma)


@register(
    "events_anomaly_zscore",
    oracle=f"""
    WITH cents AS (
      SELECT event_id, user_id, ts, value,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
      FROM events),
    win AS (
      SELECT event_id, user_id, ts, value, v,
             CAST(COUNT(v) OVER w AS BIGINT) AS n,
             CAST(SUM(v) OVER w AS BIGINT) AS s,
             CAST(SUM(v * v) OVER w AS BIGINT) AS q
      FROM cents
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN {ANOM_WINDOW} PRECEDING AND 1 PRECEDING))
    SELECT event_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
           value, n AS n_prior,
           (v * n - s) * (v * n - s) AS dev_sq,
           n * q - s * s AS var_term
    FROM win
    WHERE n >= {ANOM_MIN_N}
      AND (v * n - s) * (v * n - s) > {ANOM_T2} * (n * q - s * s)
    ORDER BY event_id
    """,
    tags=("temporal", "anomaly", "window", "events"),
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection over the event stream: flag an
    event whose value deviates from its user's trailing-window mean by more
    than 3 sigma, judged ONLY against prior events (ROWS BETWEEN
    ANOM_WINDOW PRECEDING AND 1 PRECEDING) so the anomaly itself never
    contaminates the statistics it is judged by.

    Exactness: z^2 > T^2 is evaluated in integer cents without division or
    sqrt — with x the current value, s/q/n the window sum / sum-of-squares /
    count, z^2 = (x*n - s)^2 / (n*q - s^2), so the flag is
    (x*n - s)^2 > T^2 * (n*q - s^2).  All terms are BIGINT-exact (cents
    <= 49_102, n <= 20 keeps every product < 2^63), so the distributed
    result is bit-identical to the single-threaded oracle — no float
    variance anywhere.  A zero-variance history flags ANY deviation
    ((x*n-s)^2 > 0), the intended semantics after a constant run.

    Scale: one shuffle on user_id (the window partition key); the frame is
    O(1) rows per event regardless of corpus size.  No reference
    counterpart (north-star temporal-analytics scope).
    """
    return anomaly_zscore_flags(load(spark, sf_dir, "events")).orderBy(
        "event_id"
    )


def anomaly_zscore_flags(ev: DataFrame) -> DataFrame:
    """Core of :func:`events_anomaly_zscore`, reusable on any DataFrame with
    (event_id, user_id, ts, value) — see the registered query's docstring
    for the exact-integer algebra.  Translation invariance (adding a
    constant to every value changes nothing) is pinned in
    tests/test_properties.py."""
    v = dec("value", 2)  # value is 2-dp exact; *100 below is integral
    cents = ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        (v * 100).cast("long").alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-ANOM_WINDOW, -1)
    )
    stats = cents.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        "v",
        F.count("v").over(w).alias("n"),
        F.sum("v").over(w).alias("s"),
        F.sum(F.col("v") * F.col("v")).over(w).alias("q"),
    )
    dev = F.col("v") * F.col("n") - F.col("s")
    var_term = F.col("n") * F.col("q") - F.col("s") * F.col("s")
    return (
        stats.filter(
            (F.col("n") >= ANOM_MIN_N) & (dev * dev > F.lit(ANOM_T2) * var_term)
        )
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
            "value",
            F.col("n").alias("n_prior"),
            (dev * dev).alias("dev_sq"),
            var_term.alias("var_term"),
        )
    )


# ---------------------------------------------------------------------------
# weekly cohort retention (product-analytics cohort matrix)
# ---------------------------------------------------------------------------


def user_cohort_dim(ev: DataFrame) -> DataFrame:
    """Per-user signup-cohort week (Monday-start date of the FIRST event) —
    the ONE cohort definition shared by the retention matrix, the
    stream-static enrichment join, and its replay test (a drifting copy in
    any one of them would silently compare different cohortings)."""
    return ev.groupBy("user_id").agg(
        F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort_week")
    )


@register(
    "events_retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
      FROM events GROUP BY user_id),
    active AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS aweek
      FROM events),
    sizes AS (
      SELECT cohort_week, COUNT(*) AS cohort_size FROM firsts
      GROUP BY cohort_week),
    cells AS (
      SELECT f.cohort_week,
             date_diff('day', f.cohort_week, a.aweek) // 7 AS week_offset,
             COUNT(*) AS n_active
      FROM active a JOIN firsts f USING (user_id)
      GROUP BY 1, 2)
    SELECT strftime(c.cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST(week_offset AS BIGINT) AS week_offset,
           CAST(n_active AS BIGINT) AS n_active,
           CAST(cohort_size AS BIGINT) AS cohort_size,
           CAST(10000 * n_active // cohort_size AS BIGINT) AS retention_bp
    FROM cells c JOIN sizes s USING (cohort_week)
    ORDER BY cohort_week, week_offset
    """,
    tags=("temporal", "cohort", "events"),
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users are cohorted by the week of
    their FIRST event; each cell counts how many of a cohort's users were
    active N weeks later, with retention in exact basis points (10000 *
    active // cohort_size — floor division, no float ratios).  Week
    boundaries are Monday-start date_trunc in both engines, and offsets
    are day-difference floor-div-7 of two week-truncated dates, so every
    cell is integer-exact.

    Scale: two shuffles (per-user first-event aggregate, then the cohort
    cell groupBy) — the (user, week) distinct rides the first aggregation's
    partitioning.  The cohort dimension table (one row per week) joins
    broadcast.  This is the standard retention query a product-analytics
    warehouse runs daily at full event-history scale.
    """
    ev = load(spark, sf_dir, "events").select("user_id", "ts")
    firsts = user_cohort_dim(ev)
    active = ev.select(
        "user_id", F.to_date(F.date_trunc("week", "ts")).alias("aweek")
    ).distinct()
    sizes = firsts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    cells = (
        active.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            F.expr("datediff(aweek, cohort_week) div 7").alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return (
        cells.join(F.broadcast(sizes), "cohort_week")
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            F.col("week_offset").cast("long").alias("week_offset"),
            "n_active",
            "cohort_size",
            F.expr("(10000 * n_active) div cohort_size").alias("retention_bp"),
        )
        .orderBy("cohort_week", "week_offset")
    )


# ---------------------------------------------------------------------------
# event-type transition matrix (first-order Markov estimate)
# ---------------------------------------------------------------------------


@register(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT event_type AS from_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS to_type
      FROM events),
    cnt AS (
      SELECT from_type, to_type, COUNT(*) AS n
      FROM seq WHERE to_type IS NOT NULL
      GROUP BY from_type, to_type)
    SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
           CAST(1000000 * n //
                (CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT))
                AS BIGINT) AS prob_e6
    FROM cnt
    ORDER BY from_type, to_type
    """,
    tags=("temporal", "markov", "events"),
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    P(next event type | current event type), estimated from adjacent event
    pairs (lead over the same (ts, event_id) total order every temporal
    operator here uses).  Probabilities are e6 fixed-point floor divisions
    of exact counts — bit-identical across engines and partitionings.

    Scale: one shuffle on user_id for the lead window, one on the 25-cell
    transition key (map-side combinable); the row-normalizing window runs
    over a 5-row partition.  The user-journey estimation every product
    warehouse derives; also the text-bigram LM shape on a token stream.
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    cnt = seq.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("n"))
    row_total = F.sum("n").over(Window.partitionBy("from_type"))
    return (
        cnt.select(
            "from_type",
            "to_type",
            "n",
            F.expr("1000000 * n").alias("n_e6"),
            row_total.alias("row_n"),
        )
        .select(
            "from_type",
            "to_type",
            "n",
            F.expr("n_e6 div row_n").alias("prob_e6"),
        )
        .orderBy("from_type", "to_type")
    )


# ---------------------------------------------------------------------------
# RFM customer segmentation (recency / frequency / monetary quintiles)
# ---------------------------------------------------------------------------


@register(
    "orders_rfm_segments",
    oracle="""
    WITH anchor AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS maxd FROM orders),
    base AS (
      SELECT o_custkey AS custkey,
             date_diff('day', MAX(CAST(o_orderdate AS DATE)), anchor.maxd)
               AS r_days,
             COUNT(*) AS f_cnt,
             CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2)
                  AS DOUBLE) AS m_total
      FROM orders CROSS JOIN anchor GROUP BY o_custkey, anchor.maxd),
    scored AS (
      SELECT custkey, CAST(r_days AS BIGINT) AS r_days,
             CAST(f_cnt AS BIGINT) AS f_cnt, m_total,
             CAST(NTILE(5) OVER (ORDER BY r_days ASC,  custkey) AS BIGINT)
               AS r_score,
             CAST(NTILE(5) OVER (ORDER BY f_cnt DESC, custkey) AS BIGINT)
               AS f_score,
             CAST(NTILE(5) OVER (ORDER BY m_total DESC, custkey) AS BIGINT)
               AS m_score
      FROM base)
    SELECT custkey, r_days, f_cnt, m_total, r_score, f_score, m_score,
           r_score || '-' || f_score || '-' || m_score AS segment
    FROM scored
    ORDER BY custkey
    """,
    tags=("relational", "rfm", "window"),
)
def orders_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: days-since-last-order (vs the corpus's
    own anchor date), order count, and exact-decimal lifetime spend, each
    cut into quintiles by NTILE over a tie-broken total order (metric,
    custkey) — deterministic bucket boundaries on both engines, since
    NTILE is purely positional once the order is total.  1 is best on
    every axis (most recent / most frequent / highest spend).

    Scale: one groupBy(custkey) for the per-customer rollup; the anchor
    is a broadcast single row.  NTILE is positional, so each quintile is
    computed WITHOUT an unpartitioned window (r12 verdict task #1): the
    global position under each total order comes from the chunked
    parallel-prefix combinator (plans/prefix.py — metric-range chunk ids
    map-side, per-chunk counts, broadcast offsets, chunk-keyed in-chunk
    row_number; parallelism = PREFIX_CHUNKS), and the bucket is then the
    exact SQL-standard NTILE formula over (rank, n) — a map-side
    expression (plans/prefix.py:ntile_expr).  Monetary ranks order by the
    exact cents (injective into the m_total double up to 2^53), so the
    quintiles match the oracle's ORDER BY m_total bit-for-bit.
    """
    o = load(spark, sf_dir, "orders")
    anchor = o.agg(F.max(F.to_date("o_orderdate")).alias("maxd"))
    base = (
        o.crossJoin(F.broadcast(anchor))
        .groupBy(F.col("o_custkey").alias("custkey"), "maxd")
        .agg(
            F.max(F.to_date("o_orderdate")).alias("lastd"),
            F.count(F.lit(1)).alias("f_cnt"),
            F.sum(dec("o_totalprice", 2)).alias("m_dec"),
        )
        .select(
            "custkey",
            F.datediff("maxd", "lastd").cast("long").alias("r_days"),
            F.col("f_cnt"),
            to_dbl(F.col("m_dec"), 2).alias("m_total"),
            (F.col("m_dec") * 100).cast("long").alias("m_cents"),
        )
    )
    # The three ranks are INDEPENDENT of each other, so each derives
    # straight from the rollup and they assemble with two custkey joins —
    # never a chain.  A chained formulation (rank2 over rank1's output)
    # nests each level's 3 input references multiplicatively: 27 logical
    # copies of the rollup, a 382-HashAggregate static plan, and measured
    # 3-5x wall-time regression at sf0.01 even though AQE deduplicates
    # most exchanges at runtime (review r13; an explicit .persist() was
    # worse still — it defeats exchange reuse entirely).  This shape keeps
    # the rollup at 9 references in three shallow subtrees.
    r = ranked_prefix(
        base, "r_days", descending=False, tiebreak=["custkey"],
        rank_col="__r_rk", n_col="__n",
    )
    f = ranked_prefix(
        base.select("custkey", "f_cnt"), "f_cnt", descending=True,
        tiebreak=["custkey"], rank_col="__f_rk", n_col="__n2",
    )
    m = ranked_prefix(
        base.select("custkey", "m_cents"), "m_cents", descending=True,
        tiebreak=["custkey"], rank_col="__m_rk", n_col="__n3",
    )
    scored = (
        r.join(f.select("custkey", "__f_rk"), "custkey")
        .join(m.select("custkey", "__m_rk"), "custkey")
        .select(
            "custkey",
            "r_days",
            "f_cnt",
            "m_total",
            ntile_expr("__r_rk", "__n").alias("r_score"),
            ntile_expr("__f_rk", "__n").alias("f_score"),
            ntile_expr("__m_rk", "__n").alias("m_score"),
        )
    )
    return scored.select(
        "custkey",
        "r_days",
        "f_cnt",
        "m_total",
        "r_score",
        "f_score",
        "m_score",
        F.concat_ws("-", "r_score", "f_score", "m_score").alias("segment"),
    ).orderBy("custkey")


# ---------------------------------------------------------------------------
# SCD2 validity intervals (slowly-changing-dimension type 2 build)
# ---------------------------------------------------------------------------


@register(
    "events_scd2_intervals",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER w AS prev_type
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    changes AS (
      SELECT user_id, event_type, ts, event_id
      FROM seq WHERE prev_type IS NULL OR prev_type <> event_type),
    versions AS (
      SELECT user_id, event_type AS state, ts AS valid_from, event_id,
             LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to
      FROM changes)
    SELECT user_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY valid_from, event_id)
                AS BIGINT) AS version_no,
           state,
           strftime(valid_from, '%Y-%m-%d %H:%M:%S') AS valid_from,
           strftime(valid_to, '%Y-%m-%d %H:%M:%S') AS valid_to,
           CAST(valid_to IS NULL AS INT) AS is_current
    FROM versions
    ORDER BY user_id, version_no
    """,
    tags=("temporal", "scd2", "events"),
)
def events_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension build from an event stream: collapse
    each user's consecutive equal states (event_type here stands in for the
    tracked attribute), emit one row per state VERSION with
    [valid_from, valid_to) and an is_current flag (open interval = NULL
    valid_to) — the standard warehouse history table, built with two
    windows over one partitioning (change detection via lag, interval close
    via lead) instead of a self-join.

    Scale: ONE shuffle on user_id; both windows and the version numbering
    reuse its sort.  The change-row intermediate is a tiny fraction of the
    input on real attribute streams, and nothing here is quadratic in a
    user's history.
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    changes = seq.filter(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
    )
    versions = changes.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        "event_id",
        F.lead("ts").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        ).alias("valid_to"),
    )
    return versions.select(
        "user_id",
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy("valid_from", "event_id"))
        .cast("long")
        .alias("version_no"),
        "state",
        F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format("valid_to", "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
        F.col("valid_to").isNull().cast("int").alias("is_current"),
    ).orderBy("user_id", "version_no")


# ---------------------------------------------------------------------------
# sequential pattern mining: top event-type paths
# ---------------------------------------------------------------------------

PATH_LEN = 3
PATH_TOP_K = 20


@register(
    "events_top_paths",
    oracle=f"""
    WITH seq AS (
      SELECT event_type AS e0,
             LEAD(event_type, 1) OVER w AS e1,
             LEAD(event_type, 2) OVER w AS e2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    paths AS (
      SELECT e0 || '>' || e1 || '>' || e2 AS path, COUNT(*) AS n
      FROM seq WHERE e2 IS NOT NULL
      GROUP BY 1),
    tot AS (SELECT SUM(n) AS t FROM paths)
    SELECT path, CAST(n AS BIGINT) AS n,
           CAST(1000000 * n // t AS BIGINT) AS share_e6
    FROM paths CROSS JOIN tot
    ORDER BY n DESC, path LIMIT {PATH_TOP_K}
    """,
    tags=("temporal", "sequence-mining", "events"),
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential pattern mining: the top-PATH_TOP_K most frequent 3-step
    event-type paths across all user journeys (consecutive triples via two
    leads over the per-user order), with each path's share of all observed
    triples in e6 fixed point — the "common funnels" discovery query that
    precedes defining a funnel like events_funnel_conversion.

    Scale: one shuffle on user_id for the leads; the path space is at most
    |event_types|^3 (125 here), so the count aggregate combines map-side
    into a tiny table, the total is a broadcast singleton, and the ranking
    is TakeOrderedAndProject.
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("e0"),
        F.lead("event_type", 1).over(w).alias("e1"),
        F.lead("event_type", 2).over(w).alias("e2"),
    ).filter(F.col("e2").isNotNull())
    paths = seq.groupBy(
        F.concat_ws(">", "e0", "e1", "e2").alias("path")
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = paths.agg(F.sum("n").alias("t"))
    return (
        paths.crossJoin(F.broadcast(tot))
        .select("path", "n", F.expr("(1000000 * n) div t").alias("share_e6"))
        .orderBy(F.desc("n"), F.asc("path"))
        .limit(PATH_TOP_K)
    )


# ---------------------------------------------------------------------------
# CUSUM changepoint detection (exact integer arithmetic)
# ---------------------------------------------------------------------------

CUSUM_CHUNKS = 64
"""Ordered time-range chunks per event type for the parallel prefix."""


@register(
    "events_cusum_changepoint",
    oracle="""
    WITH cents AS (
      SELECT event_type, event_id, ts,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
      FROM events
      WHERE event_type IS NOT NULL AND ts IS NOT NULL),
    pre AS (
      SELECT event_type, event_id,
             CAST(ROW_NUMBER() OVER w AS HUGEINT) AS i,
             CAST(SUM(v) OVER (PARTITION BY event_type ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS HUGEINT) AS p,
             CAST(SUM(v) OVER (PARTITION BY event_type) AS HUGEINT) AS tot,
             CAST(COUNT(*) OVER (PARTITION BY event_type) AS HUGEINT) AS n
      FROM cents
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)),
    dev AS (
      SELECT event_type, event_id, i, n,
             n * p - i * tot AS d
      FROM pre),
    best AS (
      SELECT event_type, event_id, i, d, n FROM (
        SELECT event_type, event_id, i, d, n,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY abs(d) DESC, event_id) AS rk
        FROM dev)
      WHERE rk = 1)
    SELECT event_type,
           CAST(event_id AS BIGINT) AS change_event_id,
           CAST(i AS BIGINT) AS change_idx,
           CAST(d // n AS BIGINT) AS cusum_c
    FROM best ORDER BY event_type
    """,
    tags=("temporal", "changepoint", "window", "events"),
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection per event type: the event where the
    cumulative deviation from the series mean peaks — the classic
    mean-shift detector (Page 1954; the argmax form is the standard
    offline single-changepoint estimator).  A drift/regime change in a
    telemetry stream lands the peak at the shift boundary.

    Exactness: the CUSUM S_i = sum_{j<=i}(x_j - mean) is cross-multiplied
    by n to stay integral — d_i = n*prefix_i - i*total (cents), argmax on
    |d_i| with the smaller event id on ties, and the reported magnitude
    is d_i div n (floored, matching engines).  Accumulation runs in
    DECIMAL(38)/HUGEINT so n * prefix cannot overflow the 64-bit lane at
    any scale.

    Scale — parallel-prefix decomposition, never a per-type serial scan:
    event types are a tiny vocabulary, so a running-sum window partitioned
    on event_type alone would pull each type's ENTIRE history into one
    task.  Instead each series is cut into CUSUM_CHUNKS ordered time-range
    chunks (chunk id is a pure map-side function of ts, monotone in ts, so
    (chunk, ts, event_id) order == (ts, event_id) order):

      1. per-chunk sums/counts via a map-side-combinable groupBy
         (types × chunks rows — tiny);
      2. exclusive cumulative offsets per type over that tiny table
         (the only window keyed on event_type alone — dimension-sized
         input), broadcast back onto the events;
      3. in-chunk running prefix + row_number under a window keyed on
         (event_type, chunk) — parallelism = types × CUSUM_CHUNKS;
      4. per-chunk argmax of |d| (same key), then the global per-type
         argmax over the chunk winners (types × chunks rows).

    The chunk-winner reduction is exact: the global argmax row is its own
    chunk's max-|d|/min-event_id row, so it survives step 4's first cut.
    """
    # NULL keys are excluded EXPLICITLY on both sides: the chunk id is a
    # function of ts and the offset/argmax joins are equi-joins, so a NULL
    # ts/event_type row can never flow through them — and the engines'
    # window NULL-ordering defaults differ anyway (Spark NULLS FIRST,
    # DuckDB NULLS LAST).  A changepoint over unkeyed/untimed telemetry is
    # undefined; stating the filter keeps both dialects in lockstep
    # (review r11).
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull() & F.col("ts").isNotNull()
    )
    d38 = "decimal(38,0)"
    cents = ev.select(
        "event_type",
        "event_id",
        "ts",
        F.unix_micros("ts").alias("us"),
        (dec("value", 2, 18) * 100).cast(d38).alias("v"),
    )
    spans = cents.groupBy("event_type").agg(
        F.min("us").alias("lo"), F.max("us").alias("hi")
    )
    chunked = cents.join(F.broadcast(spans), "event_type").withColumn(
        "chunk",
        F.expr(
            f"CAST((us - lo) * {CUSUM_CHUNKS} DIV (hi - lo + 1) AS INT)"
        ),
    )
    per_chunk = chunked.groupBy("event_type", "chunk").agg(
        F.sum("v").alias("csum"),
        F.count(F.lit(1)).cast(d38).alias("ccnt"),
    )
    zero = F.lit(0).cast(d38)
    w_chunks = Window.partitionBy("event_type").orderBy("chunk")
    w_prior = w_chunks.rowsBetween(Window.unboundedPreceding, -1)
    w_type = Window.partitionBy("event_type")
    offsets = per_chunk.select(
        "event_type",
        "chunk",
        F.coalesce(F.sum("csum").over(w_prior), zero).alias("p_off"),
        F.coalesce(F.sum("ccnt").over(w_prior), zero).alias("i_off"),
        F.sum("csum").over(w_type).alias("tot"),
        F.sum("ccnt").over(w_type).alias("n"),
    )
    w_in = Window.partitionBy("event_type", "chunk").orderBy("ts", "event_id")
    w_run = w_in.rowsBetween(Window.unboundedPreceding, 0)
    pre = chunked.join(F.broadcast(offsets), ["event_type", "chunk"]).select(
        "event_type",
        "event_id",
        "chunk",
        (F.col("i_off") + F.row_number().over(w_in).cast(d38)).alias("i"),
        (F.col("p_off") + F.sum("v").over(w_run)).alias("p"),
        "tot",
        "n",
    )
    dev = pre.select(
        "event_type",
        "event_id",
        "chunk",
        "i",
        "n",
        (F.col("n") * F.col("p") - F.col("i") * F.col("tot")).alias("d"),
    )
    w_cbest = Window.partitionBy("event_type", "chunk").orderBy(
        F.abs(F.col("d")).desc(), F.asc("event_id")
    )
    winners = (
        dev.withColumn("rk", F.row_number().over(w_cbest))
        .filter(F.col("rk") == 1)
        .drop("rk", "chunk")
    )
    w_best = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("d")).desc(), F.asc("event_id")
    )
    return (
        winners.withColumn("rk", F.row_number().over(w_best))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("event_id").cast("long").alias("change_event_id"),
            F.col("i").cast("long").alias("change_idx"),
            F.expr("CAST(d div n AS BIGINT)").alias("cusum_c"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# seasonal baseline anomaly profile (r11) — exact integer arithmetic
# ---------------------------------------------------------------------------

@register(
    "events_seasonal_anomaly_profile",
    oracle="""
    WITH cents AS (
      SELECT event_type,
             CAST(epoch_us(ts) // 3600000000 % 168 AS BIGINT) AS how,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
      FROM events
      WHERE event_type IS NOT NULL AND ts IS NOT NULL),
    agg AS (
      SELECT event_type, how,
             COUNT(*) AS n,
             CAST(SUM(v) AS HUGEINT) AS s,
             CAST(SUM(v::HUGEINT * v) AS HUGEINT) AS s2
      FROM cents GROUP BY event_type, how)
    SELECT c.event_type, c.how,
           CAST(MAX(a.n) AS BIGINT) AS n_events,
           CAST(MAX(a.s // a.n) AS BIGINT) AS mean_cents,
           CAST(SUM(CASE WHEN (a.n * c.v::HUGEINT - a.s) * (a.n * c.v::HUGEINT - a.s)
                          > 9 * (a.n * a.s2 - a.s * a.s)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
    FROM cents c JOIN agg a USING (event_type, how)
    GROUP BY c.event_type, c.how
    ORDER BY c.event_type, c.how
    """,
    tags=("temporal", "anomaly", "seasonal", "events"),
)
def events_seasonal_anomaly_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal (hour-of-week) baseline anomaly profile — the calendar
    twin of the rolling z-score: each event is judged against ITS OWN
    (event_type, hour-of-week) cell's mean/variance, so a Friday-evening
    traffic spike is normal while the same value at 4am flags.  The
    z > 3 test is cross-multiplied into pure integers:

      (n*v - s)^2 > 9 * (n*s2 - s^2)   <=>   ((v - mean)/stddev)^2 > 9

    in DECIMAL(38)/HUGEINT, so the flags are bit-identical across
    engines (no sqrt, no division).  Hour-of-week is epoch-based
    (hours-since-epoch mod 168) — no timezone/calendar semantics to
    diverge on.

    Scale: the baseline table is dimension-sized (types x 168) from ONE
    map-side-combinable groupBy, broadcast back onto the facts; the
    final per-cell flag count combines map-side.  No window over fact
    rows, no skewed-key serial scan (contrast the pre-r11 CUSUM).
    """
    d38 = "decimal(38,0)"
    cents = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isNotNull() & F.col("ts").isNotNull())
        .select(
            "event_type",
            F.expr("unix_micros(ts) div 3600000000 % 168").alias("how"),
            (dec("value", 2, 18) * 100).cast("long").alias("v"),
        )
    )
    agg = cents.groupBy("event_type", "how").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v").cast(d38)).alias("s"),
        F.sum((F.col("v").cast(d38) * F.col("v"))).alias("s2"),
    )
    flag = F.expr(
        # v joins the DECIMAL(38) lane before the n* cross-multiply — the
        # CUSUM convention; long n*v wraps in Spark where the oracle's
        # HUGEINT raises (review r11c)
        "CASE WHEN (n * CAST(v AS DECIMAL(38,0)) - s) "
        "* (n * CAST(v AS DECIMAL(38,0)) - s) > 9 * (n * s2 - s * s) "
        "THEN 1 ELSE 0 END"
    )
    return (
        cents.join(F.broadcast(agg), ["event_type", "how"])
        .groupBy("event_type", "how")
        .agg(
            F.max("n").cast("long").alias("n_events"),
            F.max(F.expr("s div n")).cast("long").alias("mean_cents"),
            F.sum(flag).cast("long").alias("n_anomalies"),
        )
        .orderBy("event_type", "how")
    )
