"""Chunked parallel-prefix: global rank / running sum WITHOUT a
single-partition window.

The repo's standing rule (SURVEY.md §7, VERDICT r10/r12): an ordered
window whose spec has no partition key pulls the whole input into ONE
task — correct at test scale, a scale-killer at 100 TB.  The fix shipped
for CUSUM (operators/asof.py, events_cusum_changepoint) decomposes the
running prefix into ordered value-range chunks:

  1. chunk id = a pure map-side function of the sort metric, MONOTONE in
     the sort order (equal metrics always share a chunk, so the
     chunk-major / in-chunk-minor order equals the global order);
  2. per-chunk counts/sums via a map-side-combinable groupBy
     (``n_chunks`` rows — tiny);
  3. exclusive offsets over that dimension-sized table (the only
     unpartitioned window, input ≤ ``n_chunks`` rows by construction);
  4. offsets broadcast back; in-chunk ``row_number``/running sum under a
     window keyed on the chunk — parallelism = ``n_chunks``.

This module is that pattern extracted as a reusable combinator so every
"rank the whole dimension" query (Pareto/ABC, RFM quintiles, …) shares
one audited implementation instead of re-growing private single-task
windows.  Accumulation runs in DECIMAL(38,0) so count*sum cross products
stay exact at any scale (the CUSUM convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PREFIX_CHUNKS = 64
"""Ordered value-range chunks for the parallel prefix (CUSUM convention)."""

_D38 = "decimal(38,0)"


def ranked_prefix(
    df: DataFrame,
    metric: str,
    *,
    descending: bool,
    tiebreak: list[str],
    rank_col: str = "rank",
    n_col: str = "n_total",
    prefix: str | None = None,
    cum_col: str = "cum",
    total_col: str = "total",
    n_chunks: int = PREFIX_CHUNKS,
    chunk_col: str | None = None,
) -> DataFrame:
    """Global 1-based ``row_number`` (and optionally a running sum) over the
    total order (``metric`` asc/desc, ``tiebreak...`` asc) — fully parallel.

    Appends to ``df``:
      - ``rank_col``  (BIGINT): global position under the total order;
      - ``n_col``     (BIGINT): total row count;
      - ``cum_col``   (DECIMAL(38,0), when ``prefix`` given): running sum of
        ``prefix`` over rows at position ≤ rank (inclusive);
      - ``total_col`` (DECIMAL(38,0), when ``prefix`` given): grand total;
      - ``chunk_col`` (INT, when given): the parallel-prefix chunk id —
        a skew-audit hook, not an output contract.

    ``metric`` must be a non-null integral column (cents / counts / days —
    the repo's exact-arithmetic convention); ``tiebreak`` must make the
    order total, or ranks within a metric tie are nondeterministic, and
    its FIRST column must be integral (enforced loudly) — it refines the
    chunking under metric ties (below).  NULL values in ``metric`` or the
    first tiebreak raise at runtime (NULL sort keys have no position in
    the total order; silently dropping them through the NULL-chunk join
    is the failure mode both guards exist to prevent).  An EMPTY tiebreak
    is allowed
    when the metric itself is unique; chunking then stays value-range
    only.

    Skew floor (review r13): a value-range chunk id alone collapses all
    ties of one metric value into one chunk — for a low-cardinality
    metric (RFM's order counts: a handful of distinct values, heavily
    modal) that silently recreates the single-task window this combinator
    exists to kill.  When the metric domain is NARROWER than ``n_chunks``,
    each metric value therefore gets ``n_chunks div domain`` sub-chunks
    split by the first tiebreak's value range: chunk-major order still
    equals the global (metric, tiebreak) order — sub-chunks only ever
    partition rows of a SINGLE metric value, ordered by the tiebreak —
    so ranks are unchanged while the modal value's population fans out.
    (A wide-domain skewed metric still concentrates; frequency-aware
    boundaries from a quantile sketch are the next escalation if a real
    workload hits that.)
    """
    out_cols = list(df.columns)
    integral = ("byte", "short", "int", "integer", "long", "bigint")
    tb0 = tiebreak[0] if tiebreak else None
    if tb0 is not None and df.schema[tb0].dataType.simpleString() not in integral:
        # a failed CAST(tb0 AS DECIMAL) would NULL the chunk id and the
        # offsets join would then silently DROP the row — refuse loudly
        raise ValueError(
            f"ranked_prefix: first tiebreak {tb0!r} must be integral to "
            f"refine chunking under metric ties "
            f"(got {df.schema[tb0].dataType.simpleString()})"
        )
    span_aggs = [
        F.min(metric).cast(_D38).alias("__pp_lo"),
        F.max(metric).cast(_D38).alias("__pp_hi"),
    ]
    if tb0 is not None:
        span_aggs += [
            F.min(tb0).cast(_D38).alias("__pp_tlo"),
            F.max(tb0).cast(_D38).alias("__pp_thi"),
        ]
    span = df.agg(*span_aggs)
    m38 = F.col(metric).cast(_D38)
    pos = (F.col("__pp_hi") - m38) if descending else (m38 - F.col("__pp_lo"))
    if tb0 is None:
        # no tiebreak to refine by (caller guarantees a unique metric):
        # plain value-range chunking
        chunk_expr = F.expr(
            f"CAST(__pp_pos * {n_chunks} DIV (__pp_hi - __pp_lo + 1) AS INT)"
        )
        drop_cols = ["__pp_pos", "__pp_lo", "__pp_hi"]
    else:
        chunk_expr = F.expr(
            f"""CAST(CASE
                WHEN (__pp_hi - __pp_lo + 1) >= {n_chunks}
                THEN __pp_pos * {n_chunks} DIV (__pp_hi - __pp_lo + 1)
                ELSE __pp_pos * ({n_chunks} DIV (__pp_hi - __pp_lo + 1))
                     + (CAST({tb0} AS {_D38}) - __pp_tlo)
                       * ({n_chunks} DIV (__pp_hi - __pp_lo + 1))
                       DIV (__pp_thi - __pp_tlo + 1)
                END AS INT)"""
        )
        drop_cols = ["__pp_pos", "__pp_lo", "__pp_hi", "__pp_tlo", "__pp_thi"]
    # NULL metric/tiebreak VALUES would NULL the chunk id and the inner
    # offsets join would then silently drop the row (the same failure the
    # integral-type guard above refuses at plan time) — raise at runtime
    # instead of losing rows (review r13 ADVICE)
    non_null = F.col(metric).isNotNull()
    if tb0 is not None:
        non_null = non_null & F.col(tb0).isNotNull()
    guard = F.assert_true(
        non_null,
        F.lit(
            f"ranked_prefix: NULL in {metric!r}"
            + (f"/{tb0!r}" if tb0 is not None else "")
            + " — NULL sort keys have no position in the total order"
        ),
    )
    chunked = (
        df.crossJoin(F.broadcast(span))
        .withColumn("__pp_pos", pos)
        .withColumn("__pp_chunk", F.when(guard.isNull(), chunk_expr))
        .drop(*drop_cols)
    )
    zero = F.lit(0).cast(_D38)
    aggs = [F.count(F.lit(1)).cast(_D38).alias("__pp_ccnt")]
    if prefix is not None:
        aggs.append(F.sum(F.col(prefix).cast(_D38)).alias("__pp_csum"))
    per_chunk = chunked.groupBy("__pp_chunk").agg(*aggs)
    # the ONLY unpartitioned windows: input is ≤ n_chunks rows by
    # construction (dimension-sized, never the data)
    w_chunks = Window.orderBy("__pp_chunk")
    w_prior = w_chunks.rowsBetween(Window.unboundedPreceding, -1)
    w_all = w_chunks.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    off_cols = [
        F.col("__pp_chunk"),
        F.coalesce(F.sum("__pp_ccnt").over(w_prior), zero).alias("__pp_i_off"),
        F.sum("__pp_ccnt").over(w_all).alias("__pp_n"),
    ]
    if prefix is not None:
        off_cols += [
            F.coalesce(F.sum("__pp_csum").over(w_prior), zero).alias(
                "__pp_p_off"
            ),
            F.sum("__pp_csum").over(w_all).alias("__pp_tot"),
        ]
    offsets = per_chunk.select(*off_cols)
    order = [
        F.col(metric).desc() if descending else F.col(metric).asc(),
        *[F.col(t).asc() for t in tiebreak],
    ]
    w_in = Window.partitionBy("__pp_chunk").orderBy(*order)
    w_run = w_in.rowsBetween(Window.unboundedPreceding, 0)
    proj = [
        *out_cols,
        (F.col("__pp_i_off") + F.row_number().over(w_in).cast(_D38))
        .cast("long")
        .alias(rank_col),
        F.col("__pp_n").cast("long").alias(n_col),
    ]
    if chunk_col is not None:
        proj.append(F.col("__pp_chunk").alias(chunk_col))
    if prefix is not None:
        proj += [
            (
                F.col("__pp_p_off")
                + F.sum(F.col(prefix).cast(_D38)).over(w_run)
            ).alias(cum_col),
            F.col("__pp_tot").alias(total_col),
        ]
    return chunked.join(F.broadcast(offsets), "__pp_chunk").select(*proj)


def ntile_expr(rank_col: str, n_col: str, k: int = 5):
    """Exact positional NTILE(k) from a precomputed global rank — the
    escape hatch from NTILE's unpartitioned window.

    SQL-standard NTILE over n rows: the first ``n % k`` buckets get
    ``n div k + 1`` rows, the rest ``n div k`` — a pure function of
    (rank, n), so once :func:`ranked_prefix` has the rank, the bucket is a
    map-side expression.  GREATEST(q, 1) guards the (unreachable when
    rank ≤ n) q = 0 divisor under ANSI mode.
    """
    q = f"({n_col} DIV {k})"
    r = f"({n_col} % {k})"
    cut = f"({r} * ({q} + 1))"
    return F.expr(
        f"CAST(CASE WHEN {rank_col} <= {cut} "
        f"THEN ({rank_col} - 1) DIV ({q} + 1) + 1 "
        f"ELSE {r} + ({rank_col} - {cut} - 1) DIV GREATEST({q}, 1) + 1 "
        f"END AS BIGINT)"
    )
