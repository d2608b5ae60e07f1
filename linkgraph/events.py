"""Event-stream analytics over the ``events`` table
(event_id, ts, user_id, event_type, value, props).

Batch implementations of the standard stream shapes — tumbling-window
aggregation, sessionization with an inactivity gap, per-user funnels —
written so the same logical plan runs under Structured Streaming
(``linkgraph.streaming`` wraps these over ``readStream`` with
watermarks; the reference has no streaming surface, SURVEY.md §2.2).

Scale notes: tumbling windows are a pure hash aggregate on
(window, event_type). Sessionization uses a window function partitioned
by user_id — per-user event counts are bounded (human-scale activity),
so the sort-within-partition is safe; a 100 TB run partitions by
hash(user_id) and AQE splits residual skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tumbling_window_counts(
    events: DataFrame, minutes: int = 60
) -> DataFrame:
    """(window_start, event_type, n_events, sum_value) per tumbling window."""
    w = F.window("ts", f"{minutes} minutes")
    return (
        events.groupBy(w.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_window_counts(
    events: DataFrame, minutes: int = 60, slide_minutes: int = 15
) -> DataFrame:
    """(window_start, event_type, n_events) per SLIDING window — the
    batch twin of ``streaming.streaming_sliding_counts`` (same
    ``F.window(ts, length, slide)`` expression, no watermark). Each
    event lands in length/slide windows; the explode is bounded by
    that constant factor and the aggregate is map-side combinable, so
    the shuffle carries at most (windows x types) rows per partition.
    ``window_start`` is emitted as truncated epoch seconds (long), the
    engine-portable representation (events_sessionize contract)."""
    w = F.window("ts", f"{minutes} minutes", f"{slide_minutes} minutes")
    return (
        events.groupBy(w.alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").cast("timestamp").cast("long").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def trending_lift(
    sliding_counts: DataFrame, baseline_windows: int = 4
) -> DataFrame:
    """Per event type, each sliding window's count lift vs the
    trailing mean of the previous ``baseline_windows`` windows (the
    classic trending score; the streaming post-pass
    ``streaming.trending_types`` applies the same frame to emitted
    windows). Window starts are unique per type after the sliding
    aggregate, so the ROWS frame is deterministic. The per-type sort
    is bounded by the number of windows in the horizon, not by event
    volume."""
    byt = (
        Window.partitionBy("event_type")
        .orderBy("window_start")
        .rowsBetween(-baseline_windows, -1)
    )
    base = F.avg("n_events").over(byt)
    return sliding_counts.select(
        "window_start",
        "event_type",
        "n_events",
        F.round(base, 6).alias("baseline"),
        F.when(base > 0, F.round(F.col("n_events") / base, 6)).alias("lift"),
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """(user_id, session_id, session_start, session_end, n_events).

    Classic gaps-and-islands: a new session starts where the time since
    the user's previous event exceeds the gap; session_id = running sum
    of starts per user (1-based).
    """
    # event_id tiebreak: orderBy("ts") alone is nondeterministic when a
    # user has duplicate timestamps (none in current testdata, but the
    # window frame must not depend on that).
    order = ["ts", "event_id"] if "event_id" in events.columns else ["ts"]
    by_user = Window.partitionBy("user_id").orderBy(*order)
    # NTZ-safe epoch seconds (session is pinned to UTC in build_session)
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(by_user)
    new_session = F.when(
        gap.isNull() | (gap > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    tagged = events.withColumn(
        "session_id", F.sum(new_session).over(by_user)
    )
    return tagged.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_matched",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` per key (a backward as-of join).

    Spark has no ASOF JOIN operator, so this is the scalable
    composition: tag-union both sides, one window per key ordered by
    (ts, side, right-tiebreak), carry the last non-null right payload
    forward, keep the left rows. ONE shuffle on the key and one
    sort-within-partition — the same plan shape as ``sessionize``;
    per-key row counts are bounded by per-entity activity, and a
    100 TB run hash-partitions the key with AQE splitting residual
    skew. No inequality join (which Spark would execute as a
    broadcast-nested-loop) ever appears in the plan.

    Right rows that share (key, ts) are first collapsed to the one
    with the greatest tiebreak column (``event_id`` when present) so
    the match is deterministic and engine-portable.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (key, ts_col)]
    tie = "event_id" if "event_id" in right.columns else right_cols[0]
    # deterministic survivor per (key, ts): max tiebreak, struct-max
    # carries the full payload without a window sort
    r1 = (
        right.groupBy(key, ts_col)
        .agg(
            F.max(
                F.struct(
                    F.col(tie),
                    *[F.col(c) for c in right_cols if c != tie],
                )
            ).alias("_s")
        )
        .select(key, ts_col, *[F.col(f"_s.{c}").alias(c) for c in right_cols])
    )
    l_payload = [c for c in left.columns if c not in (key, ts_col)]
    lhs = left.select(
        key,
        ts_col,
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in l_payload]).alias("_l"),
        F.lit(None).cast(
            r1.select(F.struct(*[F.col(c) for c in right_cols]).alias("x"))
            .schema["x"].dataType.simpleString()
        ).alias("_r"),
    )
    rhs = r1.select(
        key,
        ts_col,
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in l_payload]).alias("x"))
            .schema["x"].dataType.simpleString()
        ).alias("_l"),
        F.struct(*[F.col(c) for c in right_cols]).alias("_r"),
    )
    w = (
        Window.partitionBy(key)
        .orderBy(ts_col, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lhs.unionByName(rhs).withColumn(
        "_match", F.last("_r", ignorenulls=True).over(w)
    )
    out = carried.where(F.col("_side") == 1).select(
        key,
        ts_col,
        *[F.col(f"_l.{c}").alias(c) for c in l_payload],
        *[F.col(f"_match.{c}").alias(f"{c}{suffix}") for c in right_cols],
    )
    return out


def range_join(
    events: DataFrame,
    left_type: str,
    right_type: str,
    max_gap_minutes: int = 30,
    key: str = "user_id",
) -> DataFrame:
    """Pairs (left event, right event) per key with
    ``0 <= right.ts - left.ts <= max_gap`` — a bounded-interval join
    (e.g. every click within 30 minutes AFTER a view by the same user).

    A naive ``l.ts <= r.ts <= l.ts + gap`` join is an inequality join,
    which Spark plans as a broadcast-nested-loop — quadratic per key.
    Instead the gap bounds the candidates to adjacent time buckets of
    width ``gap``: the left side explodes to (bucket, bucket+1) and
    joins the right side on the EXACT (key, bucket) pair — an
    equi-join Catalyst hash-partitions — then the precise predicate
    filters. Each right row is examined at most twice; output is
    produced streaming out of the hash join, never materializing the
    per-key cross product.
    """
    gap_s = max_gap_minutes * 60
    epoch = F.col("ts").cast("timestamp").cast("long")
    lhs = (
        events.where(F.col("event_type") == left_type)
        .select(
            F.col(key),
            F.col("event_id").alias("left_id"),
            epoch.alias("left_ts"),
        )
        .withColumn("_b", F.explode(F.array(
            (F.col("left_ts") / gap_s).cast("long"),
            (F.col("left_ts") / gap_s).cast("long") + 1,
        )))
    )
    rhs = events.where(F.col("event_type") == right_type).select(
        F.col(key),
        F.col("event_id").alias("right_id"),
        epoch.alias("right_ts"),
        (epoch / gap_s).cast("long").alias("_b"),
    )
    gap_col = F.col("right_ts") - F.col("left_ts")
    return (
        lhs.join(rhs, [key, "_b"])
        .where((gap_col >= 0) & (gap_col <= gap_s))
        .select(key, "left_id", "right_id", gap_col.alias("gap_seconds"))
    )


def event_type_funnel(events: DataFrame, steps: list[str]) -> DataFrame:
    """(step, step_idx, n_users): users whose FIRST occurrences of the
    step event types appear in order — a conversion funnel.

    One pass: per-user min(ts) per step via a pivoting aggregate, then a
    conjunctive ordering filter per prefix. No joins, no window sort.
    """
    firsts = events.groupBy("user_id").agg(
        *[
            F.min(F.when(F.col("event_type") == s, F.col("ts"))).alias(f"t{i}")
            for i, s in enumerate(steps)
        ]
    )
    out = None
    for i, s in enumerate(steps):
        cond = F.col("t0").isNotNull()
        for j in range(1, i + 1):
            cond = cond & F.col(f"t{j}").isNotNull() & (
                F.col(f"t{j}") >= F.col(f"t{j-1}")
            )
        step_df = firsts.where(cond).agg(
            F.count(F.lit(1)).alias("n_users")
        ).select(
            F.lit(s).alias("step"), F.lit(i).alias("step_idx"), "n_users"
        )
        out = step_df if out is None else out.unionByName(step_df)
    return out


def retention_cohorts(
    events: DataFrame, period_days: int = 7
) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity period,
    tracked across later periods.

    The standard product-analytics rollup: cohort(u) = the period
    (default week = 7-day bucket from the epoch) of u's first event;
    for each (cohort, offset) cell, n_users = distinct users of that
    cohort active exactly `offset` periods later, and retention =
    n_users / cohort size (offset 0 row == 1.0 by construction).

    Returns (cohort_start, period_offset, n_users, retention) with
    cohort_start a date.

    Plan shape: one (user, period) distinct aggregate over the raw
    events (map-side combinable — the only corpus-sized shuffle), a
    per-user min for the cohort, one broadcast-sized join back
    (user-period rows), then a count-distinct per (cohort, offset)
    cell. Epoch-anchored integer periods (unix_ts div period) keep the
    bucketing engine-independent — no calendar/timezone arithmetic.
    """
    per = (F.unix_timestamp("ts") / F.lit(86400 * period_days)).cast("long")
    activity = events.select(
        F.col("user_id"), per.alias("period")
    ).distinct()
    first = activity.groupBy("user_id").agg(F.min("period").alias("cohort"))
    sizes = first.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("_cohort_size")
    )
    cells = (
        activity.join(first, "user_id")
        .groupBy(
            "cohort", (F.col("period") - F.col("cohort")).alias("period_offset")
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    return (
        cells.join(F.broadcast(sizes), "cohort")
        .select(
            F.to_date(
                F.timestamp_seconds(F.col("cohort") * 86400 * period_days)
            ).alias("cohort_start"),
            "period_offset",
            "n_users",
            (F.col("n_users") / F.col("_cohort_size")).alias("retention"),
        )
    )
