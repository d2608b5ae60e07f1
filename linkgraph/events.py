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
