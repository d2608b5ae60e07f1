"""Event analytics: tumbling windows, sessionization, funnel; plus the
Structured Streaming path (availableNow drain) agreeing with batch."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from linkgraph.events import event_type_funnel, sessionize, tumbling_window_counts

T0 = dt.datetime(2026, 1, 1, 0, 0, 0)


def ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, T0 + dt.timedelta(minutes=m), u, t, float(v), "{}")
            for i, (m, u, t, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )


def test_tumbling_window_counts(spark):
    df = ev(spark, [(0, 1, "view", 1), (59, 1, "view", 2), (60, 2, "buy", 5), (130, 1, "view", 1)])
    out = {
        (r["window_start"].minute + 60 * r["window_start"].hour, r["event_type"]): (
            r["n_events"],
            r["sum_value"],
        )
        for r in tumbling_window_counts(df, minutes=60).collect()
    }
    assert out[(0, "view")] == (2, 3.0)
    assert out[(60, "buy")] == (1, 5.0)
    assert out[(120, "view")] == (1, 1.0)


def test_sessionize_gap(spark):
    df = ev(
        spark,
        [(0, 1, "a", 0), (10, 1, "a", 0), (70, 1, "a", 0), (75, 1, "a", 0), (0, 2, "a", 0)],
    )
    rows = {
        (r["user_id"], r["session_id"]): r["n_events"]
        for r in sessionize(df, gap_minutes=30).collect()
    }
    assert rows == {(1, 1): 2, (1, 2): 2, (2, 1): 1}


def test_funnel_order(spark):
    df = ev(
        spark,
        [
            (0, 1, "view", 0), (5, 1, "cart", 0), (9, 1, "buy", 0),   # full funnel
            (0, 2, "view", 0), (5, 2, "cart", 0),                     # no buy
            (5, 3, "cart", 0), (9, 3, "view", 0),                     # out of order
        ],
    )
    out = {r["step"]: r["n_users"] for r in event_type_funnel(df, ["view", "cart", "buy"]).collect()}
    assert out == {"view": 3, "cart": 2, "buy": 1}


def test_as_of_join_backward(spark):
    from linkgraph.events import as_of_join

    views = ev(spark, [(0, 1, "view", 10), (20, 1, "view", 20), (5, 2, "view", 7)])
    buys = ev(
        spark,
        [(10, 1, "buy", 1), (25, 1, "buy", 2), (0, 2, "buy", 3), (30, 3, "buy", 4)],
    )
    out = {
        (r["user_id"], r["ts"].minute): r["value_matched"]
        for r in as_of_join(buys, views).collect()
    }
    # buy@10 matches view@0; buy@25 matches view@20; user2 buy@0 has no
    # prior view (view@5 is later) -> null; user3 has no views at all.
    assert out == {(1, 10): 10.0, (1, 25): 20.0, (2, 0): None, (3, 30): None}


def test_as_of_join_equal_ts_and_dup_right(spark):
    from linkgraph.events import as_of_join

    views = ev(spark, [(5, 1, "view", 10), (5, 1, "view", 99)])  # dup (key, ts)
    buys = ev(spark, [(5, 1, "buy", 1)])
    rows = as_of_join(buys, views).collect()
    # inclusive <=; dup right rows collapse to the max-event_id survivor
    assert rows[0]["value_matched"] == 99.0


def test_range_join_matches_brute_force(spark):
    import itertools
    import random

    from linkgraph.events import range_join

    rng = random.Random(7)
    rows = [
        (rng.randrange(0, 300), rng.randrange(1, 6),
         rng.choice(["view", "click"]), 0)
        for _ in range(120)
    ]
    df = ev(spark, rows)
    got = sorted(
        (r["user_id"], r["left_id"], r["right_id"], r["gap_seconds"])
        for r in range_join(df, "view", "click", max_gap_minutes=30).collect()
    )
    evs = [(i, m * 60, u, t) for i, (m, u, t, _v) in enumerate(rows)]
    want = sorted(
        (u1, i1, i2, t2 - t1)
        for (i1, t1, u1, ty1), (i2, t2, u2, ty2) in itertools.product(evs, evs)
        if ty1 == "view" and ty2 == "click" and u1 == u2 and 0 <= t2 - t1 <= 1800
    )
    assert got == want and len(want) > 0


def test_streaming_agrees_with_batch(spark, tmp_path):
    from linkgraph.streaming import run_available_now, stream_events, streaming_window_counts

    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events_dir = str(tmp_path / "events_in")
    src.repartition(6).write.parquet(events_dir)

    streamed = streaming_window_counts(stream_events(spark, events_dir), minutes=60)
    run_available_now(streamed, "win_counts", str(tmp_path / "ckpt"))
    got = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in spark.table("win_counts").collect()
    }
    batch = src.groupBy(F.window("ts", "60 minutes").alias("w"), "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    want = {(r["w"]["start"], r["event_type"]): r["n"] for r in batch.collect()}
    assert got == want and len(want) > 0


def test_streaming_sliding_counts_agree_with_batch(spark, tmp_path):
    from linkgraph.streaming import (
        run_available_now,
        stream_events,
        streaming_sliding_counts,
        trending_types,
    )

    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events_dir = str(tmp_path / "ev_sliding")
    src.repartition(5).write.parquet(events_dir)

    streamed = streaming_sliding_counts(
        stream_events(spark, events_dir), minutes=60, slide_minutes=30
    )
    run_available_now(streamed, "sliding_counts", str(tmp_path / "ckpt_s"))
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.table("sliding_counts").collect()
    }
    batch = src.groupBy(
        F.window("ts", "60 minutes", "30 minutes").alias("w"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("s"))
    want = {
        (r["w"]["start"], r["event_type"]): (r["n"], r["s"]) for r in batch.collect()
    }
    assert got == want and len(want) > 0

    # trending lift: hand-check one type against a pandas recompute
    tt = trending_types(spark.table("sliding_counts"), baseline_windows=2)
    rows = sorted(
        (r for r in tt.collect() if r["event_type"] == "click"),
        key=lambda r: r["window_start"],
    )
    ns = [r["n_events"] for r in rows]
    for i, r in enumerate(rows):
        prev = ns[max(0, i - 2):i]
        if not prev:
            assert r["baseline"] is None
        else:
            assert abs(r["baseline"] - round(sum(prev) / len(prev), 6)) < 1e-9


def test_batch_sliding_counts_brute(spark):
    from linkgraph.events import sliding_window_counts

    rows = [(0, 1, "view", 1), (14, 2, "view", 1), (16, 1, "buy", 2),
            (45, 3, "view", 1), (61, 1, "view", 1), (200, 2, "buy", 3)]
    df = ev(spark, rows)
    got = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in sliding_window_counts(df, minutes=60, slide_minutes=15).collect()
    }
    # brute force: event at epoch second es lands in 4 slide-aligned
    # 60-minute windows starting at (es//900 - i)*900, i in 0..3
    want: dict[tuple[int, str], int] = {}
    for m, _u, t, _v in rows:
        es = int((T0 + dt.timedelta(minutes=m)).replace(
            tzinfo=dt.timezone.utc).timestamp())
        for i in range(4):
            ws = (es // 900 - i) * 900
            if ws > es - 3600:
                want[(ws, t)] = want.get((ws, t), 0) + 1
    assert got == want


def test_trending_lift_hand_computed(spark):
    from linkgraph.events import sliding_window_counts, trending_lift

    # one event type, one event per slide for 4 slides then a burst
    rows = [(0, 1, "view", 1), (15, 1, "view", 1), (30, 1, "view", 1),
            (45, 1, "view", 1)] + [(60, u, "view", 1) for u in range(5)]
    df = ev(spark, rows)
    out = {
        r["window_start"]: (r["n_events"], r["baseline"], r["lift"])
        for r in trending_lift(
            sliding_window_counts(df, 60, 15), baseline_windows=4
        ).collect()
    }
    starts = sorted(out)
    # earliest window has NULL baseline/lift (empty trailing frame)
    assert out[starts[0]][1] is None and out[starts[0]][2] is None
    es0 = int(T0.replace(tzinfo=dt.timezone.utc).timestamp())
    # window [60m, 120m) holds exactly the 5 burst events; its trailing
    # windows start at 0/15/30/45 min covering 4/8/7/6 events -> 6.25
    n, base, lift = out[es0 + 3600]
    assert (n, base, lift) == (5, 6.25, 0.8)
    # window [15m, 75m) covers 3 singles + the burst = 8 events; its
    # trailing windows (-45/-30/-15/0 min) cover 1/2/3/4 -> mean 2.5
    n, base, lift = out[es0 + 900]
    assert (n, base, lift) == (8, 2.5, 3.2)
    assert lift > 1.0


def test_retention_cohorts_brute(spark):
    from linkgraph.events import retention_cohorts

    # Users starting in different weeks with varying comebacks.
    # minutes: week k begins at k*7*24*60 relative minutes from T0.
    wk = 7 * 24 * 60
    rows = [
        (0 * wk, 1, "view", 1), (1 * wk, 1, "view", 1), (3 * wk, 1, "buy", 1),
        (0 * wk + 5, 2, "view", 1), (1 * wk + 9, 2, "view", 1),
        (0 * wk + 7, 3, "view", 1),
        (1 * wk + 3, 4, "view", 1), (2 * wk + 3, 4, "view", 1),
        (1 * wk + 3, 4, "click", 1),  # same user+week dup must not double
    ]
    df = ev(spark, rows)
    got = {
        (r["cohort_start"].isoformat(), r["period_offset"]): (
            r["n_users"],
            r["retention"],
        )
        for r in retention_cohorts(df, period_days=7).collect()
    }

    # brute replay on epoch-week buckets
    import collections

    epoch = dt.datetime(1970, 1, 1)
    per = {}
    for i, (m, u, t, v) in enumerate(rows):
        ts = T0 + dt.timedelta(minutes=m)
        p = int((ts - epoch).total_seconds()) // (86400 * 7)
        per.setdefault(u, set()).add(p)
    first = {u: min(ps) for u, ps in per.items()}
    csize = collections.Counter(first.values())
    cells = collections.Counter()
    for u, ps in per.items():
        for p in ps:
            cells[(first[u], p - first[u])] += 1
    want = {}
    for (c, off), nu in cells.items():
        start = (epoch + dt.timedelta(days=7 * c)).date().isoformat()
        want[(start, off)] = (nu, nu / csize[c])
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], k
        assert abs(got[k][1] - want[k][1]) < 1e-12
    # offset-0 cells retain everyone
    for (s, off), (nu, rr) in got.items():
        if off == 0:
            assert rr == 1.0
