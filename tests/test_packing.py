"""Sequence packing: distributed prefix sum vs sorted replay,
concat-and-chunk exactness, greedy next-fit per-partition replay."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from linkgraph.text.packing import (
    pack_chunks,
    pack_greedy,
    packing_stats,
    with_global_offset,
)


def _docs(spark, lens, start_id=0):
    rows = [(start_id + i, "w " * n if n else "") for i, n in enumerate(lens)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_global_offset_matches_sorted_cumsum(spark):
    rng = random.Random(5)
    rows = [(i, rng.randrange(0, 400)) for i in rng.sample(range(10000), 300)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    got = {
        r["doc_id"]: r["offset"]
        for r in with_global_offset(df, "doc_id", "n", num_partitions=7).collect()
    }
    acc = 0
    for did, n in sorted(rows):
        assert got[did] == acc
        acc += n


def test_pack_chunks_exact_layout(spark):
    lens = [100, 50, 0, 512, 600, 3, 1]
    out = {
        r["doc_id"]: r
        for r in pack_chunks(_docs(spark, lens), seq_len=128).collect()
    }
    acc = 0
    for i, n in enumerate(lens):
        r = out[i]
        assert r["n_tokens"] == n
        assert r["begin_off"] == acc
        assert r["chunk_first"] == acc // 128
        end = acc + max(n, 1) - 1
        assert r["chunk_last"] == end // 128
        want_span = 0 if n == 0 else (acc + n - 1) // 128 - acc // 128 + 1
        assert r["n_chunks_spanned"] == want_span
        acc += n


def test_pack_chunks_no_token_lost(spark):
    rng = random.Random(9)
    lens = [rng.randrange(0, 300) for _ in range(200)]
    out = pack_chunks(_docs(spark, lens), seq_len=256)
    total = out.agg(F.sum("n_tokens")).collect()[0][0]
    assert total == sum(lens)
    # spans tile the stream: doc i's end+1 == doc i+1's begin
    rows = sorted(out.collect(), key=lambda r: r["doc_id"])
    for a, b in zip(rows, rows[1:]):
        assert a["begin_off"] + a["n_tokens"] == b["begin_off"]


def _replay_next_fit(lens, seq_len):
    pack, used, out = 0, 0, []
    for n in lens:
        n = min(n, seq_len)
        if used + n > seq_len and used > 0:
            pack, used = pack + 1, 0
        out.append((pack, used))
        used += n
    return out


def test_pack_greedy_single_partition_replay(spark):
    rng = random.Random(3)
    lens = [rng.randrange(1, 200) for _ in range(120)]
    got = sorted(
        pack_greedy(_docs(spark, lens), seq_len=256, num_partitions=1).collect(),
        key=lambda r: r["doc_id"],
    )
    want = _replay_next_fit(lens, 256)
    for r, (pk, beg) in zip(got, want):
        assert (r["pack_in_part"], r["begin_in_pack"]) == (pk, beg)
        assert r["part"] == got[0]["part"]


def test_pack_greedy_multi_partition_semantics(spark):
    rng = random.Random(17)
    lens = [rng.randrange(1, 300) for _ in range(400)]
    rows = sorted(
        pack_greedy(_docs(spark, lens), seq_len=512, num_partitions=8).collect(),
        key=lambda r: r["doc_id"],
    )
    # partitions cover contiguous doc_id ranges
    seen_parts = []
    for r in rows:
        if not seen_parts or seen_parts[-1] != r["part"]:
            assert r["part"] not in seen_parts
            seen_parts.append(r["part"])
    # within each partition the next-fit replay holds exactly
    by_part: dict[int, list] = {}
    for r in rows:
        by_part.setdefault(r["part"], []).append(r)
    for members in by_part.values():
        want = _replay_next_fit([r["n_tokens"] for r in members], 512)
        for r, (pk, beg) in zip(members, want):
            assert (r["pack_in_part"], r["begin_in_pack"]) == (pk, beg)
    # no pack overflows
    fills: dict[tuple, int] = {}
    for r in rows:
        key = (r["part"], r["pack_in_part"])
        fills[key] = fills.get(key, 0) + min(r["n_tokens"], 512)
    assert all(v <= 512 for v in fills.values())


def test_packing_stats(spark):
    lens = [300, 300, 300, 100]  # packs: [300+300] (exact fill), [300+100]
    packed = pack_greedy(_docs(spark, lens), seq_len=600, num_partitions=1)
    s = packing_stats(packed, seq_len=600).collect()[0]
    assert s["n_packs"] == 2
    assert s["n_docs"] == 4
    assert s["n_tokens"] == 1000
    assert abs(s["mean_fill"] - (600 / 600 + 400 / 600) / 2) < 1e-6


def test_oversize_doc_occupies_one_pack(spark):
    got = sorted(
        pack_greedy(_docs(spark, [10, 900, 10]), seq_len=128,
                    num_partitions=1).collect(),
        key=lambda r: r["doc_id"],
    )
    assert [r["pack_in_part"] for r in got] == [0, 1, 2]
    assert [r["begin_in_pack"] for r in got] == [0, 0, 0]
