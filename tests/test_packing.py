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


# ------------------------------------------- sharded export (round 4)


def _replay_fixed(lens, seq_len, n_parts, ids=None):
    """Pure-Python replay of pack_greedy_fixed."""
    ids = ids if ids is not None else list(range(len(lens)))
    lo, hi = min(ids), max(ids)
    width = max(1, (hi - lo + 1 + n_parts - 1) // n_parts)
    out = {}
    state = {}  # part -> (pack, used)
    for did, n in sorted(zip(ids, lens)):
        part = (did - lo) // width
        pack, used = state.get(part, (0, 0))
        n = min(n, seq_len)
        if used + n > seq_len and used > 0:
            pack, used = pack + 1, 0
        out[did] = (part, pack, used)
        state[part] = (pack, used + n)
    return out


def test_pack_greedy_fixed_replay_and_determinism(spark):
    from linkgraph.text.packing import pack_greedy_fixed

    rng = random.Random(11)
    ids = rng.sample(range(3000), 200)
    lens = [rng.randrange(0, 700) for _ in ids]
    docs = spark.createDataFrame(
        [(i, "w " * n) for i, n in zip(ids, lens)], "doc_id long, text string"
    )
    want = _replay_fixed(lens, 512, 8, ids)
    got = {
        r["doc_id"]: (r["part"], r["pack_in_part"], r["begin_in_pack"])
        for r in pack_greedy_fixed(docs, seq_len=512, n_parts=8).collect()
    }
    assert got == want
    # determinism across physical layouts: different n_parts exchange
    # widths must not change the n_parts=8 logical assignment
    got2 = {
        r["doc_id"]: (r["part"], r["pack_in_part"], r["begin_in_pack"])
        for r in pack_greedy_fixed(
            docs.repartition(13), seq_len=512, n_parts=8
        ).collect()
    }
    assert got2 == want


def test_shard_packs_deterministic_and_pack_atomic(spark):
    from linkgraph.text.packing import pack_greedy_fixed, shard_packs

    docs = _docs(spark, [100, 200, 300, 400, 500, 50, 60, 70] * 5)
    packed = pack_greedy_fixed(docs, seq_len=512, n_parts=4)
    s1 = shard_packs(packed, n_shards=3, seed=0).collect()
    s2 = shard_packs(packed, n_shards=3, seed=0).collect()
    assert {tuple(r) for r in s1} == {tuple(r) for r in s2}
    # a pack never splits across shards
    by_pack = {}
    for r in s1:
        by_pack.setdefault((r["part"], r["pack_in_part"]), set()).add(r["shard"])
    assert all(len(v) == 1 for v in by_pack.values())
    # different seed reshuffles (at least one pack moves on this data)
    s3 = shard_packs(packed, n_shards=3, seed=1).collect()
    assert {tuple(r) for r in s1} != {tuple(r) for r in s3}


def test_write_shards_roundtrip_and_manifest(spark, tmp_path):
    from linkgraph.text.packing import (
        pack_greedy_fixed,
        shard_manifest,
        shard_packs,
        write_shards,
    )

    docs = _docs(spark, [100, 480, 16, 512, 700, 1, 0, 250, 250, 13])
    sharded = shard_packs(pack_greedy_fixed(docs, 512, 4), n_shards=2)
    manifest = write_shards(sharded, str(tmp_path / "export"), seq_len=512)
    back = spark.read.parquet(str(tmp_path / "export" / "packs"))
    assert back.count() == docs.count()
    # manifest totals agree with the data
    m = {r["shard"]: r for r in manifest.collect()}
    again = {r["shard"]: r for r in shard_manifest(sharded, 512).collect()}
    assert set(m) == set(again)
    for s in m:
        assert (m[s]["n_packs"], m[s]["n_docs"], m[s]["n_tokens"]) == (
            again[s]["n_packs"], again[s]["n_docs"], again[s]["n_tokens"]
        )
    assert sum(r["n_docs"] for r in m.values()) == docs.count()
    # within a shard directory, files stream packs contiguously
    written = spark.read.parquet(str(tmp_path / "export" / "manifest"))
    assert written.count() == len(m)
