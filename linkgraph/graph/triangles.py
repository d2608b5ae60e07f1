"""Exact triangle enumeration: node-iterator with degree ordering.

Reference semantics:
- getTriangles (join variant)      graph-mining-spark Truss.scala:46-68
- getTrianglesNoSpark (node-iter)  graph-mining-spark Truss.scala:71-103
- degree pre-filter                graph-mining-spark Truss.scala:50

The algorithm (Cohen, "Graph Twiddling in a MapReduce World", 2009):
orient every undirected edge from its lower-(degree, id) endpoint; each
triangle is then generated exactly once as a wedge at its lowest-degree
vertex, closed by a join against the oriented edge set. Degree ordering
bounds every vertex's out-degree by O(sqrt(2m)), so wedge generation is
skew-safe by construction — no salting needed for this operator even on
power-law graphs (the 100TB argument: the largest adjacency run is
O(sqrt(2m)) rows, total wedge volume is the arboricity bound, and both
shuffles hash on near-uniform keys).

Three interchangeable kernels, cross-validated in tests:
- "join": oriented-edge self-join (the reference's `getTriangles` shape)
          — entirely JVM-side, whole-stage-codegen wedge stream with no
          per-vertex array materialization. Default (fastest measured:
          6.0s vs 10.2s "sql" vs 7.9s "csr" warm on the 1.2M-edge sf0.1
          graph).
- "sql":  adjacency as sorted arrays via collect_list, combination pairs
          generated with nested `transform` — also JVM-side, but pays
          per-vertex pair-array allocation.
- "csr":  sorted-CSR adjacency blocks inside Arrow batches into a fully
          vectorized NumPy kernel (mapInPandas over partitions hashed by
          anchor vertex and sorted within) — the pandas-UDF path the
          north star requires; one Python call per Arrow batch, never
          per-row (and not even per-group) Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph import bloom as B
from linkgraph.graph import edges as E

_WEDGE_SCHEMA = "a long, b long, c long"

# Row-splitting salt for the sql kernel's pair explode: outer indices of
# one vertex's adjacency are processed in blocks of this size, so a
# vertex near the degree-ordering bound sqrt(2m) no longer emits its
# whole O(c^2) pair block from ONE row in one task — per-block work is
# capped at ~_SALT_BLOCK * c pairs and the (lo, blk) repartition spreads
# a hub's blocks across tasks. Pairs partition cleanly by outer index,
# so the split is dedup-free. The duplicated nbrs array costs c/B extra
# copies, i.e. ~2/B of the pair volume — negligible at B=512.
_SALT_BLOCK = 512


def _pairs_expr(block: int) -> str:
    """Combination pairs (i<j) for outer indices in salted block `blk`,
    entirely as Catalyst expressions (no Python in the hot path)."""
    return (
        f"flatten(transform(slice(nbrs, blk * {block} + 1, {block}), (x, i) -> "
        f"transform(slice(nbrs, blk * {block} + i + 2, size(nbrs)), "
        "y -> struct(x.hi as b, y.hi as c))))"
    )


def _oriented(edges: DataFrame) -> DataFrame:
    """Canonical edges -> degree-ordered orientation, pre-filtered.

    The `deg > 1` filter mirrors Truss.scala:50 (a vertex of degree 1
    cannot anchor a wedge); Catalyst pushes it below the projection.
    """
    oriented = E.orient_by_degree(E.with_degrees(edges))
    # Project lo_deg away after the filter: no kernel reads it, and the
    # oriented table is checkpointed and re-exchanged several times —
    # 3 longs/row instead of 4 cuts every one of those by 25%.
    return oriented.where(F.col("lo_deg") > 1).select("lo", "hi", "hi_deg")


_BROADCAST_EDGE_LIMIT = 20_000_000  # rows; 2 longs/row ~ 320MB serialized

# Past the broadcast limit the full O(sum deg_out^2) wedge stream would
# cross the close-join exchange just for ~(1 - T/W) of it to be dropped
# by the join. A Bloom filter of the closing keys — since round 4 the
# REGISTER-BLOCKED filter (bloom.build_blocked_bloom: distributed
# Arrow partial-bitmap build, one random read per probe, bitmap
# mmap-shared per node) — probed INSIDE the wedge kernel (csr) or in a
# pipelined Arrow stage BEFORE the exchange (join/sql) cuts the
# exchanged rows to T + fpp*W; the exact join then removes the false
# positives, so results are unchanged. At 16 bits/key the bitmap is
# 2 bytes/edge (74 MB at 37M edges), fetched once per node. Exchange
# volume is the non-scaling term on a multi-executor close (it crosses
# JVM/network boundaries), so this is the lever that moves N -> 4N
# scaling efficiency at >= broadcast-limit sizes.
_BLOOM_FPP = 0.01


def _close_filter_state(oriented: DataFrame, n_edges: int, fpp: float):
    """Build the closing-key pre-filter: a register-blocked Bloom
    (bloom.build_blocked_bloom — ONE random read per probe instead of
    the classic filter's k=7, which was the measured latency wall of
    the wedge kernel at 37M edges). The bitmap is mmap-shared per node;
    the returned state is a tiny picklable tuple safe to close over.
    ``fpp`` maps to bits/key (blocking trades space for locality)."""
    bits = 16 if fpp <= 0.05 else 8
    return B.build_blocked_bloom(oriented, ["lo", "hi"], n_edges, bits_per_key=bits)


def _bloom_mask(state, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    h = B.xxhash64_longs([b, c])
    if isinstance(state, tuple) and state and state[0] == "blk":
        return B.blocked_contains(state, h)
    words, k, version, seed = state  # legacy JVM-built sketch state
    sk = B.BloomSketch(words=words, num_hashes=k, version=version, seed=seed)
    return sk.might_contain_longs(h)


# Max oriented-edge rows for the IN-KERNEL exact close (the round-4
# change that removes the wedge exchange + close join entirely for the
# csr strategy): the edge set ships as a hash-sorted int64[3][n] .npy
# via SparkContext.addFile and is np.load(mmap_mode="r")'d by workers —
# ONE OS-page-cache copy per node shared by every Python worker process
# on that node (a Python sc.broadcast would be deserialized into
# PRIVATE memory by each of the node's workers: 32 workers x 0.9 GB at
# 37M edges = untenable; the mmap is ~24 B/edge once per node). The
# bound is the driver-side build (one toPandas + argsort): 200M edges
# ~ 4.8 GB driver + file. Past it the csr strategy falls back to the
# bloom-prefiltered wedge stream + exact residual close join.
_KERNEL_CLOSE_EDGE_LIMIT = 200_000_000


def _parse_jvm_size(s: str) -> int:
    """'24g' / '16384m' / '1t' / plain bytes -> bytes."""
    s = s.strip().lower()
    mult = {"k": 1024, "m": 1024**2, "g": 1024**3, "t": 1024**4}
    if s and s[-1] in mult:
        return int(float(s[:-1]) * mult[s[-1]])
    return int(s)


def _kernel_close_limit(spark) -> int:
    """Auto-enable bound for the in-kernel exact close, derived from
    the configured driver sizing instead of the fixed constant alone.

    The serial edge-set build transiently holds ~56 B/edge on the
    driver (24 B Arrow frame + 8 B argsort order + 24 B packed array;
    the frame is freed before staging). spark.driver.memory sizes the
    driver JVM, the natural proxy for how the operator's host was
    provisioned (the pandas build lives in the Python process next to
    it); budget half of it, so the default 24g driver keeps the
    measured 200M ceiling (24g/2/56B ~ 230M -> min with the constant)
    while an 8g driver auto-falls back to the scale path at ~76M edges
    instead of OOMing near 200M.
    """
    try:
        mem = _parse_jvm_size(spark.conf.get("spark.driver.memory", "4g"))
    except (ValueError, TypeError):
        return _KERNEL_CLOSE_EDGE_LIMIT
    return min(_KERNEL_CLOSE_EDGE_LIMIT, mem // 2 // 56)

# Worker-process cache: file name -> (H uint64 sorted, LO, HI) views.
_EDGE_SET_CACHE: dict[str, tuple] = {}


def _edge_set_file(oriented: DataFrame) -> str:
    """Materialize the oriented edge set for the in-kernel exact close.

    Layout: int64[3][n] — row 0 the Catalyst xxhash64(lo, hi) keys in
    uint64-ascending order, rows 1/2 the aligned (lo, hi) endpoints for
    exact verification of hash collisions. The hash is computed
    JVM-side; the kernel probes with the bit-identical NumPy
    replication (bloom.xxhash64_longs, verified in tests/test_bloom.py).
    """
    from linkgraph import mmapshare

    pdf = oriented.select(F.xxhash64("lo", "hi").alias("h"), "lo", "hi").toPandas()
    h = pdf["h"].to_numpy(np.int64).view(np.uint64)
    lo = pdf["lo"].to_numpy(np.int64)
    hi = pdf["hi"].to_numpy(np.int64)
    n = len(pdf)
    del pdf  # free the frame before the int64[3][n] copy: near the
    # 200M-edge limit frame + copy together would double peak driver RSS
    order = np.argsort(h, kind="stable")
    arr = np.empty((3, n), dtype=np.int64)
    arr[0] = h[order].view(np.int64)
    arr[1] = lo[order]
    arr[2] = hi[order]
    del h, lo, hi, order
    return mmapshare.stage_array(
        oriented.sparkSession.sparkContext, arr, prefix="linkgraph_edgeset"
    )


def _load_edge_set(name: str) -> tuple:
    tup = _EDGE_SET_CACHE.get(name)
    if tup is None:
        from linkgraph import mmapshare

        arr = mmapshare.load_array(name)
        tup = (arr[0].view(np.uint64), arr[1], arr[2])
        _EDGE_SET_CACHE[name] = tup
    return tup


def _exact_close_mask(edge_set: tuple, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Exact membership of (b, c) in the oriented edge set.

    One vectorized binary search over the hash-sorted key array; the
    aligned endpoint rows verify the (vanishingly rare) hash-window
    cases, so the result is EXACT — no false positives to join away.
    """
    H, LO, HI = edge_set
    h = B.xxhash64_longs([b, c])
    left = np.searchsorted(H, h, side="left")
    right = np.searchsorted(H, h, side="right")
    found = np.zeros(b.size, dtype=bool)
    one = (right - left) == 1
    p = left[one]
    found[one] = (LO[p] == b[one]) & (HI[p] == c[one])
    for i in np.flatnonzero((right - left) > 1):
        sl = slice(left[i], right[i])
        found[i] = bool(np.any((LO[sl] == b[i]) & (HI[sl] == c[i])))
    return found


def _bloom_probe(state):
    """mapInArrow stage: drop wedge rows whose (b, c) cannot close.

    Runs pipelined in the wedge-producing stage, i.e. BEFORE the close
    join's exchange — the whole point is that dropped rows never
    serialize into shuffle files.
    """

    def probe(batches):
        import pyarrow as pa

        for batch in batches:
            b = batch.column("b").to_numpy(zero_copy_only=False)
            c = batch.column("c").to_numpy(zero_copy_only=False)
            mask = _bloom_mask(state, b, c)
            yield batch if mask.all() else batch.filter(pa.array(mask))

    return probe

# Max oriented-edge rows per shuffle partition for which the wedge
# self-join may force a (non-spillable) shuffled hash build; ~32B/row
# keyed relation -> <= ~32MB per task, safe under any sane executor
# memory. Past it the join stays a spillable SortMergeJoin.
_SHJ_BUILD_ROWS_LIMIT = 1_000_000


def _shj_safe(spark, n_edges: int | None) -> bool:
    """True when a forced (non-spillable) shuffled hash build over the
    oriented edge table is memory-safe at the CURRENT shuffle partition
    count: expected rows per partition under _SHJ_BUILD_ROWS_LIMIT."""
    if n_edges is None:
        return False
    parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return n_edges / max(parts, 1) <= _SHJ_BUILD_ROWS_LIMIT


def _shj_parts(spark, n_edges: int) -> int:
    """Partition count that bounds a forced hash build of the oriented
    edge table at _SHJ_BUILD_ROWS_LIMIT rows (~32MB) per task — the
    scale path past every fixed threshold: the build side is ALWAYS just
    the edge table, so an explicit repartition count that grows with
    |E| keeps the non-spillable build bounded at ANY scale, and the
    O(sum deg_out^2) wedge side is then hashed, never sorted (SMJ would
    sort the wedge stream — the dominant cost at 1e9 edges)."""
    parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    need = -(-n_edges // max(_SHJ_BUILD_ROWS_LIMIT, 1))
    return max(parts, need)


def _close_wedges(
    wedges: DataFrame, oriented: DataFrame, n_edges: int | None = None
) -> DataFrame:
    """Join wedges (a; b, c) with the oriented edge set on (b, c).

    b precedes c in (degree, id) order by construction, so the closing
    edge — if it exists — is oriented exactly (lo=b, hi=c). Output is
    id-canonical (a < b < c) regardless of degree order.

    The wedge side is O(sum deg_out^2) >> the edge side, so when the
    edge set is broadcastable we broadcast it explicitly and the wedge
    blowup never shuffles. Past _BROADCAST_EDGE_LIMIT the build side is
    still just the edge table, so a shuffled hash join (skipping the
    sort of the huge wedge side) beats SortMergeJoin — measured 47 s vs
    75 s best-of-reps on the 9.3M-edge graph at local[32] with the
    broadcast disabled. The forced hash build cannot spill, so it must
    be bounded: at the default shuffle partition count while that keeps
    build rows/partition under _SHJ_BUILD_ROWS_LIMIT, else by an
    explicit repartition on (b, c) to _shj_parts — (b, c) pairs are
    unique edges, so the key is collision-uniform and the bound holds at
    any |E|. The wedge stream therefore NEVER gets sorted; the spillable
    SMJ remains only for the unknown-size case (n_edges None).
    """
    closing = oriented.select(F.col("lo").alias("b"), F.col("hi").alias("c"))
    if n_edges is not None and n_edges <= _BROADCAST_EDGE_LIMIT:
        closing = F.broadcast(closing)
        tri = wedges.join(closing, ["b", "c"])
    elif _shj_safe(oriented.sparkSession, n_edges):
        tri = wedges.join(closing.hint("shuffle_hash"), ["b", "c"])
    elif n_edges is not None:
        # Repartition only the BUILD side to the bounded count; the
        # wedge side's matching exchange is inserted by the planner, so
        # AQE retains the freedom to split skewed stream partitions.
        parts = _shj_parts(oriented.sparkSession, n_edges)
        tri = wedges.join(
            closing.repartition(parts, "b", "c").hint("shuffle_hash"), ["b", "c"]
        )
    else:
        tri = wedges.join(closing, ["b", "c"])
    ordered = F.array_sort(F.array("a", "b", "c"))
    return tri.select(
        ordered.getItem(0).alias("a"),
        ordered.getItem(1).alias("b"),
        ordered.getItem(2).alias("c"),
    )


def _explode_parts(df: DataFrame) -> int:
    """Partition count for explosive stages: 4x parallelism so the
    wedge blowup spreads across every core with slack for imbalance."""
    return df.sparkSession.sparkContext.defaultParallelism * 4


def _wedges_sql(oriented: DataFrame, block: int | None = None) -> DataFrame:
    block = block or _SALT_BLOCK
    adj = oriented.groupBy("lo").agg(
        F.sort_array(F.collect_list(F.struct("hi_deg", "hi"))).alias("nbrs")
    )
    # One row per (vertex, outer-index block): see _SALT_BLOCK. Block
    # count = ceil((size - 1) / block); outer index i only ranges to
    # size - 2 (the last neighbor has no partner).
    adj = adj.where(F.size("nbrs") > 1).select(
        "lo",
        "nbrs",
        F.explode(
            F.expr(f"sequence(0, int(floor((size(nbrs) - 2) / {block})))")
        ).alias("blk"),
    )
    # Explicit repartition before the pair explode: the adjacency table
    # is tiny in BYTES (one row per vertex-block), so AQE's byte-based
    # coalescing would funnel the O(sum deg_out^2) wedge blowup through
    # a handful of tasks. An explicit numPartitions pins the fan-out
    # width (AQE never coalesces a user repartition with an explicit
    # count). Degree ordering + the block salt bound per-row work at
    # O(block * sqrt(2m)) pairs, so hash placement over 4x-parallelism
    # partitions is balanced.
    adj = adj.repartition(_explode_parts(adj), "lo", "blk")
    return adj.select(
        F.col("lo").alias("a"), F.explode(F.expr(_pairs_expr(block))).alias("w")
    ).select("a", "w.b", "w.c")


def _wedges_join(oriented: DataFrame, n_edges: int | None = None) -> DataFrame:
    # shuffle_hash: the self-join's per-partition build side is one
    # hash-partition of the oriented edge table, so a shuffled hash join
    # skips SortMergeJoin's O(E log E) sort of BOTH aliases — ~15-25%
    # faster measured on the 9.3M-edge graph. The hint FORCES the join
    # strategy past Spark's safety sizing, and unlike SMJ a hash build
    # cannot spill — so the build must be bounded: at the default
    # shuffle partition count while rows/partition stay under the limit,
    # else by repartitioning the oriented table ONCE on the join key to
    # _shj_parts (both aliases then share the partitioning, so the join
    # itself is exchange-free). Per-key rows are bounded by the degree
    # ordering at O(sqrt(2m)) << rows/partition, so no partition can
    # blow out. SMJ remains only for the unknown-size case.
    spark = oriented.sparkSession
    if not _shj_safe(spark, n_edges) and n_edges is not None:
        oriented = oriented.repartition(_shj_parts(spark, n_edges), "lo")
    x, y = oriented.alias("x"), oriented.alias("y")
    if n_edges is not None:
        y = y.hint("shuffle_hash")
    return (
        x.join(y, "lo")
        .where(
            F.struct(F.col("x.hi_deg"), F.col("x.hi"))
            < F.struct(F.col("y.hi_deg"), F.col("y.hi"))
        )
        .select(
            F.col("lo").alias("a"), F.col("x.hi").alias("b"), F.col("y.hi").alias("c")
        )
    )


def _cumsum0(x: np.ndarray) -> np.ndarray:
    """Exclusive prefix sum."""
    return np.r_[0, np.cumsum(x)[:-1]] if x.size else x


def _run_pairs(
    lo: np.ndarray, hi: np.ndarray, need_a: bool = True
) -> tuple[np.ndarray | None, np.ndarray, np.ndarray]:
    """All intra-run (i < j) pairs over CSR runs, fully vectorized.

    `lo` must be run-contiguous and `hi` sorted in degree order within
    each run. Two-level repeat construction: runs -> i-blocks -> pairs.
    Returns (a, b, c) int64 arrays; ``need_a=False`` skips gathering
    the anchor column (counting only needs the closing pair — one
    fewer 8 B/wedge array through DRAM on the hot path).
    """
    empty = np.empty(0, dtype=np.int64)
    change = np.flatnonzero(np.r_[True, lo[1:] != lo[:-1]])
    indptr = np.r_[change, lo.size]
    counts = np.diff(indptr)  # run sizes c_r
    starts = indptr[:-1]
    L = counts - 1  # i ranges over 0..L-1 per run
    keep = L > 0
    if not keep.any():
        return (empty if need_a else None), empty, empty
    L, starts = L[keep], starts[keep]
    n_runs = L.size
    # i-blocks: for run r, blocks i = 0..L_r-1 of length L_r - i.
    run_of_block = np.repeat(np.arange(n_runs), L)
    i_of_block = np.arange(run_of_block.size) - np.repeat(_cumsum0(L), L)
    block_len = L[run_of_block] - i_of_block
    # pairs: expand each block.
    i = np.repeat(i_of_block, block_len)
    run_of_pair = np.repeat(run_of_block, block_len)
    within = np.arange(i.size) - np.repeat(_cumsum0(block_len), block_len)
    j = i + 1 + within
    base = starts[run_of_pair]
    a = lo[base] if need_a else None
    return a, hi[base + i], hi[base + j]


def _agg_pairs_batch(
    bs: list[np.ndarray], cs: list[np.ndarray], pack: bool
) -> "object":
    """End-of-partition pre-aggregation of the survivor pair buffer.

    Sort + run-length count: one row per DISTINCT closing pair in this
    partition with its wedge multiplicity. Packed form keys on the
    injective ``(b << 32) | c`` int64 (requires ids < 2^31)."""
    import pyarrow as pa

    b = np.concatenate(bs) if bs else np.empty(0, dtype=np.int64)
    c = np.concatenate(cs) if cs else np.empty(0, dtype=np.int64)
    if not b.size:  # np.r_[True, ...] on empties would index [0]
        empty = pa.array(np.empty(0, dtype=np.int64))
        if pack:
            return pa.RecordBatch.from_arrays([empty, empty], names=["k", "m"])
        return pa.RecordBatch.from_arrays(
            [empty, empty, empty], names=["b", "c", "m"]
        )
    if pack:
        k = (b << np.int64(32)) | c
        ks = np.sort(k, kind="stable")
        starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
        m = np.diff(np.r_[starts, ks.size])
        return pa.RecordBatch.from_arrays(
            [pa.array(ks[starts]), pa.array(m.astype(np.int64))],
            names=["k", "m"],
        )
    order = np.lexsort((c, b))
    bs_, cs_ = b[order], c[order]
    starts = np.flatnonzero(
        np.r_[True, (bs_[1:] != bs_[:-1]) | (cs_[1:] != cs_[:-1])]
    )
    m = np.diff(np.r_[starts, bs_.size])
    return pa.RecordBatch.from_arrays(
        [pa.array(bs_[starts]), pa.array(cs_[starts]), pa.array(m.astype(np.int64))],
        names=["b", "c", "m"],
    )


def _csr_batch_iter(
    batches,
    bloom_value=None,
    edge_set_name: str | None = None,
    count_only: bool = False,
    emit_pairs: bool = False,
    pack_pairs: bool = False,
    agg_pairs: bool = True,
) -> Iterator:
    """mapInArrow kernel: wedge generation over CSR-packed partitions.

    The input partition is hash-distributed by anchor vertex and sorted
    within the partition by (lo, hi_deg, hi) — i.e. the partition IS a
    sorted-CSR block stream. A run may span Arrow batch boundaries, so
    rows of the last (possibly incomplete) run are carried into the next
    batch; the carry is flushed at end-of-partition.

    Arrow in / Arrow out (no pandas Series materialization): each batch
    is two zero-copy int64 views and each output is one RecordBatch
    built straight from the NumPy pair arrays — the per-batch Python
    cost is the NumPy kernel alone.

    Three output modes:
    - plain (both extras None): the wedge stream (a, b, c) for the
      downstream close join;
    - bloom only: wedges surviving the fused close-key Bloom
      pre-filter (non-closing wedges die before the Arrow hand-back);
    - ``edge_set_name`` set (IN-KERNEL EXACT CLOSE): wedges are probed
      against the mmap'd oriented edge set (behind the Bloom when one
      is given) and the kernel emits finished id-canonical TRIANGLES —
      or, with ``count_only``, one partial-count row per input
      partition. No wedge ever leaves the kernel: the downstream
      exchange + close join (round 3's N->4N bandwidth whale at
      0.39-0.49 efficiency) ceases to exist.
    - ``emit_pairs``: the counting scale path's residual-close input.
      The anchor is dropped (a count never needs it) and the surviving
      (b, c) pairs are BUFFERED per partition and emitted ONCE at
      end-of-partition, PRE-AGGREGATED to (key, multiplicity) — wedges
      from different anchors in this partition that share a closing
      pair collapse to one shuffled row (round-5 map-side combine; the
      buffer is ~16 B/survivor, ~T/P rows — MBs per task at any scale).
      With ``pack_pairs`` (caller guarantees ids < 2^31) the key is the
      single int64 ``(b << 32) | c`` — half the exchanged key bytes and
      a one-word join key; past 2^31 ids it falls back to (b, c, m).
    """
    import pyarrow as pa

    edge_set = _load_edge_set(edge_set_name) if edge_set_name else None
    need_a = not (count_only or emit_pairs)
    pair_b: list[np.ndarray] = []
    pair_c: list[np.ndarray] = []

    def np_col(batch: "pa.RecordBatch", name: str) -> np.ndarray:
        return batch.column(name).to_numpy(zero_copy_only=False)

    total = 0

    def out(lo: np.ndarray, hi: np.ndarray):
        nonlocal total
        a, b, c = _run_pairs(lo, hi, need_a=need_a)
        if b.size and bloom_value is not None:
            mask = _bloom_mask(bloom_value, b, c)
            b, c = b[mask], c[mask]
            if need_a:
                a = a[mask]
        if edge_set is not None and b.size:
            mask = _exact_close_mask(edge_set, b, c)
            b, c = b[mask], c[mask]
            if need_a:
                a = a[mask]
        if count_only:
            total += int(b.size)
            return None
        if emit_pairs:
            if not agg_pairs:  # A/B harness: round-4 raw pair stream
                return pa.RecordBatch.from_arrays(
                    [pa.array(b, type=pa.int64()), pa.array(c, type=pa.int64())],
                    names=["b", "c"],
                )
            if b.size:
                pair_b.append(b)
                pair_c.append(c)
            return None
        if edge_set is not None:
            # Finished triangles: canonicalize to a < b < c (the anchor
            # is the lowest-DEGREE vertex, not the lowest id).
            tri = np.sort(np.stack([a, b, c]), axis=0)
            a, b, c = tri[0], tri[1], tri[2]
        return pa.RecordBatch.from_arrays(
            [
                pa.array(a, type=pa.int64()),
                pa.array(b, type=pa.int64()),
                pa.array(c, type=pa.int64()),
            ],
            names=["a", "b", "c"],
        )

    carry_lo = carry_hi = None
    for batch in batches:
        lo = np_col(batch, "lo")
        hi = np_col(batch, "hi")
        if carry_lo is not None and carry_lo.size:
            lo = np.concatenate([carry_lo, lo])
            hi = np.concatenate([carry_hi, hi])
        if not lo.size:
            carry_lo = carry_hi = None
            continue
        cut = int(np.searchsorted(lo, lo[-1], side="left"))
        carry_lo, carry_hi = lo[cut:], hi[cut:]
        if cut:
            rb = out(lo[:cut], hi[:cut])
            if rb is not None:
                yield rb
    if carry_lo is not None and carry_lo.size:
        rb = out(carry_lo, carry_hi)
        if rb is not None:
            yield rb
    if count_only:
        yield pa.RecordBatch.from_arrays(
            [pa.array([total], type=pa.int64())], names=["n"]
        )
    if emit_pairs and agg_pairs:
        yield _agg_pairs_batch(pair_b, pair_c, pack_pairs)


def _wedges_csr(
    oriented: DataFrame,
    bloom_bc=None,
    edge_set_name: str | None = None,
    count_only: bool = False,
    emit_pairs: bool = False,
    pack_pairs: bool = False,
    agg_pairs: bool = True,
) -> DataFrame:
    csr = (
        oriented.select("lo", "hi", "hi_deg")
        # explicit count: see _wedges_sql on AQE byte-based coalescing
        .repartition(_explode_parts(oriented), "lo")
        .sortWithinPartitions("lo", "hi_deg", "hi")
    )
    def kernel(batches):
        # blocked-bloom state is a tiny (tag, file, n_words) tuple —
        # safe to close over; the bitmap itself is mmap'd per worker.
        return _csr_batch_iter(
            batches,
            bloom_value=bloom_bc,
            edge_set_name=edge_set_name,
            count_only=count_only,
            emit_pairs=emit_pairs,
            pack_pairs=pack_pairs,
            agg_pairs=agg_pairs,
        )

    if count_only:
        schema = "n long"
    elif emit_pairs and not agg_pairs:
        schema = "b long, c long"
    elif emit_pairs:
        schema = "k long, m long" if pack_pairs else "b long, c long, m long"
    else:
        schema = _WEDGE_SCHEMA
    return csr.mapInArrow(kernel, schema=schema)


_WEDGE_KERNELS = {"sql": _wedges_sql, "join": _wedges_join, "csr": _wedges_csr}


def triangles(
    edges: DataFrame,
    strategy: str = "join",
    bloom_fpp: float | None = _BLOOM_FPP,
    kernel_close: bool | None = None,
) -> DataFrame:
    """Enumerate all triangles of the canonical undirected edge table.

    Returns (a, b, c) with a < b < c, one row per triangle, exactly.

    For "csr" the close is IN-KERNEL by default (``kernel_close``,
    auto below _KERNEL_CLOSE_EDGE_LIMIT): wedges probe the mmap'd exact
    edge set inside the NumPy kernel and finished triangles come out —
    no wedge exchange, no close join. For "join"/"sql" (and "csr" past
    the limit or with ``kernel_close=False``), past
    _BROADCAST_EDGE_LIMIT edges a Bloom filter of the closing keys
    pre-filters the wedge stream before its exchange (see _BLOOM_FPP);
    fused into the NumPy kernel for "csr", a pipelined Arrow stage for
    "join"/"sql". ``bloom_fpp=None`` disables it (A/B harness).
    """
    # One materialization: both the wedge kernel and the close join read
    # the oriented table; without it the degree aggregation + two degree
    # joins run twice. The count is ~free on the checkpointed data and
    # drives the close-join broadcast decision.
    oriented = _oriented(edges).localCheckpoint(eager=True)
    n_edges = oriented.count()
    bloom_bc = None
    if bloom_fpp is not None and n_edges > _BROADCAST_EDGE_LIMIT:
        bloom_bc = _close_filter_state(oriented, n_edges, bloom_fpp)
    if strategy == "csr":
        if kernel_close is None:
            kernel_close = n_edges <= _kernel_close_limit(edges.sparkSession)
        if kernel_close:
            return _wedges_csr(
                oriented, bloom_bc, edge_set_name=_edge_set_file(oriented)
            )
        wedges = _wedges_csr(oriented, bloom_bc)
    else:
        if strategy == "join":
            wedges = _wedges_join(oriented, n_edges)
        else:
            wedges = _WEDGE_KERNELS[strategy](oriented)
        if bloom_bc is not None:
            wedges = wedges.mapInArrow(_bloom_probe(bloom_bc), _WEDGE_SCHEMA)
    return _close_wedges(wedges, oriented, n_edges)


def triangle_count(edges: DataFrame, strategy: str = "kernel") -> int:
    """Exact triangle count.

    Default "kernel" (round 4), two regimes:

    - <= _BROADCAST_EDGE_LIMIT: the csr wedge kernel probes the mmap'd
      exact edge set and emits ONE partial-count row per partition —
      no wedge row is ever materialized outside a NumPy register file,
      no exchange, no close join; the only shuffle is the P-row count
      aggregate. (The edge-set build is a serial driver pass, fine at
      this size.)
    - past it: the SCALE path. The serial edge-set build would become
      the Amdahl floor (measured: flat ~40 s at 37M edges, collapsing
      the 1 -> 4 executor efficiency to ~0.2 even as absolute walls
      improved), so instead the kernel fuses the Bloom close-key
      pre-filter and emits only the surviving closing pairs — the
      anchor column is dropped, counting never needs it — PRE-
      AGGREGATED per partition to (pair, wedge multiplicity) and (when
      ids < 2^31, checked) PACKED into one int64 key, halving the
      exchanged key bytes; one bounded shuffled-hash join against the
      identically-keyed oriented edge set removes the Bloom false
      positives and sum(m) over the matches is the exact count. Every
      stage fans out; since round 5 even the Bloom partial merge runs
      executor-side (bloom.build_blocked_bloom), so no serial driver
      term remains.
    """
    if strategy != "kernel":
        return triangles(edges, strategy).count()
    oriented = _oriented(edges).localCheckpoint(eager=True)
    n_edges = oriented.count()
    if n_edges <= _BROADCAST_EDGE_LIMIT:
        partials = _wedges_csr(
            oriented, None, edge_set_name=_edge_set_file(oriented), count_only=True
        )
        row = partials.agg(F.coalesce(F.sum("n"), F.lit(0)).alias("n")).collect()[0]
        return int(row["n"])
    bloom_bc = _close_filter_state(oriented, n_edges, _BLOOM_FPP)
    import os as _os

    if _os.environ.get("LINKGRAPH_TRI_PREAGG", "1") == "0":
        # A/B harness: the round-4 shape — raw un-aggregated (b, c)
        # pair stream into the residual join, counted by rows.
        pairs = _wedges_csr(oriented, bloom_bc, emit_pairs=True, agg_pairs=False)
        closing = oriented.select(F.col("lo").alias("b"), F.col("hi").alias("c"))
        if _shj_safe(oriented.sparkSession, n_edges):
            closing = closing.hint("shuffle_hash")
        else:
            parts = _shj_parts(oriented.sparkSession, n_edges)
            closing = closing.repartition(parts, "b", "c").hint("shuffle_hash")
        return pairs.join(closing, ["b", "c"]).count()
    # Packed single-int64 join key iff every id fits 31 bits (exact —
    # (b << 32) | c is injective there). The max() is ~free on the
    # checkpointed table.
    max_id = oriented.agg(
        F.greatest(F.max("lo"), F.max("hi")).alias("mx")
    ).first()["mx"]
    pack = max_id is not None and int(max_id) < (1 << 31)
    pairs = _wedges_csr(oriented, bloom_bc, emit_pairs=True, pack_pairs=pack)
    if pack:
        # hi < 2^31 makes | equivalent to +; Catalyst has no int OR on
        # longs cheaper than this shiftleft + add.
        key_cols = ["k"]
        closing = oriented.select(
            (F.shiftleft(F.col("lo"), 32) + F.col("hi")).alias("k")
        )
    else:
        key_cols = ["b", "c"]
        closing = oriented.select(F.col("lo").alias("b"), F.col("hi").alias("c"))
    if _shj_safe(oriented.sparkSession, n_edges):
        closing = closing.hint("shuffle_hash")
    else:
        parts = _shj_parts(oriented.sparkSession, n_edges)
        closing = closing.repartition(parts, *key_cols).hint("shuffle_hash")
    row = (
        pairs.join(closing, key_cols)
        .agg(F.coalesce(F.sum("m"), F.lit(0)).alias("n"))
        .first()
    )
    return int(row["n"])


def vertex_triangle_count(tri: DataFrame) -> DataFrame:
    """Triangles incident to each vertex: (id, n_triangles).

    Explode each (a, b, c) triangle into its three vertices, then hash
    aggregate — partial (map-side) combine keeps the shuffle at one row
    per (vertex, partition), so the shuffle volume is O(V * P), not
    O(3 * triangles). Vertices in no triangle are absent (join with
    degrees to densify; ``clustering_coefficient`` does).
    """
    return (
        tri.select(F.explode(F.array("a", "b", "c")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def clustering_coefficient(edges: DataFrame, strategy: str = "join") -> DataFrame:
    """Local clustering coefficient per vertex: (id, degree, n_triangles, lcc).

    lcc = 2 * triangles(v) / (deg(v) * (deg(v) - 1)); vertices with
    degree < 2 get 0.0. Built on the exact triangle kernel, so the cost
    profile (degree-ordered wedges, O(sqrt(2m)) bound per vertex) is
    identical to ``triangles`` plus one broadcast-friendly aggregation.
    """
    tri_per_v = vertex_triangle_count(triangles(edges, strategy))
    deg = E.degrees(edges)
    joined = deg.join(tri_per_v, "id", "left_outer").select(
        "id",
        "degree",
        F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
    )
    return joined.withColumn(
        "lcc",
        F.when(
            F.col("degree") >= 2,
            2.0 * F.col("n_triangles") / (F.col("degree") * (F.col("degree") - 1)),
        ).otherwise(F.lit(0.0)),
    )


def transitivity(edges: DataFrame, strategy: str = "join") -> DataFrame:
    """Global clustering coefficient, one row:
    (n_triangles, n_wedges, transitivity = 3 * triangles / wedges).

    n_wedges counts unordered connected vertex triples centred anywhere:
    sum over v of C(deg(v), 2) — one degree aggregation plus a scalar
    fold, so the cost beyond the triangle kernel is negligible.
    """
    n_tri = triangle_count(edges, strategy)
    deg = E.degrees(edges)
    wedges = deg.agg(
        F.coalesce(
            F.sum(F.col("degree") * (F.col("degree") - 1) / 2), F.lit(0.0)
        ).alias("n_wedges")
    ).collect()[0]["n_wedges"]
    spark = edges.sparkSession
    t = 3.0 * n_tri / wedges if wedges else 0.0
    return spark.createDataFrame(
        [(int(n_tri), int(wedges), float(t))],
        "n_triangles long, n_wedges long, transitivity double",
    )


def edge_support(tri: DataFrame) -> DataFrame:
    """Per-edge triangle count (support): (src, dst, support).

    The peel loop's support recount (Truss.scala:128-134) — explode each
    triangle into its three canonical edges, hash-aggregate.
    """
    tri_edges = tri.select(
        F.explode(
            F.array(
                F.struct(F.col("a").alias("src"), F.col("b").alias("dst")),
                F.struct(F.col("a").alias("src"), F.col("c").alias("dst")),
                F.struct(F.col("b").alias("src"), F.col("c").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    return tri_edges.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("support"))


def delta_triangles(old_edges: DataFrame, delta_edges: DataFrame) -> DataFrame:
    """Triangles CREATED by an edge delta — incremental triangle
    maintenance (edge additions).

    A new triangle must contain at least one delta edge, so it is
    discoverable from the delta alone: for each delta edge, wedge
    through its lower-degree endpoint's neighbors in the UNION graph,
    close with a semi-join against the union edge set, then dedupe the
    sorted triple (a triangle with k new edges is generated k times —
    `distinct` replaces any inclusion-exclusion bookkeeping). Cost is
    O(sum of delta-endpoint degrees) wedges plus one semi-join — the
    old graph is scanned once for adjacency/degrees of the touched
    endpoints, never re-enumerated; at 10^9 edges with a 10^6-edge
    nightly delta, this is the difference between a full O(sum deg^2)
    recount and a bounded incremental job.

    Reference analogue: none (the reference recounts from scratch each
    run); composes with `triangles` as
    new_total = old_total + delta_triangles(...).count().

    Returns (a, b, c) with a < b < c, new triangles only.
    """
    from pyspark.storagelevel import StorageLevel

    old = old_edges.select("src", "dst")
    # Delta edges not already present contribute novelty; dedupe both
    # within the delta and against the old set.
    delta = (
        delta_edges.select("src", "dst").distinct().join(old, ["src", "dst"], "left_anti")
    )
    # union feeds two consumers (adjacency, close) and adj feeds two
    # (degrees, wedges): persist both so the old-graph derivation runs
    # once, and eagerly materialize the (bounded) result at the end so
    # the caches can be dropped before returning.
    union = old.unionByName(delta).persist(StorageLevel.MEMORY_AND_DISK)
    bidir = union.unionByName(
        union.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    ends = (
        delta.select(F.col("src").alias("id"))
        .unionByName(delta.select(F.col("dst").alias("id")))
        .distinct()
    )
    # Adjacency + degrees restricted to delta endpoints (broadcast
    # semi-join: ends is bounded by 2|delta|, so the endpoint filter
    # streams the union scan with no shuffle).
    adj = bidir.join(
        F.broadcast(ends), bidir["src"] == ends["id"], "left_semi"
    ).persist(StorageLevel.MEMORY_AND_DISK)
    deg = adj.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    d1 = deg.select(F.col("src").alias("_u"), F.col("deg").alias("_du"))
    d2 = deg.select(F.col("src").alias("_v"), F.col("deg").alias("_dv"))
    oriented = (
        delta.join(d1, delta["src"] == d1["_u"])
        .join(d2, delta["dst"] == d2["_v"])
        .select(
            F.when(
                F.struct(F.col("_du"), F.col("src"))
                <= F.struct(F.col("_dv"), F.col("dst")),
                F.struct(
                    F.col("src").alias("lo"), F.col("dst").alias("hi")
                ),
            )
            .otherwise(
                F.struct(F.col("dst").alias("lo"), F.col("src").alias("hi"))
            )
            .alias("e")
        )
        .select("e.lo", "e.hi")
    )
    wedges = (
        oriented.join(adj, oriented["lo"] == adj["src"])
        .select(
            F.col("lo").alias("a"),
            F.least("hi", "dst").alias("b"),
            F.greatest("hi", "dst").alias("c"),
        )
        .where(F.col("b") != F.col("c"))
    )
    # For the target regime (delta ≪ graph) the wedge table — bounded
    # by Σ deg over delta endpoints — is the SMALL side, so broadcast
    # the wedges and stream the union: the close then costs one scan of
    # the edge table with no O(|E|) shuffle or broadcast. Past the
    # limit (huge delta), fall back to the shared tuned close above.
    wedges = wedges.persist(StorageLevel.MEMORY_AND_DISK)
    n_wedges = wedges.count()
    if n_wedges <= _BROADCAST_EDGE_LIMIT // 4:
        closing = union.select(F.col("src").alias("b"), F.col("dst").alias("c"))
        tri = (
            closing.join(F.broadcast(wedges), ["b", "c"])
            .select(F.array_sort(F.array("a", "b", "c")).alias("t"))
            .select(
                F.col("t")[0].alias("a"),
                F.col("t")[1].alias("b"),
                F.col("t")[2].alias("c"),
            )
        )
    else:
        tri = _close_wedges(
            wedges,
            union.select(F.col("src").alias("lo"), F.col("dst").alias("hi")),
            n_edges=union.count(),
        )
    out = tri.distinct().localCheckpoint(eager=True)
    wedges.unpersist()
    union.unpersist()
    adj.unpersist()
    return out
