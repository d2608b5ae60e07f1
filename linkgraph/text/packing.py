"""Sequence packing for LLM pretraining batches.

Two packing disciplines over a tokenized corpus:

- ``pack_chunks`` — GPT-style concat-and-chunk: documents are laid out
  end-to-end in a deterministic global order and the stream is cut
  every ``seq_len`` tokens; documents may span chunk boundaries, no
  token is wasted. Chunk ids are a pure function of the global
  exclusive prefix sum of token counts, so the whole operator reduces
  to ``with_global_offset`` + integer arithmetic — exact, and
  value-checkable against a window-cumsum SQL oracle.
- ``pack_greedy`` — document-boundary next-fit: docs never split; in
  id order, a doc goes into the current pack unless it would overflow
  ``seq_len``, which starts a new pack. The running remainder makes
  this inherently sequential, so the scale contract is per-partition:
  each range partition packs independently (pack ids are globally
  unique via the partition index) and the only cost of partitioning is
  at most one partially-filled pack per partition seam — negligible at
  100 TB where a partition holds millions of documents.

Downstream of packing, **sharded training-batch export**
(``pack_greedy_fixed`` -> ``shard_packs`` -> ``write_shards``): packs
get a deterministic avalanche-hash shard, and each shard is written as
one sorted parquet directory with a (shard -> pack/doc/token count)
manifest — the layout a training loader streams. The ``_fixed``
packer derives parts from fixed id ranges so the whole export is a
pure function of the data (oracle-replayable), not of the cluster.

The global prefix sum is the interesting distributed piece. A naive
``Window.orderBy(id)`` with no partition key collapses the corpus into
ONE task; instead ``with_global_offset`` runs the classic two-phase
scan: range-partition by the order key, take per-partition sums (a
P-row aggregate, P = #partitions), prefix-sum those P rows on the
driver (bounded, like kmeans centroids), and stream each partition
once through an Arrow kernel that adds its partition base plus a
running within-partition cumsum. One shuffle (the range exchange),
one bounded collect, no global sort task.

Determinism: the range exchange is pinned by persisting the
repartitioned frame before the two dependent actions, so both see the
identical partition layout; all arithmetic is int64.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from linkgraph.text.analysis import token_stats

_PID = "__pack_pid"


def _cumsum_kernel(value_col: str, offsets: dict[int, int], out_col: str):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        run = None
        for pdf in batches:
            if not len(pdf):
                continue
            if run is None:
                run = int(offsets[int(pdf[_PID].iloc[0])])
            vals = pdf[value_col].to_numpy()
            cum = vals.cumsum()
            out = pdf.drop(columns=[_PID]).copy()
            out[out_col] = run + cum - vals  # exclusive prefix
            run += int(cum[-1])
            yield out

    return gen


def with_global_offset(
    df: DataFrame,
    order_col: str | list[str],
    value_col: str,
    out_col: str = "offset",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append ``out_col`` = exclusive prefix sum of ``value_col`` over
    the global ``order_col`` order (a column name or a list for
    composite lexicographic order), without a single-task global sort.

    Two-phase scan: range exchange on the order key, P-row partial-sum
    aggregate -> driver prefix (bounded by #partitions), then one
    Arrow pass per partition carrying the running sum across batches.
    """
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    spark = df.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    part = (
        df.repartitionByRange(p, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn(_PID, F.spark_partition_id())
        .persist()
    )
    try:
        sums = {
            r["p"]: r["s"]
            for r in part.groupBy(F.col(_PID).alias("p"))
            .agg(F.sum(F.col(value_col).cast("long")).alias("s"))
            .collect()
        }
        offsets, acc = {}, 0
        for pid in sorted(sums):
            offsets[pid] = acc
            acc += int(sums[pid])
        fields = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}"
            for f in part.schema.fields
            if f.name != _PID
        )
        out = part.mapInPandas(
            _cumsum_kernel(value_col, offsets, out_col),
            schema=f"{fields}, {out_col} long",
        )
        # Materialize before unpersist so the kernel reads the pinned
        # partition layout, not a re-sampled range exchange.
        out = out.localCheckpoint(eager=True)
    finally:
        part.unpersist()
    return out


def pack_chunks(
    docs: DataFrame,
    seq_len: int,
    order_col: str = "doc_id",
    tokens_col: str | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-chunk packing: one row per document with its token
    span in the concatenated stream and the chunk range it covers.

    Columns: (order_col, n_tokens, begin_off, chunk_first, chunk_last,
    n_chunks_spanned). Empty documents contribute no tokens: they sit
    at their stream offset with chunk_first = chunk_last = the chunk
    the offset falls in (min handles the exact-boundary case) and span
    0 chunks.
    """
    if tokens_col is None:
        docs = token_stats(docs, col=text_col).withColumnRenamed(
            "n_tokens_ws", "n_tokens"
        )
        tokens_col = "n_tokens"
    d = docs.select(order_col, F.col(tokens_col).cast("long").alias("n_tokens"))
    d = with_global_offset(d, order_col, "n_tokens", out_col="begin_off")
    end_incl = F.col("begin_off") + F.greatest(F.col("n_tokens"), F.lit(1)) - 1
    return d.select(
        order_col,
        "n_tokens",
        "begin_off",
        F.floor(F.col("begin_off") / seq_len).cast("long").alias("chunk_first"),
        F.floor(end_incl / seq_len).cast("long").alias("chunk_last"),
        F.when(F.col("n_tokens") == 0, F.lit(0)).otherwise(
            F.floor(end_incl / seq_len) - F.floor(F.col("begin_off") / seq_len) + 1
        ).cast("long").alias("n_chunks_spanned"),
    )


def _greedy_kernel(seq_len: int):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pack_idx, used = 0, 0
        for pdf in batches:
            if not len(pdf):
                continue
            pid = int(pdf[_PID].iloc[0])
            packs, begins = [], []
            for n in pdf["n_tokens"].to_numpy():
                n = min(int(n), seq_len)  # oversize docs truncate to one pack
                if used + n > seq_len and used > 0:
                    pack_idx, used = pack_idx + 1, 0
                packs.append(pack_idx)
                begins.append(used)
                used += n
            out = pdf.drop(columns=[_PID]).copy()
            out["part"] = pid
            out["pack_in_part"] = packs
            out["begin_in_pack"] = begins
            yield out

    return gen


def pack_greedy(
    docs: DataFrame,
    seq_len: int,
    order_col: str = "doc_id",
    tokens_col: str | None = None,
    text_col: str = "text",
    num_partitions: int | None = None,
) -> DataFrame:
    """Document-boundary next-fit packing, per range partition.

    Columns: (order_col, n_tokens, part, pack_in_part, begin_in_pack).
    Global pack identity is (part, pack_in_part) — partitions pack
    independently (the 100 TB contract: sequential next-fit state never
    crosses an executor), so seams cost at most one underfilled pack
    per partition. Docs longer than seq_len occupy one full pack
    (truncation is the caller's policy; the packer never splits).
    """
    if tokens_col is None:
        docs = token_stats(docs, col=text_col).withColumnRenamed(
            "n_tokens_ws", "n_tokens"
        )
        tokens_col = "n_tokens"
    spark = docs.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    d = docs.select(order_col, F.col(tokens_col).cast("long").alias("n_tokens"))
    part = (
        d.repartitionByRange(p, F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn(_PID, F.spark_partition_id())
    )
    return part.mapInPandas(
        _greedy_kernel(seq_len),
        schema=f"`{order_col}` long, n_tokens long, part int, "
        "pack_in_part long, begin_in_pack long",
    )


def _greedy_kernel_by_part(seq_len: int):
    """Next-fit state keyed on the `part` COLUMN (reset at each part
    boundary) rather than the physical partition id — parts never split
    across Spark partitions (hash exchange on part) and arrive sorted,
    so the result is a pure function of the data, independent of the
    physical partition count."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cur_part, pack_idx, used = None, 0, 0
        for pdf in batches:
            if not len(pdf):
                continue
            packs, begins = [], []
            for part, n in zip(
                pdf["part"].to_numpy(), pdf["n_tokens"].to_numpy()
            ):
                if part != cur_part:
                    cur_part, pack_idx, used = part, 0, 0
                n = min(int(n), seq_len)  # oversize docs truncate
                if used + n > seq_len and used > 0:
                    pack_idx, used = pack_idx + 1, 0
                packs.append(pack_idx)
                begins.append(used)
                used += n
            out = pdf.copy()
            out["pack_in_part"] = packs
            out["begin_in_pack"] = begins
            yield out

    return gen


def pack_greedy_fixed(
    docs: DataFrame,
    seq_len: int,
    n_parts: int,
    order_col: str = "doc_id",
    tokens_col: str | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Deterministic ``pack_greedy``: parts are FIXED order-key ranges
    (width = ceil(id span / n_parts)) instead of a sampled range
    exchange, so pack identity (part, pack_in_part) is a pure function
    of the data — stable across runs, parallelism levels, and engines.
    This is the variant the shard-export oracle replays; the trade is
    that sparse/skewed id domains give uneven parts (the sampled
    ``pack_greedy`` balances rows instead).

    Columns: (order_col, n_tokens, part, pack_in_part, begin_in_pack).
    """
    if tokens_col is None:
        docs = token_stats(docs, col=text_col).withColumnRenamed(
            "n_tokens_ws", "n_tokens"
        )
        tokens_col = "n_tokens"
    d = docs.select(order_col, F.col(tokens_col).cast("long").alias("n_tokens"))
    lo, hi = d.agg(
        F.min(order_col).alias("lo"), F.max(order_col).alias("hi")
    ).collect()[0]
    if lo is None:
        width = 1
    else:
        width = max(1, (int(hi) - int(lo) + 1 + int(n_parts) - 1) // int(n_parts))
    # integer DIV, not double division: exact at any id magnitude and
    # bit-identical to the oracle's `//`
    d = d.withColumn(
        "part",
        F.expr(f"CAST((`{order_col}` - {int(lo or 0)}) DIV {width} AS INT)"),
    )
    placed = (
        d.repartition(int(n_parts), "part")
        .sortWithinPartitions("part", order_col)
        .mapInPandas(
            _greedy_kernel_by_part(seq_len),
            schema=f"`{order_col}` long, n_tokens long, part int, "
            "pack_in_part long, begin_in_pack long",
        )
    )
    return placed


# Shard hash constants: the quadratic-scramble family shared with the
# DOULION coin / portable sampling buckets — exact int64 arithmetic
# (every intermediate < P1^2 ~ 1.0e18 < 2^63), so a SQL oracle
# reproduces the assignment bit-for-bit.
_SHARD_MULT = 1_000_003


def shard_packs(packed: DataFrame, n_shards: int, seed: int = 0) -> DataFrame:
    """Deterministic shard assignment for training-batch export.

    shard = avalanche(part, pack_in_part) % n_shards, where avalanche
    is two square-and-add rounds mod P1 over the combined pack key —
    packs (and every doc row inside a pack, which must land whole) are
    spread near-uniformly and REPRODUCIBLY across shards.
    """
    from linkgraph.dedup.phash import P1

    a = (2_654_435_761 * (int(seed) + 1)) % P1 or 1
    h0 = F.pmod(
        F.pmod(F.col("part").cast("long"), F.lit(P1)) * _SHARD_MULT
        + F.pmod(F.col("pack_in_part"), F.lit(P1))
        + F.lit(a),
        F.lit(P1),
    )
    h1 = F.pmod(h0 * h0 + F.lit(a), F.lit(P1))
    h2 = F.pmod(h1 * h1 + F.lit(a), F.lit(P1))
    return packed.withColumn(
        "shard", F.pmod(h2, F.lit(int(n_shards))).cast("int")
    )


def shard_manifest(sharded: DataFrame, seq_len: int) -> DataFrame:
    """(shard, n_packs, n_docs, n_tokens) — the export manifest."""
    return (
        sharded.groupBy("shard")
        .agg(
            F.count_distinct(F.col("part"), F.col("pack_in_part")).alias("n_packs"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.least(F.col("n_tokens"), F.lit(seq_len))).alias("n_tokens"),
        )
        .orderBy("shard")
    )


def write_shards(sharded: DataFrame, path: str, seq_len: int) -> DataFrame:
    """Per-shard sorted parquet + manifest.

    One hash exchange on shard, rows sorted (part, pack_in_part,
    begin_in_pack) within each shard file so a training loader streams
    packs contiguously; `partitionBy` gives one directory per shard
    (the layout a 1000-file export at 100 TB needs — shard count
    decouples from cluster parallelism). Returns the manifest (also
    written under <path>/manifest).
    """
    (
        sharded.repartition("shard")
        .sortWithinPartitions("shard", "part", "pack_in_part", "begin_in_pack")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(f"{path}/packs")
    )
    manifest = shard_manifest(sharded, seq_len)
    manifest.write.mode("overwrite").parquet(f"{path}/manifest")
    return manifest


def packing_stats(packed: DataFrame, seq_len: int) -> DataFrame:
    """One row of fill metrics for a ``pack_greedy`` result: packs,
    docs, tokens (post-truncation), and mean fill ratio."""
    per_pack = packed.groupBy("part", "pack_in_part").agg(
        F.sum(F.least(F.col("n_tokens"), F.lit(seq_len))).alias("fill"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    return per_pack.agg(
        F.count(F.lit(1)).alias("n_packs"),
        F.sum("n_docs").alias("n_docs"),
        F.sum("fill").alias("n_tokens"),
        F.round(F.avg(F.col("fill") / seq_len), 6).alias("mean_fill"),
    )
