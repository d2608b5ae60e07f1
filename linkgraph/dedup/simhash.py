"""SimHash near-duplicate detection (Charikar 2002 / Manku et al. 2007).

64-bit simhash per document: each token contributes ±1 per bit position
of its 64-bit hash; the signature's bit b is 1 iff the summed weight is
positive. Near-duplicates = pairs within `max_hamming` bits, found with
the Manku chunk trick: split the 64-bit signature into (max_hamming+1)
chunks — any pair within distance d must agree exactly on at least one
chunk (pigeonhole), so exact-match bucketing on chunks has full recall.

Implementation split:
- token hashing: JVM-side (`transform` + xxhash64 into array<long>).
- bit-vote accumulation: a **vectorized pandas UDF** over the hash
  arrays — np.unpackbits over each batch's concatenated hashes, one
  Python call per Arrow batch (the sum-of-sign-bits per bit position is
  a genuinely poor fit for Catalyst expressions: 64 conditional sums).
- bucketing + hamming verify: JVM-side (explode chunks, groupBy, pair
  expansion, bit_count(xor) <= d).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

_PAIR_EXPR = (
    "flatten(transform(ids, (x, i) -> "
    "transform(slice(ids, i + 2, size(ids)), y -> struct(x as id_a, y as id_b))))"
)


# DataType object (not DDL string): decoration at import time must not
# require an active SparkSession.
@pandas_udf(LongType())
def _simhash_from_hashes(hashes: pd.Series) -> pd.Series:
    """array<long> token hashes -> 64-bit simhash, vectorized per batch.

    Flattens the batch's ragged hash arrays into one uint64 vector,
    unpacks to a (total_tokens, 64) bit matrix, converts to ±1 votes,
    and reduces per document with np.add.reduceat — zero Python loops
    over rows or tokens.
    """
    lengths = hashes.str.len().to_numpy(np.int64)
    out = np.zeros(len(hashes), dtype=np.int64)
    nonzero = lengths > 0
    if nonzero.any():
        flat = np.concatenate(
            [np.asarray(h, dtype=np.int64) for h in hashes[nonzero]]
        ).view(np.uint64)
        bits = np.unpackbits(flat.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
        votes = bits.astype(np.int32) * 2 - 1  # 0/1 -> -1/+1
        starts = np.r_[0, np.cumsum(lengths[nonzero])[:-1]]
        sums = np.add.reduceat(votes, starts, axis=0)
        sig_bits = (sums > 0).astype(np.uint8)
        sigs = np.packbits(sig_bits, axis=1, bitorder="little").copy().view(np.uint64)[:, 0]
        out[nonzero] = sigs.astype(np.int64)
    return pd.Series(out)


def simhash_signatures(
    df: DataFrame, col: str = "text", id_col: str = "doc_id", portable: bool = False
) -> DataFrame:
    """(id, simhash: long) per document.

    ``portable=True`` hashes tokens with the cross-engine 62-bit
    polynomial family (phash.token_hash62) instead of xxhash64, so a
    DuckDB oracle reproduces the exact signature: token-hash bits
    61..63 are then zero in both engines, those signature bits vote
    uniformly negative, and the vote kernel is unchanged.
    """
    from linkgraph.dedup import phash

    words = F.split(F.trim(F.lower(F.col(col))), r"\s+")
    token_hash = phash.token_hash62 if portable else F.xxhash64
    token_hashes = F.transform(words, lambda w: token_hash(w))
    hashed = df.select(F.col(id_col).alias("id"), token_hashes.alias("th"))
    if portable:
        # Barrier between the HOF-heavy portable hash and the pandas
        # UDF: with a Union below the projection, Catalyst pushes the
        # combined expression into both branches and ExtractPythonUDFs
        # then leaves the UDF inside an interpreted projection, which
        # cannot evaluate it (Spark 4.1 internal error). Cutting the
        # lineage gives the UDF a plain scan child. Portable mode only
        # — the xxhash64 scale path keeps its single-pass plan.
        hashed = hashed.localCheckpoint(eager=False)
    return hashed.select("id", _simhash_from_hashes(F.col("th")).alias("simhash"))


def simhash_near_duplicates(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket: int = 1024,
    portable: bool = False,
) -> DataFrame:
    """(id_a, id_b, hamming) pairs within max_hamming bits."""
    n_chunks = max_hamming + 1
    width = 64 // n_chunks
    # Materialize once (cf. minhash): the signature table feeds three
    # consumers (chunk explode + both sides of the verify join), so the
    # token hashing + vote kernel would otherwise run three times. Also
    # required for plan correctness with the portable hash family: the
    # HOF-heavy token-hash expression defeats ExtractPythonUDFs for one
    # of the downstream consumers, leaving the pandas UDF inside an
    # interpreted projection (unevaluable).
    sigs = simhash_signatures(df, col, id_col, portable).localCheckpoint(eager=True)
    chunks = sigs.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("c"),
                        F.shiftrightunsigned("simhash", c * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("v"),
                    )
                    for c in range(n_chunks)
                ]
            )
        ).alias("chunk"),
    )
    buckets = (
        chunks.groupBy("chunk.c", "chunk.v")
        .agg(F.slice(F.sort_array(F.collect_set("id")), 1, max_bucket).alias("ids"))
        .where(F.size("ids") > 1)
    )
    cands = (
        buckets.select(F.explode(F.expr(_PAIR_EXPR)).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )
    a = sigs.select(F.col("id").alias("id_a"), F.col("simhash").alias("sig_a"))
    b = sigs.select(F.col("id").alias("id_b"), F.col("simhash").alias("sig_b"))
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", hamming.cast("int").alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
    )
