"""Count-Min frequency sketch over corpus tokens.

Not in the reference (no text layer); semantics are the published
sketch (Cormode & Muthukrishnan, "An improved data stream summary:
the count-min sketch and its applications", J. Algorithms 2005): a
depth x width counter matrix where every token increments one counter
per row (row r uses an independent hash), and the estimate of a
token's frequency is the MIN over its depth counters — always an
OVERestimate, within eps*N with probability 1-delta for
width = ceil(e/eps), depth = ceil(ln 1/delta).

Why a sketch when an exact term aggregate exists (text/stats.py): the
exact aggregate shuffles and holds O(vocab) keys; the sketch's state
is depth*width counters TOTAL, independent of vocabulary size — the
bounded-memory path for trillion-token corpora and the mergeable
summary for streaming (counter matrices add element-wise).

Plan shape: one explode -> ONE hash aggregate keyed by (row, bucket)
— depth*width distinct keys, so the map-side partial aggregation
collapses virtually all traffic before the shuffle; the reduce side
moves at most depth*width rows regardless of corpus size. Estimation
joins query tokens to the sketch on (row, bucket) and takes min over
depth rows. Zero UDFs: the row hashes are the portable congruence
family of dedup/phash.py, so the whole sketch (and therefore every
estimate) is bit-identical in DuckDB — the driver oracle replays it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from linkgraph.dedup.phash import poly_hash, sig_hash


def _tokens(df: DataFrame, col: str) -> DataFrame:
    """Whitespace tokens, lowercased — the text/stats.py tokenizer."""
    words = F.split(F.trim(F.lower(F.col(col))), r"\s+")
    return df.where(F.length(F.trim(F.col(col))) > 0).select(
        F.explode(words).alias("term")
    )


def _bucket(term: Column, row: int, width: int) -> Column:
    return sig_hash(poly_hash(term), row) % F.lit(width)


def cm_sketch(
    df: DataFrame, col: str = "text", depth: int = 4, width: int = 256
) -> DataFrame:
    """Build the sketch: (row, bucket, cnt), depth*width rows max.

    Rows absent from the output are zero counters (sparse encoding);
    `cm_estimate` left-joins and coalesces to 0 accordingly.
    """
    # Single corpus pass: each token emits its depth (row, bucket)
    # entries via one explode — not depth unions of the token stream.
    toks = _tokens(df, col)
    entries = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("row"),
                    _bucket(F.col("term"), r, width).alias("bucket"),
                )
                for r in range(depth)
            ]
        )
    )
    return (
        toks.select(entries.alias("e"))
        .groupBy(F.col("e.row").alias("row"), F.col("e.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cm_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    term_col: str = "term",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Estimate each query term's corpus frequency from the sketch.

    Returns (term, cm_count). The sketch side is depth*width rows —
    broadcast; query terms never shuffle.
    """
    entries = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("row"),
                    _bucket(F.col(term_col), r, width).alias("bucket"),
                )
                for r in range(depth)
            ]
        )
    )
    probes = (
        queries.select(F.col(term_col), entries.alias("e"))
        .select(
            F.col(term_col).alias("term"),
            F.col("e.row").alias("row"),
            F.col("e.bucket").alias("bucket"),
        )
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left_outer")
        .groupBy("term")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cm_count"))
    )


def heavy_hitters(
    df: DataFrame,
    col: str = "text",
    top_n: int = 20,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Exact top-N terms with their Count-Min estimates side by side.

    Returns (rank, term, freq, cm_count); cm_count >= freq always
    (the sketch only overcounts). The exact aggregate is the audit
    path; at unbounded vocabulary the sketch alone (plus an external
    candidate stream) is the constant-memory path.
    """
    toks = _tokens(df, col)
    exact = toks.groupBy("term").agg(F.count(F.lit(1)).alias("freq"))
    top = exact.orderBy(F.desc("freq"), F.asc("term")).limit(top_n)
    sk = cm_sketch(df, col, depth, width)
    est = cm_estimate(sk, top, "term", depth, width)
    w = Window.orderBy(F.desc("freq"), F.asc("term"))
    return (
        top.join(est, "term")
        .select(
            F.row_number().over(w).cast("long").alias("rank"),
            "term",
            "freq",
            "cm_count",
        )
    )
