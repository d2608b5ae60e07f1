"""Deterministic distributed R-MAT graph generator.

Not in the reference (its graphs are read from disk —
``GraphMiningSpark.scala:61-76``); semantics are the published
recursive-matrix generator (Chakrabarti, Zhan & Faloutsos, "R-MAT: a
recursive model for graph mining", SDM 2004): each edge picks one of
four quadrants per recursion level with probabilities (a, b, c, d),
producing the power-law degree distributions of real web/social
graphs. The standard way to benchmark graph engines at ARBITRARY
scale with zero input data (Graph500 uses exactly this generator).

Determinism: the per-(edge, level) quadrant draw comes from the
portable congruence family (dedup/phash.py) instead of an RNG, so the
generated edge list is a pure function of (scale, n_edges, seed) —
identical across partitionings, engines (the driver oracle replays it
verbatim in DuckDB), and re-runs.

Plan shape: ``spark.range(n_edges)`` (already evenly partitioned,
zero shuffle, zero input) -> one projection that folds the `scale`
per-level bit choices into (src, dst) with F.aggregate over a
sequence — whole-stage codegen, no UDFs, no driver data. Generating
10^9 edges is embarrassingly parallel: every partition emits its
id-range independently; nothing shuffles until a downstream consumer
aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linkgraph.dedup.phash import P1, _SEED_A, _SEED_B

# Per-(edge,level) draw: u = mix(edge*levels + level + seed) / P1.
# Quadrant thresholds are compared against u in [0, 1).


def _draw(i, level, seed: int):
    # Two affine+square rounds (the hyperball._mix construction, one
    # extra round): a single square leaves consecutive levels on a
    # smooth quadratic curve and collapses the generated graph to ~10%
    # of its distinct edges; with two rounds the distinct-edge and
    # distinct-source counts match a true-RNG R-MAT within 0.2%
    # (measured at scale 14, 50k edges: 47818/47876 edges, 6719/6722
    # sources).
    x = (
        i * F.lit(1_000_003) + level * F.lit(7_368_787) + F.lit(seed)
    ) % F.lit(P1)
    x = (F.lit(_SEED_A) * x + F.lit(_SEED_B)) % F.lit(P1)
    x = (x * x + level + F.lit(1)) % F.lit(P1)
    x = (F.lit(_SEED_A) * x + F.lit(_SEED_B)) % F.lit(P1)
    x = (x * x + i) % F.lit(P1)
    return x.cast("double") / F.lit(float(P1))


def rmat_edges(
    spark: SparkSession,
    scale: int = 16,
    n_edges: int | None = None,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    seed: int = 42,
) -> DataFrame:
    """Generate an R-MAT edge list: (src, dst), 2^scale vertices.

    ``n_edges`` defaults to 16 * 2^scale (the Graph500 edge factor).
    Self-loops and parallel edges are emitted as drawn — the standard
    R-MAT contract; compose with edges.canonicalize for a simple
    graph. d = 1 - a - b - c.
    """
    if n_edges is None:
        n_edges = 16 * (1 << scale)
    base = spark.range(int(n_edges)).select(F.col("id").alias("i"))
    levels = F.sequence(F.lit(0), F.lit(scale - 1))
    # Fold (src, dst) bit-by-bit: quadrant q in [0,4) by cumulative
    # thresholds; src bit = q >= 2, dst bit = q odd.
    def step(acc, lvl):
        u = _draw(F.col("i"), lvl, seed)
        src_bit = (u >= F.lit(a + b)).cast("long")
        dst_bit = (
            ((u >= F.lit(a)) & (u < F.lit(a + b)))
            | (u >= F.lit(a + b + c))
        ).cast("long")
        return F.struct(
            (acc["src"] * 2 + src_bit).alias("src"),
            (acc["dst"] * 2 + dst_bit).alias("dst"),
        )

    folded = F.aggregate(
        levels,
        F.struct(F.lit(0).cast("long").alias("src"),
                 F.lit(0).cast("long").alias("dst")),
        step,
    )
    return base.select(folded.alias("e")).select("e.src", "e.dst")
