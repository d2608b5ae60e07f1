"""Topological layering (parallel build order) of a DAG, plus SCC
condensation to produce that DAG from an arbitrary digraph.

Not in the reference (scope was triangles/truss/CC); for the north-star
domain — dependency graphs over source-code repositories — this IS the
build scheduler's question: layer k holds every module whose longest
dependency chain has length k, so layer k can build once layers < k
are done, and the layer count is the critical-path length.

Semantics: layer(v) = 0 for vertices with no incoming edge; otherwise
1 + max(layer(u)) over incoming edges u -> v. Defined only on DAGs —
`condensation` contracts each strongly connected component to its SCC
label first (the classic construction), after which layering is total.

Plan shape per superstep (the same delta-workset regime as bfs.py):
the frontier (vertices whose layer ROSE last round) joins the
out-adjacency, a max-aggregate proposes new layers, and only strict
raises survive into the next frontier. Work per round is O(frontier
out-degree); rounds = critical-path length. A cycle reachable from a
source would raise layers forever, so the loop caps at `max_iter` and
reports converged=False — which doubles as reachable-cycle detection
when the input skipped condensation.

Scale notes: state is (id, layer) hash-partitioned by id, co-located
with the cached adjacency; per-round lineage is cut by localCheckpoint;
the max-aggregate is map-side combinable so hub fan-in collapses
before the shuffle.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from linkgraph.checkpoint import Checkpointer


@dataclass
class LayersResult:
    layers: DataFrame           # (id, layer)
    iterations: int
    converged: bool
    counters: list[dict] = field(default_factory=list)


def condensation(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Contract a digraph by SCC labels: distinct (label(src) ->
    label(dst)) edges with intra-component edges dropped. The result is
    acyclic by construction (labels from scc.strongly_connected_components).
    """
    ls = labels.select(F.col("id").alias("src"), F.col("label").alias("ls"))
    ld = labels.select(F.col("id").alias("dst"), F.col("label").alias("ld"))
    return (
        edges.select("src", "dst")
        .join(ls, "src")
        .join(ld, "dst")
        .where(F.col("ls") != F.col("ld"))
        .select(F.col("ls").alias("src"), F.col("ld").alias("dst"))
        .distinct()
    )


def topological_layers(
    edges: DataFrame,
    max_iter: int = 200,
    vertices: DataFrame | None = None,
    checkpointer: Checkpointer | None = None,
) -> LayersResult:
    """Longest-path layering of a DAG given as directed (src, dst).

    Returns every vertex with its layer; `converged` is False when
    layers were still rising at `max_iter` (a reachable cycle or a
    critical path longer than the cap). Pass `vertices` (an `id`
    column) to include isolated vertices (layer 0) the edge table
    cannot see — e.g. condensation labels of edge-free components.

    With a durable `checkpointer` every superstep's (id, layer) state
    lands as a manifest-tracked checkpoint and a rerun resumes from the
    last complete superstep: the catch-up round restarts at full
    frontier width, which is safe because max-propagation is monotone —
    the resumed state only ever rises to the same fixpoint.
    """
    spark = edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark, job="topo_layers")
    e = (
        edges.select("src", "dst")
        .repartition("src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    counters: list[dict] = []
    start = ckpt.latest()
    if start is not None:
        loaded, manifest = ckpt.load(start)
        layers = loaded.select("id", "layer")
        it = int(manifest["superstep"])
        counters.append({"iteration": it, "resumed": True})
    else:
        verts = (
            e.select(F.col("src").alias("id"))
            .unionByName(e.select(F.col("dst").alias("id")))
            .distinct()
        )
        if vertices is not None:
            verts = verts.unionByName(vertices.select("id")).distinct()
        layers = verts.select(
            "id", F.lit(0).cast("long").alias("layer")
        ).localCheckpoint(eager=True)
        it = 0
    # Initial (and resume catch-up) frontier: the full state. True
    # sources raise nothing in round 1, but the full-width round makes
    # the workset self-priming; it shrinks from round 2 on.
    frontier = layers

    converged = False
    while it < max_iter:
        t0 = time.time()
        it += 1
        proposals = (
            frontier.join(e, frontier["id"] == e["src"])
            .groupBy(F.col("dst").alias("id"))
            .agg((F.max("layer") + 1).alias("proposed"))
        )
        merged = ckpt.save(
            layers.join(proposals, "id", "left").select(
                "id",
                F.greatest("layer", F.coalesce("proposed", F.lit(0))).alias("layer"),
                (F.coalesce("proposed", F.lit(0)) > F.col("layer")).alias("rose"),
            ),
            it,
        )
        n_rose = merged.where("rose").count()
        counters.append({"iteration": it, "raised": n_rose, "wall_s": time.time() - t0})
        frontier = merged.where("rose").select("id", "layer")
        layers = merged.select("id", "layer")
        if n_rose == 0:
            converged = True
            break
    e.unpersist()
    return LayersResult(
        layers=layers, iterations=it, converged=converged, counters=counters
    )
