"""Fiedler vector (algebraic connectivity eigenvector) and spectral
bisection via deflated power iteration.

Not in the reference (scope was triangles/truss/CC); semantics are the
classic spectral partitioning of Fiedler 1973 / Pothen-Simon-Liou
1990: the eigenvector of the graph Laplacian L = D - A for the
second-smallest eigenvalue; its sign pattern is the canonical
two-way cut, and sorting by it gives the sweep order that spectral
clustering and nested-dissection orderings use.

Power iteration finds DOMINANT eigenvectors, so we iterate the
spectrally shifted operator  M = cI - L  with c = max_degree + 1
(Gershgorin bounds L's spectrum by [0, 2*max_deg], and any
c > lambda_max(L)/2 makes M's dominant eigenvalue c - lambda_2 once
the trivial eigenvector is removed):

  per round:  y(v) = (c - deg(v)) * x(v) + sum_{u~v} x(u)
              y   -= mean(y)            (deflate the all-ones kernel)
              x    = y / ||y||_2

Every step is the eigencentrality superstep plus one extra 1-row
broadcast aggregate (the mean), so the PLANS.md §E regime carries
over unchanged: cached hash-partitioned bidirected adjacency, one
map-side-combinable sum per round, lazy mean/norm crossJoins, one
lineage-cutting action per round, O(|V|) state.

Determinism contract: fixed rounds, deterministic hash init (the
portable congruence of dedup/phash.py — a CONSTANT init would be
exactly the deflated direction and converge to nothing), so the
driver oracle replays the identical recursion in DuckDB.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from linkgraph.checkpoint import Checkpointer
from linkgraph.dedup.phash import P1, _SEED_A, _SEED_B


@dataclass
class FiedlerResult:
    scores: DataFrame           # (id, fiedler), L2-normalized, mean ~0
    iterations: int
    shift: float                # the c in cI - L
    counters: list[dict] = field(default_factory=list)


def _center_normalize(df: DataFrame, col: str) -> DataFrame:
    """Subtract the mean then divide by the L2 norm — both as 1-row
    broadcast aggregates (no driver action)."""
    m = df.agg(F.avg(F.col(col)).alias("_mu"))
    centered = (
        df.crossJoin(F.broadcast(m))
        .withColumn(col, F.col(col) - F.col("_mu"))
        .drop("_mu")
    )
    n = centered.agg(
        F.sqrt(F.sum(F.col(col) * F.col(col))).alias("_nrm")
    )
    return (
        centered.crossJoin(F.broadcast(n))
        .withColumn(
            col,
            F.when(F.col("_nrm") > 0, F.col(col) / F.col("_nrm")).otherwise(
                F.lit(0.0)
            ),
        )
        .drop("_nrm")
    )


def fiedler(
    edges: DataFrame,
    max_iter: int = 40,
    checkpointer: Checkpointer | None = None,
) -> FiedlerResult:
    """Deflated power iteration for the Fiedler vector.

    Returns (id, fiedler) over the undirected canonical edge table,
    L2-normalized with zero mean; sign(fiedler) is the spectral
    bipartition. Fixed ``max_iter`` rounds (the oracle contract). On a
    disconnected graph the iterate converges to a difference of
    component indicators instead — still the minimal cut (cut 0).

    With a durable `checkpointer` the loop resumes mid-iteration from
    the last complete superstep: the (id, degree, fiedler) state is
    everything a round reads, so the continuation is bit-identical to
    an uninterrupted run (the hits.py/salsa.py resume contract).
    """
    e = edges.select("src", "dst")
    b = (
        e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .repartition("src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    deg = b.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    # One bounded pre-loop action: the Gershgorin shift.
    max_deg = deg.agg(F.max("degree").alias("m")).collect()[0]["m"]
    if max_deg is None:
        spark = edges.sparkSession
        return FiedlerResult(
            scores=spark.createDataFrame([], "id long, fiedler double"),
            iterations=0,
            shift=0.0,
        )
    c = float(max_deg + 1)

    # Deterministic pseudo-random init via the portable congruence —
    # orthogonal-ish to the all-ones kernel after centering.
    h = (F.lit(_SEED_A) * (F.col("id") % F.lit(P1)) + F.lit(_SEED_B)) % F.lit(
        P1
    )
    h2 = (h * h + F.lit(_SEED_B)) % F.lit(P1)
    x = _center_normalize(
        deg.select(
            "id",
            "degree",
            (h2.cast("double") / F.lit(float(P1)) - F.lit(0.5)).alias(
                "fiedler"
            ),
        ),
        "fiedler",
    ).localCheckpoint(eager=True)

    ckpt = checkpointer
    start_it = 1
    if ckpt is not None:
        latest = ckpt.latest()
        if latest is not None:
            loaded, _manifest = ckpt.load(latest)
            x = loaded.select("id", "degree", "fiedler")
            start_it = latest + 1

    counters: list[dict] = []
    it = start_it - 1
    for it in range(start_it, max_iter + 1):
        t0 = time.time()
        nbr = (
            x.select("id", "fiedler")
            .join(b, x["id"] == b["src"])
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("fiedler").alias("_nsum"))
        )
        y = (
            x.join(nbr, "id", "left")
            .select(
                "id",
                "degree",
                (
                    (F.lit(c) - F.col("degree")) * F.col("fiedler")
                    + F.coalesce("_nsum", F.lit(0.0))
                ).alias("fiedler"),
            )
        )
        nxt = _center_normalize(y, "fiedler")
        if ckpt is not None:
            x = ckpt.save(nxt, it, eager=True)
        else:
            x = nxt.localCheckpoint(eager=True)
        counters.append({"iteration": it, "wall_s": time.time() - t0})
    b.unpersist()
    return FiedlerResult(
        scores=x.select("id", "fiedler"),
        iterations=it,
        shift=c,
        counters=counters,
    )


def spectral_bisection(edges: DataFrame, max_iter: int = 40) -> DataFrame:
    """(id, side) with side = 0/1 by Fiedler-vector sign (ties -> 0)."""
    res = fiedler(edges, max_iter=max_iter)
    return res.scores.select(
        "id", (F.col("fiedler") > 0).cast("int").alias("side")
    )


def spectral_sweep(edges: DataFrame, max_iter: int = 40) -> DataFrame:
    """Conductance sweep over the Fiedler order — the Cheeger cut.

    For every prefix of the vertices sorted by (fiedler, id), the
    cut/volume/conductance of that prefix vs the rest. The global
    minimum is the spectral partition with the Cheeger guarantee
    (phi <= sqrt(2 * lambda_2)), tighter than the sign cut.

    Returns (pos, id, fiedler, degree, volume, cut_edges, conductance)
    with pos 1-based and conductance NULL on the full-graph prefix.

    Scale shape: positions and BOTH running sums come from the
    distributed two-phase prefix scan of text/packing.py (range
    exchange + P-row driver prefix + one Arrow pass) — there is no
    global-order window anywhere, unlike localcluster.py's sweep,
    which may broadcast its order only because it is top-k-bounded.
    The edge-delta trick is localcluster's: an edge adds +1 at the
    earlier endpoint's position and -1 after the later one, so the
    running sum of deltas IS the prefix cut.
    """
    from linkgraph.text.packing import with_global_offset

    res = fiedler(edges, max_iter=max_iter)
    e = edges.select("src", "dst")
    b = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = b.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    verts = res.scores.join(deg, "id").withColumn("_one", F.lit(1))
    pos = with_global_offset(verts, ["fiedler", "id"], "_one", "_p0").select(
        "id",
        "fiedler",
        "degree",
        (F.col("_p0") + 1).alias("pos"),
    )

    total_vol = deg.agg(F.sum("degree")).collect()[0][0] or 0

    pu = pos.select(F.col("id").alias("src"), F.col("pos").alias("pu"))
    pv = pos.select(F.col("id").alias("dst"), F.col("pos").alias("pv"))
    ev = e.join(pu, "src").join(pv, "dst")
    deltas = (
        ev.select(F.least("pu", "pv").alias("pos"), F.lit(1).alias("d"))
        .unionByName(
            ev.select(F.greatest("pu", "pv").alias("pos"), F.lit(-1).alias("d"))
        )
        .groupBy("pos")
        .agg(F.sum("d").alias("d"))
    )
    rows = pos.join(deltas, "pos", "left").select(
        "pos",
        "id",
        "fiedler",
        "degree",
        F.coalesce("d", F.lit(0)).alias("_d"),
    )
    rows = with_global_offset(rows, ["pos"], "degree", "_vol0")
    rows = with_global_offset(rows, ["pos"], "_d", "_cut0")
    return rows.select(
        "pos",
        "id",
        "fiedler",
        "degree",
        (F.col("_vol0") + F.col("degree")).alias("volume"),
        (F.col("_cut0") + F.col("_d")).alias("cut_edges"),
        F.when(
            F.least(
                F.col("_vol0") + F.col("degree"),
                F.lit(total_vol) - F.col("_vol0") - F.col("degree"),
            )
            > 0,
            (F.col("_cut0") + F.col("_d")).cast("double")
            / F.least(
                F.col("_vol0") + F.col("degree"),
                F.lit(total_vol) - F.col("_vol0") - F.col("degree"),
            ),
        ).alias("conductance"),
    )
