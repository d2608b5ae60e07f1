"""Edge-table primitives: canonicalization, degrees, orientation, bidirect.

Reference parity (semantics, not code):
- convertGraph      graph-mining-spark Truss.scala:21-29  (parse edge list)
- createEdge        graph-mining-spark Truss.scala:236-243 (degree-order
                    canonical orientation, id tiebreak)
- calculateDegrees  graph-mining-spark Truss.scala:259-265
- addDegreesToGraph graph-mining-spark Truss.scala:245-257
- convertToBidirectedGraph graph-mining-spark GraphMiningSpark.scala:110-134
- calculateIncomingOutcomingCount (degree histogram)
                    graph-mining-spark GraphMiningSpark.scala:137-173

All of it is plain Catalyst: hash aggregates with map-side partial
combine replace reduceByKey, explode replaces flatMap, and the degree
joins are left to AQE to broadcast when the degree table is small (the
Flink side hard-coded BROADCAST_HASH hints, flink Truss.scala:63-66).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def edges_from_text(spark: SparkSession, path: str, sep: str = "\t") -> DataFrame:
    """Parse a one-edge-per-line text file into a directed edge table.

    Mirrors convertGraph (Truss.scala:21-29): ``"<int><sep><int>"`` per
    line, separator configurable.
    """
    lines = spark.read.text(path)
    parts = F.split(F.col("value"), sep)
    return lines.select(
        parts.getItem(0).cast("long").alias("src"),
        parts.getItem(1).cast("long").alias("dst"),
    ).where(F.col("src").isNotNull() & F.col("dst").isNotNull())


def canonicalize(edges: DataFrame) -> DataFrame:
    """Undirected canonical form: (min, max) pairs, self-loops dropped,
    duplicates removed. Columns: src < dst."""
    return (
        edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def degrees(edges: DataFrame) -> DataFrame:
    """Per-vertex degree over the canonical undirected edge table.

    calculateDegrees (Truss.scala:259-265) as one explode + hash agg —
    Catalyst plans this with a partial (map-side) aggregate, the same
    combine structure as the reference's reduceByKey.
    """
    return (
        edges.select(F.explode(F.array("src", "dst")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )


def with_degrees(edges: DataFrame, deg: DataFrame | None = None) -> DataFrame:
    """Attach endpoint degrees: columns (src, dst, src_deg, dst_deg).

    addDegreesToGraph (Truss.scala:245-257) — two equi-joins; AQE
    broadcasts the degree side when it is small relative to edges.
    """
    deg = deg if deg is not None else degrees(edges)
    return (
        edges.join(deg.withColumnRenamed("id", "src"), "src")
        .withColumnRenamed("degree", "src_deg")
        .join(
            deg.withColumnRenamed("id", "dst").withColumnRenamed("degree", "dst_deg"),
            "dst",
        )
        .select("src", "dst", "src_deg", "dst_deg")
    )


def orient_by_degree(edges_with_deg: DataFrame) -> DataFrame:
    """Degree-order orientation: (lo, hi) where (deg, id) of lo < of hi.

    createEdge (Truss.scala:236-243): the node-iterator trick — orienting
    every edge from its lower-(degree, id) endpoint bounds the out-degree
    of every vertex by O(sqrt(2m)), which is what makes wedge generation
    skew-safe without salting. Pure column expressions.
    """
    lo_first = (F.struct("src_deg", "src") < F.struct("dst_deg", "dst"))
    return edges_with_deg.select(
        F.when(lo_first, F.col("src")).otherwise(F.col("dst")).alias("lo"),
        F.when(lo_first, F.col("dst")).otherwise(F.col("src")).alias("hi"),
        F.when(lo_first, F.col("src_deg")).otherwise(F.col("dst_deg")).alias("lo_deg"),
        F.when(lo_first, F.col("dst_deg")).otherwise(F.col("src_deg")).alias("hi_deg"),
    )


def bidirectional(edges: DataFrame) -> DataFrame:
    """Both directions of the canonical undirected edge table (u -> v and
    v -> u), for algorithms that walk adjacency symmetrically."""
    return edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def reciprocal_edges(directed: DataFrame) -> DataFrame:
    """Directed edge list -> undirected graph of reciprocal pairs only.

    convertToBidirectedGraph (GraphMiningSpark.scala:110-134): the
    reference mapped each directed edge to a canonical pair carrying
    (follows, followed) flags and summed them; here one hash aggregate
    with two boolean-max flags, then filter both present.
    """
    pairs = directed.where(F.col("src") != F.col("dst")).select(
        F.least("src", "dst").alias("src"),
        F.greatest("src", "dst").alias("dst"),
        (F.col("src") < F.col("dst")).alias("fwd"),
    )
    return (
        pairs.groupBy("src", "dst")
        .agg(F.max("fwd").alias("has_fwd"), F.max(~F.col("fwd")).alias("has_rev"))
        .where(F.col("has_fwd") & F.col("has_rev"))
        .select("src", "dst")
    )


def dyad_census(directed: DataFrame) -> DataFrame:
    """Holland-Leinhardt dyad census of a directed graph (one row).

    Returns (mutual, asymmetric, null, reciprocity): counts of
    connected dyads with both / exactly one direction present,
    null = C(n,2) - mutual - asymmetric over the n touched vertices,
    and edge reciprocity = 2*mutual / (2*mutual + asymmetric) — the
    fraction of directed (deduplicated, loop-free) edges whose
    reverse also exists. The dyad-level complement of the triad
    census (ditriangles.py); same flag-aggregate shape as
    reciprocal_edges (GraphMiningSpark.scala:110-134) plus one global
    roll-up, so it's two map-side-combinable aggregates end to end.
    """
    e = directed.where(F.col("src") != F.col("dst")).select("src", "dst")
    pairs = (
        e.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            (F.col("src") < F.col("dst")).alias("fwd"),
        )
        .groupBy("a", "b")
        .agg(
            F.max("fwd").alias("has_fwd"),
            F.max(~F.col("fwd")).alias("has_rev"),
        )
    )
    n = (
        e.select(F.explode(F.array("src", "dst")).alias("id"))
        .agg(F.count_distinct("id").alias("n"))
    )
    counts = pairs.agg(
        F.coalesce(
            F.sum((F.col("has_fwd") & F.col("has_rev")).cast("long")),
            F.lit(0),
        ).alias("mutual"),
        F.coalesce(
            F.sum((F.col("has_fwd") != F.col("has_rev")).cast("long")),
            F.lit(0),
        ).alias("asymmetric"),
    )
    return counts.crossJoin(F.broadcast(n)).select(
        "mutual",
        "asymmetric",
        (
            F.col("n") * (F.col("n") - 1) / 2
            - F.col("mutual")
            - F.col("asymmetric")
        ).cast("long").alias("null"),
        F.when(
            2 * F.col("mutual") + F.col("asymmetric") > 0,
            2.0 * F.col("mutual")
            / (2 * F.col("mutual") + F.col("asymmetric")),
        ).otherwise(F.lit(0.0)).alias("reciprocity"),
    )


def degree_histogram(edges: DataFrame) -> DataFrame:
    """Histogram of vertex degrees: (degree, n_vertices).

    calculateIncomingOutcomingCount (GraphMiningSpark.scala:137-173)
    collapsed to the undirected case — two-level hash aggregate.
    """
    return (
        degrees(edges)
        .groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_vertices"))
    )


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """One row (assortativity double): Pearson correlation of endpoint
    degrees over the mirrored edge list (Newman 2002 — shift-invariance
    of Pearson makes degree and remaining-degree correlation equal).

    Cost: one degree aggregation, two joins degree-onto-endpoint, one
    scalar correlation aggregate (all 2-phase; nothing is collected).
    """
    b = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = b.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("d"))
    j = b.join(
        deg.withColumnRenamed("id", "src").withColumnRenamed("d", "ds"), "src"
    ).join(deg.withColumnRenamed("id", "dst").withColumnRenamed("d", "dd"), "dst")
    return j.agg(F.corr("ds", "dd").alias("assortativity"))


def rich_club_coefficients(edges: DataFrame) -> DataFrame:
    """Rich-club coefficient phi(k) for every distinct degree value k.

    phi(k) = 2 * E_k / (N_k * (N_k - 1)) where N_k counts vertices of
    degree > k and E_k counts edges whose BOTH endpoints have degree
    > k (Zhou & Mondragon 2004). Emits (k, n_rich, e_rich, phi) for
    thresholds where the club has >= 2 members.

    Scale shape: no per-k pass over the graph. One degree aggregate,
    two degree joins onto the edge table (with_degrees), then BOTH
    counts come from reverse-exclusive running sums over two
    histograms — the vertex-degree histogram and the edge min-degree
    histogram. An edge has both endpoints of degree > k iff
    min(src_deg, dst_deg) > k, so E_k is exactly the tail mass of the
    min-degree histogram. The single-partition window is safe: a graph
    with E edges has at most O(sqrt(E)) distinct degree values (their
    sum is bounded by 2E), ~63k rows at 1e9 edges.
    """
    from pyspark.sql import Window

    deg = degrees(edges)
    vhist = deg.groupBy(F.col("degree").alias("k")).agg(
        F.count(F.lit(1)).alias("nv")
    )
    ehist = (
        with_degrees(edges, deg)
        .select(F.least("src_deg", "dst_deg").alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("ne"))
    )
    ks = (
        vhist.select("k")
        .unionByName(ehist.select("k"))
        .distinct()
        .join(vhist, "k", "left")
        .join(ehist, "k", "left")
        .select(
            "k",
            F.coalesce("nv", F.lit(0)).alias("nv"),
            F.coalesce("ne", F.lit(0)).alias("ne"),
        )
    )
    # Tail mass strictly above k == exclusive running sum in descending
    # k order (the union key set contains every mass-carrying value).
    w = Window.orderBy(F.desc("k")).rowsBetween(Window.unboundedPreceding, -1)
    out = ks.select(
        "k",
        F.coalesce(F.sum("nv").over(w), F.lit(0)).alias("n_rich"),
        F.coalesce(F.sum("ne").over(w), F.lit(0)).alias("e_rich"),
    )
    return out.where(F.col("n_rich") >= 2).select(
        "k",
        "n_rich",
        "e_rich",
        (
            F.lit(2.0) * F.col("e_rich")
            / (F.col("n_rich") * (F.col("n_rich") - F.lit(1)))
        ).alias("phi"),
    )


def in_out_degree_histograms(directed: DataFrame) -> DataFrame:
    """Directed variant with in/out/total histograms in one table:
    (direction in {'in','out','total'}, degree, n_vertices)."""
    out_deg = directed.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    in_deg = directed.groupBy(F.col("dst").alias("id")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    total = (
        directed.select(F.explode(F.array("src", "dst")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    def histo(deg: DataFrame, direction: str) -> DataFrame:
        return (
            deg.groupBy("degree")
            .agg(F.count(F.lit(1)).alias("n_vertices"))
            .select(F.lit(direction).alias("direction"), "degree", "n_vertices")
        )
    return histo(out_deg, "out").unionByName(histo(in_deg, "in")).unionByName(
        histo(total, "total")
    )


def graph_diff(old_edges: DataFrame, new_edges: DataFrame) -> DataFrame:
    """One row of edge-set drift between two graph snapshots:
    (n_old, n_new, n_added, n_removed, n_common, jaccard).

    The nightly-monitoring primitive for a continuously re-derived
    link graph: two anti-joins + one semi-join on the canonical
    (src, dst) key, each co-partitioned and map-side countable —
    nothing here is more expensive than one co-keyed join pass.
    """
    o = old_edges.select("src", "dst")
    n = new_edges.select("src", "dst")
    n_old = o.count()
    n_new = n.count()
    n_common = n.join(o, ["src", "dst"], "left_semi").count()
    union = n_old + n_new - n_common
    spark = old_edges.sparkSession
    return spark.createDataFrame(
        [
            (
                n_old,
                n_new,
                n_new - n_common,
                n_old - n_common,
                n_common,
                float(n_common / union) if union else 1.0,
            )
        ],
        "n_old long, n_new long, n_added long, n_removed long, "
        "n_common long, jaccard double",
    )


def degree_drift(old_edges: DataFrame, new_edges: DataFrame) -> DataFrame:
    """(id, deg_old, deg_new, delta) for vertices whose degree changed
    between snapshots (full-outer degree join; absent = 0)."""
    d_old = degrees(old_edges).select("id", F.col("degree").alias("deg_old"))
    d_new = degrees(new_edges).select("id", F.col("degree").alias("deg_new"))
    j = d_old.join(d_new, "id", "full_outer").select(
        "id",
        F.coalesce("deg_old", F.lit(0)).alias("deg_old"),
        F.coalesce("deg_new", F.lit(0)).alias("deg_new"),
    )
    return j.withColumn("delta", F.col("deg_new") - F.col("deg_old")).where(
        F.col("delta") != 0
    )


def power_law_alpha(edges: DataFrame, d_min: int = 2) -> DataFrame:
    """One row (alpha, n_tail, d_min): continuous-approximation MLE of
    the degree-distribution power-law exponent (Clauset, Shalizi &
    Newman, SIAM Rev. 2009, eq. 3.7 with the -1/2 discreteness
    correction): alpha = 1 + n / sum(ln(d / (d_min - 1/2))) over
    degrees >= d_min.

    The skew diagnostic run before choosing hub thresholds
    (partitioning.py): one degree aggregate + one 2-value scalar
    aggregate — nothing bigger than the degree table is touched.
    """
    d = degrees(edges).where(F.col("degree") >= d_min)
    return d.agg(
        (
            1.0
            + F.count(F.lit(1))
            / F.sum(F.log(F.col("degree") / F.lit(d_min - 0.5)))
        ).alias("alpha"),
        F.count(F.lit(1)).alias("n_tail"),
        F.lit(d_min).cast("long").alias("d_min"),
    )
