"""MinHash + LSH near-duplicate detection.

Pipeline (shingle -> minhash -> band -> bucket-join -> verify), the
standard web-dedup construction (Broder 1997; LSH banding per Mining of
Massive Datasets ch.3), entirely JVM-side:

- shingles: word n-grams hashed to int64 (`transform` over an index
  sequence + xxhash64 — same expression family as the triangle SQL
  kernel).
- signature: for hash function i, h_i(doc) = min over shingles of
  xxhash64(shingle, i) — one `transform` + `array_min` per i, no UDF.
- banding: signature split into b bands of r rows; band hash = xxhash64
  of the band slice. Docs sharing any band hash are candidates.
- candidate generation: explode bands -> groupBy band key ->
  collect sorted doc-id list -> intra-bucket pair expansion (i<j) with a
  per-bucket cap; a bucket whose size exceeds the cap is 99.9%+ a
  degenerate near-constant shingle set (boilerplate), and the cap is an
  explicit logged knob, mirroring production dedup pipelines.
- verification: exact Jaccard over the true shingle sets via
  array_intersect/array_union on a self-join of candidates.

Scale: the only shuffles are the band groupBy and the verify join, both
hashed on near-uniform 64-bit keys; signatures are ~n_hashes longs/doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.dedup import phash

_PAIR_EXPR = (
    "flatten(transform(ids, (x, i) -> "
    "transform(slice(ids, i + 2, size(ids)), y -> struct(x as id_a, y as id_b))))"
)


def shingle_sets(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    shingle: int = 3,
    portable: bool = False,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """(id, shingles: array<long>[, carry...]) — distinct hashed word
    n-grams.

    ``portable=True`` swaps xxhash64 for the cross-engine polynomial
    family (linkgraph.dedup.phash) so a DuckDB oracle can reproduce the
    exact shingle hashes; the default stays on the JVM intrinsic.
    ``carry`` keeps extra columns (e.g. the event timestamp for the
    streaming pipeline, which cannot join them back later).
    """
    gram_hash = phash.poly_hash if portable else F.xxhash64
    words = F.split(F.trim(F.lower(F.col(col))), r"\s+")
    n = F.size(words)
    grams = F.when(
        n >= shingle,
        F.transform(
            F.sequence(F.lit(1), n - F.lit(shingle - 1)),
            lambda i: gram_hash(F.concat_ws(" ", F.slice(words, i, shingle))),
        ),
    ).otherwise(F.array(gram_hash(F.trim(F.lower(F.col(col))))))
    return df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(grams).alias("shingles"),
        *[F.col(c) for c in carry],
    )


def minhash_signatures(
    shingled: DataFrame, n_hashes: int = 32, portable: bool = False
) -> DataFrame:
    """(id, shingles, sig: array<long>) — sig[i] = min h_i(s)."""
    if portable:
        def h(s, i):
            return phash.sig_hash(s, i)
    else:
        def h(s, i):
            return F.xxhash64(s, F.lit(i))

    # NB: the transform lambda must take exactly ONE parameter — a
    # two-parameter lambda (e.g. the `lambda s, i=i` closure idiom)
    # makes PySpark bind the ARRAY INDEX to the second parameter,
    # silently replacing the hash-function index and collapsing all
    # n_hashes signature slots into the same function.
    def sig_col(i: int):
        return F.array_min(F.transform(F.col("shingles"), lambda s: h(s, i)))

    sig = F.array(*[sig_col(i) for i in range(n_hashes)])
    return shingled.withColumn("sig", sig)


def _candidate_pairs(
    signed: DataFrame,
    n_bands: int,
    rows_per_band: int,
    max_bucket: int,
    portable: bool = False,
) -> DataFrame:
    if portable:
        def bh(b):
            return phash.band_hash(
                b, F.slice("sig", b * rows_per_band + 1, rows_per_band)
            )
    else:
        def bh(b):
            return F.xxhash64(
                F.lit(b), F.slice("sig", b * rows_per_band + 1, rows_per_band)
            )
    bands = signed.select(
        "id",
        F.explode(F.array(*[bh(b).alias(f"b{b}") for b in range(n_bands)])).alias(
            "band"
        ),
    )
    buckets = (
        bands.groupBy("band")
        .agg(F.slice(F.sort_array(F.collect_set("id")), 1, max_bucket).alias("ids"))
        .where(F.size("ids") > 1)
    )
    return (
        buckets.select(F.explode(F.expr(_PAIR_EXPR)).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )


def minhash_near_duplicates(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    shingle: int = 3,
    n_hashes: int = 32,
    n_bands: int = 8,
    threshold: float = 0.7,
    max_bucket: int = 256,
    portable: bool = False,
) -> DataFrame:
    """(id_a, id_b, jaccard) for verified near-duplicate pairs.

    LSH recall knee is at t ≈ (1/b)^(1/r); defaults (b=8, r=4) put it
    near 0.59, comfortably below the 0.7 verify threshold.

    ``portable=True`` runs the same pipeline on the cross-engine hash
    family (phash) so the driver's DuckDB oracle value-checks the exact
    output; the scale path keeps the xxhash64 intrinsics.
    """
    assert n_hashes % n_bands == 0
    r = n_hashes // n_bands
    # Materialize once: the signature table feeds three consumers (the
    # band explode and both sides of the verify join); without the cut,
    # shingling + 32 hash passes per doc run three times. At cluster
    # scale this is the natural stage checkpoint of the dedup pipeline.
    signed = minhash_signatures(
        shingle_sets(df, col, id_col, shingle, portable), n_hashes, portable
    ).localCheckpoint(eager=True)
    cands = _candidate_pairs(signed, n_bands, r, max_bucket, portable)
    sets = signed.select("id", "shingles")
    a = sets.withColumnRenamed("id", "id_a").withColumnRenamed("shingles", "sh_a")
    b = sets.withColumnRenamed("id", "id_b").withColumnRenamed("shingles", "sh_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", (inter / union).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )
