"""Scalar (int8-range) quantization of embedding columns.

Not in the reference (no vector layer); semantics are the standard
per-dimension min-max scalar quantization used by every large-scale
vector index (FAISS ScalarQuantizer / SQ8, Lucene/Elasticsearch int8
HNSW): each dimension d gets corpus bounds [lo_d, hi_d]; a value maps
to the nearest of 256 evenly spaced codes,

  q = clamp(floor((v - lo) / (hi - lo) * 255 + 0.5), 0, 255)
  v' = lo + q * (hi - lo) / 255          (reconstruction)

cutting vector storage/bandwidth 4x (float32) to 8x (float64) with a
worst-case per-dimension error of (hi - lo) / 510. floor(x + 0.5)
rather than round() keeps the code engine-exact (round() ties differ
between engines; floor doesn't).

Plan shape: one posexplode + (dim)-keyed min/max aggregate for the
bounds — map-side combinable, d reduce rows total — broadcast back as
two d-length arrays (1-row crossJoin), then the encode/decode are
pure zip_with projections over the vector column. The corpus never
shuffles; a 100 TB embedding table streams through scan + partial
aggregate once, then encodes in place.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dimension_bounds(
    df: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Per-dimension corpus bounds: (dim, lo, hi)."""
    return (
        df.select(F.posexplode(vec_col).alias("dim", "v"))
        .groupBy("dim")
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    )


def _bounds_arrays(bounds: DataFrame) -> DataFrame:
    """1-row frame with dim-ordered lo/hi arrays for broadcast."""
    return bounds.agg(
        F.array_sort(
            F.collect_list(F.struct("dim", "lo"))
        ).alias("_slo"),
        F.array_sort(
            F.collect_list(F.struct("dim", "hi"))
        ).alias("_shi"),
    ).select(
        F.transform("_slo", lambda s: s["lo"]).alias("_lo"),
        F.transform("_shi", lambda s: s["hi"]).alias("_hi"),
    )


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bounds: DataFrame | None = None,
) -> DataFrame:
    """Encode vectors to int codes in [0, 255]: (id, codes).

    Degenerate dimensions (hi == lo) encode to 0 and reconstruct to lo
    exactly. Pass precomputed `bounds` to reuse one scan's statistics
    across tables (train/serve parity).
    """
    b = _bounds_arrays(bounds if bounds is not None else dimension_bounds(df, vec_col))
    code = F.zip_with(
        F.col(vec_col),
        F.zip_with(
            F.col("_lo"), F.col("_hi"),
            lambda lo, hi: F.struct(lo.alias("lo"), hi.alias("hi")),
        ),
        lambda v, s: F.when(
            s["hi"] > s["lo"],
            F.least(
                F.lit(255),
                F.greatest(
                    F.lit(0),
                    F.floor(
                        (v - s["lo"]) / (s["hi"] - s["lo"]) * 255 + F.lit(0.5)
                    ).cast("int"),
                ),
            ),
        ).otherwise(F.lit(0)),
    )
    return df.crossJoin(F.broadcast(b)).select(
        F.col(id_col), code.alias("codes")
    )


def reconstruction_stats(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Quantize-dequantize round trip: per-dimension error profile.

    Returns (dim, lo, hi, max_abs_err, mse); the invariant
    max_abs_err <= (hi - lo) / 510 + float eps certifies the encode.
    """
    bounds = dimension_bounds(df, vec_col)
    b = _bounds_arrays(bounds)
    recon = F.zip_with(
        F.col(vec_col),
        F.zip_with(
            F.col("_lo"), F.col("_hi"),
            lambda lo, hi: F.struct(lo.alias("lo"), hi.alias("hi")),
        ),
        lambda v, s: F.when(
            s["hi"] > s["lo"],
            s["lo"]
            + F.least(
                F.lit(255),
                F.greatest(
                    F.lit(0),
                    F.floor(
                        (v - s["lo"]) / (s["hi"] - s["lo"]) * 255 + F.lit(0.5)
                    ).cast("int"),
                ),
            )
            * (s["hi"] - s["lo"])
            / 255,
        ).otherwise(s["lo"]),
    )
    errs = (
        df.crossJoin(F.broadcast(b))
        .select(
            F.posexplode(
                F.zip_with(F.col(vec_col), recon, lambda v, r: v - r)
            ).alias("dim", "err")
        )
        .groupBy("dim")
        .agg(
            F.max(F.abs(F.col("err"))).alias("max_abs_err"),
            F.avg(F.col("err") * F.col("err")).alias("mse"),
        )
    )
    return bounds.join(errs, "dim").select(
        "dim", "lo", "hi", "max_abs_err", "mse"
    )
