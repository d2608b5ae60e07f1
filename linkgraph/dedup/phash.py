"""Cross-engine-reproducible hash family for the dedup sketches.

The default MinHash/SimHash pipelines hash with ``xxhash64`` — a JVM
intrinsic, fast but engine-specific, so the driver's DuckDB oracle
cannot reproduce the signatures and those rows were rows-only checks.
This module provides an alternative hash family built ONLY from exact
64-bit integer arithmetic (`*`, `+`, `%`, shifts) over code points,
which both Spark SQL and DuckDB evaluate identically:

- ``poly_hash(s, mult, mod)``: polynomial rolling hash of a string's
  code points, ``h = (h * mult + cp) % mod``, with ``mod < 2^31`` so
  every intermediate stays far inside int64 (Spark 4 runs ANSI mode —
  overflow would throw, so headroom is part of the contract).
- ``sig_hash(h, i)``: the i-th MinHash function as a linear congruence
  ``(a_i * h + b_i) % P1`` over the 31-bit base hash.
- ``band_hash(b, values)``: left fold of a band's signature slice,
  ``acc = (acc * BAND_MULT + v) % P2`` seeded with the band index.
- ``token_hash62(w)``: a 62-bit token hash for SimHash, two independent
  31-bit polynomial hashes packed as ``(h1 << 31) + h2`` — always
  non-negative, bits 61..63 are zero in BOTH engines (those signature
  bits then vote uniformly negative, which is also identical).

The family is for ORACLE-CHECKED paths (driver queries, cross-engine
tests): per-character aggregation is far slower than the xxhash64
intrinsic, so the scale path keeps the default family. The DuckDB side
of each formula lives in ``__spark_entry__.oracle_sql`` (list_reduce /
list_transform over ``generate_series``), with the a_i/b_i constants
computed by :func:`sig_seeds` and inlined as literals into both plans.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

P1 = 1_000_000_007  # base/signature modulus (< 2^30)
P2 = 998_244_353    # band-fold / second token modulus (< 2^30)
BAND_MULT = 1_000_003
_SEED_A = 2_654_435_761  # Knuth multiplicative constant
_SEED_B = 40_503


def sig_seeds(i: int) -> tuple[int, int]:
    """Deterministic (a_i, b_i) for the i-th MinHash congruence; a_i is
    never 0 (a=0 would collapse the hash to the constant b)."""
    a = (_SEED_A * (i + 1)) % P1 or 1
    b = (_SEED_B * (i + 1) * (i + 1) + 17) % P1
    return a, b


def poly_hash(s: Column, mult: int = 31, mod: int = P1) -> Column:
    """Polynomial code-point hash, identical in Spark and DuckDB.

    Empty string hashes to 0 on both sides (Spark's sequence(1, 0)
    yields a DESCENDING [1, 0] — but substr out of range returns ''
    and ascii('') is 0, so the fold still lands on 0).
    """
    cps = F.transform(
        F.sequence(F.lit(1), F.length(s)),
        lambda i: F.ascii(s.substr(i, F.lit(1))).cast("long"),
    )
    return F.aggregate(
        cps,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * F.lit(mult) + c) % F.lit(mod),
    )


def sig_hash(h: Column, i: int) -> Column:
    a, b = sig_seeds(i)
    return (F.lit(a) * h + F.lit(b)) % F.lit(P1)


def band_hash(b: int, values: Column) -> Column:
    """Fold a band's signature slice into one key. The band index seeds
    the fold (so equal slices in different bands rarely collide), but —
    matching the default family's single-column groupBy — the caller
    groups on the key alone; a cross-band key collision merges buckets
    identically in both engines because the formula is identical."""
    return F.aggregate(
        values,
        F.lit(b).cast("long"),
        lambda acc, v: (acc * F.lit(BAND_MULT) + v) % F.lit(P2),
    )


def token_hash62(w: Column) -> Column:
    """62-bit non-negative token hash for SimHash bit votes."""
    return F.shiftleft(poly_hash(w, 31, P1), 31) + poly_hash(w, 37, P2)


def plane_coeff(idx: Column) -> Column:
    """Deterministic pseudo-random double in [-0.5, 0.5) from an integer
    index — the portable replacement for the numpy hyperplane RNG in
    embedding LSH. Integer part is exact mod-P arithmetic; the float
    part is one literal division and one literal subtraction, so the
    double is bit-identical across engines."""
    num = (F.lit(_SEED_A) * idx + F.lit(_SEED_B)) % F.lit(P1)
    return num.cast("double") / F.lit(float(P1)) - F.lit(0.5)
