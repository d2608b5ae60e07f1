"""Explicit StructTypes for every table the engine produces or consumes.

The reference fixed its record shapes at compile time with Scala case
classes (Vertex/Edge/Triangle, graph-mining-spark Truss.scala:9-19);
here the same discipline is declared schemas.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Corpus of source-code repositories (BASELINE.json input_hint).
CORPUS = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("content", T.StringType(), False),
    ]
)

# Canonical undirected edge table: src < dst, deduplicated.
EDGES = T.StructType(
    [
        T.StructField("src", T.LongType(), False),
        T.StructField("dst", T.LongType(), False),
    ]
)

DEGREES = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("degree", T.LongType(), False),
    ]
)

# Triangles canonicalized a < b < c.
TRIANGLES = T.StructType(
    [
        T.StructField("a", T.LongType(), False),
        T.StructField("b", T.LongType(), False),
        T.StructField("c", T.LongType(), False),
    ]
)

# Per-vertex labels (connected components, LPA).
LABELS = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("label", T.LongType(), False),
    ]
)

RANKS = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("rank", T.DoubleType(), False),
    ]
)

VERTICES = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
    ]
)
