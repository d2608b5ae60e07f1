"""Trained logistic-regression quality classifier (GPT-3 / fastText
style corpus filtering).

Not in the reference (no ML layer there); this is the standard "train
a small linear classifier on a curated-positive set, keep documents it
scores high" filter (Brown et al. 2020 §A "quality filtering"; Joulin
et al. 2016 fastText). The reference analogue of the training loop's
shape is the driver-controlled fixpoint iteration of
``Truss.scala:125-149`` — one distributed aggregate per round feeding a
driver-side decision.

Design (all JVM-side, zero UDFs):

- **Features** are a fixed, small set of per-document columns computed
  with pure ``pyspark.sql.functions`` array/string algebra (token
  count, mean token length, distinct-token ratio) so the DuckDB oracle
  can reproduce them bit-for-bit with list algebra.
- **Training** is full-batch gradient descent on log-loss. Each round
  the current weight vector enters the plan as *literals* (it is d+1
  doubles on the driver — the kmeans-centroid altitude), the gradient
  is ONE map-side-combinable scalar aggregate of d+1 sums, and the
  driver takes the step. One scan + one 1-row exchange per round; the
  feature table is persisted once so rounds never re-derive features.
- **Scoring** is one more pure-column pass with the final weights.

Scale: per round the only exchange carries d+1 doubles per partition
(partial sums); the corpus never shuffles. At 100 TB you would
checkpoint the feature projection once and run the same rounds; with
d fixed the round cost is a single column-pruned scan. Full-batch GD
(not SGD) keeps the result deterministic and engine-reproducible —
convergence per round is slower than SGD but each round is one cheap
scan, and the classifier is 4 numbers, not a model server.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["quality_features_for_lr", "train_logistic", "logistic_scores"]


def quality_features_for_lr(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """(id, x1, x2, x3) feature projection, oracle-reproducible.

    x1 = token count / 100 (scaled so all features share magnitude —
    unscaled counts would need per-feature learning rates),
    x2 = mean token length, x3 = distinct-token ratio. Empty documents
    are dropped (no tokens -> no features), mirroring unigram_lm.
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    n = F.size(toks).cast("double")
    char_sum = F.aggregate(
        F.transform(toks, lambda w: F.length(w).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    ).cast("double")
    return df.where(F.length(F.trim(F.col(text_col))) > 0).select(
        F.col(id_col),
        *[F.col(c) for c in keep],
        (n / F.lit(100.0)).alias("x1"),
        (char_sum / n).alias("x2"),
        (F.size(F.array_distinct(toks)).cast("double") / n).alias("x3"),
    )


def _z(weights: list[float], xcols: list[str]) -> Column:
    z: Column = F.lit(float(weights[0]))  # bias
    for w, c in zip(weights[1:], xcols):
        z = z + F.lit(float(w)) * F.col(c)
    return z


def train_logistic(
    feats: DataFrame,
    label_col: str = "y",
    xcols: tuple[str, ...] = ("x1", "x2", "x3"),
    rounds: int = 3,
    lr: float = 0.5,
) -> list[float]:
    """Full-batch GD on log-loss; returns [bias, w1..wd].

    One distributed action per round; ``feats`` should be persisted by
    the caller if it is expensive to recompute (the projection above is
    a single narrow pass, so re-derivation is also fine).
    """
    cols = list(xcols)
    w = [0.0] * (len(cols) + 1)
    for _ in range(rounds):
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_z(w, cols)))
        err = p - F.col(label_col).cast("double")
        aggs = [F.sum(err).alias("g0"), F.count(F.lit(1)).alias("n")]
        aggs += [
            F.sum(err * F.col(c)).alias(f"g{i + 1}")
            for i, c in enumerate(cols)
        ]
        row = feats.agg(*aggs).collect()[0]
        n = float(row["n"])
        w = [
            w[j] - lr * float(row[f"g{j}"]) / n
            for j in range(len(cols) + 1)
        ]
        if any(not math.isfinite(v) for v in w):  # diverged step
            raise ValueError(f"train_logistic diverged: {w}")
    return w


def logistic_scores(
    feats: DataFrame,
    weights: list[float],
    xcols: tuple[str, ...] = ("x1", "x2", "x3"),
) -> DataFrame:
    """Append sigmoid(w.x) as ``score`` (keep decision = score >= t)."""
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_z(weights, list(xcols))))
    return feats.withColumn("score", p)
