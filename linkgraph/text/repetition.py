"""Gopher-style repetition quality signals (Rae et al. 2021, table A1).

Excess-repetition is the strongest single quality filter for web-scale
training corpora: boilerplate, SEO spam, and templated pages repeat
lines, paragraphs, and n-grams far above natural-language rates. Two
families, both fully JVM-side:

- **Duplicate line / paragraph fractions** — per-document array
  algebra (split -> distinct -> length sums), zero shuffles: the
  signals append inside the scan's project, so the filter costs one
  pass over the corpus at any scale.
- **n-gram fractions** — top-{2,3,4}-gram character coverage and
  duplicated-{5..10}-gram character coverage. These need per-(doc,
  gram) counts, which is one explode + two hash aggregates + one join
  back on doc id — the same shape as the inverted-index dedup, and
  partial aggregation collapses gram counts map-side before the
  shuffle.

Definitions (duplicate-occurrence convention, documented because
Gopher's appendix leaves overlap handling unspecified):

  dup_line_frac        = 1 - #distinct lines / #lines
  dup_line_char_frac   = 1 - chars(distinct lines) / chars(all lines)
  (paragraphs: same with blank-line splits)
  top{n}_gram_char_frac = count(most frequent n-gram) * len(gram)
                          / chars(text)
  dup{n}_gram_char_frac = sum over grams with count>1 of
                          count * len(gram) / chars(text), capped at 1
                          (overlapping occurrences counted in full)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _nonempty(parts: Column) -> Column:
    return F.filter(parts, lambda x: F.trim(x) != "")


def _chars(arr: Column) -> Column:
    return F.aggregate(
        arr, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )


def _dup_fracs(parts: Column, prefix: str) -> list[Column]:
    n = F.size(parts)
    distinct = F.array_distinct(parts)
    frac = F.when(n > 0, 1.0 - F.size(distinct) / n).otherwise(F.lit(0.0))
    tot = _chars(parts)
    cfrac = F.when(tot > 0, 1.0 - _chars(distinct) / tot).otherwise(F.lit(0.0))
    return [
        frac.cast("double").alias(f"dup_{prefix}_frac"),
        cfrac.cast("double").alias(f"dup_{prefix}_char_frac"),
    ]


def line_repetition(df: DataFrame, col: str = "text") -> DataFrame:
    """Append dup_line_frac / dup_line_char_frac / dup_para_frac /
    dup_para_char_frac. Pure per-row array algebra — no shuffle."""
    lines = _nonempty(F.split(F.col(col), r"\n"))
    paras = _nonempty(F.split(F.col(col), r"\n\s*\n"))
    return df.select(
        "*", *_dup_fracs(lines, "line"), *_dup_fracs(paras, "para")
    )


def ngram_repetition(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 10),
) -> DataFrame:
    """Append top{n}_gram_char_frac (n in top_ns) and
    dup{n}_gram_char_frac (n in dup_ns).

    One explode over all requested n simultaneously (grams tagged with
    their n), one (id, n, gram) count with map-side combine, one
    (id, n) roll-up, one join back on id. Documents shorter than n
    words contribute no grams and get 0.0.
    """
    ws = F.split(F.lower(F.trim(F.col(col))), r"\s+")
    total = F.length(F.col(col)).cast("double")

    def grams_for(n: int) -> Column:
        # Spark's sequence(1, 0) counts DOWN; docs shorter than n words
        # must yield an empty gram array instead.
        grams = F.transform(
            F.sequence(F.lit(1), F.size(ws) - (n - 1)),
            lambda i: F.struct(
                F.lit(n).alias("n"),
                F.concat_ws(" ", F.slice(ws, i, n)).alias("gram"),
            ),
        )
        empty = F.array().cast(f"array<struct<n:int,gram:string>>")
        return F.when(F.size(ws) >= n, grams).otherwise(empty)

    all_ns = sorted(set(top_ns) | set(dup_ns))
    exploded = df.select(
        F.col(id_col).alias("_rid"),
        total.alias("_total"),
        F.explode(F.flatten(F.array(*[grams_for(n) for n in all_ns]))).alias("g"),
    ).select("_rid", "_total", F.col("g.n").alias("n"), F.col("g.gram").alias("gram"))

    counted = exploded.groupBy("_rid", "_total", "n", "gram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    cover = F.col("cnt") * F.length("gram")
    per_n = counted.groupBy("_rid", "_total", "n").agg(
        F.max(cover).alias("top_cover"),
        F.sum(F.when(F.col("cnt") > 1, cover).otherwise(0)).alias("dup_cover"),
    )
    frac = lambda c: F.least(c / F.col("_total"), F.lit(1.0))  # noqa: E731
    aggs = []
    for n in top_ns:
        aggs.append(
            F.max(F.when(F.col("n") == n, frac(F.col("top_cover"))))
            .alias(f"top{n}_gram_char_frac")
        )
    for n in dup_ns:
        aggs.append(
            F.max(F.when(F.col("n") == n, frac(F.col("dup_cover"))))
            .alias(f"dup{n}_gram_char_frac")
        )
    feats = per_n.groupBy("_rid").agg(*aggs)
    out = df.join(feats, df[id_col] == feats["_rid"], "left_outer").drop("_rid")
    fills = {
        f"top{n}_gram_char_frac": 0.0 for n in top_ns
    } | {f"dup{n}_gram_char_frac": 0.0 for n in dup_ns}
    return out.fillna(fills)


def repetition_features(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 10),
) -> DataFrame:
    """All repetition signals appended (lines/paragraphs + n-grams)."""
    return ngram_repetition(
        line_repetition(df, col), col, id_col, top_ns, dup_ns
    )


def gopher_repetition_filter(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop documents above the Gopher table-A1 repetition thresholds
    (dup lines > 0.30, dup paragraphs > 0.30, dup line/para chars >
    0.20, top 2/3/4-gram chars > 0.20/0.18/0.16, dup 5/10-gram chars >
    0.15/0.10)."""
    feats = repetition_features(df, col, id_col, top_ns=(2, 3, 4), dup_ns=(5, 10))
    keep = (
        (F.col("dup_line_frac") <= 0.30)
        & (F.col("dup_para_frac") <= 0.30)
        & (F.col("dup_line_char_frac") <= 0.20)
        & (F.col("dup_para_char_frac") <= 0.20)
        & (F.col("top2_gram_char_frac") <= 0.20)
        & (F.col("top3_gram_char_frac") <= 0.18)
        & (F.col("top4_gram_char_frac") <= 0.16)
        & (F.col("dup5_gram_char_frac") <= 0.15)
        & (F.col("dup10_gram_char_frac") <= 0.10)
    )
    return feats.where(keep).select(*df.columns)
