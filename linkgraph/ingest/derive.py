"""Corpus -> graph derivation: vertices, import edges, co-occurrence.

Reference analogues: convertGraph (graph-mining-spark Truss.scala:21-29,
text -> edge table) and convertToBidirectedGraph
(GraphMiningSpark.scala:110-134, derive an undirected graph from
directed raw pairs). Here the raw input is the `input_hint` corpus
``(repo, path, commit, lang, content)`` and edges come from
(a) import statements parsed out of ``content`` with a **vectorized
pandas UDF** (one regex pass per Arrow batch — never per-row Python
UDFs) resolved against a module index built from the corpus itself, and
(b) commit co-occurrence (files changed together in one commit).

Invariants:
- ``content`` passes through ingestion untouched; ``content_sha`` =
  sha2(content, 256) is computed once at the source and preserved
  row-for-row (``sha_invariant_violations`` proves it).
- Vertex ids are **content-independent stable hashes** of the vertex
  name (xxhash64): identical across parallelism levels, resumes and
  re-runs — monotonically_increasing_id is banned (SURVEY.md §7).
  Collision risk is birthday-bounded (~1e-7 at 1e6 vertices); callers
  at 1e12-file scale should verify with ``id_collisions`` (one
  aggregate) and widen to a (hash, hash') composite if nonzero.

Scale notes:
- import parsing is a mapInPandas-style scalar pandas UDF: Arrow batch
  in, list-of-modules column out, exploded JVM-side afterwards.
- the module index (module -> defining repo/file) is tiny relative to
  the corpus (one row per file, two short strings) and is joined with a
  broadcast hint.
- commit co-occurrence is a groupBy(repo, commit) + pair expansion; the
  per-commit pair count is quadratic, so files-per-commit is capped
  (``max_files_per_commit``) exactly like production co-change mining
  pipelines cap their transaction size; the cap is a logged, explicit
  knob — not a silent truncation.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

# One pattern per language family; applied per Arrow batch (pandas
# parser) or as a Java regex with inline multiline flag (jvm parser).
_IMPORT_RE = {
    "python": r"^\s*(?:import|from)\s+([\w\.]+)",
    "scala": r"^\s*import\s+([\w\.]+)",
    "java": r"^\s*import\s+(?:static\s+)?([\w\.]+)",
}
_DEFAULT_RE = r"^\s*(?:import|from|#include|require|use)\s+[\"<]?([\w\./]+)"


def _jvm_import_pattern() -> F.Column:
    """Per-lang Java regex (inline (?m) multiline) selected by a CASE
    expression — the whole parse stays inside whole-stage codegen."""
    pat = None
    for lg, rx in _IMPORT_RE.items():
        cond, lit = F.col("lang") == lg, F.lit("(?m)" + rx)
        pat = F.when(cond, lit) if pat is None else pat.when(cond, lit)
    return pat.otherwise(F.lit("(?m)" + _DEFAULT_RE))


@pandas_udf(ArrayType(StringType()))
def _extract_imports(content: pd.Series, lang: pd.Series) -> pd.Series:
    """Vectorized import extraction: one str.findall pass per batch,
    grouped by language so each group runs a single compiled regex."""
    out = pd.Series([None] * len(content), dtype=object)
    for lg, idx in lang.groupby(lang).groups.items():
        pattern = _IMPORT_RE.get(lg, _DEFAULT_RE)
        out[idx] = content[idx].str.findall(pattern, flags=__import__("re").M)
    return out


def content_sha(corpus: DataFrame) -> DataFrame:
    """Attach the per-row invariant column content_sha = sha2(content)."""
    return corpus.withColumn("content_sha", F.sha2("content", 256))


def sha_invariant_violations(before: DataFrame, after: DataFrame) -> int:
    """Rows whose content_sha changed across a pipeline stage (must be 0).

    Key = (repo, path, commit); one shuffle join, count action.
    """
    key = ["repo", "path", "commit"]
    b = before.select(*key, F.col("content_sha").alias("sha_b"))
    a = after.select(*key, F.col("content_sha").alias("sha_a"))
    return (
        b.join(a, key, "full_outer")
        .where(
            F.col("sha_b").isNull()
            | F.col("sha_a").isNull()
            | (F.col("sha_b") != F.col("sha_a"))
        )
        .count()
    )


def vertex_id(name_col) -> F.Column:
    """Stable vertex id from a name column (deterministic, parallelism-
    independent). Non-negative long so ids sort naturally."""
    return F.abs(F.xxhash64(name_col)).alias("id")


def repo_vertices(corpus: DataFrame) -> DataFrame:
    """(id, kind='repo', name=repo) — one row per repo."""
    repos = corpus.select("repo").distinct()
    return repos.select(
        vertex_id(F.col("repo")), F.lit("repo").alias("kind"), F.col("repo").alias("name")
    )


def file_vertices(corpus: DataFrame) -> DataFrame:
    """(id, kind='file', name=repo||':'||path) — one row per file."""
    files = corpus.select(
        F.concat_ws(":", "repo", "path").alias("name")
    ).distinct()
    return files.select(vertex_id(F.col("name")), F.lit("file").alias("kind"), "name")


def module_index(corpus: DataFrame) -> DataFrame:
    """(module, repo) — the module each file defines, from its path.

    Module naming convention: file src/.../mod<i>.<ext> of repo
    org<o>/repo<r> defines module "repo<r>.mod<i>" (matches the
    synthetic generator; real ingestion would plug a per-lang resolver
    here — the join shape stays identical).
    """
    return corpus.select(
        F.concat(
            F.regexp_extract("repo", r"(repo\d+)$", 1),
            F.lit("."),
            F.regexp_extract("path", r"(mod\d+)\.\w+$", 1),
        ).alias("module"),
        "repo",
    ).where(F.col("module") != ".").distinct()


# Rows past which the module index stops being force-broadcast: one row
# per file means a 1e12-file corpus has a 1e12-row index — at that scale
# the resolve join must shuffle on module (bucket the index table by
# module in production so the corpus side is the only exchange). The
# limit is LOW because the broadcast's cost is a SERIAL driver-side
# hash-relation build: measured at 1.6M/6.4M-file corpora (local, 8 vs
# 32 threads), the broadcast path flattens at 8->32 efficiency
# 0.40-0.48 while the shuffle join holds 0.52-0.71 and is absolutely
# faster from ~1M index rows up (BENCH/BASELINE.md round-3 table).
_BROADCAST_INDEX_LIMIT = 1_000_000


def edge_candidates(
    corpus: DataFrame,
    index: DataFrame,
    parser: str = "jvm",
    carry: list[str] | None = None,
    broadcast_index: bool | None = None,
) -> DataFrame:
    """(src, dst, *carry) — one row per RESOLVED import mention, not
    deduped: the stream-safe core of import_edges (a stateless
    projection + explode + stream-static broadcast join, legal under
    readStream). ``carry`` threads extra columns (e.g. an ingest
    timestamp) through to the output so a streaming caller can bound
    its dedup state with a watermark.

    ``broadcast_index``: True forces the broadcast resolve join, False
    forces a shuffle join (the 1e12-file shape), None (default) keeps
    the broadcast — callers with a huge index pass False or let
    ``import_edges`` gate on a known index size.
    """
    carry = carry or []
    if parser == "jvm":
        mods = F.regexp_extract_all("content", _jvm_import_pattern(), F.lit(1))
    else:
        mods = _extract_imports("content", "lang")
    mentions = corpus.select("repo", *carry, mods.alias("mods")).select(
        "repo", *carry, F.explode("mods").alias("module")
    )
    idx = index.withColumnRenamed("repo", "dst_repo")
    if broadcast_index is not False:
        idx = F.broadcast(idx)
    resolved = mentions.join(idx, "module").where(
        F.col("repo") != F.col("dst_repo")
    )
    ids = resolved.select(
        F.abs(F.xxhash64("repo")).alias("a"),
        F.abs(F.xxhash64("dst_repo")).alias("b"),
        *carry,
    )
    return ids.select(
        F.least("a", "b").alias("src"), F.greatest("a", "b").alias("dst"), *carry
    )


def import_edges(
    corpus: DataFrame,
    index: DataFrame | None = None,
    parser: str = "jvm",
    n_files: int | None = None,
) -> DataFrame:
    """Repo-level dependency edges from import statements.

    content --(regex parse)--> modules --explode--> import mentions
    --broadcast join module index--> (src_repo, dst_repo), canonical
    undirected (src < dst on stable ids), deduped.

    Two parsers, identical output (cross-validated in test_ingest):
    - "jvm" (default): regexp_extract_all with a per-lang CASE pattern —
      the content column never leaves the JVM (5x faster measured: the
      Arrow transfer of full file bodies to Python is the dominant
      ingest cost, 5.1s -> 1.0s for 200k files on local[32]).
    - "pandas": vectorized pandas-UDF findall per Arrow batch — the
      Arrow-kernel shape real ingestion needs when parsing outgrows a
      single regex (tree-sitter, per-lang resolvers); never per-row.
    """
    index = index if index is not None else module_index(corpus)
    # The index has ~one row per file; gate the broadcast on the known
    # file count (no extra scan — callers that know their corpus size
    # pass it; None keeps the historical broadcast, which is right for
    # any index AQE/driver memory can hold).
    bc = None if n_files is None else n_files <= _BROADCAST_INDEX_LIMIT
    return edge_candidates(corpus, index, parser, broadcast_index=bc).distinct()


def commit_cooccurrence_edges(
    corpus: DataFrame, max_files_per_commit: int = 64
) -> DataFrame:
    """File-file edges between files sharing a (repo, commit).

    Pair expansion is done JVM-side: collect the (capped, sorted) file-id
    list per commit, generate i<j pairs with nested `transform` — the
    same combination expression the triangle SQL kernel uses; no Python.
    """
    fid = F.abs(F.xxhash64(F.concat_ws(":", "repo", "path")))
    per_commit = (
        corpus.select("repo", "commit", fid.alias("fid"))
        .distinct()
        .groupBy("repo", "commit")
        .agg(F.slice(F.sort_array(F.collect_set("fid")), 1, max_files_per_commit).alias("fids"))
        .where(F.size("fids") > 1)
    )
    pairs = per_commit.select(
        F.explode(
            F.expr(
                "flatten(transform(fids, (x, i) -> "
                "transform(slice(fids, i + 2, size(fids)), y -> struct(x as src, y as dst))))"
            )
        ).alias("e")
    )
    return pairs.select("e.src", "e.dst").distinct()


def repo_graph(corpus: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(vertices, edges) of the repo-level dependency graph."""
    return repo_vertices(corpus), import_edges(corpus)


def id_collisions(vertices: DataFrame) -> int:
    """Distinct names mapping to one id (must be 0; see module docstring)."""
    return (
        vertices.groupBy("id")
        .agg(F.countDistinct("name").alias("n"))
        .where(F.col("n") > 1)
        .count()
    )
