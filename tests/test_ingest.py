"""Ingestion: synthetic corpus, graph derivation, sha256 invariant."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from linkgraph.ingest import (
    commit_cooccurrence_edges,
    content_sha,
    import_edges,
    repo_vertices,
    sha_invariant_violations,
    synthetic_corpus,
)
from linkgraph.ingest.derive import file_vertices, id_collisions, module_index


def test_corpus_shape_and_determinism(spark):
    c1 = synthetic_corpus(spark, n_files=200, seed=42)
    assert c1.columns == ["repo", "path", "commit", "lang", "content"]
    assert c1.count() == 200
    # deterministic across parallelism levels: same rows at 2 vs 16 parts
    a = sorted(map(tuple, synthetic_corpus(spark, 200, partitions=2).collect()))
    b = sorted(map(tuple, synthetic_corpus(spark, 200, partitions=16).collect()))
    assert a == b
    langs = {r["lang"] for r in c1.select("lang").distinct().collect()}
    assert langs <= {"python", "scala", "java"}
    assert all(len(r["commit"]) == 40 for r in c1.select("commit").collect())


def test_content_sha_matches_python_hashlib(spark):
    corpus = content_sha(synthetic_corpus(spark, n_files=50))
    for row in corpus.collect():
        assert (
            row["content_sha"]
            == hashlib.sha256(row["content"].encode()).hexdigest()
        )


def test_sha_invariant_through_pipeline(spark):
    before = content_sha(synthetic_corpus(spark, n_files=100))
    # a representative pipeline stage: repartition + projection shuffle
    after = before.repartition(8, "repo").select(
        "repo", "path", "commit", "lang", "content", "content_sha"
    )
    assert sha_invariant_violations(before, after) == 0
    # and a corrupted stage is caught
    bad = before.withColumn(
        "content_sha",
        F.when(F.col("path").endswith("mod0.py"), F.lit("deadbeef")).otherwise(
            F.col("content_sha")
        ),
    )
    assert sha_invariant_violations(before, bad) >= 1


def test_vertices_stable_ids(spark):
    corpus = synthetic_corpus(spark, n_files=200)
    v1 = {(r["id"], r["name"]) for r in repo_vertices(corpus).collect()}
    v2 = {
        (r["id"], r["name"])
        for r in repo_vertices(corpus.repartition(16)).collect()
    }
    assert v1 == v2 and len(v1) == 50
    files = file_vertices(corpus)
    assert files.count() == 200
    assert id_collisions(files) == 0


def test_module_index_and_import_edges(spark):
    corpus = synthetic_corpus(spark, n_files=300)
    idx = module_index(corpus)
    assert idx.count() == 300  # one module per file
    edges = import_edges(corpus)
    rows = edges.collect()
    assert len(rows) > 0
    assert all(r["src"] < r["dst"] for r in rows)
    # hub fixture: repo0's vertex participates in many edges
    hub_id = [
        r["id"] for r in repo_vertices(corpus).collect() if r["name"] == "org0/repo0"
    ][0]
    hub_deg = sum(1 for r in rows if hub_id in (r["src"], r["dst"]))
    assert hub_deg >= 10


def test_import_edges_match_bruteforce(spark):
    """Oracle: parse the generated content in plain Python, resolve
    against the module->repo map, compare edge sets exactly."""
    import re

    corpus = synthetic_corpus(spark, n_files=150)
    data = corpus.collect()
    mod_of = {}
    for r in data:
        m = re.search(r"(repo\d+)$", r["repo"])
        f = re.search(r"(mod\d+)\.\w+$", r["path"])
        mod_of[f"{m.group(1)}.{f.group(1)}"] = r["repo"]
    expected = set()
    for r in data:
        for mod in re.findall(r"^\s*(?:import|from)\s+([\w\.]+)", r["content"], re.M):
            dst = mod_of.get(mod)
            if dst and dst != r["repo"]:
                import hashlib as _h  # ids via spark, just compare names

                expected.add(tuple(sorted((r["repo"], dst))))
    # map expected repo pairs to id pairs using spark's hash
    name_to_id = {
        r["name"]: r["id"] for r in repo_vertices(corpus).collect()
    }
    expected_ids = {
        tuple(sorted((name_to_id[a], name_to_id[b]))) for a, b in expected
    }
    got = {(r["src"], r["dst"]) for r in import_edges(corpus).collect()}
    assert got == expected_ids


def test_import_parser_jvm_pandas_parity(spark):
    """The JVM regexp_extract_all parser and the pandas-UDF parser must
    produce the identical edge set on a mixed-language corpus."""
    corpus = synthetic_corpus(spark, n_files=250)
    jvm = {(r["src"], r["dst"]) for r in import_edges(corpus, parser="jvm").collect()}
    pdu = {(r["src"], r["dst"]) for r in import_edges(corpus, parser="pandas").collect()}
    assert jvm == pdu and len(jvm) > 0


def test_commit_cooccurrence_edges(spark):
    corpus = synthetic_corpus(spark, n_files=400)
    edges = commit_cooccurrence_edges(corpus)
    rows = edges.collect()
    assert len(rows) > 0
    assert all(r["src"] < r["dst"] for r in rows)
    # every edge joins two files of the SAME repo (co-change is intra-repo)
    files = corpus.select(
        F.abs(F.xxhash64(F.concat_ws(":", "repo", "path"))).alias("fid"), "repo"
    ).collect()
    fid_to_repo = {r["fid"]: r["repo"] for r in files}
    assert all(fid_to_repo[r["src"]] == fid_to_repo[r["dst"]] for r in rows)


def test_import_edges_shuffle_join_path_matches_broadcast(spark):
    """Past _BROADCAST_INDEX_LIMIT files the resolve join shuffles
    instead of broadcasting the per-file module index; both paths must
    produce the identical edge set."""
    corpus = synthetic_corpus(spark, n_files=300)
    bc = {(r["src"], r["dst"]) for r in import_edges(corpus).collect()}
    sh = {
        (r["src"], r["dst"])
        for r in import_edges(corpus, n_files=10**13).collect()
    }
    assert bc == sh and len(bc) > 0
