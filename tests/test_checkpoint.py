"""Superstep checkpointing: manifests, latest/load, mid-iteration resume.

Resume protocol (SURVEY.md §5f): interrupt a run after superstep s (here:
run with a small iteration cap against a durable checkpoint dir), start
the same job again on the same dir, and the continuation must reproduce
the uninterrupted run — exactly for integer-labelled outputs (CC, LPA,
truss), to float-reduction tolerance for PageRank scores.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from linkgraph.checkpoint import MANIFEST, Checkpointer
from linkgraph.graph.components import connected_components
from linkgraph.graph.labelprop import label_propagation
from linkgraph.graph.pagerank import pagerank
from linkgraph.graph.truss import k_truss
from tests.conftest import canonical_pairs, ring_of_cliques


def _labels(df):
    return sorted((r["id"], r["label"]) for r in df.collect())


def _graph(spark):
    from linkgraph.graph.edges import canonicalize

    return canonicalize(ring_of_cliques(spark, 4, 5)).localCheckpoint(eager=True)


def test_manifest_contents(spark, tmp_path):
    g = _graph(spark)
    ckpt = Checkpointer(spark, dir=str(tmp_path), job="pr")
    pagerank(g, max_iter=3, tol=0.0, checkpointer=ckpt)
    step_dir = os.path.join(str(tmp_path), "pr", "superstep=00001")
    with open(os.path.join(step_dir, MANIFEST)) as fh:
        m = json.load(fh)
    assert m["superstep"] == 1
    assert m["rows"] == 20
    assert m["job"] == "pr"
    assert m["partitions"] and all("file" in p and "bytes" in p for p in m["partitions"])
    assert ckpt.latest() == 3


def test_pagerank_resume_matches_uninterrupted(spark, tmp_path):
    g = _graph(spark)
    full = pagerank(
        g, max_iter=10, tol=0.0, checkpointer=Checkpointer(spark, dir=str(tmp_path / "a"), job="pr")
    )
    ckpt_b = Checkpointer(spark, dir=str(tmp_path / "b"), job="pr")
    pagerank(g, max_iter=4, tol=0.0, checkpointer=ckpt_b)  # "killed" after step 4
    assert ckpt_b.latest() == 4
    resumed = pagerank(
        g, max_iter=10, tol=0.0, checkpointer=Checkpointer(spark, dir=str(tmp_path / "b"), job="pr")
    )
    assert resumed.iterations == 10
    assert len(resumed.counters) == 6  # only steps 5..10 re-ran
    a = {r["id"]: r["rank"] for r in full.ranks.collect()}
    b = {r["id"]: r["rank"] for r in resumed.ranks.collect()}
    assert a.keys() == b.keys()
    assert all(abs(a[k] - b[k]) < 1e-12 for k in a)


def test_components_resume_exact(spark, tmp_path):
    g = _graph(spark)
    full = connected_components(g, checkpointer=Checkpointer(spark, dir=str(tmp_path / "a"), job="cc"))
    connected_components(
        g, checkpointer=Checkpointer(spark, dir=str(tmp_path / "b"), job="cc"), max_rounds=1
    )
    resumed = connected_components(
        g, checkpointer=Checkpointer(spark, dir=str(tmp_path / "b"), job="cc")
    )
    assert _labels(full) == _labels(resumed)


def test_labelprop_resume_exact(spark, tmp_path):
    g = _graph(spark)
    full = label_propagation(
        g, max_iter=8, checkpointer=Checkpointer(spark, dir=str(tmp_path / "a"), job="lpa")
    )
    label_propagation(
        g, max_iter=2, checkpointer=Checkpointer(spark, dir=str(tmp_path / "b"), job="lpa")
    )
    resumed = label_propagation(
        g, max_iter=8, checkpointer=Checkpointer(spark, dir=str(tmp_path / "b"), job="lpa")
    )
    assert _labels(full.labels) == _labels(resumed.labels)


def test_truss_resume_exact(spark, truss_mini, tmp_path):
    full = k_truss(
        truss_mini, 4, checkpointer=Checkpointer(spark, dir=str(tmp_path / "a"), job="t4")
    )
    k_truss(
        truss_mini, 4, checkpointer=Checkpointer(spark, dir=str(tmp_path / "b"), job="t4"),
        max_rounds=1,
    )
    resumed = k_truss(
        truss_mini, 4, checkpointer=Checkpointer(spark, dir=str(tmp_path / "b"), job="t4")
    )
    assert canonical_pairs(resumed.edges) == canonical_pairs(full.edges)
    assert resumed.n_edges == full.n_edges == 18
    # the per-round counters carry the loop state that makes resume exact
    assert all("alive_edges" in c for c in resumed.counters)


def test_latest_skips_incomplete(spark, tmp_path):
    ckpt = Checkpointer(spark, dir=str(tmp_path), job="j")
    df = spark.range(5).select(F.col("id"))
    ckpt.save(df, 0)
    ckpt.save(df, 1)
    # simulate a crash mid-write of step 2: directory without manifest
    os.makedirs(os.path.join(str(tmp_path), "j", "superstep=00002"))
    assert ckpt.latest() == 1
    loaded, manifest = ckpt.load(1)
    assert loaded.count() == 5 and manifest["rows"] == 5
