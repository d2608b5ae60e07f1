"""Driver-contract guard for __spark_entry__.queries().

The driver's correctness gate evaluates the FIRST 50 entries of the
registry (round-2 verdict: inserting queries ahead of the LLM-pipeline
block silently ejected it from the gate).  This test pins the curated
contract slice so future insertions can't eject rows again.
"""

from __future__ import annotations

import importlib
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]

# The curated first-50 contract set (order-insensitive membership check;
# the exact ordering inside the window doesn't matter to the driver).
#
# ROTATION HISTORY (VERDICT r4 item 6 — each round ~10 long-green rows
# swap out for rows that so far only have full-registry-log evidence,
# so all 137 queries accumulate driver-grade CORRECTNESS rows over
# rounds; the FORMERLY_RED seven never rotate out):
# - round 4: "triangles" (join variant) -> "wordpiece_tokens"; G5
#   semantics stay pinned by triangles_sql/triangles_csr/triangle_count.
# - round 5 out: degrees, edge_support, reciprocal_edges, kcore_4,
#   dedup_exact, embedding_topk, paragraph_dedup, events_window_counts,
#   events_funnel, events_asof (oracles untouched by the round-5
#   diffs; families stay pinned by sibling rows + pytest).
# - round 5 in: training_shards, betweenness, louvain_communities,
#   scc_labels, hyperball_balls, sssp_weighted, fiedler_vector,
#   item_similarity, butterfly_count, windowed_pagerank.
CONTRACT_SET = {
    # graph core
    "copurchase_edges",
    "degree_histogram",
    "wordpiece_tokens",
    "triangles_csr",
    "triangle_count",
    "connected_components",
    "pagerank",
    "label_propagation",
    "ktruss_4",
    "max_truss",
    "truss_decomposition",
    # round-5 rotation: wider graph-operator coverage
    "betweenness",
    "louvain_communities",
    "scc_labels",
    "hyperball_balls",
    "sssp_weighted",
    "fiedler_vector",
    "item_similarity",
    "butterfly_count",
    "windowed_pagerank",
    # LLM data pipeline
    "dedup_groups",
    "dedup_against",
    "dedup_clusters",
    "minhash_pairs",
    "simhash_pairs",
    "ngram_jaccard",
    "embedding_lsh",
    "ivf_topk",
    "semantic_dedup",
    "duplicate_spans",
    "duplicate_fraction",
    "token_stats",
    "quality_features",
    "language_id",
    "sequence_packing",
    "training_shards",
    "tfidf_top_terms",
    "vocabulary",
    "oov_rate",
    "bpe_char_pairs",
    "ngram_decontamination",
    "c4_filter_stats",
    "gopher_filter_stats",
    "code_filter_stats",
    "repetition_features",
    "pii_redaction",
    "quality_classifier",
    "dsir_resample",
    "media_features",
    "events_sessionize",
}

# Rows that FAILED the round-1 driver gate — these may never leave the
# driver's window again.
FORMERLY_RED = {
    "minhash_pairs",
    "simhash_pairs",
    "ngram_jaccard",
    "embedding_lsh",
    "ivf_topk",
    "media_features",
    "events_sessionize",
}


def _load_entry_module():
    sys.path.insert(0, str(REPO_ROOT))
    try:
        return importlib.import_module("__spark_entry__")
    finally:
        sys.path.pop(0)


def test_contract_set_is_exactly_the_first_50_registry_entries():
    mod = _load_entry_module()
    keys = list(mod.queries().keys())
    assert len(keys) == len(set(keys)), "duplicate registry keys"
    window = set(keys[: mod._CONTRACT_SET_SIZE])
    assert mod._CONTRACT_SET_SIZE == 50
    assert len(CONTRACT_SET) == 50
    missing = CONTRACT_SET - window
    intruders = window - CONTRACT_SET
    assert not missing, f"contract rows ejected from driver window: {sorted(missing)}"
    assert not intruders, f"non-contract rows inside driver window: {sorted(intruders)}"


def test_formerly_red_rows_stay_in_driver_window():
    mod = _load_entry_module()
    window = set(list(mod.queries().keys())[:50])
    assert FORMERLY_RED <= window


def test_every_contract_query_has_a_value_oracle():
    mod = _load_entry_module()
    oracles = mod.oracle_sql()
    window = list(mod.queries().keys())[:50]
    missing = [k for k in window if k not in oracles]
    assert not missing, f"contract queries without oracle_sql: {missing}"
