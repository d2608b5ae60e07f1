"""Dedup family: exact, MinHash-LSH, n-gram Jaccard, SimHash, embedding."""

from __future__ import annotations

import numpy as np
import pytest

from linkgraph.dedup import (
    deduplicate_exact,
    embedding_near_duplicates,
    exact_duplicate_groups,
    minhash_near_duplicates,
    ngram_jaccard_pairs,
    simhash_near_duplicates,
    simhash_signatures,
)
from linkgraph.dedup.embedding import brute_force_pairs


def docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


BASE = " ".join(f"word{i}" for i in range(60))
NEAR = BASE.replace("word30", "changed")          # ~0.95 shingle overlap
FAR = " ".join(f"other{i}" for i in range(60))


def test_exact_dedup(spark):
    df = docs(spark, [BASE, BASE, FAR, BASE, FAR])
    groups = exact_duplicate_groups(df).collect()
    assert {(g["n_docs"], g["min_id"]) for g in groups} == {(3, 0), (2, 2)}
    kept = deduplicate_exact(df)
    assert sorted(r["doc_id"] for r in kept.collect()) == [0, 2]
    # normalization variant folds whitespace/case
    df2 = docs(spark, ["Hello  World", "hello world"])
    assert deduplicate_exact(df2, normalize=True).count() == 1
    assert deduplicate_exact(df2, normalize=False).count() == 2


def test_minhash_finds_near_duplicates(spark):
    df = docs(spark, [BASE, NEAR, FAR])
    pairs = minhash_near_duplicates(df, threshold=0.6)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 1) in got
    assert all(2 not in p for p in got)


def test_ngram_jaccard_exact_values(spark):
    df = docs(spark, [BASE, NEAR, FAR])
    pairs = ngram_jaccard_pairs(df, threshold=0.1)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}
    assert set(got) == {(0, 1)}
    # brute-force 3-gram jaccard oracle
    def sh(t):
        w = t.lower().split()
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    expect = len(sh(BASE) & sh(NEAR)) / len(sh(BASE) | sh(NEAR))
    assert got[(0, 1)] == pytest.approx(expect)


def test_simhash_signature_properties(spark):
    df = docs(spark, [BASE, BASE, NEAR, FAR])
    sigs = {r["id"]: r["simhash"] for r in simhash_signatures(df).collect()}
    assert sigs[0] == sigs[1]  # identical docs -> identical signature
    ham = bin((sigs[0] ^ sigs[2]) & (2**64 - 1)).count("1")
    ham_far = bin((sigs[0] ^ sigs[3]) & (2**64 - 1)).count("1")
    assert ham < ham_far


def test_simhash_near_duplicates(spark):
    df = docs(spark, [BASE, NEAR, FAR])
    pairs = simhash_near_duplicates(df, max_hamming=8)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 1) in got
    assert all(2 not in p for p in got)


def _emb_df(spark):
    rng = np.random.default_rng(0)
    base = rng.standard_normal(16)
    rows = [
        (0, base.tolist()),
        (1, (base + 0.01 * rng.standard_normal(16)).tolist()),  # near-dup of 0
        (2, rng.standard_normal(16).tolist()),
        (3, (-base).tolist()),  # anti-correlated
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_embedding_near_duplicates_vs_bruteforce(spark):
    df = _emb_df(spark)
    brute = {
        (r["id_a"], r["id_b"]) for r in brute_force_pairs(df, threshold=0.95).collect()
    }
    assert brute == {(0, 1)}
    lsh = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_duplicates(
            df, threshold=0.95, n_planes=8, n_tables=8
        ).collect()
    }
    assert lsh == brute  # full recall at these settings on this input
    portable = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_duplicates(
            df, threshold=0.95, n_planes=8, n_tables=8, portable=True
        ).collect()
    }
    assert portable == brute  # deterministic-plane variant, same recall


def test_dedup_runs_on_documents_parquet(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert deduplicate_exact(df).count() <= df.count()
    assert minhash_near_duplicates(df.limit(100), threshold=0.9).count() >= 0


# -- portable (cross-engine) hash family --------------------------------


def _py_poly(s: str, mult: int, mod: int) -> int:
    h = 0
    for ch in s:
        h = (h * mult + ord(ch)) % mod
    return h


def test_phash_matches_python_reference(spark):
    from pyspark.sql import functions as F

    from linkgraph.dedup import phash

    rows = [("hello world foo",), ("",), ("a",), ("Word9 word10 word11",)]
    df = spark.createDataFrame(rows, "s string")
    got = [
        (r["h1"], r["h62"])
        for r in df.select(
            phash.poly_hash(F.col("s")).alias("h1"),
            phash.token_hash62(F.col("s")).alias("h62"),
        ).collect()
    ]
    for (s,), (h1, h62) in zip(rows, got):
        assert h1 == _py_poly(s, 31, phash.P1)
        assert h62 == (_py_poly(s, 31, phash.P1) << 31) + _py_poly(s, 37, phash.P2)
        assert 0 <= h62 < 2**62  # sign-safe, top bits clear in any engine


def test_minhash_signature_slots_are_independent(spark):
    """Regression for the transform-lambda arity bug: a two-parameter
    lambda made PySpark bind the ARRAY INDEX as the hash-function index,
    collapsing all 32 signature slots into one function. With distinct
    per-slot functions, a multi-shingle doc's slots must not all agree."""
    from linkgraph.dedup.minhash import minhash_signatures, shingle_sets

    df = docs(spark, [BASE])
    for portable in (False, True):
        sig = (
            minhash_signatures(shingle_sets(df, portable=portable), 32, portable)
            .select("sig")
            .collect()[0][0]
        )
        assert len(set(sig)) > 16, f"degenerate signature (portable={portable})"


def test_portable_pipelines_match_duckdb_oracle(spark):
    """The real contract behind the driver's minhash/simhash rows: the
    portable-hash Spark pipeline and the pure-SQL DuckDB oracle produce
    byte-identical pair sets on the same parquet documents table."""
    duckdb = pytest.importorskip("duckdb")
    import __spark_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'")
    oracles = entrymod.oracle_sql()
    for name, fn in (
        ("minhash_pairs", entrymod._q_minhash),
        ("simhash_pairs", entrymod._q_simhash),
        ("embedding_lsh", entrymod._q_embedding_lsh),
    ):
        sp = sorted(map(tuple, fn(spark, sf).collect()))
        du = sorted(map(tuple, con.sql(oracles[name]).fetchall()))
        assert sp == du, f"{name}: spark {len(sp)} rows vs duckdb {len(du)}"


def test_near_duplicate_clusters_transitive(spark):
    from linkgraph.dedup.cluster import deduplicate_near, near_duplicate_clusters

    # chain: 0 ~ 1 ~ 2 (each adjacent pair near-dup); 0 vs 2 drifts
    # further but transitivity must still pool all three. 3 is far.
    a = BASE
    b = BASE.replace("word10", "x10")
    c = b.replace("word40", "x40")
    df = docs(spark, [a, b, c, FAR])
    got = {
        r["id"]: r["group_id"]
        for r in near_duplicate_clusters(df, threshold=0.7).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 3}

    kept = sorted(r["doc_id"] for r in deduplicate_near(df, threshold=0.7).collect())
    assert kept == [0, 3]


def test_clusters_no_pairs_all_singletons(spark):
    from linkgraph.dedup.cluster import near_duplicate_clusters

    df = docs(spark, [BASE, FAR])
    got = {
        r["id"]: r["group_id"]
        for r in near_duplicate_clusters(df, threshold=0.7).collect()
    }
    assert got == {0: 0, 1: 1}
