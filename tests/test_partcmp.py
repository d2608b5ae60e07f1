"""Partition agreement (ARI / NMI): Python-replay parity, identity and
degenerate-partition conventions, and label-name invariance."""

from __future__ import annotations

import math
import random
from collections import Counter

from linkgraph.graph.partcmp import contingency_table, partition_agreement


def _py_agreement(la, lb):
    ids = sorted(set(la) & set(lb))
    n = len(ids)
    cell = Counter((la[i], lb[i]) for i in ids)
    ai = Counter()
    bj = Counter()
    for (x, y), c in cell.items():
        ai[x] += c
        bj[y] += c
    c2 = lambda x: x * (x - 1) / 2.0
    sij = sum(c2(c) for c in cell.values())
    sa = sum(c2(c) for c in ai.values())
    sb = sum(c2(c) for c in bj.values())
    t = c2(n)
    if t == 0:
        ari = 1.0
    else:
        exp = sa * sb / t
        den = (sa + sb) / 2.0 - exp
        ari = 1.0 if den == 0 else (sij - exp) / den
    mi = sum(
        (c / n) * math.log(n * c / (ai[x] * bj[y]))
        for (x, y), c in cell.items()
    )
    ha = -sum((c / n) * math.log(c / n) for c in ai.values())
    hb = -sum((c / n) * math.log(c / n) for c in bj.values())
    if ha == 0 and hb == 0:
        nmi = 1.0
    elif ha == 0 or hb == 0:
        nmi = 0.0
    else:
        nmi = mi / math.sqrt(ha * hb)
    return n, ari, nmi


def _lab_df(spark, labels):
    return spark.createDataFrame(
        [(int(i), int(c)) for i, c in labels.items()], "id long, label long"
    )


def _run(spark, la, lb):
    row = partition_agreement(_lab_df(spark, la), _lab_df(spark, lb)).collect()[0]
    return row["n"], row["ari"], row["nmi"]


def test_identical_partitions(spark):
    la = {i: i % 3 for i in range(30)}
    n, ari, nmi = _run(spark, la, la)
    assert n == 30 and ari == 1.0 and abs(nmi - 1.0) < 1e-12


def test_label_name_invariance(spark):
    la = {i: i % 4 for i in range(40)}
    lb = {i: (i % 4) * 100 + 7 for i in range(40)}  # renamed clusters
    _, ari, nmi = _run(spark, la, lb)
    assert ari == 1.0 and abs(nmi - 1.0) < 1e-12


def test_replay_parity_random(spark):
    rng = random.Random(31)
    la = {i: rng.randrange(5) for i in range(200)}
    lb = {i: rng.randrange(4) for i in range(200)}
    n, ari, nmi = _run(spark, la, lb)
    wn, wari, wnmi = _py_agreement(la, lb)
    assert n == wn
    assert abs(ari - wari) < 1e-9
    assert abs(nmi - wnmi) < 1e-9
    # near-independent labelings: both scores near 0
    assert abs(ari) < 0.15 and nmi < 0.15


def test_refinement_and_degenerate(spark):
    # B refines A (each A-cluster split in two): high-but-not-1 scores
    la = {i: i % 2 for i in range(40)}
    lb = {i: i % 4 for i in range(40)}
    n, ari, nmi = _run(spark, la, lb)
    wn, wari, wnmi = _py_agreement(la, lb)
    assert abs(ari - wari) < 1e-9 and abs(nmi - wnmi) < 1e-9
    assert 0 < ari < 1 and 0 < nmi < 1
    # one-cluster vs many: NMI 0 by convention; ARI 0 (denominator > 0)
    lone = {i: 0 for i in range(40)}
    _, ari2, nmi2 = _run(spark, lone, lb)
    assert nmi2 == 0.0 and abs(ari2) < 1e-12
    # both single-cluster: identical trivial partitions
    _, ari3, nmi3 = _run(spark, lone, lone)
    assert ari3 == 1.0 and nmi3 == 1.0


def test_contingency_and_common_ids_only(spark):
    la = {i: i % 2 for i in range(10)}
    lb = {i: i % 2 for i in range(5, 15)}  # overlap = 5..9
    cells = {
        (r["label_a"], r["label_b"]): r["n"]
        for r in contingency_table(_lab_df(spark, la), _lab_df(spark, lb)).collect()
    }
    assert sum(cells.values()) == 5
    n, ari, _ = _run(spark, la, lb)
    assert n == 5 and ari == 1.0
