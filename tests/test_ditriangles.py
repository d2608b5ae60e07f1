"""Directed triangle census: hand goldens for every triad type, an
exhaustive single-triangle orientation sweep, and a random-digraph
Python replay (with mutual edges)."""

from __future__ import annotations

import itertools
import random

from linkgraph.graph.ditriangles import (
    directed_triangle_census,
    directed_triangle_counts,
)


def _df(spark, arcs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in arcs], "src long, dst long"
    )


# ------------------------------------------------------------ replay --
def _py_census(arcs):
    arcs = set(arcs)
    sup = {tuple(sorted(e)) for e in arcs if e[0] != e[1]}
    adj = {}
    for lo, hi in sup:
        adj.setdefault(lo, set()).add(hi)
        adj.setdefault(hi, set()).add(lo)

    def state(lo, hi):
        f, r = (lo, hi) in arcs, (hi, lo) in arcs
        return "M" if f and r else ("F" if f else "R")

    out = {}
    for a in sorted(adj):
        for b, c in itertools.combinations(sorted(x for x in adj[a] if x > a), 2):
            if (b, c) not in sup:
                continue
            s_ab, s_bc, s_ac = state(a, b), state(b, c), state(a, c)
            nm = [s_ab, s_bc, s_ac].count("M")
            if nm == 3:
                t = "all_mutual"
            elif nm == 2:
                t = "two_mutual"
            elif nm == 1:
                if s_ab == "M":
                    pair = (s_bc, s_ac)
                    t = ("one_mutual_source" if pair == ("R", "R")
                         else "one_mutual_sink" if pair == ("F", "F")
                         else "one_mutual_flow")
                elif s_bc == "M":
                    pair = (s_ab, s_ac)
                    t = ("one_mutual_source" if pair == ("F", "F")
                         else "one_mutual_sink" if pair == ("R", "R")
                         else "one_mutual_flow")
                else:
                    pair = (s_ab, s_bc)
                    t = ("one_mutual_source" if pair == ("R", "F")
                         else "one_mutual_sink" if pair == ("F", "R")
                         else "one_mutual_flow")
            elif (s_ab, s_bc, s_ac) in (("F", "F", "R"), ("R", "R", "F")):
                t = "cyclic"
            else:
                t = "transitive"
            out[(a, b, c)] = t
    return out


def _spark_census(spark, arcs):
    rows = directed_triangle_census(_df(spark, arcs)).collect()
    return {(r["a"], r["b"], r["c"]): r["ttype"] for r in rows}


# -------------------------------------------------------------- tests --
def test_goldens(spark):
    assert _spark_census(spark, [(0, 1), (1, 2), (2, 0)]) == {
        (0, 1, 2): "cyclic"
    }
    assert _spark_census(spark, [(0, 1), (0, 2), (1, 2)]) == {
        (0, 1, 2): "transitive"
    }
    assert _spark_census(spark, [(0, 1), (1, 0), (0, 2), (1, 2)]) == {
        (0, 1, 2): "one_mutual_sink"
    }
    assert _spark_census(spark, [(0, 1), (1, 0), (2, 0), (2, 1)]) == {
        (0, 1, 2): "one_mutual_source"
    }
    assert _spark_census(spark, [(0, 1), (1, 0), (0, 2), (2, 1)]) == {
        (0, 1, 2): "one_mutual_flow"
    }
    assert _spark_census(spark, [(0, 1), (1, 0), (0, 2), (2, 0), (1, 2)]) == {
        (0, 1, 2): "two_mutual"
    }
    assert _spark_census(
        spark, [(0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (2, 1)]
    ) == {(0, 1, 2): "all_mutual"}


def test_exhaustive_single_triangle(spark):
    """All 27 dyad-state assignments of one triangle match the replay.

    Builds ONE disjoint triangle per assignment (vertex blocks of 3)
    so a single Spark job covers every branch of the CASE."""
    arcs = []
    expected = {}
    base = 0
    for states in itertools.product("FRM", repeat=3):
        a, b, c = base, base + 1, base + 2
        for (lo, hi), s in zip([(a, b), (b, c), (a, c)], states):
            if s in ("F", "M"):
                arcs.append((lo, hi))
            if s in ("R", "M"):
                arcs.append((hi, lo))
        expected.update(_py_census([x for x in arcs if base <= x[0] < base + 3
                                    or base <= x[1] < base + 3]))
        base += 3
    got = _spark_census(spark, arcs)
    want = _py_census(arcs)
    assert len(want) == 27
    assert got == want


def test_random_digraph_replay(spark):
    rng = random.Random(13)
    arcs = {
        (a, b)
        for _ in range(300)
        for a, b in [(rng.randrange(40), rng.randrange(40))]
        if a != b
    }
    got = _spark_census(spark, sorted(arcs))
    want = _py_census(sorted(arcs))
    assert got == want
    counts = {
        r["ttype"]: r["n_triangles"]
        for r in directed_triangle_counts(_df(spark, sorted(arcs))).collect()
    }
    from collections import Counter

    assert counts == dict(Counter(want.values()))


def test_duplicates_and_self_loops_ignored(spark):
    arcs = [(0, 1), (0, 1), (1, 2), (2, 0), (1, 1)]
    assert _spark_census(spark, arcs) == {(0, 1, 2): "cyclic"}
