"""Measurement evidence for the incremental (delta) paths.

A/B at sf0.1 on the dense co-purchase graph (~1.2M edges): a
deterministic 1% of edges is the "delta", the rest is the base.

1. delta_triangles(base, delta) vs a full triangles(union) recount —
   counts must agree with recount-diff; walls show the incremental
   cost tracking the delta.
2. incremental_components(prev, delta) vs connected_components(union).
3. pagerank warm start: iterations + wall to tol from init_ranks =
   base fixpoint vs cold start on the union.

Usage: python bench/incremental.py   (idle box; best-of-REPS walls)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("EVIDENCE_REPS", "2"))


def best(fn, *args):
    walls, ret = [], None
    for _ in range(REPS):
        t0 = time.time()
        ret = fn(*args)
        walls.append(round(time.time() - t0, 3))
    return min(walls), ret


def main() -> None:
    from pyspark.sql import functions as F

    from linkgraph import datasets
    from linkgraph.graph.components import (
        connected_components,
        incremental_components,
    )
    from linkgraph.graph.pagerank import pagerank
    from linkgraph.graph.triangles import delta_triangles, triangles
    from linkgraph.session import build_session

    spark = build_session("inc-evidence", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    edges = datasets.co_purchase_edges(spark, SF_DIR).persist()
    n_edges = edges.count()
    mod = int(os.environ.get("DELTA_MOD", "100"))
    is_delta = F.pmod(F.xxhash64("src", "dst"), F.lit(mod)) == 0
    base = edges.where(~is_delta).persist()
    delta = edges.where(is_delta).persist()
    n_base, n_delta = base.count(), delta.count()
    out: dict = {
        "sf_dir": SF_DIR,
        "n_edges": n_edges,
        "n_base": n_base,
        "n_delta": n_delta,
        "delta_mod": mod,
    }

    # 1. triangles
    w_full, n_full = best(lambda: triangles(edges).count())
    w_base, n_base_tri = best(lambda: triangles(base).count())
    w_inc, n_inc = best(lambda: delta_triangles(base, delta).count())
    out["triangles"] = {
        "full_recount_s": w_full,
        "incremental_s": w_inc,
        "base_enumeration_s": w_base,
        "full_triangles": n_full,
        "base_triangles": n_base_tri,
        "delta_triangles": n_inc,
        "diff_matches": n_inc == n_full - n_base_tri,
        "speedup_vs_recount": round(w_full / w_inc, 2),
    }

    # 2. connected components
    prev = connected_components(base).persist()
    prev.count()
    w_cc_full, cc_full = best(lambda: connected_components(edges))
    w_cc_inc, cc_inc = best(lambda: incremental_components(prev, delta))
    mism = (
        cc_inc.alias("a")
        .join(cc_full.alias("b"), "id")
        .where(F.col("a.label") != F.col("b.label"))
        .count()
    )
    out["components"] = {
        "full_s": w_cc_full,
        "incremental_s": w_cc_inc,
        "label_mismatches": mism,
        "speedup": round(w_cc_full / w_cc_inc, 2),
    }

    # 3. pagerank warm start
    prev_pr = pagerank(base, tol=1e-8, max_iter=200)
    t0 = time.time()
    cold = pagerank(edges, tol=1e-8, max_iter=200)
    w_cold = round(time.time() - t0, 3)
    t0 = time.time()
    warm = pagerank(edges, tol=1e-8, max_iter=200, init_ranks=prev_pr.ranks)
    w_warm = round(time.time() - t0, 3)
    dmax = (
        cold.ranks.alias("a")
        .join(warm.ranks.alias("b"), "id")
        .agg(F.max(F.abs(F.col("a.rank") - F.col("b.rank"))))
        .collect()[0][0]
    )
    out["pagerank"] = {
        "cold_iters": cold.iterations,
        "warm_iters": warm.iterations,
        "cold_s": w_cold,
        "warm_s": w_warm,
        "max_rank_diff": float(dmax),
        "speedup": round(w_cold / w_warm, 2),
    }

    print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
