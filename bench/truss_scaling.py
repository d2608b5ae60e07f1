"""k-truss / max-truss executor-mode scaling pair (round-4 verdict
item 3).

The reference's flagship published number is truss k=20 on a 3.4M-edge
graph: 736.8 s @1 core -> 76.2 s @10 cores, with a phase split showing
filterTriangles (the peel loop) at 66% of wall
(documents/Benchmarks.xlsx W5-W10 / A28-B33). This harness produces
the analogous evidence on the 37.2M-edge import graph at lc:1 vs lc:4
(1 vs 4 executor JVMs, 8 cores / 16g each — the N vs 4N executor
shape), with the same per-phase decomposition:

    addDegrees       -> inside `triangles`' orientation (not separable
                        without distorting the plan; folded into
                        getTriangles, and ~2% of wall in the reference)
    getTriangles     -> triangle enumeration (tri table materialized)
    filterTriangles  -> the support-peel fixpoint loop (k_truss with
                        the triangle table pre-supplied)
    connectTruss     -> CC labeling of the surviving edges
    finalMap         -> the component/edge projection + count

Per level a fresh subprocess (fresh JVMs); one LEVELJSON line per
level; results are merged into BENCH/BASELINE.md by hand (this
harness measures a different operator family than scaling.py's
report writer).

Usage:
    python bench/truss_scaling.py                    # lc:1 + lc:4
    TRUSS_MODES=lc:4 python bench/truss_scaling.py   # subset
    python bench/truss_scaling.py --level lc:4 PATH  # internal
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench.scaling import EDGES_PATH, PYFILES_ZIP, _parse_mode  # noqa: E402

MODES = tuple(os.environ.get("TRUSS_MODES", "lc:1,lc:4").split(","))
KS = tuple(int(k) for k in os.environ.get("TRUSS_KS", "4,20").split(","))
RUN_MAXTRUSS = os.environ.get("TRUSS_MAXTRUSS", "1") == "1"


def run_level(mode: str, edges_path: str) -> None:
    from linkgraph.graph.components import component_of_edges, connected_components
    from linkgraph.graph.triangles import triangles
    from linkgraph.graph.truss import k_truss, max_truss
    from linkgraph.session import build_session

    master, cores, n_exec = _parse_mode(mode)
    extra = {}
    if n_exec:
        extra = {
            "spark.executor.memory": "16g",
            "spark.submit.pyFiles": PYFILES_ZIP,
            "spark.network.timeout": "600s",
            "spark.executor.heartbeatInterval": "60s",
        }
    # Shuffle partitions scale with DATA, not cores (scaling.py, round
    # 4): at 148.6M edges, 8 partitions put ~18.6M rows in one
    # aggregation task's hash map and OOM'd the 16g executor heap. AQE
    # coalesces small partitions, so the high count is safe at every
    # level.
    shuffle = int(os.environ.get("TRUSS_SHUFFLE", "0")) or max(cores, 128)
    spark = build_session(
        f"truss-scaling-{mode}",
        master=master,
        shuffle_partitions=shuffle,
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    edges = spark.read.parquet(edges_path).localCheckpoint(eager=True)
    n_edges = edges.count()

    # JIT warm-up on a small slice (fresh JVMs; same rationale as
    # scaling.py): codegen-compile the triangle/peel stages once.
    warm = edges.limit(200_000).localCheckpoint(eager=True)
    k_truss(warm, k=4)

    out = {"mode": mode, "cores": cores, "n_executors": n_exec, "n_edges": n_edges}

    # --- getTriangles (shared by all ks below: enumerate ONCE, like
    # the decomposition/probe-reuse path; the reference also computes
    # triangles once per calculateTrusses call) ---
    t0 = time.time()
    tri = triangles(edges).localCheckpoint(eager=True)
    n_tri = tri.count()
    t_tri = time.time() - t0
    out["n_triangles"] = n_tri
    out["get_triangles_sec"] = round(t_tri, 3)

    for k in KS:
        t0 = time.time()
        res = k_truss(edges, k=k, tri=tri)
        t_peel = time.time() - t0
        t0 = time.time()
        if res.n_edges:
            labels = connected_components(res.edges)
            t_cc = time.time() - t0
            t0 = time.time()
            n_comp_edges = component_of_edges(res.edges, labels).count()
            t_final = time.time() - t0
        else:
            t_cc = t_final = 0.0
            n_comp_edges = 0
        out[f"k{k}"] = {
            "edges": res.n_edges,
            "rounds": res.rounds,
            "filter_triangles_sec": round(t_peel, 3),
            "connect_truss_sec": round(t_cc, 3),
            "final_map_sec": round(t_final, 3),
            "component_edges": n_comp_edges,
            "total_sec": round(t_tri + t_peel + t_cc + t_final, 3),
        }

    if RUN_MAXTRUSS:
        t0 = time.time()
        mres = max_truss(edges, k0=4)
        out["maxtruss"] = {
            "k_max": mres.k,
            "edges": mres.edges.count(),
            "probes": mres.probes,
            "total_sec": round(time.time() - t0, 3),
        }

    print("LEVELJSON " + json.dumps(out))
    spark.stop()


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--level":
        run_level(sys.argv[2], sys.argv[3])
        return
    reps = int(os.environ.get("TRUSS_REPS", "1"))
    results: dict[str, list[dict]] = {m: [] for m in MODES}
    for rep in range(reps):
        for mode in MODES:
            cmd = [
                sys.executable,
                os.path.abspath(__file__),
                "--level",
                mode,
                EDGES_PATH,
            ]
            out = subprocess.run(
                cmd, capture_output=True, text=True,
                env={**os.environ, "PYTHONPATH": os.pathsep.join(
                    [REPO, os.environ.get("PYTHONPATH", "")]
                ).rstrip(os.pathsep)},
            )
            lines = [
                l for l in out.stdout.splitlines() if l.startswith("LEVELJSON ")
            ]
            if out.returncode != 0 or not lines:
                print(
                    f"rep {rep} {mode}: FAILED rc={out.returncode}\n"
                    + out.stderr[-3000:],
                    file=sys.stderr,
                )
                continue
            rec = json.loads(lines[-1][len("LEVELJSON "):])
            results[mode].append(rec)
            print(f"rep {rep} {mode}: {json.dumps(rec)}", flush=True)
    print("SUITEJSON " + json.dumps(results))


if __name__ == "__main__":
    main()
