"""Two-parallelism scaling evidence (the north rule's N -> 4N criterion).

No real cluster exists in this sandbox, so the BASELINE.json scaling
criterion ("throughput scaling efficiency >= 0.8 from N to 4N
executors") is evidenced by running the IDENTICAL job at local[8] (N)
and local[32] (4N) on the same pre-materialized input:

1. the parent process synthesizes the repo-dependency corpus once,
   derives its import-edge table, and writes it to parquet;
2. per parallelism level a fresh subprocess (fresh JVM — no shared
   executor state) times triangle counting and PageRank supersteps on
   that parquet;
3. efficiency = (throughput@32 / throughput@8) / 4 per workload, and
   the report lands in BENCH/BASELINE.md.

Usage:
    python bench/scaling.py                  # full run -> BENCH/BASELINE.md
    python bench/scaling.py --level 8 PATH   # internal: one level (JSON)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_FILES = int(os.environ.get("SCALING_N_FILES", "400000"))
N_REPOS = int(os.environ.get("SCALING_N_REPOS", "20000"))
PR_ITERS = 8
LEVELS = (8, 32)
EDGES_PATH = os.environ.get("SCALING_EDGES", "/tmp/linkgraph_scaling_edges")


def run_level(cores: int, edges_path: str) -> None:
    from pyspark.sql import functions as F  # noqa: F401

    from linkgraph.graph.pagerank import pagerank
    from linkgraph.graph.triangles import triangles
    from linkgraph.session import build_session

    spark = build_session(
        f"scaling-{cores}", master=f"local[{cores}]", shuffle_partitions=cores
    )
    spark.sparkContext.setLogLevel("ERROR")
    edges = spark.read.parquet(edges_path).persist()
    n_edges = edges.count()

    t0 = time.time()
    n_tri = triangles(edges, strategy="sql").count()
    t_tri = time.time() - t0

    t0 = time.time()
    pr = pagerank(edges, max_iter=PR_ITERS, tol=0.0)
    pr.ranks.count()
    t_pr = time.time() - t0

    print(
        "LEVELJSON "
        + json.dumps(
            {
                "cores": cores,
                "n_edges": n_edges,
                "n_triangles": n_tri,
                "tri_sec": round(t_tri, 3),
                "pr_sec": round(t_pr, 3),
                "pr_supersteps": pr.iterations,
                "tri_edges_per_sec": round(n_edges / t_tri, 1),
                "pr_edges_per_sec_per_superstep": round(
                    n_edges * pr.iterations / t_pr, 1
                ),
            }
        )
    )
    spark.stop()


def materialize_edges() -> None:
    from linkgraph.ingest.corpus import synthetic_corpus
    from linkgraph.ingest.derive import import_edges
    from linkgraph.session import build_session

    spark = build_session("scaling-gen", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    corpus = synthetic_corpus(
        spark, n_files=N_FILES, n_repos=N_REPOS, partitions=32
    )
    import_edges(corpus).write.mode("overwrite").parquet(EDGES_PATH)
    spark.stop()


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--level":
        run_level(int(sys.argv[2]), sys.argv[3])
        return

    if not os.path.exists(os.path.join(EDGES_PATH, "_SUCCESS")):
        materialize_edges()

    results = {}
    for cores in LEVELS:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--level", str(cores), EDGES_PATH],
            capture_output=True,
            text=True,
            env={**os.environ, "PYTHONPATH": REPO},
            check=True,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("LEVELJSON ")][-1]
        results[cores] = json.loads(line[len("LEVELJSON "):])
        print(f"level {cores}: {results[cores]}", file=sys.stderr)

    lo, hi = results[LEVELS[0]], results[LEVELS[1]]
    eff = {
        "triangle_count": round(
            (hi["tri_edges_per_sec"] / lo["tri_edges_per_sec"]) / 4, 3
        ),
        "pagerank": round(
            (
                hi["pr_edges_per_sec_per_superstep"]
                / lo["pr_edges_per_sec_per_superstep"]
            )
            / 4,
            3,
        ),
    }

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    report = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(report, "w") as fh:
        fh.write(
            f"""# BENCH/BASELINE — two-parallelism scaling evidence

Protocol (BASELINE.md / north rule): identical job, identical input,
local[{LEVELS[0]}] (N) vs local[{LEVELS[1]}] (4N) on the 32-core sandbox; each
level is a fresh JVM subprocess. Input: repo-dependency import-edge
graph derived from the deterministic synthetic corpus
({N_FILES:,} files, {N_REPOS:,} repos) -> {lo['n_edges']:,} undirected
edges, {lo['n_triangles']:,} triangles.

| workload | local[{LEVELS[0]}] | local[{LEVELS[1]}] | throughput@{LEVELS[0]} | throughput@{LEVELS[1]} | scaling efficiency |
|---|---|---|---|---|---|
| triangle count (sql kernel) | {lo['tri_sec']} s | {hi['tri_sec']} s | {lo['tri_edges_per_sec']:,} edges/s | {hi['tri_edges_per_sec']:,} edges/s | **{eff['triangle_count']}** |
| PageRank ({PR_ITERS} supersteps) | {lo['pr_sec']} s | {hi['pr_sec']} s | {lo['pr_edges_per_sec_per_superstep']:,} edges/s/superstep | {hi['pr_edges_per_sec_per_superstep']:,} edges/s/superstep | **{eff['pagerank']}** |

efficiency = (throughput@4N / throughput@N) / 4; target >= 0.8
(reference yardstick: the reference's own Spark truss run reached 0.97
at 1 -> 10 cores, see BASELINE.md).

Raw per-level JSON:

```json
{json.dumps(results, indent=2)}
```
"""
        )
    print(json.dumps({"efficiency": eff, "report": report}))


if __name__ == "__main__":
    main()
