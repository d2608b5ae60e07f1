"""spark-submit --py-files deployment smoke test.

The north rule's run shape is ``spark-submit --py-files`` on a
multi-executor cluster; bench/scaling.py covers the multi-executor half
(local-cluster executors + spark.submit.pyFiles). This test covers the
actual spark-submit launcher: the CLI script is submitted with the
package supplied ONLY via --py-files linkgraph.zip (cwd and PYTHONPATH
point away from the repo), and the truss output must match the golden
4-truss of trussMini (18 edges, 1 component — FIXTURES.md §1).
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys

import pandas as pd
import pytest

from tests.conftest import TRUSS_MINI

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SUBMIT = "/opt/spark/bin/spark-submit"
ZIP = os.path.join(REPO, "linkgraph.zip")


@pytest.mark.skipif(not os.path.exists(SUBMIT), reason="spark-submit not installed")
def test_spark_submit_pyfiles_truss(tmp_path):
    if not os.path.exists(ZIP):
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "make_pyfiles.py")],
            check=True,
        )
    edge_file = tmp_path / "trussMini.txt"
    edge_file.write_text("".join(f"{a}\t{b}\n" for a, b in TRUSS_MINI))
    out = tmp_path / "truss_out"

    # The package must reach the driver and executors through --py-files
    # alone: strip PYTHONPATH and run from tmp_path so /root/repo is not
    # importable implicitly.
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [
            SUBMIT,
            "--master",
            "local[4]",
            "--py-files",
            ZIP,
            os.path.join(REPO, "linkgraph", "cli.py"),
            "truss",
            str(edge_file),
            str(out),
            "--sep",
            "TAB",
            "--k",
            "4",
            "--master",
            "local[4]",
        ],
        capture_output=True,
        text=True,
        timeout=580,
        env=env,
        cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr[-4000:]

    parts = glob.glob(str(out / "*.parquet"))
    assert parts, f"no parquet output in {out}"
    df = pd.concat(pd.read_parquet(p) for p in parts)
    assert sorted(df.columns) == ["component", "dst", "src"]
    assert len(df) == 18
    assert df["component"].nunique() == 1
