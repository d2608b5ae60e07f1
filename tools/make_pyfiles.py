"""Build linkgraph.zip for spark-submit --py-files.

Usage:
    python tools/make_pyfiles.py [out.zip]
    spark-submit --py-files linkgraph.zip --master ... \
        your_job.py  # or: python -m linkgraph.cli via the zip on PYTHONPATH

Only the engine package goes into the archive (no tests/bench/tools) —
the cluster needs the library, the driver script travels separately.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str) -> int:
    n = 0
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg = os.path.join(REPO, "linkgraph")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))
                n += 1
    return n


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "linkgraph.zip")
    n = build(out)
    print(f"{out}: {n} modules")
