"""Regenerate BENCH/BASELINE.md from a (possibly partial) scaling log.

bench/scaling.py prints one ``rep N <mode>: {...}`` stderr line per
completed level. If a suite is killed mid-run, this tool rebuilds the
report from whatever levels completed:

    python tools/scaling_report_from_log.py /tmp/scaling_clean.log
"""

from __future__ import annotations

import ast
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# bench.py (the harness module) shadows the bench/ package; load by path.
import importlib.util  # noqa: E402

_spec = importlib.util.spec_from_file_location(
    "linkgraph_bench_scaling", os.path.join(REPO, "bench", "scaling.py")
)
scaling = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(scaling)

LINE = re.compile(r"^rep (\d+) ([a-z]+:\d+): (\{.*\})\s*$")


def main() -> None:
    path = sys.argv[1]
    runs: dict[str, list[dict]] = {m: [] for m in scaling.MODES}
    with open(path) as fh:
        for line in fh:
            m = LINE.match(line.strip())
            if m:
                runs.setdefault(m.group(2), []).append(ast.literal_eval(m.group(3)))
    done = {k: len(v) for k, v in runs.items()}
    print(f"levels found: {done}", file=sys.stderr)
    scaling.write_report({k: v for k, v in runs.items() if v})


if __name__ == "__main__":
    main()
