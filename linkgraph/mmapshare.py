"""Driver-built NumPy arrays shared to every Python worker by file.

``stage_array`` saves the array as .npy and registers it with
``SparkContext.addFile``; workers ``load_array`` it with
``np.load(mmap_mode="r")``. The OS page cache then holds ONE physical
copy per node, shared by every Python worker process on that node —
a ``sc.broadcast`` of the same array would be deserialized into
PRIVATE memory by each worker (32 workers x hundreds of MB at graph
scale). On a cluster each executor fetches the file once from the
driver's file server; in local mode Spark copies it into the app's
userFiles dir.

The staging original must OUTLIVE the job: the cluster file server
streams addFile content from the REGISTERED path (only local mode
copies), so files are cleaned at driver exit, not eagerly.
"""

from __future__ import annotations

import atexit
import os
import tempfile
import uuid

import numpy as np

# worker-process cache: file name -> loaded mmap view
_CACHE: dict[str, np.ndarray] = {}
# driver-side: staged originals to unlink at exit
_STAGED: list[str] = []


def stage_array(sc, arr: np.ndarray, prefix: str = "linkgraph_arr") -> str:
    """Save ``arr`` and ship it via addFile; returns the file name to
    pass into kernels (closure-safe: it is just a string)."""
    name = f"{prefix}_{uuid.uuid4().hex}.npy"
    path = os.path.join(tempfile.gettempdir(), name)
    np.save(path, arr)
    sc.addFile(path)
    _STAGED.append(path)
    return name


def load_array(name: str) -> np.ndarray:
    """Worker-side: mmap the staged array (cached per process)."""
    arr = _CACHE.get(name)
    if arr is None:
        from pyspark import SparkFiles

        arr = np.load(SparkFiles.get(name), mmap_mode="r")
        _CACHE[name] = arr
    return arr


def _cleanup() -> None:  # pragma: no cover — exit hook
    for p in _STAGED:
        try:
            os.unlink(p)
        except OSError:
            pass


atexit.register(_cleanup)
