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

Staged files are CONTENT-ADDRESSED: the name is a blake2b digest of
(shape, dtype, bytes), so repeated builds over the same input (e.g.
two triangles() calls on one dataset in a long session) reuse the
already-registered file instead of staging a fresh multi-GB copy into
tempdir each time. ``staged_bytes()`` reports the cumulative unique
bytes staged this session; past ``SOFT_CAP_BYTES`` (default 64 GiB,
override via ``LINKGRAPH_MMAP_SOFT_CAP``) each further staging emits a
RuntimeWarning so a runaway session is visible before /tmp fills.

The staging original must OUTLIVE the job: the cluster file server
streams addFile content from the REGISTERED path (only local mode
copies), so files are cleaned at driver exit, not eagerly.
"""

from __future__ import annotations

import atexit
import hashlib
import os
import tempfile
import warnings

import numpy as np

# worker-process cache: file name -> loaded mmap view
_CACHE: dict[str, np.ndarray] = {}
# driver-side: staged originals to unlink at exit
_STAGED: list[str] = []
# driver-side: (applicationId, content key) -> staged file name, so the
# same array is registered with a given SparkContext at most once
_STAGED_BY_KEY: dict[tuple[str, str], str] = {}
_STAGED_BYTES = 0

SOFT_CAP_BYTES = int(
    os.environ.get("LINKGRAPH_MMAP_SOFT_CAP", 64 * 1024**3)
)


def staged_bytes() -> int:
    """Cumulative unique bytes staged to tempdir this session."""
    return _STAGED_BYTES


def stage_array(sc, arr: np.ndarray, prefix: str = "linkgraph_arr") -> str:
    """Save ``arr`` and ship it via addFile; returns the file name to
    pass into kernels (closure-safe: it is just a string).

    Content-addressed: staging the same (shape, dtype, bytes) twice on
    one SparkContext returns the first call's name without re-saving or
    re-registering. The digest is full-content (no sampling) — a
    collision would silently hand workers the wrong array, so we pay
    the ~1 GB/s hash; it is small next to the toPandas that typically
    precedes it.
    """
    global _STAGED_BYTES
    a = np.ascontiguousarray(arr)
    h = hashlib.blake2b(digest_size=16)
    h.update(repr((a.shape, str(a.dtype))).encode())
    if a.size:  # memoryview refuses to cast shapes containing 0
        h.update(memoryview(a).cast("B"))
    key = (sc.applicationId, f"{prefix}_{h.hexdigest()}")
    name = _STAGED_BY_KEY.get(key)
    if name is not None:
        return name
    name = f"{key[1]}.npy"
    path = os.path.join(tempfile.gettempdir(), name)
    if not os.path.exists(path):  # same content may be staged by a
        np.save(path, a)  # previous (stopped) context in this process
        _STAGED.append(path)
        _STAGED_BYTES += a.nbytes
        if _STAGED_BYTES > SOFT_CAP_BYTES:
            warnings.warn(
                f"linkgraph.mmapshare has staged {_STAGED_BYTES / 1e9:.1f} GB "
                f"of shared arrays in {tempfile.gettempdir()} this session "
                f"(soft cap {SOFT_CAP_BYTES / 1e9:.0f} GB); files are only "
                "reclaimed at driver exit",
                RuntimeWarning,
                stacklevel=2,
            )
    sc.addFile(path)
    _STAGED_BY_KEY[key] = name
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
