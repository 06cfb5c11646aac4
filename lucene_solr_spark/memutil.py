"""Python-worker memory hygiene for long-lived reused workers.

PySpark reuses Python workers across tasks (``spark.python.worker.reuse``,
default true).  glibc malloc keeps freed arena pages mapped, so a worker's
RSS sticks at the high-water mark of the largest batch it ever analyzed —
with 32 concurrent workers on one host that accumulates to tens of GiB of
dead pages and eventually gets the workers OOM-killed mid-benchmark.

``trim_task_memory()`` is called at the end of every heavy ``mapInPandas``
task (after the batch iterator is exhausted, before the generator returns):
a ``gc.collect()`` to break pandas/numpy reference cycles, then
``malloc_trim(0)`` to hand the freed arena pages back to the kernel.  Cost
is a few ms per task; effect is per-worker RSS returning to baseline
between tasks instead of ratcheting up forever.

On a multi-executor cluster the same call keeps per-executor Python memory
flat across a 10^12-turn build, which is what lets
``spark.executor.pyspark.memory`` be sized to the *batch* peak rather than
the job-lifetime peak.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import gc

_libc = None
_checked = False


def _get_libc():
    global _libc, _checked
    if not _checked:
        _checked = True
        try:
            path = ctypes.util.find_library("c")
            _libc = ctypes.CDLL(path or "libc.so.6")
            if not hasattr(_libc, "malloc_trim"):
                _libc = None
        except Exception:
            _libc = None
    return _libc


def trim_task_memory() -> None:
    """Release freed Python-heap pages back to the OS (no-op off glibc)."""
    gc.collect()
    libc = _get_libc()
    if libc is not None:
        try:
            libc.malloc_trim(0)
        except Exception:
            pass
