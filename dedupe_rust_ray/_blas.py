"""Per-process runtime tuning applied at package import (workers included).

1. Cap BLAS threads to 1: Ray supplies the parallelism (one task/actor
   per core); letting OpenBLAS spawn a 32-thread pool per worker process
   both oversubscribes the node and pays a multi-second thread-pool
   spin-up on the first matmul in EVERY worker (observed ~7 s here).
2. Disable transparent huge pages for this process and keep large malloc
   arenas on the sbrk heap: on this host, first-touch page faults on
   fresh multi-MB numpy buffers stall behind THP compaction (observed
   16 s to fault in a 61 MB array — 190x slower than with THP off), and
   glibc's default mmap threshold hands every such buffer back to the OS
   on free, so the cost recurred on every batch.

Called at package import so any worker that deserializes our callables is
tuned before its first allocation/gemm."""

from __future__ import annotations

import ctypes
import glob
import os


def limit_blas_threads(n: int = 1) -> bool:
    import numpy as np

    candidates = []
    base = os.path.dirname(os.path.dirname(np.__file__))
    for pat in ("numpy.libs/*openblas*", "numpy/.libs/*openblas*"):
        candidates += glob.glob(os.path.join(base, pat))
    candidates += glob.glob("/usr/local/lib/libopenblas*")
    for path in candidates:
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            continue
        for fname in ("openblas_set_num_threads64_", "openblas_set_num_threads"):
            fn = getattr(lib, fname, None)
            if fn is not None:
                fn(n)
                return True
    return False


def tune_memory() -> bool:
    """Disable THP for this process; keep big buffers heap-resident."""
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.prctl(41, 1, 0, 0, 0)  # PR_SET_THP_DISABLE
        libc.mallopt(-3, 1 << 30)  # M_MMAP_THRESHOLD: <1 GB stays on heap
        libc.mallopt(-1, 0x7FFFFFFF)  # M_TRIM_THRESHOLD: never trim
        return True
    except OSError:
        return False


LIMITED = limit_blas_threads(1)
MEM_TUNED = tune_memory()
