"""Cap BLAS threads to 1 inside workers.

Ray supplies the parallelism (one task/actor per core); letting OpenBLAS
spawn a 32-thread pool per worker process both oversubscribes the node and
pays a multi-second thread-pool spin-up on the first matmul in EVERY worker
(observed ~7 s on this host). Called at package import so any worker that
deserializes our callables is capped before its first gemm."""

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


LIMITED = limit_blas_threads(1)
