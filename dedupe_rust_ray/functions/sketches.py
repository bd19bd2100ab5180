"""Cardinality sketches for distributed distinct counting.

HyperLogLog (Flajolet et al. 2007, the public HLL paper): a fixed
``m = 2^p`` register array whose elementwise max is associative and
commutative — exactly the shape Ray Data aggregates want. Each batch
contributes (register, rho) partials; the global merge is a tiny
``groupby(register).max()`` (at most m rows total regardless of input
size); the driver folds the merged registers into the estimate.
"""

from __future__ import annotations

import numpy as np

P = 12  # 2^12 = 4096 registers; relative standard error ~1.04/sqrt(m) = 1.6%
M = 1 << P
_ALPHA = 0.7213 / (1 + 1.079 / M)  # alpha_m for m >= 128


def registers_from_hashes(h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """uint64 hashes -> (register index, rho) vectorized.

    Register = top ``P`` bits; rho = 1 + leading zero count of the
    remaining 64-P bits (bit_length via float64 frexp — exact because
    64-P = 52 fits float64's mantissa)."""
    h = np.asarray(h, dtype=np.uint64)
    reg = (h >> np.uint64(64 - P)).astype(np.int64)
    rest = (h & np.uint64((1 << (64 - P)) - 1)).astype(np.int64)
    bl = np.where(rest > 0, np.frexp(rest.astype(np.float64))[1], 0)
    rho = (64 - P) - bl + 1  # rest == 0 -> rho = 53 (all bits zero)
    return reg, rho.astype(np.int64)


def estimate_from_registers(reg: np.ndarray, rho: np.ndarray) -> float:
    """Merged (register, max-rho) rows -> HLL cardinality estimate with
    the standard small-range (linear counting) correction."""
    regs = np.zeros(M, np.int64)
    regs[np.asarray(reg, dtype=np.int64)] = np.asarray(rho, dtype=np.int64)
    est = _ALPHA * M * M / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * M and zeros:
        est = M * np.log(M / zeros)
    return float(est)
