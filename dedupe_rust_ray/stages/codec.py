"""Decode packed binary signature columns back into numpy (zero-ish copy)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _as_array(col) -> pa.Array:
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def decode_sig_matrix(col, num_perm: int) -> np.ndarray:
    """binary column of fixed num_perm*8-byte rows -> (n, num_perm) uint64."""
    arr = _as_array(col)
    n = len(arr)
    if n == 0:
        return np.empty((0, num_perm), dtype=np.uint64)
    buf = b"".join(arr.to_pylist())
    return np.frombuffer(buf, dtype="<u8").reshape(n, num_perm)


def decode_varlen_u64(col) -> tuple[np.ndarray, np.ndarray]:
    """binary column of variable k*8-byte rows -> (flat uint64, offsets)."""
    arr = _as_array(col)
    rows = arr.to_pylist()
    lens = np.fromiter((len(r) // 8 for r in rows), np.int64, count=len(rows))
    off = np.zeros(len(rows) + 1, dtype=np.int64)
    np.cumsum(lens, out=off[1:])
    buf = b"".join(rows)
    flat = np.frombuffer(buf, dtype="<u8") if buf else np.empty(0, np.uint64)
    return flat, off
