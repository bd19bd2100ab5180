"""Decode packed binary signature columns back into numpy — zero-copy.

All decoders read the Arrow data/offset buffers directly; no
``to_pylist()``, no per-row Python bytes objects. These run inside every
blocking and scoring batch (the shuffle hot path), so per-row Python here
was the round-1 profile's top fixed cost.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _offsets_dtype(t: pa.DataType):
    # large_binary / large_string carry 64-bit offsets; plain ones 32-bit.
    # Matters at the broadcast ceiling: 10^6 profiles x 1 KB sigs pushes a
    # combined binary column past the int32 offset range, and Arrow then
    # hands us a large_* column.
    return np.int64 if t in (pa.large_binary(), pa.large_string()) else np.int32


def binary_col_blob(col: pa.ChunkedArray | pa.Array) -> tuple[bytes, np.ndarray]:
    """(data blob, element offsets in uint64 units) of a binary column —
    straight from the Arrow buffers, no per-row Python bytes objects."""
    if isinstance(col, pa.ChunkedArray):
        if col.num_chunks > 1 and col.nbytes > (1 << 31) - (1 << 20):
            col = col.cast(pa.large_binary())
        col = col.combine_chunks()
    if len(col) == 0:
        return b"", np.zeros(1, dtype=np.int64)
    byte_off = np.frombuffer(col.buffers()[1], dtype=_offsets_dtype(col.type))[
        col.offset : col.offset + len(col) + 1
    ].astype(np.int64)
    data = col.buffers()[2]
    blob = bytes(data)[byte_off[0] : byte_off[-1]]
    return blob, (byte_off - byte_off[0]) // 8  # offsets in uint64 units


def string_col_buffers(col) -> tuple[np.ndarray, np.ndarray]:
    """(utf8 data uint8 array, element BYTE offsets) of a string column."""
    if isinstance(col, pa.ChunkedArray):
        if col.num_chunks > 1 and col.nbytes > (1 << 31) - (1 << 20):
            col = col.cast(pa.large_string())
        col = col.combine_chunks()
    if len(col) == 0:
        return np.empty(0, np.uint8), np.zeros(1, dtype=np.int64)
    off = np.frombuffer(col.buffers()[1], dtype=_offsets_dtype(col.type))[
        col.offset : col.offset + len(col) + 1
    ].astype(np.int64)
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)[off[0] : off[-1]]
    return data.copy(), off - off[0]


def _binary_from_parts(blob: bytes, byte_off: np.ndarray) -> pa.Array:
    """Build a binary array directly from a data blob + byte offsets —
    no per-row Python bytes objects."""
    n = len(byte_off) - 1
    if byte_off[-1] < (1 << 31):
        return pa.BinaryArray.from_buffers(
            pa.binary(),
            n,
            [None, pa.py_buffer(byte_off.astype(np.int32).tobytes()), pa.py_buffer(blob)],
        )
    return pa.LargeBinaryArray.from_buffers(
        pa.large_binary(),
        n,
        [None, pa.py_buffer(byte_off.astype(np.int64).tobytes()), pa.py_buffer(blob)],
    )


def encode_fixed_u64_rows(mat: np.ndarray) -> pa.Array:
    """(n, k) uint64 -> binary column of fixed k*8-byte rows."""
    n, k = mat.shape
    blob = np.ascontiguousarray(mat.astype("<u8", copy=False)).tobytes()
    off = np.arange(n + 1, dtype=np.int64) * (k * 8)
    return _binary_from_parts(blob, off)


def pack_f8_rows(mat: np.ndarray) -> pa.Array:
    """(n, dim) float -> binary column of fixed dim*8-byte little-endian
    float64 rows — ONE tobytes + offsets, no per-row Python. The single
    packing idiom shared by every embedding-shuffling stage (semdedup
    AssignCell, knn_ivf CellRows, knn_lsh); consumers decode with
    ``np.frombuffer(..., '<f8').reshape(n, -1)``."""
    n, dim = mat.shape
    blob = np.ascontiguousarray(mat, dtype="<f8").tobytes()
    off = np.arange(n + 1, dtype=np.int64) * (dim * 8)
    return _binary_from_parts(blob, off)


def encode_varlen_u64(flat: np.ndarray, counts: np.ndarray) -> pa.Array:
    """flat uint64 + per-row counts -> binary column of k_i*8-byte rows."""
    off = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(np.asarray(counts, dtype=np.int64) * 8, out=off[1:])
    blob = flat.astype("<u8", copy=False).tobytes()
    return _binary_from_parts(blob, off)


def decode_sig_matrix(col, num_perm: int) -> np.ndarray:
    """binary column of fixed num_perm*8-byte rows -> (n, num_perm) uint64."""
    n = len(col)
    if n == 0:
        return np.empty((0, num_perm), dtype=np.uint64)
    blob, _ = binary_col_blob(col)
    return np.frombuffer(blob, dtype="<u8").reshape(n, num_perm)


def list_col_matrix(col, dtype=np.float64) -> np.ndarray:
    """list<float>-style column of FIXED-length rows -> (n, dim) matrix,
    via the flattened child values buffer — no per-row Python lists.
    Raises if row lengths vary (embeddings are fixed-dimension)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    if pa.types.is_fixed_size_list(col.type):
        dim = col.type.list_size
        flat = col.flatten().to_numpy(zero_copy_only=False)
        return np.ascontiguousarray(flat, dtype=dtype).reshape(n, dim)
    off = col.offsets.to_numpy()
    lens = np.diff(off)
    if not (lens == lens[0]).all():
        raise ValueError("list column has varying row lengths")
    flat = col.flatten().to_numpy(zero_copy_only=False)[off[0] : off[-1]]
    return np.ascontiguousarray(flat, dtype=dtype).reshape(n, int(lens[0]))


def decode_varlen_u64(col) -> tuple[np.ndarray, np.ndarray]:
    """binary column of variable k*8-byte rows -> (flat uint64, offsets)."""
    blob, off = binary_col_blob(col)
    flat = (
        np.frombuffer(blob, dtype="<u8") if blob else np.empty(0, np.uint64)
    )
    return flat, off
