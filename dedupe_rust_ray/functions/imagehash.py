"""Perceptual image hashes (pHash / dHash) — numpy only, batch-vectorized.

Replaces the reference's "perceptual" prefix checksum — which actually hashes
raw leading file bytes (/root/reference/src/main.rs:520-572) — with real
perceptual hashes over pixel payloads, computed for a whole batch of images
at once (stacked (B, N, N) tensor -> two matmuls for the 2-D DCT).

Payloads in this engine are deterministic functions of ``media_ref``
(see sources/corpus.py: media_payload), so hashes are reproducible anywhere.
"""

from __future__ import annotations

import numpy as np


def dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis (n x n)."""
    x = np.arange(n)
    u = x[:, None]
    m = np.cos(np.pi * (2 * x[None, :] + 1) * u / (2 * n))
    m *= np.sqrt(2.0 / n)
    m[0] *= np.sqrt(0.5)
    return m


def phash_batch(imgs: np.ndarray, dct_keep: int = 8, basis: np.ndarray | None = None) -> np.ndarray:
    """64-bit pHash per image for a stacked (B, N, N) float array.

    2-D DCT via two matmuls, keep the top-left ``dct_keep`` x ``dct_keep``
    low-frequency block, threshold at the per-image median (DC term
    excluded from the median but included in the bitmask).
    """
    if imgs.ndim == 2:
        imgs = imgs[None]
    b, n, _ = imgs.shape
    d = basis if basis is not None else dct_matrix(n)
    # float32 batched matmuls: einsum over a float64 basis upcasts the
    # whole (B, N, N) stack and lands in a non-BLAS contraction ~250x
    # slower on this host; two sgemm-backed matmuls do the 2-D DCT
    d32 = d.astype(np.float32, copy=False)
    imgs32 = np.ascontiguousarray(imgs, dtype=np.float32)
    coeffs = np.matmul(np.matmul(d32, imgs32), d32.T)
    block = coeffs[:, :dct_keep, :dct_keep].reshape(b, -1)
    med = np.median(block[:, 1:], axis=1, keepdims=True)
    bits = (block > med).astype(np.uint64)
    weights = np.uint64(1) << np.arange(bits.shape[1], dtype=np.uint64)
    return (bits * weights[None, :]).sum(axis=1, dtype=np.uint64)


def dhash_batch(imgs: np.ndarray) -> np.ndarray:
    """64-bit difference hash: area-downsample to 8 rows x 9 cols, then
    horizontal gradient sign -> 8x8 bits."""
    if imgs.ndim == 2:
        imgs = imgs[None]
    b, n, m = imgs.shape
    rows = np.linspace(0, n, 9).astype(np.int64)[:-1]
    cols = np.linspace(0, m, 10).astype(np.int64)[:-1]
    pooled = np.add.reduceat(np.add.reduceat(imgs, rows, axis=1), cols, axis=2)
    grad = (pooled[:, :, 1:] > pooled[:, :, :-1]).astype(np.uint64).reshape(b, 64)
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
    return (grad * weights[None, :]).sum(axis=1, dtype=np.uint64)


def phash_prefix(hashes: np.ndarray, bits: int = 16) -> np.ndarray:
    """Leading ``bits`` of a 64-bit hash — used as a blocking key."""
    return (hashes >> np.uint64(64 - bits)).astype(np.uint64)
