"""MinHash signatures + LSH banding (vectorized).

Target-side generalization of the reference's quick-checksum candidate pass
(/root/reference/src/main.rs:520-572): a cheap signature whose equality (here:
band equality) nominates candidate pairs, later confirmed by an exact/deeper
comparison. Signatures are mergeable sketches: the per-batch work is pure
numpy, and signatures ride the dataset packed as a ``binary`` column
(num_perm little-endian uint64 per row).
"""

from __future__ import annotations

import numpy as np

from .shingles import (
    UINT64_MAX,
    char_shingle_hashes,
    splitmix64,
    word_shingle_hashes,
)


def perm_seeds(num_perm: int, seed: int = 0x5EED) -> np.ndarray:
    """Deterministic per-permutation salts (splitmix64 stream)."""
    salt = np.uint64((seed * 0x2545F4914F6CDD1D) % (1 << 64))
    return splitmix64(np.arange(num_perm, dtype=np.uint64) + salt)


def minhash_from_windows(
    win: np.ndarray, doc_off: np.ndarray, num_perm: int, seed: int = 0x5EED
) -> np.ndarray:
    """(n_docs, num_perm) uint64 signature matrix from window hashes via
    **one-permutation hashing** (Li, Owen, Zhang 2012) with circular
    rotation densification (Shrivastava & Li 2014).

    One pass over the windows — the hash's top bits pick a bin, the bin
    keeps its minimum — instead of ``num_perm`` salted rehash passes. This
    cuts memory traffic ~num_perm-fold, which matters because signature
    computation is bandwidth-bound on many-core nodes. Empty bins borrow
    from the nearest filled bin to their left (circularly), preserving the
    ``mean(sig_a == sig_b)`` Jaccard estimator; empty docs keep the
    UINT64_MAX sentinel in every slot (analog of the reference's
    EMPTY_FILE sentinel, /root/reference/src/main.rs:536-538).

    ``num_perm`` must be a power of two.
    """
    n = len(doc_off) - 1
    assert num_perm & (num_perm - 1) == 0, "num_perm must be a power of 2"
    sig = np.full((n, num_perm), UINT64_MAX, dtype=np.uint64)
    if n == 0 or len(win) == 0:
        return sig
    salt = np.uint64((seed * 0x9E3779B97F4A7C15) % (1 << 64))
    h = splitmix64(win ^ salt)
    k_bits = num_perm.bit_length() - 1
    bins = (h >> np.uint64(64 - k_bits)).astype(np.int64)
    doc_of_win = np.repeat(
        np.arange(n, dtype=np.int64), (doc_off[1:] - doc_off[:-1])
    )
    key = doc_of_win * num_perm + bins
    order = np.argsort(key, kind="stable")
    sk = key[order]
    sv = h[order]
    bounds = np.flatnonzero(np.r_[True, sk[1:] != sk[:-1]])
    mins = np.minimum.reduceat(sv, bounds)
    sig.reshape(-1)[sk[bounds]] = mins

    # rotation densification: every empty bin borrows the value of the
    # nearest filled bin to its left, wrapping around the row
    empty = sig == UINT64_MAX
    if empty.any():
        idx = np.arange(num_perm, dtype=np.int64)[None, :]
        pos1 = np.where(~empty, idx, -1)
        pos2 = np.where(~empty, idx + num_perm, -1)
        ff = np.maximum.accumulate(
            np.concatenate([pos1, pos2], axis=1), axis=1
        )[:, num_perm:]
        ok = ff >= 0
        src = np.where(ok, ff % num_perm, 0)
        borrowed = np.take_along_axis(sig, src, axis=1)
        sig = np.where(empty & ok, borrowed, sig)
    return sig


def minhash_signatures(
    texts: list[str],
    num_perm: int = 128,
    shingle_k: int = 5,
    *,
    mode: str = "char",
    seed: int = 0x5EED,
) -> np.ndarray:
    """MinHash signatures for a batch of texts. ``mode``: 'char' | 'word'."""
    if mode == "word":
        win, doc_off = word_shingle_hashes(texts, shingle_k)
    else:
        win, doc_off = char_shingle_hashes(texts, shingle_k)
    return minhash_from_windows(win, doc_off, num_perm, seed)


def lsh_band_hashes(sig: np.ndarray, bands: int) -> np.ndarray:
    """(n_docs, bands) uint64 band hashes of a signature matrix.

    Rows with the all-sentinel (empty-doc) signature hash to per-band
    sentinels too; callers should drop empty docs before banding.
    """
    n, num_perm = sig.shape
    assert num_perm % bands == 0, "num_perm must divide evenly into bands"
    r = num_perm // bands
    grouped = sig.reshape(n, bands, r)
    with np.errstate(over="ignore"):
        h = np.zeros((n, bands), dtype=np.uint64)
        for j in range(r):
            h = h * np.uint64(1099511628211) + grouped[:, :, j]
        # salt by band index so identical row-chunks in different bands differ
        h = splitmix64(h ^ np.arange(bands, dtype=np.uint64)[None, :])
    return h


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> np.ndarray:
    """Row-wise estimated Jaccard between two (m, num_perm) matrices."""
    return (sig_a == sig_b).mean(axis=1)
