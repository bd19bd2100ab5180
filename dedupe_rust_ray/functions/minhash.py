"""MinHash signatures + LSH banding (vectorized).

Target-side generalization of the reference's quick-checksum candidate pass
(/root/reference/src/main.rs:520-572): a cheap signature whose equality (here:
band equality) nominates candidate pairs, later confirmed by an exact/deeper
comparison. Signatures are mergeable sketches: the per-batch work is pure
numpy, and signatures ride the dataset as a ``list<uint64>`` column.
"""

from __future__ import annotations

import numpy as np

from .shingles import (
    UINT64_MAX,
    char_shingle_hashes,
    segment_min,
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
    """(n_docs, num_perm) uint64 signature matrix from window hashes.

    Each "permutation" is a salted splitmix64 rehash of the shingle hash —
    the standard one-hash-function-many-salts construction. Empty docs get
    the UINT64_MAX sentinel in every slot (analog of the reference's
    EMPTY_FILE sentinel, /root/reference/src/main.rs:536-538).
    """
    n = len(doc_off) - 1
    seeds = perm_seeds(num_perm, seed)
    sig = np.empty((n, num_perm), dtype=np.uint64)
    for i in range(num_perm):
        ph = splitmix64(win ^ seeds[i]) if len(win) else win
        sig[:, i] = segment_min(ph, doc_off, fill=UINT64_MAX)
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
