"""SimHash (64-bit) document fingerprints + Hamming utilities (vectorized)."""

from __future__ import annotations

import numpy as np

from .shingles import char_shingle_hashes, word_shingle_hashes

_POPCOUNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Per-element popcount of a uint64 array (uint8-view table lookup)."""
    b = np.ascontiguousarray(x, dtype=np.uint64).view(np.uint8)
    return _POPCOUNT8[b].reshape(-1, 8).sum(axis=1).astype(np.int64)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Row-wise Hamming distance between two uint64 arrays."""
    return popcount64(np.bitwise_xor(a, b))


def simhash_from_windows(win: np.ndarray, doc_off: np.ndarray) -> np.ndarray:
    """64-bit SimHash per segment: sign of per-bit +/-1 vote sums.

    Implementation note: 64 passes of 1-D shift/mask/reduceat, NOT one big
    (n_windows, 64) bit matrix — 2-D expansion allocates hundreds of MB per
    batch and large fresh allocations fault in pathologically slowly on
    some hosts; the 1-D loop reuses small buffers and is allocator-friendly."""
    n = len(doc_off) - 1
    out = np.zeros(n, dtype=np.uint64)
    if len(win) == 0:
        return out
    idx = np.minimum(doc_off[:-1], len(win) - 1)
    empty = doc_off[:-1] == doc_off[1:]
    nwin = (doc_off[1:] - doc_off[:-1]).astype(np.int64)
    one = np.uint64(1)
    for j in range(64):
        bit = (win >> np.uint64(j)) & one
        s = np.add.reduceat(bit, idx).astype(np.int64)
        s[empty] = 0
        out |= (2 * s > nwin).astype(np.uint64) << np.uint64(j)
    return out


def simhash_from_sketch(sig: np.ndarray) -> np.ndarray:
    """64-bit SimHash derived from a (n, num_perm) MinHash sketch: per-bit
    majority vote over the sketch's values.

    The sketch's minima are a similarity-preserving sample of the shingle
    set, so this costs O(n * num_perm) regardless of document length —
    used in the signature stage where re-scanning every window for a
    corroborating signal would double its memory traffic. Empty docs
    (all-sentinel sketch) come out as all-ones; callers treat them via the
    text-presence flag."""
    n, num_perm = sig.shape
    out = np.zeros(n, dtype=np.uint64)
    half = num_perm // 2
    for j in range(64):
        ones = ((sig >> np.uint64(j)) & np.uint64(1)).sum(axis=1)
        out |= (ones > half).astype(np.uint64) << np.uint64(j)
    return out


def simhash_signatures(
    texts: list[str], shingle_k: int = 5, *, mode: str = "char"
) -> np.ndarray:
    if mode == "word":
        win, doc_off = word_shingle_hashes(texts, shingle_k)
    else:
        win, doc_off = char_shingle_hashes(texts, shingle_k)
    return simhash_from_windows(win, doc_off)
