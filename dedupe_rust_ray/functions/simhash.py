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
    """64-bit SimHash per segment: sign of per-bit +/-1 vote sums."""
    n = len(doc_off) - 1
    out = np.zeros(n, dtype=np.uint64)
    if len(win) == 0:
        return out
    nwin = (doc_off[1:] - doc_off[:-1]).astype(np.int64)
    idx = np.minimum(doc_off[:-1], len(win) - 1)
    # process 8 bits at a time to bound the unpacked matrix size
    for lo in range(0, 64, 8):
        bits = ((win[:, None] >> np.arange(lo, lo + 8, dtype=np.uint64)) & np.uint64(1)).astype(np.int32)
        sums = np.add.reduceat(bits, idx, axis=0)
        sums[doc_off[:-1] == doc_off[1:]] = 0
        votes = 2 * sums - nwin[:, None]  # (+1/-1 votes summed)
        setbits = (votes > 0).astype(np.uint64)
        out |= (setbits << np.arange(lo, lo + 8, dtype=np.uint64)[None, :]).sum(
            axis=1, dtype=np.uint64
        )
    return out


def simhash_signatures(
    texts: list[str], shingle_k: int = 5, *, mode: str = "char"
) -> np.ndarray:
    if mode == "word":
        win, doc_off = word_shingle_hashes(texts, shingle_k)
    else:
        win, doc_off = char_shingle_hashes(texts, shingle_k)
    return simhash_from_windows(win, doc_off)
