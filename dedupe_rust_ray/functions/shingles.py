"""Vectorized shingle (rolling-window) hashing over batches of strings.

The building block for MinHash, SimHash and winnowing fingerprints. The whole
batch is processed with numpy over one concatenated byte buffer — no Python
loop over windows, mirroring the "vectorize the hot path" rule. Analog of the
reference's 3-byte-chunk checksum walk (/root/reference/src/main.rs:541-559),
generalized to arbitrary window widths and salted rehashing.
"""

from __future__ import annotations

import numpy as np

UINT64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)
_FNV_PRIME = np.uint64(1099511628211)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Stateless 64-bit finalizer (public splitmix64 constants)."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    x ^= x >> np.uint64(30)
    x = (x * np.uint64(0xBF58476D1CE4E5B9)).astype(np.uint64)
    x ^= x >> np.uint64(27)
    x = (x * np.uint64(0x94D049BB133111EB)).astype(np.uint64)
    x ^= x >> np.uint64(31)
    return x


def _concat_bytes(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    data = [t.encode("utf-8", "surrogatepass") if t else b"" for t in texts]
    lens = np.fromiter((len(b) for b in data), dtype=np.int64, count=len(data))
    joined = b"".join(data)
    buf = np.frombuffer(joined, dtype=np.uint8) if joined else np.empty(0, np.uint8)
    return buf, lens


def rolling_window_hashes(
    values: np.ndarray, lens: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Hash every width-``k`` window of ``values`` that lies fully inside one
    segment (segments given by ``lens``).

    Returns ``(window_hashes, doc_offsets)`` where ``window_hashes`` is
    ordered by segment and ``doc_offsets`` (len = n_segments + 1) delimits
    each segment's windows. Segments shorter than ``k`` get zero windows.
    """
    n = len(lens)
    starts = np.zeros(n, dtype=np.int64)
    if n:
        np.cumsum(lens[:-1], out=starts[1:])
    nwin = np.maximum(lens - k + 1, 0)
    doc_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(nwin, out=doc_off[1:])
    total = int(doc_off[-1])
    if total == 0:
        return np.empty(0, dtype=np.uint64), doc_off
    doc_of_win = np.repeat(np.arange(n), nwin)
    local = np.arange(total, dtype=np.int64) - doc_off[doc_of_win]
    gpos = starts[doc_of_win] + local
    with np.errstate(over="ignore"):
        h = np.zeros(total, dtype=np.uint64)
        v = values.astype(np.uint64, copy=False)
        for j in range(k):
            h = h * _FNV_PRIME + v[gpos + j]
        return splitmix64(h), doc_off


def char_shingle_hashes(
    texts: list[str], k: int = 5
) -> tuple[np.ndarray, np.ndarray]:
    """uint64 hashes of all char-``k``-grams per text (utf-8 byte windows)."""
    buf, lens = _concat_bytes(texts)
    return rolling_window_hashes(buf, lens, k)


def word_shingle_hashes(
    texts: list[str], n: int = 5
) -> tuple[np.ndarray, np.ndarray]:
    """uint64 hashes of all word-``n``-grams per text.

    Words are whitespace tokens hashed individually (vectorized via pandas
    SipHash), then combined with a width-``n`` rolling polynomial.
    """
    import pandas as pd

    token_lists = [t.split() if t else [] for t in texts]
    lens = np.fromiter((len(w) for w in token_lists), np.int64, count=len(texts))
    flat = [w for ws in token_lists for w in ws]
    if flat:
        th = pd.util.hash_array(
            np.asarray(flat, dtype=object), hash_key="dedupe_ray_00042"
        ).astype(np.uint64)
    else:
        th = np.empty(0, dtype=np.uint64)
    return rolling_window_hashes(th, lens, n)


def segment_min(
    win: np.ndarray, doc_off: np.ndarray, fill: np.uint64 = UINT64_MAX
) -> np.ndarray:
    """Per-segment minimum of window values; empty segments -> ``fill``."""
    n = len(doc_off) - 1
    if len(win) == 0:
        return np.full(n, fill, dtype=np.uint64)
    idx = np.minimum(doc_off[:-1], len(win) - 1)
    out = np.minimum.reduceat(win, idx)
    empty = doc_off[:-1] == doc_off[1:]
    out[empty] = fill
    return out
