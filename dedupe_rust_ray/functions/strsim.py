"""String similarity: Jaro-Winkler and bounded Levenshtein (pure Python).

Used ONLY on candidate pairs that already passed the vectorized signature
screens (MinHash-estimated Jaccard / pHash prefix), so the per-pair Python
cost is applied to a tiny fraction of the data — the same cheap-then-deep
structure as the reference's quick-checksum -> full-decode phases
(/root/reference/src/main.rs:452-478 then 586-648).
"""

from __future__ import annotations


def jaro(a: str, b: str) -> float:
    if a == b:
        return 1.0
    la, lb = len(a), len(b)
    if not la or not lb:
        return 0.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    match_a = [False] * la
    match_b = [False] * lb
    matches = 0
    for i, ca in enumerate(a):
        lo = max(0, i - window)
        hi = min(lb, i + window + 1)
        for j in range(lo, hi):
            if not match_b[j] and b[j] == ca:
                match_a[i] = match_b[j] = True
                matches += 1
                break
    if not matches:
        return 0.0
    transpositions = 0
    j = 0
    for i in range(la):
        if match_a[i]:
            while not match_b[j]:
                j += 1
            if a[i] != b[j]:
                transpositions += 1
            j += 1
    t = transpositions // 2
    m = matches
    return (m / la + m / lb + (m - t) / m) / 3.0


def jaro_winkler(
    a: str, b: str, prefix_weight: float = 0.1, boost_threshold: float = 0.0
) -> float:
    """Jaro-Winkler similarity. ``boost_threshold=0.0`` (the ER scorer's
    historical behavior) always applies the prefix boost; the standard
    Winkler convention — and DuckDB's ``jaro_winkler_similarity`` — only
    boosts when the base Jaro exceeds 0.7 (pass ``boost_threshold=0.7``
    for oracle-exact parity)."""
    base = jaro(a, b)
    if base <= boost_threshold and boost_threshold > 0.0:
        return base
    prefix = 0
    for ca, cb in zip(a[:4], b[:4]):
        if ca != cb:
            break
        prefix += 1
    return base + prefix * prefix_weight * (1.0 - base)


def levenshtein_bounded(a: str, b: str, max_dist: int) -> int:
    """Bounded Levenshtein; returns ``max_dist + 1`` once the bound is
    exceeded.

    Vectorized row DP: each of the ``len(a)`` rows is computed with numpy
    ops over the whole row. The sequential insertion dependency
    (``cur[j-1] + 1``) is folded in with the running-minimum identity
    ``cur[j] = j + min_{m<=j}(base[m] - m)``. The scalar-Python version
    this replaces cost ~27 ms per 256-char pair and dominated the whole
    scoring stage (round-2 profile: 118 s of a 120 s scorer run)."""
    la, lb = len(a), len(b)
    if abs(la - lb) > max_dist:
        return max_dist + 1
    if la == 0:
        return lb
    if lb == 0:
        return la
    if la < 8 or lb < 8:  # tiny strings: scalar DP beats numpy overhead
        prev = list(range(lb + 1))
        for i in range(1, la + 1):
            cur = [i] + [0] * lb
            for j in range(1, lb + 1):
                cost = 0 if a[i - 1] == b[j - 1] else 1
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            prev = cur
        return min(prev[lb], max_dist + 1)

    import numpy as np

    A = np.frombuffer(a.encode("utf-32-le"), dtype="<u4")
    B = np.frombuffer(b.encode("utf-32-le"), dtype="<u4")
    idx = np.arange(lb + 1, dtype=np.int64)
    prev = idx.copy()
    for i in range(1, la + 1):
        neq = (B != A[i - 1]).astype(np.int64)
        base = np.empty(lb + 1, dtype=np.int64)
        base[0] = i
        # substitution / deletion candidates (no left-to-right dependency)
        np.minimum(prev[1:] + 1, prev[:-1] + neq, out=base[1:])
        # insertion closure: cur[j] = j + min_{m<=j}(base[m] - m)
        cur = np.minimum.accumulate(base - idx) + idx
        if cur.min() > max_dist:
            return max_dist + 1
        prev = cur
    return int(min(prev[lb], max_dist + 1))
