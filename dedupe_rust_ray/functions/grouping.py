"""Vectorized within-partition candidate-pair enumeration.

The shard-groupby pattern: instead of one Ray ``map_groups`` call per
blocking key (milliseconds of overhead per group — catastrophic when LSH
emits one tiny group per band hash), rows are shuffled on a COARSE shard key
(``hash(block_key) % n_shards``) and the fine-grained grouping happens
inside the shard task with numpy. Correct because a block never spans
shards (same key -> same shard)."""

from __future__ import annotations

import numpy as np

N_SHARDS_DEFAULT = 64


def shard_of(keys: np.ndarray, n_shards: int = N_SHARDS_DEFAULT) -> np.ndarray:
    """Stable shard id per key (uint64 FNV over the key strings)."""
    import pandas as pd

    h = pd.util.hash_array(np.asarray(keys, dtype=object), hash_key="dedupe_ray_00042")
    return (h % np.uint64(n_shards)).astype(np.int32)


def local_candidate_pairs(
    keys: np.ndarray,
    *,
    max_group: int | None = None,
    neighbor_w: int = 4,
    max_pairs: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Index pairs (ia, ib) of rows sharing a key, enumerated in one pass.

    Groups larger than ``max_group`` degrade to neighbor chaining (each row
    paired with its next ``neighbor_w`` neighbors in sorted-row order) —
    the documented skew cap; any connected overlay preserves union-find
    transitivity. ``max_pairs`` cuts at group granularity (groups are
    consumed in sorted-key order; the crossing group is kept whole) and
    then trims the tail to exactly ``max_pairs``.

    Fully vectorized: per-group work is O(1) numpy segment arithmetic, so
    a shard of a million tiny LSH bands costs no Python-loop iteration per
    band (only oversized chained groups — rare by construction — take a
    short per-group loop)."""
    n = len(keys)
    empty = (np.empty(0, np.int64), np.empty(0, np.int64))
    if n < 2:
        return empty
    order = np.argsort(keys, kind="stable")
    sk = keys[order]
    boundary = np.r_[True, sk[1:] != sk[:-1]]
    gid = np.cumsum(boundary) - 1  # group id per sorted position
    sizes = np.bincount(gid)
    # within-group ASCENDING ORIGINAL indices, groups contiguous in key
    # order (matches the reference loop's np.sort(order[s:e]) per group)
    perm = np.lexsort((order, gid))
    ord2 = order[perm]
    offs = np.r_[0, np.cumsum(sizes)][:-1]

    g = sizes.astype(np.int64)
    big = (
        (g > max_group)
        if max_group is not None
        else np.zeros(len(g), dtype=bool)
    )
    w_of = np.minimum(neighbor_w, g - 1)
    # pairs per group: triu for small, sum_{x=1..w}(g-x) for chained
    L = np.where(big, w_of * g - w_of * (w_of + 1) // 2, g * (g - 1) // 2)
    L[g < 2] = 0

    if max_pairs is not None and L.sum() > 0:
        cum = np.cumsum(L)
        # groups strictly after the first cumulative crossing are dropped
        # (the crossing group stays whole; the final slice trims exactly)
        cross = int(np.searchsorted(cum, max_pairs, side="left"))
        L[cross + 1 :] = 0

    total = int(L.sum())
    if total == 0:
        return empty
    out_off = np.r_[0, np.cumsum(L)][:-1]
    ia = np.empty(total, np.int64)
    ib = np.empty(total, np.int64)

    sm = np.flatnonzero((L > 0) & ~big)
    if len(sm):
        gs, go, gl = g[sm], offs[sm], L[sm]
        # "a" elements: within each group, position i in [0, g-2],
        # repeated (g-1-i) times; runs laid out in group order
        a_counts = gs - 1
        seg_start = np.r_[0, np.cumsum(a_counts)][:-1]
        i_in_g = np.arange(int(a_counts.sum())) - np.repeat(
            seg_start, a_counts
        )
        a_pos = np.repeat(go, a_counts) + i_in_g
        reps = np.repeat(gs, a_counts) - 1 - i_in_g
        A = np.repeat(a_pos, reps)
        run_starts = np.r_[0, np.cumsum(reps)][:-1]
        off_in_run = np.arange(int(reps.sum())) - np.repeat(run_starts, reps)
        B = A + 1 + off_in_run
        # splice each group's block into its global output slot
        dest = np.arange(int(gl.sum())) + np.repeat(
            out_off[sm] - np.r_[0, np.cumsum(gl)][:-1], gl
        )
        ia[dest] = ord2[A]
        ib[dest] = ord2[B]

    for k in np.flatnonzero((L > 0) & big):  # rare by construction
        idx = ord2[offs[k] : offs[k] + g[k]]
        pos = out_off[k]
        for w in range(1, int(w_of[k]) + 1):
            m = g[k] - w
            ia[pos : pos + m] = idx[:-w]
            ib[pos : pos + m] = idx[w:]
            pos += m

    if max_pairs is not None and total > max_pairs:
        ia, ib = ia[:max_pairs], ib[:max_pairs]
    return ia, ib
