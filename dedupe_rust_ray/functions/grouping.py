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
    transitivity."""
    n = len(keys)
    if n < 2:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    order = np.argsort(keys, kind="stable")
    sk = keys[order]
    bounds = np.flatnonzero(np.r_[True, sk[1:] != sk[:-1], True])
    ia_parts: list[np.ndarray] = []
    ib_parts: list[np.ndarray] = []
    total = 0
    for s, e in zip(bounds[:-1], bounds[1:]):
        g = e - s
        if g < 2:
            continue
        idx = np.sort(order[s:e])
        if max_group is not None and g > max_group:
            for w in range(1, min(neighbor_w, g - 1) + 1):
                ia_parts.append(idx[:-w])
                ib_parts.append(idx[w:])
                total += g - w
        else:
            i, j = np.triu_indices(g, 1)
            ia_parts.append(idx[i])
            ib_parts.append(idx[j])
            total += g * (g - 1) // 2
        if max_pairs is not None and total >= max_pairs:
            break
    if not ia_parts:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    ia = np.concatenate(ia_parts)
    ib = np.concatenate(ib_parts)
    if max_pairs is not None and len(ia) > max_pairs:
        ia, ib = ia[:max_pairs], ib[:max_pairs]
    return ia, ib
