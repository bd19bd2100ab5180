"""Stages 3-4 — candidate pair generation inside blocks + cross-band dedup.

``groupby('block_key')`` is THE shuffle (reference analog: the in-memory
HashMap group-by at /root/reference/src/main.rs:365-435). Within each block:

- singleton blocks are pruned (src/main.rs:418-421, 610-613);
- pairs with equal ``content_hash`` are skipped — they are already connected
  by the exact-dup path, so giant identical groups cost zero pairs here
  (the skew guard the reference never needed);
- blocks larger than ``cfg.max_block_size`` switch from all-pairs to
  *neighbor chaining*: doc_ids sorted, each doc paired with its next W
  neighbors. True duplicate clusters stay connected (any connected overlay
  suffices for union-find transitivity) while the pair count drops from
  O(n^2) to O(n*W) — the documented skew/cap policy (SURVEY.md §4.1).

Cross-band dedup then collapses the same (doc_a, doc_b) nominated by many
bands to one row via groupby on the canonical pair.
"""

from __future__ import annotations

import pandas as pd

from ..config import ERConfig

_NEIGHBOR_W = 4

PAIR_COLUMNS = ["doc_a", "doc_b"]


def candidate_pairs_in_block(group: pd.DataFrame, cfg: ERConfig) -> pd.DataFrame:
    g = group.drop_duplicates("doc_id")
    n = len(g)
    if n < 2:
        return pd.DataFrame({"doc_a": [], "doc_b": []}, dtype=object)
    g = g.sort_values("doc_id")
    ids = g["doc_id"].tolist()
    hashes = g["content_hash"].tolist()
    out_a: list[str] = []
    out_b: list[str] = []
    if n <= cfg.max_block_size:
        for i in range(n):
            for j in range(i + 1, n):
                if hashes[i] != hashes[j]:
                    out_a.append(ids[i])
                    out_b.append(ids[j])
                if len(out_a) >= cfg.max_pairs_per_block:
                    break
            if len(out_a) >= cfg.max_pairs_per_block:
                break
    else:
        # neighbor chaining for oversized (skewed) blocks
        for i in range(n - 1):
            for j in range(i + 1, min(i + 1 + _NEIGHBOR_W, n)):
                if hashes[i] != hashes[j]:
                    out_a.append(ids[i])
                    out_b.append(ids[j])
    return pd.DataFrame({"doc_a": out_a, "doc_b": out_b}, dtype=object)


def dedup_pairs(pairs_ds, num_partitions: int | None = None):
    """Collapse duplicate (doc_a, doc_b) rows nominated by multiple bands."""
    return pairs_ds.groupby(PAIR_COLUMNS).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )
