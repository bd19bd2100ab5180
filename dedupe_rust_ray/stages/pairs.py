"""Stages 3-4 — candidate pair generation + cross-band dedup (shard pattern).

``groupby('shard')`` is THE shuffle (reference analog: the in-memory
HashMap group-by at /root/reference/src/main.rs:365-435), where
``shard = hash(block_key) % n_shards`` — a block never spans shards, and the
fine-grained per-block grouping happens vectorized inside the shard task
(functions/grouping.py) instead of paying Ray per-group overhead for
millions of tiny LSH bands.

Within each shard:

- singleton blocks are pruned (src/main.rs:418-421, 610-613) — they simply
  produce no index pairs;
- pairs with equal ``content_hash`` are skipped — already connected by the
  exact-dup path, so giant identical groups cost zero pairs here (the skew
  guard the reference never needed);
- blocks larger than ``cfg.max_block_size`` degrade to *neighbor chaining*
  (each doc paired with its next W neighbors): true duplicate clusters stay
  connected (any connected overlay suffices for union-find transitivity)
  while the pair count drops from O(n^2) to O(n*W);
- ``cfg.max_pairs_per_shard`` bounds a shard task's output outright.

Cross-band dedup collapses the same (doc_a, doc_b) nominated by many bands
via a second coarse-shard groupby on the pair hash.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..config import ERConfig
from ..functions.grouping import local_candidate_pairs

PAIR_COLUMNS = ["doc_a", "doc_b"]

_EMPTY = pd.DataFrame({"doc_a": pd.Series(dtype=object), "doc_b": pd.Series(dtype=object)})


def candidate_pairs_in_shard(group: pd.DataFrame, cfg: ERConfig) -> pd.DataFrame:
    """Pairs within one shard. The id column is ``idh`` (uint64 — the ER
    tail path, fully numeric) or ``doc_id`` (direct/test use); output
    columns are (doc_a, doc_b) in the same dtype as the input ids."""
    keys = group["block_key"].to_numpy()
    ia, ib = local_candidate_pairs(
        keys,
        max_group=cfg.max_block_size,
        max_pairs=cfg.max_pairs_per_shard,
    )
    id_col = "idh" if "idh" in group.columns else "doc_id"
    if not len(ia):
        dt = group[id_col].dtype if id_col == "idh" else object
        return pd.DataFrame(
            {"doc_a": pd.Series(dtype=dt), "doc_b": pd.Series(dtype=dt)}
        )
    ids = group[id_col].to_numpy()
    ch = group["content_hash"].to_numpy()
    a, b = ids[ia], ids[ib]
    keep = (a != b) & (ch[ia] != ch[ib])
    if "aux_phash" in group.columns:
        # multi-index Hamming verification: a pair nominated by a pHash
        # chunk must have full-hash Hamming <= threshold; random chunk
        # collisions (the quadratic term at scale) die right here
        from ..functions.simhash import hamming64

        aux = group["aux_phash"].to_numpy().astype(np.uint64)
        is_ph = (aux[ia] != 0) | (aux[ib] != 0)
        hd = hamming64(aux[ia], aux[ib])
        keep &= ~is_ph | (hd <= cfg.phash_hamming_max)
    a, b = a[keep], b[keep]
    swap = a > b
    out = pd.DataFrame(
        {"doc_a": np.where(swap, b, a), "doc_b": np.where(swap, a, b)}
    )
    return out.drop_duplicates(PAIR_COLUMNS)


def attach_to_pairs(
    pairs,
    side,
    cols,
    num_partitions: int,
    *,
    pair_keys: tuple[str, str] = ("doc_a", "doc_b"),
    side_key: str = "doc_id",
):
    """Hash-join ``side`` (a dataset keyed by ``doc_id`` carrying ``cols``)
    onto pair rows as ``_a``/``_b``-suffixed columns — the SCALE path used
    when the side table is too large to broadcast (at 10^12 docs it never
    fits). Two ``Dataset.join`` shuffles partitioned on doc id.

    The joins are separated by a ``materialize()``: each hash join spawns
    one aggregator actor per partition, and two concurrent joins can
    request more actor CPUs than the cluster has — the barrier caps peak
    actor demand at one join's worth."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:  # noqa: BLE001
        cpus = 8
    num_partitions = max(4, min(num_partitions, cpus))
    ka, kb = pair_keys
    side_a = side.rename_columns(
        {c: f"{c}_a" for c in cols} | {side_key: ka}
    ).select_columns([ka] + [f"{c}_a" for c in cols])
    side_b = side.rename_columns(
        {c: f"{c}_b" for c in cols} | {side_key: kb}
    ).select_columns([kb] + [f"{c}_b" for c in cols])
    j = pairs.join(
        side_a, join_type="inner", num_partitions=num_partitions, on=(ka,)
    ).materialize()
    return j.join(
        side_b, join_type="inner", num_partitions=num_partitions, on=(kb,)
    )


def dedup_pairs(pairs_ds, n_shards: int = 64, extra_cols: tuple[str, ...] = ()):
    """Collapse duplicate (doc_a, doc_b) rows nominated by multiple bands:
    shuffle on a coarse pair-hash shard, drop duplicates inside the shard."""

    def add_shard(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return batch.assign(pair_shard=np.array([], dtype=np.int32))
        # vectorized per-column hashes combined numerically — no per-row
        # string concatenation/allocation on the pair shuffle
        ha = pd.util.hash_array(
            batch["doc_a"].to_numpy(), hash_key="dedupe_ray_00042"
        )
        hb = pd.util.hash_array(
            batch["doc_b"].to_numpy(), hash_key="dedupe_ray_00042"
        )
        with np.errstate(over="ignore"):
            h = ha * np.uint64(0x9E3779B97F4A7C15) ^ hb
        return batch.assign(
            pair_shard=(h % np.uint64(n_shards)).astype(np.int32)
        )

    return (
        pairs_ds.map_batches(add_shard, batch_format="pandas")
        .groupby("pair_shard")
        .map_groups(
            lambda g: g.drop_duplicates(PAIR_COLUMNS).drop(columns=["pair_shard"]),
            batch_format="pandas",
        )
    )
