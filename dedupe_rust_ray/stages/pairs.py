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


def _pair_id_hash64(col) -> np.ndarray:
    """Vectorized 64-bit hash of one pair-endpoint column. Integer ids
    (the ER tail's uint64 ``idh``, the dedup family's int64 doc ids — every
    production caller) take a zero-copy numpy view + splitmix64; anything
    else (direct/test use with string ids) falls back to pandas' vectorized
    object hash."""
    import pyarrow as pa

    from ..functions.shingles import splitmix64

    if isinstance(col, (pa.Array, pa.ChunkedArray)) and pa.types.is_integer(
        col.type
    ):
        return splitmix64(
            col.to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)
        )
    v = col.to_numpy(zero_copy_only=False) if hasattr(col, "type") else np.asarray(col)
    if v.dtype.kind in "iu":
        return splitmix64(v.astype(np.uint64, copy=False))
    return pd.util.hash_array(v, hash_key="dedupe_ray_00042")


def dedup_pairs(pairs_ds, n_shards: int = 64, extra_cols: tuple[str, ...] = ()):
    """Collapse duplicate (doc_a, doc_b) rows nominated by multiple bands:
    shuffle on a coarse pair-hash shard, drop duplicates inside the shard.

    Arrow-native end to end (the hottest ER exchange): the add-shard stage
    appends ONE int32 column to the zero-copy Arrow block, and the
    in-shard dedup is a stable numpy lexsort + run-boundary mask that
    ``take``s the surviving rows — first occurrence per pair, exactly
    pandas ``drop_duplicates`` semantics (pinned by
    tests/test_blocking_pairs.py::test_dedup_pairs_arrow_matches_pandas),
    with no Arrow->pandas block copy anywhere."""
    import pyarrow as pa

    def add_shard(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(
                "pair_shard", pa.array([], type=pa.int32())
            )
        ha = _pair_id_hash64(batch["doc_a"])
        hb = _pair_id_hash64(batch["doc_b"])
        with np.errstate(over="ignore"):
            h = ha * np.uint64(0x9E3779B97F4A7C15) ^ hb
        return batch.append_column(
            "pair_shard",
            pa.array((h % np.uint64(n_shards)).astype(np.int32)),
        )

    def drop_dup(group: pa.Table) -> pa.Table:
        group = group.drop_columns(["pair_shard"])
        if group.num_rows == 0:
            return group
        a = group["doc_a"].to_numpy(zero_copy_only=False)
        b = group["doc_b"].to_numpy(zero_copy_only=False)
        if a.dtype.kind not in "iuf":
            # non-numeric direct/test path: exact pandas dedup (no hashed
            # keys — a 64-bit collision would silently merge two pairs)
            df = group.to_pandas().drop_duplicates(PAIR_COLUMNS)
            return pa.Table.from_pandas(df, preserve_index=False)
        # stable lexsort -> within each (a, b) run original indices stay
        # ascending, so run-head picks the FIRST occurrence; the final
        # sort restores input row order (extra columns ride along via take)
        order = np.lexsort((b, a))
        a_s, b_s = a[order], b[order]
        head = np.empty(len(order), dtype=bool)
        head[0] = True
        head[1:] = (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])
        return group.take(pa.array(np.sort(order[head])))

    return (
        pairs_ds.map_batches(add_shard, batch_format="pyarrow")
        .groupby("pair_shard")
        .map_groups(drop_dup, batch_format="pyarrow")
    )
