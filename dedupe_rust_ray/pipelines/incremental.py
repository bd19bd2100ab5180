"""Incremental entity resolution — absorb a delta batch of new documents
into existing cluster state WITHOUT re-profiling or re-scoring the corpus.

The production story at 10^12 docs is not "re-run the pipeline nightly";
it is "a crawl shard of new documents arrives and must be assigned to the
existing duplicate clusters in time proportional to the DELTA, not the
corpus". (The reference has no incremental mode — every run re-walks the
directory, /root/reference/src/main.rs:150-180 — which is exactly what
stops scaling first.)

State layout (created by :func:`init_er_state`, grown by
:func:`incremental_er_update`)::

    state_dir/
      stage1_profiles/   parquet parts + _manifest.json  (ALL profiled docs)
      clusters/          parquet parts (cluster_id, doc_id), clusters >= 2
      state.json         config hash + doc counts + update history

Update algorithm (all delta-bounded except one streaming probe):

1. profile the new docs (stage-1 on the delta only);
2. gather the delta's blocking keys, content hashes and id hashes to the
   driver as sorted uint64 arrays (``ray.put`` once — the delta is the
   SMALL side, so the broadcast-not-shuffle rule applies with roles
   reversed relative to a full run);
3. ONE streaming pass over the old profile state emits only rows that
   collide with the delta: band rows whose block_key is in the delta's
   key set, plus one representative (min idh) per content_hash in the
   delta's hash set.  This is the unavoidable "LSH index probe without a
   secondary index" scan: it reads the compact profile state (~1.3 KB/doc
   — never the raw documents) and ships only matches.  At full scale the
   profile checkpoint would be hash-partitioned by key range so the probe
   prunes partitions instead of scanning; the manifest already records
   per-partition lineage to support that layout.
4. candidate pairs from (delta bands ∪ touched old bands) via the normal
   shard groupby; pairs between two OLD docs are dropped — they shared
   the same key before the delta arrived, so a previous run already
   scored them (re-scoring would also break "time ∝ delta");
5. scoring over a candidate-endpoint-reduced broadcast profile set
   (pairs are capped by cfg.max_pairs_per_shard, so the endpoint set is
   delta-bounded);
6. cluster merge: union-find over [new edges ∪ binding edges of affected
   clusters]; untouched clusters stream through byte-identical.  Only
   clusters reachable from a new edge can change — everything else is
   never read.
7. append the delta's profile parts to ``stage1_profiles/`` (new unique
   file names; manifest rewritten with the extra partition entries) so
   the next update probes the grown state.

Equivalence: with blocks under ``cfg.max_block_size``,
``init(A); update(B)`` produces the same clusters as ``init(A ∪ B)``
(pytest: tests/test_incremental_er.py).  Oversized blocks degrade to
neighbor chaining whose pair choice is corpus-order dependent; cluster
membership stays correct, but which redundant edge connects a cluster may
differ — same caveat as the batch pipeline.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..config import ERConfig
from ..functions.hashing import stable_hash64
from ..stages.blocking import emit_blocking_keys
from ..stages.pairs import candidate_pairs_in_shard, dedup_pairs
from ..stages.scoring import broadcast_score_batch, pack_profiles
from ..state.checkpoint import read_manifest
from ..state.unionfind import driver_connected_components
from .er import compute_profiles, er_pipeline, exact_edges_from_profiles

_STATE_FILE = "state.json"
_PROFILE_STAGE = "stage1_profiles"


def _in_sorted(sorted_arr: np.ndarray, values: np.ndarray) -> np.ndarray:
    """Boolean membership mask of ``values`` in a sorted uint64 array."""
    if not len(sorted_arr) or not len(values):
        return np.zeros(len(values), dtype=bool)
    pos = np.searchsorted(sorted_arr, values)
    pos = np.minimum(pos, len(sorted_arr) - 1)
    return sorted_arr[pos] == values


def _gather_u64(ds: ray.data.Dataset, col: str) -> np.ndarray:
    """Distinct sorted uint64 values of one column (driver-side; caller
    guarantees the dataset is delta-sized)."""
    parts = ray.get(
        ds.map_batches(
            lambda b: pa.table(
                {col: pa.array(
                    np.unique(b[col].to_numpy().astype(np.uint64, copy=False)),
                    type=pa.uint64(),
                )}
            ),
            batch_format="pyarrow",
        ).to_arrow_refs()
    )
    arrs = [
        t[col].to_numpy().astype(np.uint64, copy=False)
        for t in parts
        if hasattr(t, "column_names") and col in t.column_names and len(t)
    ]
    return np.unique(np.concatenate(arrs)) if arrs else np.empty(0, np.uint64)


def _state_path(state_dir: str) -> str:
    return os.path.join(state_dir, _STATE_FILE)


def read_state(state_dir: str) -> dict:
    with open(_state_path(state_dir)) as f:
        return json.load(f)


def read_state_clusters(state_dir: str) -> ray.data.Dataset:
    from ..sources.storage import read_table

    return read_table(os.path.join(state_dir, "clusters"))


def _write_clusters(clusters: ray.data.Dataset, state_dir: str) -> int:
    from ..sources.storage import read_table, write_table

    out = os.path.join(state_dir, "clusters")
    tmp = out + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    write_table(clusters, tmp)
    shutil.rmtree(out, ignore_errors=True)
    os.replace(tmp, out)
    return read_table(out).count()


def init_er_state(
    docs_ds: ray.data.Dataset, cfg: ERConfig, state_dir: str
) -> dict:
    """Full run that leaves resumable incremental state behind.

    Runs the batch pipeline with per-stage checkpoints rooted at
    ``state_dir`` (so the profile state IS the stage-1 checkpoint) and
    writes the cluster assignment + state manifest."""
    import dataclasses

    cfg = dataclasses.replace(cfg, checkpoint_dir=state_dir)
    clusters = er_pipeline(docs_ds, cfg)
    n_rows = _write_clusters(clusters, state_dir)
    prof_manifest = read_manifest(state_dir, _PROFILE_STAGE) or {}
    state = {
        "config_hash": cfg.config_hash(),
        "n_docs": prof_manifest.get("num_rows", 0),
        "cluster_rows": n_rows,
        "updates": [],
        "complete": True,
    }
    with open(_state_path(state_dir), "w") as f:
        json.dump(state, f, indent=2)
    return state


def _probe_old_profiles(
    old_profiles: ray.data.Dataset,
    new_keys: np.ndarray,
    new_chashes: np.ndarray,
    cfg: ERConfig,
) -> ray.data.Dataset:
    """One streaming pass over the old profile state; emits only rows that
    collide with the delta.  Output schema is the band-row schema plus a
    ``kind`` column: 0 = blocking-key collision (full band row), 1 =
    content-hash collision (one representative per hash per batch)."""
    kref = ray.put(np.asarray(new_keys, dtype=np.uint64))
    href = ray.put(np.asarray(new_chashes, dtype=np.uint64))

    def probe(batch: pa.Table) -> pa.Table:
        keys = ray.get(kref)
        hashes = ray.get(href)
        bands = emit_blocking_keys(batch, cfg)
        bmask = _in_sorted(keys, bands["block_key"].to_numpy())
        hit = bands.filter(pa.array(bmask))

        ch = batch["content_hash"].to_numpy().astype(np.uint64, copy=False)
        idh = batch["idh"].to_numpy().astype(np.uint64, copy=False)
        hmask = _in_sorted(hashes, ch)
        # one representative (min idh) per matched hash: every old doc
        # sharing this hash is already in one cluster, so a single
        # binding endpoint suffices and a giant identical group costs
        # one row instead of the whole group
        rep_idh: list[int] = []
        rep_ch: list[int] = []
        if hmask.any():
            hidx = np.flatnonzero(hmask)
            order = hidx[np.lexsort((idh[hidx], ch[hidx]))]
            first = np.r_[True, ch[order][1:] != ch[order][:-1]]
            rep_idh = idh[order][first]
            rep_ch = ch[order][first]
        n_rep = len(rep_idh)
        exact = pa.table(
            {
                "shard": pa.array(np.zeros(n_rep, np.int32)),
                "block_key": pa.array(
                    np.zeros(n_rep, np.uint64), type=pa.uint64()
                ),
                "idh": pa.array(np.asarray(rep_idh, np.uint64),
                                type=pa.uint64()),
                "content_hash": pa.array(
                    np.asarray(rep_ch, np.uint64), type=pa.uint64()
                ),
                "aux_phash": pa.array(
                    np.zeros(n_rep, np.uint64), type=pa.uint64()
                ),
            }
        )
        out = pa.concat_tables(
            [
                hit.append_column(
                    "kind", pa.array(np.zeros(hit.num_rows, np.int8))
                ),
                exact.append_column(
                    "kind", pa.array(np.ones(n_rep, np.int8))
                ),
            ]
        )
        return out

    return old_profiles.map_batches(probe, batch_format="pyarrow")


def incremental_er_update(
    new_docs_ds: ray.data.Dataset, cfg: ERConfig, state_dir: str
) -> dict:
    """Assign a delta batch against existing state; returns the updated
    state manifest.  See module docstring for the algorithm."""
    from ..sources.storage import read_table, write_table

    state = read_state(state_dir)
    if state.get("config_hash") != cfg.config_hash():
        raise ValueError(
            "incremental update with a different config than the state was "
            f"built under ({state.get('config_hash')} != {cfg.config_hash()})"
        )
    prof_dir = os.path.join(state_dir, _PROFILE_STAGE)
    old_profiles = read_table(prof_dir)

    # -- 1. profile the delta ------------------------------------------
    new_profiles = compute_profiles(new_docs_ds, cfg).materialize()
    n_new = new_profiles.count()
    if n_new == 0:
        return state

    # -- 2. gather delta key sets (the delta is the broadcast side) ----
    new_bands = new_profiles.map_batches(
        lambda b: emit_blocking_keys(b, cfg), batch_format="pyarrow"
    ).materialize()
    new_keys = _gather_u64(new_bands, "block_key")
    new_chashes = _gather_u64(new_profiles, "content_hash")
    new_idh = _gather_u64(new_profiles, "idh")

    # -- 3. probe the old state (ONE streaming pass) -------------------
    probed = _probe_old_profiles(
        old_profiles, new_keys, new_chashes, cfg
    ).materialize()
    old_bands = probed.filter(expr="kind == 0").drop_columns(["kind"])
    old_exact = probed.filter(expr="kind == 1").select_columns(
        ["idh", "content_hash"]
    )

    # -- 4. exact edges over the delta-sized hash-collision set --------
    exact_side = old_exact.union(
        new_profiles.select_columns(["idh", "content_hash"])
    )
    exact_h = exact_edges_from_profiles(exact_side, n_shards=cfg.n_shards)

    # -- 5. candidate pairs; drop old-old (already scored) -------------
    iref = ray.put(new_idh)

    def keep_new_touching(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return batch
        ids = ray.get(iref)
        a = batch["doc_a"].to_numpy().astype(np.uint64, copy=False)
        b = batch["doc_b"].to_numpy().astype(np.uint64, copy=False)
        return batch[_in_sorted(ids, a) | _in_sorted(ids, b)]

    cand = (
        new_bands.union(old_bands)
        .groupby("shard")
        .map_groups(
            lambda g: candidate_pairs_in_shard(g, cfg), batch_format="pandas"
        )
        .map_batches(keep_new_touching, batch_format="pandas")
    )
    pairs = dedup_pairs(cand, cfg.n_shards).materialize()

    # -- 6. endpoint-reduced broadcast scoring -------------------------
    def batch_endpoint_ids(b: pa.Table) -> pa.Table:
        ids = (
            np.unique(
                np.concatenate(
                    [
                        b["doc_a"].to_numpy().astype(np.uint64, copy=False),
                        b["doc_b"].to_numpy().astype(np.uint64, copy=False),
                    ]
                )
            )
            if b.num_rows and "doc_a" in b.column_names
            else np.empty(0, np.uint64)
        )
        return pa.table({"idh": pa.array(ids, type=pa.uint64())})

    pair_ids = _gather_u64(
        pairs.map_batches(batch_endpoint_ids, batch_format="pyarrow"), "idh"
    )
    exact_ids = _gather_u64(exact_h.materialize().map_batches(
        batch_endpoint_ids, batch_format="pyarrow"), "idh")
    need_ids = np.union1d(pair_ids, exact_ids)
    nref = ray.put(need_ids)

    def keep_needed(b: pa.Table) -> pa.Table:
        ids = ray.get(nref)
        return b.filter(
            pa.array(_in_sorted(ids, b["idh"].to_numpy().astype(np.uint64)))
        )

    side = old_profiles.map_batches(keep_needed, batch_format="pyarrow").union(
        new_profiles.map_batches(keep_needed, batch_format="pyarrow")
    )
    prof_table = pa.concat_tables(
        ray.get(side.to_arrow_refs()), promote_options="default"
    )
    if prof_table.num_rows > cfg.broadcast_max_docs:
        raise RuntimeError(
            "candidate endpoint set exceeds broadcast ceiling — delta too "
            "large for incremental mode; run init_er_state instead"
        )
    ref = ray.put(pack_profiles(prof_table))
    scored = pairs.map_batches(
        lambda b: broadcast_score_batch(b, ref, cfg),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
    )
    near_h = scored.filter(
        expr=f"score >= {cfg.score_threshold}"
    ).select_columns(["doc_a", "doc_b"])

    # -- 7. idh -> doc_id on the (small) edge set ----------------------
    idh_arr = prof_table["idh"].to_numpy().astype(np.uint64, copy=False)
    order = np.argsort(idh_arr, kind="stable")
    ids_sorted = np.asarray(prof_table["doc_id"].to_pylist(), dtype=object)[
        order
    ]
    hs = idh_arr[order]
    edge_parts = ray.get(exact_h.union(near_h).to_arrow_refs())
    frames = []
    for t in edge_parts:
        names = getattr(t, "column_names", None) or list(
            getattr(t, "columns", [])
        )
        if "doc_a" not in names or not len(t):
            continue
        a = t["doc_a"].to_numpy().astype(np.uint64, copy=False)
        b = t["doc_b"].to_numpy().astype(np.uint64, copy=False)
        frames.append(
            pd.DataFrame(
                {
                    "doc_a": ids_sorted[np.searchsorted(hs, a)],
                    "doc_b": ids_sorted[np.searchsorted(hs, b)],
                }
            )
        )
    new_edges = (
        pd.concat(frames, ignore_index=True)
        if frames
        else pd.DataFrame({"doc_a": [], "doc_b": []})
    )

    # -- 8. merge with existing clusters (touch only affected ones) ----
    # broadcast SORTED uint64 hash arrays, probed with searchsorted —
    # never Python sets of strings (corpus-proportional boxed objects per
    # worker) nor per-row membership loops. The touched set is bounded by
    # the delta's candidate endpoints (broadcast_max_docs), so 8 B/key.
    clusters = read_state_clusters(state_dir)
    touched_hs = (
        np.unique(
            np.concatenate(
                [
                    np.asarray(
                        stable_hash64(new_edges["doc_a"].tolist()),
                        dtype=np.uint64,
                    ),
                    np.asarray(
                        stable_hash64(new_edges["doc_b"].tolist()),
                        dtype=np.uint64,
                    ),
                ]
            )
        )
        if len(new_edges)
        else np.array([], dtype=np.uint64)
    )
    tref = ray.put(touched_hs)

    def _sorted_hash_mask(keys: np.ndarray, values: list) -> np.ndarray:
        if not len(keys) or not len(values):
            return np.zeros(len(values), dtype=bool)
        h = np.asarray(stable_hash64(values), dtype=np.uint64)
        pos = np.minimum(np.searchsorted(keys, h), len(keys) - 1)
        return keys[pos] == h

    def affected_ids(b: pa.Table) -> pa.Table:
        keys = ray.get(tref)
        mask = _sorted_hash_mask(keys, b["doc_id"].to_pylist())
        return b.filter(pa.array(mask)).select(["cluster_id"])

    affected = set()
    for t in ray.get(
        clusters.map_batches(affected_ids, batch_format="pyarrow")
        .to_arrow_refs()
    ):
        names = getattr(t, "column_names", None) or list(
            getattr(t, "columns", [])
        )
        if "cluster_id" in names:
            affected.update(t["cluster_id"].to_pylist())
    affected_hs = (
        np.unique(np.asarray(stable_hash64(sorted(affected)), dtype=np.uint64))
        if affected
        else np.array([], dtype=np.uint64)
    )
    aref = ray.put(affected_hs)

    def split_mask(b: pa.Table, keep_affected: bool) -> pa.Table:
        keys = ray.get(aref)
        mask = _sorted_hash_mask(keys, b["cluster_id"].to_pylist())
        return b.filter(pa.array(mask if keep_affected else ~mask))

    untouched = clusters.map_batches(
        lambda b: split_mask(b, False), batch_format="pyarrow"
    )
    binding = pa.concat_tables(
        [
            t
            for t in ray.get(
                clusters.map_batches(
                    lambda b: split_mask(b, True), batch_format="pyarrow"
                ).to_arrow_refs()
            )
            if hasattr(t, "column_names") and len(t)
        ]
        or [pa.table({"cluster_id": pa.array([], pa.string()),
                      "doc_id": pa.array([], pa.string())})],
        promote_options="default",
    )
    bind_edges = pd.DataFrame(
        {
            "doc_a": binding["cluster_id"].to_pylist(),
            "doc_b": binding["doc_id"].to_pylist(),
        }
    )
    all_edges = pd.concat([new_edges, bind_edges], ignore_index=True)
    if len(all_edges):
        relabeled = driver_connected_components(all_edges)
        # arrow block, matching `untouched` — Ray's sort cannot mix
        # pandas and arrow blocks in one dataset
        relabeled_ds = ray.data.from_arrow(
            pa.Table.from_pandas(
                relabeled[["cluster_id", "doc_id"]], preserve_index=False
            )
        )
        updated = untouched.union(relabeled_ds)
    else:
        updated = untouched
    from .common import canonical_sort

    updated = canonical_sort(
        updated.select_columns(["cluster_id", "doc_id"]),
        ["cluster_id", "doc_id"],
    )
    n_rows = _write_clusters(updated, state_dir)

    # -- 9. append delta profiles to the state (unique part names) -----
    delta_tag = f"delta{len(state['updates'])}"
    tmp = os.path.join(state_dir, f"_{delta_tag}.tmp")
    shutil.rmtree(tmp, ignore_errors=True)
    write_table(new_profiles, tmp)
    import pyarrow.parquet as pq

    manifest = read_manifest(state_dir, _PROFILE_STAGE) or {
        "partitions": [], "num_rows": 0, "num_bytes": 0, "num_files": 0,
    }
    for i, name in enumerate(sorted(os.listdir(tmp))):
        if not name.endswith(".parquet"):
            continue
        dst = f"{delta_tag}-{i:05d}.parquet"
        os.replace(os.path.join(tmp, name), os.path.join(prof_dir, dst))
        path = os.path.join(prof_dir, dst)
        manifest["partitions"].append(
            {
                "file": dst,
                "rows": pq.read_metadata(path).num_rows,
                "bytes": os.path.getsize(path),
            }
        )
    shutil.rmtree(tmp, ignore_errors=True)
    manifest["num_rows"] = sum(p["rows"] for p in manifest["partitions"])
    manifest["num_bytes"] = sum(p["bytes"] for p in manifest["partitions"])
    manifest["num_files"] = len(manifest["partitions"])
    with open(os.path.join(prof_dir, "_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    # a stale edge checkpoint must not be resumed against the grown state
    shutil.rmtree(os.path.join(state_dir, "stage5_edges"), ignore_errors=True)

    state["n_docs"] = manifest["num_rows"]
    state["cluster_rows"] = n_rows
    state["updates"].append(
        {
            "new_docs": n_new,
            "new_edges": int(len(new_edges)),
            "affected_clusters": len(affected),
        }
    )
    with open(_state_path(state_dir), "w") as f:
        json.dump(state, f, indent=2)
    return state
