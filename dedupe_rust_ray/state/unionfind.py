"""Stage 6 — transitive clustering (connected components over match edges).

The reference gets transitivity for free from hash-bucket equality
(/root/reference/src/main.rs:616-624); a similarity threshold does not, so
match edges need explicit connected components:

- **driver union-find** (small edge sets — tests, sf-scale runs): classic
  DSU with path compression + union by size. Also the test oracle.
- **distributed min-label propagation** (scale path): iterate
  ``labels(node) <- min(label over self + neighbors)`` as two
  hash-partitioned shard groupbys per round (gather proposals at the
  source shard, scatter-min at the target shard — join-free) until
  fixpoint — the hash-partitioned edge-propagation scheme of BTS-style
  distributed CC (PAPERS.md: "BTS: Load-Balanced Distributed
  Union-Find", ICDE 2024).
  Rounds are fully numeric (uint64 node hashes, min-hash labels); the
  final pass maps components back to doc_id strings and takes the
  LEXICOGRAPHIC min per component, so ``cluster_id = min(doc_id)`` still
  matches the reference's canonicalization (src/main.rs:630). Monotone
  decreasing labels guarantee convergence in O(log diameter) rounds;
  fixpoint is ``sum(changed) == 0`` where each scatter-min row flags
  whether its label decreased this round.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


class UnionFind:
    """Classic DSU with path compression and union by size."""

    def __init__(self):
        self.parent: dict[str, str] = {}
        self.size: dict[str, int] = {}

    def find(self, x: str) -> str:
        parent = self.parent
        if x not in parent:
            parent[x] = x
            self.size[x] = 1
            return x
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        if self.size[ra] < self.size[rb]:
            ra, rb = rb, ra
        self.parent[rb] = ra
        self.size[ra] += self.size[rb]

    def labels(self) -> dict[str, str]:
        """node -> min(doc_id) of its component (canonical cluster id)."""
        comp: dict[str, str] = {}
        for node in self.parent:
            root = self.find(node)
            cur = comp.get(root)
            if cur is None or node < cur:
                comp[root] = node
        return {node: comp[self.find(node)] for node in self.parent}


def driver_connected_components(edges: pd.DataFrame) -> pd.DataFrame:
    """(doc_a, doc_b) edges -> (doc_id, cluster_id), driver-side.

    Vectorized min-label propagation with pointer jumping over factorized
    node codes. ``np.unique`` returns nodes SORTED, so integer codes are
    lexicographic ranks and the component's min code IS its min doc_id —
    the reference's canonicalization (src/main.rs:630) survives the
    factorization. This is the serial-seconds path of every sf-scale ER
    run (the per-edge Python DSU loop cost ~1.1 s at 72k edges on the
    32-CPU bench leg — pure driver time that the cluster cannot hide);
    the numpy rounds cost milliseconds. ``UnionFind`` above remains the
    reference oracle (tests/test_unionfind.py pins equality on random
    graphs)."""
    if not len(edges):
        return pd.DataFrame({"doc_id": [], "cluster_id": []})
    a = edges["doc_a"].to_numpy()
    b = edges["doc_b"].to_numpy()
    nodes, codes = np.unique(np.concatenate([a, b]), return_inverse=True)
    src = np.concatenate([codes[: len(a)], codes[len(a):]])
    dst = np.concatenate([codes[len(a):], codes[: len(a)]])
    labels = np.arange(len(nodes), dtype=np.int64)
    while True:
        prev = labels
        # gather the smallest neighbor label into each target node...
        nxt = labels.copy()
        np.minimum.at(nxt, dst, labels[src])
        # ...then pointer-jump (label-of-label) until this round's
        # chains are fully compressed
        while True:
            jumped = nxt[nxt]
            if np.array_equal(jumped, nxt):
                break
            nxt = jumped
        labels = nxt
        if np.array_equal(labels, prev):
            break
    return pd.DataFrame(
        {"doc_id": nodes, "cluster_id": nodes[labels]}
    ).sort_values("doc_id", ignore_index=True)


def distributed_connected_components(
    edges_ds, max_rounds: int = 50, n_shards: int = 64,
    pointer_jumping: bool = True,
):
    """Edges dataset (doc_a, doc_b) -> labels dataset (doc_id, cluster_id).

    Join-free BTS-style propagation: every round is exactly TWO
    hash-partitioned shard groupbys (sort shuffles — no per-round join
    aggregator actor pools):

    1. **gather**: directed edge rows keyed by their SOURCE node meet the
       source's current label in one shard; each edge emits a proposal
       ``(dst, label(src))``;
    2. **scatter-min**: proposals + current labels keyed by the TARGET
       node; the minimum wins, and each node row carries a ``changed``
       flag (new label < previous label). Monotone decreasing labels make
       ``sum(changed) == 0`` the fixpoint — no extra hashing pass over the
       label set per round.

    Raises ``RuntimeError`` if ``max_rounds`` is exhausted before the
    fixpoint (a silently over-segmented result would look valid).

    The ROUNDS are fully numeric: nodes are 64-bit stable hashes of
    doc_id, labels are min-hash-per-component — every per-round shuffle
    moves fixed-width uint64 columns, never object strings. doc_id
    strings appear only in one final canonicalization pass that joins
    members to their component (co-located by node-hash shard) and takes
    the LEXICOGRAPHIC min doc_id per component, so the final
    ``cluster_id = min(doc_id)`` still matches the reference
    (/root/reference/src/main.rs:630). Hash collisions between distinct
    doc ids are detected in that pass and raise. Converges in
    O(log diameter)-ish rounds for typical duplicate-cluster graphs.
    """
    from ..functions.hashing import stable_hash64
    from ..stages.blocking import shard_of_u64

    def directed_rows(batch: pa.Table) -> pa.Table:
        ha = stable_hash64(batch["doc_a"].to_pylist())
        hb = stable_hash64(batch["doc_b"].to_pylist())
        src = np.concatenate([ha, hb])
        dst = np.concatenate([hb, ha])
        return pa.table(
            {
                "shard": pa.array(shard_of_u64(src, n_shards), type=pa.int32()),
                "key": pa.array(src, type=pa.uint64()),
                "other": pa.array(dst, type=pa.uint64()),
                "kind": pa.array(
                    np.full(len(src), 1, dtype=np.int8), type=pa.int8()
                ),
            }
        )

    # (node-hash, doc_id) member rows — built ONCE, used only in the final
    # canonicalization pass; the rounds never carry strings
    def member_rows(batch: pa.Table) -> pa.Table:
        a = batch["doc_a"].to_pylist()
        b = batch["doc_b"].to_pylist()
        h = np.concatenate([stable_hash64(a), stable_hash64(b)])
        return pa.table(
            {
                "shard": pa.array(shard_of_u64(h, n_shards), type=pa.int32()),
                "nid": pa.array(h, type=pa.uint64()),
                "doc_id": pa.array(a + b, type=pa.string()),
            }
        )

    def dedup_members(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop_duplicates(["nid", "doc_id"])
        per_nid = out.groupby("nid")["doc_id"].nunique()
        if (per_nid > 1).any():
            raise RuntimeError(
                "64-bit doc_id hash collision in connected components"
            )
        return out[["nid", "doc_id"]]

    members = (
        edges_ds.map_batches(member_rows, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(dedup_members, batch_format="pandas")
        .materialize()
    )

    edges2 = (
        edges_ds.map_batches(directed_rows, batch_format="pyarrow").materialize()
    )

    # all per-shard kernels below are pure numpy over arrow groups —
    # uint64 keys/labels never pass through pandas, whose dtype promotion
    # on mixed/empty frames upcasts uint64 to float64 and corrupts values
    # past 2^53

    def init_in_shard(g: pa.Table) -> pa.Table:
        key = g["key"].to_numpy().astype(np.uint64, copy=False)
        other = g["other"].to_numpy().astype(np.uint64, copy=False)
        lab = np.minimum(key, other)
        order = np.argsort(key, kind="stable")
        sk, sl = key[order], lab[order]
        bounds = np.flatnonzero(np.r_[True, sk[1:] != sk[:-1]])
        mins = np.minimum.reduceat(sl, bounds)
        return pa.table(
            {
                "doc_id": pa.array(sk[bounds], type=pa.uint64()),
                "cluster_id": pa.array(mins, type=pa.uint64()),
            }
        )

    labels = (
        edges2.groupby("shard")
        .map_groups(init_in_shard, batch_format="pyarrow")
        .materialize()
    )

    def label_rows(batch: pa.Table) -> pa.Table:
        keys = batch["doc_id"].to_numpy().astype(np.uint64, copy=False)
        return pa.table(
            {
                "shard": pa.array(shard_of_u64(keys, n_shards), type=pa.int32()),
                "key": batch["doc_id"],
                "other": batch["cluster_id"],
                "kind": pa.array(
                    np.zeros(batch.num_rows, dtype=np.int8), type=pa.int8()
                ),
            }
        )

    def gather(g: pa.Table) -> pa.Table:
        """One shard of labels + outgoing edges -> proposals (dst, label).

        Emitted rows keep ``kind``: the node's own current label travels as
        kind=0 (so scatter-min can compare old vs new), neighbor proposals
        as kind=1. Every edge source's label lives in this same shard by
        construction (both sharded on the source node hash)."""
        kind = g["kind"].to_numpy()
        key = g["key"].to_numpy().astype(np.uint64, copy=False)
        other = g["other"].to_numpy().astype(np.uint64, copy=False)
        labm = kind == 0
        lk, lv = key[labm], other[labm]
        order = np.argsort(lk, kind="stable")
        lk, lv = lk[order], lv[order]
        em = ~labm
        pos = np.searchsorted(lk, key[em])
        lab_of_src = lv[pos]
        doc = np.concatenate([other[em], lk])
        cl = np.concatenate([lab_of_src, lv])
        kinds = np.concatenate(
            [np.ones(int(em.sum()), np.int8), np.zeros(len(lk), np.int8)]
        )
        return pa.table(
            {
                "doc_id": pa.array(doc, type=pa.uint64()),
                "cluster_id": pa.array(cl, type=pa.uint64()),
                "kind": pa.array(kinds, type=pa.int8()),
            }
        )

    def proposal_rows(batch: pa.Table) -> pa.Table:
        keys = batch["doc_id"].to_numpy().astype(np.uint64, copy=False)
        return batch.append_column(
            "shard", pa.array(shard_of_u64(keys, n_shards), type=pa.int32())
        )

    _U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)

    def scatter_min(g: pa.Table) -> pa.Table:
        doc = g["doc_id"].to_numpy().astype(np.uint64, copy=False)
        cl = g["cluster_id"].to_numpy().astype(np.uint64, copy=False)
        kind = g["kind"].to_numpy()
        order = np.argsort(doc, kind="stable")
        sd, sc, sk = doc[order], cl[order], kind[order]
        bounds = np.flatnonzero(np.r_[True, sd[1:] != sd[:-1]])
        mins = np.minimum.reduceat(sc, bounds)
        old = np.full(len(bounds), _U64_MAX, dtype=np.uint64)
        k0 = np.flatnonzero(sk == 0)
        grp_of_k0 = np.searchsorted(bounds, k0, side="right") - 1
        old[grp_of_k0] = sc[k0]
        changed = (mins < old).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(sd[bounds], type=pa.uint64()),
                "cluster_id": pa.array(mins, type=pa.uint64()),
                "changed": pa.array(changed, type=pa.int64()),
            }
        )

    def finish(final_labels):
        """Attach doc_id strings (co-located by nid shard) and
        canonicalize: cluster_id = LEXICOGRAPHIC min doc_id per root."""

        def lab_side(b: pa.Table) -> pa.Table:
            nid = b["doc_id"].to_numpy().astype(np.uint64, copy=False)
            n = b.num_rows
            return pa.table(
                {
                    "shard": pa.array(
                        shard_of_u64(nid, n_shards), type=pa.int32()
                    ),
                    "nid": pa.array(nid, type=pa.uint64()),
                    "root": b["cluster_id"],
                    # sentinel, NOT null: nullable uint64 becomes float64
                    # through pandas blocks and loses precision past 2^53
                    "doc_id": pa.array([""] * n, type=pa.string()),
                    "kind": pa.array(np.zeros(n, np.int8), type=pa.int8()),
                }
            )

        def mem_side(b: pa.Table) -> pa.Table:
            nid = b["nid"].to_numpy().astype(np.uint64, copy=False)
            n = b.num_rows
            return pa.table(
                {
                    "shard": pa.array(
                        shard_of_u64(nid, n_shards), type=pa.int32()
                    ),
                    "nid": pa.array(nid, type=pa.uint64()),
                    "root": pa.array(np.zeros(n, np.uint64), type=pa.uint64()),
                    "doc_id": b["doc_id"],
                    "kind": pa.array(np.ones(n, np.int8), type=pa.int8()),
                }
            )

        def attach_root(g: pa.Table) -> pa.Table:
            kind = g["kind"].to_numpy()
            nid = g["nid"].to_numpy().astype(np.uint64, copy=False)
            root = g["root"].to_numpy().astype(np.uint64, copy=False)
            labm = kind == 0
            lk, lv = nid[labm], root[labm]
            order = np.argsort(lk, kind="stable")
            lk, lv = lk[order], lv[order]
            mem_idx = np.flatnonzero(~labm)
            pos = np.searchsorted(lk, nid[mem_idx])
            doc_col = g["doc_id"]
            if isinstance(doc_col, pa.ChunkedArray):
                doc_col = doc_col.combine_chunks()
            return pa.table(
                {
                    "root": pa.array(lv[pos], type=pa.uint64()),
                    "doc_id": doc_col.take(pa.array(mem_idx)),
                }
            )

        rooted = (
            final_labels.map_batches(lab_side, batch_format="pyarrow")
            .union(members.map_batches(mem_side, batch_format="pyarrow"))
            .groupby("shard")
            .map_groups(attach_root, batch_format="pyarrow")
        )

        def root_shard(b: pa.Table) -> pa.Table:
            r = b["root"].to_numpy().astype(np.uint64, copy=False)
            return b.append_column(
                "shard", pa.array(shard_of_u64(r, n_shards), type=pa.int32())
            )

        def canonicalize(g: pd.DataFrame) -> pd.DataFrame:
            mins = g.groupby("root")["doc_id"].transform("min")
            return pd.DataFrame(
                {"cluster_id": mins.to_numpy(), "doc_id": g["doc_id"].to_numpy()}
            )

        return (
            rooted.map_batches(root_shard, batch_format="pyarrow")
            .groupby("shard")
            .map_groups(
                lambda g: canonicalize(g.drop(columns=["shard"])),
                batch_format="pandas",
            )
        )

    def jump_rows(batch: pa.Table) -> pa.Table:
        """Pointer-jumping requests: dereference each node's label.

        A row (key=L(u), other=u, kind=2) lands in L(u)'s gather shard and
        — through the SAME edge-lookup path — emits the proposal
        (u, L(L(u))). Plain min-label propagation moves the component
        minimum ONE hop per round (O(diameter) rounds); label-of-label
        shortcutting halves remaining distances, so long-diameter
        components (chains from neighbor-chained mega blocks, sparse
        relational graphs) converge in O(log diameter) rounds. Labels are
        always real node ids (inits and proposals only ever propagate
        node hashes), so the dereference target always holds a label row."""
        labs = batch["cluster_id"].to_numpy().astype(np.uint64, copy=False)
        return pa.table(
            {
                "shard": pa.array(shard_of_u64(labs, n_shards), type=pa.int32()),
                "key": batch["cluster_id"],
                "other": batch["doc_id"],
                "kind": pa.array(
                    np.full(batch.num_rows, 2, dtype=np.int8), type=pa.int8()
                ),
            }
        )

    for _ in range(max_rounds):
        mixed = labels.map_batches(label_rows, batch_format="pyarrow")
        if pointer_jumping:
            mixed = mixed.union(
                labels.map_batches(jump_rows, batch_format="pyarrow")
            )
        mixed = mixed.union(edges2)
        proposals = mixed.groupby("shard").map_groups(
            gather, batch_format="pyarrow"
        )
        labels = (
            proposals.map_batches(proposal_rows, batch_format="pyarrow")
            .groupby("shard")
            .map_groups(scatter_min, batch_format="pyarrow")
            .materialize()
        )
        # Ray's sort emits one block per INPUT block, and each round's
        # union (labels + jumps + edges) feeds the sort — left unchecked
        # the label block count compounds per round and the round-sort's
        # driver-side planning blows up (observed: 2^rounds blocks).
        # Re-pack to n_shards blocks whenever it drifts.
        if labels.num_blocks() > 2 * n_shards:
            labels = labels.repartition(n_shards).materialize()
        if labels.sum("changed") == 0:
            return finish(labels.drop_columns(["changed"]))
    raise RuntimeError(
        f"distributed_connected_components did not converge within "
        f"{max_rounds} rounds — labels were still changing (long-diameter "
        f"component?); raise max_rounds (cfg.max_label_rounds)"
    )
