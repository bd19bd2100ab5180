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
  Labels are doc_id strings; min is lexicographic, so the final
  ``cluster_id = min(doc_id)`` matches the reference's canonicalization
  (src/main.rs:630). Monotone decreasing labels guarantee convergence in
  O(log diameter) rounds; fixpoint is ``sum(changed) == 0`` where each
  scatter-min row flags whether its label decreased this round.
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
    """(doc_a, doc_b) edges -> (doc_id, cluster_id), driver-side."""
    uf = UnionFind()
    for a, b in zip(edges["doc_a"], edges["doc_b"]):
        uf.union(a, b)
    lab = uf.labels()
    return pd.DataFrame(
        {"doc_id": list(lab.keys()), "cluster_id": list(lab.values())}
    ).sort_values("doc_id", ignore_index=True)


def distributed_connected_components(
    edges_ds, max_rounds: int = 50, n_shards: int = 64
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

    Labels are doc_id strings; the lexicographic minimum makes the final
    ``cluster_id = min(doc_id)`` match the reference's canonicalization
    (/root/reference/src/main.rs:630). Converges in O(log diameter)-ish
    rounds for typical duplicate-cluster graphs.
    """
    from ..functions.grouping import shard_of

    def directed_rows(batch: pa.Table) -> pa.Table:
        a = batch["doc_a"].to_pylist()
        b = batch["doc_b"].to_pylist()
        src = np.array(a + b, dtype=object)
        dst = np.array(b + a, dtype=object)
        return pa.table(
            {
                "shard": pa.array(shard_of(src, n_shards), type=pa.int32()),
                "key": pa.array(src, type=pa.string()),
                "other": pa.array(dst, type=pa.string()),
                "kind": pa.array(
                    np.full(len(src), 1, dtype=np.int8), type=pa.int8()
                ),
            }
        )

    edges2 = (
        edges_ds.map_batches(directed_rows, batch_format="pyarrow").materialize()
    )

    def init_in_shard(g: pd.DataFrame) -> pd.DataFrame:
        lab = (
            pd.DataFrame({"key": g["key"], "lab": np.minimum(g["key"], g["other"])})
            .groupby("key", as_index=False)["lab"]
            .min()
        )
        return lab.rename(columns={"key": "doc_id", "lab": "cluster_id"})

    labels = (
        edges2.groupby("shard")
        .map_groups(
            lambda g: init_in_shard(g.drop(columns=["shard"])),
            batch_format="pandas",
        )
        .materialize()
    )

    def label_rows(batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch["doc_id"].to_pylist(), dtype=object)
        return pa.table(
            {
                "shard": pa.array(shard_of(keys, n_shards), type=pa.int32()),
                "key": batch["doc_id"],
                "other": batch["cluster_id"],
                "kind": pa.array(
                    np.zeros(batch.num_rows, dtype=np.int8), type=pa.int8()
                ),
            }
        )

    def gather(g: pd.DataFrame) -> pd.DataFrame:
        """One shard of labels + outgoing edges -> proposals (dst, label).

        Emitted rows keep ``kind``: the node's own current label travels as
        kind=0 (so scatter-min can compare old vs new), neighbor proposals
        as kind=1."""
        lab = g[g["kind"] == 0]
        lab_map = dict(zip(lab["key"], lab["other"]))
        e = g[g["kind"] == 1]
        props = pd.DataFrame(
            {
                "doc_id": e["other"].to_numpy(),
                "cluster_id": e["key"].map(lab_map).to_numpy(),
            }
        ).dropna()
        props["kind"] = np.int8(1)
        own = pd.DataFrame(
            {"doc_id": lab["key"], "cluster_id": lab["other"]}
        )
        own["kind"] = np.int8(0)
        return pd.concat([props, own], ignore_index=True)

    def proposal_rows(batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch["doc_id"].to_pylist(), dtype=object)
        return batch.append_column(
            "shard", pa.array(shard_of(keys, n_shards), type=pa.int32())
        )

    def scatter_min(g: pd.DataFrame) -> pd.DataFrame:
        new = g.groupby("doc_id", as_index=False)["cluster_id"].min()
        old = g[g["kind"] == 0][["doc_id", "cluster_id"]].rename(
            columns={"cluster_id": "old"}
        )
        m = new.merge(old, on="doc_id", how="left")
        new["changed"] = (
            m["old"].isna() | (m["cluster_id"] < m["old"])
        ).to_numpy(dtype=np.int64)
        return new

    for _ in range(max_rounds):
        mixed = labels.map_batches(label_rows, batch_format="pyarrow").union(edges2)
        proposals = mixed.groupby("shard").map_groups(
            lambda g: gather(g.drop(columns=["shard"])), batch_format="pandas"
        )
        labels = (
            proposals.map_batches(proposal_rows, batch_format="pyarrow")
            .groupby("shard")
            .map_groups(
                lambda g: scatter_min(g.drop(columns=["shard"])),
                batch_format="pandas",
            )
            .materialize()
        )
        if labels.sum("changed") == 0:
            return labels.drop_columns(["changed"])
    raise RuntimeError(
        f"distributed_connected_components did not converge within "
        f"{max_rounds} rounds — labels were still changing (long-diameter "
        f"component?); raise max_rounds (cfg.max_label_rounds)"
    )
