"""Stage 6 — transitive clustering (connected components over match edges).

The reference gets transitivity for free from hash-bucket equality
(/root/reference/src/main.rs:616-624); a similarity threshold does not, so
match edges need explicit connected components:

- **driver union-find** (small edge sets — tests, sf-scale runs): classic
  DSU with path compression + union by size. Also the test oracle.
- **distributed min-label propagation** (scale path): iterate
  ``labels(node) <- min(label over self + neighbors)`` as
  join + groupby().aggregate(Min) rounds until fixpoint — the
  hash-partitioned edge-propagation scheme of BTS-style distributed CC
  (PAPERS.md: "BTS: Load-Balanced Distributed Union-Find", ICDE 2024).
  Labels are doc_id strings; min is lexicographic, so the final
  ``cluster_id = min(doc_id)`` matches the reference's canonicalization
  (src/main.rs:630). Monotone decreasing labels guarantee convergence in
  O(log diameter) rounds; fixpoint is detected with a cheap per-round
  label-multiset hash (labels can only decrease, so an unchanged hash sum
  means converged).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import stable_hash64


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


def _label_signature(labels_ds) -> int:
    """Order-insensitive uint64 signature of the (node,label) multiset."""

    def sig_batch(batch: pa.Table) -> pa.Table:
        s = stable_hash64(
            [
                f"{n}\x1f{l}"
                for n, l in zip(
                    batch["doc_id"].to_pylist(), batch["cluster_id"].to_pylist()
                )
            ]
        )
        total = np.uint64(0)
        with np.errstate(over="ignore"):
            for v in s:
                total += v
        return pa.table({"sig": pa.array([int(total)], type=pa.uint64())})

    parts = labels_ds.map_batches(sig_batch, batch_format="pyarrow").take_all()
    total = 0
    for row in parts:
        total = (total + int(row["sig"])) % (1 << 64)
    return total


def distributed_connected_components(edges_ds, max_rounds: int = 50):
    """Edges dataset (doc_a, doc_b) -> labels dataset (doc_id, cluster_id).

    Each round shuffles label proposals by node and keeps the minimum; the
    edge set itself is static and re-streamed from its (materialized) blocks.
    """
    import ray.data
    from ray.data.aggregate import Min

    edges_ds = edges_ds.materialize()

    def init_labels(batch: pa.Table) -> pa.Table:
        a = batch["doc_a"].to_pylist()
        b = batch["doc_b"].to_pylist()
        m = [min(x, y) for x, y in zip(a, b)]
        return pa.table(
            {
                "doc_id": pa.array(a + b, type=pa.string()),
                "cluster_id": pa.array(m + m, type=pa.string()),
            }
        )

    labels = (
        edges_ds.map_batches(init_labels, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Min("cluster_id", alias_name="cluster_id"))
        .materialize()
    )
    prev_sig = _label_signature(labels)

    for _ in range(max_rounds):
        # propagate: each edge forwards each endpoint's label to the other
        prop_a = (
            edges_ds.join(
                labels,
                join_type="inner",
                num_partitions=max(edges_ds.num_blocks(), 1),
                on=("doc_a",),
                right_on=("doc_id",),
            )
            .select_columns(["doc_b", "cluster_id"])
            .rename_columns({"doc_b": "doc_id"})
        )
        prop_b = (
            edges_ds.join(
                labels,
                join_type="inner",
                num_partitions=max(edges_ds.num_blocks(), 1),
                on=("doc_b",),
                right_on=("doc_id",),
            )
            .select_columns(["doc_a", "cluster_id"])
            .rename_columns({"doc_a": "doc_id"})
        )
        merged = labels.union(prop_a).union(prop_b)
        labels = (
            merged.groupby("doc_id")
            .aggregate(Min("cluster_id", alias_name="cluster_id"))
            .materialize()
        )
        sig = _label_signature(labels)
        if sig == prev_sig:
            break
        prev_sig = sig
    return labels
