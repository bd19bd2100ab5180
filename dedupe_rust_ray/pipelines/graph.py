"""Graph operators over the driver test tables.

``graph_components`` runs the SAME distributed union-find that powers the
flagship ER clustering (state/unionfind.distributed_connected_components,
the analog of the reference's group-confirmation step,
/root/reference/src/main.rs:630) over a relational bipartite graph — and,
unlike the ER corpus, this graph gives the algorithm a true SQL oracle:
DuckDB computes the identical components with a recursive-CTE label
propagation, so the driver hash-checks the whole gather/scatter-min
machinery end to end.

Graph: nodes are high-quantity order/supplier pairs from lineitem
(``l_quantity = 50`` keeps the graph sparse so the SQL side's quadratic
reachability enumeration stays bounded); edges connect an order to each
supplier that shipped it. Node encoding: ``order -> 2*l_orderkey``,
``supplier -> 2*l_suppkey + 1`` (disjoint by parity).

Scale plan: edges are per-batch deduped 8-byte pairs; the union-find
itself is the documented O(log diameter) two-shuffles-per-round numeric
propagation — nothing here materializes on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..state.unionfind import distributed_connected_components
from .common import read

# zero-padded so the union-find's LEXICOGRAPHIC min doc_id equals the
# NUMERIC min node id — the SQL oracle's MIN(label) then matches exactly
_PAD = 12


def _edges(sf_dir: str, quantity: float) -> ray.data.Dataset:
    def per_batch(batch: pa.Table) -> pa.Table:
        q = batch["l_quantity"].to_numpy(zero_copy_only=False)
        keep = q == quantity
        a = batch["l_orderkey"].to_numpy(zero_copy_only=False)[keep] * 2
        b = batch["l_suppkey"].to_numpy(zero_copy_only=False)[keep] * 2 + 1
        # per-batch dedup (combiner): duplicate edges are harmless to the
        # propagation but cost shuffle bytes
        pairs = np.unique(np.stack([a, b], axis=1), axis=0) if len(a) else \
            np.empty((0, 2), dtype=np.int64)
        if len(pairs) and int(pairs.max()) >= 10 ** _PAD:
            raise ValueError(
                f"node id {pairs.max()} overflows the {_PAD}-digit zero-pad; "
                "lexicographic min-label canonicalization would break"
            )
        return pa.table(
            {
                "doc_a": pa.array([f"{v:0{_PAD}d}" for v in pairs[:, 0]],
                                  type=pa.string()),
                "doc_b": pa.array([f"{v:0{_PAD}d}" for v in pairs[:, 1]],
                                  type=pa.string()),
            }
        )

    return read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_quantity"]
    ).map_batches(per_batch, batch_format="pyarrow")


def graph_components(
    sf_dir: str,
    quantity: float = 50.0,
    driver_max_edges: int = 2_000_000,
) -> pd.DataFrame:
    """Connected components of the order—supplier graph: one row per node
    appearing in at least one edge, labelled with its component's minimum
    node id.

    Same dual plan as the ER flagship (pipelines/er.py): an edge set that
    fits the driver runs the in-memory union-find (the distributed rounds
    pay ~seconds of all-to-all latency per round, only worth amortizing on
    big graphs); above the threshold it switches to the pointer-jumping
    distributed propagation. tests/test_graph.py pins both paths to the
    same output."""
    from ..state.unionfind import driver_connected_components

    edges = _edges(sf_dir, quantity).materialize()
    if edges.count() <= driver_max_edges:
        df = driver_connected_components(edges.to_pandas())
    else:
        n_edges = edges.count()
        df = distributed_connected_components(
            edges, n_shards=int(min(64, max(8, n_edges // 50_000)))
        ).to_pandas()
    out = pd.DataFrame(
        {
            "node": df["doc_id"].astype(np.int64),
            "comp": df["cluster_id"].astype(np.int64),
        }
    )
    return out.sort_values("node").reset_index(drop=True)
