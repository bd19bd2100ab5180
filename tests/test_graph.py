"""Graph connected-components pipeline tests (pipelines/graph.py) plus
pointer-jumping convergence properties of the distributed union-find.

The SQL-oracle comparison for graph_components lives in test_reshape.py's
registered-oracle parametrization; here we pin (a) driver path ==
distributed path on the same relational graph, and (b) that
pointer-jumping strictly reduces round count vs plain one-hop
propagation on a long chain (and produces identical labels)."""

import numpy as np
import pandas as pd
import ray.data

SF = "/root/testdata/sf0.001"


def test_distributed_path_matches_driver_on_relational_graph():
    from dedupe_rust_ray.pipelines.graph import _edges, graph_components
    from dedupe_rust_ray.state.unionfind import (
        distributed_connected_components,
    )

    via_driver = graph_components(SF)  # small edge set -> driver gate
    labels = distributed_connected_components(
        _edges(SF, 50.0), n_shards=8
    ).to_pandas()
    via_dist = (
        pd.DataFrame(
            {
                "node": labels["doc_id"].astype(np.int64),
                "comp": labels["cluster_id"].astype(np.int64),
            }
        )
        .sort_values("node")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(via_driver, via_dist)


def test_pointer_jumping_beats_plain_propagation_on_chain():
    """On a 24-node chain, label-of-label shortcutting must converge in
    STRICTLY fewer rounds than plain one-hop min-propagation, with
    identical final labels. (The speedup is expectation-level, not a
    clean log bound — labels are hash minima, so a jump target extends
    the known radius only in expectation — hence a comparative assertion
    rather than a fixed round budget.)"""
    import ray.data.dataset as dsmod

    from dedupe_rust_ray.state.unionfind import (
        distributed_connected_components,
    )

    n = 24
    edges = pd.DataFrame(
        {
            "doc_a": [f"{i:012d}" for i in range(n - 1)],
            "doc_b": [f"{i+1:012d}" for i in range(n - 1)],
        }
    )

    # one fixpoint check (Dataset.sum on the `changed` column) per round
    counts = {}
    orig_sum = dsmod.Dataset.sum

    def run(jump: bool) -> pd.DataFrame:
        rounds = {"n": 0}

        def traced(self, *a, **k):
            rounds["n"] += 1
            return orig_sum(self, *a, **k)

        dsmod.Dataset.sum = traced
        try:
            out = distributed_connected_components(
                ray.data.from_pandas(edges),
                max_rounds=n + 5,
                n_shards=8,
                pointer_jumping=jump,
            ).to_pandas()
        finally:
            dsmod.Dataset.sum = orig_sum
        counts[jump] = rounds["n"]
        return out.sort_values("doc_id", ignore_index=True)

    with_jump = run(True)
    plain = run(False)
    pd.testing.assert_frame_equal(
        with_jump[["doc_id", "cluster_id"]], plain[["doc_id", "cluster_id"]]
    )
    assert with_jump["cluster_id"].nunique() == 1
    assert counts[True] < counts[False], counts
