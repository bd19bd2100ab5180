"""Union-find fixtures from FIXTURES.md F6: chain, star, two components,
duplicate/reversed edges, self-loops; distributed CC must equal driver DSU."""

import pandas as pd
import pytest

from dedupe_rust_ray.state.unionfind import (
    UnionFind,
    distributed_connected_components,
    driver_connected_components,
)


def _labels(edges):
    df = pd.DataFrame(edges, columns=["doc_a", "doc_b"])
    out = driver_connected_components(df)
    return dict(zip(out["doc_id"], out["cluster_id"]))


def test_chain_transitivity():
    lab = _labels([("a", "b"), ("b", "c"), ("c", "d")])
    assert set(lab.values()) == {"a"}


def test_star():
    lab = _labels([("m", "a"), ("m", "b"), ("m", "c")])
    assert set(lab.values()) == {"a"}  # min doc_id of the component


def test_two_components():
    lab = _labels([("a", "b"), ("x", "y")])
    assert lab["a"] == lab["b"] == "a"
    assert lab["x"] == lab["y"] == "x"


def test_duplicate_and_reversed_edges():
    lab = _labels([("a", "b"), ("b", "a"), ("a", "b")])
    assert lab == {"a": "a", "b": "a"}


def test_self_loops():
    lab = _labels([("a", "a"), ("a", "b")])
    assert lab == {"a": "a", "b": "a"}


def test_union_by_size_and_path_compression():
    uf = UnionFind()
    for i in range(100):
        uf.union(f"n{i:03d}", f"n{i+1:03d}")
    assert len(set(uf.labels().values())) == 1


def test_distributed_matches_driver():
    import ray.data

    edges = [
        ("a", "b"),
        ("b", "c"),
        ("c", "d"),
        ("x", "y"),
        ("p", "q"),
        ("q", "r"),
        ("r", "p"),  # cycle
    ]
    df = pd.DataFrame(edges, columns=["doc_a", "doc_b"])
    want = driver_connected_components(df)
    got = (
        distributed_connected_components(ray.data.from_pandas(df))
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)[["doc_id", "cluster_id"]]
    )
    pd.testing.assert_frame_equal(
        want[["doc_id", "cluster_id"]], got, check_dtype=False
    )


def test_distributed_cc_raises_on_nonconvergence(ray_session):
    import pandas as pd
    import pytest
    import ray.data

    from dedupe_rust_ray.state.unionfind import distributed_connected_components

    # a 40-node path graph needs ~log2(40) doubling rounds; 1 round cannot
    # reach the fixpoint and must raise instead of returning silently
    df = pd.DataFrame(
        {"doc_a": [f"n{i:03d}" for i in range(39)],
         "doc_b": [f"n{i + 1:03d}" for i in range(39)]}
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        distributed_connected_components(ray.data.from_pandas(df), max_rounds=1)


def test_vectorized_driver_cc_matches_classic_dsu():
    """driver_connected_components (numpy min-label + pointer jump) must
    equal the classic DSU on random graphs of varied density."""
    import numpy as np
    import pandas as pd

    from dedupe_rust_ray.state.unionfind import (
        UnionFind,
        driver_connected_components,
    )

    rng = np.random.default_rng(11)
    for n_nodes, n_edges in [(10, 5), (50, 30), (200, 150), (500, 2000)]:
        a = rng.integers(0, n_nodes, n_edges)
        b = rng.integers(0, n_nodes, n_edges)
        edges = pd.DataFrame(
            {
                "doc_a": [f"d{v:05d}" for v in a],
                "doc_b": [f"d{v:05d}" for v in b],
            }
        )
        got = driver_connected_components(edges)
        uf = UnionFind()
        for x, y in zip(edges["doc_a"], edges["doc_b"]):
            uf.union(x, y)
        lab = uf.labels()
        want = pd.DataFrame(
            {"doc_id": list(lab.keys()), "cluster_id": list(lab.values())}
        ).sort_values("doc_id", ignore_index=True)
        pd.testing.assert_frame_equal(got, want)
