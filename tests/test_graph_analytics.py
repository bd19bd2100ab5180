"""Co-purchase graph analytics (pipelines/graph.triangle_count /
pagerank_parts): registered-oracle comparison at sf0.001, dual-plan
parity with a forced-zero driver gate, and closed-form pins on
hand-built graphs (K4 + isolated edge; star)."""

import importlib.util

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _entry_module():
    spec = importlib.util.spec_from_file_location(
        "ray_entry_for_graph_tests", "/root/repo/__ray_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{SF}/lineitem.parquet'"
    )
    return con.sql(sql).df()


@pytest.mark.parametrize("name", ["copurchase_triangles", "pagerank_parts"])
def test_graph_query_matches_registered_oracle(name):
    mod = _entry_module()
    got = mod.queries()[name](SF).reset_index(drop=True)
    want = _duck(mod.oracle_sql()[name])
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)],
        check_dtype=False,
    )


def test_triangle_dual_plan_parity():
    from dedupe_rust_ray.pipelines.graph import triangle_count

    fast = triangle_count(SF)
    dist = triangle_count(SF, driver_max_edges=0)
    pd.testing.assert_frame_equal(fast, dist)
    assert int(fast["n_triangles"].iloc[0]) > 0  # non-degenerate graph


def test_pagerank_dual_plan_parity():
    from dedupe_rust_ray.pipelines.graph import pagerank_parts

    fast = pagerank_parts(SF).reset_index(drop=True)
    dist = pagerank_parts(SF, driver_max_edges=0).reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, dist)
    assert len(fast) == 20


def _write_lineitem(tmp_path, orders_to_parts) -> str:
    rows_o, rows_p = [], []
    for o, parts in orders_to_parts.items():
        for p in parts:
            rows_o.append(o)
            rows_p.append(p)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(rows_o, pa.int64()),
                "l_partkey": pa.array(rows_p, pa.int64()),
                "l_quantity": pa.array([50.0] * len(rows_o), pa.float64()),
            }
        ),
        f"{tmp_path}/lineitem.parquet",
    )
    return str(tmp_path)


def test_triangle_closed_form_k4_plus_edge(tmp_path):
    """One order of 4 parts = K4 (4 triangles, 6 edges); a disjoint
    2-part order adds one edge and two nodes; a duplicate co-purchase of
    an existing pair must NOT double-count the edge."""
    from dedupe_rust_ray.pipelines.graph import triangle_count

    sf = _write_lineitem(
        tmp_path, {1: [1, 2, 3, 4], 2: [10, 11], 3: [1, 2]}
    )
    got = triangle_count(sf)
    assert got.to_dict("records") == [
        {"n_nodes": 6, "n_edges": 7, "n_triangles": 4}
    ]
    dist = triangle_count(sf, driver_max_edges=0)
    pd.testing.assert_frame_equal(got, dist)


def test_pagerank_star_center_dominates(tmp_path):
    """K1,3 star: the hub must outrank the leaves, leaves tie exactly
    (int64 fixed-point is deterministic), and ties order by node id."""
    from dedupe_rust_ray.pipelines.graph import pagerank_parts

    sf = _write_lineitem(tmp_path, {1: [100, 101], 2: [100, 102], 3: [100, 103]})
    got = pagerank_parts(sf)
    assert got["node"].tolist() == [100, 101, 102, 103]
    r = got["rank_scaled"].to_numpy(np.int64)
    assert r[0] > r[1] and r[1] == r[2] == r[3]
    dist = pagerank_parts(sf, driver_max_edges=0).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), dist)


def test_hop_distance_matches_registered_oracle():
    mod = _entry_module()
    got = mod.queries()["part_hop_distance"](SF).reset_index(drop=True)
    want = _duck(mod.oracle_sql()["part_hop_distance"])
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)],
        check_dtype=False,
    )
    assert set(got["hops"]) <= {0, 1, 2, 3} and (got["hops"] == 0).sum() == 1


def test_hop_distance_dual_plan_parity():
    from dedupe_rust_ray.pipelines.graph import part_hop_distance

    fast = part_hop_distance(SF)
    dist = part_hop_distance(SF, driver_max_edges=0)
    pd.testing.assert_frame_equal(fast, dist)


def test_hop_distance_path_graph(tmp_path):
    """Path 1-2-3-4-5-6 (each edge from one 2-part order): seed is 1;
    node 5 is 4 hops away so it must be ABSENT at max_hops=3, and every
    closer node carries its exact distance."""
    from dedupe_rust_ray.pipelines.graph import part_hop_distance

    sf = _write_lineitem(
        tmp_path, {1: [1, 2], 2: [2, 3], 3: [3, 4], 4: [4, 5], 5: [5, 6]}
    )
    got = part_hop_distance(sf)
    assert got.to_dict("records") == [
        {"node": 1, "hops": 0},
        {"node": 2, "hops": 1},
        {"node": 3, "hops": 2},
        {"node": 4, "hops": 3},
    ]
    dist = part_hop_distance(sf, driver_max_edges=0)
    pd.testing.assert_frame_equal(got, dist)


@pytest.mark.parametrize(
    "fn_kwargs",
    [
        ("triangle_count", {}),
        ("pagerank_parts", {}),
        ("part_hop_distance", {}),
    ],
)
def test_fully_distributed_derivation_parity(fn_kwargs):
    """fused_items_max=0 forces the REAL exchange-based edge derivation
    (shard groupby + pair dedup) — pinned equal to the fused default."""
    import dedupe_rust_ray.pipelines.graph as G

    name, kw = fn_kwargs
    fn = getattr(G, name)
    fast = fn(SF, **kw).reset_index(drop=True)
    full = fn(SF, fused_items_max=0, **kw).reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, full)
