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


# ---------------------------------------------------------------------------
# Co-purchase graph analytics: exact triangle census + fixed-point PageRank.
#
# The reference stops at connected components (its G4 group-confirm step);
# a training-data engine also needs the next two classic graph passes —
# motif counting (triangles: community density, spam/bot-ring detection in
# web corpora) and link-analysis ranking (PageRank: the canonical
# quality-weighting signal for web-crawl curation, Page et al. 1999,
# "The PageRank citation ranking", public Stanford tech report).
#
# Graph: parts co-purchased in the same order (l_quantity >= min_quantity
# keeps the SQL oracle's 3-way self-join bounded at sweep scale). Both
# operators follow the house dual plan (pipelines/er.py, graph_components):
# an edge set small enough for the driver runs a vectorized numpy kernel
# in-process; above the gate the SAME arithmetic runs as a Ray Dataset
# join/groupby cascade — tests/test_graph.py pins the two paths equal with
# a forced-tiny gate.
#
# Scale notes (100 TB posture):
#  * edges are 16-byte int64 pairs; the payload tables never shuffle.
#  * triangle counting uses DEGREE-ORDERED orientation (Chiba-Nishizeki /
#    Suri-Vassilvitskii MR formulation): every edge points from its
#    (degree, id)-smaller endpoint to the larger, so per-node out-degree
#    is O(sqrt(2m)) and the wedge relation is bounded by m^{3/2} rows of
#    16 bytes — the provably-minimal exchange for exact counting. The
#    closing check is a co-partitioned hash join (Ray Dataset.join), not
#    a broadcast: no driver- or worker-resident edge set is required.
#  * PageRank state is node-linear and stays a Dataset end to end on the
#    distributed leg: ranks are re-joined to the (materialized-once)
#    degree-annotated edge relation every iteration — 2 shuffles per
#    iteration, both over 24-byte rows.
#  * all rank arithmetic is int64 fixed-point (SCALE = 1e9) with
#    floor division — associative, order-free, and bit-identical between
#    numpy, Ray aggregates and the DuckDB oracle (the float-money lesson
#    from round 3 applied pre-emptively). Bound: 85 * total mass
#    (= n_nodes * SCALE) must stay under 2^63 -> safe below ~1e8 nodes;
#    raise SCALE down / shard the rank fold before that.
# ---------------------------------------------------------------------------

_PR_SCALE = 1_000_000_000  # 1e9 fixed-point units per unit rank
_PR_DAMP_NUM, _PR_DAMP_DEN = 85, 100
_PR_BASE = (_PR_SCALE * (_PR_DAMP_DEN - _PR_DAMP_NUM)) // _PR_DAMP_DEN


def _copart_edges(
    sf_dir: str, min_quantity: float, n_shards: int = 64
) -> ray.data.Dataset:
    """Distinct undirected co-purchase edges ``(a < b)`` over part keys:
    two parts are linked when some order contains lineitems of both with
    ``l_quantity >= min_quantity``.

    Plan: project + per-batch distinct (order, part) -> shard by order
    hash (co-locates each order's rows) -> per-shard vectorized pair
    enumeration (functions/grouping.local_candidate_pairs — the ER
    candidate kernel) -> global distinct via a (a, b) groupby. Orders are
    tiny groups (<= 7 lineitems) so the pair blow-up is bounded by
    construction."""
    from ..functions.grouping import local_candidate_pairs
    from ..functions.shingles import splitmix64

    def project(batch: pa.Table) -> pa.Table:
        q = batch["l_quantity"].to_numpy(zero_copy_only=False)
        keep = q >= min_quantity
        o = batch["l_orderkey"].to_numpy(zero_copy_only=False)[keep]
        p = batch["l_partkey"].to_numpy(zero_copy_only=False)[keep]
        if len(o):
            op = np.unique(np.stack([o, p], axis=1), axis=0)
        else:
            op = np.empty((0, 2), dtype=np.int64)
        shard = (
            splitmix64(op[:, 0].astype(np.uint64)) % np.uint64(n_shards)
        ).astype(np.int32)
        return pa.table({"o": op[:, 0], "p": op[:, 1], "shard": shard})

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["o", "p"])  # cross-batch duplicates
        o = d["o"].to_numpy(np.int64)
        p = d["p"].to_numpy(np.int64)
        ia, ib = local_candidate_pairs(o)
        a = np.minimum(p[ia], p[ib])
        b = np.maximum(p[ia], p[ib])
        keep = a != b
        if not keep.any():
            return pd.DataFrame({"a": np.empty(0, np.int64),
                                 "b": np.empty(0, np.int64)})
        e = np.unique(np.stack([a[keep], b[keep]], axis=1), axis=0)
        return pd.DataFrame({"a": e[:, 0], "b": e[:, 1]})

    from ray.data.aggregate import Count

    ds = (
        read(sf_dir, "lineitem",
             columns=["l_orderkey", "l_partkey", "l_quantity"])
        .map_batches(project, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(per_shard, batch_format="pandas")
    )
    # same part pair can arise from orders hashed to different shards:
    # one co-partitioned distinct over 16-byte keys
    dedup = ds.groupby(["a", "b"]).aggregate(Count())
    return dedup.select_columns(["a", "b"])


def _lineitem_rows(sf_dir: str) -> int | None:
    """lineitem row count from parquet metadata (no scan) — the dispatch
    hint for the fused edge-derivation gate (distinct (order, part) rows
    are bounded by lineitem rows). None when the layout isn't the
    single-file testdata shape."""
    import os

    import pyarrow.parquet as pq

    try:
        return pq.read_metadata(
            os.path.join(sf_dir, "lineitem.parquet")
        ).num_rows
    except Exception:  # noqa: BLE001 - fall back to the dataset path
        return None


def gather_basket_items(sf_dir: str, min_quantity: float) -> np.ndarray:
    """Gathered DISTINCT (order, part) relation as an (n, 2) int64 array —
    the fused sub-gate input for the co-purchase family (two 8-byte
    columns, bounded by the fused gate's lineitem row count). ONE
    projection map stage, no exchange."""

    def project(batch: pa.Table) -> pa.Table:
        q = batch["l_quantity"].to_numpy(zero_copy_only=False)
        keep = q >= min_quantity
        o = batch["l_orderkey"].to_numpy(zero_copy_only=False)[keep]
        p = batch["l_partkey"].to_numpy(zero_copy_only=False)[keep]
        return pa.table({"o": o.astype(np.int64), "p": p.astype(np.int64)})

    parts = [
        t
        for t in ray.get(
            read(
                sf_dir,
                "lineitem",
                columns=["l_orderkey", "l_partkey", "l_quantity"],
            )
            .map_batches(project, batch_format="pyarrow")
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    if not parts:
        return np.empty((0, 2), dtype=np.int64)
    t = pa.concat_tables(parts)
    op = np.stack(
        [
            t["o"].to_numpy(zero_copy_only=False).astype(np.int64),
            t["p"].to_numpy(zero_copy_only=False).astype(np.int64),
        ],
        axis=1,
    )
    return np.unique(op, axis=0)


def _fused_edge_arrays(
    sf_dir: str, min_quantity: float
) -> tuple[np.ndarray, np.ndarray]:
    """Fused sub-gate leg of `_copart_edges`: distinct canonical (a < b)
    edge arrays derived in ONE numpy pass over the gathered basket
    relation — identical output to the dataset path, minus its two
    exchange barriers (the house exchange-elision shape; ds.stats() shows
    the shard/dedup groupbys cost seconds of fixed scheduling at suite
    scale vs sub-ms of compute)."""
    from ..functions.grouping import local_candidate_pairs

    op = gather_basket_items(sf_dir, min_quantity)
    if not len(op):
        return np.empty(0, np.int64), np.empty(0, np.int64)
    o, p = op[:, 0], op[:, 1]  # np.unique output: already sorted by o
    ia, ib = local_candidate_pairs(o)
    if not len(ia):
        return np.empty(0, np.int64), np.empty(0, np.int64)
    a = np.minimum(p[ia], p[ib])
    b = np.maximum(p[ia], p[ib])
    keep = a != b
    if not keep.any():
        return np.empty(0, np.int64), np.empty(0, np.int64)
    e = np.unique(np.stack([a[keep], b[keep]], axis=1), axis=0)
    return e[:, 0], e[:, 1]


def edges_dual(
    sf_dir: str,
    min_quantity: float,
    driver_max_edges: int,
    n_shards: int = 64,
    fused_items_max: int = 2_000_000,
):
    """Dual-plan edge derivation for the co-purchase family.

    Returns ``("arrays", a, b)`` when the fused gate (lineitem metadata
    row count <= ``fused_items_max``) AND the driver gate both hold —
    the operator should run its in-process numpy leg; otherwise
    ``("dataset", edges, m)`` for the distributed leg (edges derived
    fused-then-wrapped when only the driver gate failed, fully
    distributed when the corpus is past the fused gate). Both derivations
    produce the identical distinct canonical edge set — pinned by the
    forced-gate tests."""
    rows = _lineitem_rows(sf_dir)
    if rows is not None and rows <= fused_items_max:
        a, b = _fused_edge_arrays(sf_dir, min_quantity)
        if len(a) <= driver_max_edges:
            return ("arrays", a, b)
        eds = ray.data.from_arrow(pa.table({"a": a, "b": b}))
        return ("dataset", eds, len(a))
    edges = _drop_empty_blocks(_copart_edges(sf_dir, min_quantity, n_shards))
    return ("dataset", edges, edges.count())


def _drop_empty_blocks(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Materialize and drop ZERO-COLUMN empty blocks — Ray's sort-based
    aggregator emits schema-less empties ("new schema: ." warnings) that
    acero's hash join rejects with "No match for FieldRef" when they land
    in a partition (the keys_with_sentinel hazard, pipelines/common.py,
    for full-relation join sides). Emptiness is checked with a per-block
    scalar RPC (`t.num_rows` remotely), so no block data ever reaches the
    driver; the survivors are re-wrapped by reference."""
    import ray as _ray

    @_ray.remote(num_cpus=0)
    def _rows(t) -> int:
        return t.num_rows

    refs = ds.materialize().to_arrow_refs()
    counts = _ray.get([_rows.remote(r) for r in refs])
    keep = [r for r, c in zip(refs, counts) if c]
    if not keep:
        keep = refs[:1]  # fully-empty relation: keep one block for schema
    return ray.data.from_arrow_refs(keep)


def _renamed(ds: ray.data.Dataset, mapping: dict[str, str]) -> ray.data.Dataset:
    """Column rename as an Arrow map_batches — ``Dataset.rename_columns``
    (Project operator) assumes Arrow blocks and raises on the pandas
    blocks Ray's sort-based aggregator emits under small clusters."""

    def per_block(b: pa.Table) -> pa.Table:
        return b.rename_columns([mapping.get(c, c) for c in b.column_names])

    return ds.map_batches(per_block, batch_format="pyarrow")


def _gather_edge_arrays(edges: ray.data.Dataset) -> tuple[np.ndarray, np.ndarray]:
    """Driver-side (a, b) int64 arrays of a ladder-gated SMALL edge set."""
    import ray as _ray

    parts = [t for t in _ray.get(edges.to_arrow_refs()) if t.num_rows]
    if not parts:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    t = pa.concat_tables(parts)
    return (
        t["a"].to_numpy(zero_copy_only=False).astype(np.int64),
        t["b"].to_numpy(zero_copy_only=False).astype(np.int64),
    )


def _degree_ds(edges: ray.data.Dataset) -> ray.data.Dataset:
    """(node, d) degree relation of the undirected distinct edge set —
    per-batch partial bincount (combiner) before the node groupby."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        nodes, cnt = np.unique(np.r_[a, b], return_counts=True)
        return pa.table({"node": nodes, "dpart": cnt.astype(np.int64)})

    return (
        edges.map_batches(partial, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("dpart", alias_name="d"))
    )


def triangle_count(
    sf_dir: str,
    min_quantity: float = 40.0,
    driver_max_edges: int = 2_000_000,
    n_shards: int = 64,
    fused_items_max: int = 2_000_000,
) -> pd.DataFrame:
    """Exact triangle census of the co-purchase graph: one row
    ``(n_nodes, n_edges, n_triangles)``.

    Degree-ordered orientation makes every triangle a single wedge at its
    (degree, id)-minimal apex plus one closing oriented edge, so the count
    is ``|wedges JOIN oriented_edges|`` — see the module-level scale notes.
    Dual plan: numpy in-process under ``driver_max_edges`` (edges derived
    fused via `edges_dual` when the corpus metadata gate holds), Ray
    join/groupby cascade above (tests pin the legs equal)."""
    plan = edges_dual(
        sf_dir, min_quantity, driver_max_edges, n_shards,
        fused_items_max=fused_items_max,
    )
    if plan[0] == "arrays":
        _, a, b = plan
        m = len(a)
        nodes, inv = np.unique(np.r_[a, b], return_inverse=True)
        n = len(nodes)
        if m == 0:
            return pd.DataFrame(
                {"n_nodes": [0], "n_edges": [0], "n_triangles": [0]}
            ).astype(np.int64)
        ai, bi = inv[:m], inv[m:]
        deg = np.bincount(ai, minlength=n) + np.bincount(bi, minlength=n)
        # orientation rank: position in (degree, id) lexicographic order
        rank = np.empty(n, np.int64)
        rank[np.lexsort((np.arange(n), deg))] = np.arange(n)
        swap = rank[bi] < rank[ai]
        src = np.where(swap, bi, ai)
        dst = np.where(swap, ai, bi)
        # wedges at each apex: pairs of out-neighbors, canonical by rank
        from ..functions.grouping import local_candidate_pairs

        ia, ib = local_candidate_pairs(src)
        va, vb = dst[ia], dst[ib]
        sw = rank[vb] < rank[va]
        x = np.where(sw, vb, va)
        y = np.where(sw, va, vb)
        # closing-edge membership: compacted ids < n so key = src*n + dst
        # is collision-free while n^2 < 2^63
        ek = np.sort(src * n + dst)
        wk = x * n + y
        pos = np.searchsorted(ek, wk)
        pos[pos >= len(ek)] = len(ek) - 1
        tri = int(np.count_nonzero(ek[pos] == wk))
        return pd.DataFrame(
            {"n_nodes": [n], "n_edges": [m], "n_triangles": [tri]}
        ).astype(np.int64)

    _, edges, m = plan
    # ---- distributed leg: degree join -> orient -> wedge shuffle ->
    # co-partitioned closing join (no broadcast state anywhere)
    from ..functions.grouping import local_candidate_pairs
    from ..functions.shingles import splitmix64

    # join/shuffle aggregator actors each hold a CPU slot: cap partitions
    # at the cluster's CPU count or the join stalls waiting for actors
    # (same guard as stages/pairs.broadcast fallback)
    try:
        import ray as _ray_mod

        cpus = int(_ray_mod.cluster_resources().get("CPU", 8))
    except Exception:  # noqa: BLE001
        cpus = 8
    num_partitions = max(2, min(64, max(m // 250_000, 8), cpus))
    deg = _drop_empty_blocks(_degree_ds(edges))
    n_nodes = deg.count()
    e2 = edges.join(
        _renamed(deg, {"node": "a", "d": "da"}),
        join_type="inner", num_partitions=num_partitions, on=("a",),
    ).join(
        _renamed(deg, {"node": "b", "d": "db"}),
        join_type="inner", num_partitions=num_partitions, on=("b",),
    )

    def orient(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        da = batch["da"].to_numpy(zero_copy_only=False)
        db = batch["db"].to_numpy(zero_copy_only=False)
        swap = (db < da) | ((db == da) & (b < a))
        src = np.where(swap, b, a)
        dst = np.where(swap, a, b)
        dsrc = np.where(swap, db, da).astype(np.int64)
        ddst = np.where(swap, da, db).astype(np.int64)
        shard = (
            splitmix64(src.astype(np.uint64)) % np.uint64(n_shards)
        ).astype(np.int32)
        return pa.table(
            {"src": src, "dst": dst, "dsrc": dsrc, "ddst": ddst,
             "shard": shard}
        )

    oriented = _drop_empty_blocks(e2.map_batches(orient, batch_format="pyarrow"))

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        s = g["src"].to_numpy(np.int64)
        d = g["dst"].to_numpy(np.int64)
        dd = g["ddst"].to_numpy(np.int64)
        ia, ib = local_candidate_pairs(s)
        if not len(ia):
            return pd.DataFrame({"x": np.empty(0, np.int64),
                                 "y": np.empty(0, np.int64)})
        sw = (dd[ib] < dd[ia]) | ((dd[ib] == dd[ia]) & (d[ib] < d[ia]))
        return pd.DataFrame(
            {"x": np.where(sw, d[ib], d[ia]), "y": np.where(sw, d[ia], d[ib])}
        )

    w = _drop_empty_blocks(
        oriented.groupby("shard").map_groups(wedges, batch_format="pandas")
    )
    closing = _renamed(
        oriented.select_columns(["src", "dst"]), {"src": "x", "dst": "y"}
    )
    tri = w.join(
        closing, join_type="inner", num_partitions=num_partitions,
        on=("x", "y"),
    ).count()
    return pd.DataFrame(
        {"n_nodes": [n_nodes], "n_edges": [m], "n_triangles": [int(tri)]}
    ).astype(np.int64)


def pagerank_parts(
    sf_dir: str,
    min_quantity: float = 40.0,
    iterations: int = 5,
    k: int = 20,
    driver_max_edges: int = 2_000_000,
    fused_items_max: int = 2_000_000,
) -> pd.DataFrame:
    """Top-``k`` parts of the co-purchase graph by fixed-point PageRank
    (damping 0.85, ``iterations`` synchronous rounds, uniform int64 init
    of ``_PR_SCALE`` per node): columns ``(node, rank_scaled)``, ordered
    by rank desc then node.

    All arithmetic is int64 floor-division fixed-point (module notes), so
    the driver-numpy leg, the distributed Dataset leg and the DuckDB
    oracle's unrolled-CTE mirror are bit-identical. The distributed leg
    keeps rank state as a Dataset: per iteration one join of ranks onto
    the degree-annotated edge relation (materialized once) and one
    dst-groupby sum with a per-batch partial-sum combiner; the final
    top-k is per-block local top-k + a contract-bounded driver merge (the
    knn_topk pattern), never a global sort."""
    from ray.data.aggregate import Sum

    plan = edges_dual(
        sf_dir, min_quantity, driver_max_edges,
        fused_items_max=fused_items_max,
    )
    if plan[0] == "arrays":
        _, a, b = plan
        m = len(a)
        if m == 0:
            return pd.DataFrame(
                {"node": np.empty(0, np.int64),
                 "rank_scaled": np.empty(0, np.int64)}
            )
        nodes, inv = np.unique(np.r_[a, b], return_inverse=True)
        n = len(nodes)
        ai, bi = inv[:m], inv[m:]
        deg = np.bincount(ai, minlength=n) + np.bincount(bi, minlength=n)
        src = np.r_[ai, bi]
        dst = np.r_[bi, ai]
        r = np.full(n, _PR_SCALE, np.int64)
        for _ in range(iterations):
            contrib = r[src] // deg[src]
            s = np.zeros(n, np.int64)
            np.add.at(s, dst, contrib)  # exact int64 scatter-add
            r = _PR_BASE + (_PR_DAMP_NUM * s) // _PR_DAMP_DEN
        order = np.lexsort((nodes, -r))[:k]
        return pd.DataFrame(
            {"node": nodes[order], "rank_scaled": r[order]}
        )

    _, edges, m = plan
    if m == 0:
        return pd.DataFrame(
            {"node": np.empty(0, np.int64),
             "rank_scaled": np.empty(0, np.int64)}
        )
    # ---- distributed leg: rank state stays a Dataset
    # join/shuffle aggregator actors each hold a CPU slot: cap partitions
    # at the cluster's CPU count or the join stalls waiting for actors
    # (same guard as stages/pairs.broadcast fallback)
    try:
        import ray as _ray_mod

        cpus = int(_ray_mod.cluster_resources().get("CPU", 8))
    except Exception:  # noqa: BLE001
        cpus = 8
    num_partitions = max(2, min(64, max(m // 250_000, 8), cpus))
    deg = _drop_empty_blocks(_degree_ds(edges))

    def both_dirs(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        return pa.table({"src": np.r_[a, b], "dst": np.r_[b, a]})

    directed = (
        edges.map_batches(both_dirs, batch_format="pyarrow")
        .join(
            _renamed(deg, {"node": "src"}),
            join_type="inner", num_partitions=num_partitions, on=("src",),
        )
        .materialize()  # reused every iteration
    )

    def init_ranks(batch: pa.Table) -> pa.Table:
        node = batch["node"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"node": node,
             "r": np.full(len(node), _PR_SCALE, np.int64)}
        )

    ranks = deg.map_batches(init_ranks, batch_format="pyarrow")

    def contribs(batch: pa.Table) -> pa.Table:
        r = batch["r"].to_numpy(zero_copy_only=False)
        d = batch["d"].to_numpy(zero_copy_only=False)
        dstv = batch["dst"].to_numpy(zero_copy_only=False)
        c = r // d
        # per-batch partial sum (combiner before the dst groupby)
        u, invi = np.unique(dstv, return_inverse=True)
        s = np.zeros(len(u), np.int64)
        np.add.at(s, invi, c)
        return pa.table({"dst": u, "cpart": s})

    def finish(batch: pa.Table) -> pa.Table:
        s = batch["s"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"node": batch["dst"].to_numpy(zero_copy_only=False),
             "r": _PR_BASE + (_PR_DAMP_NUM * s) // _PR_DAMP_DEN}
        )

    for _ in range(iterations):
        # every iteration's rank state re-enters a join: compact away the
        # aggregator's schema-less empty blocks before it does
        ranks = _drop_empty_blocks(
            directed.join(
                _renamed(ranks, {"node": "src"}),
                join_type="inner", num_partitions=num_partitions,
                on=("src",),
            )
            .map_batches(contribs, batch_format="pyarrow")
            .groupby("dst")
            .aggregate(Sum("cpart", alias_name="s"))
            .map_batches(finish, batch_format="pyarrow")
        )

    def local_topk(batch: pa.Table) -> pa.Table:
        node = batch["node"].to_numpy(zero_copy_only=False)
        r = batch["r"].to_numpy(zero_copy_only=False)
        o = np.lexsort((node, -r))[:k]
        return pa.table({"node": node[o], "rank_scaled": r[o]})

    import ray as _ray

    parts = [
        t for t in _ray.get(
            ranks.map_batches(local_topk, batch_format="pyarrow")
            .to_arrow_refs()
        ) if t.num_rows
    ]
    t = pa.concat_tables(parts)
    node = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
    r = t["rank_scaled"].to_numpy(zero_copy_only=False).astype(np.int64)
    o = np.lexsort((node, -r))[:k]
    return pd.DataFrame({"node": node[o], "rank_scaled": r[o]})


def part_hop_distance(
    sf_dir: str,
    min_quantity: float = 40.0,
    max_hops: int = 3,
    driver_max_edges: int = 2_000_000,
    fused_items_max: int = 2_000_000,
) -> pd.DataFrame:
    """Bounded-depth BFS over the co-purchase graph: minimum hop distance
    (0..``max_hops``) from the seed node (the smallest part key in the
    edge set) — the frontier-propagation shape next to connected
    components' full closure. Columns ``(node, hops)``, ordered by node;
    unreachable-within-``max_hops`` nodes are absent.

    Both legs and the SQL oracle compute the SAME unrolled expansion —
    frontier_r = neighbors(frontier_{r-1}), min hops over the union — so
    non-minimal rediscoveries fold away identically everywhere.

    Scale: the distributed leg is ``max_hops`` co-partitioned joins of the
    16-byte directed edge relation against the (node, hops) frontier plus
    one min-groupby — the textbook iterative frontier expansion (each
    round's exchange carries only frontier-adjacent rows). The driver leg
    under the gate is a sorted-array numpy BFS."""
    from ray.data.aggregate import Min

    plan = edges_dual(
        sf_dir, min_quantity, driver_max_edges,
        fused_items_max=fused_items_max,
    )
    empty = pd.DataFrame(
        {"node": np.empty(0, np.int64), "hops": np.empty(0, np.int64)}
    )
    if plan[0] == "arrays":
        _, a, b = plan
        if not len(a):
            return empty
        c = np.r_[a, b]
        v = np.r_[b, a]
        order = np.argsort(c, kind="stable")
        c, v = c[order], v[order]
        frontier = np.array([c.min()], np.int64)
        out_nodes = [frontier]
        out_hops = [np.zeros(1, np.int64)]
        seen = frontier
        for r in range(1, max_hops + 1):
            lo = np.searchsorted(c, frontier, side="left")
            hi = np.searchsorted(c, frontier, side="right")
            cnt = hi - lo
            total = int(cnt.sum())
            if total == 0:
                break
            # vectorized concat of [lo_i, hi_i) ranges (no per-node loop)
            idx = (
                np.arange(total, dtype=np.int64)
                - np.repeat(np.cumsum(cnt) - cnt, cnt)
                + np.repeat(lo, cnt)
            )
            nxt = np.unique(v[idx])
            nxt = nxt[np.isin(nxt, seen, invert=True)]
            if not len(nxt):
                break
            out_nodes.append(nxt)
            out_hops.append(np.full(len(nxt), r, np.int64))
            seen = np.union1d(seen, nxt)
            frontier = nxt
        return pd.DataFrame(
            {"node": np.concatenate(out_nodes),
             "hops": np.concatenate(out_hops)}
        ).sort_values("node", ignore_index=True)

    _, edges, m = plan
    if m == 0:
        return empty
    # ---- distributed leg: unrolled frontier joins + one min fold
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:  # noqa: BLE001
        cpus = 8
    num_partitions = max(2, min(64, max(m // 250_000, 8), cpus))

    def both_dirs(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        return pa.table({"src": np.r_[a, b], "dst": np.r_[b, a]})

    directed = _drop_empty_blocks(
        edges.map_batches(both_dirs, batch_format="pyarrow")
    ).materialize()
    seed = int(edges.min("a"))
    frontier = ray.data.from_arrow(
        pa.table({"node": pa.array([seed], pa.int64())})
    )
    layers = [
        frontier.map_batches(
            lambda t: t.append_column("hops", pa.array([0] * t.num_rows,
                                                       pa.int64())),
            batch_format="pyarrow",
        )
    ]
    for r in range(1, max_hops + 1):
        expanded = _drop_empty_blocks(
            directed.join(
                _renamed(frontier, {"node": "src"}),
                join_type="inner",
                num_partitions=num_partitions,
                on=("src",),
            ).map_batches(
                lambda t, _r=r: pa.table(
                    {
                        "node": t["dst"],
                        "hops": pa.array([_r] * t.num_rows, pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            )
        )
        # per-round frontier dedup keeps the join input bounded; the
        # final min-fold removes non-minimal rediscoveries exactly like
        # the SQL union
        frontier = _drop_empty_blocks(
            expanded.groupby("node").aggregate(Min("hops", alias_name="h"))
        ).select_columns(["node"])
        layers.append(expanded)
    union = layers[0]
    for extra in layers[1:]:
        union = union.union(extra)
    out = (
        _drop_empty_blocks(union)
        .groupby("node")
        .aggregate(Min("hops", alias_name="hops"))
        .to_pandas()
    )
    return out.astype({"node": "int64", "hops": "int64"}).sort_values(
        "node", ignore_index=True
    )
