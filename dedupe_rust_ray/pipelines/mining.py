"""Pattern mining and link prediction over the co-purchase relation.

Two classic data-mining passes a corpus-curation engine needs next to the
graph family (pipelines/graph.py shares the co-purchase edge machinery):

- :func:`part_association_rules` — market-basket association rules
  (Agrawal & Srikant, VLDB'94 "Fast algorithms for mining association
  rules", public): for every co-purchased part pair, directed rules
  ``antecedent -> consequent`` with exact support, confidence and lift.
  The pair-support fold is the frequent-2-itemset count; TPC-H baskets
  (orders) are tiny, so the candidate blow-up is bounded by construction
  the same way blocking bounds ER pairs.
- :func:`part_common_neighbors` — common-neighbor / Jaccard node
  similarity (the classic link-prediction score, Liben-Nowell & Kleinberg
  2003, public): part pairs sharing >= ``min_common`` co-purchase
  neighbors, scored |N(a) ∩ N(b)| / |N(a) ∪ N(b)|.

Determinism contract (the house fixed-point rule): confidence, lift and
Jaccard are emitted as ``_SCALE``-scaled int64 floor-divided ratios — all
quantities are positive so numpy ``//``, Python ``//`` and DuckDB ``//``
agree bit-for-bit; no float ever enters the value hash.

Scale notes (100 TB posture):
- the only SF-scaled shuffles carry 8-24-byte integer rows: distinct
  (order, part) pairs, canonical (a, b) pair partials with per-shard
  combined counts, and (node, degree) relations.
- both operators are dual-plan (the graph.py / er.py ladder): below
  ``driver_max_*`` the final rule/score assembly is one in-process numpy
  kernel over the gathered compact relation; above it the SAME arithmetic
  runs as co-partitioned Dataset joins (no broadcast state anywhere).
  tests/test_mining.py pins the two legs equal under a forced tiny gate.
- common-neighbor counting is inherently Θ(Σ deg(c)²) wedges; the wedge
  relation rows are 16 bytes and pre-combined per shard. For skewed
  graphs cap ``min_quantity`` (denser threshold) or pre-bucket hot
  centers — the wedge stage reuses the ER candidate kernel, which
  supports ``max_group`` degradation if a deployment needs it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Sum

from ..functions.grouping import local_candidate_pairs
from ..functions.shingles import splitmix64
from .common import read
from .graph import (
    _degree_ds,
    _drop_empty_blocks,
    _lineitem_rows,
    _renamed,
    edges_dual,
    gather_basket_items,
)

_SCALE = 1_000_000  # 1e6 fixed-point units for confidence / lift / jaccard


def _basket_items(
    sf_dir: str, min_quantity: float, n_shards: int = 64
) -> ray.data.Dataset:
    """Distinct (order ``o``, part ``p``) basket-membership rows with an
    order-hash ``shard`` column (all rows of one basket share a shard)."""

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

    return read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_partkey", "l_quantity"]
    ).map_batches(project, batch_format="pyarrow")


# tagged long-form kinds for the single-exchange support fold
_KIND_PAIR, _KIND_ITEM, _KIND_BASKET = 0, 1, 2


def _support_folds(items: ray.data.Dataset) -> ray.data.Dataset:
    """One shard-local pass emitting ALL THREE association-rule partials
    as tagged rows — (kind=pair, a, b, n), (kind=item, p, -1, n),
    (kind=basket, -1, -1, n) — so one groupby exchange folds pair
    supports, item supports and the basket count together (the long-form
    profile_documents pattern, SF-scaled keys instead of a bounded
    domain)."""

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["o", "p"])  # cross-batch duplicates
        o = d["o"].to_numpy(np.int64)
        p = d["p"].to_numpy(np.int64)
        outs: list[pd.DataFrame] = []
        ia, ib = local_candidate_pairs(o)
        if len(ia):
            a = np.minimum(p[ia], p[ib])
            b = np.maximum(p[ia], p[ib])
            keep = a != b
            if keep.any():
                # per-shard combiner: same pair from multiple baskets in
                # this shard folds to one row with its multiplicity
                e, cnt = np.unique(
                    np.stack([a[keep], b[keep]], axis=1),
                    axis=0,
                    return_counts=True,
                )
                outs.append(
                    pd.DataFrame(
                        {
                            "kind": np.full(len(e), _KIND_PAIR, np.int8),
                            "a": e[:, 0],
                            "b": e[:, 1],
                            "n": cnt.astype(np.int64),
                        }
                    )
                )
        up, ucnt = np.unique(p, return_counts=True)
        outs.append(
            pd.DataFrame(
                {
                    "kind": np.full(len(up), _KIND_ITEM, np.int8),
                    "a": up,
                    "b": np.full(len(up), -1, np.int64),
                    "n": ucnt.astype(np.int64),
                }
            )
        )
        n_baskets = len(np.unique(o))
        outs.append(
            pd.DataFrame(
                {
                    "kind": np.array([_KIND_BASKET], np.int8),
                    "a": np.array([-1], np.int64),
                    "b": np.array([-1], np.int64),
                    "n": np.array([n_baskets], np.int64),
                }
            )
        )
        return pd.concat(outs, ignore_index=True)

    return (
        items.groupby("shard")
        .map_groups(per_shard, batch_format="pandas")
        .groupby(["kind", "a", "b"])
        .aggregate(Sum("n", alias_name="supp"))
    )


def _rule_columns(
    ant: np.ndarray,
    cons: np.ndarray,
    supp: np.ndarray,
    s_ant: np.ndarray,
    s_cons: np.ndarray,
    n_baskets: int,
) -> pd.DataFrame:
    """Directed-rule metric columns — int64 floor-divided fixed point.

    Overflow bound: ``_SCALE * supp * n_baskets`` must stay below 2^63 —
    safe while supp * baskets < 9.2e12 (TPC-H co-purchase supports are
    single digits through ~sf1000); the driver leg uses the same int64
    arithmetic as the distributed leg so the bound is one place."""
    conf = (_SCALE * supp) // s_ant
    lift = (_SCALE * supp * n_baskets) // (s_ant * s_cons)
    df = pd.DataFrame(
        {
            "antecedent": ant,
            "consequent": cons,
            "support": supp,
            "conf_scaled": conf,
            "lift_scaled": lift,
        }
    )
    return df.astype(np.int64)


def part_association_rules(
    sf_dir: str,
    min_quantity: float = 40.0,
    min_support: int = 1,
    driver_max_rows: int = 2_000_000,
    fused_items_max: int = 2_000_000,
) -> pd.DataFrame:
    """Market-basket association rules over parts co-purchased in one
    order (``l_quantity >= min_quantity`` bounds the basket relation):
    one row per directed rule ``antecedent -> consequent`` with
    ``support`` (baskets containing both), ``conf_scaled``
    (support/supp(antecedent)) and ``lift_scaled``
    (support·N / (supp(ant)·supp(cons))), both ``_SCALE``-scaled int64.
    Ordered by lift desc, conf desc, antecedent, consequent.

    Fused sub-gate leg: when lineitem metadata rows fit
    ``fused_items_max``, ALL three support folds run as one numpy pass
    over the gathered distinct basket relation (no exchange at all);
    otherwise (or when the fold relation outgrows ``driver_max_rows``)
    the tagged-long-form exchange + co-partitioned support joins run —
    tests pin the legs equal."""
    rows = _lineitem_rows(sf_dir)
    if rows is not None and rows <= fused_items_max:
        op = gather_basket_items(sf_dir, min_quantity)
        if not len(op):
            return _rule_columns(*([np.empty(0, np.int64)] * 5), 0)
        o, p = op[:, 0], op[:, 1]  # distinct rows, sorted by o
        ia, ib = local_candidate_pairs(o)
        a0 = np.minimum(p[ia], p[ib])
        b0 = np.maximum(p[ia], p[ib])
        keep = a0 != b0
        e, cnt = (
            np.unique(
                np.stack([a0[keep], b0[keep]], axis=1),
                axis=0,
                return_counts=True,
            )
            if keep.any()
            else (np.empty((0, 2), np.int64), np.empty(0, np.int64))
        )
        ip, isupp = np.unique(p, return_counts=True)
        if len(e) + len(ip) <= driver_max_rows:
            n_baskets = len(np.unique(o))
            keep2 = cnt >= min_support
            pa_, pb_ = e[keep2, 0], e[keep2, 1]
            ps = cnt[keep2].astype(np.int64)
            sa = isupp[np.searchsorted(ip, pa_)].astype(np.int64)
            sb = isupp[np.searchsorted(ip, pb_)].astype(np.int64)
            out = pd.concat(
                [
                    _rule_columns(pa_, pb_, ps, sa, sb, n_baskets),
                    _rule_columns(pb_, pa_, ps, sb, sa, n_baskets),
                ],
                ignore_index=True,
            )
            return out.sort_values(
                ["lift_scaled", "conf_scaled", "antecedent", "consequent"],
                ascending=[False, False, True, True],
                ignore_index=True,
            )
    folds = _drop_empty_blocks(_support_folds(_basket_items(sf_dir, min_quantity)))
    n_rows = folds.count()
    if n_rows <= driver_max_rows:
        parts = [t for t in ray.get(folds.to_arrow_refs()) if t.num_rows]
        t = pa.concat_tables(parts)
        kind = t["kind"].to_numpy(zero_copy_only=False)
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = t["supp"].to_numpy(zero_copy_only=False).astype(np.int64)
        pair = kind == _KIND_PAIR
        item = kind == _KIND_ITEM
        n_baskets = int(n[kind == _KIND_BASKET].sum())
        # item-support lookup: sorted-array searchsorted probe (house rule:
        # no Python dict/set in a fold)
        ip = a[item]
        order = np.argsort(ip)
        ip, isupp = ip[order], n[item][order]
        pa_, pb_, ps = a[pair], b[pair], n[pair]
        keep = ps >= min_support
        pa_, pb_, ps = pa_[keep], pb_[keep], ps[keep]
        sa = isupp[np.searchsorted(ip, pa_)]
        sb = isupp[np.searchsorted(ip, pb_)]
        out = pd.concat(
            [
                _rule_columns(pa_, pb_, ps, sa, sb, n_baskets),
                _rule_columns(pb_, pa_, ps, sb, sa, n_baskets),
            ],
            ignore_index=True,
        )
    else:
        # ---- distributed leg: split the tagged fold by kind, join item
        # supports onto both pair endpoints (co-partitioned hash joins —
        # item supports are SF-scaled, never broadcast)
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:  # noqa: BLE001
            cpus = 8
        num_partitions = max(2, min(64, max(n_rows // 250_000, 8), cpus))

        def pick(kind_val: int, cols: dict[str, str], min_supp: int = 0):
            def per_block(b: pa.Table) -> pa.Table:
                k = b["kind"].to_numpy(zero_copy_only=False)
                s = b["supp"].to_numpy(zero_copy_only=False)
                sel = b.filter(pa.array((k == kind_val) & (s >= min_supp)))
                return pa.table(
                    {new: sel[old] for old, new in cols.items()}
                )

            return folds.map_batches(per_block, batch_format="pyarrow")

        # the basket fold is one global row after the groupby; sum() pulls
        # a scalar, not a relation
        n_baskets = int(
            pick(_KIND_BASKET, {"supp": "supp"}).sum("supp")
        )
        pairs = _drop_empty_blocks(
            pick(_KIND_PAIR, {"a": "a", "b": "b", "supp": "supp"}, min_support)
        )
        isupp = _drop_empty_blocks(pick(_KIND_ITEM, {"a": "a", "supp": "supp"}))
        joined = pairs.join(
            _renamed(isupp, {"supp": "sa"}),
            join_type="inner",
            num_partitions=num_partitions,
            on=("a",),
        ).join(
            _renamed(isupp, {"a": "b", "supp": "sb"}),
            join_type="inner",
            num_partitions=num_partitions,
            on=("b",),
        )

        def emit(batch: pa.Table) -> pa.Table:
            a = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
            b = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
            s = batch["supp"].to_numpy(zero_copy_only=False).astype(np.int64)
            sa = batch["sa"].to_numpy(zero_copy_only=False).astype(np.int64)
            sb = batch["sb"].to_numpy(zero_copy_only=False).astype(np.int64)
            both = pd.concat(
                [
                    _rule_columns(a, b, s, sa, sb, n_baskets),
                    _rule_columns(b, a, s, sb, sa, n_baskets),
                ],
                ignore_index=True,
            )
            return pa.Table.from_pandas(both, preserve_index=False)

        out = (
            joined.map_batches(emit, batch_format="pyarrow").to_pandas()
        )
    return out.sort_values(
        ["lift_scaled", "conf_scaled", "antecedent", "consequent"],
        ascending=[False, False, True, True],
        ignore_index=True,
    )


def part_common_neighbors(
    sf_dir: str,
    min_quantity: float = 40.0,
    min_common: int = 2,
    driver_max_edges: int = 2_000_000,
    n_shards: int = 64,
    fused_items_max: int = 2_000_000,
) -> pd.DataFrame:
    """Link-prediction node similarity over the co-purchase graph: part
    pairs (``part_a < part_b``) with >= ``min_common`` common neighbors,
    scored ``jaccard_scaled = _SCALE * |N(a) ∩ N(b)| //
    (deg(a) + deg(b) - |N(a) ∩ N(b)|)``. Ordered by part_a, part_b.

    Plan: every wedge (x - c - y) is enumerated at its center ``c``.
    Below ``driver_max_edges`` the whole fold (wedges, counts, degrees)
    is ONE in-process numpy kernel over the gathered 16-byte edge set —
    the triangle_count exchange-elision shape (each wedge/degree exchange
    costs seconds of fixed barrier scheduling at suite scale vs sub-ms
    compute). Above the gate, center-hash shard co-location + the ER
    candidate kernel pre-combine the wedge relation per shard, one
    (x, y) groupby folds the global common-neighbor counts, and degrees
    attach via co-partitioned joins; tests pin the legs equal."""
    plan = edges_dual(
        sf_dir, min_quantity, driver_max_edges, n_shards,
        fused_items_max=fused_items_max,
    )
    empty = pd.DataFrame(
        {
            "part_a": np.empty(0, np.int64),
            "part_b": np.empty(0, np.int64),
            "n_common": np.empty(0, np.int64),
            "jaccard_scaled": np.empty(0, np.int64),
        }
    )
    if plan[0] == "arrays":
        _, a, b = plan
        if not len(a):
            return empty
        c = np.r_[a, b]  # wedge centers (adjacency, both directions)
        v = np.r_[b, a]
        order = np.argsort(c, kind="stable")
        c, v = c[order], v[order]
        ia, ib = local_candidate_pairs(c)
        out = empty
        if len(ia):
            x = np.minimum(v[ia], v[ib])
            y = np.maximum(v[ia], v[ib])
            e, nc = np.unique(np.stack([x, y], axis=1), axis=0, return_counts=True)
            keep = nc >= min_common
            if keep.any():
                x, y, nc = e[keep, 0], e[keep, 1], nc[keep].astype(np.int64)
                dn, dd = np.unique(np.r_[a, b], return_counts=True)
                dx = dd[np.searchsorted(dn, x)].astype(np.int64)
                dy = dd[np.searchsorted(dn, y)].astype(np.int64)
                out = pd.DataFrame(
                    {
                        "part_a": x,
                        "part_b": y,
                        "n_common": nc,
                        "jaccard_scaled": (_SCALE * nc) // (dx + dy - nc),
                    }
                ).astype(np.int64)
        return out.sort_values(["part_a", "part_b"], ignore_index=True)

    _, edges, m = plan
    if m == 0:
        return empty

    def both_dirs(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        c = np.r_[a, b]
        v = np.r_[b, a]
        shard = (splitmix64(c.astype(np.uint64)) % np.uint64(n_shards)).astype(
            np.int32
        )
        return pa.table({"c": c, "v": v, "shard": shard})

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        c = g["c"].to_numpy(np.int64)
        v = g["v"].to_numpy(np.int64)
        ia, ib = local_candidate_pairs(c)
        if not len(ia):
            return pd.DataFrame(
                {
                    "x": np.empty(0, np.int64),
                    "y": np.empty(0, np.int64),
                    "n": np.empty(0, np.int64),
                }
            )
        x = np.minimum(v[ia], v[ib])
        y = np.maximum(v[ia], v[ib])
        # per-shard combiner before the global (x, y) count fold
        e, cnt = np.unique(np.stack([x, y], axis=1), axis=0, return_counts=True)
        return pd.DataFrame({"x": e[:, 0], "y": e[:, 1], "n": cnt.astype(np.int64)})

    common = _drop_empty_blocks(
        edges.map_batches(both_dirs, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(wedges, batch_format="pandas")
        .groupby(["x", "y"])
        .aggregate(Sum("n", alias_name="n_common"))
    )

    def threshold(batch: pa.Table) -> pa.Table:
        n = batch["n_common"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(n >= min_common))

    strong = _drop_empty_blocks(
        common.map_batches(threshold, batch_format="pyarrow")
    )
    n_strong = strong.count()
    if n_strong == 0:
        return empty
    deg = _drop_empty_blocks(_degree_ds(edges))
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:  # noqa: BLE001
        cpus = 8
    num_partitions = max(2, min(64, max(m // 250_000, 8), cpus))
    joined = strong.join(
        _renamed(deg, {"node": "x", "d": "dx"}),
        join_type="inner",
        num_partitions=num_partitions,
        on=("x",),
    ).join(
        _renamed(deg, {"node": "y", "d": "dy"}),
        join_type="inner",
        num_partitions=num_partitions,
        on=("y",),
    )

    def finish(batch: pa.Table) -> pa.Table:
        x = batch["x"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch["y"].to_numpy(zero_copy_only=False).astype(np.int64)
        nc = batch["n_common"].to_numpy(zero_copy_only=False).astype(np.int64)
        dx = batch["dx"].to_numpy(zero_copy_only=False).astype(np.int64)
        dy = batch["dy"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "part_a": x,
                "part_b": y,
                "n_common": nc,
                "jaccard_scaled": (_SCALE * nc) // (dx + dy - nc),
            }
        )

    out = joined.map_batches(finish, batch_format="pyarrow").to_pandas()
    return out.sort_values(["part_a", "part_b"], ignore_index=True)
