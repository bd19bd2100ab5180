"""Relational join-shape pack: six TPC-H-shaped queries (Q13, Q15, Q17,
Q18, Q22, Q9 adapted to the driver tables) covering join shapes the rest
of the suite doesn't — outer-join count distributions, argmax views,
correlated per-key aggregates, HAVING over a join, scalar subquery +
anti-join, and a five-table star join (SURVEY.md §2.9 extension surface;
the reference user mixes these with the dedup family).

Physical-plan rules shared by the pack (the patterns that survive 100 TB):

- fact tables (orders, lineitem) are only ever read column-pruned and
  reduced by per-batch PARTIAL aggregation before any shuffle — the
  groupby that follows moves one row per (batch, key), never raw facts;
- dimension sides ship as ONE ``ray.put`` of sorted int64 numpy arrays
  probed via ``np.searchsorted`` (the q5 ladder, analytics.py:435), with
  the same ``broadcast_max_rows`` ceiling and a hash ``Dataset.join``
  fallback for SF-scaled sides;
- selective key sets (brand part keys, large-order winners) are reduced
  FIRST, so attribute columns are only attached to the handful of
  surviving rows (the q10 discipline, joins.py:292).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Sum

from .common import join_partitions, read


def _round2(x: np.ndarray | float) -> np.ndarray | float:
    """Half-up 2-decimal rounding, bit-matching the oracles' FLOOR form."""
    return np.floor(np.asarray(x) * 100 + 0.5) / 100


def _sorted_int_lookup(keys: np.ndarray, vals: np.ndarray, probe: np.ndarray):
    """Vectorized key->value probe against a sorted int64 key array.

    Returns (values, found_mask); callers decide miss semantics."""
    idx = np.searchsorted(keys, probe)
    idx_c = np.clip(idx, 0, len(keys) - 1)
    found = (idx < len(keys)) & (keys[idx_c] == probe)
    return vals[idx_c], found


def q13_order_count_distribution(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q13-shaped: the distribution of per-customer order counts,
    INCLUDING customers with zero orders (left-outer-join semantics).

    Plan: no join at all — orders reduce to per-customer counts via
    partial-count + groupby-sum (one row per custkey on the shuffle),
    the count histogram is a second tiny groupby, and the zero bucket is
    ``total customers - customers seen in orders`` (two scalar counts).
    The left join the SQL writes is algebraically a set difference on
    the key column, so the fact table never touches customer."""

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("o_custkey").aggregate([("o_custkey", "count")])
        return g.rename_columns(["o_custkey", "n"])

    counts = (
        read(sf_dir, "orders", columns=["o_custkey"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("n", alias_name="c_count"))
    )

    def hist_partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("c_count").aggregate([("c_count", "count")])
        return g.rename_columns(["c_count", "n"])

    hist = (
        counts.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("c_count")
        .aggregate(Sum("n", alias_name="custdist"))
        .to_pandas()
    )
    n_total = read(sf_dir, "customer", columns=["c_custkey"]).count()
    n_zero = n_total - int(hist["custdist"].sum())
    if n_zero > 0:
        hist = pd.concat(
            [hist, pd.DataFrame({"c_count": [0], "custdist": [n_zero]})],
            ignore_index=True,
        )
    hist = hist.astype({"c_count": "int64", "custdist": "int64"})
    return (
        hist.sort_values(["custdist", "c_count"], ascending=[False, False])
        .reset_index(drop=True)[["c_count", "custdist"]]
    )


def q15_top_supplier(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q15-shaped: the supplier(s) whose 1996-Q1 lineitem revenue
    equals the maximum over all suppliers (the "revenue view" + argmax).

    Plan: lineitem is date-filtered and partially aggregated per batch,
    so the groupby input is (suppkey, partial) rows; the aggregate is
    supplier-domain (a bounded dimension), the max is taken on its
    ROUNDED revenue (both sides of the comparison round first — an
    unrounded argmax could disagree with the oracle on sub-cent sum
    noise), and names attach to winners only."""
    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1996-04-01")

    def partial(batch: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(batch["l_shipdate"], pa.scalar(lo)),
            pc.less(batch["l_shipdate"], pa.scalar(hi)),
        )
        t = batch.filter(m)
        rev = t["l_extendedprice"].to_numpy(zero_copy_only=False) * (
            1.0 - t["l_discount"].to_numpy(zero_copy_only=False)
        )
        df = pd.DataFrame(
            {"s": t["l_suppkey"].to_numpy(zero_copy_only=False), "r": rev}
        )
        g = df.groupby("s", as_index=False)["r"].sum()
        return pa.table(
            {
                "l_suppkey": pa.array(g["s"].to_numpy(np.int64)),
                "partial": pa.array(g["r"].to_numpy()),
            }
        )

    rev = (
        read(
            sf_dir,
            "lineitem",
            columns=["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("l_suppkey")
        .aggregate(Sum("partial", alias_name="total_revenue"))
        .to_pandas()  # supplier-domain: a bounded dimension aggregate
    )
    rev["total_revenue"] = _round2(rev["total_revenue"].to_numpy())
    winners = rev[rev["total_revenue"] == rev["total_revenue"].max()]
    keys = set(int(v) for v in winners["l_suppkey"])
    names = (
        read(sf_dir, "supplier", columns=["s_suppkey", "s_name"])
        .map_batches(
            lambda b, ks=keys: b.filter(
                pa.array([int(v) in ks for v in b["s_suppkey"].to_pylist()])
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    out = winners.merge(names, left_on="l_suppkey", right_on="s_suppkey")
    return (
        out[["s_suppkey", "s_name", "total_revenue"]]
        .sort_values("s_suppkey")
        .reset_index(drop=True)
    )


def q17_small_quantity_revenue(
    sf_dir: str, brand: str = "Brand#1", broadcast_max_rows: int = 5_000_000
) -> pd.DataFrame:
    """TPC-H Q17-shaped: average yearly revenue lost if small-quantity
    orders (below 20% of the part's average quantity) for one brand were
    not taken — a correlated per-key aggregate consumed by a second scan.

    Plan: two STREAMING passes over a column-pruned lineitem, never a
    self-join. Pass 1 computes per-part (sum, count) quantity for the
    brand's parts; the resulting per-part thresholds are brand-selective
    (|part|/25 rows) and ship as sorted arrays via one ``ray.put``. Pass
    2 re-filters lineitem against the thresholds and partially sums the
    surviving extendedprice. Both passes prune to the brand's partkeys
    with a searchsorted probe. Above ``broadcast_max_rows`` the
    threshold side would switch to a hash ``Dataset.join`` keyed on
    l_partkey (the q5 ladder) — at that size pass 2's filter becomes the
    join's probe side."""
    import pyarrow.parquet as pq

    part = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    )
    bkeys = np.sort(
        part.filter(pc.equal(part["p_brand"], pa.scalar(brand)))[
            "p_partkey"
        ].to_numpy(zero_copy_only=False).astype(np.int64)
    )
    bref = ray.put(bkeys)

    def pass1(batch: pa.Table, ref=bref) -> pa.Table:
        ks = ref if isinstance(ref, np.ndarray) else ray.get(ref)
        p = batch["l_partkey"].to_numpy(zero_copy_only=False)
        _, found = _sorted_int_lookup(ks, ks, p)
        q = batch["l_quantity"].to_numpy(zero_copy_only=False)[found]
        df = pd.DataFrame({"p": p[found], "q": q})
        g = df.groupby("p", as_index=False).agg(s=("q", "sum"), n=("q", "size"))
        return pa.table(
            {
                "l_partkey": pa.array(g["p"].to_numpy(np.int64)),
                "s": pa.array(g["s"].to_numpy()),
                "n": pa.array(g["n"].to_numpy(np.int64)),
            }
        )

    li_cols = ["l_partkey", "l_quantity", "l_extendedprice"]
    per_part = (
        read(sf_dir, "lineitem", columns=li_cols[:2])
        .map_batches(pass1, batch_format="pyarrow")
        .groupby("l_partkey")
        .aggregate(Sum("s", alias_name="sq"), Sum("n", alias_name="nq"))
        .to_pandas()  # brand-selective: |part|/25 rows
    )
    assert len(per_part) <= broadcast_max_rows, "switch threshold side to join"
    tk = per_part["l_partkey"].to_numpy(np.int64)
    order = np.argsort(tk)
    tk = tk[order]
    tv = (
        0.2 * per_part["sq"].to_numpy() / per_part["nq"].to_numpy()
    )[order]
    tref = ray.put((tk, tv))

    def pass2(batch: pa.Table, ref=tref) -> pa.Table:
        ks, vs = ref if isinstance(ref, tuple) else ray.get(ref)
        p = batch["l_partkey"].to_numpy(zero_copy_only=False)
        thresh, found = _sorted_int_lookup(ks, vs, p)
        q = batch["l_quantity"].to_numpy(zero_copy_only=False)
        m = found & (q < thresh)
        s = float(batch["l_extendedprice"].to_numpy(zero_copy_only=False)[m].sum())
        return pa.table({"partial": pa.array([s])})

    total = (
        read(sf_dir, "lineitem", columns=li_cols)
        .map_batches(pass2, batch_format="pyarrow")
        .sum("partial")
    )
    return pd.DataFrame({"avg_yearly": [float(_round2(total / 7.0))]})


def q18_large_orders(
    sf_dir: str, min_qty: float = 250.0, k: int = 100
) -> pd.DataFrame:
    """TPC-H Q18-shaped: the top-``k`` largest-volume orders — orders
    whose total lineitem quantity exceeds ``min_qty`` (HAVING over a
    join), with customer attributes attached.

    Plan: lineitem reduces to per-order quantity sums (partial +
    groupby), the HAVING filter runs on the aggregate, and only winner
    orderkeys (a selectivity-bounded set) fetch order/customer
    attributes via broadcast key filters — attributes never ride a
    fact-table shuffle."""

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "o": batch["l_orderkey"].to_numpy(zero_copy_only=False),
                "q": batch["l_quantity"].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby("o", as_index=False)["q"].sum()
        return pa.table(
            {
                "l_orderkey": pa.array(g["o"].to_numpy(np.int64)),
                "partial": pa.array(g["q"].to_numpy()),
            }
        )

    big = (
        read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum("partial", alias_name="sum_qty"))
        .map_batches(
            lambda b: b.filter(pc.greater(b["sum_qty"], pa.scalar(min_qty))),
            batch_format="pyarrow",
        )
        .to_pandas()  # HAVING-selective: ~1% of orders at min_qty=250
    )
    okeys = set(int(v) for v in big["l_orderkey"])
    orders = (
        read(
            sf_dir,
            "orders",
            columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
        )
        .map_batches(
            lambda b, ks=okeys: b.filter(
                pa.array([int(v) in ks for v in b["o_orderkey"].to_pylist()])
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    out = orders.merge(big, left_on="o_orderkey", right_on="l_orderkey")
    # (o_totalprice DESC, o_orderkey) is a total order — orderkey is
    # unique — so head(k) is deterministic and tie-safe
    out = out.sort_values(
        ["o_totalprice", "o_orderkey"], ascending=[False, True]
    ).head(k)
    ckeys = set(int(v) for v in out["o_custkey"])
    cust = (
        read(sf_dir, "customer", columns=["c_custkey", "c_name"])
        .map_batches(
            lambda b, ks=ckeys: b.filter(
                pa.array([int(v) in ks for v in b["c_custkey"].to_pylist()])
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    out = out.merge(cust, left_on="o_custkey", right_on="c_custkey")
    out["o_orderdate"] = out["o_orderdate"].astype("datetime64[us]")
    return (
        out[
            [
                "c_custkey",
                "c_name",
                "o_orderkey",
                "o_orderdate",
                "o_totalprice",
                "sum_qty",
            ]
        ]
        .sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True])
        .reset_index(drop=True)
    )


def q22_idle_rich_customers(
    sf_dir: str, cutoff: str = "2000-01-01"
) -> pd.DataFrame:
    """TPC-H Q22-shaped: customers with above-average (positive) account
    balance and NO order since 2000, summarized per nation — a scalar
    subquery feeding a filter, then an anti-join. (The driver generator
    gives every customer at least one lifetime order, so the idleness
    window is date-bounded, mirroring Q22's "in the last 7 years".)

    Plan: the scalar average is one tiny aggregate over customer; the
    anti-join probes a per-batch-deduped o_custkey key set (8-byte keys
    on the exchange, the customers_without_orders discipline); the final
    census is nation-domain."""
    cutoff = pd.Timestamp(cutoff)
    cust = read(
        sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_acctbal"]
    )

    def pos_partial(batch: pa.Table) -> pa.Table:
        b = batch["c_acctbal"].to_numpy(zero_copy_only=False)
        pos = b[b > 0.0]
        return pa.table(
            {"s": pa.array([float(pos.sum())]), "n": pa.array([len(pos)])}
        )

    stats = cust.map_batches(pos_partial, batch_format="pyarrow").to_pandas()
    avg_bal = float(stats["s"].sum() / max(int(stats["n"].sum()), 1))

    rich = cust.map_batches(
        lambda b, a=avg_bal: b.filter(pc.greater(b["c_acctbal"], pa.scalar(a))),
        batch_format="pyarrow",
    )
    keys = (
        read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])
        .map_batches(
            lambda b, c=cutoff: pa.table(
                {
                    "o_custkey": b.filter(
                        pc.greater_equal(b["o_orderdate"], pa.scalar(c))
                    )["o_custkey"].unique()
                }
            ),
            batch_format="pyarrow",
        )
    )
    out = (
        rich.join(
            keys,
            join_type="left_anti",
            num_partitions=join_partitions(),
            on=("c_custkey",),
            right_on=("o_custkey",),
        )
        .groupby("c_nationkey")
        .aggregate(
            Count(alias_name="n_customers"), Sum("c_acctbal", alias_name="sum_acctbal")
        )
        .sort("c_nationkey")
        .to_pandas()
    )
    if out.empty:  # empty aggregates lose their schema
        return pd.DataFrame(
            {
                "c_nationkey": pd.Series([], dtype="int32"),
                "n_customers": pd.Series([], dtype="int64"),
                "sum_acctbal": pd.Series([], dtype="float64"),
            }
        )
    out["sum_acctbal"] = _round2(out["sum_acctbal"].to_numpy())
    out["c_nationkey"] = out["c_nationkey"].astype("int32")
    return out[["c_nationkey", "n_customers", "sum_acctbal"]]


def q9_profit_by_nation_year(
    sf_dir: str, pattern: str = "red", broadcast_max_rows: int = 5_000_000
) -> pd.DataFrame:
    """TPC-H Q9-shaped: profit per (supplier nation, order year) for
    parts whose name contains ``pattern`` — the five-table star join
    (lineitem x orders x supplier x nation x part).

    Plan: the two dimension legs collapse to broadcast probes — part
    filters to a sorted partkey array, supplier+nation fold to a
    suppkey -> nation-index sorted map (both bounded or
    pattern-selective; above ``broadcast_max_rows`` each leg falls back
    to a hash join, the q5 ladder). The one genuinely fact x fact leg
    (filtered lineitem x orders) is a hash ``Dataset.join`` — but only
    AFTER lineitem is partially aggregated to (orderkey, nation) profit
    rows, so the join moves at most one row per (order, nation), never
    raw lineitems. Orders ship only (orderkey, year)."""
    import pyarrow.parquet as pq

    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"])
    pk = part.filter(pc.match_substring(part["p_name"], pattern))[
        "p_partkey"
    ].to_numpy(zero_copy_only=False).astype(np.int64)
    pk = np.sort(pk)

    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).to_pandas()
    nation = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    nation = nation.sort_values("n_nationkey").reset_index(drop=True)
    nat_names = nation["n_name"].to_numpy(dtype=object)
    nat_keys = nation["n_nationkey"].to_numpy(np.int64)
    sk = supp["s_suppkey"].to_numpy(np.int64)
    sv = supp["s_nationkey"].to_numpy(np.int64)
    o = np.argsort(sk)
    sk, sv = sk[o], sv[o]
    assert len(sk) <= broadcast_max_rows and len(pk) <= broadcast_max_rows, (
        "dimension leg exceeds broadcast ceiling: switch to Dataset.join"
    )
    ref = ray.put((pk, sk, sv))

    def li_partial(batch: pa.Table, r=ref) -> pa.Table:
        pks, sks, svs = r if isinstance(r, tuple) else ray.get(r)
        p = batch["l_partkey"].to_numpy(zero_copy_only=False)
        _, in_pat = _sorted_int_lookup(pks, pks, p)
        t = batch.filter(pa.array(in_pat))
        if t.num_rows == 0:
            return pa.table(
                {
                    "l_orderkey": pa.array([], type=pa.int64()),
                    "n_nationkey": pa.array([], type=pa.int64()),
                    "partial": pa.array([], type=pa.float64()),
                }
            )
        s = t["l_suppkey"].to_numpy(zero_copy_only=False)
        nat, _ = _sorted_int_lookup(sks, svs, s)
        profit = t["l_extendedprice"].to_numpy(zero_copy_only=False) * (
            1.0 - t["l_discount"].to_numpy(zero_copy_only=False)
        )
        df = pd.DataFrame(
            {
                "o": t["l_orderkey"].to_numpy(zero_copy_only=False),
                "nk": nat,
                "pr": profit,
            }
        )
        g = df.groupby(["o", "nk"], as_index=False)["pr"].sum()
        return pa.table(
            {
                "l_orderkey": pa.array(g["o"].to_numpy(np.int64)),
                "n_nationkey": pa.array(g["nk"].to_numpy(np.int64)),
                "partial": pa.array(g["pr"].to_numpy()),
            }
        )

    li = read(
        sf_dir,
        "lineitem",
        columns=[
            "l_orderkey",
            "l_partkey",
            "l_suppkey",
            "l_extendedprice",
            "l_discount",
        ],
    ).map_batches(li_partial, batch_format="pyarrow")

    def o_year(batch: pa.Table) -> pa.Table:
        y = pc.year(batch["o_orderdate"]).cast(pa.int64())
        return pa.table({"l_orderkey": batch["o_orderkey"], "o_year": y})

    orders = read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"]).map_batches(
        o_year, batch_format="pyarrow"
    )
    joined = li.join(
        orders, join_type="inner", num_partitions=join_partitions(), on=("l_orderkey",)
    )

    def fold(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "nk": batch["n_nationkey"].to_numpy(zero_copy_only=False),
                "y": batch["o_year"].to_numpy(zero_copy_only=False),
                "pr": batch["partial"].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby(["nk", "y"], as_index=False)["pr"].sum()
        # (nation, year) packs into one int64 so the final groupby's key
        # stays a single numeric column (Arrow fast path)
        key = g["nk"].to_numpy(np.int64) * np.int64(10_000) + g["y"].to_numpy(
            np.int64
        )
        return pa.table(
            {"key": pa.array(key), "pr": pa.array(g["pr"].to_numpy())}
        )

    agg = (
        joined.map_batches(fold, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("pr", alias_name="profit"))
        .to_pandas()  # nations x years: a few hundred rows
    )
    nk = (agg["key"].to_numpy(np.int64) // 10_000).astype(np.int64)
    name_vals, _ = _sorted_int_lookup(nat_keys, np.arange(len(nat_keys)), nk)
    agg["n_name"] = nat_names[name_vals]
    agg["o_year"] = (agg["key"].to_numpy(np.int64) % 10_000).astype(np.int64)
    agg["profit"] = _round2(agg["profit"].to_numpy())
    return (
        agg.sort_values(["n_name", "o_year"], ascending=[True, False])
        .reset_index(drop=True)[["n_name", "o_year", "profit"]]
    )
