"""Join-variety operators over the driver test tables (SURVEY.md §2.9
extension surface): semi-join, anti-join, as-of join and windowed top-k
per group — the relational shapes a reference user mixes with the dedup
family, each expressed with the partitioning pattern that survives
100 TB.

Physical-plan notes per operator:

- **semi / anti join** use ``Dataset.join(join_type="left_semi" /
  "left_anti")`` — Ray Data's hash-partitioned shuffle join — with the
  probe side reduced FIRST (filter + per-batch key dedup inside
  ``map_batches``) so only 8-byte keys ride the exchange, never payload
  columns.
- **as-of join** has no Dataset-API primitive: it is the canonical
  partition-by-key + in-partition ordered merge (same shard pattern as
  sessions.py) — shuffle on ``user_id % n_shards``, then a vectorized
  cummax-of-shifted-timestamps per shard. The partitioning assumption
  (one user never spans shards) is the documented contract.
- **windowed top-k per group** is shard-groupby + per-shard vectorized
  rank (never a global sort): only k rows per group leave a shard.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Sum

from .common import (
    canonical_sort,
    join_partitions,
    keys_with_sentinel,
    read,
    revenue_units,
    units_to_money,
)

_N_SHARDS = 32


def q4_order_priority(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q4-shaped semi-join: count 1996 orders per priority that
    have at least one high-quantity lineitem (EXISTS semantics).

    Plan: lineitem is filtered + per-batch-deduped down to bare
    ``l_orderkey`` keys, then ``left_semi`` hash-join keeps matching
    orders; the priority census is a tiny groupby after the join.
    """
    orders = read(
        sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.greater_equal(b["o_orderdate"], pa.scalar(pd.Timestamp("1996-01-01"))),
                pc.less(b["o_orderdate"], pa.scalar(pd.Timestamp("1997-01-01"))),
            )
        ).select(["o_orderkey", "o_orderpriority"]),
        batch_format="pyarrow",
    )
    keys = keys_with_sentinel(
        read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"]),
        "l_orderkey",
        block_filter=lambda b: b.filter(
            pc.greater(b["l_quantity"], pa.scalar(45.0))
        ),
        dedup=True,
    )
    out = canonical_sort(
        orders.join(
            keys,
            join_type="left_semi",
            num_partitions=join_partitions(),
            on=("o_orderkey",),
            right_on=("l_orderkey",),
        )
        .groupby("o_orderpriority")
        .aggregate(Count(alias_name="n_orders")),
        ["o_orderpriority"],
    ).to_pandas()
    return out[["o_orderpriority", "n_orders"]]


def customers_without_orders(sf_dir: str) -> pd.DataFrame:
    """Anti-join: customers with NO order in 1997 (NOT EXISTS
    semantics), summarized per market segment.

    Plan: orders filtered to the window and reduced to per-batch-deduped
    ``o_custkey`` keys, then ``left_anti`` hash-join drops matching
    customers; segment census after."""
    cust = read(
        sf_dir, "customer", columns=["c_custkey", "c_mktsegment", "c_acctbal"]
    )
    keys = keys_with_sentinel(
        read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"]),
        "o_custkey",
        block_filter=lambda b: b.filter(
            pc.and_(
                pc.greater_equal(
                    b["o_orderdate"], pa.scalar(pd.Timestamp("1997-01-01"))
                ),
                pc.less(
                    b["o_orderdate"], pa.scalar(pd.Timestamp("1998-01-01"))
                ),
            )
        ),
        dedup=True,
    )
    out = canonical_sort(
        cust.join(
            keys,
            join_type="left_anti",
            num_partitions=join_partitions(),
            on=("c_custkey",),
            right_on=("o_custkey",),
        )
        .groupby("c_mktsegment")
        .aggregate(
            Count(alias_name="n_customers"), Sum("c_acctbal", alias_name="sum_acctbal")
        ),
        ["c_mktsegment"],
    ).to_pandas()
    out["sum_acctbal"] = out["sum_acctbal"].round(2)
    return out[["c_mktsegment", "n_customers", "sum_acctbal"]]


def _asof_per_shard(g: pd.DataFrame) -> pd.DataFrame:
    """In-partition as-of kernel: one vectorized pass over a shard."""
    g = g.sort_values(["user_id", "ts", "event_id"])
    view_ts = g["ts"].where(g["event_type"].eq("view"))
    # shift-then-ffill: row i sees the latest view at a strictly
    # earlier row of the same user (rows are ts-sorted, so "latest
    # seen" == "max"); cummax would re-emit NaT at gap positions
    prev_view = view_ts.groupby(g["user_id"]).shift().groupby(g["user_id"]).ffill()
    buy = g["event_type"].eq("purchase")
    out = pd.DataFrame(
        {
            "event_id": g.loc[buy, "event_id"],
            "user_id": g.loc[buy, "user_id"],
            "prev_view_ts": prev_view[buy],
        }
    )
    # exact float64 µs-count / 1e6 — bit-identical to the SQL oracle's
    # DATE_DIFF('microsecond', ...)/1e6, no decimal rounding needed
    lag_us = (g.loc[buy, "ts"] - out["prev_view_ts"]) / pd.Timedelta(microseconds=1)
    out["lag_s"] = lag_us / 1e6
    return out


def asof_purchase_view(sf_dir: str) -> ray.data.Dataset:
    """As-of join within the events log: for every ``purchase`` event,
    the timestamp of the same user's most recent strictly-preceding
    ``view`` event (ties broken by event_id, matching the SQL window
    frame ``ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING``), plus
    the lag in seconds. Purchases with no prior view carry nulls.

    Plan: prune to the two event types at the read, shuffle on
    ``user_id % n_shards`` (a user never spans shards), then one
    vectorized pass per shard: sort by (user, ts, event_id), take the
    per-user cummax of the shifted view-timestamps.
    """

    def add_shard(batch: pa.Table) -> pa.Table:
        shard = (batch["user_id"].to_numpy() % np.int64(_N_SHARDS)).astype("int32")
        return batch.append_column("shard", pa.array(shard, type=pa.int32()))

    return canonical_sort(
        read(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])
        .filter(expr="event_type == 'view' or event_type == 'purchase'")
        .map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(
            lambda g: _asof_per_shard(g.drop(columns=["shard"])),
            batch_format="pandas",
        ),
        ["event_id"],
    )


def window_topk_orders(sf_dir: str, k: int = 3) -> ray.data.Dataset:
    """Windowed rank: each customer's top-``k`` orders by totalprice
    (ROW_NUMBER() semantics, ties broken by orderkey).

    Plan: shard on ``o_custkey % n_shards``, rank inside each shard with
    one vectorized sort + cumcount — at most k rows per customer leave a
    shard; no global sort of the fact table."""

    def add_shard(batch: pa.Table) -> pa.Table:
        shard = (batch["o_custkey"].to_numpy() % np.int64(_N_SHARDS)).astype("int32")
        return batch.append_column("shard", pa.array(shard, type=pa.int32()))

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["o_custkey", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True],
        )
        g["rnk"] = g.groupby("o_custkey").cumcount() + 1
        return g[g["rnk"] <= k].astype({"rnk": "int64"})

    return canonical_sort(
        read(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_totalprice"])
        .map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(
            lambda g: per_shard(g.drop(columns=["shard"])), batch_format="pandas"
        ),
        ["o_custkey", "rnk"],
    )


def orders_by_quarter(sf_dir: str) -> pd.DataFrame:
    """Range join: orders binned into calendar quarters by
    ``q_start <= o_orderdate < q_end`` interval containment.

    Physical plan for a range join whose interval side is small: the
    interval table is broadcast (here: closure-captured — dozens of
    rows) and containment is one vectorized ``searchsorted`` against
    the sorted interval starts per batch, followed by per-batch partial
    aggregation. No shuffle touches the fact table until it is already
    reduced to (quarter, partials)."""
    edges = pd.date_range("1995-01-01", "2001-10-01", freq="QS")  # sorted starts
    starts = edges.values.astype("datetime64[us]")  # match parquet unit

    def partial(batch: pa.Table) -> pa.Table:
        d = batch["o_orderdate"].to_numpy()  # datetime64
        idx = np.searchsorted(starts, d, side="right") - 1
        ok = idx >= 0  # all dates fall inside [first, last) here
        t = pa.table(
            {
                "q_start": pa.array(starts[idx[ok]], type=pa.timestamp("us")),
                "n": pa.array(np.ones(int(ok.sum()), np.int64)),
                "rev": pa.array(batch["o_totalprice"].to_numpy()[ok]),
            }
        )
        g = t.group_by("q_start").aggregate([("n", "sum"), ("rev", "sum")])
        return g.rename_columns(["q_start", "n", "rev"])

    out = canonical_sort(
        read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("q_start")
        .aggregate(Sum("n", alias_name="n_orders"), Sum("rev", alias_name="revenue")),
        ["q_start"],
    ).to_pandas()
    out["revenue"] = out["revenue"].round(2)
    out["q_start"] = out["q_start"].astype("datetime64[us]")
    return out[["q_start", "n_orders", "revenue"]]


def running_total_orders(sf_dir: str) -> ray.data.Dataset:
    """Windowed running sum: per-customer cumulative order value in
    (o_orderdate, o_orderkey) order — SUM() OVER (PARTITION BY ...
    ORDER BY ... ROWS UNBOUNDED PRECEDING) semantics.

    Plan: shard on ``o_custkey % n_shards``, one vectorized
    sort + groupby-cumsum per shard; addition order matches the SQL
    window frame exactly, so values are bit-comparable after rounding."""

    def add_shard(batch: pa.Table) -> pa.Table:
        shard = (batch["o_custkey"].to_numpy() % np.int64(_N_SHARDS)).astype("int32")
        return batch.append_column("shard", pa.array(shard, type=pa.int32()))

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
        g["run_total"] = g.groupby("o_custkey")["o_totalprice"].cumsum().round(2)
        return g[["o_custkey", "o_orderkey", "run_total"]]

    return canonical_sort(
        read(
            sf_dir,
            "orders",
            columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"],
        )
        .map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(
            lambda g: per_shard(g.drop(columns=["shard"])), batch_format="pandas"
        ),
        ["o_custkey", "o_orderkey"],
    )


def q10_returned_items(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """TPC-H Q10-shaped: top-``k`` customers by revenue from RETURNED
    lineitems in 1996-H1, with customer attributes attached.

    Scale plan: the revenue aggregate runs FIRST over bare 8-byte keys
    (filtered lineitem joined to the order->customer key map), the top-k
    is taken on the aggregate, and customer attribute columns are joined
    onto only the k winning rows — attributes never ride the wide
    exchange. The order->customer map is itself reduced to two int
    columns before the join."""
    import pyarrow.compute as pc

    lineitem = read(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    ).map_batches(
        lambda b: b.filter(pc.equal(b["l_returnflag"], pa.scalar("R"))),
        batch_format="pyarrow",
    )
    orders = read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.greater_equal(
                    b["o_orderdate"], pa.scalar(pd.Timestamp("1996-01-01"))
                ),
                pc.less(b["o_orderdate"], pa.scalar(pd.Timestamp("1996-07-01"))),
            )
        )
        .select(["o_orderkey", "o_custkey"])
        # Ray's hash join keys both sides on the same column name
        .rename_columns(["l_orderkey", "o_custkey"]),
        batch_format="pyarrow",
    )
    joined = lineitem.join(
        orders, join_type="inner", num_partitions=join_partitions(), on=("l_orderkey",)
    )

    def rev_partial(batch: pa.Table) -> pa.Table:
        # exact int64 1e-4-dollar units (common.revenue_units): float
        # partials summed in block-layout order flipped the final cent at
        # .xx5 boundaries — the round-3 hash flake on THIS query
        rev = revenue_units(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False),
            batch["l_discount"].to_numpy(zero_copy_only=False),
        )
        df = pd.DataFrame(
            {"c": batch["o_custkey"].to_numpy(zero_copy_only=False), "r": rev}
        )
        g = df.groupby("c", as_index=False)["r"].sum()
        return pa.table(
            {
                "o_custkey": pa.array(g["c"].to_numpy(np.int64)),
                "partial": pa.array(g["r"].to_numpy(np.int64)),
            }
        )

    agg = (
        joined.map_batches(rev_partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("partial", alias_name="revenue"))
        .materialize()
    )
    # cut by ROUNDED-CENT threshold, not count: every unit value whose
    # half-up cent rounding ties the k-th winner's must survive to the
    # final (rounded, custkey) sort — integer comparison, no epsilon
    kth = canonical_sort(agg, ["revenue"], descending=True).limit(k).to_pandas()
    if len(kth) >= k:
        vk_cents = int((int(kth["revenue"].min()) + 50) // 100)
        top = agg.map_batches(
            lambda b, t=vk_cents: b.filter(
                pc.greater_equal(
                    pc.divide(
                        pc.add(b["revenue"], pa.scalar(50, type=pa.int64())),
                        pa.scalar(100, type=pa.int64()),
                    ),
                    pa.scalar(t, type=pa.int64()),
                )
            ),
            batch_format="pyarrow",
        ).to_pandas()
    else:
        top = kth
    top["revenue"] = units_to_money(top["revenue"].to_numpy(np.int64))
    top = (
        top.sort_values(["revenue", "o_custkey"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    winner_keys = np.sort(top["o_custkey"].to_numpy(np.int64))
    cust = read(
        sf_dir, "customer", columns=["c_custkey", "c_name", "c_mktsegment"]
    ).map_batches(
        lambda b, keys=winner_keys: b.filter(
            pa.array(
                np.isin(b["c_custkey"].to_numpy(zero_copy_only=False), keys)
            )
        ),
        batch_format="pyarrow",
    ).to_pandas()
    out = top.merge(cust, left_on="o_custkey", right_on="c_custkey")
    return (
        out[["c_custkey", "c_name", "c_mktsegment", "revenue"]]
        .sort_values(["revenue", "c_custkey"], ascending=[False, True])
        .reset_index(drop=True)
    )


def percent_rank_orders(sf_dir: str) -> ray.data.Dataset:
    """Analytic PERCENT_RANK window: each order's totalprice percentile
    within its order-date quarter — rank ties share a rank (SQL
    PERCENT_RANK semantics: (rank - 1) / (n_partition - 1)).

    Plan: partition key is the quarter (a BOUNDED domain), so one
    groupby co-locates each partition and a vectorized sort + tie-aware
    rank computes the window inside it; no global sort. A skewed quarter
    is one large sorted segment, never a pairwise blowup."""

    def add_q(batch: pa.Table) -> pa.Table:
        d = batch["o_orderdate"]
        q = pc.add(
            pc.multiply(pc.year(d).cast(pa.int64()), pa.scalar(10, type=pa.int64())),
            pc.quarter(d).cast(pa.int64()),
        )
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "o_totalprice": batch["o_totalprice"],
                "q": q,
            }
        )

    def per_quarter(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_totalprice", "o_orderkey"], ignore_index=True)
        price = g["o_totalprice"].to_numpy()
        n = len(g)
        # tie-aware rank: index of first row with this price (1-based)
        first_idx = np.searchsorted(price, price, side="left")
        pr = (
            first_idx / (n - 1) if n > 1 else np.zeros(n)
        )
        return pd.DataFrame(
            {
                "o_orderkey": g["o_orderkey"].to_numpy(np.int64),
                "quarter": g["q"].to_numpy(np.int64),
                "pct_rank": np.floor(pr * 1e4 + 0.5) / 1e4,
            }
        )

    from .common import canonical_sort

    out = (
        read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_totalprice"])
        .map_batches(add_q, batch_format="pyarrow")
        .groupby("q")
        .map_groups(per_quarter, batch_format="pandas")
    )
    return canonical_sort(out, ["o_orderkey"])


def customer_reconcile(sf_dir: str) -> ray.data.Dataset:
    """FULL OUTER JOIN shape, expressed join-free: per-key order activity
    (orders fact) reconciled against per-key event activity (events
    fact) on the shared customer/user id — keys present on either side
    survive, each tagged ``both`` / ``orders_only`` / ``events_only``
    (the two-systems reconciliation report).

    Plan: each side pre-aggregates per batch into 4-int partials
    (combiner), the two partial streams UNION into ONE bounded-domain
    groupby — a full outer join with no all-to-all join operator and no
    payload columns on the exchange.  Money sums are exact int64 cents
    (:func:`~.common.money_cents`)."""
    from ray.data.aggregate import Max

    from .common import cents_to_money, money_cents

    def o_part(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "custkey": batch["o_custkey"].to_numpy(zero_copy_only=False),
                "n_orders": np.ones(batch.num_rows, np.int64),
                "o_cents": money_cents(
                    batch["o_totalprice"].to_numpy(zero_copy_only=False)
                ),
            }
        )
        g = df.groupby("custkey", as_index=False).sum()
        n = len(g)
        z = np.zeros(n, np.int64)
        return pa.table(
            {
                "custkey": pa.array(g["custkey"].to_numpy(np.int64)),
                "n_orders": pa.array(g["n_orders"].to_numpy(np.int64)),
                "o_cents": pa.array(g["o_cents"].to_numpy(np.int64)),
                "n_events": pa.array(z),
                "e_cents": pa.array(z),
                "has_o": pa.array(np.ones(n, np.int64)),
                "has_e": pa.array(z),
            }
        )

    def e_part(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "custkey": batch["user_id"].to_numpy(zero_copy_only=False),
                "n_events": np.ones(batch.num_rows, np.int64),
                "e_cents": money_cents(
                    batch["value"].to_numpy(zero_copy_only=False)
                ),
            }
        )
        g = df.groupby("custkey", as_index=False).sum()
        n = len(g)
        z = np.zeros(n, np.int64)
        return pa.table(
            {
                "custkey": pa.array(g["custkey"].to_numpy(np.int64)),
                "n_orders": pa.array(z),
                "o_cents": pa.array(z),
                "n_events": pa.array(g["n_events"].to_numpy(np.int64)),
                "e_cents": pa.array(g["e_cents"].to_numpy(np.int64)),
                "has_o": pa.array(z),
                "has_e": pa.array(np.ones(n, np.int64)),
            }
        )

    orders = read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"]).map_batches(
        o_part, batch_format="pyarrow"
    )
    events = read(sf_dir, "events", columns=["user_id", "value"]).map_batches(
        e_part, batch_format="pyarrow"
    )
    per = (
        orders.union(events)
        .groupby("custkey")
        .aggregate(
            Sum("n_orders", alias_name="n_orders"),
            Sum("o_cents", alias_name="o_cents"),
            Sum("n_events", alias_name="n_events"),
            Sum("e_cents", alias_name="e_cents"),
            Max("has_o", alias_name="has_o"),
            Max("has_e", alias_name="has_e"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        ho = batch["has_o"].to_numpy(zero_copy_only=False).astype(bool)
        he = batch["has_e"].to_numpy(zero_copy_only=False).astype(bool)
        presence = np.where(
            ho & he, "both", np.where(ho, "orders_only", "events_only")
        )
        return pa.table(
            {
                "custkey": batch["custkey"],
                "n_orders": batch["n_orders"],
                "orders_total": pa.array(
                    cents_to_money(
                        batch["o_cents"].to_numpy(zero_copy_only=False)
                    )
                ),
                "n_events": batch["n_events"],
                "events_value": pa.array(
                    cents_to_money(
                        batch["e_cents"].to_numpy(zero_copy_only=False)
                    )
                ),
                "presence": pa.array(presence, pa.string()),
            }
        )

    return canonical_sort(
        per.map_batches(finish, batch_format="pyarrow"), ["custkey"]
    )


def rolling_order_sum(sf_dir: str, window: int = 3) -> ray.data.Dataset:
    """ROWS-frame window aggregate: for every order, the sum and count of
    ``o_totalprice`` over the current + ``window-1`` preceding orders of
    the SAME customer ordered by (o_orderdate, o_orderkey) — the moving
    basket-size signal (SQL ``ROWS BETWEEN n PRECEDING AND CURRENT
    ROW``), a frame shape none of the other window queries cover.

    Plan: shard on ``o_custkey % n_shards`` (a customer never spans
    shards), one in-shard sort, then a segmented prefix-sum resolves
    every frame vectorized (``cs[i+1] - cs[max(i-w+1, run_start)]``) —
    no per-row loop, no pairwise frame expansion.  Sums are exact int64
    cents; the float conversion is one exact divide at the end."""
    from .common import cents_to_money, money_cents

    def add_shard(batch: pa.Table) -> pa.Table:
        shard = (
            batch["o_custkey"].to_numpy() % np.int64(_N_SHARDS)
        ).astype("int32")
        return pa.table(
            {
                "o_custkey": batch["o_custkey"],
                "o_orderkey": batch["o_orderkey"],
                "d": batch["o_orderdate"]
                .cast(pa.timestamp("us"))
                .cast(pa.int64()),
                "cents": pa.array(
                    money_cents(
                        batch["o_totalprice"].to_numpy(zero_copy_only=False)
                    )
                ),
                "shard": pa.array(shard, type=pa.int32()),
            }
        )

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {
                    "o_orderkey": pd.Series([], dtype="int64"),
                    "window_n": pd.Series([], dtype="int64"),
                    "window_sum": pd.Series([], dtype="float64"),
                }
            )
        g = g.sort_values(["o_custkey", "d", "o_orderkey"], ignore_index=True)
        cust = g["o_custkey"].to_numpy(np.int64)
        cents = g["cents"].to_numpy(np.int64)
        n = len(g)
        idx = np.arange(n, dtype=np.int64)
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = cust[1:] != cust[:-1]
        run_start = np.maximum.accumulate(np.where(new, idx, 0))
        lo = np.maximum(idx - (window - 1), run_start)
        cs = np.concatenate([[0], np.cumsum(cents)])
        wsum = cs[idx + 1] - cs[lo]
        return pd.DataFrame(
            {
                "o_orderkey": g["o_orderkey"].to_numpy(np.int64),
                "window_n": (idx + 1 - lo).astype(np.int64),
                "window_sum": cents_to_money(wsum),
            }
        )

    out = (
        read(
            sf_dir,
            "orders",
            columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
        )
        .map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(
            lambda g: per_shard(g.drop(columns=["shard"])),
            batch_format="pandas",
        )
    )
    return canonical_sort(out, ["o_orderkey"])


def dense_topk_orders(sf_dir: str, k: int = 2) -> ray.data.Dataset:
    """Windowed DENSE_RANK: every order whose totalprice is among a
    customer's top-``k`` DISTINCT price levels — the ties-kept rank
    flavor (:func:`window_topk_orders` is ROW_NUMBER, which cuts ties
    arbitrarily; DENSE_RANK keeps all rows of a tied level, the
    semantics audits and leaderboards usually want).

    Plan: same shard-and-rank shape as ``window_topk_orders``
    (``o_custkey % n_shards``, one vectorized in-shard sort); the dense
    rank is a cumsum over new-distinct-price flags reset per customer —
    no per-group apply, no global sort. Output is bounded by k price
    levels per customer times the tie multiplicity."""

    def add_shard(batch: pa.Table) -> pa.Table:
        shard = (batch["o_custkey"].to_numpy() % np.int64(_N_SHARDS)).astype("int32")
        return batch.append_column("shard", pa.array(shard, type=pa.int32()))

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["o_custkey", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True],
            ignore_index=True,
        )
        cust = g["o_custkey"].to_numpy(np.int64)
        price = g["o_totalprice"].to_numpy(np.float64)
        new_cust = np.r_[True, cust[1:] != cust[:-1]]
        new_level = new_cust | np.r_[False, price[1:] != price[:-1]]
        level = np.cumsum(new_level)
        # subtract the running level count at each customer's first row
        # -> 1-based dense rank within the customer
        start_level = level[np.maximum.accumulate(
            np.where(new_cust, np.arange(len(cust)), 0)
        )]
        g["rnk"] = (level - start_level + 1).astype(np.int64)
        return g[g["rnk"] <= k]

    return canonical_sort(
        read(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_totalprice"])
        .map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(
            lambda g: per_shard(g.drop(columns=["shard"])), batch_format="pandas"
        ),
        ["o_custkey", "rnk", "o_orderkey"],
    )


def ref_integrity_audit(
    sf_dir: str, broadcast_max_rows: int = 5_000_000
) -> pd.DataFrame:
    """Referential-integrity audit (the constraint-check / data-quality
    shape next to reshape.profile_documents): for every fact -> dimension
    foreign-key edge, count the fact rows whose key has NO match in the
    dimension. At 100 TB this is the first query a pipeline runs after an
    ingest drop.

    Scale plan: the dimension KEY SET rides the q5 broadcast ladder —
    below ``broadcast_max_rows`` it gathers as one sorted int64 array
    (`gather_sorted_arrays`) probed via `sorted_int_lookup` inside
    `map_batches`, and the fact side ships ONE (n, orphans) int partial
    per batch; above the ceiling the orphan count comes from a
    `left_anti` hash join on per-block-deduped sentinel keys (only 8-byte
    keys on the exchange). Both legs are pinned equal by
    tests/test_new_ops_r5.py with a forced tiny ceiling."""
    import ray as _ray

    from .common import gather_sorted_arrays, sorted_int_lookup

    edges = (
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("events", "user_id", "customer", "c_custkey"),
    )
    rows = []
    for fact, fk, dim, key in edges:
        dim_ds = read(sf_dir, dim, columns=[key])
        fact_ds = read(sf_dir, fact, columns=[fk])
        if dim_ds.count() <= broadcast_max_rows:
            (keys_arr,) = gather_sorted_arrays(dim_ds, key)
            ref = _ray.put(keys_arr)

            def partial(batch: pa.Table, r=ref, c=fk) -> pa.Table:
                ks = _ray.get(r)
                probe = (
                    batch[c].to_numpy(zero_copy_only=False).astype(np.int64)
                )
                _, found = sorted_int_lookup(
                    ks, np.zeros(len(ks), np.int64), probe
                )
                return pa.table(
                    {
                        "n": pa.array([len(probe)], type=pa.int64()),
                        "orphans": pa.array(
                            [int(len(probe) - found.sum())], type=pa.int64()
                        ),
                    }
                )

            parts = fact_ds.map_batches(
                partial, batch_format="pyarrow"
            ).to_pandas()
            n_rows, n_orphans = int(parts["n"].sum()), int(
                parts["orphans"].sum()
            )
        else:  # join leg: anti-join count, keys only on the exchange
            n_rows = fact_ds.count()
            n_orphans = (
                fact_ds.join(
                    keys_with_sentinel(dim_ds, key, dst_col="__dk", dedup=True),
                    join_type="left_anti",
                    num_partitions=join_partitions(),
                    on=(fk,),
                    right_on=("__dk",),
                ).count()
            )
        rows.append((fact, fk, dim, n_rows, n_orphans))
    out = pd.DataFrame(
        rows, columns=["fact", "fk", "dim", "n_rows", "n_orphans"]
    ).astype({"n_rows": "int64", "n_orphans": "int64"})
    return out.sort_values(["fact", "fk"]).reset_index(drop=True)


def part_price_band_pairs(sf_dir: str, eps_cents: int = 25) -> pd.DataFrame:
    """Non-equi BAND self-join: part pairs whose retail prices differ by
    at most ``eps_cents`` — the |x − y| <= ε join shape (the VALUE-domain
    counterpart of events_range_join's per-user temporal band). Columns:
    part_a, part_b (a < b by key), cents_a, cents_b, diff_cents; ordered
    by (part_a, part_b). All money is exact int64 cents (2-decimal by
    construction), so the hash is float-free.

    Physical plan — ghost-replication bucketing: rows land in buckets of
    width ``eps_cents`` by ``cents // eps``; every row is ALSO replicated
    as a ghost into the bucket below, so any qualifying pair co-locates
    in exactly ONE bucket (the lower endpoint's): same-bucket pairs as
    native×native there (their ghost copies pair a bucket down but
    ghost×ghost pairs are skipped), cross-bucket pairs as native×ghost in
    the lower bucket. In-bucket matching is a sorted searchsorted window
    sweep (no quadratic scan over the bucket). Skew note: a hot price
    value concentrates one bucket — cap ``eps_cents`` (narrower buckets)
    or pre-aggregate equal-cents rows if a deployment's price domain is
    degenerate."""

    def to_buckets(batch: pa.Table) -> pa.Table:
        k = batch["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.round(
            batch["p_retailprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        b = cents // eps_cents
        return pa.table(
            {
                "bucket": np.r_[b, b - 1],
                "k": np.r_[k, k],
                "c": np.r_[cents, cents],
                "ghost": np.r_[
                    np.zeros(len(k), np.int8), np.ones(len(k), np.int8)
                ],
            }
        )

    def in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((g["k"].to_numpy(np.int64), g["c"].to_numpy(np.int64)))
        c = g["c"].to_numpy(np.int64)[order]
        k = g["k"].to_numpy(np.int64)[order]
        gh = g["ghost"].to_numpy(np.int8)[order]
        n = len(c)
        if n < 2:
            return pd.DataFrame(
                {col: np.empty(0, np.int64)
                 for col in ("part_a", "part_b", "cents_a", "cents_b",
                             "diff_cents")}
            )
        hi = np.searchsorted(c, c + eps_cents, side="right")
        cnt = hi - np.arange(n) - 1
        cnt = np.maximum(cnt, 0)
        total = int(cnt.sum())
        ia = np.repeat(np.arange(n), cnt)
        ib = (
            np.arange(total)
            - np.repeat(np.cumsum(cnt) - cnt, cnt)
            + ia
            + 1
        )
        keep = ~((gh[ia] == 1) & (gh[ib] == 1))  # ghost x ghost: counted
        # in their native bucket; same-KEY native/ghost self-pairs cannot
        # qualify here (a row and its ghost live in different buckets)
        ia, ib = ia[keep], ib[keep]
        pa_ = np.minimum(k[ia], k[ib])
        pb_ = np.maximum(k[ia], k[ib])
        swap = k[ia] > k[ib]
        ca = np.where(swap, c[ib], c[ia])
        cb = np.where(swap, c[ia], c[ib])
        return pd.DataFrame(
            {
                "part_a": pa_,
                "part_b": pb_,
                "cents_a": ca,
                "cents_b": cb,
                "diff_cents": np.abs(ca - cb),
            }
        )

    out = (
        read(sf_dir, "part", columns=["p_partkey", "p_retailprice"])
        .map_batches(to_buckets, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(
            lambda g: in_bucket(g.drop(columns=["bucket"])),
            batch_format="pandas",
        )
        .to_pandas()
    )
    return out.astype("int64").sort_values(
        ["part_a", "part_b"], ignore_index=True
    )


def customers_all_priorities(sf_dir: str) -> pd.DataFrame:
    """Relational DIVISION ("for all"): customers who have placed at
    least one order in EVERY order priority present in the table —
    the universal-quantifier join shape (Codd's division) the rest of the
    join pack doesn't cover. Columns: o_custkey, n_orders; ordered by
    o_custkey.

    Plan: one distinct (cust, priority) fold with per-batch combiners
    doubles as the order counter; the divisor cardinality (global
    distinct priorities — a bounded domain) folds from the same partials;
    a per-customer count-distinct compare closes the division. Nothing
    but (cust, priority, n) partial rows ever shuffle."""

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "o_custkey": batch["o_custkey"].to_numpy(zero_copy_only=False),
                "prio": batch["o_orderpriority"].to_pandas(),
            }
        )
        g = df.groupby(["o_custkey", "prio"], as_index=False).size()
        return pa.Table.from_pandas(
            g.rename(columns={"size": "n"}), preserve_index=False
        )

    cp = (
        read(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["o_custkey", "prio"])
        .aggregate(Sum("n", alias_name="n_orders"))
    )

    def per_cust_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "o_custkey": batch["o_custkey"].to_numpy(zero_copy_only=False),
                "n_orders": batch["n_orders"].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby("o_custkey", as_index=False).agg(
            n_prios=("n_orders", "size"), n_orders=("n_orders", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    # (cust, prio) rows are globally unique after the first fold, so the
    # per-customer count-distinct is a plain count; customers split
    # across blocks re-fold in the second groupby
    per_cust = (
        cp.map_batches(per_cust_partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(
            Sum("n_prios", alias_name="n_prios"),
            Sum("n_orders", alias_name="n_orders"),
        )
        .to_pandas()
    )
    # divisor cardinality: bounded priority domain
    n_divisor = int(
        cp.map_batches(
            lambda b: pa.table({"prio": pc_unique_strings(b["prio"])}),
            batch_format="pyarrow",
        )
        .groupby("prio")
        .count()
        .count()
    )
    out = per_cust[per_cust["n_prios"] == n_divisor][
        ["o_custkey", "n_orders"]
    ].astype("int64")
    return out.sort_values("o_custkey", ignore_index=True)


def pc_unique_strings(col) -> pa.Array:
    """Per-block unique of a string column (combiner before the tiny
    divisor-domain groupby)."""
    import pyarrow.compute as _pc

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return _pc.unique(arr)


def orders_range_frame_sum(
    sf_dir: str, window_days: int = 30
) -> ray.data.Dataset:
    """RANGE window frame (value-based, vs rolling_order_sum's ROWS
    frame): per customer, for each order, the exact-cents sum of
    o_totalprice over all orders dated within the preceding
    ``window_days`` INCLUDING every peer of the current date (SQL RANGE
    ... AND CURRENT ROW includes the full peer group — pinned in tests).
    Columns: o_orderkey, o_custkey, date_us, frame_sum_cents.

    Plan: customer-hash shard co-location, per-shard sort + two
    searchsorted probes against a per-customer segmented prefix sum — no
    pairwise expansion, no per-row loop."""

    def add_shard(batch: pa.Table) -> pa.Table:
        from .common import money_cents

        shard = (
            batch["o_custkey"].to_numpy() % np.int64(_N_SHARDS)
        ).astype("int32")
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "o_custkey": batch["o_custkey"],
                "date_us": batch["o_orderdate"]
                .cast(pa.timestamp("us"))
                .cast(pa.int64()),
                "cents": money_cents(
                    batch["o_totalprice"].to_numpy(zero_copy_only=False)
                ),
                "shard": pa.array(shard, type=pa.int32()),
            }
        )

    win_us = np.int64(window_days) * 86_400_000_000

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "date_us", "o_orderkey"],
                          ignore_index=True)
        cust = g["o_custkey"].to_numpy(np.int64)
        dus = g["date_us"].to_numpy(np.int64)
        cents = g["cents"].to_numpy(np.int64)
        n = len(g)
        starts = np.flatnonzero(np.r_[True, cust[1:] != cust[:-1]])
        seg_of = np.repeat(np.arange(len(starts)), np.diff(np.r_[starts, n]))
        pref = np.r_[0, np.cumsum(cents)]
        seg_start = starts[seg_of]
        seg_end = np.r_[starts[1:], n][seg_of]
        # frame = rows of the SAME customer with date in
        # [date_i - win, date_i] — including date ties AFTER row i
        # (RANGE ... CURRENT ROW spans the whole peer group)
        lo = np.empty(n, np.int64)
        hi = np.empty(n, np.int64)
        for s, e in zip(starts, np.r_[starts[1:], n]):
            d = dus[s:e]
            lo[s:e] = s + np.searchsorted(d, d - win_us, side="left")
            hi[s:e] = s + np.searchsorted(d, d, side="right")
        frame = pref[hi] - pref[lo]
        return pd.DataFrame(
            {
                "o_orderkey": g["o_orderkey"].to_numpy(np.int64),
                "o_custkey": cust,
                "date_us": dus,
                "frame_sum_cents": frame,
            }
        )

    out = (
        read(sf_dir, "orders",
             columns=["o_orderkey", "o_custkey", "o_orderdate",
                      "o_totalprice"])
        .map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(
            lambda g: per_shard(g.drop(columns=["shard"])),
            batch_format="pandas",
        )
    )
    return canonical_sort(out, ["o_orderkey"])
