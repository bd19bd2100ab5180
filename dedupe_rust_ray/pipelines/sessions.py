"""Session windows, range joins and funnels over the events log
(streaming-shaped workloads, SURVEY.md §2.8): Ray Data has no watermarks,
so ordered-within-key semantics are expressed as partition-by-key +
in-partition vectorized windowing — :func:`sessionize` (30-min inactivity
gap), :func:`events_range_join` (+/- 10-min band self-join), and
:func:`conversion_funnel` (ordered signup -> purchase sequence predicate).

Shard pattern: shuffle on ``user_id % n_shards`` (a user never spans
shards), process every user of the shard vectorized with pandas/numpy."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum

from .common import (
    canonical_sort,
    cents_to_money,
    join_partitions,
    money_cents,
    read,
    revenue_units,
    sorted_int_lookup,
    units_to_money,
)

_GAP = pd.Timedelta(minutes=30)
_N_SHARDS = 32


def sessionize(sf_dir: str) -> ray.data.Dataset:
    """Per-user session stats: n_sessions (30-min gap), n_events."""

    def add_shard(batch: pa.Table) -> pa.Table:
        shard = (
            batch["user_id"].to_numpy() % np.int64(_N_SHARDS)
        ).astype("int32")
        return batch.append_column("shard", pa.array(shard, type=pa.int32()))

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        prev = g.groupby("user_id")["ts"].shift()
        new_sess = prev.isna() | ((g["ts"] - prev) > _GAP)
        out = (
            pd.DataFrame({"user_id": g["user_id"], "new": new_sess})
            .groupby("user_id", as_index=False)
            .agg(n_sessions=("new", "sum"), n_events=("new", "size"))
        )
        return out.astype({"n_sessions": "int64", "n_events": "int64"})

    return canonical_sort(
        read(sf_dir, "events", columns=["user_id", "ts", "event_id"])
        .map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(
            lambda g: per_shard(g.drop(columns=["shard"])),
            batch_format="pandas",
        ),
        ["user_id"],
    )


def q3_shipping(sf_dir: str, segment: str = "BUILDING", k: int = 10) -> pd.DataFrame:
    """TPC-H Q3-shaped: top-``k`` orders by lineitem revenue for one
    customer segment.

    Physical plan: the segment's customer keys are a SMALL side ->
    broadcast semi-join filters orders; orders join lineitem with the
    partitioned hash join (``Dataset.join`` — both sides large at scale);
    revenue pre-aggregated per batch before the final groupby."""
    import pyarrow.compute as pc
    import ray

    cust = (
        read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
        .filter(expr=f"c_mktsegment == '{segment}'")
        .to_pandas()
    )
    # broadcast a SORTED int64 numpy array (one ray.put, ~8 B/key), probed
    # with searchsorted — never a Python set (multi-GB of boxed ints at
    # sf100) nor a per-row membership loop (the q5/q14 pattern)
    keys = ray.put(np.sort(cust["c_custkey"].to_numpy(np.int64)))

    class FilterOrders:
        def __init__(self, ref):
            self.keys = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            probe = batch["o_custkey"].to_numpy(zero_copy_only=False)
            _, found = sorted_int_lookup(self.keys, self.keys, probe)
            return batch.filter(pa.array(found))

    orders = (
        read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])
        .map_batches(FilterOrders, fn_constructor_args=(keys,),
                     batch_format="pyarrow", concurrency=(1, 4))
        .select_columns(["o_orderkey", "o_orderdate"])
    )
    lineitem = read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"]
    )

    def revenue_partial(batch: pa.Table) -> pa.Table:
        # exact int64 1e-4-dollar units (common.revenue_units): float
        # partials re-rounded later flip cents with accumulation order
        rev = revenue_units(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False),
            batch["l_discount"].to_numpy(zero_copy_only=False),
        )
        t = pa.table(
            {
                "l_orderkey": batch["l_orderkey"],
                "rev": pa.array(rev, type=pa.int64()),
            }
        )
        return (
            t.group_by("l_orderkey")
            .aggregate([("rev", "sum")])
            .rename_columns(["l_orderkey", "rev"])
        )

    li_partial = lineitem.map_batches(
        revenue_partial, batch_format="pyarrow", batch_size=65536
    )
    joined = orders.join(
        li_partial,
        join_type="inner",
        num_partitions=join_partitions(),
        on=("o_orderkey",),
        right_on=("l_orderkey",),
    )
    def to_money(batch: pa.Table) -> pa.Table:
        # round BEFORE the top-k sort: the oracle orders by the rounded
        # alias, and unit-level ties must break on o_orderkey, not units
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "revenue": pa.array(
                    units_to_money(
                        batch["revenue"].to_numpy(zero_copy_only=False)
                    )
                ),
            }
        )

    top = canonical_sort(
        joined.groupby("o_orderkey")
        .aggregate(Sum("rev", alias_name="revenue"))
        .map_batches(to_money, batch_format="pyarrow"),
        ["revenue", "o_orderkey"],
        descending=[True, False],
    ).limit(k).to_pandas()
    return top[["o_orderkey", "revenue"]]


def events_range_join(
    sf_dir: str, window_minutes: int = 10, anchor_type: str = "purchase"
) -> ray.data.Dataset:
    """Interval/range join: every ``anchor_type`` event joined to all OTHER
    events of the same user whose timestamp falls within +/- ``window_minutes``
    of it — the band-join shape (``e.ts BETWEEN p.ts - w AND p.ts + w``)
    that equality-keyed shuffles can't express directly.

    Plan (the range-join-by-partition idiom): shuffle once on
    ``user_id % n_shards`` so a user never spans tasks, then inside each
    shard the per-user event lists are sorted by ts and every anchor
    resolves its window with two vectorized ``searchsorted`` calls plus a
    prefix-sum subtraction for the value sum — O((n + a) log n) per user,
    no pairwise expansion, no per-row loop (the per-USER loop is over
    bounded segments, each fully vectorized, matching the as-of join's
    shard kernel). A skewed user is one large sorted segment, never an
    all-pairs blowup."""
    w = np.timedelta64(window_minutes * 60 * 1_000_000_000, "ns")

    def add_shard(batch: pa.Table) -> pa.Table:
        shard = (
            batch["user_id"].to_numpy() % np.int64(_N_SHARDS)
        ).astype("int32")
        return batch.append_column("shard", pa.array(shard, type=pa.int32()))

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], ignore_index=True)
        ts = g["ts"].to_numpy(dtype="datetime64[ns]")
        # exact integer cents: the windowed sum is a prefix-sum
        # SUBTRACTION, where float cancellation error exceeds a plain
        # sum's — integers make it exact and order-free
        val = money_cents(g["value"].to_numpy(np.float64))
        uid = g["user_id"].to_numpy(np.int64)
        etype = g["event_type"].to_numpy(dtype=object)
        eid = g["event_id"].to_numpy(np.int64)
        out_id, out_uid, out_n, out_v = [], [], [], []
        bounds = np.flatnonzero(np.diff(uid)) + 1
        for s, e in zip(
            np.append(0, bounds), np.append(bounds, len(uid))
        ):
            u_ts, u_val = ts[s:e], val[s:e]
            cum = np.append(np.int64(0), np.cumsum(u_val))
            anchor = np.flatnonzero(etype[s:e] == anchor_type)
            if not len(anchor):
                continue
            at = u_ts[anchor]
            lo = np.searchsorted(u_ts, at - w, side="left")
            hi = np.searchsorted(u_ts, at + w, side="right")
            out_id.append(eid[s:e][anchor])
            out_uid.append(np.full(len(anchor), uid[s], dtype=np.int64))
            out_n.append(hi - lo - 1)  # the anchor itself is in-window
            out_v.append(cum[hi] - cum[lo] - u_val[anchor])
        if not out_id:
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype="int64"),
                    "user_id": pd.Series([], dtype="int64"),
                    "n_nearby": pd.Series([], dtype="int64"),
                    "nearby_value": pd.Series([], dtype="float64"),
                }
            )
        nearby = np.concatenate(out_v)
        return pd.DataFrame(
            {
                "event_id": np.concatenate(out_id),
                "user_id": np.concatenate(out_uid),
                "n_nearby": np.concatenate(out_n).astype(np.int64),
                "nearby_value": cents_to_money(nearby),
            }
        )

    out = (
        read(
            sf_dir,
            "events",
            columns=["event_id", "ts", "user_id", "event_type", "value"],
        )
        .map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(
            lambda g: per_shard(g.drop(columns=["shard"])),
            batch_format="pandas",
        )
    )
    from .common import canonical_sort

    return canonical_sort(out, ["event_id"])


def conversion_funnel(sf_dir: str) -> pd.DataFrame:
    """Ordered-sequence funnel over the events log: how many users have a
    'signup' event, and how many of those convert — a 'purchase' at or
    after their FIRST signup. The sequence predicate (ordering within a
    key) is what plain joins can't express; it reduces to two per-user
    timestamps.

    Plan: one vectorized map pass computes per-batch per-user partials
    (min signup ts, max purchase ts, any flags), one small user-domain
    groupby folds them, and the funnel is three counters over that
    bounded table."""
    from ray.data.aggregate import Max, Min

    # membership is decided by explicit has-flags aggregated with Max —
    # the int64-extreme sentinels below only pad min/max inputs and can
    # never classify a user (a real timestamp at the int64 bound is NaT)
    hi = np.iinfo(np.int64).max
    lo = np.iinfo(np.int64).min + 1

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        is_s = (batch["event_type"] == "signup").to_numpy()
        is_p = (batch["event_type"] == "purchase").to_numpy()
        ns = batch["ts"].astype("datetime64[ns]").astype("int64").to_numpy()
        df = pd.DataFrame(
            {
                "user_id": batch["user_id"].to_numpy(np.int64),
                "s_ns": np.where(is_s, ns, hi),
                "p_ns": np.where(is_p, ns, lo),
                "has_s": is_s.astype(np.int64),
                "has_p": is_p.astype(np.int64),
            }
        )
        return df.groupby("user_id", as_index=False).agg(
            first_signup=("s_ns", "min"),
            last_purchase=("p_ns", "max"),
            has_s=("has_s", "max"),
            has_p=("has_p", "max"),
        )

    per_user = (
        read(sf_dir, "events", columns=["user_id", "ts", "event_type"])
        .map_batches(partial, batch_format="pandas")
        .groupby("user_id")
        .aggregate(
            Min("first_signup", alias_name="first_signup"),
            Max("last_purchase", alias_name="last_purchase"),
            Max("has_s", alias_name="has_s"),
            Max("has_p", alias_name="has_p"),
        )
        .to_pandas()  # user-domain: bounded
    )
    signed = per_user["has_s"] == 1
    converted = (
        signed
        & (per_user["has_p"] == 1)
        & (per_user["last_purchase"] >= per_user["first_signup"])
    )
    n_users = len(per_user)
    n_signup = int(signed.sum())
    n_converted = int(converted.sum())
    rate = (
        np.floor(n_converted / n_signup * 1e4 + 0.5) / 1e4 if n_signup else 0.0
    )
    return pd.DataFrame(
        {
            "n_users": [n_users],
            "n_signup": [n_signup],
            "n_converted": [n_converted],
            "conv_rate": [rate],
        }
    )


def _user_type_activity(sf_dir: str) -> ray.data.Dataset:
    """Shared fold behind the temporal set-operation family
    (:func:`user_churn` EXCEPT, :func:`user_retention_intersect`
    INTERSECT): per-(user_id, event_type) event counts on each side of
    the 90% time cutoff.

    Pass 1 folds the global time bounds (two int64 scalars from
    per-block partials).  Pass 2 emits per-batch per-(user, type)
    activity partials; ONE bounded-domain groupby sums them — no join,
    no second scan of the fact table carrying payload.  The cutoff
    arithmetic is exact integer microseconds, mirrored verbatim by the
    SQL oracles (no float timestamp math on either side)."""
    from ray.data.aggregate import Max, Min

    ev = read(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def ts_us(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"us": batch["ts"].cast(pa.timestamp("us")).cast(pa.int64())}
        )

    b = ev.map_batches(ts_us, batch_format="pyarrow").aggregate(
        Min("us"), Max("us")
    )
    lo, hi = int(b["min(us)"]), int(b["max(us)"])
    cutoff = lo + (hi - lo) * 9 // 10

    def partial(batch: pa.Table) -> pa.Table:
        us = (
            batch["ts"]
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        first = us < cutoff
        df = pd.DataFrame(
            {
                "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
                "event_type": batch["event_type"].to_pandas(),
                "n_first": first.astype(np.int64),
                "n_second": (~first).astype(np.int64),
            }
        )
        g = df.groupby(["user_id", "event_type"], as_index=False).agg(
            {"n_first": "sum", "n_second": "sum"}
        )
        return pa.table(
            {
                "user_id": pa.array(g["user_id"].to_numpy(np.int64)),
                "event_type": pa.array(g["event_type"], pa.string()),
                "n_first": pa.array(g["n_first"].to_numpy(np.int64)),
                "n_second": pa.array(g["n_second"].to_numpy(np.int64)),
            }
        )

    return (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby(["user_id", "event_type"])
        .aggregate(
            Sum("n_first", alias_name="n_first"),
            Sum("n_second", alias_name="n_second"),
        )
    )


def user_churn(sf_dir: str) -> ray.data.Dataset:
    """Temporal set-difference (the EXCEPT / churn shape): (user_id,
    event_type) pairs active in the first 90% of the event-log time range
    with NO event of that type in the final 10% — "behavior the user
    stopped doing".  The reference has no temporal operators; this is the
    retention-analysis companion to :func:`conversion_funnel`.  Plan in
    :func:`_user_type_activity`; the anti condition is one vectorized
    filter over the bounded-domain fold."""

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = pc.and_(
            pc.greater(batch["n_first"], 0), pc.equal(batch["n_second"], 0)
        )
        t = batch.filter(m)
        return pa.table(
            {
                "user_id": t["user_id"],
                "event_type": t["event_type"],
                "n_events_first": t["n_first"],
            }
        )

    return canonical_sort(
        _user_type_activity(sf_dir).map_batches(keep, batch_format="pyarrow"),
        ["user_id", "event_type"],
    )


def user_retention_intersect(sf_dir: str) -> ray.data.Dataset:
    """Temporal INTERSECT (the retention complement of
    :func:`user_churn`'s EXCEPT): (user_id, event_type) pairs active in
    BOTH the first 90% and the final 10% of the event-log time range —
    "behavior the user kept doing" — with the count on each side.  Same
    bounded-domain fold (:func:`_user_type_activity`), different
    vectorized filter."""

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = pc.and_(
            pc.greater(batch["n_first"], 0), pc.greater(batch["n_second"], 0)
        )
        t = batch.filter(m)
        return pa.table(
            {
                "user_id": t["user_id"],
                "event_type": t["event_type"],
                "n_events_first": t["n_first"],
                "n_events_second": t["n_second"],
            }
        )

    return canonical_sort(
        _user_type_activity(sf_dir).map_batches(keep, batch_format="pyarrow"),
        ["user_id", "event_type"],
    )


def event_gap_stats(sf_dir: str) -> ray.data.Dataset:
    """Per-user LAG-window statistics: the gap (µs) between consecutive
    events of a user ordered by (ts, event_id) — n_gaps / max / sum plus
    the count of "rapid" gaps under 60 s (the bot-burst signal).  Users
    with a single event have no gap and drop out (SQL LAG semantics).

    Plan: shard on ``user_id % n_shards`` (a user never spans shards),
    one vectorized in-shard sort + diff; every output is an exact int64
    so the value hash is stable by construction."""

    def add_shard(batch: pa.Table) -> pa.Table:
        shard = (
            batch["user_id"].to_numpy() % np.int64(_N_SHARDS)
        ).astype("int32")
        return pa.table(
            {
                "user_id": batch["user_id"],
                "us": batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
                "event_id": batch["event_id"],
                "shard": pa.array(shard, type=pa.int32()),
            }
        )

    _EMPTY = {
        "user_id": pd.Series([], dtype="int64"),
        "n_gaps": pd.Series([], dtype="int64"),
        "max_gap_us": pd.Series([], dtype="int64"),
        "sum_gap_us": pd.Series([], dtype="int64"),
        "n_rapid": pd.Series([], dtype="int64"),
    }

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "us", "event_id"], ignore_index=True)
        uid = g["user_id"].to_numpy(np.int64)
        us = g["us"].to_numpy(np.int64)
        if len(uid) < 2:
            return pd.DataFrame(_EMPTY)
        gap = np.diff(us)
        same = uid[1:] == uid[:-1]  # a gap exists only within one user
        gu, gv = uid[1:][same], gap[same]
        if not len(gv):
            return pd.DataFrame(_EMPTY)
        df = pd.DataFrame(
            {
                "user_id": gu,
                "gap": gv,
                "rapid": (gv < 60_000_000).astype(np.int64),
            }
        )
        out = df.groupby("user_id", as_index=False).agg(
            n_gaps=("gap", "size"),
            max_gap_us=("gap", "max"),
            sum_gap_us=("gap", "sum"),
            n_rapid=("rapid", "sum"),
        )
        return out.astype(
            {
                "n_gaps": "int64",
                "max_gap_us": "int64",
                "sum_gap_us": "int64",
                "n_rapid": "int64",
            }
        )

    out = (
        read(sf_dir, "events", columns=["user_id", "ts", "event_id"])
        .map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(
            lambda g: per_shard(g.drop(columns=["shard"])),
            batch_format="pandas",
        )
    )
    return canonical_sort(out, ["user_id"])


def event_transitions(sf_dir: str) -> ray.data.Dataset:
    """Per-user sequential bigram census: for every consecutive pair of
    events of a user (ordered by ts, event_id), count the
    (prev_type -> event_type) transition and the number of distinct
    users that ever make it — the Markov-transition / session-flow
    analytic (LAG over a partition, then a census of the lagged pairs).

    Plan: shard on ``user_id % n_shards`` exactly like
    ``event_gap_stats`` (a user never spans shards), one vectorized
    in-shard sort + shift, then a per-shard combiner that folds each
    shard to at most |event_type|^2 partial rows (n_pairs plus exact
    distinct-user counts — distinctness is resolvable inside the shard
    because the shard owns the whole user) before a tiny groupby-sum
    over the bounded transition domain."""

    def add_shard(batch: pa.Table) -> pa.Table:
        shard = (
            batch["user_id"].to_numpy() % np.int64(_N_SHARDS)
        ).astype("int32")
        return pa.table(
            {
                "user_id": batch["user_id"],
                "us": batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
                "event_id": batch["event_id"],
                "event_type": batch["event_type"],
                "shard": pa.array(shard, type=pa.int32()),
            }
        )

    _EMPTY = pd.DataFrame(
        {
            "prev_type": pd.Series([], dtype="object"),
            "event_type": pd.Series([], dtype="object"),
            "n_pairs": pd.Series([], dtype="int64"),
            "n_users": pd.Series([], dtype="int64"),
        }
    )

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "us", "event_id"], ignore_index=True)
        uid = g["user_id"].to_numpy(np.int64)
        if len(uid) < 2:
            return _EMPTY.copy()
        et = g["event_type"].to_numpy()
        same = uid[1:] == uid[:-1]
        if not same.any():
            return _EMPTY.copy()
        df = pd.DataFrame(
            {
                "prev_type": et[:-1][same],
                "event_type": et[1:][same],
                "user_id": uid[1:][same],
            }
        )
        out = df.groupby(["prev_type", "event_type"], as_index=False).agg(
            n_pairs=("user_id", "size"), n_users=("user_id", "nunique")
        )
        return out.astype({"n_pairs": "int64", "n_users": "int64"})

    out = (
        read(sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type"])
        .map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(
            lambda g: per_shard(g.drop(columns=["shard"])),
            batch_format="pandas",
        )
        .groupby(["prev_type", "event_type"])
        .aggregate(
            Sum("n_pairs", alias_name="n_pairs"),
            Sum("n_users", alias_name="n_users"),
        )
    )
    return canonical_sort(out, ["prev_type", "event_type"])


def retention_cohorts(sf_dir: str) -> ray.data.Dataset:
    """Cohort-retention matrix WITHOUT a self-join: customers are
    cohorted by the quarter of their FIRST order; each (cohort_q,
    order_q) cell counts the distinct customers of that cohort who
    ordered in that quarter (cohort_q <= order_q by construction; the
    diagonal is the cohort size).

    The textbook SQL is a window MIN + self-join back; at scale that is
    an SF-sized shuffle of the fact table twice.  Here: shard on
    ``o_custkey % n_shards`` (a customer never spans shards), fold each
    shard to its distinct (customer, quarter) set vectorized, take the
    per-customer min quarter inside the shard, and emit bounded
    (cohort_q, order_q) partial counts — the only exchange is the tiny
    census groupby over |quarters|^2/2 cells."""

    def add_shard(batch: pa.Table) -> pa.Table:
        d = batch["o_orderdate"].cast(pa.timestamp("us")).to_pandas()
        q = (d.dt.year * 10 + d.dt.quarter).to_numpy(np.int64)
        cust = batch["o_custkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "cust": pa.array(cust, type=pa.int64()),
                "q": pa.array(q, type=pa.int64()),
                "shard": pa.array(
                    (cust % np.int64(_N_SHARDS)).astype("int32")
                ),
            }
        )

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        cq = np.unique(
            np.stack(
                [g["cust"].to_numpy(np.int64), g["q"].to_numpy(np.int64)],
                axis=1,
            ),
            axis=0,
        )  # distinct (customer, quarter), sorted -> first row per cust
        cust, q = cq[:, 0], cq[:, 1]
        first = np.r_[True, cust[1:] != cust[:-1]]
        # gather each row's cohort = the quarter at its customer's FIRST
        # row (rows are (cust, q)-sorted, so that is the min quarter)
        cohort = q[np.maximum.accumulate(np.where(first, np.arange(len(q)), 0))]
        df = pd.DataFrame({"cohort_q": cohort, "order_q": q})
        out = df.groupby(["cohort_q", "order_q"], as_index=False).size()
        return out.rename(columns={"size": "n_customers"}).astype(
            {"cohort_q": "int64", "order_q": "int64", "n_customers": "int64"}
        )

    out = (
        read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])
        .map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(
            lambda g: per_shard(g.drop(columns=["shard"])),
            batch_format="pandas",
        )
        .groupby(["cohort_q", "order_q"])
        .aggregate(Sum("n_customers", alias_name="n_customers"))
    )
    return canonical_sort(out, ["cohort_q", "order_q"])


def session_spans(sf_dir: str) -> ray.data.Dataset:
    """Gaps-and-islands as INTERVALS: each user's event stream splits at
    >30-min silences into sessions, and each session is emitted as a row
    (user_id, session_idx, start_us, end_us, n_events) — the output
    shape behind session-replay, billing windows and uptime reports
    (:func:`sessionize` only counts the islands; this materializes
    them).

    Plan: identical sharding to ``sessionize`` (``user_id % n_shards``,
    a user never spans shards) so the break/cumsum/extent logic is one
    vectorized in-shard pass; output rows are one per SESSION, already
    far smaller than the input, and the final canonical sort is the
    only exchange."""

    def add_shard(batch: pa.Table) -> pa.Table:
        shard = (
            batch["user_id"].to_numpy() % np.int64(_N_SHARDS)
        ).astype("int32")
        return pa.table(
            {
                "user_id": batch["user_id"],
                "us": batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
                "event_id": batch["event_id"],
                "shard": pa.array(shard, type=pa.int32()),
            }
        )

    gap_us = np.int64(_GAP.value // 1_000)  # pd.Timedelta ns -> us

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "us", "event_id"], ignore_index=True)
        uid = g["user_id"].to_numpy(np.int64)
        us = g["us"].to_numpy(np.int64)
        first = np.r_[True, uid[1:] != uid[:-1]]
        brk = first | np.r_[False, (us[1:] - us[:-1]) > gap_us]
        sid = np.cumsum(brk)  # global session id within the shard
        d = pd.DataFrame({"user_id": uid, "sid": sid, "us": us})
        out = d.groupby(["user_id", "sid"], as_index=False).agg(
            start_us=("us", "min"),
            end_us=("us", "max"),
            n_events=("us", "size"),
        )
        # sid is already time-ordered per user -> 0-based session index
        out["session_idx"] = out.groupby("user_id").cumcount()
        return out[
            ["user_id", "session_idx", "start_us", "end_us", "n_events"]
        ].astype(
            {
                "session_idx": "int64",
                "start_us": "int64",
                "end_us": "int64",
                "n_events": "int64",
            }
        )

    out = (
        read(sf_dir, "events", columns=["user_id", "ts", "event_id"])
        .map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(
            lambda g: per_shard(g.drop(columns=["shard"])),
            batch_format="pandas",
        )
    )
    return canonical_sort(out, ["user_id", "session_idx"])


def user_behavior_entropy(
    sf_dir: str, events: "ray.data.Dataset | None" = None
) -> ray.data.Dataset:
    """Per-user Shannon entropy of the event-type distribution — the
    behavioral-diversity statistic next to event_transitions' Markov
    census (uniform clickers score ln(5), single-action bots score 0).

    Scale plan: per-batch (user, type, n) combiner partials -> one
    groupby over the bounded (user x |types|) domain -> per-user fold of
    at most |types| rows inside `map_groups`. The entropy itself is a
    <=|types|-term float64 sum over EXACT integer counts, floor-rounded
    to 4 decimals on both sides (the value_quantiles_dd convention: the
    rounding absorbs sub-ulp cross-engine summation differences)."""

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "user_id": batch["user_id"].to_numpy(),
                "event_type": batch["event_type"].to_pandas(),
            }
        )
        g = df.groupby(["user_id", "event_type"], as_index=False).size()
        return pa.table(
            {
                "user_id": pa.array(g["user_id"].to_numpy(np.int64)),
                "event_type": pa.array(g["event_type"], type=pa.string()),
                "n": pa.array(g["size"].to_numpy(np.int64)),
            }
        )

    def entropy(g: pd.DataFrame) -> pd.DataFrame:
        c = g["n"].to_numpy(np.float64)
        # deterministic term order: sort by event_type so both the Ray
        # fold and any replica sum in one canonical order
        c = c[np.argsort(g["event_type"].to_numpy())]
        total = c.sum()
        p = c / total
        h = float(-(p * np.log(p)).sum())
        return pd.DataFrame(
            {
                "user_id": [int(g["user_id"].iloc[0])],
                "n_events": [int(total)],
                "entropy": [np.floor(h * 10000 + 0.5) / 10000],
            }
        )

    ds = (
        events
        if events is not None
        else read(sf_dir, "events", columns=["user_id", "event_type"])
    )
    return canonical_sort(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["user_id", "event_type"])
        .aggregate(Sum("n", alias_name="n"))
        .groupby("user_id")
        .map_groups(entropy, batch_format="pandas"),
        ["user_id"],
    )


def events_debounce(
    sf_dir: str, min_gap_us: int = 3_600_000_000
) -> ray.data.Dataset:
    """Streaming-dedup filter (debounce): drop every event that follows
    another event of the SAME (user, event_type) key by less than
    ``min_gap_us`` — LAG semantics (each row compares to its immediate
    predecessor in (ts, event_id) order), the rapid-fire/bot-burst
    suppressor next to event_gap_stats' census of the same signal.
    Columns: event_id, user_id, event_type, ts_us (exact int64 µs).

    Plan: user-hash shard co-location, ONE vectorized in-shard sort +
    shifted compare per shard — no per-row state machine, no window
    exchange beyond the shard groupby."""

    def add_shard(batch: pa.Table) -> pa.Table:
        shard = (
            batch["user_id"].to_numpy() % np.int64(_N_SHARDS)
        ).astype("int32")
        return pa.table(
            {
                "event_id": batch["event_id"],
                "user_id": batch["user_id"],
                "event_type": batch["event_type"],
                "us": batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
                "shard": pa.array(shard, type=pa.int32()),
            }
        )

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["user_id", "event_type", "us", "event_id"], ignore_index=True
        )
        uid = g["user_id"].to_numpy(np.int64)
        et = g["event_type"].to_numpy()
        us = g["us"].to_numpy(np.int64)
        keep = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            same = (uid[1:] == uid[:-1]) & (et[1:] == et[:-1])
            keep[1:] = ~same | (us[1:] - us[:-1] >= min_gap_us)
        out = g.loc[keep, ["event_id", "user_id", "event_type", "us"]]
        return out.rename(columns={"us": "ts_us"}).reset_index(drop=True)

    out = (
        read(sf_dir, "events", columns=["event_id", "user_id", "event_type", "ts"])
        .map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(
            lambda g: per_shard(g.drop(columns=["shard"])),
            batch_format="pandas",
        )
    )
    return canonical_sort(out, ["event_id"])


def top_event_paths(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Sequential-pattern mining: the top-``k`` most common consecutive
    event-type TRIGRAM paths per user (path/journey analysis — the
    3-step extension of event_transitions' Markov bigrams). Columns:
    t1, t2, t3, n; ordered by n desc then path.

    Plan: user-hash shard co-location, one vectorized sort + double-shift
    per shard emitting a BOUNDED census partial (|event_types|³ cells at
    most), one tiny groupby fold, driver top-k over the bounded domain."""
    from ray.data.aggregate import Sum

    def add_shard(batch: pa.Table) -> pa.Table:
        shard = (
            batch["user_id"].to_numpy() % np.int64(_N_SHARDS)
        ).astype("int32")
        return pa.table(
            {
                "user_id": batch["user_id"],
                "event_type": batch["event_type"],
                "us": batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
                "event_id": batch["event_id"],
                "shard": pa.array(shard, type=pa.int32()),
            }
        )

    _EMPTY = pd.DataFrame(
        {
            "t1": pd.Series([], dtype="object"),
            "t2": pd.Series([], dtype="object"),
            "t3": pd.Series([], dtype="object"),
            "n": pd.Series([], dtype="int64"),
        }
    )

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "us", "event_id"], ignore_index=True)
        if len(g) < 3:
            return _EMPTY
        uid = g["user_id"].to_numpy(np.int64)
        et = g["event_type"].to_numpy()
        same = (uid[2:] == uid[:-2])  # triple stays within one user
        df = pd.DataFrame(
            {"t1": et[:-2][same], "t2": et[1:-1][same], "t3": et[2:][same]}
        )
        if df.empty:
            return _EMPTY
        out = df.groupby(["t1", "t2", "t3"], as_index=False).size()
        return out.rename(columns={"size": "n"}).astype({"n": "int64"})

    census = (
        read(sf_dir, "events", columns=["user_id", "event_type", "ts", "event_id"])
        .map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(
            lambda g: per_shard(g.drop(columns=["shard"])),
            batch_format="pandas",
        )
        .groupby(["t1", "t2", "t3"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # bounded: |event_types|^3 cells
    )
    return (
        census.astype({"n": "int64"})
        .sort_values(
            ["n", "t1", "t2", "t3"],
            ascending=[False, True, True, True],
            ignore_index=True,
        )
        .head(k)
    )
