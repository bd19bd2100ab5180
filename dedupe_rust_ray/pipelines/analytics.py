"""SQL-checkable analytics pipelines over the driver's flat tables.

These cover the reference's grouping / census / summary operators
(SURVEY.md §2: S3 extension census, G1/G2/G5 group-bys, G6 summary
aggregates, O2/O3 deterministic sorts) re-expressed over the driver's
testdata tables, plus join / sort / limit / windowed-aggregate coverage.

Scale pattern used throughout: **pre-aggregate inside map_batches** (one
partial row per key per batch) so the global groupby shuffles partials,
not rows — the combiner structure of the reference's rayon
fold/reduce (/root/reference/src/main.rs:393-412).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from ..functions.hashing import stable_hash64
from .common import (
    canonical_sort,
    cents_to_money,
    money_cents,
    read,
    revenue_units,
    units_to_money,
)


def _h64_as_i64(batch: pa.Table) -> np.ndarray:
    """64-bit text hash, bit-cast uint64 -> int64 (bijective group key).

    Ray's groupby combine rebuilds blocks from Python ints with an
    inferred int64 type; uint64 keys above 2^63 overflow there and the
    block silently degrades to pickled objects (slow path). Keeping the
    key in int64 range preserves Arrow blocks end to end."""
    return np.asarray(stable_hash64(batch["text"].to_pylist()), dtype=np.uint64).view(np.int64)


def census_by_lang(sf_dir: str) -> ray.data.Dataset:
    """Per-language document counts, count desc then lang asc
    (reference extension census + its sort, src/main.rs:165-182)."""

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.group_by("lang").aggregate([("lang", "count")])
        return t.rename_columns(["lang", "partial"])

    out = (
        read(sf_dir, "documents", columns=["lang"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("partial", alias_name="n"))
    )
    return canonical_sort(out, ["n", "lang"], descending=[True, False])


def census_by_source(sf_dir: str) -> ray.data.Dataset:
    def partial(batch: pa.Table) -> pa.Table:
        t = batch.group_by("source").aggregate([("source", "count")])
        return t.rename_columns(["source", "partial"])

    return canonical_sort(
        read(sf_dir, "documents", columns=["source"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("partial", alias_name="n")),
        ["n", "source"],
        descending=[True, False],
    )


def summary_stats(sf_dir: str) -> pd.DataFrame:
    """Global corpus summary (reference summary block, src/main.rs:353-361):
    total docs, distinct texts, docs-in-duplicate-groups, duplicate groups,
    unique = total - (in_groups - n_groups)."""
    ds = read(sf_dir, "documents", columns=["text"])

    def hash_batch(batch: pa.Table) -> pa.Table:
        return pa.table({"h": pa.array(_h64_as_i64(batch))})

    sizes = (
        ds.map_batches(hash_batch, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Count(alias_name="sz"))
    )
    df = sizes.to_pandas()
    total = int(df["sz"].sum())
    distinct = len(df)
    dup_groups = int((df["sz"] > 1).sum())
    in_groups = int(df.loc[df["sz"] > 1, "sz"].sum())
    unique = total - (in_groups - dup_groups)
    return pd.DataFrame(
        {
            "total_docs": [total],
            "distinct_texts": [distinct],
            "dup_groups": [dup_groups],
            "docs_in_dup_groups": [in_groups],
            "unique_docs": [unique],
        }
    )


def exact_dedup_first(sf_dir: str) -> ray.data.Dataset:
    """Exact text dedup, keep min(doc_id) per distinct text — the
    reference's phase-2 grouping (src/main.rs:616-633) on the flat table.

    Grouping key is the 64-bit stable hash of the text (collision odds
    ~n^2/2^64), so the shuffle moves 8-byte keys, never the text."""
    ds = read(sf_dir, "documents", columns=["doc_id", "text"])

    def hash_batch(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "h": pa.array(_h64_as_i64(batch)),
            }
        )

    out = (
        ds.map_batches(hash_batch, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Min("doc_id", alias_name="doc_id"))
        .select_columns(["doc_id"])
    )
    return canonical_sort(out, ["doc_id"])


def dup_group_sizes(sf_dir: str) -> ray.data.Dataset:
    """Distribution of exact-duplicate group sizes (how many groups of
    each size) — the shape of the reference's `total_groups` stat."""
    ds = read(sf_dir, "documents", columns=["text"])

    def hash_batch(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"h": pa.array(_h64_as_i64(batch))}
        )

    return canonical_sort(
        ds.map_batches(hash_batch, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Count(alias_name="group_size"))
        .groupby("group_size")
        .aggregate(Count(alias_name="n_groups")),
        ["group_size"],
    )


def doc_len_stats(sf_dir: str) -> ray.data.Dataset:
    """Per-language n_chars aggregates (sum/avg/min/max)."""
    out = canonical_sort(
        read(sf_dir, "documents", columns=["lang", "n_chars"])
        .groupby("lang")
        .aggregate(
            Sum("n_chars", alias_name="sum_chars"),
            Mean("n_chars", alias_name="avg_chars"),
            Min("n_chars", alias_name="min_chars"),
            Max("n_chars", alias_name="max_chars"),
        ),
        ["lang"],
    )

    def round_avg(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.column_names.index("avg_chars"),
            "avg_chars",
            pc.round(batch["avg_chars"], ndigits=4),
        )

    return out.map_batches(round_avg, batch_format="pyarrow")


def doc_len_quantiles(sf_dir: str, qs: tuple[float, ...] = (0.5, 0.9)) -> pd.DataFrame:
    """Exact per-language length percentiles (PERCENTILE_CONT semantics)
    computed by distributed histogram merge.

    Scale pattern: the value domain of ``n_chars`` is bounded, so each
    batch pre-aggregates to (lang, n_chars, count) partials, the global
    groupby shuffles only the distinct-domain histogram (thousands of
    rows regardless of corpus size), and the interpolated quantile is a
    driver-side cumsum over that SMALL merged histogram — never a sort
    or materialization of the raw column."""

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.group_by(["lang", "n_chars"]).aggregate([("n_chars", "count")])
        return t.rename_columns(["lang", "n_chars", "cnt"])

    hist = (
        read(sf_dir, "documents", columns=["lang", "n_chars"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "n_chars"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()  # merged histogram: distinct (lang, value) pairs only
    )

    rows = []
    for lang, g in hist.sort_values(["lang", "n_chars"]).groupby("lang"):
        vals = g["n_chars"].to_numpy()
        cum = g["cnt"].to_numpy().cumsum()
        n = int(cum[-1])
        row = {"lang": lang, "n": n}
        for q in qs:
            pos = q * (n - 1)
            r = int(pos)
            frac = pos - r
            v1 = vals[np.searchsorted(cum, r + 1)]
            v2 = vals[np.searchsorted(cum, min(r + 2, n))]
            row[f"p{int(q * 100)}"] = round(v1 + frac * (v2 - v1), 4)
        rows.append(row)
    out = pd.DataFrame(rows).sort_values("lang").reset_index(drop=True)
    return out[["lang", *(f"p{int(q * 100)}" for q in qs), "n"]]


def q1_pricing_summary(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q1-shaped pricing summary over lineitem (grouped aggregates
    with computed columns; vectorized pyarrow kernels)."""
    ds = read(
        sf_dir,
        "lineitem",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
        ],
    )

    def partial(batch: pa.Table) -> pa.Table:
        # combiner: one partial row per (flag, status) per batch, so the
        # groupby shuffles ~6 rows per batch instead of every lineitem row.
        # Money partials are EXACT int64 (cents / 1e-4 units): float
        # accumulation order varies with block layout and can flip the
        # final cent rounding (the round-3 q10 flake class).
        base_cents = money_cents(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        )
        disc_units = revenue_units(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False),
            batch["l_discount"].to_numpy(zero_copy_only=False),
        )
        t = pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "l_quantity": batch["l_quantity"],
                "base_cents": pa.array(base_cents, type=pa.int64()),
                "disc_units": pa.array(disc_units, type=pa.int64()),
            }
        )
        return t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [
                ("l_quantity", "sum"),
                ("base_cents", "sum"),
                ("disc_units", "sum"),
                ("l_quantity", "count"),
            ]
        ).rename_columns(
            [
                "l_returnflag",
                "l_linestatus",
                "sum_qty",
                "sum_base_price",
                "sum_disc_price",
                "count_order",
            ]
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_base_price", alias_name="sum_base_price"),
            Sum("sum_disc_price", alias_name="sum_disc_price"),
            Sum("count_order", alias_name="count_order"),
        )
    )
    out = canonical_sort(out, ["l_returnflag", "l_linestatus"])

    def finalize(batch: pa.Table) -> pa.Table:
        # avg_qty: FLOOR(x*100+0.5)/100 on the exact int-valued sums —
        # identical float ops on both the Ray and the oracle side
        sq = batch["sum_qty"].to_numpy(zero_copy_only=False)
        n = batch["count_order"].to_numpy(zero_copy_only=False)
        avg_qty = np.floor(sq / n * 100 + 0.5) / 100
        batch = batch.append_column("avg_qty", pa.array(avg_qty))
        batch = batch.set_column(
            batch.column_names.index("sum_base_price"),
            "sum_base_price",
            pa.array(
                cents_to_money(
                    batch["sum_base_price"].to_numpy(zero_copy_only=False)
                )
            ),
        )
        batch = batch.set_column(
            batch.column_names.index("sum_disc_price"),
            "sum_disc_price",
            pa.array(
                units_to_money(
                    batch["sum_disc_price"].to_numpy(zero_copy_only=False)
                )
            ),
        )
        return batch

    return out.map_batches(finalize, batch_format="pyarrow")


def top_customers(sf_dir: str) -> pd.DataFrame:
    """Top-10 customers by total order value — join + sort + limit.

    The customer dimension is the SMALL side: broadcast once with
    ``ray.put`` as SORTED numpy key/name arrays probed with searchsorted
    (no Python dict of boxed ints — SF-scaled and multi-GB per worker at
    warehouse scale — and no per-row loop), per the q5/q14 pattern."""
    cust = read(sf_dir, "customer", columns=["c_custkey", "c_name"]).to_pandas()
    ck = cust["c_custkey"].to_numpy(np.int64)
    order = np.argsort(ck)
    ref = ray.put((ck[order], cust["c_name"].to_numpy(dtype=object)[order]))

    def to_cents(batch: pa.Table) -> pa.Table:
        # exact integer cents: pc.round on a float sum does NOT snap to
        # the decimal grid (round-3 latent mismatch caught by the exact
        # local comparator) — sum integers, divide once
        return pa.table(
            {
                "o_custkey": batch["o_custkey"],
                "cents": pa.array(
                    money_cents(
                        batch["o_totalprice"].to_numpy(zero_copy_only=False)
                    ),
                    type=pa.int64(),
                ),
            }
        )

    per_cust = (
        read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
        .map_batches(to_cents, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("cents", alias_name="revenue"))
    )

    class AttachName:
        def __init__(self, ref):
            self.keys, self.names = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            from .common import sorted_int_lookup

            probe = batch["o_custkey"].to_numpy(zero_copy_only=False)
            names, found = sorted_int_lookup(self.keys, self.names, probe)
            names = np.where(found, names, "")
            return pa.table(
                {
                    "c_custkey": batch["o_custkey"],
                    "c_name": pa.array(names, type=pa.string()),
                    # exact cents -> one correctly-rounded float divide ==
                    # the oracle's ROUND(SUM(...), 2) on the grid value
                    "revenue": pa.array(
                        cents_to_money(
                            batch["revenue"].to_numpy(zero_copy_only=False)
                        )
                    ),
                }
            )

    top = canonical_sort(
        per_cust.map_batches(
            AttachName,
            fn_constructor_args=(ref,),
            batch_format="pyarrow",
            concurrency=(1, 4),
        ),
        ["revenue", "c_custkey"],
        descending=[True, False],
    ).limit(10)
    return top.to_pandas()


def events_hourly(sf_dir: str) -> ray.data.Dataset:
    """Tumbling-window aggregate: events per (event_type, hour) with
    count and sum(value) — the batch expression of a streaming window
    (SURVEY.md §2.8: Ray Data has no watermarks; hour-truncate + groupby
    reproduces a tumbling event-time window over a bounded log)."""
    ds = read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def derive(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch["ts"], unit="hour")
        return pa.table(
            {
                "event_type": batch["event_type"],
                "hour": hour,
                # exact integer cents (value is 2-decimal): order-free
                # summation; the final divide reproduces the oracle's
                # FLOOR(sum*1e4+0.5)/1e4 bitwise on the grid value
                "cents": pa.array(
                    money_cents(
                        batch["value"].to_numpy(zero_copy_only=False)
                    ),
                    type=pa.int64(),
                ),
            }
        )

    out = (
        ds.map_batches(derive, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(
            Count(alias_name="n_events"),
            Sum("cents", alias_name="sum_value"),
        )
    )
    out = canonical_sort(out, ["event_type", "hour"])

    def round_cols(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.column_names.index("sum_value"),
            "sum_value",
            pa.array(
                cents_to_money(
                    batch["sum_value"].to_numpy(zero_copy_only=False)
                )
            ),
        )

    return out.map_batches(round_cols, batch_format="pyarrow")


def q6_forecast_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q6-style filtered aggregate: predicate pushdown at the read
    (only 4 columns leave storage) + one partial sum per batch — the
    canonical filter->aggregate shape where the shuffle moves a single
    float per block."""
    ds = read(
        sf_dir,
        "lineitem",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        sd = batch["l_shipdate"]
        disc = batch["l_discount"]
        qty = batch["l_quantity"]
        mask = pc.and_(
            pc.and_(
                pc.greater_equal(sd, pa.scalar(pd.Timestamp("1996-01-01"))),
                pc.less(sd, pa.scalar(pd.Timestamp("1997-01-01"))),
            ),
            pc.and_(
                pc.and_(
                    pc.greater_equal(disc, pa.scalar(0.03)),
                    pc.less_equal(disc, pa.scalar(0.07)),
                ),
                pc.less(qty, pa.scalar(24.0)),
            ),
        )
        t = batch.filter(mask)
        # exact 1e-4-dollar units (price*disc: both 2-decimal) — order-free
        units = int(
            (
                money_cents(t["l_extendedprice"].to_numpy(zero_copy_only=False))
                * money_cents(t["l_discount"].to_numpy(zero_copy_only=False))
            ).sum()
        )
        return pa.table({"partial": pa.array([units], type=pa.int64())})

    total = (
        ds.map_batches(partial, batch_format="pyarrow")
        .aggregate(Sum("partial", alias_name="revenue"))
    )
    return pd.DataFrame(
        {"revenue": [float(units_to_money(total["revenue"]))]}
    )


def part_type_census(sf_dir: str) -> ray.data.Dataset:
    """Per (p_brand, p_type) part counts with summed retail price — the
    reference's census pattern over a second dimension table."""

    def partial(batch: pa.Table) -> pa.Table:
        # exact integer cents (order-free; see common.money_cents)
        batch = batch.set_column(
            batch.column_names.index("p_retailprice"),
            "p_retailprice",
            pa.array(
                money_cents(
                    batch["p_retailprice"].to_numpy(zero_copy_only=False)
                ),
                type=pa.int64(),
            ),
        )
        t = batch.group_by(["p_brand", "p_type"]).aggregate(
            [("p_partkey", "count"), ("p_retailprice", "sum")]
        )
        return t.rename_columns(["p_brand", "p_type", "n_part", "sum_price"])

    out = canonical_sort(
        read(sf_dir, "part", columns=["p_brand", "p_type", "p_partkey", "p_retailprice"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["p_brand", "p_type"])
        .aggregate(
            Sum("n_part", alias_name="n"),
            Sum("sum_price", alias_name="sum_price"),
        ),
        ["p_brand", "p_type"],
    )

    def finish(batch: pa.Table) -> pa.Table:
        # exact cents -> one correctly-rounded float divide == the
        # oracle's ROUND(SUM(p_retailprice), 2) on the grid value
        return pa.table(
            {
                "p_brand": batch["p_brand"],
                "p_type": batch["p_type"],
                "n": batch["n"],
                "sum_price": pa.array(
                    cents_to_money(
                        batch["sum_price"].to_numpy(zero_copy_only=False)
                    )
                ),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def q5_local_supplier_volume(
    sf_dir: str, broadcast_max_rows: int = 5_000_000
) -> pd.DataFrame:
    """TPC-H Q5-style six-table join: revenue per ASIA nation where the
    supplier and customer share the nation, for orders in 1996.

    Physical plan: the one genuinely large-x-large join
    (lineitem x date-filtered orders) is a hash `Dataset.join`. The
    customer/supplier sides are shipped as SORTED int64 numpy key/value
    arrays via one ``ray.put`` and probed with ``np.searchsorted`` per
    batch (no Python dicts, no per-row ``.map`` loop); each side falls
    back to a hash ``Dataset.join`` when it exceeds ``broadcast_max_rows``
    — customer scales with SF, so at warehouse scale the join leg takes
    over while the bounded nation/region dims stay broadcast. Revenue is
    pre-aggregated per batch so the final groupby moves one row per
    (batch, nation)."""
    import pyarrow.parquet as pq

    nation = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    region = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    asia_keys = region.loc[region["r_name"] == "ASIA", "r_regionkey"]
    asia_nations = nation[nation["n_regionkey"].isin(asia_keys)]
    nation_keys = asia_nations["n_nationkey"].to_numpy(np.int64)
    order_n = np.argsort(nation_keys)
    nation_keys = nation_keys[order_n]
    nation_names = asia_nations["n_name"].to_numpy(dtype=object)[order_n]

    def _sorted_side(table: str, key: str, val: str) -> tuple:
        # Ray scan, column-pruned, with the region filter applied in the
        # workers — the driver only ever holds the Asia-side arrays
        # (1/|regions| of the dimension), never the full table
        t = (
            read(sf_dir, table, columns=[key, val])
            .map_batches(
                lambda b, nk=nation_keys: b.filter(
                    pa.array(
                        np.isin(
                            b[val].to_numpy(zero_copy_only=False), nk
                        )
                    )
                ),
                batch_format="pyarrow",
            )
            .to_pandas()
        )
        k = t[key].to_numpy(np.int64)
        v = t[val].to_numpy(np.int64)
        o = np.argsort(k, kind="stable")
        return k[o], v[o]

    ckeys, cvals = _sorted_side("customer", "c_custkey", "c_nationkey")
    skeys, svals = _sorted_side("supplier", "s_suppkey", "s_nationkey")

    orders = read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def filter_orders(batch: pd.DataFrame) -> pd.DataFrame:
        m = (batch["o_orderdate"] >= pd.Timestamp("1996-01-01")) & (
            batch["o_orderdate"] < pd.Timestamp("1997-01-01")
        )
        out = batch.loc[m, ["o_orderkey", "o_custkey"]]
        return out.rename(columns={"o_orderkey": "l_orderkey"})

    orders_f = orders.map_batches(filter_orders, batch_format="pandas")

    lineitem = read(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:  # noqa: BLE001
        cpus = 8
    n_parts = max(4, min(16, cpus))
    joined = lineitem.join(
        orders_f,
        join_type="inner",
        num_partitions=n_parts,
        on=("l_orderkey",),
    )

    # ladder: broadcast sorted arrays below the ceiling, hash join above
    cust_bcast = len(ckeys) <= broadcast_max_rows
    supp_bcast = len(skeys) <= broadcast_max_rows
    ref = ray.put(
        (
            (ckeys, cvals) if cust_bcast else None,
            (skeys, svals) if supp_bcast else None,
            (nation_keys, nation_names),
        )
    )
    if not cust_bcast:
        cds = ray.data.from_arrow(
            pa.table({"o_custkey": ckeys, "c_nationkey": cvals})
        )
        joined = joined.join(
            cds, join_type="inner", num_partitions=n_parts, on=("o_custkey",)
        )
    if not supp_bcast:
        sds = ray.data.from_arrow(
            pa.table({"l_suppkey": skeys, "s_nationkey": svals})
        )
        joined = joined.join(
            sds, join_type="inner", num_partitions=n_parts, on=("l_suppkey",)
        )

    from .common import sorted_int_lookup as _lookup

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        cside, sside, (nkeys, nnames) = ray.get(ref)
        if cside is not None:
            cn, cfound = _lookup(
                cside[0], cside[1], batch["o_custkey"].to_numpy(np.int64)
            )
        else:
            cn = batch["c_nationkey"].to_numpy(np.int64)
            cfound = np.ones(len(cn), bool)
        if sside is not None:
            sn, sfound = _lookup(
                sside[0], sside[1], batch["l_suppkey"].to_numpy(np.int64)
            )
        else:
            sn = batch["s_nationkey"].to_numpy(np.int64)
            sfound = np.ones(len(sn), bool)
        keep = cfound & sfound & (cn == sn)
        if not keep.any():
            return pd.DataFrame({"n_name": pd.Series(dtype=object),
                                 "partial": pd.Series(dtype="int64")})
        # exact int64 1e-4-dollar units: order-free summation (see
        # common.revenue_units — the q10 cent-rounding flake class)
        rev = revenue_units(
            batch["l_extendedprice"].to_numpy(np.float64)[keep],
            batch["l_discount"].to_numpy(np.float64)[keep],
        )
        names, _ = _lookup(nkeys, nnames, cn[keep])
        out = (
            pd.DataFrame({"n_name": names, "rev": rev})
            .groupby("n_name", as_index=False)["rev"]
            .sum()
        )
        return out.rename(columns={"rev": "partial"})

    agg = (
        joined.map_batches(partial, batch_format="pandas")
        .groupby("n_name")
        .aggregate(Sum("partial", alias_name="revenue"))
        .to_pandas()
    )
    agg["revenue"] = units_to_money(agg["revenue"].to_numpy(np.int64))
    return agg.sort_values(
        ["revenue", "n_name"], ascending=[False, True], ignore_index=True
    )


def q14_promo_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q14-shaped promo-revenue share: percentage of 1996-H1
    lineitem revenue from PROMO-type parts.

    Plan: the part dimension reduces to a broadcast SORTED int64 array of
    promo part keys (one ``ray.put``, read per task — never re-shipped or
    re-converted per batch); lineitem streams through a filtered per-batch
    partial (promo revenue, total revenue) and one global sum finishes."""
    parts = read(sf_dir, "part", columns=["p_partkey", "p_type"]).to_pandas()
    promo_ref = ray.put(
        np.sort(
            parts.loc[parts["p_type"] == "PROMO", "p_partkey"].to_numpy(np.int64)
        )
    )

    def partial(batch: pa.Table) -> pa.Table:
        d = batch["l_shipdate"].to_numpy(zero_copy_only=False)
        lo = np.datetime64("1996-01-01")
        hi = np.datetime64("1996-07-01")
        keep = (d >= lo) & (d < hi)
        if not keep.any():
            return pa.table(
                {
                    "promo": pa.array([0], type=pa.int64()),
                    "total": pa.array([0], type=pa.int64()),
                }
            )
        promo_keys = ray.get(promo_ref)  # sorted int64 array, zero-copy
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False)[keep]
        # exact int64 1e-4-dollar units: the promo share divides two
        # order-free integer sums, so the 1e-4 rounding is deterministic
        rev = revenue_units(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)[keep],
            batch["l_discount"].to_numpy(zero_copy_only=False)[keep],
        )
        pos = np.searchsorted(promo_keys, pk)
        pos_c = np.minimum(pos, max(len(promo_keys) - 1, 0))
        is_promo = (
            promo_keys[pos_c] == pk
            if len(promo_keys)
            else np.zeros(len(pk), bool)
        )
        return pa.table(
            {
                "promo": pa.array([int(rev[is_promo].sum())], type=pa.int64()),
                "total": pa.array([int(rev.sum())], type=pa.int64()),
            }
        )

    agg = (
        read(
            sf_dir,
            "lineitem",
            columns=["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .sum(["promo", "total"])
    )
    share = 100.0 * agg["sum(promo)"] / agg["sum(total)"]
    return pd.DataFrame(
        {"promo_revenue_pct": [float(np.floor(share * 1e4 + 0.5) / 1e4)]}
    )


def events_sliding_window(sf_dir: str) -> ray.data.Dataset:
    """Sliding-window aggregate: per event_type, event count and value sum
    in 1-hour windows advancing every 15 minutes (each event lands in the
    4 windows covering it). Windows with zero events are not emitted.

    Plan: the x4 window expansion happens INSIDE the per-batch combiner
    (one partial row per (type, window) per batch rides the shuffle, not
    4 rows per event), then one groupby sums partials."""

    def partial(batch: pd.DataFrame) -> pa.Table:
        t15 = batch["ts"].dt.floor("15min")
        frames = []
        for k in range(4):
            frames.append(
                pd.DataFrame(
                    {
                        "event_type": batch["event_type"],
                        "win_start": t15 - pd.Timedelta(minutes=15 * k),
                        "value": batch["value"],
                    }
                )
            )
        x = pd.concat(frames, ignore_index=True)
        g = x.groupby(["event_type", "win_start"], as_index=False).agg(
            n=("value", "size"), sv=("value", "sum")
        )
        return pa.table(
            {
                "event_type": pa.array(g["event_type"], type=pa.string()),
                "win_start": pa.array(g["win_start"]),
                "n": pa.array(g["n"].to_numpy(np.int64)),
                "sv": pa.array(g["sv"].to_numpy()),
            }
        )

    ds = (
        read(sf_dir, "events", columns=["event_type", "ts", "value"])
        .map_batches(partial, batch_format="pandas")
        .groupby(["event_type", "win_start"])
        .aggregate(Sum("n", alias_name="n_events"), Sum("sv", alias_name="sv"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        sv = batch["sv"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": batch["event_type"],
                "win_start": batch["win_start"],
                "n_events": batch["n_events"],
                "sum_value": pa.array(np.floor(sv * 1e4 + 0.5) / 1e4),
            }
        )

    return canonical_sort(
        ds.map_batches(finish, batch_format="pyarrow"),
        ["event_type", "win_start"],
    )


def props_k_stats(sf_dir: str) -> ray.data.Dataset:
    """Semi-structured extraction: parse the JSON ``props`` payload column
    and aggregate the extracted field per event_type.

    Extraction is a vectorized regex over the string column (pandas
    ``str.extract`` — C regex, no per-row json.loads loop); per-batch
    moment partials ride the shuffle. The SQL oracle uses DuckDB's
    json_extract on the same column, cross-checking the parse."""

    def partial(batch: pd.DataFrame) -> pa.Table:
        k = (
            batch["props"]
            .str.extract(r'"k"\s*:\s*(-?\d+)', expand=False)
            .astype("float64")
        )
        df = pd.DataFrame({"event_type": batch["event_type"], "k": k})
        # n counts all rows; n_k counts rows where extraction succeeded —
        # avg_k divides by n_k so the semantics match SQL AVG (NULLs
        # ignored) even if the events generator ever emits malformed props
        g = df.groupby("event_type", as_index=False).agg(
            n=("k", "size"), n_k=("k", "count"), sum_k=("k", "sum")
        )
        return pa.table(
            {
                "event_type": pa.array(g["event_type"], type=pa.string()),
                "n": pa.array(g["n"].to_numpy(np.int64)),
                "n_k": pa.array(g["n_k"].to_numpy(np.int64)),
                "sum_k": pa.array(g["sum_k"].to_numpy()),
            }
        )

    ds = (
        read(sf_dir, "events", columns=["event_type", "props"])
        .map_batches(partial, batch_format="pandas")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("n_k", alias_name="n_k"),
            Sum("sum_k", alias_name="sum_k"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        n_k = batch["n_k"].to_numpy(zero_copy_only=False).astype(np.float64)
        sk = batch["sum_k"].to_numpy(zero_copy_only=False)
        avg = np.floor(sk / np.maximum(n_k, 1.0) * 1e4 + 0.5) / 1e4
        return pa.table(
            {
                "event_type": batch["event_type"],
                "n": batch["n"],
                "sum_k": pa.array(sk.astype(np.int64)),
                # all extractions failed -> NULL, matching SQL AVG over
                # an all-NULL group (not a fabricated 0.0)
                "avg_k": pa.array(avg, mask=(n_k == 0)),
            }
        )

    return canonical_sort(
        ds.map_batches(finish, batch_format="pyarrow"), ["event_type"]
    )


def spans_census(sf_dir: str) -> pd.DataFrame:
    """Census of the INTERLEAVED spans corpus (the input_hint schema):
    per span kind, the span count, the number of documents carrying the
    kind, and total text characters.

    This certifies the corpus BUILDER itself: `corpus_from_flat_documents`
    is deterministic arithmetic over the flat documents table (1-3 text
    thirds + 1 media span per doc, an extra near-dup copy every 10th doc,
    length-preserving edits), so the expected census is closed-form SQL
    over `documents` — a value oracle for the spans explosion the
    flagship consumes."""
    from ..sources.corpus import corpus_from_flat_documents

    corpus = corpus_from_flat_documents(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        spans = batch["spans"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = spans.flatten()
        off = spans.offsets.to_numpy().astype(np.int64)
        kinds = flat.field("kind").to_numpy(zero_copy_only=False)
        chars = pc.utf8_length(flat.field("text")).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        doc_of = np.repeat(np.arange(len(off) - 1), np.diff(off))
        rows = []
        for kind in ("media", "text"):
            m = kinds == kind
            rows.append(
                (
                    kind,
                    int(m.sum()),
                    int(len(np.unique(doc_of[m]))),
                    int(chars[m].sum()),
                )
            )
        return pa.table(
            {
                "kind": pa.array([r[0] for r in rows]),
                "n_spans": pa.array([r[1] for r in rows], type=pa.int64()),
                "n_docs": pa.array([r[2] for r in rows], type=pa.int64()),
                "total_chars": pa.array(
                    [r[3] for r in rows], type=pa.int64()
                ),
            }
        )

    agg = (
        corpus.map_batches(partial, batch_format="pyarrow")
        .groupby("kind")
        .aggregate(
            Sum("n_spans", alias_name="n_spans"),
            Sum("n_docs", alias_name="n_docs"),
            Sum("total_chars", alias_name="total_chars"),
        )
        .to_pandas()  # two rows
    )
    return agg.sort_values("kind", ignore_index=True).astype(
        {"n_spans": "int64", "n_docs": "int64", "total_chars": "int64"}
    )


def span_sequence_census(sf_dir: str) -> pd.DataFrame:
    """Per-document SPAN-SEQUENCE signature census of the interleaved
    corpus — the value oracle for the input_hint's per-row invariant
    (span-sequence equality: kind + order): for every document the
    operator checks, from the NESTED spans column itself, that span
    ``offset`` fields are exactly 0..n-1 in list order (``order_ok``)
    and that the kind sequence is text* plus ONE trailing media span
    (``media_last``), then folds a census by
    (n_text_spans, order_ok, media_last).

    The builder is deterministic arithmetic over the flat documents
    table — min(len(text), 3) non-empty text thirds + 1 media span, an
    extra structurally-identical near-dup every 10th doc — so the
    expected census is closed-form SQL over ``documents``, certifying
    span ORDER end to end where spans_census certifies per-kind totals.

    Scale: one vectorized reduceat pass per batch; the shuffle carries a
    bounded (n_text, order_ok, media_last) domain (≤ 4·2·2 rows per
    batch)."""
    from ..sources.corpus import corpus_from_flat_documents

    return span_sequence_census_of(corpus_from_flat_documents(sf_dir))


def span_sequence_census_of(corpus: ray.data.Dataset) -> pd.DataFrame:
    """Signature census over ANY spans corpus Dataset (doc_id, spans) —
    the detection kernel behind span_sequence_census; tests feed it
    hand-built corpora with violated order to pin that violations land
    in order_ok=0 / media_last=0 rows."""

    def partial(batch: pa.Table) -> pa.Table:
        spans = batch["spans"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = spans.flatten()
        off = spans.offsets.to_numpy().astype(np.int64)
        n = np.diff(off)
        starts = off[:-1]
        kinds = flat.field("kind").to_numpy(zero_copy_only=False)
        soff = flat.field("offset").to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.arange(len(kinds), dtype=np.int64) - np.repeat(starts, n)
        is_text = kinds == "text"
        is_media = kinds == "media"
        # per-doc folds (every doc has >= 1 span: the trailing media)
        order_ok = (
            np.add.reduceat((soff == pos).astype(np.int64), starts) == n
        )
        n_text = np.add.reduceat(is_text.astype(np.int64), starts)
        n_media = np.add.reduceat(is_media.astype(np.int64), starts)
        media_last = (n_media == 1) & is_media[off[1:] - 1]
        key = (
            n_text * 4
            + order_ok.astype(np.int64) * 2
            + media_last.astype(np.int64)
        )
        u, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "n_text_spans": pa.array(u // 4, type=pa.int64()),
                "order_ok": pa.array((u // 2) % 2, type=pa.int64()),
                "media_last": pa.array(u % 2, type=pa.int64()),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    agg = (
        corpus.map_batches(partial, batch_format="pyarrow")
        .groupby(["n_text_spans", "order_ok", "media_last"])
        .aggregate(Sum("n", alias_name="n_docs"))
        .to_pandas()  # bounded signature domain
    )
    return agg.sort_values(
        ["n_text_spans", "order_ok", "media_last"], ignore_index=True
    ).astype("int64")


def golden_records(sf_dir: str, prefix_len: int = 80) -> ray.data.Dataset:
    """Survivorship merge — the entity-resolution post-step that picks one
    golden record per duplicate block: for every first-``prefix_len``-char
    text prefix shared by more than one document (the
    :func:`~.textpipe.boilerplate_prefixes` blocking key), emit the
    canonical id (min doc_id), the member count, the max member id, and
    the MAJORITY ``source`` with ties broken lexicographically —
    deterministic rules, never "any value".

    Plan: the shuffle moves (prefix, doc_id, source) — the prefix STRING
    itself, not a 64-bit hash, for the collision reason documented at
    boilerplate_prefixes — under a coarse shard groupby (hash(prefix) %
    n_shards: millions of tiny clusters would pay per-group overhead in a
    per-prefix map_groups); inside the shard every survivorship rule is
    one vectorized pandas pass."""
    n_shards = 64
    ds = read(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def keyed(batch: pd.DataFrame) -> pa.Table:
        pre = batch["text"].fillna("").str.slice(0, prefix_len)
        h = np.asarray(stable_hash64(pre.tolist()), dtype=np.uint64)
        return pa.table(
            {
                "prefix": pa.array(pre, pa.string()),
                "shard": pa.array((h % np.uint64(n_shards)).astype(np.int32)),
                "doc_id": pa.array(batch["doc_id"].to_numpy(np.int64)),
                "source": pa.array(batch["source"], pa.string()),
            }
        )

    def survivorship(g: pd.DataFrame) -> pd.DataFrame:
        stats = g.groupby("prefix").agg(
            cluster_id=("doc_id", "min"),
            max_doc=("doc_id", "max"),
            n_members=("doc_id", "size"),
        )
        stats = stats[stats["n_members"] > 1]
        if stats.empty:
            return pd.DataFrame(
                {
                    "cluster_id": pd.Series(dtype="int64"),
                    "n_members": pd.Series(dtype="int64"),
                    "max_doc": pd.Series(dtype="int64"),
                    "rep_source": pd.Series(dtype=object),
                }
            )
        votes = g.groupby(["prefix", "source"], as_index=False).size()
        votes = votes.sort_values(
            ["prefix", "size", "source"], ascending=[True, False, True]
        )
        rep = votes.groupby("prefix", as_index=False).first()[
            ["prefix", "source"]
        ]
        out = stats.reset_index().merge(rep, on="prefix")
        return pd.DataFrame(
            {
                "cluster_id": out["cluster_id"].astype("int64"),
                "n_members": out["n_members"].astype("int64"),
                "max_doc": out["max_doc"].astype("int64"),
                "rep_source": out["source"],
            }
        )

    out = (
        ds.map_batches(keyed, batch_format="pandas")
        .groupby("shard")
        .map_groups(
            lambda g: survivorship(g.drop(columns=["shard"])),
            batch_format="pandas",
        )
    )
    return canonical_sort(out, ["cluster_id"])


def trending_parts(
    sf_dir: str, k: int = 25, halflife_months: int = 1
) -> pd.DataFrame:
    """Time-decayed popularity ranking (the recsys "trending" signal):
    each lineitem contributes ``2^(20 − age_months)`` decay units to its
    part, where age is whole 30-day months before the dataset's max ship
    date — an EXACT integer exponential decay (halving per month), so the
    rank is reproducible anywhere. Columns: p_partkey, n_orders,
    decay_units; top-``k`` by decay_units desc, part asc.

    Scale: pass 1 folds the global max ship date (one scalar per batch);
    pass 2 ships (part, n, units) integer partials into one part-domain
    groupby; the top-k cut is a bounded driver head. No floats, no decay
    drift: contributions older than 20 months are exactly 0."""
    from ray.data.aggregate import Max

    raw = read(sf_dir, "lineitem", columns=["l_partkey", "l_shipdate"])

    def ship_us(batch: pa.Table) -> pa.Table:
        us = batch["l_shipdate"].cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table({"us": us, "l_partkey": batch["l_partkey"]})

    base = raw.map_batches(ship_us, batch_format="pyarrow").materialize()
    anchor = int(base.max("us"))
    month_us = 30 * 86_400_000_000

    def partial(batch: pa.Table) -> pa.Table:
        p = batch["l_partkey"].to_numpy(zero_copy_only=False)
        us = batch["us"].to_numpy(zero_copy_only=False)
        months = (anchor - us) // month_us
        units = np.where(
            months <= 20, np.int64(1) << np.maximum(20 - months, 0), 0
        ).astype(np.int64)
        df = pd.DataFrame({"p_partkey": p, "units": units})
        g = df.groupby("p_partkey", as_index=False).agg(
            n=("units", "size"), u=("units", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        base.map_batches(partial, batch_format="pyarrow")
        .groupby("p_partkey")
        .aggregate(
            Sum("n", alias_name="n_orders"),
            Sum("u", alias_name="decay_units"),
        )
        .to_pandas()
    )
    return (
        agg.astype("int64")
        .sort_values(
            ["decay_units", "p_partkey"],
            ascending=[False, True],
            ignore_index=True,
        )
        .head(k)
    )


def _census_by_lang_via(sf_dir: str, fmt: str) -> ray.data.Dataset:
    """census_by_lang read back through a row-oriented source format —
    certifies the storage layer's format dispatch
    (sources/storage.read_table) end-to-end in the driver's value
    harness: same census, same oracle, different source. The copy writes
    ONCE per (sf_dir, fmt) under /tmp (atomic rename; the synth_media
    materialize-once pattern) as a DIRECTORY of part files so the read
    parallelizes like any production drop."""
    import hashlib
    import os

    from ..sources.storage import read_table, write_table

    tag = hashlib.sha1(f"{sf_dir}|docs-{fmt}-v1".encode()).hexdigest()[:8]
    root = f"/tmp/dedupe_rust_ray_{fmt}_{tag}"
    if not os.path.isdir(root):
        tmp = f"{root}.tmp-{os.getpid()}"
        write_table(
            read(sf_dir, "documents", columns=["doc_id", "lang"]),
            tmp,
            fmt=fmt,
        )
        try:
            os.rename(tmp, root)
        except OSError:  # lost a concurrent-build race: theirs is complete
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.group_by("lang").aggregate([("lang", "count")])
        return t.rename_columns(["lang", "partial"])

    out = (
        read_table(root, columns=["lang"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("partial", alias_name="n"))
    )
    return canonical_sort(out, ["n", "lang"], descending=[True, False])


def census_by_lang_jsonl(sf_dir: str) -> ray.data.Dataset:
    """JSONL-sourced census (see _census_by_lang_via)."""
    return _census_by_lang_via(sf_dir, "json")


def census_by_lang_csv(sf_dir: str) -> ray.data.Dataset:
    """CSV-sourced census (see _census_by_lang_via)."""
    return _census_by_lang_via(sf_dir, "csv")
