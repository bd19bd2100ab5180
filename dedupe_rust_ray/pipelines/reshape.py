"""Reshape / statistical-aggregate operators over the driver test tables.

Extends the engine's relational surface (SURVEY.md §2.9) with the
aggregate shapes a reference user reaches for next: pivot (conditional
aggregation), rollup (multi-level census), distributed correlation /
covariance moments, per-group ordered string aggregation, and
fixed-width histogram binning. Every operator is SQL-oracled.

Scale pattern notes:

- **pivot** is a per-batch conditional-count combiner followed by one
  groupby over the row key — the column domain (languages) is small and
  fixed, so the pivot never shuffles more than one partial row per
  (batch, source).
- **rollup** aggregates ONCE at the finest level; the coarser levels are
  derived from those (tiny) partials, never from a second pass over the
  input.
- **corr** ships six float64 moment partials per (batch, group) —
  ``n, Σx, Σy, Σx², Σy², Σxy`` — and finishes with the closed-form
  Pearson/covariance formulas on the merged sums. Nothing but the
  moments ride the shuffle.
- **string_agg** needs the group's members in one place by definition;
  groups here are nations (bounded domain), so ``map_groups`` with an
  in-group sort is the honest plan. For unbounded group domains the
  right tool is the histogram/top-k family, not string_agg.
- **histogram** bins with exact float ops (divide by a power-of-two-
  exact constant, floor) so Ray and any SQL engine agree bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum

from .common import canonical_sort, read

# the documents table's closed language domain (sources/corpus generator)
_LANGS = ("de", "en", "es", "fr", "zh")


def pivot_lang_by_source(sf_dir: str) -> ray.data.Dataset:
    """Pivot: one row per source, one count column per language.

    Per-batch conditional counts (the combiner) then a groupby-sum over
    ``source`` — the classic wide-to-columns pivot as a two-step
    aggregate, no per-row work after tokenize."""

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "source": batch["source"].to_pandas(),
                "lang": batch["lang"].to_pandas(),
            }
        )
        g = df.groupby("source")
        out = {"source": pa.array(list(g.groups.keys()), type=pa.string())}
        for lang in _LANGS:
            out[f"n_{lang}"] = pa.array(
                g["lang"].agg(lambda s, L=lang: int((s == L).sum())).to_numpy(),
                type=pa.int64(),
            )
        out["n_total"] = pa.array(g.size().to_numpy(), type=pa.int64())
        return pa.table(out)

    agg = [Sum(f"n_{lang}", alias_name=f"n_{lang}") for lang in _LANGS]
    agg.append(Sum("n_total", alias_name="n_total"))
    return canonical_sort(
        read(sf_dir, "documents", columns=["source", "lang"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(*agg),
        ["source"],
    )


def rollup_census(sf_dir: str) -> pd.DataFrame:
    """ROLLUP(lang, source): counts at (lang, source), (lang, *) and
    (*, *) levels, upper levels marked ``(all)``.

    One shuffle at the finest granularity; the coarser levels re-reduce
    the finest partials (|langs| x |sources| rows — driver-tiny at any
    input scale, so finishing on the driver is sound)."""

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.group_by(["lang", "source"]).aggregate([("lang", "count")])
        return t.rename_columns(["lang", "source", "partial"])

    finest = (
        read(sf_dir, "documents", columns=["lang", "source"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .aggregate(Sum("partial", alias_name="n"))
        .to_pandas()
    )
    by_lang = finest.groupby("lang", as_index=False)["n"].sum()
    by_lang["source"] = "(all)"
    total = pd.DataFrame(
        {"lang": ["(all)"], "source": ["(all)"], "n": [finest["n"].sum()]}
    )
    out = pd.concat([finest, by_lang, total], ignore_index=True)
    out["n"] = out["n"].astype("int64")
    return (
        out[["lang", "source", "n"]]
        .sort_values(["lang", "source"])
        .reset_index(drop=True)
    )


def corr_quantity_price(sf_dir: str) -> pd.DataFrame:
    """Per-returnflag Pearson correlation + population covariance of
    (l_quantity, l_extendedprice), from distributed moment partials.

    Each batch contributes one six-moment row per flag; the groupby
    merges sums and the driver applies the closed-form formulas to the
    (three-row) result."""

    def moments(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "flag": batch["l_returnflag"].to_pandas(),
                "x": batch["l_quantity"].to_numpy(zero_copy_only=False).astype(np.float64),
                "y": batch["l_extendedprice"].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby("flag")
        return pa.table(
            {
                "l_returnflag": pa.array(list(g.groups.keys()), type=pa.string()),
                "n": pa.array(g.size().to_numpy(), type=pa.int64()),
                "sx": pa.array(g["x"].sum().to_numpy()),
                "sy": pa.array(g["y"].sum().to_numpy()),
                "sxx": pa.array(g["x"].agg(lambda s: float((s**2).sum())).to_numpy()),
                "syy": pa.array(g["y"].agg(lambda s: float((s**2).sum())).to_numpy()),
                "sxy": pa.array(g.apply(lambda d: float((d["x"] * d["y"]).sum()), include_groups=False).to_numpy()),
            }
        )

    merged = (
        read(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity", "l_extendedprice"])
        .map_batches(moments, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"),
            Sum("sxx", alias_name="sxx"),
            Sum("syy", alias_name="syy"),
            Sum("sxy", alias_name="sxy"),
        )
        .to_pandas()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    n = merged["n"].to_numpy(np.float64)
    sx, sy = merged["sx"].to_numpy(), merged["sy"].to_numpy()
    sxx, syy, sxy = merged["sxx"].to_numpy(), merged["syy"].to_numpy(), merged["sxy"].to_numpy()
    cov = sxy / n - (sx / n) * (sy / n)
    vx = sxx / n - (sx / n) ** 2
    vy = syy / n - (sy / n) ** 2
    corr = cov / np.sqrt(vx * vy)
    return pd.DataFrame(
        {
            "l_returnflag": merged["l_returnflag"],
            "n_rows": merged["n"].astype("int64"),
            # 6dp for the unit-scale corr, 2dp for the large-scale
            # covariance: keeps both far from half-up boundaries under
            # cross-engine float-sum-order differences
            "corr_qp": np.floor(corr * 1e6 + 0.5) / 1e6,
            "covar_pop_qp": np.floor(cov * 1e2 + 0.5) / 1e2,
        }
    )


def supplier_directory(sf_dir: str) -> pd.DataFrame:
    """Per-nation supplier roster: count, comma-joined sorted names, and
    total account balance (string_agg / collect_list coverage).

    The nation dimension (25 keys) is broadcast as sorted key/name
    arrays and probed vectorized (searchsorted — the supplier scan is
    SF-scaled, so no per-row Python loop); the group concat runs in
    ``map_groups`` with an in-group sort — sound because the group
    domain is the bounded dimension table."""
    import ray

    from .common import sorted_int_lookup

    nations = (
        read(sf_dir, "nation", columns=["n_nationkey", "n_name"])
        .to_pandas()
        .sort_values("n_nationkey")
    )
    nmap_ref = ray.put(
        (
            nations["n_nationkey"].to_numpy(np.int64),
            nations["n_name"].to_numpy(dtype=object),
        )
    )

    def tag(batch: pa.Table) -> pa.Table:
        nkeys, nnames = ray.get(nmap_ref)
        names, _ = sorted_int_lookup(
            nkeys, nnames,
            batch["s_nationkey"].to_numpy(zero_copy_only=False),
        )
        return pa.table(
            {
                "n_name": pa.array(names, type=pa.string()),
                "s_name": batch["s_name"],
                "s_acctbal": batch["s_acctbal"],
            }
        )

    def concat_group(group: pd.DataFrame) -> pd.DataFrame:
        names = sorted(group["s_name"])
        return pd.DataFrame(
            {
                "n_name": [group["n_name"].iloc[0]],
                "n_suppliers": np.array([len(names)], dtype=np.int64),
                "suppliers": [",".join(names)],
                "sum_acctbal": [
                    float(np.floor(group["s_acctbal"].sum() * 100 + 0.5) / 100)
                ],
            }
        )

    out = (
        read(sf_dir, "supplier", columns=["s_nationkey", "s_name", "s_acctbal"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("n_name")
        .map_groups(concat_group, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("n_name").reset_index(drop=True)


def event_value_histogram(sf_dir: str, width: float = 25.0) -> ray.data.Dataset:
    """Fixed-width histogram of the events ``value`` column: per-bin row
    count and value sum. Bin = floor(value / width); the division and
    floor are exact float ops, so any engine bins identically."""

    def partial(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        b = np.floor(v / width).astype(np.int64)
        df = pd.DataFrame({"bin": b, "v": v})
        g = df.groupby("bin", as_index=False).agg(n=("v", "size"), sv=("v", "sum"))
        return pa.table(
            {
                "bin": pa.array(g["bin"].to_numpy(), type=pa.int64()),
                "n": pa.array(g["n"].to_numpy(), type=pa.int64()),
                "sv": pa.array(g["sv"].to_numpy()),
            }
        )

    ds = (
        read(sf_dir, "events", columns=["value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n_events"), Sum("sv", alias_name="sum_value"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        bins = batch["bin"].to_numpy(zero_copy_only=False)
        sv = batch["sum_value"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bin_lo": pa.array(bins * width),
                "n_events": batch["n_events"],
                "sum_value": pa.array(np.floor(sv * 1e4 + 0.5) / 1e4),
            }
        )

    return canonical_sort(
        ds.map_batches(finish, batch_format="pyarrow"), ["bin_lo"]
    )


def value_quantiles_dd(
    sf_dir: str,
    alpha: float = 0.005,
    quantiles: tuple = (0.5, 0.9, 0.99),
) -> pd.DataFrame:
    """Per-event-type approximate quantiles via a DDSketch-style
    log-binned histogram (Masson et al. 2019): bin = floor(ln(v)/ln(gamma))
    with gamma = (1+alpha)/(1-alpha), giving a RELATIVE-error guarantee
    of alpha at every quantile — the right sketch for positive float
    domains spanning magnitudes, where fixed-width bins (see
    event_value_histogram) waste resolution.

    Scale pattern: per-batch (type, bin) count partials ride the shuffle
    (bin domain ~ log(range)/alpha, a few thousand per type at any input
    size); the quantile walk over cumulative counts runs on the merged
    census. Mergeability is trivial: bins are value-independent, so
    partial histograms sum. tests/test_reshape.py pins the alpha bound
    against exact numpy quantiles; the full sketch (binning, cumulative
    walk, representative value) is additionally reproduced in the SQL
    oracle and hash-compared after floor-rounding to 4 decimals."""
    gamma = (1.0 + alpha) / (1.0 - alpha)
    lg = np.log(gamma)

    def partial(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        pos = v > 0  # DDSketch bins are defined on positive values
        b = np.floor(np.log(v[pos]) / lg).astype(np.int64)
        et = batch["event_type"].to_numpy(zero_copy_only=False)[pos]
        g = pd.DataFrame({"event_type": et, "bin": b}).groupby(
            ["event_type", "bin"], as_index=False
        ).size()
        return pa.table(
            {
                "event_type": pa.array(g["event_type"], type=pa.string()),
                "bin": pa.array(g["bin"].to_numpy(np.int64)),
                "n": pa.array(g["size"].to_numpy(np.int64)),
            }
        )

    merged = (
        read(sf_dir, "events", columns=["event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "bin"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    rows = []
    for et, grp in merged.groupby("event_type"):
        grp = grp.sort_values("bin")
        cum = grp["n"].cumsum().to_numpy()
        total = cum[-1]
        bins = grp["bin"].to_numpy()
        for q in quantiles:
            idx = np.searchsorted(cum, q * total, side="left")
            idx = min(idx, len(bins) - 1)
            est = 2.0 * gamma ** bins[idx] * gamma / (gamma + 1.0)
            # floor-round to 4 decimals: the SQL oracle reproduces the bin
            # walk exactly (integer bins, integer cums, identical IEEE
            # q*total product); only the final pow differs by <=1-2 ulp
            # across engines, which this rounding absorbs
            rows.append((et, q, np.floor(est * 1e4 + 0.5) / 1e4))
    out = pd.DataFrame(rows, columns=["event_type", "q", "value_est"])
    return out.sort_values(["event_type", "q"]).reset_index(drop=True)


def cube_census(sf_dir: str) -> pd.DataFrame:
    """CUBE(lang, source): counts at all four grouping sets —
    (lang, source), (lang, *), (*, source) and (*, *) — completing the
    grouping-sets family next to :func:`rollup_census` (which lacks the
    source marginal). Same physical plan: ONE shuffle at the finest
    granularity, every coarser set re-reduced from the finest partials
    (|langs| x |sources| rows — driver-tiny at any input scale)."""

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.group_by(["lang", "source"]).aggregate([("lang", "count")])
        return t.rename_columns(["lang", "source", "partial"])

    finest = (
        read(sf_dir, "documents", columns=["lang", "source"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .aggregate(Sum("partial", alias_name="n"))
        .to_pandas()
    )
    by_lang = finest.groupby("lang", as_index=False)["n"].sum()
    by_lang["source"] = "(all)"
    by_source = finest.groupby("source", as_index=False)["n"].sum()
    by_source["lang"] = "(all)"
    total = pd.DataFrame(
        {"lang": ["(all)"], "source": ["(all)"], "n": [finest["n"].sum()]}
    )
    out = pd.concat([finest, by_lang, by_source, total], ignore_index=True)
    out["n"] = out["n"].astype("int64")
    return (
        out[["lang", "source", "n"]]
        .sort_values(["lang", "source"])
        .reset_index(drop=True)
    )


def ntile_customers(sf_dir: str, k: int = 4, span_cents: int = 10_000) -> ray.data.Dataset:
    """Global NTILE(k): equi-depth bucketing of every customer by
    (c_acctbal, c_custkey) order — NTILE(k) OVER (ORDER BY ...) without a
    global sort barrier.

    The rank is a distributed prefix sum over VALUE-RANGE buckets (the
    :func:`~.curation.pack_token_shards` pattern): acctbal lives on a
    bounded 2-decimal grid, so ``bucket = cents // span_cents`` has a
    fixed ~1.1k-bucket domain at any input scale. Pass 1 combines
    per-batch bucket counts into exact per-bucket rank OFFSETS on the
    driver (a table bounded by the DOMAIN, not the row count); pass 2
    co-locates whole buckets under a coarse shard groupby, sorts each
    bucket vectorized, and adds offset + local position. Tile boundaries
    follow SQL NTILE exactly: the first ``n % k`` tiles get one extra
    row. ``span_cents`` trades offset-table size against per-bucket task
    size — shrink it for a skewed balance distribution."""
    from ..functions.shingles import splitmix64
    from .common import money_cents

    n_shards = 64

    def bucketed(batch: pa.Table) -> pa.Table:
        cents = money_cents(batch["c_acctbal"].to_numpy(zero_copy_only=False))
        # floor division keeps negative balances ordered before positives
        bucket = cents // span_cents
        shard = (
            splitmix64(bucket.astype(np.uint64)) % np.uint64(n_shards)
        ).astype(np.int32)
        return pa.table(
            {
                "c_custkey": batch["c_custkey"].cast(pa.int64()),
                "cents": pa.array(cents, type=pa.int64()),
                "bucket": pa.array(bucket, type=pa.int64()),
                "shard": pa.array(shard, type=pa.int32()),
            }
        )

    ds = (
        read(sf_dir, "customer", columns=["c_custkey", "c_acctbal"])
        .map_batches(bucketed, batch_format="pyarrow")
        .materialize()  # reused by both passes; compact 28 B/row
    )
    counts = (
        ds.map_batches(
            lambda b: b.groupby("bucket", as_index=False).size(),
            batch_format="pandas",
        )
        .to_pandas()  # domain-bounded (~1.1k rows), never row-scaled
        .groupby("bucket", as_index=False)["size"]
        .sum()
        .sort_values("bucket")
    )
    offsets = dict(
        zip(
            counts["bucket"].to_numpy(np.int64),
            (counts["size"].cumsum() - counts["size"]).to_numpy(np.int64),
        )
    )
    n_total = int(counts["size"].sum())
    q, r0 = divmod(n_total, k)

    import ray

    oref = ray.put(offsets)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["bucket", "cents", "c_custkey"], ignore_index=True)
        local = g.groupby("bucket").cumcount().to_numpy(np.int64)
        off = g["bucket"].map(ray.get(oref)).to_numpy(np.int64)
        rank = off + local  # exact global 0-based rank
        cut = r0 * (q + 1)
        tile = np.where(
            rank < cut,
            rank // (q + 1),
            r0 + (rank - cut) // max(q, 1),
        ) + 1
        return pd.DataFrame(
            {
                "c_custkey": g["c_custkey"].to_numpy(np.int64),
                "tile": tile.astype(np.int64),
            }
        )

    out = (
        ds.groupby("shard")
        .map_groups(
            lambda g: per_shard(g.drop(columns=["shard"])),
            batch_format="pandas",
        )
    )
    return canonical_sort(out, ["c_custkey"])


def mode_quantity_by_flag(sf_dir: str) -> pd.DataFrame:
    """Deterministic per-group MODE: the most frequent l_quantity per
    l_returnflag, ties broken toward the SMALLEST quantity (SQL mode()
    leaves ties unspecified, so the pipeline and the oracle both pin the
    (count DESC, value ASC) rule).

    Plan: per-batch (flag, qty) count combiner, one groupby over the
    BOUNDED (flag x quantity) domain (~150 rows at any scale), argmax on
    the driver."""

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "l_returnflag": batch["l_returnflag"].to_pandas(),
                "qty": batch["l_quantity"]
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
            }
        )
        g = df.groupby(["l_returnflag", "qty"], as_index=False).size()
        return pa.Table.from_pandas(
            g.rename(columns={"size": "n"}), preserve_index=False
        )

    counts = (
        read(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "qty"])
        .aggregate(Sum("n", alias_name="n_rows"))
        .to_pandas()  # |flags| x |quantities|: domain-bounded
    )
    counts = counts.sort_values(
        ["l_returnflag", "n_rows", "qty"], ascending=[True, False, True]
    )
    out = counts.groupby("l_returnflag", as_index=False).first()
    out = out.rename(columns={"qty": "mode_qty"})
    out["mode_qty"] = out["mode_qty"].astype("int64")
    out["n_rows"] = out["n_rows"].astype("int64")
    return (
        out[["l_returnflag", "mode_qty", "n_rows"]]
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )


def supplier_share_of_nation(
    sf_dir: str, broadcast_max_rows: int = 5_000_000
) -> ray.data.Dataset:
    """Partition-total window aggregate: each supplier's lineitem revenue
    next to its NATION's total — SUM() OVER (PARTITION BY s_nationkey)
    broadcast back onto every row, with no self-join and no window sort.

    Plan: revenue folds to one exact int64-unit row per supplier (8-byte
    keys on the shuffle); s_nationkey attaches via the q5 ladder (sorted
    broadcast probe below ``broadcast_max_rows``, hash Dataset.join
    above); nation totals are a second groupby over the attached rows
    whose output is bounded by the nation domain (25), so the broadcast
    back is always a tiny sorted probe. Money converts from exact units
    to dollars once, at the very end (no float accumulation anywhere)."""
    import ray

    from .common import (
        drop_empty_blocks,
        gather_sorted_arrays,
        join_partitions,
        revenue_units,
        sorted_int_lookup,
        units_to_money,
    )

    def rev_partial(batch: pa.Table) -> pa.Table:
        units = revenue_units(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False),
            batch["l_discount"].to_numpy(zero_copy_only=False),
        )
        df = pd.DataFrame(
            {
                "s_suppkey": batch["l_suppkey"]
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
                "units": units,
            }
        )
        g = df.groupby("s_suppkey", as_index=False)["units"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    per_supp = (
        read(
            sf_dir, "lineitem", columns=["l_suppkey", "l_extendedprice", "l_discount"]
        )
        .map_batches(rev_partial, batch_format="pyarrow")
        .groupby("s_suppkey")
        .aggregate(Sum("units", alias_name="units"))
    )

    supp_ds = read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    if supp_ds.count() <= broadcast_max_rows:
        ref = ray.put(gather_sorted_arrays(supp_ds, "s_suppkey", ("s_nationkey",)))

        def attach(batch: pa.Table, r=ref) -> pa.Table:
            keys, nats = ray.get(r) if not isinstance(r, tuple) else r
            nk, found = sorted_int_lookup(
                keys,
                np.asarray(nats, dtype=np.int64),
                batch["s_suppkey"].to_numpy(zero_copy_only=False),
            )
            assert found.all(), "supplier missing for lineitem suppkey"
            return batch.append_column(
                "s_nationkey", pa.array(nk, type=pa.int64())
            )

        tagged = per_supp.map_batches(attach, batch_format="pyarrow")
    else:
        tagged = drop_empty_blocks(per_supp).join(
            supp_ds.map_batches(
                lambda b: pa.table(
                    {
                        "s_suppkey": b["s_suppkey"].cast(pa.int64()),
                        "s_nationkey": b["s_nationkey"].cast(pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            ),
            join_type="inner",
            num_partitions=join_partitions(),
            on=("s_suppkey",),
        )
    tagged = tagged.materialize()  # reused: nation totals + final attach

    nat_tot = (
        tagged.groupby("s_nationkey")
        .aggregate(Sum("units", alias_name="nat_units"))
        .to_pandas()  # bounded by the 25-nation domain
        .sort_values("s_nationkey")
    )
    nref = ray.put(
        (
            nat_tot["s_nationkey"].to_numpy(np.int64),
            nat_tot["nat_units"].to_numpy(np.int64),
        )
    )

    def finish(batch: pa.Table, r=nref) -> pa.Table:
        keys, tots = ray.get(r) if not isinstance(r, tuple) else r
        nt, _ = sorted_int_lookup(
            keys, tots, batch["s_nationkey"].to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "s_suppkey": batch["s_suppkey"].cast(pa.int64()),
                "s_nationkey": batch["s_nationkey"].cast(pa.int64()),
                "supp_rev": pa.array(
                    units_to_money(batch["units"].to_numpy(zero_copy_only=False))
                ),
                "nation_rev": pa.array(units_to_money(nt)),
            }
        )

    return canonical_sort(
        tagged.map_batches(finish, batch_format="pyarrow"), ["s_suppkey"]
    )


def quantile_quantity_by_flag(sf_dir: str) -> pd.DataFrame:
    """Exact per-group PERCENTILE_CONT (p25 / median / p75) of
    ``l_quantity`` by ``l_returnflag`` — the grouped-quantile shape —
    computed from the bounded-domain histogram, never a per-group sort.

    Plan: the same (flag, qty) count combiner as ``mode_quantity_by_flag``
    (quantities live on a closed integer domain, so partials are bounded
    by |flags| x |quantities| per batch at ANY scale); the quantiles read
    off the merged cumulative counts on the driver. The interpolation
    ``v_lo + frac * (v_hi - v_lo)`` is exact in float64 here (quarter
    fractions x small integer gaps), so the value hash matches DuckDB's
    ``quantile_cont`` bit-for-bit."""

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "l_returnflag": batch["l_returnflag"].to_pandas(),
                "qty": batch["l_quantity"]
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
            }
        )
        g = df.groupby(["l_returnflag", "qty"], as_index=False).size()
        return pa.Table.from_pandas(
            g.rename(columns={"size": "n"}), preserve_index=False
        )

    counts = (
        read(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "qty"])
        .aggregate(Sum("n", alias_name="n_rows"))
        .to_pandas()  # bounded: |flags| x |quantities|
        .sort_values(["l_returnflag", "qty"], ignore_index=True)
    )

    def qcont(vals: np.ndarray, cum: np.ndarray, q: float) -> float:
        n = int(cum[-1])
        h = q * (n - 1)  # 0-based continuous rank
        lo = int(np.floor(h))
        hi = int(np.ceil(h))
        v_lo = vals[np.searchsorted(cum, lo, side="right")]
        v_hi = vals[np.searchsorted(cum, hi, side="right")]
        return float(v_lo + (h - lo) * (v_hi - v_lo))

    rows = []
    for flag, g in counts.groupby("l_returnflag"):
        vals = g["qty"].to_numpy(np.int64)
        cum = np.cumsum(g["n_rows"].to_numpy(np.int64))
        rows.append(
            {
                "l_returnflag": flag,
                "n_rows": int(cum[-1]),
                "p25_qty": qcont(vals, cum, 0.25),
                "median_qty": qcont(vals, cum, 0.5),
                "p75_qty": qcont(vals, cum, 0.75),
            }
        )
    return (
        pd.DataFrame(rows)
        .astype({"n_rows": "int64"})
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )


def profile_documents(sf_dir: str) -> ray.data.Dataset:
    """Deequ-style data-profiling audit of the documents table: per-column
    completeness and range stats as long-form (col, stat, value) rows —
    the schema-drift / data-quality census every ingestion pipeline runs
    before trusting a 100 TB drop.

    Scale pattern: each batch emits ~11 integer partial rows (n_rows,
    n_null per column; min/max id; utf8-length sum/min/max), the shuffle
    carries only those partials into a bounded (col, stat) groupby, and a
    driver-tiny finisher picks the right fold (sum vs min vs max) per
    stat. All values are exact int64 — no float anywhere in the hash."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Min

    cols = ("doc_id", "lang", "source", "text")

    def partial(batch: pa.Table) -> pa.Table:
        rows: list[tuple[str, str, int]] = []
        n = batch.num_rows
        for c in cols:
            rows.append((c, "n_rows", n))
            rows.append((c, "n_null", batch[c].null_count))
        ids = batch["doc_id"].drop_null()
        if len(ids):
            rows.append(("doc_id", "min", pc.min(ids).as_py()))
            rows.append(("doc_id", "max", pc.max(ids).as_py()))
        tl = pc.utf8_length(batch["text"]).drop_null()
        if len(tl):
            rows.append(("text", "sum_len", pc.sum(tl).as_py()))
            rows.append(("text", "min_len", pc.min(tl).as_py()))
            rows.append(("text", "max_len", pc.max(tl).as_py()))
        return pa.table(
            {
                "col": pa.array([r[0] for r in rows], type=pa.string()),
                "stat": pa.array([r[1] for r in rows], type=pa.string()),
                "value": pa.array([r[2] for r in rows], type=pa.int64()),
            }
        )

    merged = (
        read(sf_dir, "documents", columns=list(cols))
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["col", "stat"])
        .aggregate(
            Sum("value", alias_name="v_sum"),
            Min("value", alias_name="v_min"),
            Max("value", alias_name="v_max"),
        )
        .to_pandas()
    )
    pick = {
        "n_rows": "v_sum",
        "n_null": "v_sum",
        "sum_len": "v_sum",
        "min": "v_min",
        "min_len": "v_min",
        "max": "v_max",
        "max_len": "v_max",
    }
    merged["value"] = [
        int(r[pick[r["stat"]]]) for _, r in merged.iterrows()
    ]
    out = merged[["col", "stat", "value"]].astype({"value": "int64"})
    return out.sort_values(["col", "stat"]).reset_index(drop=True)


def mad_quantity_by_flag(sf_dir: str) -> pd.DataFrame:
    """Robust statistics: per-group MEDIAN ABSOLUTE DEVIATION of
    ``l_quantity`` by ``l_returnflag`` (the outlier-resistant spread
    measure next to corr's moments) — two exact weighted medians read off
    ONE bounded-domain count histogram, never a per-group sort.

    Exactness: quantities are integers, so the continuous median is on
    the exact 0.5 grid, deviations |v - med| are exact halves, and the
    second median's interpolation fractions are again {0, 0.5} — every
    value bit-matches DuckDB's ``mad()`` / ``median()`` in float64."""

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "l_returnflag": batch["l_returnflag"].to_pandas(),
                "qty": batch["l_quantity"]
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
            }
        )
        g = df.groupby(["l_returnflag", "qty"], as_index=False).size()
        return pa.Table.from_pandas(
            g.rename(columns={"size": "n"}), preserve_index=False
        )

    counts = (
        read(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "qty"])
        .aggregate(Sum("n", alias_name="n_rows"))
        .to_pandas()  # bounded: |flags| x |quantities|
    )

    def wmedian(vals: np.ndarray, wts: np.ndarray) -> float:
        order = np.argsort(vals)
        vals, wts = vals[order], wts[order]
        cum = np.cumsum(wts)
        n = int(cum[-1])
        h = 0.5 * (n - 1)
        lo, hi = int(np.floor(h)), int(np.ceil(h))
        v_lo = vals[np.searchsorted(cum, lo, side="right")]
        v_hi = vals[np.searchsorted(cum, hi, side="right")]
        return float(v_lo + (h - lo) * (v_hi - v_lo))

    rows = []
    for flag, g in counts.groupby("l_returnflag"):
        vals = g["qty"].to_numpy(np.float64)
        wts = g["n_rows"].to_numpy(np.int64)
        med = wmedian(vals, wts)
        mad = wmedian(np.abs(vals - med), wts)
        rows.append(
            {
                "l_returnflag": flag,
                "n_rows": int(wts.sum()),
                "median_qty": med,
                "mad_qty": mad,
            }
        )
    return (
        pd.DataFrame(rows)
        .astype({"n_rows": "int64"})
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )


def gini_quantity_by_flag(sf_dir: str) -> pd.DataFrame:
    """Concentration statistics: per-group GINI COEFFICIENT of
    ``l_quantity`` by ``l_returnflag`` (the inequality measure next to
    mad's spread and corr's moments), emitted as a ``1e6``-scaled int64.

    Closed form off the SAME bounded-domain count histogram
    mad_quantity_by_flag folds — for sorted values the Gini is
    ``(2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx)`` and a tie block of value v with
    count c starting after cumulative rank s contributes
    ``v·(c·s + c·(c+1)/2)`` to the rank sum, so no per-group sort exists
    at any scale. The finisher runs exact arbitrary-precision Python
    integers (the rank sum is Θ(n²·v̄), past int64 at ~sf30); the SQL
    mirror uses HUGEINT. Both floor-divide a non-negative numerator
    (Chebyshev's sum inequality guarantees 2·Σi·x_(i) ≥ (n+1)·Σx), so
    Python ``//`` and DuckDB ``//`` agree."""

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "l_returnflag": batch["l_returnflag"].to_pandas(),
                "qty": batch["l_quantity"]
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
            }
        )
        g = df.groupby(["l_returnflag", "qty"], as_index=False).size()
        return pa.Table.from_pandas(
            g.rename(columns={"size": "n"}), preserve_index=False
        )

    counts = (
        read(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "qty"])
        .aggregate(Sum("n", alias_name="n_rows"))
        .to_pandas()  # bounded: |flags| x |quantities|
    )
    rows = []
    for flag, g in counts.sort_values("qty").groupby("l_returnflag"):
        v = [int(x) for x in g["qty"]]
        c = [int(x) for x in g["n_rows"]]
        n = sum(c)
        total = sum(vi * ci for vi, ci in zip(v, c))
        rank_sum, cum = 0, 0
        for vi, ci in zip(v, c):
            rank_sum += vi * (ci * cum + ci * (ci + 1) // 2)
            cum += ci
        gini = (1_000_000 * (2 * rank_sum - (n + 1) * total)) // (n * total)
        rows.append(
            {
                "l_returnflag": flag,
                "n_rows": n,
                "sum_qty": total,
                "gini_scaled": gini,
            }
        )
    return (
        pd.DataFrame(rows)
        .astype({"n_rows": "int64", "sum_qty": "int64", "gini_scaled": "int64"})
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )


def contingency_flag_status(sf_dir: str) -> pd.DataFrame:
    """Independence / data-drift census: the (l_returnflag ×
    l_linestatus) contingency table with each cell's expected count under
    independence and its observed/expected lift — the chi-square-style
    drift check an ingest pipeline runs per batch drop, emitted as exact
    1e6-scaled int64 floors so no float enters the hash. Columns:
    l_returnflag, l_linestatus, n_obs, n_expected_scaled
    (= SCALE·R·C // N), lift_scaled (= SCALE·O·N // (R·C)).

    Scale: one bounded-domain (flag, status) count fold; the finisher is
    arbitrary-precision Python ints over ≤ |flags|·|statuses| cells
    (SCALE·O·N overflows int64 past ~sf3, so the driver fold and the SQL
    mirror both go through wide integers — HUGEINT on the DuckDB side)."""

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "l_returnflag": batch["l_returnflag"].to_pandas(),
                "l_linestatus": batch["l_linestatus"].to_pandas(),
            }
        )
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).size()
        return pa.Table.from_pandas(
            g.rename(columns={"size": "n"}), preserve_index=False
        )

    counts = (
        read(sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("n", alias_name="n_obs"))
        .to_pandas()  # bounded: |flags| x |statuses|
    )
    scale = 1_000_000
    n_total = int(counts["n_obs"].sum())
    row_tot = counts.groupby("l_returnflag")["n_obs"].transform("sum")
    col_tot = counts.groupby("l_linestatus")["n_obs"].transform("sum")
    expected, lift = [], []
    for o, r, c in zip(
        (int(x) for x in counts["n_obs"]),
        (int(x) for x in row_tot),
        (int(x) for x in col_tot),
    ):
        expected.append((scale * r * c) // n_total)
        lift.append((scale * o * n_total) // (r * c))
    out = counts.assign(
        n_expected_scaled=pd.array(expected, dtype="int64"),
        lift_scaled=pd.array(lift, dtype="int64"),
    ).astype({"n_obs": "int64"})
    return out.sort_values(
        ["l_returnflag", "l_linestatus"], ignore_index=True
    )


def monthly_revenue_trend(sf_dir: str) -> pd.DataFrame:
    """Time-series trend: per-calendar-month revenue with month-over-month
    delta and percent change — the window-on-AGGREGATE shape (LAG over a
    bounded month domain rather than over rows). Columns: year, month,
    revenue_units (exact 1e-4-dollar int64), delta_units,
    pct_change_scaled (1e6-scaled delta/prev TRUNCATED toward zero —
    DuckDB's integer ``//`` truncates on negatives where Python floors,
    so the pipeline truncates explicitly: sign·(|delta|·SCALE // prev)).
    The first month's delta/pct are NULL, matching SQL LAG.

    Scale: per-batch (month, revenue) integer partials -> one bounded
    (year, month) groupby -> driver finisher over <= decades·12 rows."""
    from .common import revenue_units

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        y = pc.year(batch["l_shipdate"]).to_numpy(zero_copy_only=False)
        m = pc.month(batch["l_shipdate"]).to_numpy(zero_copy_only=False)
        rev = revenue_units(batch["l_extendedprice"], batch["l_discount"])
        df = pd.DataFrame({"year": y, "month": m, "rev": rev})
        g = df.groupby(["year", "month"], as_index=False)["rev"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        read(sf_dir, "lineitem",
             columns=["l_shipdate", "l_extendedprice", "l_discount"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["year", "month"])
        .aggregate(Sum("rev", alias_name="revenue_units"))
        .to_pandas()  # bounded month domain
        .sort_values(["year", "month"], ignore_index=True)
    )
    rev = agg["revenue_units"].to_numpy(np.int64)
    prev = np.roll(rev, 1)
    delta = rev - prev
    scale = 1_000_000
    pct = np.array(
        [
            (1 if d >= 0 else -1) * ((scale * abs(int(d))) // int(p))
            if p > 0
            else 0
            for d, p in zip(delta, prev)
        ],
        dtype=np.int64,
    )
    out = agg.astype({"year": "int64", "month": "int64",
                      "revenue_units": "int64"})
    out["delta_units"] = pd.array(delta, dtype="Int64")
    out["pct_change_scaled"] = pd.array(pct, dtype="Int64")
    if len(out):  # first month has no predecessor (SQL LAG -> NULL)
        out.loc[0, "delta_units"] = pd.NA
        out.loc[0, "pct_change_scaled"] = pd.NA
    return out


def event_value_outliers(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Robust anomaly detection: per event type, how many event values
    sit more than ``k`` MADs from the type's median — the outlier census
    an ingest pipeline runs before trusting a metric column. Columns:
    event_type, n_events, n_outliers, med4, mad4 (median and MAD in
    QUARTER-cents so every statistic is an exact int64: the median of
    int cents lies on the 0.5 grid and the MAD of those deviations on
    the 0.25 grid — 4× clears both denominators; the outlier predicate
    ``|4·v − med4| > k·mad4`` is pure integer compare on both sides).

    Scale: one bounded-domain (type, cents) histogram fold; medians,
    MADs and the outlier count all read off the histogram in the driver
    finisher — no per-group sort, no second pass over rows."""
    from .common import money_cents

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "event_type": batch["event_type"].to_pandas(),
                "v": money_cents(
                    batch["value"].to_numpy(zero_copy_only=False)
                ),
            }
        )
        g = df.groupby(["event_type", "v"], as_index=False).size()
        return pa.Table.from_pandas(
            g.rename(columns={"size": "n"}), preserve_index=False
        )

    counts = (
        read(sf_dir, "events", columns=["event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "v"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # bounded: |types| x |distinct cents|
    )

    def wmedian2(vals: np.ndarray, wts: np.ndarray) -> int:
        """2x the weighted median of ints (exact: median is on the 0.5
        grid, doubling clears it)."""
        order = np.argsort(vals)
        vals, wts = vals[order], wts[order]
        cum = np.cumsum(wts)
        n = int(cum[-1])
        h = n - 1
        lo = int(vals[np.searchsorted(cum, h // 2, side="right")])
        hi = int(vals[np.searchsorted(cum, (h + 1) // 2, side="right")])
        return lo + hi

    rows = []
    for et, g in counts.groupby("event_type"):
        v = g["v"].to_numpy(np.int64)
        n = g["n"].to_numpy(np.int64)
        med4 = 2 * wmedian2(v, n)          # 4 * median(v)
        dev4 = np.abs(4 * v - med4)        # even ints on the 0.25*4 grid
        mad4 = wmedian2(dev4, n) // 2      # median(dev4): (even+even)/2 int
        out_n = int(n[dev4 > k * mad4].sum())
        rows.append(
            {
                "event_type": et,
                "n_events": int(n.sum()),
                "n_outliers": out_n,
                "med4": int(med4),
                "mad4": int(mad4),
            }
        )
    return (
        pd.DataFrame(rows)
        .astype(
            {c: "int64" for c in ("n_events", "n_outliers", "med4", "mad4")}
        )
        .sort_values("event_type", ignore_index=True)
    )
