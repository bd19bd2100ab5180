"""Shared helpers for the sf-table query pipelines (driver contract)."""

from __future__ import annotations

import gc
import time

import numpy as np
import ray.data

from ..sources.storage import read_table

_last_gc = 0.0


def canonical_sort(
    ds: ray.data.Dataset,
    keys: list[str],
    descending: list[bool] | bool = False,
    driver_max_rows: int = 500_000,
) -> ray.data.Dataset:
    """Deterministic FINAL ordering of a query result.

    Ray's distributed sort is a two-barrier all-to-all whose fixed cost
    (boundary sampling + exchange scheduling) dominates small results —
    ds.stats() on the bench pipelines shows ~4.5 s wall per Sort with
    sub-millisecond remote compute. A canonical sort is always the LAST
    operator, so when the materialized result is driver-bounded it sorts
    in-process (one pandas sort); above ``driver_max_rows`` — pair sets
    or label tables at real scale — the distributed sort runs unchanged."""
    import pyarrow as pa
    import ray

    m = ds.materialize()
    if m.count() <= driver_max_rows:
        # Arrow-to-Arrow round trip: a pandas detour would rewrite
        # nullable int64 columns to float64/NaN and flip the value hash
        # between the two size-gated paths. Blocks CAN still arrive as
        # pandas: map_batches forwards an already-empty input block
        # without invoking the (Arrow-returning) UDF, so a pandas-block
        # stage upstream leaks empty pandas blocks through to_arrow_refs.
        import pandas as pd

        parts = []
        for t in ray.get(m.to_arrow_refs()):
            if isinstance(t, pd.DataFrame):
                if not len(t):  # the only case observed in practice
                    continue
                t = pa.Table.from_pandas(t, preserve_index=False)
            if t.num_rows:
                parts.append(t)
        if not parts:
            return m
        t = pa.concat_tables(parts, promote_options="default")
        desc = (
            descending
            if isinstance(descending, list)
            else [descending] * len(keys)
        )
        t = t.sort_by(
            [(k, "descending" if d else "ascending") for k, d in zip(keys, desc)]
        )
        return ray.data.from_arrow(t)
    return m.sort(keys, descending=descending)


def money_cents(x) -> np.ndarray:
    """Exact int64 cents of a 2-decimal money column.

    Every money column in the driver tables (prices, discounts, account
    balances, event values) is generated on the 2-decimal grid, so
    ``round(x*100)`` recovers the exact integer cents; float64 holds each
    raw value within ~1e-9 of the grid point, far inside the rounding
    radius."""
    return np.rint(np.asarray(x, dtype=np.float64) * 100.0).astype(np.int64)


def revenue_units(price, discount) -> np.ndarray:
    """Exact int64 revenue ``price * (1 - discount)`` in 1e-4-dollar units.

    The revenue partials of the TPC-H-shaped queries historically summed
    ``float(price) * (1 - float(discount))`` — a float64 whose accumulation
    ORDER varies with Ray block layout, flipping FLOOR(x*100+0.5) by one
    cent when a group's sum lands on a .xx5 boundary (the round-3
    q10_returned_items hash flake). Integer summation is exact and
    order-free: sums fit int64 with ~1e6 headroom at sf100 (~1.05e9 max
    per row x 6e9 rows ~ 6e18 < 2^63)."""
    return money_cents(price) * (100 - money_cents(discount))


def units_to_money(units) -> np.ndarray:
    """1e-4-dollar int units -> half-up-rounded 2-decimal float dollars.

    Bit-matches the oracles' ``FLOOR(x*100 + 0.5)/100`` on the exact
    value: integer floor-division to cents, then one exact float divide
    (cents < 2^53 are exactly representable)."""
    u = np.asarray(units, dtype=np.int64)
    return np.floor_divide(u + 50, 100).astype(np.float64) / 100.0


def cents_to_money(cents) -> np.ndarray:
    """Exact int64 cents -> float dollars (no rounding needed: the true
    value already sits on the cent grid)."""
    return np.asarray(cents, dtype=np.int64).astype(np.float64) / 100.0


def sorted_int_lookup(keys: np.ndarray, vals: np.ndarray, probe: np.ndarray):
    """Vectorized key->value probe against a SORTED int64 key array — the
    broadcast-dimension lookup shared by the relational pack and q5/q14.

    Returns ``(values, found_mask)``; callers decide miss semantics.
    Empty key arrays yield all-miss (no IndexError on the clipped probe)."""
    if len(keys) == 0:
        fill = np.zeros(
            len(probe), dtype=vals.dtype if len(vals) else np.int64
        )
        return fill, np.zeros(len(probe), dtype=bool)
    idx = np.minimum(np.searchsorted(keys, probe), len(keys) - 1)
    found = keys[idx] == probe
    return vals[idx], found


def gather_sorted_arrays(
    ds: ray.data.Dataset, key_col: str, val_cols: tuple[str, ...] = ()
) -> tuple[np.ndarray, ...]:
    """Gather a ladder-gated SMALL key(/value) dataset driver-side as numpy
    arrays sorted by ``key_col`` — the broadcast leg of the q5 ladder,
    used as ``ray.put(gather_sorted_arrays(...))`` + ``sorted_int_lookup``
    probes inside ``map_batches``. Returns ``(keys, *vals)`` with keys
    int64-sorted and value arrays aligned; empty datasets yield empty
    int64 arrays (all probes miss)."""
    import ray as _ray

    parts = [t for t in _ray.get(ds.to_arrow_refs()) if t.num_rows]
    if not parts:
        e = np.array([], dtype=np.int64)
        return (e, *(e.copy() for _ in val_cols))
    import pyarrow as _pa

    t = _pa.concat_tables(parts)
    keys = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(keys)
    out = [keys[order]]
    for c in val_cols:
        out.append(t[c].to_numpy(zero_copy_only=False)[order])
    return tuple(out)


def keys_with_sentinel(
    ds: ray.data.Dataset,
    src_col: str,
    dst_col: str | None = None,
    block_filter=None,
    dedup: bool = False,
) -> ray.data.Dataset:
    """Key side of a semi-/anti-/inner join, renamed to ``dst_col`` and
    with a per-block sentinel key (-1) appended so EVERY block stays
    schema-bearing and non-empty — acero's hash join fails on partitions
    fed only schema-less empty bundles, and a one-row union is not enough
    (partitions that receive none of it still fail). No real key is
    negative, so the sentinel matches nothing.

    ``ds`` must be a RAW scan, with any selective predicate passed as
    ``block_filter`` so it runs INSIDE this UDF: Ray's map_batches never
    invokes the UDF on an already-empty input block — it forwards a
    ZERO-COLUMN block instead — so a sentinel appended in a map_batches
    placed AFTER a separate filter stage misses exactly the blocks that
    need it. ``dedup=True`` additionally uniques keys per block (the
    combiner before a join shuffle)."""
    import pyarrow as _pa

    dst = dst_col or src_col

    def per_block(b):
        if block_filter is not None:
            b = block_filter(b)
        col = b[src_col]
        if dedup:
            col = col.unique()
        k = col.cast(_pa.int64())
        if isinstance(k, _pa.ChunkedArray):
            k = k.combine_chunks()
        return _pa.table(
            {dst: _pa.concat_arrays([k, _pa.array([-1], type=_pa.int64())])}
        )

    return ds.map_batches(per_block, batch_format="pyarrow")


def _collect_stale_plans() -> None:
    """Throttled driver-side collect at query entry.

    Ray Data plan graphs hold reference cycles; in a long session running
    many queries back-to-back (the driver's correctness harness, bench
    repeats), un-collected executors and pinned broadcast refs from PRIOR
    queries measurably degrade later ones (same ER run drifted 4s -> 34s
    over 4 in-session repeats; flat with an explicit collect). One gc per
    ~5 s at query entry bounds both the leak and the collect cost."""
    global _last_gc
    now = time.monotonic()
    if now - _last_gc > 5.0:
        _last_gc = now
        gc.collect()


def read(sf_dir: str, table: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Column-pruned read of one driver test table via the storage layer
    (Lance when available, Parquet here)."""
    _collect_stale_plans()
    return read_table(f"{sf_dir}/{table}.parquet", columns=columns)


def drop_empty_blocks(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Sanitize a dataset before it feeds a hash ``Dataset.join``.

    Ray's map_batches forwards EMPTY input blocks as ZERO-COLUMN empty
    blocks without invoking the UDF, so a per-block schema guard (a
    sentinel row appended in the UDF) misses exactly the blocks that
    need it; if the join's schema broadcast then samples such a block,
    its partitions degrade and acero fails with 'No match ... for key
    field reference'. This drops empty blocks by METADATA only — no
    block is ever fetched to the driver — and returns the dataset
    unchanged when every block is empty (callers keep a sentinel row /
    ladder gate for that case). Use on any join input that descends
    from a groupby/aggregate or a selective filter."""
    bundles = list(ds.iter_internal_ref_bundles())
    refs, dropped = [], 0
    for bun in bundles:
        for ref, meta in bun.blocks:
            if meta.num_rows is None or meta.num_rows > 0:
                refs.append(ref)
            else:
                dropped += 1
    if not refs or not dropped:
        return ds
    return ray.data.from_arrow_refs(refs)


def as_arrow(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Convert a dataset's blocks to Arrow before a wide op.

    Ray's sort-based groupby/aggregate has two physical paths: Arrow
    blocks get vectorized sort + segmented reduce, pandas blocks fall
    into a per-group Python loop that measures ~20x slower at 10k groups
    (and far worse at 10^12-scale group counts). Every pipeline that
    produces pandas batches upstream of a groupby routes through this
    identity map so the shuffle and reduce always see Arrow."""
    return ds.map_batches(
        lambda t: t, batch_format="pyarrow", zero_copy_batch=True
    )


def join_partitions() -> int:
    """Partition count for hash joins: scale with the cluster's CPUs
    (a fixed count under-parallelizes big clusters and over-schedules
    small ones), bounded to keep aggregator actors cheap at test scale."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:  # noqa: BLE001
        cpus = 8
    return max(4, min(16, cpus))
