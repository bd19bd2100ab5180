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
        # between the two size-gated paths
        parts = [t for t in ray.get(m.to_arrow_refs()) if t.num_rows]
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
