"""Shared helpers for the sf-table query pipelines (driver contract)."""

from __future__ import annotations

import ray.data

from ..sources.storage import read_table


def read(sf_dir: str, table: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Column-pruned read of one driver test table via the storage layer
    (Lance when available, Parquet here)."""
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
