"""Shared helpers for the sf-table query pipelines (driver contract)."""

from __future__ import annotations

import ray.data

from ..sources.storage import read_table


def read(sf_dir: str, table: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Column-pruned read of one driver test table via the storage layer
    (Lance when available, Parquet here)."""
    return read_table(f"{sf_dir}/{table}.parquet", columns=columns)
