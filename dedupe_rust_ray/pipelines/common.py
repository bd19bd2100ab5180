"""Shared helpers for the sf-table query pipelines (driver contract)."""

from __future__ import annotations

import ray.data


def read(sf_dir: str, table: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Column-pruned parquet read of one driver test table."""
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)
