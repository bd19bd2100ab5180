"""Storage layer: Lance when available, Parquet otherwise.

The north rule targets Lance tables of interleaved documents; this sandbox
has no ``pylance`` (no network), so the Lance path is gated on import and the
Parquet fallback uses an identical schema + directory layout. Both layouts are
a *directory of part files* (never one giant file) so a resumed run can skip
finished partitions (SURVEY.md §4.2; reference analog: the one-shot JSON sink
at /root/reference/src/main.rs:282-350 — which we deliberately do not copy).
"""

from __future__ import annotations

import ray.data


try:  # pragma: no cover - not installable in this sandbox
    import lance  # noqa: F401

    _HAVE_LANCE = True
except ImportError:
    _HAVE_LANCE = False


def storage_format() -> str:
    """'lance' when pylance is importable, else 'parquet'."""
    return "lance" if _HAVE_LANCE else "parquet"


def read_table(path: str, *, columns: list[str] | None = None,
               **kwargs) -> ray.data.Dataset:
    """Read a table directory/file written by :func:`write_table`.

    Column pruning is pushed to the reader — callers should always pass
    ``columns`` when they do not need the full row (prune at the read).
    """
    if _HAVE_LANCE and (path.endswith(".lance") or _looks_lance(path)):
        return ray.data.read_lance(path, columns=columns, **kwargs)
    return ray.data.read_parquet(path, columns=columns, **kwargs)


def write_table(ds: ray.data.Dataset, path: str, **kwargs) -> None:
    """Write a dataset as a directory of part files (resumable layout)."""
    if _HAVE_LANCE and path.endswith(".lance"):
        ds.write_lance(path, **kwargs)
        return
    ds.write_parquet(path, **kwargs)


def _looks_lance(path: str) -> bool:
    import os

    return os.path.isdir(path) and any(
        name.endswith(".lance") for name in os.listdir(path)
    )
