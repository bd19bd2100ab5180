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

    Format dispatch by extension: ``.lance`` (when pylance is present),
    ``.csv``, ``.json``/``.jsonl``, else Parquet. Column pruning is
    pushed to the reader where the format supports a pushdown (Parquet,
    Lance); row-oriented formats (CSV/JSONL) must read full rows, so the
    prune is applied right after the scan — callers should always pass
    ``columns`` when they do not need the full row.
    """
    if _HAVE_LANCE and (path.endswith(".lance") or _looks_lance(path)):
        return ray.data.read_lance(path, columns=columns, **kwargs)
    if path.endswith(".csv") or _dir_of(path, ".csv"):
        ds = ray.data.read_csv(path, **kwargs)
        return ds.select_columns(columns) if columns else ds
    if path.endswith((".json", ".jsonl")) or _dir_of(path, (".json", ".jsonl")):
        ds = ray.data.read_json(path, **kwargs)
        return ds.select_columns(columns) if columns else ds
    return ray.data.read_parquet(path, columns=columns, **kwargs)


def write_table(ds: ray.data.Dataset, path: str, *, fmt: str | None = None,
                **kwargs) -> None:
    """Write a dataset as a directory of part files (resumable layout).

    ``fmt`` overrides the extension dispatch: 'parquet' (default),
    'csv', 'json' (JSONL part files), 'lance' (when available)."""
    fmt = fmt or _ext_fmt(path)
    if fmt == "lance":
        if not _HAVE_LANCE:
            raise RuntimeError("pylance not available in this environment")
        ds.write_lance(path, **kwargs)
    elif fmt == "csv":
        ds.write_csv(path, **kwargs)
    elif fmt == "json":
        ds.write_json(path, **kwargs)
    else:
        ds.write_parquet(path, **kwargs)


def _ext_fmt(path: str) -> str:
    for fmt, exts in (
        ("lance", (".lance",)),
        ("csv", (".csv",)),
        ("json", (".json", ".jsonl")),
    ):
        if path.endswith(exts):
            return fmt
    return "parquet"


def _dir_of(path: str, exts) -> bool:
    import os

    # Underscore/dot-prefixed files are sidecar metadata (e.g. the
    # checkpoint layer's ``_manifest.json``), not data parts — a directory
    # of parquet parts plus a manifest must still dispatch to parquet.
    return os.path.isdir(path) and any(
        name.endswith(exts)
        for name in os.listdir(path)
        if not name.startswith(("_", "."))
    )


def _looks_lance(path: str) -> bool:
    import os

    return os.path.isdir(path) and any(
        name.endswith(".lance") for name in os.listdir(path)
    )
