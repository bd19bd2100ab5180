"""Per-stage checkpoints with per-partition lineage manifests
(north_rule resumability + lineage/metrics).

A checkpointed stage writes its output as a directory of parquet part files
plus ``_manifest.json`` recording:

- stage name, config hash, completion flag;
- totals (rows, bytes, file count) and pipeline counters supplied by the
  caller (docs in, pairs generated, edges, ...);
- one entry PER PARTITION FILE (name, rows, bytes) — the lineage record
  that lets a resumed run trust exactly the partitions that finished and a
  monitoring job sum per-partition counters without reading data.

On resume, a stage whose manifest is complete, config-hash-matching, and
whose every listed partition file still exists with the recorded size is
read back instead of recomputed; any mismatch recomputes and overwrites.

Writes are atomic: data lands in ``<dir>.tmp`` and is renamed into place
after the manifest is written, so a killed run can never leave a
half-directory that resume would trust.
"""

from __future__ import annotations

import json
import os
import shutil

import ray.data


def _manifest_path(stage_dir: str) -> str:
    return os.path.join(stage_dir, "_manifest.json")


def _partition_entries(stage_dir: str) -> list[dict]:
    import pyarrow.parquet as pq

    entries = []
    for name in sorted(os.listdir(stage_dir)):
        if not name.endswith(".parquet"):
            continue
        path = os.path.join(stage_dir, name)
        entries.append(
            {
                "file": name,
                "rows": pq.read_metadata(path).num_rows,
                "bytes": os.path.getsize(path),
            }
        )
    return entries


def _manifest_valid(stage_dir: str, config_hash: str) -> bool:
    mpath = _manifest_path(stage_dir)
    if not os.path.exists(mpath):
        return False
    try:
        with open(mpath) as f:
            manifest = json.load(f)
    except (json.JSONDecodeError, OSError):
        return False
    if not manifest.get("complete") or manifest.get("config_hash") != config_hash:
        return False
    for part in manifest.get("partitions", []):
        path = os.path.join(stage_dir, part["file"])
        if not os.path.exists(path) or os.path.getsize(path) != part["bytes"]:
            return False
    return True


def stage_checkpoint(
    make_ds,
    stage: str,
    checkpoint_dir: str | None,
    config_hash: str,
    resume: bool = False,
    counters: dict | None = None,
) -> ray.data.Dataset:
    """Run ``make_ds()`` through a checkpoint boundary.

    Without a checkpoint_dir this is a passthrough (pure streaming).
    """
    if not checkpoint_dir:
        return make_ds()

    from ..sources.storage import read_table, write_table

    stage_dir = os.path.join(checkpoint_dir, stage)
    if resume and _manifest_valid(stage_dir, config_hash):
        return read_table(stage_dir)

    ds = make_ds()
    tmp_dir = stage_dir + ".tmp"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    os.makedirs(tmp_dir, exist_ok=True)
    write_table(ds, tmp_dir)
    partitions = _partition_entries(tmp_dir)
    with open(_manifest_path(tmp_dir), "w") as f:
        json.dump(
            {
                "stage": stage,
                "config_hash": config_hash,
                "num_rows": sum(p["rows"] for p in partitions),
                "num_bytes": sum(p["bytes"] for p in partitions),
                "num_files": len(partitions),
                "counters": counters or {},
                "partitions": partitions,
                "complete": True,
            },
            f,
            indent=2,
        )
    shutil.rmtree(stage_dir, ignore_errors=True)
    os.replace(tmp_dir, stage_dir)
    return read_table(stage_dir)


def read_manifest(checkpoint_dir: str, stage: str) -> dict | None:
    """Load one stage's lineage manifest (None if absent/corrupt)."""
    try:
        with open(_manifest_path(os.path.join(checkpoint_dir, stage))) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None
