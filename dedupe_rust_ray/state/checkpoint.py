"""Per-stage checkpoints with lineage manifests (north_rule resumability).

A checkpointed stage writes its output as a directory of parquet part files
plus ``_manifest.json`` recording the stage name, config hash, row count and
schema. On resume, a stage whose manifest exists and matches the current
config hash is *read back* instead of recomputed; any mismatch (different
config, incomplete write) recomputes and overwrites.

Writes are atomic: data lands in ``<dir>.tmp`` first and is renamed into
place after the manifest is written, so a killed run can never leave a
half-directory that resume would trust.
"""

from __future__ import annotations

import json
import os
import shutil

import ray.data


def _manifest_path(stage_dir: str) -> str:
    return os.path.join(stage_dir, "_manifest.json")


def stage_checkpoint(
    make_ds,
    stage: str,
    checkpoint_dir: str | None,
    config_hash: str,
    resume: bool = False,
) -> ray.data.Dataset:
    """Run ``make_ds()`` through a checkpoint boundary.

    Without a checkpoint_dir this is a passthrough (pure streaming).
    """
    if not checkpoint_dir:
        return make_ds()

    stage_dir = os.path.join(checkpoint_dir, stage)
    mpath = _manifest_path(stage_dir)
    if resume and os.path.exists(mpath):
        try:
            with open(mpath) as f:
                manifest = json.load(f)
            if manifest.get("config_hash") == config_hash and manifest.get(
                "complete"
            ):
                return ray.data.read_parquet(stage_dir)
        except (json.JSONDecodeError, OSError):
            pass  # corrupt manifest -> recompute

    ds = make_ds()
    tmp_dir = stage_dir + ".tmp"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    os.makedirs(tmp_dir, exist_ok=True)
    ds.write_parquet(tmp_dir)
    n_files = len(
        [f for f in os.listdir(tmp_dir) if f.endswith(".parquet")]
    )
    count = ray.data.read_parquet(tmp_dir).count()
    with open(_manifest_path(tmp_dir), "w") as f:
        json.dump(
            {
                "stage": stage,
                "config_hash": config_hash,
                "num_rows": count,
                "num_files": n_files,
                "complete": True,
            },
            f,
            indent=2,
        )
    shutil.rmtree(stage_dir, ignore_errors=True)
    os.replace(tmp_dir, stage_dir)
    return ray.data.read_parquet(stage_dir)
