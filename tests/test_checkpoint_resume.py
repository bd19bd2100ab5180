"""Checkpoint/lineage + resume-equivalence tests (north_rule resumability)."""

import json
import os

import pandas as pd
import pytest
import ray.data

from dedupe_rust_ray.config import ERConfig
from dedupe_rust_ray.pipelines.er import er_pipeline
from dedupe_rust_ray.sources.corpus import synth_corpus_table
from dedupe_rust_ray.state.checkpoint import stage_checkpoint


def test_stage_checkpoint_roundtrip(tmp_path):
    ds = ray.data.from_items([{"x": i} for i in range(10)])
    out = stage_checkpoint(lambda: ds, "s1", str(tmp_path), "cfg1")
    assert out.count() == 10
    m = json.load(open(tmp_path / "s1" / "_manifest.json"))
    assert m["complete"] and m["num_rows"] == 10 and m["config_hash"] == "cfg1"


def test_stage_checkpoint_resume_skips_recompute(tmp_path):
    calls = []

    def make():
        calls.append(1)
        return ray.data.from_items([{"x": i} for i in range(5)])

    stage_checkpoint(make, "s1", str(tmp_path), "cfgA", resume=False)
    out = stage_checkpoint(make, "s1", str(tmp_path), "cfgA", resume=True)
    assert len(calls) == 1  # second call reused the checkpoint
    assert out.count() == 5


def test_manifest_has_per_partition_lineage(tmp_path):
    ds = ray.data.from_items([{"x": i} for i in range(100)]).repartition(4)
    stage_checkpoint(lambda: ds, "s1", str(tmp_path), "cfg1")
    m = json.load(open(tmp_path / "s1" / "_manifest.json"))
    assert m["num_files"] == len(m["partitions"]) >= 1
    assert sum(p["rows"] for p in m["partitions"]) == 100
    assert all(p["bytes"] > 0 for p in m["partitions"])


def test_missing_partition_invalidates_resume(tmp_path):
    calls = []

    def make():
        calls.append(1)
        return ray.data.from_items([{"x": i} for i in range(50)]).repartition(2)

    stage_checkpoint(make, "s1", str(tmp_path), "cfgA")
    m = json.load(open(tmp_path / "s1" / "_manifest.json"))
    # corrupt one partition file -> resume must NOT trust the checkpoint
    victim = tmp_path / "s1" / m["partitions"][0]["file"]
    victim.write_bytes(b"truncated")
    out = stage_checkpoint(make, "s1", str(tmp_path), "cfgA", resume=True)
    assert len(calls) == 2
    assert out.count() == 50


def test_stage_checkpoint_config_mismatch_recomputes(tmp_path):
    calls = []

    def make():
        calls.append(1)
        return ray.data.from_items([{"x": i} for i in range(5)])

    stage_checkpoint(make, "s1", str(tmp_path), "cfgA", resume=False)
    stage_checkpoint(make, "s1", str(tmp_path), "cfgB", resume=True)
    assert len(calls) == 2


def test_run_er_job_output_layout(tmp_path):
    from dedupe_rust_ray.pipelines.er import run_er_job

    docs, _, _ = synth_corpus_table(60, seed=9)
    manifest = run_er_job(
        ray.data.from_arrow(docs), ERConfig(), str(tmp_path / "out")
    )
    assert manifest["complete"] and manifest["cluster_rows"] >= 2
    import glob

    parts = glob.glob(str(tmp_path / "out" / "clusters" / "*.parquet"))
    assert parts  # a directory of part files, never one giant file
    back = ray.data.read_parquet(str(tmp_path / "out" / "clusters")).to_pandas()
    assert len(back) == manifest["cluster_rows"]
    assert json.load(open(tmp_path / "out" / "run_manifest.json"))["complete"]


def test_er_resume_equivalence(tmp_path):
    """Run with checkpoints, then resume: identical output, stage 1 reused
    (SURVEY.md §5.2 item 4: resume equivalence)."""
    docs, _, _ = synth_corpus_table(80, seed=5)
    cfg1 = ERConfig(checkpoint_dir=str(tmp_path), resume=False)
    first = er_pipeline(ray.data.from_arrow(docs), cfg1).to_pandas()
    stage_dir = tmp_path / "stage1_profiles"
    mtime = os.path.getmtime(stage_dir / "_manifest.json")

    cfg2 = ERConfig(checkpoint_dir=str(tmp_path), resume=True)
    second = er_pipeline(ray.data.from_arrow(docs), cfg2).to_pandas()
    assert os.path.getmtime(stage_dir / "_manifest.json") == mtime
    pd.testing.assert_frame_equal(first, second)


def test_resume_across_fused_gate_flip(tmp_path):
    """The fused/distributed candidate gates are semantic knobs: a job
    checkpointed on one side of ``fused_band_rows_max`` must NOT silently
    reuse stage outputs when the gate flips — config_hash covers the gate,
    so resume recomputes — and the clusters must be identical in both gate
    regimes (both flip directions)."""
    docs, _, _ = synth_corpus_table(80, seed=5)

    # fused -> distributed
    cfg_fused = ERConfig(checkpoint_dir=str(tmp_path / "a"), resume=False)
    assert cfg_fused.fused_band_rows_max > 0
    first = er_pipeline(ray.data.from_arrow(docs), cfg_fused).to_pandas()
    m1 = json.load(
        open(tmp_path / "a" / "stage1_profiles" / "_manifest.json")
    )
    cfg_dist = ERConfig(
        checkpoint_dir=str(tmp_path / "a"),
        resume=True,
        fused_band_rows_max=0,  # force the distributed candidate path
        driver_unionfind_max_edges=0,  # and distributed CC
    )
    assert cfg_dist.config_hash() != cfg_fused.config_hash()
    second = er_pipeline(ray.data.from_arrow(docs), cfg_dist).to_pandas()
    m2 = json.load(
        open(tmp_path / "a" / "stage1_profiles" / "_manifest.json")
    )
    # gate flip invalidated the checkpoint: manifest was rewritten under
    # the new config hash, not reused
    assert m2["config_hash"] != m1["config_hash"]
    pd.testing.assert_frame_equal(first, second)

    # distributed -> fused (the reverse flip)
    cfg_d0 = ERConfig(
        checkpoint_dir=str(tmp_path / "b"),
        resume=False,
        fused_band_rows_max=0,
    )
    third = er_pipeline(ray.data.from_arrow(docs), cfg_d0).to_pandas()
    cfg_f1 = ERConfig(checkpoint_dir=str(tmp_path / "b"), resume=True)
    fourth = er_pipeline(ray.data.from_arrow(docs), cfg_f1).to_pandas()
    mb = json.load(
        open(tmp_path / "b" / "stage1_profiles" / "_manifest.json")
    )
    assert mb["config_hash"] == cfg_f1.config_hash()
    pd.testing.assert_frame_equal(third, fourth)
