"""Incremental ER: init + delta updates must equal a full batch rerun
(time ∝ delta is the design goal; equality is the correctness bar)."""

import dataclasses

import numpy as np
import pandas as pd
import pytest
import ray.data

from dedupe_rust_ray.config import ERConfig
from dedupe_rust_ray.pipelines.er import er_pipeline
from dedupe_rust_ray.pipelines.incremental import (
    incremental_er_update,
    init_er_state,
    read_state,
    read_state_clusters,
)
from dedupe_rust_ray.sources.corpus import synth_corpus_table


def _split(docs, mod: int, rem):
    idx = np.arange(docs.num_rows)
    keep = np.isin(idx % mod, rem)
    return docs.take(np.flatnonzero(keep))


def _clusters_df(ds) -> pd.DataFrame:
    return (
        ds.to_pandas()
        .sort_values(["cluster_id", "doc_id"])
        .reset_index(drop=True)
    )


def test_incremental_matches_full_rerun(tmp_path):
    docs, _, _ = synth_corpus_table(120, seed=3)
    # interleaved split cuts duplicate families across old/new, so the
    # update must attach new docs to existing clusters AND merge clusters
    base = _split(docs, 4, [1, 2, 3])
    delta = _split(docs, 4, [0])
    cfg = ERConfig()

    full = _clusters_df(er_pipeline(ray.data.from_arrow(docs), cfg))

    state = init_er_state(ray.data.from_arrow(base), cfg, str(tmp_path / "s"))
    assert state["complete"]
    state = incremental_er_update(
        ray.data.from_arrow(delta), cfg, str(tmp_path / "s")
    )
    got = _clusters_df(read_state_clusters(str(tmp_path / "s")))
    pd.testing.assert_frame_equal(got, full)
    assert state["updates"][0]["new_docs"] == delta.num_rows
    assert state["n_docs"] == docs.num_rows


def test_incremental_two_sequential_updates(tmp_path):
    docs, _, _ = synth_corpus_table(90, seed=17)
    base = _split(docs, 3, [0])
    d1 = _split(docs, 3, [1])
    d2 = _split(docs, 3, [2])
    cfg = ERConfig()

    full = _clusters_df(er_pipeline(ray.data.from_arrow(docs), cfg))

    init_er_state(ray.data.from_arrow(base), cfg, str(tmp_path / "s"))
    incremental_er_update(ray.data.from_arrow(d1), cfg, str(tmp_path / "s"))
    state = incremental_er_update(
        ray.data.from_arrow(d2), cfg, str(tmp_path / "s")
    )
    got = _clusters_df(read_state_clusters(str(tmp_path / "s")))
    pd.testing.assert_frame_equal(got, full)
    assert len(state["updates"]) == 2
    # profile state grew to the full corpus
    assert state["n_docs"] == docs.num_rows


def test_incremental_empty_delta_is_noop(tmp_path):
    docs, _, _ = synth_corpus_table(40, seed=8)
    cfg = ERConfig()
    init_er_state(ray.data.from_arrow(docs), cfg, str(tmp_path / "s"))
    before = _clusters_df(read_state_clusters(str(tmp_path / "s")))
    state = incremental_er_update(
        ray.data.from_arrow(docs.slice(0, 0)), cfg, str(tmp_path / "s")
    )
    after = _clusters_df(read_state_clusters(str(tmp_path / "s")))
    pd.testing.assert_frame_equal(before, after)
    assert state["updates"] == []


def test_incremental_config_mismatch_raises(tmp_path):
    docs, _, _ = synth_corpus_table(30, seed=8)
    cfg = ERConfig()
    init_er_state(ray.data.from_arrow(docs), cfg, str(tmp_path / "s"))
    other = dataclasses.replace(cfg, score_threshold=0.9)
    with pytest.raises(ValueError, match="different config"):
        incremental_er_update(
            ray.data.from_arrow(docs.slice(0, 4)), other, str(tmp_path / "s")
        )


def test_incremental_state_readable(tmp_path):
    docs, _, _ = synth_corpus_table(40, seed=8)
    cfg = ERConfig()
    init_er_state(ray.data.from_arrow(docs), cfg, str(tmp_path / "s"))
    st = read_state(str(tmp_path / "s"))
    assert st["config_hash"] == cfg.config_hash()
    assert st["n_docs"] == docs.num_rows
