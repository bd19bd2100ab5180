"""Skew endurance: one pathological hot block through the FULL distributed
ER pipeline (VERDICT r4 item 7).

``synth_corpus_skewed`` plants ``hot_n`` byte-identical media-rich docs —
one content hash, one pHash, identical LSH bands — so every blocking stage
sees a single giant key. The guards under test:

- the candidate kernel skips equal-``content_hash`` pairs outright, so the
  hot clique contributes ZERO scored pairs (``stages/pairs.py:59``);
- the exact-dup fast path connects the clique with hot_n-1 chain edges;
- ``max_pairs_per_shard`` hard-caps any residual shard output, so a tight
  cap must not change the result (the scored path carries no information
  the exact path doesn't already have for the hot block).

The reference would process this as one rayon group and materialize the
full O(n^2) pair list (/root/reference/src/main.rs:365-435) — this fixture
is exactly the input shape that design cannot survive at scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray

from dedupe_rust_ray.config import ERConfig
from dedupe_rust_ray.pipelines.er import er_pipeline
from dedupe_rust_ray.sources.corpus import (
    synth_corpus_distributed,
    synth_corpus_skewed,
)

N_BASE = 1000
HOT_N = 300


def _doc_ids(ds) -> list[str]:
    return sorted(
        r["doc_id"] for r in ds.select_columns(["doc_id"]).take_all()
    )


def test_skewed_corpus_exact_hot_count_any_layout():
    """Exactly hot_n hot docs regardless of input block layout, and the
    base-doc population is synth_corpus_distributed(n_base) unchanged —
    the hot block only shifts interleave positions."""
    ids_3 = _doc_ids(synth_corpus_skewed(N_BASE, HOT_N, blocks=3))
    ids_16 = _doc_ids(synth_corpus_skewed(N_BASE, HOT_N, blocks=16))
    assert ids_3 == ids_16  # layout-independent generation
    hot = [i for i in ids_3 if i.startswith("hot-")]
    assert len(hot) == HOT_N
    assert hot == [f"hot-{i:09d}" for i in range(HOT_N)]

    base = [i for i in ids_3 if not i.startswith("hot-")]
    plain = _doc_ids(synth_corpus_distributed(N_BASE, blocks=4, media_rich=True))
    assert base == plain


def test_hot_block_contributes_zero_scored_pairs():
    """The kernel-level guard: a giant block of equal-content-hash docs
    emits no candidate pairs at all (not capped — zero), because the exact
    path already owns the clique."""
    from dedupe_rust_ray.stages.pairs import candidate_pairs_in_shard

    n = 5000
    g = pd.DataFrame(
        {
            "block_key": np.zeros(n, dtype=np.uint64),
            "doc_id": [f"hot-{i:09d}" for i in range(n)],
            "content_hash": np.full(n, 0xDEADBEEF, dtype=np.uint64),
        }
    )
    pairs = candidate_pairs_in_shard(g, ERConfig())
    assert len(pairs) == 0


@pytest.mark.parametrize("max_pairs", [2_000_000, 2_000])
def test_skew_endurance_distributed_end_to_end(max_pairs):
    """Full pipeline, distributed candidate path + distributed CC +
    hash-join scorer forced, with the default and a TIGHT per-shard pair
    cap: the hot clique must come out as ONE cluster of hot_n members and
    the planted base clusters must be exact closed-form, identically at
    both cap levels (the cap may only drop redundant scored pairs)."""
    corpus = synth_corpus_skewed(N_BASE, HOT_N, blocks=8).materialize()
    cfg = ERConfig(
        fused_band_rows_max=0,  # force the distributed candidate path
        driver_unionfind_max_edges=0,  # force distributed CC
        broadcast_max_docs=0,  # force the hash-join scorer path
        max_pairs_per_shard=max_pairs,
    )
    out = er_pipeline(corpus, cfg).to_pandas()

    hot = out[out["doc_id"].str.startswith("hot-")]
    assert len(hot) == HOT_N
    assert hot["cluster_id"].nunique() == 1
    assert hot["cluster_id"].iloc[0] == "hot-000000000"

    # closed-form planted truth: roles 0 (exact copy) and 1 (near dup)
    # each produce one 2-doc cluster per tenth of n_base; distractors and
    # singletons never cluster
    n_pair_clusters = 2 * (N_BASE // 10)
    assert len(out) == HOT_N + 2 * n_pair_clusters
    assert out["cluster_id"].nunique() == 1 + n_pair_clusters
    base = out[~out["doc_id"].str.startswith("hot-")]
    sizes = base.groupby("cluster_id").size()
    assert (sizes == 2).all()
