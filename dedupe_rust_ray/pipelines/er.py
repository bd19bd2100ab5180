"""The flagship entity-resolution pipeline (SURVEY.md §3.4).

    docs --SpanSignatures--> profiles                     [stage 1, actor pool]
      profiles --groupby(content_hash)--> exact edges     [reference phase 2]
      profiles --emit_blocking_keys--> band rows          [stage 2]
        --groupby(block_key).map_groups--> candidate pairs [stage 3, THE shuffle]
        --groupby(pair).first--> deduped pairs             [stage 4]
        --join profiles (x2)--> pair rows with both profiles
        --PairScorer--> scored pairs --filter(score>=θ)--> near edges [stage 5]
      exact ∪ near edges --connected components--> clusters [stage 6]

Scale notes (what changes at 10^12 docs, nothing at sf0.x):
- profiles are the ONLY large intermediate that is reused by several
  consumers; with a checkpoint_dir they are written to parquet once and
  re-read (object-store-independent), otherwise materialized.
- shuffled band rows carry ~50 B/key (not the 1.3 KB profile); profiles are
  joined onto the *deduplicated* pair set instead.
- giant identical-content groups produce zero candidate pairs (exact path),
  oversized blocks degrade to neighbor chaining (stages/pairs.py).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data

from ..config import ERConfig
from ..stages.blocking import emit_blocking_keys
from ..stages.pairs import candidate_pairs_in_block, dedup_pairs
from ..stages.scoring import PairScorer
from ..stages.signatures import SpanSignatures
from ..state.checkpoint import stage_checkpoint
from ..state.unionfind import (
    distributed_connected_components,
    driver_connected_components,
)

_PROFILE_DATA_COLS = [
    "content_hash",
    "minhash_sig",
    "simhash",
    "phashes",
    "text_head",
]


def compute_profiles(docs_ds: ray.data.Dataset, cfg: ERConfig) -> ray.data.Dataset:
    # autoscaling pool (min 1): a fixed-size pool can deadlock when several
    # pools compete for a small CPU count (e.g. the 4-CPU test session)
    conc = cfg.sig_concurrency or (1, 16)
    return docs_ds.map_batches(
        SpanSignatures,
        fn_constructor_args=(cfg,),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=conc,
    )


def exact_edges_from_profiles(profiles: ray.data.Dataset) -> ray.data.Dataset:
    """Star edges (min_doc -> member) per equal-content group.

    64-bit content-hash equality stands in for byte equality (collision
    probability ~n^2/2^64 — negligible at any per-group size we allow).
    """

    def star(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []}, dtype=object)
        ids = sorted(group["doc_id"].tolist())
        root = ids[0]
        return pd.DataFrame(
            {"doc_a": [root] * (len(ids) - 1), "doc_b": ids[1:]}, dtype=object
        )

    return (
        profiles.select_columns(["doc_id", "content_hash"])
        .groupby("content_hash")
        .map_groups(star, batch_format="pandas")
    )


def _attach_profiles(
    pairs: ray.data.Dataset,
    profiles: ray.data.Dataset,
    num_partitions: int,
    *,
    broadcast_max_docs: int = 200_000,
    n_profiles: int | None = None,
) -> ray.data.Dataset:
    """Join both endpoint profiles onto the pair rows (suffix _a / _b).

    Two physical strategies, chosen by profile-set size:

    - **broadcast lookup** (small side): the profile table is ``ray.put``
      once and every scoring task indexes into it per batch — no shuffle at
      all. ~1.3 KB/doc, so 200k docs ≈ 260 MB, well within a worker heap.
    - **hash join** (scale path): two ``Dataset.join`` shuffles partitioned
      on doc_id. This is what runs at 10^12 docs, where the profile table
      can never be broadcast.
    """
    n = n_profiles if n_profiles is not None else profiles.count()
    if n <= broadcast_max_docs:
        prof_df = profiles.to_pandas().set_index("doc_id")
        ref = ray.put(prof_df)

        class AttachBoth:
            def __init__(self, ref):
                self.prof = ray.get(ref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                if batch.num_rows == 0:
                    return batch
                a = self.prof.loc[batch["doc_a"].to_pylist()]
                b = self.prof.loc[batch["doc_b"].to_pylist()]
                types = {
                    "content_hash": pa.uint64(),
                    "minhash_sig": pa.binary(),
                    "simhash": pa.uint64(),
                    "phashes": pa.binary(),
                    "text_head": pa.string(),
                }
                out = {"doc_a": batch["doc_a"], "doc_b": batch["doc_b"]}
                for c in _PROFILE_DATA_COLS:
                    out[f"{c}_a"] = pa.array(a[c].tolist(), type=types[c])
                    out[f"{c}_b"] = pa.array(b[c].tolist(), type=types[c])
                return pa.table(out)

        return pairs.map_batches(
            AttachBoth,
            fn_constructor_args=(ref,),
            batch_format="pyarrow",
            concurrency=(1, 4),
        )

    prof_a = profiles.rename_columns(
        {c: f"{c}_a" for c in _PROFILE_DATA_COLS} | {"doc_id": "doc_a"}
    ).select_columns(["doc_a"] + [f"{c}_a" for c in _PROFILE_DATA_COLS])
    prof_b = profiles.rename_columns(
        {c: f"{c}_b" for c in _PROFILE_DATA_COLS} | {"doc_id": "doc_b"}
    ).select_columns(["doc_b"] + [f"{c}_b" for c in _PROFILE_DATA_COLS])
    j = pairs.join(
        prof_a,
        join_type="inner",
        num_partitions=num_partitions,
        on=("doc_a",),
    )
    return j.join(
        prof_b,
        join_type="inner",
        num_partitions=num_partitions,
        on=("doc_b",),
    )


def _empty_clusters() -> ray.data.Dataset:
    return ray.data.from_arrow(
        pa.table(
            {
                "cluster_id": pa.array([], type=pa.string()),
                "doc_id": pa.array([], type=pa.string()),
            }
        )
    )


def er_pipeline(
    docs_ds: ray.data.Dataset, cfg: ERConfig | None = None
) -> ray.data.Dataset:
    """documents -> clusters dataset (cluster_id, doc_id), sorted.

    Only documents in a duplicate cluster (>=2 members) appear — the
    reference likewise reports only groups of size >= 2
    (/root/reference/src/main.rs:610-613).
    """
    cfg = cfg or ERConfig()
    ckpt = cfg.checkpoint_dir
    chash = cfg.config_hash()

    def make_profiles():
        return compute_profiles(docs_ds, cfg)

    if ckpt:
        profiles = stage_checkpoint(
            make_profiles, "stage1_profiles", ckpt, chash, cfg.resume
        )
    else:
        profiles = make_profiles().materialize()

    n_profiles = profiles.count()
    if n_profiles == 0:
        return _empty_clusters()

    exact = exact_edges_from_profiles(profiles)

    bands = profiles.map_batches(
        lambda b: emit_blocking_keys(b, cfg), batch_format="pyarrow"
    )
    cand = bands.groupby("block_key").map_groups(
        lambda g: candidate_pairs_in_block(g, cfg), batch_format="pandas"
    )
    pairs = dedup_pairs(cand)

    try:
        num_partitions = max(profiles.num_blocks(), 8)
    except NotImplementedError:  # lazy (checkpoint-read) dataset
        num_partitions = max(n_profiles // 500_000, 8)
    joined = _attach_profiles(
        pairs, profiles, num_partitions, n_profiles=n_profiles
    )
    scored = joined.map_batches(
        PairScorer,
        fn_constructor_args=(cfg,),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=cfg.sig_concurrency or (1, 16),
    )
    near = scored.filter(expr=f"score >= {cfg.score_threshold}").select_columns(
        ["doc_a", "doc_b"]
    )

    def make_edges():
        return exact.union(near)

    if ckpt:
        edges = stage_checkpoint(make_edges, "stage5_edges", ckpt, chash, cfg.resume)
    else:
        edges = make_edges().materialize()

    n_edges = edges.count()
    if n_edges == 0:
        return _empty_clusters()
    if n_edges <= cfg.driver_unionfind_max_edges:
        edge_df = edges.to_pandas()
        labels = ray.data.from_pandas(driver_connected_components(edge_df))
    else:
        labels = distributed_connected_components(
            edges, max_rounds=cfg.max_label_rounds
        )

    return labels.select_columns(["cluster_id", "doc_id"]).sort(
        ["cluster_id", "doc_id"]
    )
