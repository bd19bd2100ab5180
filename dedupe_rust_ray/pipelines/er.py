"""The flagship entity-resolution pipeline (SURVEY.md §3.4).

    docs --SpanSignatures--> profiles                      [stage 1]
      profiles --shard groupby(content_hash)--> exact edges [reference phase 2]
      profiles --emit_blocking_keys--> (shard, key, doc, aux) rows [stage 2]
        --groupby(shard) + in-shard enumeration--> candidate pairs [stage 3]
        --pair-shard groupby--> deduped pairs               [stage 4]
        --fused broadcast scorer | 2x hash join + PairScorer-->
          scored pairs --filter(score>=θ)--> near edges     [stage 5]
      exact ∪ near edges --connected components--> clusters [stage 6]

Scale notes (what changes at 10^12 docs, nothing at sf0.x):
- profiles are the ONLY large intermediate reused by several consumers;
  with a checkpoint_dir they are written to parquet once and re-read
  (object-store-independent), otherwise materialized.
- shuffled band rows carry ~60 B/key (never the 1.3 KB profile); scoring
  reads profiles from a zero-copy broadcast while they fit
  (cfg.broadcast_max_docs) and hash-joins them onto the deduplicated pair
  set beyond that.
- giant identical-content groups produce zero candidate pairs (exact path),
  oversized blocks degrade to neighbor chaining, random pHash-chunk
  collisions die at in-shard Hamming verification (stages/pairs.py).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data

from ..config import ERConfig
from ..stages.blocking import count_blocking_keys, emit_blocking_keys
from ..stages.pairs import attach_to_pairs, candidate_pairs_in_shard, dedup_pairs
from ..stages.scoring import PairScorer, broadcast_score_batch, pack_profiles
from ..stages.signatures import SpanSignatures, span_signatures_batch
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


@ray.remote(num_cpus=1)
def _pack_profiles_task(*tables: pa.Table) -> tuple:
    """Remote broadcast pack: concat + pack happen in ONE worker whose
    output lands directly in the object store — the driver never
    downloads the (corpus-linear) profile table, and downstream stages
    overlap the packing."""
    return pack_profiles(
        pa.concat_tables(list(tables), promote_options="default")
    )


def compute_profiles(docs_ds: ray.data.Dataset, cfg: ERConfig) -> ray.data.Dataset:
    # elastic tasks + per-process instance cache (stages/signatures.py):
    # scales to every core instantly, no actor-pool ramp-up. A genuine
    # actor pool (cfg.sig_concurrency) is kept for heavy-state signatures.
    if cfg.sig_concurrency:
        return docs_ds.map_batches(
            SpanSignatures,
            fn_constructor_args=(cfg,),
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
            concurrency=cfg.sig_concurrency,
        )
    return docs_ds.map_batches(
        span_signatures_batch,
        fn_args=(cfg,),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
    )


def exact_edges_from_profiles(
    profiles: ray.data.Dataset,
    n_shards: int = 64,
    n_rows: int | None = None,
    fused_max_rows: int = 2_000_000,
) -> ray.data.Dataset:
    """Star edges per equal-content group, sharded — ALL NUMERIC: rows are
    (shard, idh, content_hash), so even the exact path's full-corpus pass
    never shuffles doc_id strings. The star root is the group's min idh —
    connectivity is all that matters here, because the lexicographic
    ``cluster_id = min(doc_id)`` canonicalization happens at the
    connected-component level after edges are mapped back to strings.

    The shuffle key is ``content_hash % n_shards`` (a hash group never
    spans shards) and the per-hash grouping happens vectorized inside the
    shard task — no per-group Ray overhead for millions of distinct
    hashes. 64-bit content-hash equality stands in for byte equality
    (collision probability ~n^2/2^64 — negligible at any per-group size
    we allow)."""

    def add_shard(batch: pa.Table) -> pa.Table:
        import numpy as np

        shard = (batch["content_hash"].to_numpy() % np.uint64(n_shards)).astype(
            "int32"
        )
        return pa.table(
            {
                "shard": pa.array(shard, type=pa.int32()),
                "idh": batch["idh"],
                "content_hash": batch["content_hash"],
            }
        )

    def star_in_shard(group: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        g = group.sort_values(["content_hash", "idh"], ignore_index=True)
        h = g["content_hash"].to_numpy()
        ids = g["idh"].to_numpy()
        bounds = np.flatnonzero(np.r_[True, h[1:] != h[:-1], True])
        sizes = np.diff(bounds)
        starts = bounds[:-1]
        multi = sizes >= 2
        if not multi.any():
            return pd.DataFrame(
                {
                    "doc_a": pd.Series(dtype="uint64"),
                    "doc_b": pd.Series(dtype="uint64"),
                }
            )
        roots = np.repeat(ids[starts[multi]], sizes[multi] - 1)
        member_idx = np.concatenate(
            [np.arange(s + 1, s + n) for s, n in zip(starts[multi], sizes[multi])]
        )
        return pd.DataFrame({"doc_a": roots, "doc_b": ids[member_idx]})

    cols = profiles.select_columns(["idh", "content_hash"])
    if n_rows is not None and n_rows <= fused_max_rows:
        # fused fold: the (idh, content_hash) relation is 16 B/row
        # (<=32 MB under the ceiling) — gather once and run the SAME
        # vectorized star kernel globally, eliding the shard exchange.
        # A content_hash never spans shards, so the edge set is identical.
        parts = [t for t in ray.get(cols.to_arrow_refs()) if len(t)]
        if not parts:
            return _empty_uint64_edges()
        df = pa.concat_tables(parts).to_pandas()
        return ray.data.from_arrow(
            pa.Table.from_pandas(star_in_shard(df), preserve_index=False)
        )
    return (
        cols.map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(star_in_shard, batch_format="pandas")
        .select_columns(["doc_a", "doc_b"])
    )


def _attach_profiles(
    pairs: ray.data.Dataset,
    profiles: ray.data.Dataset,
    num_partitions: int,
) -> ray.data.Dataset:
    """Hash-join both endpoint profiles onto the pair rows (suffix _a/_b)
    — the SCALE path, used when the profile set is too large to broadcast.
    Pair endpoints are uint64 ``idh`` hashes, so the join keys are
    fixed-width numerics. The small-side alternative is the fused
    broadcast scorer in :func:`er_pipeline`."""
    return attach_to_pairs(
        pairs, profiles, _PROFILE_DATA_COLS, num_partitions, side_key="idh"
    )


def _empty_uint64_edges() -> ray.data.Dataset:
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_a": pa.array([], type=pa.uint64()),
                "doc_b": pa.array([], type=pa.uint64()),
            }
        )
    )


_IDMAP_CACHE: dict[str, tuple] = {}


def _attach_doc_ids(
    edges_h: ray.data.Dataset,
    profiles: ray.data.Dataset,
    n_profiles: int,
    cfg: ERConfig,
    num_partitions: int,
    prebuilt_table: pa.Table | None = None,
) -> ray.data.Dataset:
    """Map uint64 ``idh`` edge endpoints back to doc_id strings.

    The edge set is small relative to the corpus (duplicates only), so
    this is the ONLY place strings re-enter the tail. The (sorted idh ->
    doc_id) map ships once via ``ray.put`` — built from
    ``prebuilt_table`` (the scorer's broadcast profile set, which already
    covers every near-edge endpoint) when available, from the whole
    profile set below the broadcast ceiling, or from an endpoint-reduced
    profile scan above it (edge endpoints are gathered first — 8 B each —
    and only their id/doc_id rows leave the profile partitions). The
    double hash join remains the last resort for edge sets whose endpoint
    count alone exceeds the ceiling."""
    import numpy as np

    reduce_ids: np.ndarray | None = None
    if prebuilt_table is None and n_profiles > cfg.broadcast_max_docs:
        edges_h = edges_h.materialize()

        def batch_ids(b: pa.Table) -> pa.Table:
            ids = (
                np.unique(
                    np.concatenate(
                        [b["doc_a"].to_numpy(), b["doc_b"].to_numpy()]
                    )
                )
                if b.num_rows
                else np.empty(0, np.uint64)
            )
            return pa.table({"idh": pa.array(ids, type=pa.uint64())})

        parts = ray.get(
            edges_h.map_batches(batch_ids, batch_format="pyarrow").to_arrow_refs()
        )

        def part_ids(t):
            names = getattr(t, "column_names", None) or list(
                getattr(t, "columns", [])
            )
            if "idh" not in names or not len(t):
                return np.empty(0, np.uint64)
            return t["idh"].to_numpy().astype(np.uint64, copy=False)

        reduce_ids = (
            np.unique(np.concatenate([part_ids(t) for t in parts]))
            if parts
            else np.empty(0, np.uint64)
        )
        if len(reduce_ids) > cfg.broadcast_max_docs:
            reduce_ids = None  # fall through to the join path

    if (
        prebuilt_table is not None
        or n_profiles <= cfg.broadcast_max_docs
        or reduce_ids is not None
    ):
        if prebuilt_table is not None:
            t = prebuilt_table.select(["doc_id", "idh"])
        else:
            side = profiles.select_columns(["doc_id", "idh"])
            if reduce_ids is not None:
                rref = ray.put(reduce_ids)

                def keep(b: pa.Table) -> pa.Table:
                    cand = ray.get(rref)
                    h = b["idh"].to_numpy().astype(np.uint64, copy=False)
                    pos = np.searchsorted(cand, h)
                    pos = np.minimum(pos, max(len(cand) - 1, 0))
                    m = (
                        cand[pos] == h
                        if len(cand)
                        else np.zeros(len(h), bool)
                    )
                    return b.filter(pa.array(m))

                side = side.map_batches(keep, batch_format="pyarrow")
            t = pa.concat_tables(
                ray.get(side.to_arrow_refs()), promote_options="default"
            )
        idh = t["idh"].to_numpy().astype("uint64", copy=False)
        order = np.argsort(idh, kind="stable")
        ids_sorted = np.asarray(t["doc_id"].to_pylist(), dtype=object)[order]
        ref = ray.put((idh[order], ids_sorted))

        def to_ids(batch: pa.Table) -> pa.Table:
            key = ref.hex() if hasattr(ref, "hex") else str(id(ref))
            cached = _IDMAP_CACHE.get(key)
            if cached is None:
                _IDMAP_CACHE.clear()
                cached = _IDMAP_CACHE.setdefault(key, ray.get(ref))
            hs, ids = cached

            def look(col):
                h = col.to_numpy().astype("uint64", copy=False)
                pos = np.searchsorted(hs, h)
                return pa.array(ids[pos], type=pa.string())

            return pa.table(
                {"doc_a": look(batch["doc_a"]), "doc_b": look(batch["doc_b"])}
            )

        return edges_h.map_batches(to_ids, batch_format="pyarrow")

    joined = attach_to_pairs(
        edges_h, profiles, ["doc_id"], num_partitions, side_key="idh"
    )
    return joined.select_columns(["doc_id_a", "doc_id_b"]).rename_columns(
        {"doc_id_a": "doc_a", "doc_id_b": "doc_b"}
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


def run_er_job(
    docs_ds: ray.data.Dataset,
    cfg: ERConfig,
    out_dir: str,
) -> dict:
    """End-to-end job: cluster ``docs_ds`` and persist results resumably.

    Writes ``out_dir/clusters/`` as a directory of parquet part files plus
    ``out_dir/run_manifest.json`` with counters and timing — the engine's
    analog of the reference's timestamped results JSON
    (/root/reference/src/main.rs:282-350), structured for machine
    consumption and re-runs instead of console reading. Combined with
    ``cfg.checkpoint_dir`` / ``cfg.resume``, a killed job restarts from its
    last complete stage and rewrites only the final output.
    """
    import json
    import os
    import time as _time

    from ..report import format_duration

    t0 = _time.time()
    clusters = er_pipeline(docs_ds, cfg)
    out_clusters = os.path.join(out_dir, "clusters")
    tmp = out_clusters + ".tmp"
    import shutil

    from ..sources.storage import read_table, write_table

    shutil.rmtree(tmp, ignore_errors=True)
    write_table(clusters, tmp)
    shutil.rmtree(out_clusters, ignore_errors=True)
    os.replace(tmp, out_clusters)

    back = read_table(out_clusters)
    n_rows = back.count()
    n_clusters = back.unique("cluster_id")
    manifest = {
        "config_hash": cfg.config_hash(),
        "cluster_rows": n_rows,
        "n_clusters": len(n_clusters),
        "elapsed": format_duration(_time.time() - t0),
        "elapsed_sec": round(_time.time() - t0, 2),
        "output": "clusters/",
        "complete": True,
    }
    with open(os.path.join(out_dir, "run_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def er_pipeline(
    docs_ds: ray.data.Dataset, cfg: ERConfig | None = None
) -> ray.data.Dataset:
    """documents -> clusters dataset (cluster_id, doc_id), sorted.

    Only documents in a duplicate cluster (>=2 members) appear — the
    reference likewise reports only groups of size >= 2
    (/root/reference/src/main.rs:610-613).
    """
    import os
    import time as _time

    from .common import _collect_stale_plans

    _collect_stale_plans()  # stale plan graphs from prior queries (see common)
    trace = os.environ.get("GRAFT_ER_TRACE") == "1"
    _t0 = _time.time()

    def _tr(msg: str) -> None:
        if trace:
            print(f"[er +{_time.time() - _t0:7.1f}s] {msg}", flush=True)

    cfg = cfg or ERConfig()
    ckpt = cfg.checkpoint_dir
    chash = cfg.config_hash()

    def make_profiles():
        return compute_profiles(docs_ds, cfg)

    if ckpt:
        profiles = stage_checkpoint(
            make_profiles, "stage1_profiles", ckpt, chash, cfg.resume,
            counters={"stage_role": "per-document signature profiles"},
        )
    else:
        profiles = make_profiles().materialize()
    _tr("profiles materialized")

    n_profiles = profiles.count()
    _tr(f"profiles count={n_profiles}")
    if n_profiles == 0:
        return _empty_clusters()

    # the exact fold's fused ceiling is LOWER than the candidate one: at
    # a few hundred k rows the driver fold costs the same as the shard
    # exchange (~0.55 s measured at 468k) but loses the streaming
    # executor's overlap with candidate generation — fuse only where the
    # exchange's fixed barrier dominates outright
    exact_h = exact_edges_from_profiles(
        profiles,
        n_rows=n_profiles,
        fused_max_rows=min(200_000, cfg.fused_band_rows_max),
    )

    # size-gate WITHOUT executing/pinning the exploded key relation: the
    # exact emitted-row count is derivable per profile block (text docs x
    # lsh_bands + 4 x pHash spans) and summed as a STREAMING one-int-per-
    # block aggregate — at scale the ~26 B/row band relation previously
    # pinned here just to call .count() is corpus-linear and spills, and
    # gathering profile block refs would transiently pin the (also
    # corpus-linear) profile table on the checkpointed path
    n_bands = int(
        profiles.map_batches(
            lambda b: pa.table({"n_keys": [count_blocking_keys(b, cfg)]}),
            batch_format="pyarrow",
        ).sum("n_keys")
        or 0
    )
    _tr(f"blocking keys (counted, not pinned): {n_bands}")
    bands = profiles.map_batches(
        lambda b: emit_blocking_keys(b, cfg), batch_format="pyarrow"
    )
    if n_bands <= cfg.fused_band_rows_max:
        # fused candidate path (cfg.fused_band_rows_max): the blocking-key
        # compute above stays distributed; only the ~26 B/row exploded key
        # relation gathers. candidate_pairs_in_shard runs once PER SHARD
        # GROUP of the gathered relation — identical grouping AND identical
        # per-shard cfg.max_pairs_per_shard cap semantics to the
        # distributed map_groups path (a single global call would apply
        # the cap globally, shrinking the pair set whenever it binds)
        parts = [t for t in ray.get(bands.to_arrow_refs()) if t.num_rows]
        if parts:
            gdf = pa.concat_tables(parts).to_pandas()
            shard_pdfs = [
                candidate_pairs_in_shard(g, cfg)
                for _, g in gdf.groupby("shard", sort=True)
            ]
            pdf = pd.concat(shard_pdfs, ignore_index=True).drop_duplicates(
                ["doc_a", "doc_b"]
            )
        else:
            pdf = pd.DataFrame(
                {
                    "doc_a": pd.Series(dtype="uint64"),
                    "doc_b": pd.Series(dtype="uint64"),
                }
            )
        pairs = ray.data.from_arrow(
            pa.Table.from_pandas(pdf, preserve_index=False)
        )
        _tr(f"fused candidates: {len(pdf)} pairs")
    elif n_bands <= 8 * cfg.fused_band_rows_max:
        # mid regime: the pair relation is plausibly small enough for the
        # in-process cross-band dedup fold, so materializing it to count
        # is affordable (pairs are 16 B/row and per-shard capped)
        cand = bands.groupby("shard").map_groups(
            lambda g: candidate_pairs_in_shard(g, cfg), batch_format="pandas"
        ).materialize()
        if cand.count() <= cfg.fused_band_rows_max:
            # pairs are per-shard-deduped already and tiny relative to
            # the band rows: collapse cross-band duplicates in-process
            # instead of paying the pair-shard exchange
            parts = []
            for t in ray.get(cand.to_arrow_refs()):
                if not len(t):
                    continue
                if isinstance(t, pd.DataFrame):  # map_groups pandas blocks
                    t = pa.Table.from_pandas(t, preserve_index=False)
                parts.append(t)
            if parts:
                pdf = (
                    pa.concat_tables(parts)
                    .to_pandas()
                    .drop_duplicates(["doc_a", "doc_b"])
                )
            else:
                pdf = pd.DataFrame(
                    {
                        "doc_a": pd.Series(dtype="uint64"),
                        "doc_b": pd.Series(dtype="uint64"),
                    }
                )
            pairs = ray.data.from_arrow(
                pa.Table.from_pandas(pdf, preserve_index=False)
            )
            _tr(f"in-process pair dedup: {len(pdf)} pairs")
        else:
            pairs = dedup_pairs(cand, cfg.n_shards)
    else:
        # scale path: no materialize anywhere — candidate enumeration
        # streams from the shard exchange straight into the pair-shard
        # dedup exchange, overlapping with the broadcast pack below
        cand = bands.groupby("shard").map_groups(
            lambda g: candidate_pairs_in_shard(g, cfg), batch_format="pandas"
        )
        pairs = dedup_pairs(cand, cfg.n_shards)

    def broadcast_scored(prof_ds):
        # ship packed profiles once and score pairs in a fused stage — no
        # join shuffle at all. The pack runs as ONE remote task over the
        # profile block refs: the driver never downloads the profile
        # table (linear in corpus size — ~600 MB at 468k docs, minutes of
        # serial time at the 1M-doc broadcast ceiling), and candidate-pair
        # generation overlaps the packing.
        # NOTE: ref is captured in a closure, NOT passed via fn_args — Ray
        # resolves ObjectRefs appearing in task args, which would ship and
        # deserialize the full broadcast payload once PER TASK; a closure
        # keeps it a reference, fetched once per worker process and cached.
        ref = _pack_profiles_task.remote(*prof_ds.to_arrow_refs())
        _tr("broadcast pack dispatched (remote)")
        return pairs.map_batches(
            lambda b: broadcast_score_batch(b, ref, cfg),
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
        )

    if n_profiles <= cfg.broadcast_max_docs:
        scored = broadcast_scored(profiles)
    else:
        # corpus too large to broadcast whole — but scoring only needs the
        # profiles of docs that appear in candidate pairs (the duplicate-
        # suspect minority at real dup rates). Semi-join reduction: gather
        # distinct candidate ids (8 B each), filter profiles to them, and
        # broadcast THAT if it fits; only when even the candidate set is
        # too large does the full hash join run.
        import numpy as np

        pairs = pairs.materialize()

        def batch_ids(b: pa.Table) -> pa.Table:
            ids = np.unique(
                np.concatenate(
                    [b["doc_a"].to_numpy(), b["doc_b"].to_numpy()]
                )
            ) if b.num_rows else np.empty(0, np.uint64)
            return pa.table({"idh": pa.array(ids, type=pa.uint64())})

        id_parts = ray.get(
            pairs.map_batches(batch_ids, batch_format="pyarrow").to_arrow_refs()
        )

        def part_ids(t):
            # empty upstream blocks can pass through as schema-less
            # pandas blocks — treat anything without an idh column as empty
            names = getattr(t, "column_names", None) or list(
                getattr(t, "columns", [])
            )
            if "idh" not in names or not len(t):
                return np.empty(0, np.uint64)
            return t["idh"].to_numpy().astype(np.uint64, copy=False)

        cand_ids = (
            np.unique(np.concatenate([part_ids(t) for t in id_parts]))
            if id_parts
            else np.empty(0, np.uint64)
        )
        _tr(f"candidate endpoints: {len(cand_ids)} of {n_profiles}")
        if len(cand_ids) <= cfg.broadcast_max_docs:
            cref = ray.put(cand_ids)  # sorted uint64, zero-copy per worker

            def keep_candidates(b: pa.Table) -> pa.Table:
                cand = ray.get(cref)
                h = b["idh"].to_numpy().astype(np.uint64, copy=False)
                pos = np.searchsorted(cand, h)
                pos = np.minimum(pos, max(len(cand) - 1, 0))
                m = cand[pos] == h if len(cand) else np.zeros(len(h), bool)
                return b.filter(pa.array(m))

            scored = broadcast_scored(
                profiles.map_batches(keep_candidates, batch_format="pyarrow")
            )
        else:
            # full scale path: hash-join profiles onto pairs on numeric idh
            try:
                num_partitions = max(profiles.num_blocks(), 8)
            except NotImplementedError:  # lazy (checkpoint-read) dataset
                num_partitions = max(n_profiles // 500_000, 8)
            joined = _attach_profiles(pairs, profiles, num_partitions)
            scored = joined.map_batches(
                PairScorer,
                fn_constructor_args=(cfg,),
                batch_format="pyarrow",
                batch_size=cfg.batch_size,
                concurrency=cfg.sig_concurrency or (1, 16),
            )
    near_h = scored.filter(expr=f"score >= {cfg.score_threshold}").select_columns(
        ["doc_a", "doc_b"]
    )
    try:
        num_partitions = max(profiles.num_blocks(), 8)
    except NotImplementedError:
        num_partitions = max(n_profiles // 500_000, 8)
    # the id map is built from a 2-column (doc_id, idh) profile scan —
    # the driver never touches the wide profile columns (those only ever
    # exist inside the remote pack task and the scorer workers)
    near = _attach_doc_ids(
        near_h, profiles, n_profiles, cfg, num_partitions,
    )
    exact = _attach_doc_ids(
        exact_h, profiles, n_profiles, cfg, num_partitions,
    )

    def make_edges():
        return exact.union(near)

    if ckpt:
        edges = stage_checkpoint(
            make_edges, "stage5_edges", ckpt, chash, cfg.resume,
            counters={
                "stage_role": "match edges (exact-union-near)",
                "input_docs": n_profiles,
            },
        )
    else:
        edges = make_edges().materialize()
    _tr("edges materialized")

    n_edges = edges.count()
    _tr(f"edges count={n_edges}")
    if n_edges == 0:
        return _empty_clusters()
    if n_edges <= cfg.driver_unionfind_max_edges:
        edge_df = edges.to_pandas()
        labels = ray.data.from_pandas(driver_connected_components(edge_df))
        _tr("driver union-find done")
    else:
        # shard count scales with the edge set: a small graph through the
        # distributed path (e.g. the forced-distributed flagship query)
        # shouldn't pay 64-shard shuffle fixed costs per round, while big
        # graphs keep wide parallelism (~50k edge rows per shard task)
        labels = distributed_connected_components(
            edges,
            max_rounds=cfg.max_label_rounds,
            n_shards=int(min(64, max(8, n_edges // 50_000))),
        )

    from .common import canonical_sort

    return canonical_sort(
        labels.select_columns(["cluster_id", "doc_id"]),
        ["cluster_id", "doc_id"],
    )


def er_pairwise_f1_planted(
    sf_dir: str, dup_every: int = 10, truth_dup_every: int | None = None
) -> pd.DataFrame:
    """The north rule's HEADLINE metric as a registered, value-oracled
    query: pairwise precision / recall / F1 of the FULL flagship pipeline
    (blocking -> fused scoring -> distributed connected components, the
    same forced-distributed config the certified ``er_clusters`` row
    runs) against the planted-truth labels. One row:
    ``(n_true_pairs, n_pred_pairs, n_tp, precision_scaled, recall_scaled,
    f1_scaled)`` — 1e6-scaled int64 floor ratios (F1 = 2·tp/(pred+true)
    is exactly rational, so no float enters the hash).

    The planted construction makes the expected row closed-form: every
    planted companion pair is found (fused score ~0.92 >= 0.8 by
    construction) and organic edges are structurally impossible, so
    tp = pred = true and all three ratios are exactly 1.0. The hash match
    therefore certifies the END-TO-END F1 = 1.0 >= 0.99 bar — the
    blocking_quality_planted complement one stage further down the
    pipeline.

    ``truth_dup_every`` decouples the evaluation labels from the planted
    corpus so tests can pin that the measured recall/F1 actually DROP
    against a stricter truth set (the metric computes, never echoes).

    Scale: predicted pairs are never materialized — a cluster-co-located
    ``map_groups`` emits two int64 partials per cluster (k·(k−1)/2 pair
    count; true-pair hits via base-id/dup-flag parsing inside the
    cluster), folded by one sum."""
    import numpy as np

    from ..sources.corpus import corpus_planted_truth
    from .common import read

    truth_every = dup_every if truth_dup_every is None else truth_dup_every
    cfg = ERConfig(driver_unionfind_max_edges=0)
    clusters = er_pipeline(corpus_planted_truth(sf_dir, dup_every), cfg)

    def per_cluster(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["doc_id"].astype(str)
        is_dup = ids.str.endswith("-dup").to_numpy()
        base = (
            ids.str.extract(r"^doc-(\d+)", expand=False)
            .astype(np.int64)
            .to_numpy()
        )
        tp = 0
        n_pred = 0
        for _, grp in pd.DataFrame(
            {"c": g["cluster_id"], "b": base, "d": is_dup}
        ).groupby("c"):
            k = len(grp)
            n_pred += k * (k - 1) // 2
            bb = grp["b"].to_numpy()
            dd = grp["d"].to_numpy()
            both = np.intersect1d(bb[~dd], bb[dd])
            tp += int(np.count_nonzero(both % truth_every == 0))
        return pd.DataFrame(
            {"n_pred": [n_pred], "tp": [tp]}, dtype="int64"
        )

    folded = (
        clusters.groupby("cluster_id")
        .map_groups(per_cluster, batch_format="pandas")
    )
    n_pred = int(folded.sum("n_pred") or 0)
    tp = int(folded.sum("tp") or 0)

    def true_partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        import numpy as _np

        return pa.table(
            {
                "n": pa.array(
                    [int(_np.count_nonzero(ids % truth_every == 0))],
                    type=pa.int64(),
                )
            }
        )

    n_true = int(
        read(sf_dir, "documents", columns=["doc_id"])
        .map_batches(true_partial, batch_format="pyarrow")
        .sum("n")
        or 0
    )
    scale = 1_000_000
    precision = scale if n_pred == 0 else (scale * tp) // n_pred
    recall = scale if n_true == 0 else (scale * tp) // n_true
    f1 = (
        scale
        if (n_pred + n_true) == 0
        else (scale * 2 * tp) // (n_pred + n_true)
    )
    return pd.DataFrame(
        {
            "n_true_pairs": [n_true],
            "n_pred_pairs": [n_pred],
            "n_tp": [tp],
            "precision_scaled": [precision],
            "recall_scaled": [recall],
            "f1_scaled": [f1],
        }
    ).astype("int64")
