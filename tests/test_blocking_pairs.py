import numpy as np
import pandas as pd
import pyarrow as pa

from dedupe_rust_ray.config import ERConfig
from dedupe_rust_ray.sources.corpus import synth_corpus_table
from dedupe_rust_ray.stages.blocking import emit_blocking_keys
from dedupe_rust_ray.stages.pairs import candidate_pairs_in_shard
from dedupe_rust_ray.stages.signatures import SpanSignatures


def _profiles(n=40):
    docs, _, _ = synth_corpus_table(n, seed=7)
    return SpanSignatures(ERConfig())(docs)


def test_blocking_emits_keys_for_text_and_media():
    cfg = ERConfig()
    out = emit_blocking_keys(_profiles(), cfg)
    keys = out["block_key"].to_numpy()
    # numeric uint64 keys: pHash-chunk keys set bit 63, text band keys don't
    top = keys >> np.uint64(63)
    assert (top == 0).any(), "expected text band keys"
    assert (top == 1).any(), "expected pHash chunk keys"
    # aux_phash is 0 exactly on text band rows
    aux = out["aux_phash"].to_numpy()
    assert ((aux == 0) == (top == 0)).all()
    assert out.num_rows > 0
    # every exploded row keeps idh + content_hash (minimal all-numeric
    # shuffle row — no object strings ride the tail)
    assert out.column_names == [
        "shard",
        "block_key",
        "idh",
        "content_hash",
        "aux_phash",
    ]
    assert all(
        str(out.schema.field(c).type) in ("uint64", "int32")
        for c in out.column_names
    )
    # a block never spans shards
    df = out.to_pandas()
    assert (df.groupby("block_key")["shard"].nunique() == 1).all()


def test_exact_dup_docs_share_every_band():
    cfg = ERConfig()
    docs, _, _ = synth_corpus_table(60, seed=11)
    prof = SpanSignatures(cfg)(docs)
    out = emit_blocking_keys(prof, cfg)
    df = out.to_pandas()
    h = prof.to_pandas().set_index("idh")["content_hash"]
    dup_groups = h.groupby(h).filter(lambda g: len(g) > 1)
    if len(dup_groups):
        some_hash = dup_groups.iloc[0]
        ids = h[h == some_hash].index.tolist()
        keysets = [set(df[df.idh == d].block_key) for d in ids]
        assert keysets[0] == keysets[1]


def test_pair_generation_singleton_pruned():
    cfg = ERConfig()
    g = pd.DataFrame({"block_key": ["k"], "doc_id": ["a"], "content_hash": [1]})
    assert len(candidate_pairs_in_shard(g, cfg)) == 0


def test_pair_generation_skips_equal_hash():
    cfg = ERConfig()
    g = pd.DataFrame(
        {
            "block_key": ["k", "k", "k"],
            "doc_id": ["a", "b", "c"],
            "content_hash": [1, 1, 2],
        }
    )
    pairs = candidate_pairs_in_shard(g, cfg)
    got = set(zip(pairs["doc_a"], pairs["doc_b"]))
    # (a, b) share a content hash -> handled by the exact path, not here
    assert got == {("a", "c"), ("b", "c")}


def test_shard_with_multiple_blocks_no_cross_block_pairs():
    cfg = ERConfig()
    g = pd.DataFrame(
        {
            "block_key": ["k1", "k1", "k2", "k2", "k3"],
            "doc_id": ["a", "b", "c", "d", "e"],
            "content_hash": [1, 2, 3, 4, 5],
        }
    )
    pairs = candidate_pairs_in_shard(g, cfg)
    got = set(zip(pairs["doc_a"], pairs["doc_b"]))
    assert got == {("a", "b"), ("c", "d")}


def test_oversized_block_neighbor_chaining_stays_connected():
    cfg = ERConfig(max_block_size=10)
    n = 50
    g = pd.DataFrame(
        {
            "block_key": ["k"] * n,
            "doc_id": [f"d{i:03d}" for i in range(n)],
            "content_hash": range(n),
        }
    )
    pairs = candidate_pairs_in_shard(g, cfg)
    # O(n*W) not O(n^2)
    assert len(pairs) < n * 5
    # the chain connects every doc
    from dedupe_rust_ray.state.unionfind import driver_connected_components

    lab = driver_connected_components(pairs)
    assert len(set(lab["cluster_id"])) == 1
    assert len(lab) == n


def test_pathological_skew_hot_key_10k_docs():
    """One blocking key holding 10,000 docs (the all-identical-dims case
    the reference would process as a single rayon group): pair count must
    stay O(n*W) via neighbor chaining, never O(n^2); the chain must still
    connect every doc; and the shard task's output must respect
    max_pairs_per_shard."""
    cfg = ERConfig()
    n = 10_000
    g = pd.DataFrame(
        {
            "block_key": np.zeros(n, dtype=np.uint64),
            "doc_id": [f"d{i:05d}" for i in range(n)],
            "content_hash": np.arange(n, dtype=np.uint64),
        }
    )
    pairs = candidate_pairs_in_shard(g, cfg)
    # O(n*W): neighbor chaining with W=4 emits < 4n pairs, vs ~50M for n^2/2
    assert len(pairs) < n * 5
    assert len(pairs) <= cfg.max_pairs_per_shard

    from dedupe_rust_ray.state.unionfind import driver_connected_components

    lab = driver_connected_components(pairs)
    assert len(lab) == n
    assert lab["cluster_id"].nunique() == 1

    # with a tight per-shard pair cap the output is bounded by the cap
    tight = ERConfig(max_pairs_per_shard=1000)
    capped = candidate_pairs_in_shard(g, tight)
    assert len(capped) <= 1000


def test_local_candidate_pairs_matches_per_group_reference():
    """Differential pin: the vectorized kernel must reproduce the
    per-group reference loop BIT-FOR-BIT (same pairs, same order),
    including neighbor chaining and the max_pairs group-cut + trim."""
    import numpy as np

    from dedupe_rust_ray.functions.grouping import local_candidate_pairs

    def reference(keys, *, max_group=None, neighbor_w=4, max_pairs=None):
        n = len(keys)
        if n < 2:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        order = np.argsort(keys, kind="stable")
        sk = keys[order]
        bounds = np.flatnonzero(np.r_[True, sk[1:] != sk[:-1], True])
        ia_parts, ib_parts, total = [], [], 0
        for s, e in zip(bounds[:-1], bounds[1:]):
            g = e - s
            if g < 2:
                continue
            idx = np.sort(order[s:e])
            if max_group is not None and g > max_group:
                for w in range(1, min(neighbor_w, g - 1) + 1):
                    ia_parts.append(idx[:-w])
                    ib_parts.append(idx[w:])
                    total += g - w
            else:
                i, j = np.triu_indices(g, 1)
                ia_parts.append(idx[i])
                ib_parts.append(idx[j])
                total += g * (g - 1) // 2
            if max_pairs is not None and total >= max_pairs:
                break
        if not ia_parts:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        ia = np.concatenate(ia_parts)
        ib = np.concatenate(ib_parts)
        if max_pairs is not None and len(ia) > max_pairs:
            ia, ib = ia[:max_pairs], ib[:max_pairs]
        return ia, ib

    rng = np.random.default_rng(42)
    for trial in range(120):
        n = int(rng.integers(0, 300))
        keys = rng.integers(0, int(rng.integers(1, 40)), n).astype(np.uint64)
        mg = [None, 3, 8][trial % 3]
        mp = [None, 1, 7, 1000][trial % 4]
        nw = int(rng.integers(1, 6))
        a1, b1 = reference(keys, max_group=mg, neighbor_w=nw, max_pairs=mp)
        a2, b2 = local_candidate_pairs(
            keys, max_group=mg, neighbor_w=nw, max_pairs=mp
        )
        assert np.array_equal(a1, a2) and np.array_equal(b1, b2), (
            trial, n, mg, mp, nw,
        )


def test_count_blocking_keys_matches_emit():
    cfg = ERConfig()
    prof = _profiles(80)
    from dedupe_rust_ray.stages.blocking import count_blocking_keys

    assert count_blocking_keys(prof, cfg) == emit_blocking_keys(prof, cfg).num_rows
    empty = prof.slice(0, 0)
    assert count_blocking_keys(empty, cfg) == 0 == emit_blocking_keys(empty, cfg).num_rows


def test_pair_cap_is_per_shard_not_global():
    # two shards, each demanding > cap pairs: a per-shard cap keeps ~cap
    # pairs in EACH shard; the (buggy, pre-fix) single global call over the
    # concatenated relation truncates the union at one cap's worth
    cfg = ERConfig(max_pairs_per_shard=40, max_block_size=512)
    rng = np.random.default_rng(3)
    rows = []
    for shard in (0, 1):
        for blk in range(8):  # 8 blocks of 6 rows -> 15 pairs each = 120 > 40
            key = np.uint64((shard + 1) * 1000 + blk)
            for r in range(6):
                rows.append((shard, key, len(rows) + 1))
    gdf = pd.DataFrame(rows, columns=["shard", "block_key", "idh"])
    gdf["idh"] = gdf["idh"].astype(np.uint64)
    gdf["content_hash"] = np.arange(len(gdf), dtype=np.uint64)  # all distinct
    per_shard = pd.concat(
        [candidate_pairs_in_shard(g, cfg) for _, g in gdf.groupby("shard", sort=True)],
        ignore_index=True,
    ).drop_duplicates(["doc_a", "doc_b"])
    global_once = candidate_pairs_in_shard(gdf, cfg)
    assert len(per_shard) == 2 * cfg.max_pairs_per_shard
    assert len(global_once) == cfg.max_pairs_per_shard  # why the fix matters


def test_dedup_pairs_arrow_matches_pandas():
    """The Arrow-native dedup_pairs (lexsort run-head take) must produce
    the identical pair set as a global pandas drop_duplicates, for int64,
    uint64 (the ER idh tail) and string ids, with extra columns riding."""
    import ray.data

    from dedupe_rust_ray.stages.pairs import dedup_pairs

    rng = np.random.default_rng(42)
    n = 5000
    a = rng.integers(0, 300, n)
    b = rng.integers(0, 300, n)

    for dt in (np.int64, np.uint64):
        df = pd.DataFrame(
            {
                "doc_a": a.astype(dt),
                "doc_b": b.astype(dt),
                # extra column that is a pure function of the pair
                "hamming": ((a * 7 + b) % 5).astype(np.int64),
            }
        )
        ds = ray.data.from_pandas(df).repartition(8)
        out = dedup_pairs(ds, n_shards=16).to_pandas()
        want = df.drop_duplicates(["doc_a", "doc_b"])
        assert len(out) == len(want)
        key = lambda d: sorted(map(tuple, d.to_numpy().tolist()))
        assert key(out) == key(want), dt
        assert out["doc_a"].dtype == dt and out["doc_b"].dtype == dt

    # string ids (direct/test path)
    sdf = pd.DataFrame(
        {
            "doc_a": [f"d{x}" for x in a[:500] % 40],
            "doc_b": [f"d{x}" for x in b[:500] % 40],
        }
    )
    ds = ray.data.from_pandas(sdf).repartition(4)
    out = dedup_pairs(ds, n_shards=8).to_pandas()
    want = sdf.drop_duplicates(["doc_a", "doc_b"])
    assert sorted(map(tuple, out.to_numpy().tolist())) == sorted(
        map(tuple, want.to_numpy().tolist())
    )
