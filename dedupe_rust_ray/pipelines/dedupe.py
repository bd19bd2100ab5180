"""Dedup family over the driver's flat ``documents`` table.

Each variant is a first-class training-data-pipeline operator:

- :func:`ngram_jaccard_dedup` — MinHash-LSH candidate generation +
  EXACT word-trigram Jaccard verification (SQL-checkable oracle);
- :func:`minhash_lsh_dedup`  — pure sketch path (estimated Jaccard);
- :func:`simhash_near_dups`  — 64-bit SimHash bit-band blocking + Hamming;
- :func:`embedding_cosine_pairs` — exact cosine near-dup over embeddings.

Shared shape (the reference's candidate->confirm structure,
/root/reference/src/main.rs:452-648): a vectorized signature pass, a
groupby-shuffle on compact band rows, within-group pair enumeration, then a
verification pass over candidates only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..functions.grouping import local_candidate_pairs, shard_of
from ..functions.minhash import estimate_jaccard, lsh_band_hashes, minhash_signatures
from ..functions.simhash import hamming64, simhash_signatures
from .common import read

_NUM_PERM = 128
_BANDS = 32  # r=4 rows/band -> s-curve midpoint ~0.42, high recall at J>=0.5
_N_SHARDS = 64


def _word_trigrams(text: str) -> set[str]:
    w = text.split()
    return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}


def _sig_profiles(ds) -> "ray.data.Dataset":
    """(doc_id, sig) — MinHash signatures computed ONCE per doc."""

    def per_batch(batch: pa.Table) -> pa.Table:
        sig = minhash_signatures(
            batch["text"].to_pylist(), num_perm=_NUM_PERM, shingle_k=3, mode="word"
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "sig": pa.array(
                    [r.tobytes() for r in sig.astype("<u8")], type=pa.binary()
                ),
            }
        )

    return ds.map_batches(per_batch, batch_format="pyarrow")


def _band_rows(profiles) -> "ray.data.Dataset":
    """MINIMAL shuffle rows (shard, band_key, doc_id) — ~30 B/key. The
    1 KB signature does NOT ride the shuffle; verification reads it from a
    broadcast matrix instead (at 10^12 docs: a hash join on doc_id)."""

    def per_batch(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        sig = np.frombuffer(b"".join(batch["sig"].to_pylist()), dtype="<u8").reshape(
            len(ids), _NUM_PERM
        )
        bh = lsh_band_hashes(sig, _BANDS)
        n = len(ids)
        keys = np.array(
            [f"{j}:{bh[i, j]:016x}" for j in range(_BANDS) for i in range(n)],
            dtype=object,
        )
        return pa.table(
            {
                "shard": pa.array(shard_of(keys, _N_SHARDS), type=pa.int32()),
                "band_key": pa.array(keys, type=pa.string()),
                "doc_id": pa.array(np.tile(ids, _BANDS), type=pa.int64()),
            }
        )

    return profiles.map_batches(per_batch, batch_format="pyarrow")


def _pairs_in_shard(group: pd.DataFrame) -> pd.DataFrame:
    """Candidate (doc_a, doc_b) pairs of one shard, enumerated vectorized."""
    keys = group["band_key"].to_numpy()
    ia, ib = local_candidate_pairs(keys)
    if not len(ia):
        return pd.DataFrame(
            {"doc_a": pd.Series(dtype="int64"), "doc_b": pd.Series(dtype="int64")}
        )
    ids = group["doc_id"].to_numpy()
    a, b = ids[ia], ids[ib]
    swap = a > b
    out = pd.DataFrame(
        {"doc_a": np.where(swap, b, a), "doc_b": np.where(swap, a, b)}
    )
    out = out[out.doc_a != out.doc_b]
    return out.drop_duplicates(["doc_a", "doc_b"])


class _VerifyEstJaccard:
    """Scores candidate pairs against the broadcast signature matrix."""

    def __init__(self, ref, jaccard_min):
        ids, blob = ray.get(ref)
        self.sig = np.frombuffer(blob, dtype="<u8").reshape(len(ids), _NUM_PERM)
        self.row = {int(v): i for i, v in enumerate(ids)}
        self.jaccard_min = jaccard_min

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame(
                {
                    "doc_a": pd.Series(dtype="int64"),
                    "doc_b": pd.Series(dtype="int64"),
                    "est_jaccard": pd.Series(dtype="float64"),
                }
            )
        ra = np.fromiter((self.row[int(x)] for x in batch["doc_a"]), np.int64)
        rb = np.fromiter((self.row[int(x)] for x in batch["doc_b"]), np.int64)
        est = estimate_jaccard(self.sig[ra], self.sig[rb])
        out = batch[["doc_a", "doc_b"]].copy()
        out["est_jaccard"] = np.round(est, 4)
        return out[est >= self.jaccard_min]


def _lsh_candidates(sf_dir: str):
    """Shared LSH front half: (profiles, deduped candidate pairs ds)."""
    ds = read(sf_dir, "documents", columns=["doc_id", "text"])
    profiles = _sig_profiles(ds).materialize()
    cand = (
        _band_rows(profiles)
        .groupby("shard")
        .map_groups(_pairs_in_shard, batch_format="pandas")
    )
    return profiles, _dedup_pairs_ds(cand)


def _broadcast_sigs(profiles):
    df = profiles.to_pandas()
    ids = df["doc_id"].to_numpy()
    blob = b"".join(df["sig"])
    return ray.put((ids, blob))


def _dedup_pairs_ds(pairs, n_shards: int = _N_SHARDS):
    from ..stages.pairs import dedup_pairs

    return dedup_pairs(pairs, n_shards)


def minhash_lsh_dedup(sf_dir: str, jaccard_min: float = 0.7) -> ray.data.Dataset:
    """Near-dup pairs by MinHash-estimated Jaccard >= ``jaccard_min``."""
    profiles, pairs = _lsh_candidates(sf_dir)
    ref = _broadcast_sigs(profiles)
    return pairs.map_batches(
        _VerifyEstJaccard,
        fn_constructor_args=(ref, jaccard_min),
        batch_format="pandas",
        concurrency=(1, 4),
    ).sort(["doc_a", "doc_b"])


def ngram_jaccard_dedup(sf_dir: str, jaccard_min: float = 0.5) -> pd.DataFrame:
    """Pairs with EXACT word-trigram Jaccard >= threshold.

    Candidates come from MinHash LSH (recall at J=0.5 is 1-(1-0.5^4)^32
    ~= 0.87 and ~1.0 for J>=0.7); verification recomputes exact Jaccard
    from the two texts, fetched via broadcast lookup (small side; a hash
    join at scale). Column semantics match the DuckDB oracle exactly.
    """
    _, pairs = _lsh_candidates(sf_dir)

    ds = read(sf_dir, "documents", columns=["doc_id", "text"])
    texts = ds.to_pandas().set_index("doc_id")["text"]
    ref = ray.put(texts)

    class VerifyExact:
        def __init__(self, ref, thresh):
            self.texts = ray.get(ref)
            self.thresh = thresh
            self.cache: dict[int, set] = {}

        def _grams(self, d):
            g = self.cache.get(d)
            if g is None:
                g = _word_trigrams(self.texts.loc[d])
                self.cache[d] = g
            return g

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            if not len(batch):
                return pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard": []})
            out_j = []
            for a, b in zip(batch["doc_a"], batch["doc_b"]):
                ga, gb = self._grams(int(a)), self._grams(int(b))
                if not ga and not gb:
                    out_j.append(0.0)
                else:
                    out_j.append(len(ga & gb) / len(ga | gb))
            batch = batch[["doc_a", "doc_b"]].copy()
            batch["jaccard"] = np.round(out_j, 4)
            return batch[np.array(out_j) >= self.thresh]

    out = pairs.map_batches(
        VerifyExact,
        fn_constructor_args=(ref, jaccard_min),
        batch_format="pandas",
        concurrency=(1, 4),
    ).to_pandas()
    return out.sort_values(["doc_a", "doc_b"], ignore_index=True).astype(
        {"doc_a": "int64", "doc_b": "int64"}
    )


def simhash_near_dups(sf_dir: str, max_hamming: int = 8) -> ray.data.Dataset:
    """Near-dup pairs by SimHash Hamming distance <= ``max_hamming``,
    blocked on the 4 16-bit chunks of the 64-bit simhash (pigeonhole:
    hd <= 3 is guaranteed to share a chunk; higher hd probabilistic)."""

    def band_rows(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        sh = simhash_signatures(batch["text"].to_pylist(), shingle_k=3, mode="word")
        out_key, out_id, out_sh = [], [], []
        for j in range(4):
            chunk = (sh >> np.uint64(16 * j)) & np.uint64(0xFFFF)
            out_key.extend(f"{j}:{int(c):04x}" for c in chunk)
            out_id.extend(int(i) for i in ids)
            out_sh.extend(int(s) for s in sh)
        keys = np.array(out_key, dtype=object)
        return pa.table(
            {
                "shard": pa.array(shard_of(keys, _N_SHARDS), type=pa.int32()),
                "band_key": pa.array(keys, type=pa.string()),
                "doc_id": pa.array(out_id, type=pa.int64()),
                "simhash": pa.array(out_sh, type=pa.uint64()),
            }
        )

    def pairs_in_shard(group: pd.DataFrame) -> pd.DataFrame:
        keys = group["band_key"].to_numpy()
        ia, ib = local_candidate_pairs(keys)
        if not len(ia):
            return pd.DataFrame({"doc_a": [], "doc_b": [], "hamming": []})
        ids = group["doc_id"].to_numpy()
        sh = group["simhash"].to_numpy().astype(np.uint64)
        a, b = ids[ia], ids[ib]
        swap = a > b
        a2, b2 = np.where(swap, b, a), np.where(swap, a, b)
        hd = hamming64(sh[ia], sh[ib])
        keep = (a2 != b2) & (hd <= max_hamming)
        out = pd.DataFrame(
            {"doc_a": a2[keep], "doc_b": b2[keep], "hamming": hd[keep]}
        )
        return out.drop_duplicates(["doc_a", "doc_b"])

    ds = read(sf_dir, "documents", columns=["doc_id", "text"])
    cand = (
        ds.map_batches(band_rows, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(pairs_in_shard, batch_format="pandas")
    )
    return _dedup_pairs_ds(cand).sort(["doc_a", "doc_b"])


def embedding_cosine_pairs(
    sf_dir: str, cos_min: float = 0.3
) -> pd.DataFrame:
    """All embedding pairs with cosine similarity >= ``cos_min``.

    Distributed shape: the (normalized) full matrix is broadcast once
    (``ray.put``), each batch computes its block of the similarity matrix
    with one float64 matmul and keeps pairs (vec_a < vec_b). At scales
    where the matrix cannot be broadcast, swap the broadcast side for LSH
    buckets (see similarity.knn_lsh)."""
    ds = read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    full = ds.to_pandas()
    ids = full["vec_id"].to_numpy()
    E = np.stack([np.asarray(e, dtype=np.float64) for e in full["embedding"]])
    E /= np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids, E))

    class BlockSims:
        def __init__(self, ref, cos_min):
            self.ids, self.E = ray.get(ref)
            self.cos_min = cos_min
            self.order = {int(v): i for i, v in enumerate(self.ids)}

        def __call__(self, batch: pa.Table) -> pa.Table:
            bid = batch["vec_id"].to_numpy()
            V = np.stack(
                [np.asarray(e, dtype=np.float64) for e in batch["embedding"].to_pylist()]
            )
            V /= np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
            S = V @ self.E.T
            rows, cols = np.nonzero(S >= self.cos_min)
            a = bid[rows]
            b = self.ids[cols]
            keep = a < b
            return pa.table(
                {
                    "vec_a": pa.array(a[keep], type=pa.int64()),
                    "vec_b": pa.array(b[keep], type=pa.int64()),
                    "cos_sim": pa.array(np.round(S[rows, cols][keep], 4)),
                }
            )

    out = ds.map_batches(
        BlockSims,
        fn_constructor_args=(ref, cos_min),
        batch_format="pyarrow",
        concurrency=(1, 8),
    ).to_pandas()
    return out.sort_values(["vec_a", "vec_b"], ignore_index=True)
