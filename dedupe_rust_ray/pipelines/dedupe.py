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

Verification has two physical plans, chosen by corpus size (mirroring
pipelines/er.py): below ``_BROADCAST_MAX_DOCS`` the small side (signatures
/ candidate texts) is shipped once via ``ray.put``; above it, the side data
is hash-joined onto the deduplicated pair set (``attach_to_pairs``) — no
driver-side materialization of the corpus at any size. ``scale_path``
forces one plan for testing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..functions.grouping import local_candidate_pairs
from ..functions.minhash import estimate_jaccard, lsh_band_hashes, minhash_signatures
from ..functions.simhash import hamming64, simhash_signatures
from ..stages.blocking import shard_of_u64
from ..stages.codec import decode_sig_matrix, encode_fixed_u64_rows
from ..stages.pairs import attach_to_pairs, dedup_pairs
from .common import canonical_sort, read

_NUM_PERM = 128
_BANDS = 32  # r=4 rows/band: recall ~1-1.6e-4 at J=0.7, ~1-2e-15 at J=0.9
_N_SHARDS = 64
# above this corpus size, verification hash-joins side data onto pairs
# instead of broadcasting it (the er.py pattern; at 10^12 docs a broadcast
# can never fit)
_BROADCAST_MAX_DOCS = 1_000_000
# below this, skip the candidate semi-join reduction (its two extra passes
# cost more than just broadcasting every signature)
_CANDIDATE_REDUCE_MIN_DOCS = 100_000
# below this many BAND ROWS (20 B each — ≤10 MB), candidate enumeration
# gathers the band-row relation once and enumerates in-process, eliding
# BOTH exchanges (band-shard groupby + pair-dedup groupby) whose fixed
# barrier cost dominates small corpora; the distributed path is unchanged
# above the ceiling (the canonical_sort driver_max_rows pattern)
_FUSED_BAND_ROWS_MAX = 500_000


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
            {"doc_id": batch["doc_id"], "sig": encode_fixed_u64_rows(sig)}
        )

    return ds.map_batches(per_batch, batch_format="pyarrow")


def _band_rows(profiles) -> "ray.data.Dataset":
    """MINIMAL shuffle rows (shard, band_key, doc_id) — ~20 B/key. The
    1 KB signature does NOT ride the shuffle; verification reads it from a
    broadcast matrix (small corpora) or a hash join on doc_id (scale).
    Band keys are numeric uint64 (band hashes are already salted per band
    index) — no per-row string formatting on the shuffle hot path."""

    def per_batch(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        sig = decode_sig_matrix(batch["sig"], _NUM_PERM)
        bh = lsh_band_hashes(sig, _BANDS)
        keys = bh.T.reshape(-1)
        return pa.table(
            {
                "shard": pa.array(
                    shard_of_u64(keys, _N_SHARDS), type=pa.int32()
                ),
                "band_key": pa.array(keys, type=pa.uint64()),
                "doc_id": pa.concat_arrays(
                    [batch["doc_id"].combine_chunks()] * _BANDS
                ),
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
    """Scores candidate pairs against the broadcast signature matrix.
    Row lookup is a sorted-array searchsorted (no per-row Python dict
    probe on the verify hot path)."""

    def __init__(self, ref, jaccard_min):
        ids, blob = ray.get(ref)
        self.sig = np.frombuffer(blob, dtype="<u8").reshape(len(ids), _NUM_PERM)
        ids = np.asarray(ids, dtype=np.int64)
        self.order = np.argsort(ids)
        self.sorted_ids = ids[self.order]
        self.jaccard_min = jaccard_min

    def _rows(self, col: pd.Series) -> np.ndarray:
        v = col.to_numpy(dtype=np.int64)
        pos = np.minimum(
            np.searchsorted(self.sorted_ids, v), len(self.sorted_ids) - 1
        )
        # every candidate endpoint is in the pack by construction — but a
        # silent miss would score against a NEIGHBOR's signature row, so
        # fail loudly instead (a probe past the array end would otherwise
        # also IndexError)
        if not (self.sorted_ids[pos] == v).all():
            missing = v[self.sorted_ids[pos] != v]
            raise KeyError(
                f"candidate endpoint(s) missing from signature pack: "
                f"{missing[:5].tolist()}"
            )
        return self.order[pos]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame(
                {
                    "doc_a": pd.Series(dtype="int64"),
                    "doc_b": pd.Series(dtype="int64"),
                    "est_jaccard": pd.Series(dtype="float64"),
                }
            )
        est = estimate_jaccard(
            self.sig[self._rows(batch["doc_a"])],
            self.sig[self._rows(batch["doc_b"])],
        )
        out = batch[["doc_a", "doc_b"]].copy()
        out["est_jaccard"] = np.round(est, 4)
        return out[est >= self.jaccard_min]


_EMPTY_PAIRS = {
    "doc_a": pa.array([], type=pa.int64()),
    "doc_b": pa.array([], type=pa.int64()),
}


def _fused_minhash_pairs(profiles) -> "ray.data.Dataset":
    """Size-gated fused candidate path: gather the 20 B/row band-row
    relation (signature/band compute stays distributed in map_batches;
    only (band_key, doc_id) rows move) and enumerate + dedup pairs in ONE
    in-process pass. A band_key never spans shards in the distributed
    path, so global enumeration yields the identical pair set."""
    parts = [
        t for t in ray.get(_band_rows(profiles).to_arrow_refs()) if t.num_rows
    ]
    if not parts:
        return ray.data.from_arrow(pa.table(_EMPTY_PAIRS))
    t = pa.concat_tables(parts)
    keys = t["band_key"].to_numpy(zero_copy_only=False)
    ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    ia, ib = local_candidate_pairs(keys)
    if not len(ia):
        return ray.data.from_arrow(pa.table(_EMPTY_PAIRS))
    a, b = ids[ia], ids[ib]
    swap = a > b
    a, b = np.where(swap, b, a), np.where(swap, a, b)
    m = a != b
    uniq = np.unique(np.stack([a[m], b[m]], axis=1), axis=0)
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_a": pa.array(uniq[:, 0], type=pa.int64()),
                "doc_b": pa.array(uniq[:, 1], type=pa.int64()),
            }
        )
    )


def _lsh_candidates(sf_dir: str, docs: "ray.data.Dataset | None" = None):
    """Shared LSH front half: (profiles, deduped candidate pairs ds)."""
    ds = docs if docs is not None else read(
        sf_dir, "documents", columns=["doc_id", "text"]
    )
    profiles = _sig_profiles(ds).materialize()
    if profiles.count() * _BANDS <= _FUSED_BAND_ROWS_MAX:
        return profiles, _fused_minhash_pairs(profiles)
    cand = (
        _band_rows(profiles)
        .groupby("shard")
        .map_groups(_pairs_in_shard, batch_format="pandas")
    )
    return profiles, _dedup_pairs_ds(cand)


def _candidate_ids(pairs) -> np.ndarray:
    """Distinct endpoint ids of a (doc_a, doc_b) pairs dataset, sorted."""

    def batch_ids(b: pa.Table) -> pa.Table:
        ids = (
            np.unique(
                np.concatenate([b["doc_a"].to_numpy(), b["doc_b"].to_numpy()])
            )
            if b.num_rows
            else np.empty(0, np.int64)
        )
        return pa.table({"doc_id": pa.array(ids, type=pa.int64())})

    parts = ray.get(
        pairs.map_batches(batch_ids, batch_format="pyarrow").to_arrow_refs()
    )

    def part_ids(t):
        names = getattr(t, "column_names", None) or list(getattr(t, "columns", []))
        if "doc_id" not in names or not len(t):
            return np.empty(0, np.int64)
        return t["doc_id"].to_numpy()

    return (
        np.unique(np.concatenate([part_ids(t) for t in parts]))
        if parts
        else np.empty(0, np.int64)
    )


def _broadcast_sigs(profiles, cand_ids: np.ndarray | None = None):
    """Pack (ids, sig blob) for broadcast — reduced to the candidate
    endpoints when given (semi-join reduction: verification only ever
    looks up docs that appear in candidate pairs)."""
    from ..stages.codec import binary_col_blob

    if cand_ids is not None:
        cref = ray.put(cand_ids)

        def keep(b: pa.Table) -> pa.Table:
            cand = ray.get(cref)
            ids = b["doc_id"].to_numpy()
            pos = np.searchsorted(cand, ids)
            pos = np.minimum(pos, max(len(cand) - 1, 0))
            m = cand[pos] == ids if len(cand) else np.zeros(len(ids), bool)
            return b.filter(pa.array(m))

        profiles = profiles.map_batches(keep, batch_format="pyarrow")
    t = pa.concat_tables(
        ray.get(profiles.to_arrow_refs()), promote_options="default"
    )
    ids = t["doc_id"].to_numpy()
    blob, _ = binary_col_blob(t["sig"])
    return ray.put((ids, blob))


def _dedup_pairs_ds(pairs, n_shards: int = _N_SHARDS):
    return dedup_pairs(pairs, n_shards)


def _use_join_path(scale_path: str, n_docs: int) -> bool:
    if scale_path == "join":
        return True
    if scale_path == "broadcast":
        return False
    return n_docs > _BROADCAST_MAX_DOCS


def minhash_lsh_dedup(
    sf_dir: str,
    jaccard_min: float = 0.7,
    scale_path: str = "auto",
    docs: "ray.data.Dataset | None" = None,
) -> ray.data.Dataset:
    """Near-dup pairs by MinHash-estimated Jaccard >= ``jaccard_min``."""
    profiles, pairs = _lsh_candidates(sf_dir, docs)
    if _use_join_path(scale_path, profiles.count()):
        joined = attach_to_pairs(pairs, profiles, ["sig"], num_partitions=16)

        def verify(batch: pa.Table) -> pa.Table:
            sig_a = decode_sig_matrix(batch["sig_a"], _NUM_PERM)
            sig_b = decode_sig_matrix(batch["sig_b"], _NUM_PERM)
            est = estimate_jaccard(sig_a, sig_b)
            keep = est >= jaccard_min
            return pa.table(
                {
                    "doc_a": batch["doc_a"].filter(pa.array(keep)),
                    "doc_b": batch["doc_b"].filter(pa.array(keep)),
                    "est_jaccard": pa.array(np.round(est[keep], 4)),
                }
            )

        out = joined.map_batches(verify, batch_format="pyarrow")
    else:
        # candidate semi-join reduction only pays once the corpus is big:
        # gathering candidate ids costs two extra (cheap) passes, so small
        # corpora just broadcast everything
        n_docs = profiles.count()
        if n_docs > _CANDIDATE_REDUCE_MIN_DOCS:
            pairs = pairs.materialize()
            ref = _broadcast_sigs(profiles, _candidate_ids(pairs))
        else:
            ref = _broadcast_sigs(profiles)
        if n_docs * _BANDS <= _FUSED_BAND_ROWS_MAX:
            # tiny pair set (fused candidate path): a plain task avoids
            # the actor pool's startup cost; the per-batch ray.get is one
            # fetch of the already-broadcast signature pack
            out = pairs.map_batches(
                lambda b: _VerifyEstJaccard(ref, jaccard_min)(b),
                batch_format="pandas",
            )
        else:
            out = pairs.map_batches(
                _VerifyEstJaccard,
                fn_constructor_args=(ref, jaccard_min),
                batch_format="pandas",
                concurrency=(1, 4),
            )
    return canonical_sort(out, ["doc_a", "doc_b"])


def _verify_trigram_rows(
    texts_a: list[str], texts_b: list[str]
) -> np.ndarray:
    """Exact word-trigram Jaccard per aligned pair (memoized per text)."""
    cache: dict[str, set] = {}

    def grams(t: str) -> set:
        g = cache.get(t)
        if g is None:
            g = cache.setdefault(t, _word_trigrams(t))
        return g

    out = np.empty(len(texts_a))
    for i, (ta, tb) in enumerate(zip(texts_a, texts_b)):
        ga, gb = grams(ta), grams(tb)
        union = len(ga | gb)
        out[i] = (len(ga & gb) / union) if union else 0.0
    return out


def ngram_jaccard_dedup(
    sf_dir: str, jaccard_min: float = 0.7, scale_path: str = "auto"
) -> pd.DataFrame:
    """Pairs with EXACT word-trigram Jaccard >= threshold.

    Candidates come from MinHash LSH; verification recomputes exact
    Jaccard from the two texts. Column semantics match the DuckDB oracle
    exactly, but candidate recall is probabilistic: with 32 bands of 4
    rows, a pair at exactly J=0.7 is nominated w.p. ~1-1.6e-4 (and
    ~1-2e-15 at J=0.9) — the default threshold sits in this high-recall
    region on purpose; at J=0.5 recall would drop to ~0.87.

    Texts are never materialized corpus-wide on the driver: the broadcast
    plan ships only the texts of docs that appear in candidate pairs; the
    join plan attaches texts to pairs with a hash join.
    """
    _, pairs = _lsh_candidates(sf_dir)
    docs = read(sf_dir, "documents", columns=["doc_id", "text"])

    if _use_join_path(scale_path, docs.count()):
        joined = attach_to_pairs(pairs, docs, ["text"], num_partitions=16)

        def verify(batch: pd.DataFrame) -> pd.DataFrame:
            if not len(batch):
                return pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard": []})
            j = _verify_trigram_rows(
                batch["text_a"].tolist(), batch["text_b"].tolist()
            )
            out = batch[["doc_a", "doc_b"]].copy()
            out["jaccard"] = np.round(j, 4)
            return out[j >= jaccard_min]

        out = joined.map_batches(verify, batch_format="pandas").to_pandas()
    else:
        pairs = pairs.materialize()
        cand_ids = _candidate_ids(pairs)  # distributed gather, ids only
        idset_ref = ray.put(cand_ids)

        def keep_candidates(batch: pd.DataFrame) -> pd.DataFrame:
            return batch[batch["doc_id"].isin(ray.get(idset_ref))]

        # distributed scan -> only candidate texts reach the driver
        cand_texts = docs.map_batches(
            keep_candidates, batch_format="pandas"
        ).to_pandas()
        texts = dict(zip(cand_texts["doc_id"], cand_texts["text"]))
        ref = ray.put(texts)

        class VerifyExact:
            def __init__(self, ref, thresh):
                self.texts = ray.get(ref)
                self.thresh = thresh

            def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
                if not len(batch):
                    return pd.DataFrame(
                        {"doc_a": [], "doc_b": [], "jaccard": []}
                    )
                j = _verify_trigram_rows(
                    [self.texts[int(a)] for a in batch["doc_a"]],
                    [self.texts[int(b)] for b in batch["doc_b"]],
                )
                out = batch[["doc_a", "doc_b"]].copy()
                out["jaccard"] = np.round(j, 4)
                return out[j >= self.thresh]

        if docs.count() * _BANDS <= _FUSED_BAND_ROWS_MAX:
            # fused candidate path: plain task, no actor-pool startup
            out = pairs.map_batches(
                lambda b: VerifyExact(ref, jaccard_min)(b),
                batch_format="pandas",
            ).to_pandas()
        else:
            out = pairs.map_batches(
                VerifyExact,
                fn_constructor_args=(ref, jaccard_min),
                batch_format="pandas",
                concurrency=(1, 4),
            ).to_pandas()
    return out.sort_values(["doc_a", "doc_b"], ignore_index=True).astype(
        {"doc_a": "int64", "doc_b": "int64"}
    )


def simhash_near_dups(
    sf_dir: str,
    max_hamming: int = 8,
    docs: "ray.data.Dataset | None" = None,
) -> ray.data.Dataset:
    """Near-dup pairs by SimHash Hamming distance <= ``max_hamming``,
    blocked on the 4 16-bit chunks of the 64-bit simhash (pigeonhole:
    hd <= 3 is guaranteed to share a chunk; higher hd probabilistic)."""

    def band_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        sh = simhash_signatures(batch["text"].to_pylist(), shingle_k=3, mode="word")
        key_parts = []
        for j in range(4):
            chunk = (sh >> np.uint64(16 * j)) & np.uint64(0xFFFF)
            key_parts.append((np.uint64(j) << np.uint64(16)) | chunk)
        keys = np.concatenate(key_parts)
        ids4 = pa.concat_arrays([batch["doc_id"].combine_chunks()] * 4)
        return pa.table(
            {
                "shard": pa.array(
                    shard_of_u64(keys, _N_SHARDS), type=pa.int32()
                ),
                "band_key": pa.array(keys, type=pa.uint64()),
                "doc_id": ids4,
                "simhash": pa.array(np.tile(sh, 4), type=pa.uint64()),
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

    ds = docs if docs is not None else read(
        sf_dir, "documents", columns=["doc_id", "text"]
    )
    banded = ds.map_batches(band_rows, batch_format="pyarrow")
    if ds.count() * 4 <= _FUSED_BAND_ROWS_MAX:
        # fused path (see _fused_minhash_pairs): simhash compute stays
        # distributed; only 28 B/row (band_key, doc_id, simhash) gathers
        parts = [t for t in ray.get(banded.to_arrow_refs()) if t.num_rows]
        empty = pa.table(dict(_EMPTY_PAIRS, hamming=pa.array([], pa.int64())))
        if not parts:
            return ray.data.from_arrow(empty)
        t = pa.concat_tables(parts)
        keys = t["band_key"].to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sh = t["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ia, ib = local_candidate_pairs(keys)
        if not len(ia):
            return ray.data.from_arrow(empty)
        a, b = ids[ia], ids[ib]
        swap = a > b
        a2, b2 = np.where(swap, b, a), np.where(swap, a, b)
        hd = hamming64(sh[ia], sh[ib])
        keep = (a2 != b2) & (hd <= max_hamming)
        # hd is a pure function of the pair, so 3-column unique == 2-column
        uniq = np.unique(
            np.stack([a2[keep], b2[keep], hd[keep].astype(np.int64)], axis=1),
            axis=0,
        )
        return canonical_sort(
            ray.data.from_arrow(
                pa.table(
                    {
                        "doc_a": pa.array(uniq[:, 0], type=pa.int64()),
                        "doc_b": pa.array(uniq[:, 1], type=pa.int64()),
                        "hamming": pa.array(uniq[:, 2], type=pa.int64()),
                    }
                )
            ),
            ["doc_a", "doc_b"],
        )
    cand = banded.groupby("shard").map_groups(
        pairs_in_shard, batch_format="pandas"
    )
    return canonical_sort(_dedup_pairs_ds(cand), ["doc_a", "doc_b"])


PLANTED_DOC_OFFSET = 1_000_000_000


def planted_flat_docs(
    sf_dir: str, dup_every: int = 10, offset: int = PLANTED_DOC_OFFSET
) -> "ray.data.Dataset":
    """Flat (doc_id, text) corpus whose expected near-dup PAIR SET is
    closed-form in doc_id arithmetic — the ``corpus_planted_truth`` trick
    (sources/corpus.py) applied to the sketch-dedup family.

    Construction guarantees, by design rather than by tuning:

    - every token is salted with its doc_id (plus 3 salted pad tokens so
      even empty driver texts yield >=1 word-trigram shingle), so two
      DIFFERENT base docs share ZERO shingles -> no band of 4 minhashes
      can collide and no 16-bit simhash chunk block survives
      verification (checked empirically per sf; deterministic);
    - every ``dup_every``-th doc gets a BYTE-IDENTICAL companion at
      ``doc_id + offset`` -> identical minhash signature (candidate in
      every band, est_jaccard exactly 1.0) and identical simhash
      (hamming exactly 0).

    Expected pairs are therefore exactly
    ``(doc_id, doc_id + offset)`` for ``doc_id % dup_every == 0`` —
    SQL-derivable from the flat documents table."""

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        texts = batch["text"].to_pylist()
        out_ids: list[int] = []
        out_texts: list[str] = []
        for i in range(len(ids)):
            did = int(ids[i])
            toks = [f"{w}x{did}" for w in (texts[i] or "").split()]
            toks += [f"p0x{did}", f"p1x{did}", f"p2x{did}"]
            t = " ".join(toks)
            out_ids.append(did)
            out_texts.append(t)
            if did % dup_every == 0:
                out_ids.append(did + offset)
                out_texts.append(t)
        return pa.table(
            {
                "doc_id": pa.array(out_ids, type=pa.int64()),
                "text": pa.array(out_texts, type=pa.string()),
            }
        )

    return read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        explode, batch_format="pyarrow"
    )


def minhash_lsh_dedup_planted(
    sf_dir: str, jaccard_min: float = 0.7, dup_every: int = 10
) -> ray.data.Dataset:
    """:func:`minhash_lsh_dedup` over the planted-truth corpus — the SAME
    sketch pipeline end-to-end (signatures, banding, shard groupby or
    fused gate, verification), but with a closed-form value oracle."""
    return minhash_lsh_dedup(
        sf_dir, jaccard_min, docs=planted_flat_docs(sf_dir, dup_every)
    )


def simhash_near_dups_planted(
    sf_dir: str, max_hamming: int = 8, dup_every: int = 10
) -> ray.data.Dataset:
    """:func:`simhash_near_dups` over the planted-truth corpus — same
    chunk-blocked pipeline, closed-form value oracle."""
    return simhash_near_dups(
        sf_dir, max_hamming, docs=planted_flat_docs(sf_dir, dup_every)
    )


def embedding_cosine_pairs(
    sf_dir: str, cos_min: float = 0.3
) -> pd.DataFrame:
    """All embedding pairs with cosine similarity >= ``cos_min``.

    Distributed shape: the (normalized) full matrix is broadcast once
    (``ray.put``), each batch computes its block of the similarity matrix
    with one float64 matmul and keeps pairs (vec_a < vec_b). At scales
    where the matrix cannot be broadcast, swap the broadcast side for LSH
    buckets (see similarity.knn_lsh)."""
    from ..stages.codec import list_col_matrix

    ds = read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    full = pa.concat_tables(
        ray.get(ds.to_arrow_refs()), promote_options="default"
    )
    ids = full["vec_id"].to_numpy()
    E = list_col_matrix(full["embedding"])
    E /= np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids, E))

    class BlockSims:
        def __init__(self, ref, cos_min):
            self.ids, self.E = ray.get(ref)
            self.cos_min = cos_min
            self.order = {int(v): i for i, v in enumerate(self.ids)}

        def __call__(self, batch: pa.Table) -> pa.Table:
            from ..stages.codec import list_col_matrix

            bid = batch["vec_id"].to_numpy()
            V = list_col_matrix(batch["embedding"])
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

    # plain tasks, not an actor pool: the only state is the broadcast
    # (ids, matrix) pack, which ray.get resolves zero-copy from the
    # local object store per batch — no per-actor derived state to
    # amortize, and no actor-pool startup on the critical path
    out = ds.map_batches(
        lambda b: BlockSims(ref, cos_min)(b),
        batch_format="pyarrow",
    ).to_pandas()
    return out.sort_values(["vec_a", "vec_b"], ignore_index=True)


def fuzzy_name_pairs(
    sf_dir: str, threshold: float = 0.98
) -> ray.data.Dataset:
    """Blocked fuzzy self-join: customer-name pairs with Jaro-Winkler
    similarity >= ``threshold`` — the record-linkage join surfaced as a
    standalone query, with a DuckDB value oracle (DuckDB ships
    ``jaro_winkler_similarity``; the engine scores with
    ``boost_threshold=0.7`` for convention-exact parity).

    Plan: the reference's blocking discipline (src/main.rs:365-435) —
    pairs are only scored INSIDE a block (names sharing all but their
    last two characters), so a block of k names costs k^2/2 scores and
    the all-pairs quadratic never materializes; one groupby on the block
    key is the only shuffle."""
    from ..functions.strsim import jaro_winkler

    def add_block(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_custkey": batch["c_custkey"].to_numpy(np.int64),
                "c_name": batch["c_name"],
                "block": batch["c_name"].str.slice(0, -2),
            }
        )

    def score_block(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("c_custkey", ignore_index=True)
        keys = g["c_custkey"].to_numpy(np.int64)
        names = g["c_name"].tolist()
        rows_a, rows_b, sims = [], [], []
        for i in range(len(names)):
            for j in range(i + 1, len(names)):
                s = jaro_winkler(names[i], names[j], boost_threshold=0.7)
                if s >= threshold:
                    rows_a.append(keys[i])
                    rows_b.append(keys[j])
                    sims.append(np.floor(s * 1e4 + 0.5) / 1e4)
        return pd.DataFrame(
            {
                "key_a": np.asarray(rows_a, dtype=np.int64),
                "key_b": np.asarray(rows_b, dtype=np.int64),
                "sim": np.asarray(sims, dtype=np.float64),
            }
        )

    out = (
        read(sf_dir, "customer", columns=["c_custkey", "c_name"])
        .map_batches(add_block, batch_format="pandas")
        .groupby("block")
        .map_groups(
            lambda g: score_block(g.drop(columns=["block"])),
            batch_format="pandas",
        )
    )
    from .common import canonical_sort

    return canonical_sort(out, ["key_a", "key_b"])


def blocking_quality_planted(
    sf_dir: str,
    dup_every: int = 10,
    offset: int = PLANTED_DOC_OFFSET,
    truth_dup_every: int | None = None,
) -> pd.DataFrame:
    """Record-linkage BLOCKING-QUALITY metrics (Christen's evaluation
    measures, "Data Matching", public) computed over the REAL LSH
    blocking front half on the planted-truth corpus: one row with
    ``n_docs``, ``n_candidate_pairs`` (distinct pairs the banding
    nominates), ``n_true_pairs`` (planted duplicates), ``n_matched``
    (candidates that ARE planted pairs), ``pairs_completeness_scaled``
    (recall of true pairs in the candidate set, 1e6-scaled floor) and
    ``reduction_ratio_scaled`` (fraction of the n·(n−1)/2 full cross
    product the blocking avoided).

    The planted construction (see :func:`planted_flat_docs`) makes the
    expected metrics closed-form: byte-identical companions collide in
    every band (completeness exactly 1.0) and salted tokens make organic
    collisions structurally impossible (candidates == planted pairs) —
    so the SQL oracle certifies that the REAL banding produced exactly
    the planted candidate set and nothing else.

    ``truth_dup_every`` decouples the evaluation truth set from the
    planted corpus (tests use a stricter truth to prove the metric
    actually reports completeness < 1 when the blocking misses pairs).

    Scale: the only non-sketch pass is one per-batch counter fold over
    the candidate relation (two int64 partials per batch); ratios finish
    in arbitrary-precision Python ints (n·(n−1)/2 overflows int64 past
    ~4.3e9 docs)."""
    truth_every = dup_every if truth_dup_every is None else truth_dup_every
    profiles, pairs = _lsh_candidates(
        sf_dir, planted_flat_docs(sf_dir, dup_every, offset)
    )
    n_docs = int(profiles.count())

    def pair_partial(batch: pa.Table) -> pa.Table:
        a = batch["doc_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["doc_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        matched = int(np.count_nonzero((b == a + offset) & (a % truth_every == 0)))
        return pa.table(
            {
                "n_pairs": pa.array([len(a)], type=pa.int64()),
                "n_matched": pa.array([matched], type=pa.int64()),
            }
        )

    folded = pairs.map_batches(pair_partial, batch_format="pyarrow")
    n_cand = int(folded.sum("n_pairs") or 0)
    n_matched = int(folded.sum("n_matched") or 0)

    def true_partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n": pa.array(
                    [int(np.count_nonzero(ids % truth_every == 0))],
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
    total = n_docs * (n_docs - 1) // 2
    completeness = scale if n_true == 0 else (scale * n_matched) // n_true
    rr = scale if total == 0 else (scale * (total - n_cand)) // total
    return pd.DataFrame(
        {
            "n_docs": [n_docs],
            "n_candidate_pairs": [n_cand],
            "n_true_pairs": [n_true],
            "n_matched": [n_matched],
            "pairs_completeness_scaled": [completeness],
            "reduction_ratio_scaled": [rr],
        }
    ).astype("int64")
