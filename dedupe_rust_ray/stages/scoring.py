"""Stage 5 — pairwise scoring (stateful actor pool over joined pair rows).

Replaces the reference's deep-confirmation phase — full decode + u64 equality
(/root/reference/src/main.rs:586-648) — with a fused similarity score:

- exact fast path : equal ``content_hash`` -> score 1.0 (phase-2 equality);
- text            : MinHash-estimated Jaccard over shingles, with bounded
                    Levenshtein similarity on the 256-char text head as the
                    deep check for candidates the sketch can't clear;
- media           : per-aligned-span pHash Hamming similarity (1 - hd/64),
                    averaged; SimHash Hamming as a corroborating signal.

Input rows carry BOTH profiles (suffixes ``_a`` / ``_b`` from the two joins
in pipelines/er.py). Output adds ``score: float64``; the pipeline filters
``score >= cfg.score_threshold`` into match edges.

Vectorization: everything except Jaro-Winkler is numpy over the whole batch;
JW runs only on rows inside the uncertain band (a small fraction), mirroring
the cheap-then-deep split of the reference.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import ERConfig
from ..functions.minhash import estimate_jaccard
from ..functions.simhash import hamming64
from ..functions.shingles import char_shingle_hashes
from ..functions.strsim import levenshtein_bounded
from .codec import (
    binary_col_blob as _binary_col_blob,
    decode_sig_matrix,
    decode_varlen_u64,
    string_col_buffers as _string_col_buffers,
)


def pack_profiles(table: pa.Table) -> tuple:
    """Pack a profiles Arrow table into flat NUMPY structures.

    EVERYTHING is a numpy array — including the doc-id lookup, which is a
    sorted array of 64-bit id hashes plus the row permutation (binary
    search per pair endpoint instead of a dict). Ray's object store keeps
    numpy buffers out-of-band, so every worker process maps the broadcast
    READ-ONLY with zero copies; a python list / dict of 10^5+ doc-id
    strings would be re-pickled and rebuilt once per worker process
    (~seconds each, multiplied by every process in the pool). Text heads
    stay utf8-encoded (buffer + offsets) and are decoded lazily, only for
    the few pairs that reach the deep text tier."""
    from ..functions.hashing import stable_hash64

    n = table.num_rows
    if "idh" in table.column_names:
        id_hash = table["idh"].to_numpy().astype(np.uint64, copy=False)
    else:
        id_hash = stable_hash64(table["doc_id"].to_pylist()).astype(np.uint64)
    order = np.argsort(id_hash, kind="stable")
    id_hash_sorted = id_hash[order]
    if n and (id_hash_sorted[1:] == id_hash_sorted[:-1]).any():
        raise ValueError("doc_id hash collision in broadcast pack")
    ch = table["content_hash"].to_numpy().astype(np.uint64)
    sig_blob, _ = _binary_col_blob(table["minhash_sig"])
    num_perm = len(sig_blob) // 8 // max(n, 1)
    sig = np.frombuffer(sig_blob, dtype="<u8").reshape(n, max(num_perm, 1))
    sim = table["simhash"].to_numpy().astype(np.uint64)
    ph_blob, ph_off = _binary_col_blob(table["phashes"])
    ph = np.frombuffer(ph_blob, dtype="<u8")
    head_buf, head_off = _string_col_buffers(table["text_head"])
    return (id_hash_sorted, order, ch, sig, sim, ph_off, ph, head_buf, head_off)


_SCORER_CACHE: dict[str, "BroadcastPairScorer"] = {}


def broadcast_score_batch(batch: pa.Table, ref, cfg: ERConfig) -> pa.Table:
    """Task-friendly wrapper around :class:`BroadcastPairScorer` with a
    per-worker-process cache — the broadcast profile unpack happens once
    per process, while the stage itself runs as elastic tasks."""
    key = f"{ref.hex() if hasattr(ref, 'hex') else id(ref)}:{cfg.config_hash()}"
    scorer = _SCORER_CACHE.get(key)
    if scorer is None:
        # size-1 cache: a stale entry pins a full packed profile set
        # (up to ~1.3 GB at broadcast_max_docs) in a long-lived worker
        _SCORER_CACHE.clear()
        scorer = _SCORER_CACHE.setdefault(key, BroadcastPairScorer(ref, cfg))
    return scorer(batch)


class BroadcastPairScorer:
    """Fused attach+score for the broadcast (small-profile-set) path:
    reads both endpoint profiles straight out of the broadcast packed
    arrays — the joined pair table is never materialized. Emits
    (doc_a, doc_b, score)."""

    def __init__(self, ref, cfg: ERConfig | None = None):
        import ray

        self.cfg = cfg or ERConfig()
        packed = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        (self.id_hash_sorted, self.order, self.ch, self.sig, self.sim,
         self.ph_off, self.ph, self.head_buf, self.head_off) = packed

    def _head(self, i: int) -> str:
        lo, hi = self.head_off[i], self.head_off[i + 1]
        return self.head_buf[lo:hi].tobytes().decode("utf-8", "replace")

    def _rows_of(self, col) -> np.ndarray:
        """Vectorized id -> profile row via binary search on id hashes.
        Accepts a uint64 ``idh`` column (the numeric tail path — no
        hashing at all) or a string doc_id column."""
        if pa.types.is_unsigned_integer(col.type):
            h = col.to_numpy().astype(np.uint64, copy=False)
        else:
            from ..functions.hashing import stable_hash64

            h = stable_hash64(col.to_pylist()).astype(np.uint64)
        pos = np.searchsorted(self.id_hash_sorted, h)
        pos = np.minimum(pos, len(self.id_hash_sorted) - 1)
        if not (self.id_hash_sorted[pos] == h).all():
            raise KeyError("candidate pair references unknown doc_id")
        return self.order[pos]

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch.append_column(
                "score", pa.array([], type=pa.float64())
            )
        ca = batch["doc_a"]
        cb = batch["doc_b"]
        if isinstance(ca, pa.ChunkedArray):
            ca = ca.combine_chunks()
        if isinstance(cb, pa.ChunkedArray):
            cb = cb.combine_chunks()
        ra = self._rows_of(ca)
        rb = self._rows_of(cb)
        score = score_pair_rows(
            self.cfg,
            self.ch[ra], self.ch[rb],
            self.sig[ra], self.sig[rb],
            self.sim[ra], self.sim[rb],
            self.ph, self.ph_off, ra, rb,
            [self._head(i) for i in ra], [self._head(i) for i in rb],
        )
        return pa.table(
            {
                "doc_a": batch["doc_a"],
                "doc_b": batch["doc_b"],
                "score": pa.array(score, type=pa.float64()),
            }
        )


def score_pair_rows(
    cfg, ch_a, ch_b, sig_a, sig_b, sim_a, sim_b,
    ph_flat, ph_off, ra, rb, heads_a, heads_b,
) -> np.ndarray:
    """Vectorized fused score for aligned pair rows (shared by both the
    broadcast scorer and the join-path scorer)."""
    n = len(ch_a)
    exact = ch_a == ch_b
    jac = estimate_jaccard(sig_a, sig_b)
    sim_score = 1.0 - hamming64(sim_a, sim_b) / 64.0

    na = ph_off[ra + 1] - ph_off[ra] if len(ph_flat) else np.zeros(n, np.int64)
    nb = ph_off[rb + 1] - ph_off[rb] if len(ph_flat) else np.zeros(n, np.int64)
    media_score = np.full(n, np.nan)
    both = (na > 0) & (nb > 0)
    single = both & (na == 1) & (nb == 1)  # the common case, vectorized
    if single.any():
        s = np.flatnonzero(single)
        media_score[s] = 1.0 - hamming64(
            ph_flat[ph_off[ra[s]]], ph_flat[ph_off[rb[s]]]
        ) / 64.0
    for i in np.flatnonzero(both & ~single):
        m = min(na[i], nb[i])
        ha = ph_flat[ph_off[ra[i]] : ph_off[ra[i]] + m]
        hb = ph_flat[ph_off[rb[i]] : ph_off[rb[i]] + m]
        media_score[i] = float(np.mean(1.0 - hamming64(ha, hb) / 64.0))

    has_text = np.array([bool(a) and bool(b) for a, b in zip(heads_a, heads_b)])
    text_score = np.where(has_text, jac, np.nan)

    # upper-bound screen: skip the expensive text tier for pairs that can't
    # reach the threshold even with a PERFECT text score. Random pHash-chunk
    # collisions (Hamming ~32) nominate quadratically many pairs at scale —
    # this prunes ~95% of them in pure numpy before any string work.
    w_t0 = np.where(has_text, cfg.w_text, 0.0)
    w_m0 = np.where(~np.isnan(media_score), cfg.w_media, 0.0)
    ub_text = 0.8 * 1.0 + 0.2 * sim_score
    fused_ub = (
        w_t0 * np.where(has_text, ub_text, 0.0)
        + w_m0 * np.nan_to_num(media_score)
    ) / np.maximum(w_t0 + w_m0, 1e-9)
    passable = exact | (fused_ub >= cfg.score_threshold)
    # Three-tier text check (cheap-then-deep, the reference's structure):
    #   1. word-shingle MinHash Jaccard (already computed, vectorized) —
    #      collapses on SHORT texts under char-level edits (FIXTURES.md:
    #      <=2 char edits/span), hence:
    #   2. EXACT char-5-gram Jaccard of the 256-char heads — one
    #      vectorized hashing pass over the batch's unique heads, then
    #      sorted-array intersections (~tens of us/pair);
    #   3. bounded Levenshtein ONLY for the ambiguous sliver where char
    #      shingling still over-penalizes (very short heads) — a few
    #      pairs per batch, not all candidates.
    band = has_text & (jac < 0.95) & ~exact & passable
    band_idx = np.flatnonzero(band)
    if len(band_idx):
        uniq: dict[str, int] = {}
        for i in band_idx:
            for h in (heads_a[i], heads_b[i]):
                if h not in uniq:
                    uniq[h] = len(uniq)
        win, off = char_shingle_hashes(list(uniq), k=5)
        gram_sets = [
            np.unique(win[off[u] : off[u + 1]]) for u in range(len(uniq))
        ]
        for i in band_idx:
            sa = gram_sets[uniq[heads_a[i]]]
            sb = gram_sets[uniq[heads_b[i]]]
            union = sa.size + sb.size
            if union == 0:
                continue
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            char_j = inter / (union - inter)
            best = max(jac[i], char_j)
            ha, hb = heads_a[i], heads_b[i]
            length = max(len(ha), len(hb))
            # tier 3 (edit distance) decides only for SHORT heads, where
            # char shingling over-penalizes; for long heads the exact
            # char-gram Jaccard is already a reliable similarity
            if 0.25 < char_j < 0.9 and length < 64:
                d = levenshtein_bounded(ha, hb, max(2, length // 4))
                best = max(best, 1.0 - d / length)
            text_score[i] = best
    text_score = np.where(
        has_text, 0.8 * text_score + 0.2 * np.where(has_text, sim_score, 0.0), np.nan
    )

    w_t = np.where(~np.isnan(text_score), cfg.w_text, 0.0)
    w_m = np.where(~np.isnan(media_score), cfg.w_media, 0.0)
    denom = np.maximum(w_t + w_m, 1e-9)
    fused = (w_t * np.nan_to_num(text_score) + w_m * np.nan_to_num(media_score)) / denom
    return np.where(exact, 1.0, fused)


class PairScorer:
    def __init__(self, cfg: ERConfig | None = None):
        self.cfg = cfg or ERConfig()

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {
                    "doc_a": batch["doc_a"],
                    "doc_b": batch["doc_b"],
                    "score": pa.array([], type=pa.float64()),
                }
            )

        def col(name):
            c = batch[name]
            return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

        sig_a = decode_sig_matrix(col("minhash_sig_a"), cfg.num_perm)
        sig_b = decode_sig_matrix(col("minhash_sig_b"), cfg.num_perm)
        pa_flat, pa_off = decode_varlen_u64(col("phashes_a"))
        pb_flat, pb_off = decode_varlen_u64(col("phashes_b"))
        # fold the two per-side phash layouts into one flat array so the
        # shared kernel can index both sides uniformly
        ph_flat = np.concatenate([pa_flat, pb_flat]) if len(pa_flat) or len(pb_flat) else pa_flat
        ph_off = np.concatenate([pa_off[:-1], pa_off[-1] + pb_off])
        ra = np.arange(n, dtype=np.int64)
        rb = n + ra

        score = score_pair_rows(
            cfg,
            col("content_hash_a").to_numpy(), col("content_hash_b").to_numpy(),
            sig_a, sig_b,
            col("simhash_a").to_numpy(), col("simhash_b").to_numpy(),
            ph_flat, ph_off, ra, rb,
            col("text_head_a").to_pylist(), col("text_head_b").to_pylist(),
        )
        # minimal output: the joined 1.3 KB/row profile payloads must not
        # ride beyond the scorer
        return pa.table(
            {
                "doc_a": batch["doc_a"],
                "doc_b": batch["doc_b"],
                "score": pa.array(score, type=pa.float64()),
            }
        )
