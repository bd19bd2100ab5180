"""Stage 2 — blocking-key emission (stateless map_batches explode).

The analog of the reference's blocking operator — group-by
``(extension, width, height)`` at /root/reference/src/main.rs:365-435 —
generalized to LSH keys for near-duplicate candidates:

- MinHash LSH bands over the text signature (j in 0..lsh_bands), emitted
  only for docs with text;
- pHash bit-bands (4 chunks of 16 bits) per media span — a pair within
  Hamming<=3 is *guaranteed* to share a chunk (pigeonhole) and pairs
  within <=10 share one with high probability.

Keys are NUMERIC uint64 (round-1 emitted ``f"b{j}:{hash:016x}"`` strings
built in a Python loop — O(rows x bands) string formatting per batch, then
re-hashed for sharding; the numeric key needs neither). Key spaces are
disjoint by the top bit: text band hashes (already salted per band) keep
bit 63 clear; pHash chunk keys set it and pack ``(chunk_band, chunk)``.

Exact duplicates do NOT go through blocking at all — they are clustered
directly by ``groupby(content_hash)`` (the reference's phase-2 equality,
src/main.rs:586-648), which also protects against the O(n^2) pair blow-up of
giant identical groups (skew guard).

Output rows are deliberately minimal — (block_key, doc_id, content_hash) —
so the groupby shuffle moves ~50 bytes per key, not the 1.3 KB profile;
profiles are joined back to the *deduplicated pairs* instead (SURVEY.md §4.2).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import ERConfig
from ..functions.minhash import lsh_band_hashes
from ..functions.shingles import UINT64_MAX, splitmix64
from .codec import decode_sig_matrix, decode_varlen_u64

_TOP_BIT = np.uint64(1) << np.uint64(63)
_NO_TOP = ~_TOP_BIT
_SHARD_SALT = np.uint64(0xA24BAED4963EE407)


def shard_of_u64(keys: np.ndarray, n_shards: int) -> np.ndarray:
    """Stable shard id per uint64 key (splitmix64, no string hashing)."""
    return (splitmix64(keys ^ _SHARD_SALT) % np.uint64(n_shards)).astype(
        np.int32
    )


def count_blocking_keys(batch: pa.Table, cfg: ERConfig) -> int:
    """Exact number of rows ``emit_blocking_keys`` would emit for ``batch``,
    without building them: text docs emit ``lsh_bands`` keys each, every
    media pHash emits 4 chunk keys. Lets the pipeline size-gate the fused
    candidate path from the (already materialized) profile blocks instead
    of executing and pinning the exploded key relation just to count it."""
    sig = decode_sig_matrix(batch["minhash_sig"], cfg.num_perm)
    n_text = int((sig[:, 0] != UINT64_MAX).sum()) if len(sig) else 0
    ph_flat, _ = decode_varlen_u64(batch["phashes"])
    return n_text * cfg.lsh_bands + 4 * len(ph_flat)


def emit_blocking_keys(batch: pa.Table, cfg: ERConfig) -> pa.Table:
    """profile batch -> exploded (block_key, idh, content_hash) rows.

    Every column is fixed-width numeric — the doc identifier is the
    profile's ``idh`` hash, so the three tail shuffles (bands, pairs,
    scores) never move or convert object strings."""
    n = batch.num_rows
    chash = batch["content_hash"].to_numpy().astype(np.uint64, copy=False)
    idh = batch["idh"].to_numpy().astype(np.uint64, copy=False)

    sig = decode_sig_matrix(batch["minhash_sig"], cfg.num_perm)
    ph_flat, ph_off = decode_varlen_u64(batch["phashes"])

    key_parts: list[np.ndarray] = []
    idx_parts: list[np.ndarray] = []  # source row per emitted key
    aux_parts: list[np.ndarray] = []  # full pHash on p-chunk rows (0 on text)

    # text bands (skip docs whose signature is the empty sentinel);
    # band hashes are already salted per band, so they ARE the key
    has_text = sig[:, 0] != UINT64_MAX
    if has_text.any():
        t_idx = np.flatnonzero(has_text)
        bands = lsh_band_hashes(sig[t_idx], cfg.lsh_bands)
        key_parts.append(bands.T.reshape(-1) & _NO_TOP)
        idx_parts.append(np.tile(t_idx, cfg.lsh_bands))
        aux_parts.append(np.zeros(t_idx.size * cfg.lsh_bands, np.uint64))

    # media pHash bit-bands (multi-index Hamming, Norouzi et al.): 4 chunks
    # of 16 bits nominate, and the FULL 64-bit pHash rides along so the
    # candidate stage verifies Hamming <= threshold IN-SHARD — random chunk
    # collisions (quadratic in corpus size) die before the pair shuffle.
    if len(ph_flat):
        doc_of_ph = np.repeat(np.arange(n), np.diff(ph_off))
        for j in range(4):
            chunk = (ph_flat >> np.uint64(16 * j)) & np.uint64(0xFFFF)
            key_parts.append(
                _TOP_BIT | (np.uint64(j) << np.uint64(16)) | chunk
            )
            idx_parts.append(doc_of_ph)
            aux_parts.append(ph_flat)

    if not key_parts:
        keys = np.empty(0, np.uint64)
        idx = np.empty(0, np.int64)
        aux = np.empty(0, np.uint64)
    else:
        keys = np.concatenate(key_parts)
        idx = np.concatenate(idx_parts)
        aux = np.concatenate(aux_parts)

    return pa.table(
        {
            "shard": pa.array(shard_of_u64(keys, cfg.n_shards), type=pa.int32()),
            "block_key": pa.array(keys, type=pa.uint64()),
            "idh": pa.array(idh[idx], type=pa.uint64()),
            "content_hash": pa.array(chash[idx], type=pa.uint64()),
            "aux_phash": pa.array(aux, type=pa.uint64()),
        }
    )
