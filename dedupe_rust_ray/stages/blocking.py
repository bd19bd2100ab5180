"""Stage 2 — blocking-key emission (stateless map_batches explode).

The analog of the reference's blocking operator — group-by
``(extension, width, height)`` at /root/reference/src/main.rs:365-435 —
generalized to LSH keys for near-duplicate candidates:

- ``b{j}:{band_hash}``  : MinHash LSH bands over the text signature
  (j in 0..lsh_bands), emitted only for docs with text;
- ``p{j}:{16-bit chunk}``: pHash bit-bands (4 chunks of 16 bits) per media
  span — a pair within Hamming<=3 is *guaranteed* to share a chunk
  (pigeonhole) and pairs within <=10 share one with high probability.

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
from ..functions.grouping import shard_of
from ..functions.minhash import lsh_band_hashes
from ..functions.shingles import UINT64_MAX
from .codec import decode_sig_matrix, decode_varlen_u64


def emit_blocking_keys(batch: pa.Table, cfg: ERConfig) -> pa.Table:
    """profile batch -> exploded (block_key, doc_id, content_hash) rows."""
    n = batch.num_rows
    doc_ids = batch["doc_id"].to_pylist()
    chash = batch["content_hash"].to_numpy()

    sig = decode_sig_matrix(batch["minhash_sig"], cfg.num_perm)
    ph_flat, ph_off = decode_varlen_u64(batch["phashes"])

    keys: list[str] = []
    out_doc: list[str] = []
    out_hash: list[int] = []
    out_aux: list[int] = []  # full pHash on p-chunk rows (0 on text rows)

    # text bands (skip docs whose signature is the empty sentinel)
    has_text = sig[:, 0] != UINT64_MAX
    if has_text.any():
        bands = lsh_band_hashes(sig[has_text], cfg.lsh_bands)
        t_ids = [doc_ids[i] for i in np.flatnonzero(has_text)]
        t_hash = chash[has_text]
        for j in range(cfg.lsh_bands):
            col = bands[:, j]
            keys.extend(f"b{j}:{v:016x}" for v in col)
            out_doc.extend(t_ids)
            out_hash.extend(int(h) for h in t_hash)
            out_aux.extend([0] * len(t_ids))

    # media pHash bit-bands (multi-index Hamming, Norouzi et al.): 4 chunks
    # of 16 bits nominate, and the FULL 64-bit pHash rides along so the
    # candidate stage verifies Hamming <= threshold IN-SHARD — random chunk
    # collisions (quadratic in corpus size) die before the pair shuffle.
    if len(ph_flat):
        doc_of_ph = np.repeat(np.arange(n), ph_off[1:] - ph_off[:-1])
        for j in range(4):
            chunk = (ph_flat >> np.uint64(16 * j)) & np.uint64(0xFFFF)
            keys.extend(
                f"p{j}:{int(c):04x}" for c in chunk
            )
            out_doc.extend(doc_ids[d] for d in doc_of_ph)
            out_hash.extend(int(chash[d]) for d in doc_of_ph)
            out_aux.extend(int(p) for p in ph_flat)

    keys_np = np.array(keys, dtype=object)
    return pa.table(
        {
            "shard": pa.array(
                shard_of(keys_np, cfg.n_shards), type=pa.int32()
            ),
            "block_key": pa.array(keys, type=pa.string()),
            "doc_id": pa.array(out_doc, type=pa.string()),
            "content_hash": pa.array(out_hash, type=pa.uint64()),
            "aux_phash": pa.array(out_aux, type=pa.uint64()),
        }
    )
