"""Stage 1 — per-document signature profiles (stateful actor pool).

The Ray-Data expression of the reference's two cheap passes — the metadata
probe (/root/reference/src/dimensions.rs:10-21) and the quick checksum
(/root/reference/src/main.rs:520-572) — fused into ONE batch pass that emits a
compact *profile* per document:

    doc_id       : string
    idh          : uint64        stable hash of doc_id — the identifier that
                                 rides every tail shuffle (band rows, pairs,
                                 scores) so those stages move fixed-width
                                 numerics, never object strings; strings are
                                 re-attached only to the (small) edge set.
                                 Collisions are detected at broadcast-pack
                                 time; the >10^9-doc upgrade path is a
                                 second 64-bit lane.
    content_hash : uint64        exact-dup key (canonical span bytes)
    n_spans      : int32
    minhash_sig  : binary        MinHash over concatenated text spans
                                 (num_perm uint64 little-endian; empty docs =
                                 all-0xFF sentinel). Binary, not list<uint64>:
                                 hash-join payloads must be Acero-compatible
                                 and the packed form shuffles fewer bytes.
    simhash      : uint64        SimHash over the same shingles
    phashes      : binary        pHash per media span (n_media x uint64 LE)
    n_media      : int32
    text_head    : string        first 256 chars (cheap Jaro-Winkler evidence)

The profile — NOT the document — is what flows through the shuffles, so the
bytes moved per doc are bounded (~1.3 KB) regardless of document size. The
documents table itself is never rewritten (span-sequence invariant).

Used as ``ds.map_batches(SpanSignatures(cfg), batch_format="pyarrow",
batch_size=cfg.batch_size, concurrency=...)`` — construction cost (DCT basis,
permutation seeds) paid once per actor, per the actor-pool rule.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import ERConfig
from ..functions.hashing import canonical_span_strings, stable_hash64
from ..functions.imagehash import dct_matrix, phash_batch
from ..functions.minhash import minhash_signatures
from ..functions.simhash import simhash_from_sketch
from ..sources.corpus import media_payload_batch
from .codec import encode_fixed_u64_rows, encode_varlen_u64

PROFILE_COLUMNS = [
    "doc_id",
    "idh",
    "content_hash",
    "n_spans",
    "minhash_sig",
    "simhash",
    "phashes",
    "n_media",
    "text_head",
]

_TEXT_HEAD = 256
_TEXT_JOIN = "\n"


_INSTANCES: dict[str, "SpanSignatures"] = {}


def span_signatures_batch(batch: pa.Table, cfg: ERConfig) -> pa.Table:
    """Task-friendly wrapper: per-worker-process instance cache.

    Stateless Ray tasks scale elastically to every core with no actor-pool
    ramp-up; the (cheap) per-process construction — DCT basis, seeds — is
    amortized via this cache, giving actor-pool semantics at task cost.
    Heavy state (models) would justify a real actor pool instead."""
    key = cfg.config_hash()
    inst = _INSTANCES.get(key)
    if inst is None:
        _INSTANCES.clear()  # size-1: stale configs would pin state forever
        inst = _INSTANCES.setdefault(key, SpanSignatures(cfg))
    return inst(batch)


class SpanSignatures:
    def __init__(self, cfg: ERConfig | None = None):
        self.cfg = cfg or ERConfig()
        self._dct = dct_matrix(self.cfg.phash_size)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        spans = batch["spans"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        canon = canonical_span_strings(spans)
        content_hash = stable_hash64(canon)

        flat = spans.flatten()
        offsets = spans.offsets.to_numpy()
        kinds = np.asarray(flat.field("kind").to_pylist(), dtype=object)
        texts = flat.field("text").to_pylist()
        refs = flat.field("media_ref").to_pylist()

        n_docs = len(offsets) - 1
        doc_texts: list[str] = []
        media_refs_per_doc: list[list[str]] = []
        for d in range(n_docs):
            lo, hi = offsets[d], offsets[d + 1]
            doc_texts.append(
                _TEXT_JOIN.join(
                    texts[i] for i in range(lo, hi) if kinds[i] == "text"
                )
            )
            media_refs_per_doc.append(
                [refs[i] for i in range(lo, hi) if kinds[i] == "media"]
            )

        sig = minhash_signatures(
            doc_texts,
            num_perm=cfg.num_perm,
            shingle_k=cfg.shingle_k,
            mode=cfg.shingle_mode,
        )
        sim = simhash_from_sketch(sig)

        # one stacked pHash pass for every media span in the batch
        all_refs = [r for refs_d in media_refs_per_doc for r in refs_d]
        if all_refs:
            payloads = media_payload_batch(all_refs, cfg.phash_size)
            ph = phash_batch(payloads, cfg.phash_dct, basis=self._dct)
        else:
            ph = np.empty(0, dtype=np.uint64)
        n_media = np.fromiter(
            (len(r) for r in media_refs_per_doc), np.int64, n_docs
        )
        phashes = encode_varlen_u64(ph, n_media)

        idh = stable_hash64(batch["doc_id"].to_pylist())
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "idh": pa.array(idh, type=pa.uint64()),
                "content_hash": pa.array(content_hash, type=pa.uint64()),
                "n_spans": pa.array(
                    (offsets[1:] - offsets[:-1]).astype(np.int32),
                    type=pa.int32(),
                ),
                "minhash_sig": encode_fixed_u64_rows(sig),
                "simhash": pa.array(sim, type=pa.uint64()),
                "phashes": phashes,
                "n_media": pa.array(
                    n_media.astype(np.int32), type=pa.int32()
                ),
                "text_head": pa.array(
                    [t[:_TEXT_HEAD] for t in doc_texts], type=pa.string()
                ),
            }
        )
