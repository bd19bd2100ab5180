"""Stable vectorized 64-bit content hashing.

Target analog of the reference's exact "deep hash" — a u64 over extension +
decoded pixel bytes (/root/reference/src/main.rs:593-603) — generalized to a
stable 64-bit hash of the *canonicalized span sequence* of a document. Two
docs share a content hash iff their span sequences are byte-identical, which
reproduces the reference's phase-2 exact-equality semantics.

Implementation: pandas' vectorized SipHash (``pd.util.hash_array``), which is
deterministic for a fixed ``hash_key`` across processes and sessions — no
Python-level per-row loops in the hot path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_HASH_KEY = "dedupe_ray_00042"  # exactly 16 bytes; fixed so hashes reproduce

_FIELD_SEP = "\x1f"
_SPAN_SEP = "\x1e"


def stable_hash64(values) -> np.ndarray:
    """uint64 stable hash of an array-like of strings (vectorized)."""
    arr = np.asarray(values, dtype=object)
    return pd.util.hash_array(arr, hash_key=_HASH_KEY).astype(np.uint64)


def canonical_span_strings(spans_column: pa.ChunkedArray | pa.ListArray) -> list[str]:
    """One canonical string per document from its spans list.

    Encodes (kind, text, media_ref, offset) per span joined with control
    separators — the canonical byte form whose equality defines exact
    duplication (span-sequence equality, the per-row invariant in
    BASELINE.json input_hint).
    """
    if isinstance(spans_column, pa.ChunkedArray):
        spans_column = spans_column.combine_chunks()
    flat = spans_column.flatten()  # struct array of all spans
    offsets = spans_column.offsets.to_numpy()
    kinds = flat.field("kind").to_pylist()
    texts = flat.field("text").to_pylist()
    refs = flat.field("media_ref").to_pylist()
    offs = flat.field("offset").to_pylist()
    parts = [
        f"{kinds[i]}{_FIELD_SEP}{texts[i] or ''}{_FIELD_SEP}{refs[i] or ''}"
        f"{_FIELD_SEP}{offs[i]}"
        for i in range(len(kinds))
    ]
    return [
        _SPAN_SEP.join(parts[offsets[d] : offsets[d + 1]])
        for d in range(len(offsets) - 1)
    ]


def content_hash_batch(batch: pa.Table) -> pa.Table:
    """map_batches kernel: add a ``content_hash: uint64`` column computed from
    the canonical span sequence. Zero rewrites of ``spans`` itself."""
    canon = canonical_span_strings(batch["spans"])
    h = stable_hash64(canon)
    return batch.append_column("content_hash", pa.array(h, type=pa.uint64()))
