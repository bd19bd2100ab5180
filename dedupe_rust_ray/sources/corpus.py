"""Deterministic synthetic interleaved-document corpus (FIXTURES.md F1-F3).

Generalizes the reference's input — a directory tree of image files
(/root/reference/src/main.rs:127-205) — into the target data model from
BASELINE.json ``input_hint``::

    doc_id : string
    spans  : list<struct<kind:string, text:string, media_ref:string, offset:int32>>

Media payloads are *derived deterministically from the media_ref string*
(rng seeded by sha256(ref)), so any worker can re-materialize pixels without
shared storage — the analog of the reference decoding pixels from a file path
(/root/reference/src/main.rs:659-681).

Planted ground truth mirrors the reference's duplicate semantics
(/root/reference/src/main.rs:586-648):

- exact duplicates  (~10%): byte-identical span sequences, new doc_id;
- near duplicates   (~10%): <=2 char edits per text span and/or media payload
  noise below the pHash Hamming threshold;
- distractors       (~10%): overlapping vocabulary but beyond all thresholds;
- singletons        (rest): never clustered (src/main.rs:418-421, 610-613).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)
DOCS_SCHEMA = pa.schema(
    [("doc_id", pa.string()), ("spans", pa.list_(SPAN_STRUCT))]
)
LABELS_SCHEMA = pa.schema(
    [
        ("doc_a", pa.string()),
        ("doc_b", pa.string()),
        ("is_dup", pa.bool_()),
        ("kind", pa.string()),  # exact | near | distractor
    ]
)
CLUSTERS_SCHEMA = pa.schema(
    [("cluster_id", pa.string()), ("doc_id", pa.string())]
)

_PAYLOAD_EDGE = 32  # synthetic media payloads are 32x32 grayscale


def _seed_from(s: str) -> int:
    return int.from_bytes(hashlib.sha256(s.encode()).digest()[:8], "little")


def _decode_data_ref(ref: str, edge: int) -> np.ndarray:
    """Resolve a ``data:hex,<container bytes>`` media_ref through the REAL
    codec stack (PNG/BMP/GIF/JPEG/WebP via magic sniffing) and fit the
    decoded pixels to the pHash grid — the cross-container image-dedup
    path: two refs embedding the same pixels in different formats produce
    identical payload grids, hence identical pHashes, hence one blocking
    key and a media score of 1.0 (the reference's decoded-pixel duplicate
    semantics, /root/reference/src/main.rs:593-681, across containers).
    Undecodable payloads fall back to a deterministic noise grid derived
    from the ref string (never a crash — warn-and-skip parity)."""
    from ..stages.dims import sniff_format
    from ..stages.multimodal import fit_to_grid

    try:
        payload = bytes.fromhex(ref[len("data:hex,"):])
    except ValueError:
        payload = b""
    img = None
    fmt = sniff_format(payload)
    dec = _DATA_DECODERS.get(fmt) if fmt else None
    if dec is not None:
        img = dec(payload)
    if img is None:
        return media_payload_batch(["media://" + ref], edge)[0]
    # the SAME fitting rule as MediaPhash — bit-for-bit agreement is what
    # makes cross-container pHashes collide
    return fit_to_grid(np.asarray(img, dtype=np.float32), edge)


def _data_decoders() -> dict:
    from ..stages.jpeg import decode_jpeg
    from ..stages.multimodal import decode_bmp, decode_gif, decode_png
    from ..stages.webp import decode_webp

    return {
        "png": decode_png,
        "bmp": decode_bmp,
        "gif": decode_gif,
        "jpeg": decode_jpeg,
        "jpg": decode_jpeg,
        "webp": decode_webp,
    }


class _LazyDecoders(dict):
    def __missing__(self, key):  # populate on first data: ref
        self.update(_data_decoders())
        return super().get(key)

    def get(self, key, default=None):
        if not len(self):
            self.update(_data_decoders())
        return super().get(key, default)


_DATA_DECODERS: dict = _LazyDecoders()


def media_payload_batch(
    media_refs: list[str], edge: int = _PAYLOAD_EDGE
) -> np.ndarray:
    """Deterministic grayscale pixels for a batch of media_refs, stacked
    (B, edge, edge) float32 — one vectorized pass for the whole batch.

    Refs with the ``data:hex,`` scheme carry an EMBEDDED container payload
    (PNG/BMP/GIF/JPEG/WebP bytes) and are decoded through the real codec
    stack instead of synthesized (see :func:`_decode_data_ref`).

    The base image is a low-frequency 8x8 pattern upsampled to ``edge`` so
    perceptual hashes are stable; a ``.n{j}`` suffix adds small
    deterministic noise (below the pHash near-dup threshold by
    construction). Pixel values come from a splitmix64 counter stream
    keyed by the sha256 of the ref — a per-ref ``default_rng`` costs
    ~200 us in generator setup alone, which dominated the signature stage
    at ~1.3 media spans per document."""
    from ..functions.shingles import splitmix64

    b = len(media_refs)
    out = np.empty((b, edge, edge), dtype=np.float32)
    if b == 0:
        return out
    data_idx = [i for i, r in enumerate(media_refs) if r.startswith("data:hex,")]
    if data_idx:
        for i in data_idx:
            out[i] = _decode_data_ref(media_refs[i], edge)
        rest = [i for i in range(b) if not media_refs[i].startswith("data:hex,")]
        if rest:
            out[rest] = media_payload_batch(
                [media_refs[i] for i in rest], edge
            )
        return out
    up = edge // 8
    k = np.arange(64, dtype=np.uint64)
    kk = np.arange(edge * edge, dtype=np.uint64)
    # chunked: this host faults in large fresh numpy intermediates
    # pathologically slowly; ~2k-payload chunks keep every temp inside
    # malloc-reused pages (x50 observed vs one monolithic pass)
    CH = 2048
    for s in range(0, b, CH):
        refs = media_refs[s : s + CH]
        seeds = np.fromiter(
            (_seed_from(r.partition(".")[0]) for r in refs),
            np.uint64,
            len(refs),
        )
        with np.errstate(over="ignore"):
            coarse = (
                splitmix64(
                    seeds[:, None] * np.uint64(0x9E3779B97F4A7C15) ^ k[None, :]
                )
                % np.uint64(256)
            ).astype(np.float32).reshape(-1, 8, 8)
        img = np.repeat(np.repeat(coarse, up, axis=1), up, axis=2)
        noisy = np.fromiter(("." in r for r in refs), bool, len(refs))
        if noisy.any():
            nseeds = np.fromiter(
                (_seed_from(r) for r, f in zip(refs, noisy) if f), np.uint64
            )
            with np.errstate(over="ignore"):
                u = splitmix64(
                    nseeds[:, None] * np.uint64(0xD6E8FEB86659FD93) ^ kk[None, :]
                ).astype(np.float64) / float(1 << 64)
            noise = (u * 6.0 - 3.0).astype(np.float32).reshape(-1, edge, edge)
            img[noisy] = np.clip(img[noisy] + noise, 0.0, 255.0)
        out[s : s + len(refs)] = img
    return out


def media_payload(media_ref: str, edge: int = _PAYLOAD_EDGE) -> np.ndarray:
    """Single-ref convenience wrapper over :func:`media_payload_batch`
    (identical values — the batch path is canonical)."""
    return media_payload_batch([media_ref], edge)[0]


def _make_vocab(rng: np.random.Generator, size: int = 1200) -> list[str]:
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    vocab = set()
    while len(vocab) < size:
        n = int(rng.integers(3, 10))
        vocab.add("".join(rng.choice(letters, n)))
    return sorted(vocab)


def _edit_text(text: str, rng: np.random.Generator, n_edits: int = 2) -> str:
    """<=2 single-character substitutions (FIXTURES.md near-dup spec)."""
    chars = list(text)
    for _ in range(min(n_edits, max(1, len(chars) // 10))):
        i = int(rng.integers(0, len(chars)))
        chars[i] = chr(ord("a") + int(rng.integers(0, 26)))
    return "".join(chars)


def _base_doc_spans(rng: np.random.Generator, vocab: list[str]) -> list[dict]:
    n_spans = int(rng.integers(1, 7))
    spans = []
    for off in range(n_spans):
        if rng.random() < 0.65:
            n_words = int(rng.integers(30, 80))
            words = rng.choice(len(vocab), n_words)
            spans.append(
                {
                    "kind": "text",
                    "text": " ".join(vocab[w] for w in words),
                    "media_ref": "",
                    "offset": off,
                }
            )
        else:
            ref = "media://" + rng.bytes(8).hex()
            spans.append(
                {"kind": "media", "text": "", "media_ref": ref, "offset": off}
            )
    return spans


def _near_dup_spans(
    spans: list[dict], rng: np.random.Generator, variant: int
) -> list[dict]:
    out = []
    for s in spans:
        if s["kind"] == "text":
            out.append(
                {
                    "kind": "text",
                    "text": _edit_text(s["text"], rng),
                    "media_ref": "",
                    "offset": s["offset"],
                }
            )
        else:
            out.append(
                {
                    "kind": "media",
                    "text": "",
                    "media_ref": s["media_ref"] + f".n{variant}",
                    "offset": s["offset"],
                }
            )
    return out


def _distractor_spans(
    spans: list[dict], rng: np.random.Generator, vocab: list[str]
) -> list[dict]:
    """Same rough vocabulary, ~50% of words replaced -> Jaccard well below
    threshold; media refs fully new (different payload)."""
    out = []
    for s in spans:
        if s["kind"] == "text":
            words = s["text"].split()
            for i in range(len(words)):
                if rng.random() < 0.5:
                    words[i] = vocab[int(rng.integers(0, len(vocab)))]
            out.append(
                {
                    "kind": "text",
                    "text": " ".join(words),
                    "media_ref": "",
                    "offset": s["offset"],
                }
            )
        else:
            ref = "media://" + rng.bytes(8).hex()
            out.append(
                {"kind": "media", "text": "", "media_ref": ref, "offset": s["offset"]}
            )
    return out


def synth_corpus_table(
    n_base: int = 200, seed: int = 42
) -> tuple[pa.Table, pa.Table, pa.Table]:
    """Build (documents, labels, clusters_expected) Arrow tables.

    doc ids are assigned so that every planted copy sorts after its base doc,
    making ``cluster_id = min(doc_id)`` the base id (canonicalization as in
    /root/reference/src/main.rs:630).
    """
    rng = np.random.default_rng(seed)
    vocab = _make_vocab(rng)

    doc_ids: list[str] = []
    spans_col: list[list[dict]] = []
    labels: list[tuple[str, str, bool, str]] = []
    clusters: list[tuple[str, str]] = []

    next_id = 0

    def new_id() -> str:
        nonlocal next_id
        v = f"doc-{next_id:09d}"
        next_id += 1
        return v

    bases = []
    for _ in range(n_base):
        did = new_id()
        spans = _base_doc_spans(rng, vocab)
        doc_ids.append(did)
        spans_col.append(spans)
        bases.append((did, spans))

    # roles: per base doc, plant exact / near / distractor companions
    roles = rng.random(n_base)
    for i, (did, spans) in enumerate(bases):
        members = [did]
        if roles[i] < 0.10:  # exact duplicate family (1-2 copies)
            for _ in range(int(rng.integers(1, 3))):
                cid = new_id()
                doc_ids.append(cid)
                spans_col.append([dict(s) for s in spans])
                labels.append((did, cid, True, "exact"))
                members.append(cid)
        elif roles[i] < 0.20:  # near duplicate
            cid = new_id()
            doc_ids.append(cid)
            spans_col.append(_near_dup_spans(spans, rng, variant=1))
            labels.append((did, cid, True, "near"))
            members.append(cid)
        elif roles[i] < 0.30:  # distractor — must NOT cluster
            cid = new_id()
            doc_ids.append(cid)
            spans_col.append(_distractor_spans(spans, rng, vocab))
            labels.append((did, cid, False, "distractor"))
        if len(members) > 1:
            for m in sorted(members):
                clusters.append((min(members), m))

    docs = pa.Table.from_pydict(
        {"doc_id": doc_ids, "spans": spans_col}, schema=DOCS_SCHEMA
    )
    lab = pa.Table.from_pydict(
        {
            "doc_a": [a for a, _, _, _ in labels],
            "doc_b": [b for _, b, _, _ in labels],
            "is_dup": [d for _, _, d, _ in labels],
            "kind": [k for _, _, _, k in labels],
        },
        schema=LABELS_SCHEMA,
    )
    clu = pa.Table.from_pydict(
        {
            "cluster_id": [c for c, _ in clusters],
            "doc_id": [d for _, d in clusters],
        },
        schema=CLUSTERS_SCHEMA,
    )
    return docs, lab, clu


def synth_corpus_dataset(n_base: int = 200, seed: int = 42):
    """The documents table as a ray.data.Dataset (labels/clusters discarded)."""
    import ray.data

    docs, _, _ = synth_corpus_table(n_base, seed)
    return ray.data.from_arrow(docs)


def _media_rich_doc_spans(rng: np.random.Generator, vocab: list[str]) -> list[dict]:
    """Media-dominant documents (2-4 media spans + 1-2 short text spans) —
    the faithful analog of the reference's image-directory corpus
    (/root/reference/src/main.rs:127-205: it dedupes IMAGES; text is the
    generalization). Used by the bench headline."""
    spans = []
    off = 0
    for _ in range(int(rng.integers(2, 5))):
        ref = "media://" + rng.bytes(8).hex()
        spans.append({"kind": "media", "text": "", "media_ref": ref, "offset": off})
        off += 1
    for _ in range(int(rng.integers(1, 3))):
        n_words = int(rng.integers(20, 40))
        words = rng.choice(len(vocab), n_words)
        spans.append(
            {
                "kind": "text",
                "text": " ".join(vocab[w] for w in words),
                "media_ref": "",
                "offset": off,
            }
        )
        off += 1
    return spans


def _emit_role_docs(
    idx: int,
    seed: int,
    vocab: list[str],
    make_spans,
    out_ids: list[str],
    out_spans: list[list[dict]],
) -> None:
    """One base doc + its planted companion (shared by the distributed and
    skewed generators). Derives from ``default_rng((seed, idx))`` so
    generation is order- and partitioning-independent. Roles by
    ``idx % 10``: 0 -> +exact copy, 1 -> +near dup, 2 -> +distractor."""
    rng = np.random.default_rng((seed, idx))
    spans = make_spans(rng, vocab)
    out_ids.append(f"doc-{idx:09d}")
    out_spans.append(spans)
    role = idx % 10
    if role == 0:
        out_ids.append(f"doc-{idx:09d}x1")
        out_spans.append([dict(s) for s in spans])
    elif role == 1:
        out_ids.append(f"doc-{idx:09d}x1")
        out_spans.append(_near_dup_spans(spans, rng, variant=1))
    elif role == 2:
        out_ids.append(f"doc-{idx:09d}y1")
        out_spans.append(_distractor_spans(spans, rng, vocab))


def synth_corpus_distributed(
    n_base: int, seed: int = 42, *, blocks: int = 64, media_rich: bool = False
):
    """Large-scale deterministic corpus generated INSIDE Ray tasks (the
    bench-scale generator): ``ray.data.range`` over base-doc indices,
    exploded per batch into documents + planted companions
    (see ``_emit_role_docs``)."""
    import ray.data

    vocab = _make_vocab(np.random.default_rng(seed))
    make_spans = _media_rich_doc_spans if media_rich else _base_doc_spans

    def make_docs(batch) -> pa.Table:
        idxs = batch["id"]
        out_ids: list[str] = []
        out_spans: list[list[dict]] = []
        for idx in idxs.to_pylist() if hasattr(idxs, "to_pylist") else idxs:
            _emit_role_docs(int(idx), seed, vocab, make_spans, out_ids, out_spans)
        return pa.Table.from_pydict(
            {"doc_id": out_ids, "spans": out_spans}, schema=DOCS_SCHEMA
        )

    return ray.data.range(n_base, override_num_blocks=blocks).map_batches(
        make_docs, batch_format="pyarrow"
    )


def synth_corpus_skewed(
    n_base: int,
    hot_n: int,
    seed: int = 42,
    *,
    blocks: int = 64,
    media_rich: bool = True,
):
    """Endurance corpus: the distributed synthetic corpus plus ONE
    pathological hot block — ``hot_n`` byte-identical documents (same text
    spans, same media refs) interleaved evenly across input blocks.

    Every hot doc shares one content hash, one pHash, and identical LSH
    bands, so each blocking stage sees a single giant key. The guards that
    must keep per-task memory bounded (the point of the fixture): the
    exact-hash fast path connects the clique with hot_n-1 chain edges and
    the candidate stage skips equal-content-hash pairs outright, so the
    giant block contributes ZERO scored pairs; any residual oversize block
    degrades to neighbor chaining (``cfg.max_block_size``) under the hard
    ``cfg.max_pairs_per_shard`` cap.

    Hot ids are spread by an exact Bresenham interleave (id ``i`` is hot
    iff ``(i+1)*hot_n//total > i*hot_n//total``), so the hot block is not
    an artifact of one input partition — exactly ``hot_n`` hot docs appear
    regardless of block layout, and base docs keep the same content as
    ``synth_corpus_distributed(n_base)`` (only their interleave position
    shifts)."""
    import ray.data

    total = n_base + hot_n
    vocab = _make_vocab(np.random.default_rng(seed))
    make_spans = _media_rich_doc_spans if media_rich else _base_doc_spans
    # the hot document: one fixed span list reused verbatim for every hot id
    hot_spans = make_spans(np.random.default_rng((seed, 987_654_321)), vocab)

    def make_docs(batch) -> pa.Table:
        idxs = batch["id"]
        out_ids: list[str] = []
        out_spans: list[list[dict]] = []
        for idx in idxs.to_pylist() if hasattr(idxs, "to_pylist") else idxs:
            idx = int(idx)
            below = idx * hot_n // total
            if (idx + 1) * hot_n // total > below:
                out_ids.append(f"hot-{below:09d}")
                out_spans.append([dict(s) for s in hot_spans])
            else:
                _emit_role_docs(
                    idx - below, seed, vocab, make_spans, out_ids, out_spans
                )
        return pa.Table.from_pydict(
            {"doc_id": out_ids, "spans": out_spans}, schema=DOCS_SCHEMA
        )

    return ray.data.range(total, override_num_blocks=blocks).map_batches(
        make_docs, batch_format="pyarrow"
    )


def corpus_from_flat_documents(sf_dir: str, dup_every: int = 10):
    """Derive an interleaved spans corpus from the driver's flat
    ``documents`` table (doc_id:int64, text, ...) as a *streaming* Ray
    transformation — no driver-side materialization.

    Every row becomes one spans-document (text split into 1-3 text spans,
    plus a media span whose ref is derived from the text hash); every
    ``dup_every``-th doc additionally emits a near-duplicate copy. Fully
    deterministic, so repeated runs see the same corpus.
    """
    import pandas as pd
    import ray.data

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        texts = batch["text"].to_pylist()
        h = pd.util.hash_array(np.asarray(texts, dtype=object)).astype(np.uint64)
        out_ids: list[str] = []
        out_spans: list[list[dict]] = []
        for i in range(len(ids)):
            text = texts[i] or ""
            third = max(1, len(text) // 3)
            parts = [text[:third], text[third : 2 * third], text[2 * third :]]
            parts = [p for p in parts if p]
            spans = [
                {"kind": "text", "text": p, "media_ref": "", "offset": j}
                for j, p in enumerate(parts)
            ]
            spans.append(
                {
                    "kind": "media",
                    "text": "",
                    "media_ref": f"media://{int(h[i]):016x}",
                    "offset": len(spans),
                }
            )
            base_id = f"doc-{int(ids[i]):09d}"
            out_ids.append(base_id)
            out_spans.append(spans)
            if int(ids[i]) % dup_every == 0:
                rng = np.random.default_rng(int(h[i]))
                near = []
                for s in spans:
                    if s["kind"] == "text":
                        near.append(
                            {
                                "kind": "text",
                                "text": _edit_text(s["text"], rng),
                                "media_ref": "",
                                "offset": s["offset"],
                            }
                        )
                    else:
                        near.append(
                            {
                                "kind": "media",
                                "text": "",
                                "media_ref": s["media_ref"] + ".n1",
                                "offset": s["offset"],
                            }
                        )
                out_ids.append(base_id + "-dup")
                out_spans.append(near)
        return pa.Table.from_pydict(
            {"doc_id": out_ids, "spans": out_spans}, schema=DOCS_SCHEMA
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return ds.map_batches(explode, batch_format="pyarrow")


def corpus_planted_truth(sf_dir: str, dup_every: int = 10):
    """Spans corpus over the driver's flat ``documents`` table whose
    expected ER cluster table is CLOSED-FORM in doc_id arithmetic — the
    value oracle for the flagship (the ``media_dims_census`` trick applied
    to entity resolution).

    Construction guarantees, by design rather than by tuning:

    - every token of the driver text is salted with the doc_id, so two
      DIFFERENT docs share zero shingles -> no organic exact or near
      edges can exist (cross-doc fused scores are structurally below
      threshold: text similarity ~0, and media-only similarity is halved
      by the text weight);
    - every ``dup_every``-th doc gets a companion ``<id>-dup`` with
      byte-identical TEXT spans (identical minhash -> LSH candidate
      collision in every band, text score exactly 1.0) and a media ref
      with ``.n1`` noise below the pHash Hamming threshold by
      construction -> fused score ~0.92 >= 0.8 deterministically.

    Expected clusters therefore are exactly
    ``{doc-<id>, doc-<id>-dup} for doc_id % dup_every == 0`` with
    ``cluster_id = doc-<id>`` (lexicographic min), SQL-derivable from the
    flat table (see __ray_entry__.oracle_sql()['er_clusters']).
    """
    import ray.data

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        texts = batch["text"].to_pylist()
        out_ids: list[str] = []
        out_spans: list[list[dict]] = []
        for i in range(len(ids)):
            did = int(ids[i])
            toks = (texts[i] or "").split() or ["empty"]
            salted = [f"{w}x{did}" for w in toks]
            third = max(1, len(salted) // 3)
            parts = [
                " ".join(salted[:third]),
                " ".join(salted[third : 2 * third]),
                " ".join(salted[2 * third :]),
            ]
            parts = [p for p in parts if p]
            spans = [
                {"kind": "text", "text": p, "media_ref": "", "offset": j}
                for j, p in enumerate(parts)
            ]
            spans.append(
                {
                    "kind": "media",
                    "text": "",
                    "media_ref": f"media://{did:016x}",
                    "offset": len(spans),
                }
            )
            base_id = f"doc-{did:09d}"
            out_ids.append(base_id)
            out_spans.append(spans)
            if did % dup_every == 0:
                near = [dict(s) for s in spans]
                near[-1] = {
                    "kind": "media",
                    "text": "",
                    "media_ref": f"media://{did:016x}.n1",
                    "offset": near[-1]["offset"],
                }
                out_ids.append(base_id + "-dup")
                out_spans.append(near)
        return pa.Table.from_pydict(
            {"doc_id": out_ids, "spans": out_spans}, schema=DOCS_SCHEMA
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return ds.map_batches(explode, batch_format="pyarrow")
