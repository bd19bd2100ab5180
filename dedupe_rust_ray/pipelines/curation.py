"""Corpus-curation operators for LLM training-data pipelines.

These are the selection / hygiene stages that sit between raw ingest and
training-shard output — the generalization layer the reference's
duplicate-finder (/root/reference/src/main.rs:452-648) belongs to, widened
to the operations a 100-TB text corpus actually needs:

- :func:`hash_split`        — deterministic train/val/test assignment;
- :func:`dup_ngram_spans`   — duplicated word-n-gram detection (the
  distributed shape of suffix-array exact substring dedup, Lee et al. 2021,
  "Deduplicating Training Data Makes Language Models Better");
- :func:`decontaminate`     — benchmark n-gram decontamination (GPT-3 /
  PaLM style held-out overlap filtering);
- :func:`repetition_stats`  — Gopher-style repetition quality signal
  (top-bigram mass fraction, Rae et al. 2021);
- :func:`pii_scrub`         — regex PII redaction census (emails / IPv4 /
  long digit runs) with scrubbed lengths;
- :func:`semdedup`          — SemDeDup-style embedding-space pruning
  (Abbas et al. 2023): k-means cells, greedy cosine prune within a cell;
- :func:`dedup_lines`       — C4-style duplicate-segment removal WITH
  document rewrite (first occurrence kept);
- :func:`dedup_spans`       — Lee et al. ExactSubstr-shaped duplicated-
  span removal (overlapping dup grams merge, text rewritten);
- :func:`mixture_schedule`  — deterministic weighted source interleave
  (the training-order/stride-scheduling operator);
- :func:`quality_weighted_sample` — DCLM-style keep-probability
  proportional to a quality signal, reproducible md5 draw.

Scale notes (100 TB): every per-doc pass is a vectorized ``map_batches``;
the only shuffles are (a) one groupby on 8-byte gram hashes pre-deduped
per document (``dup_ngram_spans``), (b) one groupby on int32 cell ids
(``semdedup``), and (c) tiny census groupbys. Benchmark gram sets and
k-means centroids are driver-bounded small sides shipped once via
``ray.put``. Text never rides a shuffle.
"""

from __future__ import annotations

import hashlib
import re as _re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Sum

from ..functions.shingles import word_shingle_hashes
from ..stages.blocking import shard_of_u64
from ..stages.codec import list_col_matrix
from .common import canonical_sort, join_partitions, read


def _md5_bucket(ids, mod: int) -> np.ndarray:
    """Content-independent bucket of each id: first 8 hex digits of
    ``md5(str(id))`` mod ``mod`` — the ORACLE bucketing rule shared by
    hash_split, the curation split stage and quality_weighted_sample,
    chosen because DuckDB reproduces it bit-for-bit. This is the only
    per-row-interpreter hash left in the repo and it exists solely for
    cross-engine certification; production runs take
    :func:`_splitmix_bucket` (``bucket='splitmix'``, the default)."""
    return np.fromiter(
        (
            int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % mod
            for i in ids
        ),
        np.int64,
        count=len(ids),
    )


_BUCKET_SALT = np.uint64(0xD6E8FEB86659FD93)


def _splitmix_bucket(ids, mod: int) -> np.ndarray:
    """PRODUCTION bucketing: one vectorized splitmix64 pass over the
    int64 keys — no per-row interpreter round-trip (at 10^12 docs the
    md5 path is 10^12 hashlib calls). Same contract as
    :func:`_md5_bucket`: deterministic, uniform, content-independent;
    the two draws differ per doc but have identical rates (pinned by
    tests/test_curation.py::test_bucket_modes_same_rates)."""
    from ..functions.shingles import splitmix64

    v = np.asarray(ids, dtype=np.int64).astype(np.uint64)
    return (splitmix64(v ^ _BUCKET_SALT) % np.uint64(mod)).astype(np.int64)


def _bucket(ids, mod: int, mode: str) -> np.ndarray:
    """Dispatch: ``'splitmix'`` (vectorized production default) or
    ``'md5'`` (oracle parity — the registered driver queries pass this
    so DuckDB replicates the draw bit-for-bit)."""
    if mode == "md5":
        return _md5_bucket(ids, mod)
    assert mode == "splitmix", f"unknown bucket mode {mode!r}"
    return _splitmix_bucket(ids, mod)


def _round4(x: np.ndarray) -> np.ndarray:
    """Half-up 4-decimal rounding, bit-reproducible in SQL as
    ``FLOOR(x * 10000 + 0.5) / 10000`` (np.round's half-to-even is not)."""
    return np.floor(np.asarray(x, dtype=np.float64) * 1e4 + 0.5) / 1e4


# --------------------------------------------------------------------------
# hash split
# --------------------------------------------------------------------------

def hash_split(
    sf_dir: str,
    train_pct: int = 90,
    val_pct: int = 5,
    bucket: str = "splitmix",
) -> ray.data.Dataset:
    """Deterministic train/val/test census by content-independent key hash.

    Default bucketing is one vectorized splitmix64 pass (production
    path, no per-row interpreter work); ``bucket='md5'`` switches to
    first-8-hex-digits-of-md5 — the draw DuckDB reproduces bit-for-bit,
    used by the registered oracle query. Split semantics (stable,
    uniform, content-independent) are identical either way.
    """

    def per_batch(batch: pd.DataFrame) -> pd.DataFrame:
        buckets = _bucket(batch["doc_id"], 100, bucket)
        split = np.where(
            buckets < train_pct,
            "train",
            np.where(buckets < train_pct + val_pct, "val", "test"),
        )
        return (
            pd.DataFrame({"split": split})
            .groupby("split", as_index=False)
            .size()
            .rename(columns={"size": "partial"})
        )

    return canonical_sort(
        read(sf_dir, "documents", columns=["doc_id"])
        .map_batches(per_batch, batch_format="pandas")
        .groupby("split")
        .aggregate(Sum("partial", alias_name="n_docs")),
        ["split"],
    )


# --------------------------------------------------------------------------
# duplicated n-gram spans (distributed exact substring dedup shape)
# --------------------------------------------------------------------------

def _doc_gram_pairs(batch: pd.DataFrame, n: int) -> pd.DataFrame:
    """Unique (gram_hash, doc_id) pairs per document in the batch."""
    wh, off = word_shingle_hashes(batch["text"].fillna("").tolist(), n=n)
    doc_of = np.repeat(batch["doc_id"].to_numpy(np.int64), np.diff(off))
    return pd.DataFrame({"gram": wh, "doc_id": doc_of}).drop_duplicates()


def dup_ngram_spans(
    sf_dir: str, n: int = 8, n_shards: int = 32
) -> ray.data.Dataset:
    """Per-document count of distinct word-``n``-grams that also occur in
    at least one OTHER document (docs with zero such grams are omitted).

    The distributed analog of suffix-array substring dedup: each doc emits
    its distinct gram hashes (8 bytes each — text never leaves the batch),
    one hash-sharded groupby finds grams spanning >= 2 docs, and a small
    doc_id groupby totals the per-shard partials. Gram identity is a
    64-bit rolling hash over per-token SipHashes; distinct grams collide
    with p ~ 2^-64, which the SQL-oracle comparison tolerates.

    Every stage emits ARROW blocks with pure numpy kernels — pandas
    blocks would push the groupbys onto Ray's per-group fallback path
    (~20x slower; see ``common.as_arrow``).
    """

    def grams(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        wh, off = word_shingle_hashes([t or "" for t in texts], n=n)
        doc_of = np.repeat(
            batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64),
            np.diff(off),
        )
        order = np.lexsort((wh, doc_of))
        w, d = wh[order], doc_of[order]
        keep = np.ones(len(w), dtype=bool)
        keep[1:] = (w[1:] != w[:-1]) | (d[1:] != d[:-1])
        w, d = w[keep], d[keep]
        return pa.table(
            {
                "gram": pa.array(w, type=pa.uint64()),
                "doc_id": pa.array(d, type=pa.int64()),
                "shard": pa.array(shard_of_u64(w, n_shards), type=pa.int32()),
            }
        )

    def dup_partials(group: pa.Table) -> pa.Table:
        # (gram, doc_id) is globally unique, so within the shard a gram's
        # occurrence count == its distinct-doc count
        g = group["gram"].to_numpy(zero_copy_only=False)
        d = group["doc_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(g, kind="stable")
        gs = g[order]
        same_prev = np.zeros(len(gs), dtype=bool)
        same_prev[1:] = gs[1:] == gs[:-1]
        same_next = np.zeros(len(gs), dtype=bool)
        same_next[:-1] = same_prev[1:]
        dd = d[order][same_prev | same_next]
        u, c = np.unique(dd, return_counts=True)
        return pa.table(
            {
                "doc_id": pa.array(u, type=pa.int64()),
                "partial": pa.array(c.astype(np.int64), type=pa.int64()),
            }
        )

    return canonical_sort(
        read(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(grams, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(dup_partials, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("partial", alias_name="n_dup_grams")),
        ["doc_id"],
    )


# --------------------------------------------------------------------------
# benchmark decontamination
# --------------------------------------------------------------------------

def decontaminate(
    sf_dir: str, benchmark_max_id: int = 10, n: int = 5
) -> ray.data.Dataset:
    """Flag training docs sharing any word-``n``-gram with the benchmark
    set (here: docs with ``doc_id < benchmark_max_id`` stand in for a
    held-out eval set). Returns (doc_id, n_contaminated_grams) for
    contaminated training docs, ordered by doc_id.

    The benchmark side is small by construction: its distinct gram hashes
    are gathered once on the driver and broadcast via ``ray.put``; each
    training batch probes them with a sorted-array ``searchsorted`` —
    no shuffle at all, the canonical broadcast-small-side plan.
    """
    docs = read(sf_dir, "documents", columns=["doc_id", "text"])

    bench_pd = (
        docs.filter(
            expr=f"doc_id < {benchmark_max_id}",
        )
        .map_batches(lambda b: _doc_gram_pairs(b, n), batch_format="pandas")
        .to_pandas()
    )
    bench_grams = np.unique(bench_pd["gram"].to_numpy(np.uint64))
    bref = ray.put(bench_grams)

    class Probe:
        def __init__(self, bref, max_id, n):
            self.grams = ray.get(bref)  # sorted (np.unique)
            self.max_id = max_id
            self.n = n

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch[batch["doc_id"] >= self.max_id]
            if not len(batch):
                return pd.DataFrame(
                    {
                        "doc_id": pd.Series([], dtype="int64"),
                        "n_contaminated_grams": pd.Series([], dtype="int64"),
                    }
                )
            df = _doc_gram_pairs(batch, self.n)
            g = df["gram"].to_numpy(np.uint64)
            pos = np.searchsorted(self.grams, g)
            pos[pos == len(self.grams)] = 0
            hit = self.grams[pos] == g if len(self.grams) else np.zeros(len(g), bool)
            out = df[hit].groupby("doc_id", as_index=False).size()
            return out.rename(columns={"size": "n_contaminated_grams"}).astype(
                {"n_contaminated_grams": "int64"}
            )

        def __repr__(self):
            return "DecontaminationProbe"

    return canonical_sort(
        docs.map_batches(
            Probe,
            fn_constructor_args=(bref, benchmark_max_id, n),
            batch_format="pandas",
            concurrency=(1, 8),
        ),
        ["doc_id"],
    )


# --------------------------------------------------------------------------
# repetition statistics (Gopher quality signal)
# --------------------------------------------------------------------------

def repetition_stats(sf_dir: str) -> ray.data.Dataset:
    """Per-document top-bigram mass: the fraction of word-bigram windows
    taken by the single most frequent bigram (Gopher's "fraction of
    characters in most common n-gram" family). High values mark looping /
    boilerplate text. Docs with fewer than 2 words are omitted.
    """

    def per_batch(batch: pd.DataFrame) -> pd.DataFrame:
        # fully vectorized: lexsort the batch's (doc, bigram-hash) stream,
        # run-length encode, then a per-doc reduceat max — no per-doc loop
        wh, off = word_shingle_hashes(batch["text"].fillna("").tolist(), n=2)
        ids = batch["doc_id"].to_numpy(np.int64)
        nwin = np.diff(off)
        if not len(wh):
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "n_bigrams": pd.Series([], dtype="int64"),
                    "top_bigram_frac": pd.Series([], dtype="float64"),
                }
            )
        doc_of = np.repeat(np.arange(len(ids)), nwin)
        order = np.lexsort((wh, doc_of))
        sh, sd = wh[order], doc_of[order]
        new_run = np.ones(len(sh), dtype=bool)
        new_run[1:] = (sh[1:] != sh[:-1]) | (sd[1:] != sd[:-1])
        run_start = np.flatnonzero(new_run)
        run_len = np.diff(np.append(run_start, len(sh)))
        run_doc = sd[run_start]
        first_run = np.ones(len(run_doc), dtype=bool)
        first_run[1:] = run_doc[1:] != run_doc[:-1]
        doc_idx = run_doc[first_run]  # docs with >=1 bigram, ascending
        top = np.maximum.reduceat(run_len, np.flatnonzero(first_run))
        n_arr = nwin[doc_idx]
        return pd.DataFrame(
            {
                "doc_id": ids[doc_idx],
                "n_bigrams": n_arr.astype(np.int64),
                "top_bigram_frac": _round4(
                    top.astype(np.float64) / np.maximum(n_arr, 1)
                ),
            }
        )

    return canonical_sort(
        read(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(per_batch, batch_format="pandas"),
        ["doc_id"],
    )


# --------------------------------------------------------------------------
# PII scrubbing
# --------------------------------------------------------------------------

# RE2-compatible (no lookaround/backrefs) so DuckDB applies the IDENTICAL
# patterns in the oracle; applied and counted in this order.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("n_emails", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("n_ipv4", r"\b\d{1,3}(\.\d{1,3}){3}\b", "[IP]"),
    ("n_longnums", r"\b\d{7,}\b", "[NUM]"),
]


def pii_scrub_batch(texts: pd.Series) -> pd.DataFrame:
    """Vectorized PII census + sequential redaction over one text batch."""
    filled = texts.fillna("")
    out: dict[str, object] = {}
    scrubbed = filled
    for name, pat, token in PII_PATTERNS:
        out[name] = filled.str.count(pat).astype("int64")
        scrubbed = scrubbed.str.replace(pat, token, regex=True)
    out["clean_chars"] = scrubbed.str.len().astype("int64")
    return pd.DataFrame(out, index=texts.index)


def pii_scrub(sf_dir: str) -> ray.data.Dataset:
    """Per-document PII match census (emails / IPv4 / 7+-digit runs, counted
    on the raw text) plus the post-redaction character count."""

    def per_batch(batch: pd.DataFrame) -> pd.DataFrame:
        feats = pii_scrub_batch(batch["text"])
        feats.insert(0, "doc_id", batch["doc_id"].to_numpy(np.int64))
        return feats

    return canonical_sort(
        read(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(per_batch, batch_format="pandas"),
        ["doc_id"],
    )


# --------------------------------------------------------------------------
# SemDeDup (embedding-space pruning)
# --------------------------------------------------------------------------

def fit_spherical_centroids(
    sf_dir: str,
    n_cells: int = 16,
    kmeans_iters: int = 5,
    sample_max: int = 4096,
    seed: int = 11,
    embs: "ray.data.Dataset | None" = None,
) -> np.ndarray:
    """Spherical k-means centroids from a driver-bounded sample (the
    knn_ivf training recipe, factored out so tests can re-derive the
    exact assignment). ``embs`` overrides the embeddings Dataset (the
    planted-truth hook)."""
    ds = (
        embs
        if embs is not None
        else read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    )

    # deterministic pseudo-random sample: the sample_max vectors with the
    # smallest splitmix64(vec_id ^ seed) rank — unlike random_sample, the
    # result is independent of block layout, so any run (any cluster size,
    # any batch split) trains identical centroids. Each batch pre-prunes to
    # its local top-k, so the sort+limit sees k rows per batch, not the
    # corpus.
    from ..functions.shingles import splitmix64

    def local_topk(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy().astype(np.uint64)
        key = splitmix64(ids ^ np.uint64(seed))
        keep = (
            np.argsort(key)[:sample_max]
            if len(key) > sample_max
            else np.arange(len(key))
        )
        return pa.table(
            {
                "key": pa.array(key[keep], type=pa.uint64()),
                "embedding": batch["embedding"].take(
                    pa.array(keep, type=pa.int64())
                ),
            }
        )

    sample = (
        canonical_sort(
            ds.map_batches(local_topk, batch_format="pyarrow"), ["key"]
        )
        .limit(sample_max)
        .take_all()
    )
    S = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in sample])
    S /= np.maximum(np.linalg.norm(S, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    n_cells = min(n_cells, len(S))
    C = S[rng.choice(len(S), n_cells, replace=False)]
    for _ in range(kmeans_iters):
        assign = np.argmax(S @ C.T, axis=1)
        for c in range(n_cells):
            members = S[assign == c]
            if len(members):
                v = members.sum(axis=0)
                C[c] = v / max(np.linalg.norm(v), 1e-12)
    return C


def greedy_prune_cell(
    ids: np.ndarray, Vn: np.ndarray, tau: float
) -> pd.DataFrame:
    """Greedy SemDeDup prune of one cell, in ascending-id order: a vector
    is removed when its cosine to an already-kept vector is >= ``tau``;
    the keeper is the most-similar kept vector. Deterministic."""
    order = np.argsort(ids, kind="stable")
    ids, Vn = ids[order], Vn[order]
    S = Vn @ Vn.T  # cells are n/k-sized; quadratic only within a cell
    kept: list[int] = []
    removed, keeper, cos = [], [], []
    for i in range(len(ids)):
        if kept:
            sims = S[i, kept]
            j = int(np.argmax(sims))
            if sims[j] >= tau:
                removed.append(ids[i])
                keeper.append(ids[kept[j]])
                cos.append(sims[j])
                continue
        kept.append(i)
    return pd.DataFrame(
        {
            "removed_id": np.asarray(removed, dtype=np.int64),
            "keeper_id": np.asarray(keeper, dtype=np.int64),
            "cos_sim": _round4(np.asarray(cos, dtype=np.float64)),
        }
    )


def semdedup(
    sf_dir: str,
    tau: float = 0.4,
    n_cells: int = 16,
    seed: int = 11,
    max_cell_rows: int = 8192,
    embs: "ray.data.Dataset | None" = None,
) -> ray.data.Dataset:
    """SemDeDup (Abbas et al. 2023): partition embeddings into k-means
    cells, then greedily drop vectors whose cosine to an already-kept
    vector in the SAME cell is >= ``tau``. Returns
    (removed_id, keeper_id, cos_sim) ordered by removed_id.

    Scale plan: centroids are trained on a bounded sample and broadcast
    once; assignment is one matmul per batch; the only shuffle is a
    groupby on int32 cell ids carrying (id, packed vector) rows; the
    quadratic greedy pass is confined to one cell (n/k rows). Cells
    larger than ``max_cell_rows`` are deterministically sub-split by
    rank in sorted-vec_id order (round-robin) and pruned per sub-cell,
    bounding the per-task matrix at O(max_cell_rows**2) regardless of
    corpus size, centroid skew, or id structure (the hot-cell straggler
    guard; tests/test_curation.py pins the bound and the
    unchanged-output property below the cap). Cross-cell —
    and, for oversized cells, cross-sub-cell — near-dups are missed by
    construction: that is SemDeDup's documented recall trade-off (same
    contract as knn_ivf's n_probe). ``embs`` overrides the embeddings
    Dataset — the planted-truth hook (:func:`semdedup_planted`).
    """
    if embs is not None:
        embs = embs.materialize()  # read twice: centroid sample + prune
    C = fit_spherical_centroids(sf_dir, n_cells=n_cells, seed=seed, embs=embs)
    cref = ray.put(C)

    class AssignCell:
        def __init__(self, cref):
            self.C = ray.get(cref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            from ..stages.codec import pack_f8_rows

            ids = batch["vec_id"].to_numpy()
            V = list_col_matrix(batch["embedding"])
            Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
            cell = np.argmax(Vn @ self.C.T, axis=1)
            return pa.table(
                {
                    "cell": pa.array(cell.astype(np.int32), type=pa.int32()),
                    "vec_id": pa.array(ids, type=pa.int64()),
                    "emb": pack_f8_rows(Vn),
                }
            )

    def prune(group: pd.DataFrame) -> pd.DataFrame:
        ids = group["vec_id"].to_numpy(np.int64)
        Vn = np.frombuffer(b"".join(group["emb"]), dtype="<f8").reshape(
            len(ids), -1
        )
        if len(ids) <= max_cell_rows:
            return greedy_prune_cell(ids, Vn, tau)
        # hot-cell guard: deterministic sub-split by RANK in sorted-id
        # order — independent of block layout AND of id structure
        # (vec_id % n_sub would put strided ids in one sub-cell, defeating
        # the bound), with every sub-cell <= ceil(n / n_sub) rows
        n_sub = -(-len(ids) // max_cell_rows)
        rank = np.empty(len(ids), np.int64)
        rank[np.argsort(ids, kind="stable")] = np.arange(len(ids))
        sub = rank % n_sub
        parts = [
            greedy_prune_cell(ids[sub == s], Vn[sub == s], tau)
            for s in range(n_sub)
        ]
        return pd.concat(parts, ignore_index=True)

    ds = (
        embs
        if embs is not None
        else read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    )
    return canonical_sort(
        ds.map_batches(AssignCell, fn_constructor_args=(cref,), batch_format="pyarrow", concurrency=(1, 8))
        .groupby("cell")
        .map_groups(prune, batch_format="pandas"),
        ["removed_id"],
    )


def semdedup_planted(sf_dir: str, tau: float = 0.4) -> ray.data.Dataset:
    """:func:`semdedup` over the planted one-hot embedding table
    (similarity.planted_onehot_embeddings) — the SAME pipeline end-to-end
    (sampled k-means, cell assign, greedy per-cell prune), but with a
    closed-form value oracle: a group's byte-identical vectors all land
    in one cell, within-group cosine is exactly 1.0 >= tau and
    cross-group exactly 0.0 < tau, so the greedy ascending-id prune
    removes every member except the group's min vec_id, each with
    keeper_id = that min and cos_sim = 1.0 — pure vec_id arithmetic."""
    from .similarity import planted_onehot_embeddings

    return semdedup(sf_dir, tau=tau, embs=planted_onehot_embeddings(sf_dir))


# --------------------------------------------------------------------------
# training-shard packing (distributed prefix sum)
# --------------------------------------------------------------------------

def pack_token_shards(
    sf_dir: str, shard_tokens: int = 1024, bucket_span: int = 256
) -> ray.data.Dataset:
    """Assign docs to fixed-token-budget training shards: within each
    source, docs are packed in doc_id order and a doc starts shard
    ``floor(tokens_before_it / shard_tokens)``.

    The running token count is a distributed prefix sum — the naive plan
    (one group per source) would put a whole source's docs in ONE task,
    which at 100 TB is a straggler. Instead: (1) per-batch partial token
    sums per (source, bucket = doc_id // bucket_span) are combined on the
    driver into exact per-bucket prefix OFFSETS (a table ~n_docs /
    bucket_span rows — tune bucket_span so it stays driver-sized) and
    broadcast; (2) one COARSE groupby on ``hash(source, bucket) %
    n_shards`` co-locates each bucket whole, and inside the shard a
    vectorized pandas cumsum per (source, bucket) adds the local running
    count to the bucket's offset. Every count is exact; no task holds
    more than its shard of buckets; per-group Python overhead is paid 64
    times, not once per bucket. The tokenize pass runs once: the compact
    (doc_id, source, n_tokens, bucket) projection — text already dropped —
    is materialized and reused by both passes (at 10^12 docs prefer
    recomputation or a checkpoint write over a full object-store pin).
    """
    from ..functions.hashing import stable_hash64
    from ..functions.shingles import splitmix64

    n_shards = 64

    def per_doc(batch: pd.DataFrame) -> pd.DataFrame:
        from ..functions.textstats import token_count_batch

        ids = batch["doc_id"].to_numpy(np.int64)
        bucket = ids // bucket_span
        shard = (
            splitmix64(
                stable_hash64(batch["source"]) ^ bucket.astype(np.uint64)
            )
            % np.uint64(n_shards)
        ).astype(np.int32)
        # Arrow out so the shard groupby takes the vectorized path
        # (common.as_arrow rationale)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "source": pa.array(batch["source"].to_numpy(str)),
                "n_tokens": pa.array(
                    token_count_batch(batch["text"]).to_numpy(np.int64)
                ),
                "bucket": pa.array(bucket, type=pa.int64()),
                "shard": pa.array(shard, type=pa.int32()),
            }
        )

    ds = (
        read(sf_dir, "documents", columns=["doc_id", "source", "text"])
        .map_batches(per_doc, batch_format="pandas")
        .materialize()
    )

    partials = ds.map_batches(
        lambda b: b.groupby(["source", "bucket"], as_index=False)[
            "n_tokens"
        ].sum(),
        batch_format="pandas",
    ).to_pandas()  # ~n_docs / bucket_span rows: driver-bounded by design
    sums = (
        partials.groupby(["source", "bucket"], as_index=False)["n_tokens"]
        .sum()
        .sort_values(["source", "bucket"])
    )
    sums["offset"] = (
        sums.groupby("source")["n_tokens"].cumsum() - sums["n_tokens"]
    )
    oref = ray.put(sums[["source", "bucket", "offset"]])

    def assign(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(["source", "bucket", "doc_id"])
        local = group.groupby(["source", "bucket"])["n_tokens"].cumsum()
        group = group.merge(ray.get(oref), on=["source", "bucket"], how="left")
        before = group["offset"].to_numpy(np.int64) + (
            local.to_numpy(np.int64) - group["n_tokens"].to_numpy(np.int64)
        )
        return pd.DataFrame(
            {
                "source": group["source"],
                "doc_id": group["doc_id"],
                "n_tokens": group["n_tokens"].astype("int64"),
                "shard_idx": (before // shard_tokens).astype("int64"),
            }
        )

    return canonical_sort(
        ds.groupby("shard").map_groups(assign, batch_format="pandas"),
        ["source", "doc_id"],
    )


_SEG_SHIFT = 20  # seg_idx bits in the (doc_id, seg_idx) encoding
# below this many per-batch-combined (hash, ...) partial rows (16-24 B
# each, <=50 MB), the dup-census fold gathers once and segment-reduces
# in-process instead of a groupby exchange — the same size-gated elision
# as common.canonical_sort / dedupe._FUSED_BAND_ROWS_MAX; the
# distributed path is unchanged above the ceiling
_FUSED_FOLD_MAX_ROWS = 2_000_000


def _split_segments(batch: pa.Table, seg_words: int):
    """Vectorized fixed-width word segmentation of a text batch.

    Returns (seg_doc_row, seg_idx, seg_strings): for every ``seg_words``-word
    segment, the batch-local row of its document, its ordinal within the
    document, and the joined segment text. Pure Arrow/numpy — the word list
    is flattened once and re-offset into segments, then ``binary_join``
    restores strings; no Python loop over rows or words."""
    import pyarrow.compute as pc

    words = pc.split_pattern(batch["text"], " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    w_off = words.offsets.to_numpy().astype(np.int64)
    nw = np.diff(w_off)
    ns = np.maximum((nw + seg_words - 1) // seg_words, 1)  # '' -> 1 empty seg
    seg_doc = np.repeat(np.arange(len(nw), dtype=np.int64), ns)
    first = np.repeat(np.cumsum(ns) - ns, ns)
    seg_idx = np.arange(len(seg_doc), dtype=np.int64) - first
    starts = w_off[seg_doc] + seg_words * seg_idx
    offsets = np.append(starts, w_off[-1])
    seg_list = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()), words.values
    )
    seg_str = pc.binary_join(seg_list, pa.scalar(" "))
    return seg_doc, seg_idx, seg_str


def _dedup_lines_join_path(
    docs: ray.data.Dataset, dup, seg_words: int
) -> ray.data.Dataset:
    """Above-broadcast-ceiling leg of :func:`dedup_lines`: the winner table
    never touches the driver. Both attach steps use the repo's proven
    union + hash-bucket groupby co-location (``Dataset.join``'s acero leg
    chokes on schema-degraded empty partitions — the round-2
    tfidf_top_terms failure mode):

      1. occurrence rows (seg_hash, enc — 16 bytes, no text) co-group with
         winner rows on ``seg_hash % B``; non-winner occurrences decode to
         (doc_id, seg_idx) dropped pairs;
      2. dropped pairs co-group with the documents on ``doc_id % B`` and
         each bucket rewrites its docs locally — the one shuffle where
         text rides.
    """
    import pyarrow.compute as pc

    from ..functions.hashing import stable_hash64

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:  # noqa: BLE001
        cpus = 8
    n_buckets = max(4, cpus)
    mask_lo = (1 << _SEG_SHIFT) - 1

    def occ(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        seg_doc, seg_idx, seg_str = _split_segments(batch, seg_words)
        h = stable_hash64(seg_str.to_numpy(zero_copy_only=False)).view(np.int64)
        enc = (ids[seg_doc] << _SEG_SHIFT) | seg_idx
        return pa.table(
            {
                "b": pa.array((h % n_buckets).astype(np.int32)),
                "seg_hash": h,
                "enc": enc,
                "kind": pa.array(np.zeros(len(h), dtype=np.int8)),
            }
        )

    def win_rows(batch: pa.Table) -> pa.Table:
        h = batch["seg_hash"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "b": pa.array((h % n_buckets).astype(np.int32)),
                "seg_hash": h,
                "enc": batch["min(enc)"].to_numpy(zero_copy_only=False),
                "kind": pa.array(np.ones(len(h), dtype=np.int8)),
            }
        )

    tagged = docs.map_batches(occ, batch_format="pyarrow").union(
        dup.map_batches(win_rows, batch_format="pyarrow")
    )

    def losers(group: pa.Table) -> pa.Table:
        kind = group["kind"].to_numpy(zero_copy_only=False)
        h = group["seg_hash"].to_numpy(zero_copy_only=False)
        enc = group["enc"].to_numpy(zero_copy_only=False)
        wh, we = h[kind == 1], enc[kind == 1]
        order = np.argsort(wh)
        wh, we = wh[order], we[order]
        oh, oe = h[kind == 0], enc[kind == 0]
        if len(wh) and len(oh):
            pos = np.minimum(np.searchsorted(wh, oh), len(wh) - 1)
            dropped = (wh[pos] == oh) & (oe != we[pos])
        else:
            dropped = np.zeros(len(oh), dtype=bool)
        d = oe[dropped]
        return pa.table(
            {"doc_id": d >> _SEG_SHIFT, "seg_idx": d & mask_lo}
        )

    dropped_pairs = tagged.groupby("b").map_groups(
        losers, batch_format="pyarrow"
    )

    def doc_rows(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "db": pa.array((ids % n_buckets).astype(np.int32)),
                "doc_id": ids,
                "text": batch["text"],
                "seg_idx": pa.array(np.full(len(ids), -1, dtype=np.int64)),
            }
        )

    def drop_rows(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "db": pa.array((ids % n_buckets).astype(np.int32)),
                "doc_id": ids,
                "text": pa.array([""] * len(ids), type=pa.string()),
                "seg_idx": batch["seg_idx"],
            }
        )

    both = docs.map_batches(doc_rows, batch_format="pyarrow").union(
        dropped_pairs.map_batches(drop_rows, batch_format="pyarrow")
    )

    def rewrite_bucket(group: pa.Table) -> pa.Table:
        si = group["seg_idx"].to_numpy(zero_copy_only=False)
        is_doc = si < 0
        d_ids = group["doc_id"].to_numpy(zero_copy_only=False)[is_doc]
        texts = group["text"].filter(pa.array(is_doc))
        sub = pa.table({"doc_id": d_ids, "text": texts})
        seg_doc, seg_idx, seg_str = _split_segments(sub, seg_words)
        drop_enc = np.sort(
            (group["doc_id"].to_numpy(zero_copy_only=False)[~is_doc]
             << _SEG_SHIFT)
            | si[~is_doc]
        )
        enc = (d_ids[seg_doc] << _SEG_SHIFT) | seg_idx
        if len(drop_enc):
            pos = np.minimum(np.searchsorted(drop_enc, enc), len(drop_enc) - 1)
            keep = drop_enc[pos] != enc
        else:
            keep = np.ones(len(enc), dtype=bool)
        kept_per_doc = np.bincount(seg_doc[keep], minlength=len(d_ids))
        total_per_doc = np.bincount(seg_doc, minlength=len(d_ids))
        k_off = np.append(0, np.cumsum(kept_per_doc)).astype(np.int64)
        kept_list = pa.ListArray.from_arrays(
            pa.array(k_off, type=pa.int32()), seg_str.filter(pa.array(keep))
        )
        return pa.table(
            {
                "doc_id": pa.array(d_ids),
                "text_clean": pc.binary_join(kept_list, pa.scalar(" ")),
                "n_kept": pa.array(kept_per_doc.astype(np.int64)),
                "n_dropped": pa.array(
                    (total_per_doc - kept_per_doc).astype(np.int64)
                ),
            }
        )

    return both.groupby("db").map_groups(rewrite_bucket, batch_format="pyarrow")


def dedup_lines(
    sf_dir: str,
    seg_words: int = 10,
    broadcast_max_rows: int = 5_000_000,
) -> ray.data.Dataset:
    """C4-style segment-level dedup WITH document rewrite: any fixed-width
    word segment occurring more than once in the corpus is removed from
    every document except its first occurrence (ordered by (doc_id,
    seg_idx)), and each document's text is reassembled from the kept
    segments. This is the sub-document analog of the reference's exact
    duplicate-group semantics (/root/reference/src/main.rs:586-648) —
    equality classes over canonical byte content, first member kept — and
    the C4 "discard duplicate three-sentence spans" rewrite shape.

    Two passes, neither shuffles text:
      1. segments -> (hash64, enc=(doc_id<<20)|seg_idx) int rows, partially
         pre-aggregated per batch, one global groupby on the 8-byte hash ->
         winners table (dup hashes only, with min enc);
      2. re-split deterministically, drop non-winner dup occurrences via a
         broadcast sorted-array probe (``Dataset.join`` above
         ``broadcast_max_rows``), reassemble per doc batch-locally.
    """
    import pyarrow.compute as pc

    from ..functions.hashing import stable_hash64
    from ray.data.aggregate import Min

    docs = read(sf_dir, "documents", columns=["doc_id", "text"])

    def seg_rows(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        seg_doc, seg_idx, seg_str = _split_segments(batch, seg_words)
        if seg_idx.size and seg_idx.max() >= (1 << _SEG_SHIFT):
            raise ValueError("document exceeds 2^20 segments")
        h = stable_hash64(seg_str.to_numpy(zero_copy_only=False)).view(
            np.int64
        )  # bit-cast: uint64 keys above 2^63 degrade Ray groupby blocks
        enc = (ids[seg_doc] << _SEG_SHIFT) | seg_idx
        t = pa.table({"seg_hash": h, "enc": enc})
        # partial combine: one row per distinct hash per batch
        return (
            t.group_by("seg_hash")
            .aggregate([("enc", "min"), ("enc", "count")])
            .rename_columns(["seg_hash", "enc", "n"])
        )

    partial_ds = docs.map_batches(
        seg_rows, batch_format="pyarrow"
    ).materialize()
    if partial_ds.count() <= _FUSED_FOLD_MAX_ROWS:
        # fused fold: segment-reduce the gathered partials in-process
        # (n_dup <= partial rows <= the fold ceiling < broadcast ceiling,
        # so this path always broadcasts)
        parts = [t for t in ray.get(partial_ds.to_arrow_refs()) if t.num_rows]
        if parts:
            t = pa.concat_tables(parts)
            h = t["seg_hash"].to_numpy(zero_copy_only=False)
            enc = t["enc"].to_numpy(zero_copy_only=False)
            n = t["n"].to_numpy(zero_copy_only=False)
            order = np.argsort(h, kind="stable")
            hs_a, enc_a, n_a = h[order], enc[order], n[order]
            b = np.flatnonzero(np.r_[True, hs_a[1:] != hs_a[:-1]])
            tot = np.add.reduceat(n_a, b)
            mn = np.minimum.reduceat(enc_a, b)
            dupm = tot > 1
            drop_ref = ray.put((hs_a[b][dupm], mn[dupm]))  # sorted by hash
        else:
            drop_ref = ray.put(
                (np.empty(0, np.int64), np.empty(0, np.int64))
            )
    else:
        folded = partial_ds.groupby("seg_hash").aggregate(Min("enc"), Sum("n"))
        dup = folded.map_batches(
            lambda t: t.filter(pc.greater(t["sum(n)"], 1)),
            batch_format="pyarrow",
        ).materialize()  # two consumers (count + winner read): pin the
        # SMALL dup-winner table so pass 1 runs once

        if dup.count() > broadcast_max_rows:
            return canonical_sort(
                _dedup_lines_join_path(docs, dup, seg_words), ["doc_id"]
            )
        small = dup.select_columns(["seg_hash", "min(enc)"]).to_pandas()
        hs = small["seg_hash"].to_numpy(np.int64)
        order = np.argsort(hs)
        drop_ref = ray.put(
            (hs[order], small["min(enc)"].to_numpy(np.int64)[order])
        )

    def rewrite(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        seg_doc, seg_idx, seg_str = _split_segments(batch, seg_words)
        h = stable_hash64(seg_str.to_numpy(zero_copy_only=False)).view(np.int64)
        enc = (ids[seg_doc] << _SEG_SHIFT) | seg_idx
        wh, we = ray.get(drop_ref)
        if len(wh):
            pos = np.minimum(np.searchsorted(wh, h), len(wh) - 1)
            keep = (wh[pos] != h) | (enc == we[pos])
        else:
            keep = np.ones(len(h), dtype=bool)
        kept_per_doc = np.bincount(seg_doc[keep], minlength=len(ids))
        total_per_doc = np.bincount(seg_doc, minlength=len(ids))
        k_off = np.append(0, np.cumsum(kept_per_doc)).astype(np.int64)
        kept_list = pa.ListArray.from_arrays(
            pa.array(k_off, type=pa.int32()), seg_str.filter(pa.array(keep))
        )
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "text_clean": pc.binary_join(kept_list, pa.scalar(" ")),
                "n_kept": pa.array(kept_per_doc.astype(np.int64)),
                "n_dropped": pa.array(
                    (total_per_doc - kept_per_doc).astype(np.int64)
                ),
            }
        )

    return canonical_sort(
        docs.map_batches(rewrite, batch_format="pyarrow"), ["doc_id"]
    )


def _split_and_hash_words(batch: pa.Table, gram_words: int):
    """Split a text batch into words and rolling gram hashes (shared by
    both dedup_spans paths): returns (words ListArray, word offsets,
    gram hashes uint64, per-doc gram offsets)."""
    import pyarrow.compute as pc

    from ..functions.shingles import rolling_window_hashes

    words = pc.split_pattern(batch["text"], " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    w_off = words.offsets.to_numpy().astype(np.int64)
    flat = words.values.to_numpy(zero_copy_only=False)
    th = (
        pd.util.hash_array(
            np.asarray(flat, dtype=object), hash_key="dedupe_ray_00042"
        ).astype(np.uint64)
        if len(flat)
        else np.empty(0, np.uint64)
    )
    gh, g_off = rolling_window_hashes(th, np.diff(w_off), gram_words)
    return words, w_off, gh, g_off


def _spans_rewrite_from_flags(
    doc_ids: pa.Array, words, w_off: np.ndarray, flag: np.ndarray,
    gram_words: int,
) -> pa.Table:
    """Shared dedup_spans rewrite core: given per-flat-word duplicated-
    gram START flags, drop every covered word and reassemble each doc.

    covered[w] = exists dup start s with s in [w-(k-1), w] AND s in w's
    document: a running max of start indices, validated against the
    word's document base (starts never cross docs, so any start >=
    doc_base belongs to this doc)."""
    import pyarrow.compute as pc

    n_docs = len(w_off) - 1
    nw = np.diff(w_off)
    total_words = int(w_off[-1])
    idx = np.arange(total_words, dtype=np.int64)
    last = np.maximum.accumulate(np.where(flag, idx, np.int64(-1)))
    doc_of_w = np.repeat(np.arange(n_docs), nw)
    doc_base = w_off[doc_of_w]
    covered = (last >= idx - (gram_words - 1)) & (last >= doc_base)
    keep = ~covered
    kept_per_doc = np.bincount(doc_of_w[keep], minlength=n_docs)
    k_off = np.append(0, np.cumsum(kept_per_doc)).astype(np.int64)
    kept_list = pa.ListArray.from_arrays(
        pa.array(k_off, type=pa.int32()),
        words.values.filter(pa.array(keep)),
    )
    return pa.table(
        {
            "doc_id": doc_ids,
            "text_clean": pc.binary_join(kept_list, pa.scalar(" ")),
            "n_removed_words": pa.array((nw - kept_per_doc).astype(np.int64)),
        }
    )


def _dedup_spans_join_path(
    docs: ray.data.Dataset, dup, gram_words: int
) -> ray.data.Dataset:
    """Above-broadcast-ceiling leg of :func:`dedup_spans`: the dup-gram
    set never touches the driver. Same union + hash-bucket groupby
    co-location as :func:`_dedup_lines_join_path` (``Dataset.join``'s
    acero leg chokes on schema-degraded empty partitions): occurrence
    rows (hash, (doc_id << 20) | pos — 16 bytes, no text) co-group with
    dup-hash rows; EVERY occurrence of a dup gram becomes a dropped
    start; the starts then co-group with the documents on doc_id and the
    shared coverage kernel rewrites each bucket locally."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:  # noqa: BLE001
        cpus = 8
    n_buckets = max(4, cpus)
    mask_lo = (1 << _SEG_SHIFT) - 1

    def occ(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        _, w_off, gh, g_off = _split_and_hash_words(batch, gram_words)
        h = gh.view(np.int64)
        doc_of_g = np.repeat(np.arange(len(g_off) - 1), np.diff(g_off))
        local_g = (
            np.arange(len(h), dtype=np.int64) - g_off[doc_of_g]
            if len(h)
            else np.empty(0, np.int64)
        )
        if len(local_g) and local_g.max() >= (1 << _SEG_SHIFT):
            raise ValueError("document exceeds 2^20 gram positions")
        return pa.table(
            {
                "b": pa.array((h % n_buckets).astype(np.int32)),
                "h": h,
                "enc": (ids[doc_of_g] << _SEG_SHIFT) | local_g,
                "kind": pa.array(np.zeros(len(h), dtype=np.int8)),
            }
        )

    def dup_rows(batch: pa.Table) -> pa.Table:
        h = batch["h"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "b": pa.array((h % n_buckets).astype(np.int32)),
                "h": h,
                "enc": pa.array(np.zeros(len(h), dtype=np.int64)),
                "kind": pa.array(np.ones(len(h), dtype=np.int8)),
            }
        )

    tagged = docs.map_batches(occ, batch_format="pyarrow").union(
        dup.map_batches(dup_rows, batch_format="pyarrow")
    )

    def starts(group: pa.Table) -> pa.Table:
        kind = group["kind"].to_numpy(zero_copy_only=False)
        h = group["h"].to_numpy(zero_copy_only=False)
        enc = group["enc"].to_numpy(zero_copy_only=False)
        dh = np.sort(h[kind == 1])
        oh, oe = h[kind == 0], enc[kind == 0]
        if len(dh) and len(oh):
            p = np.minimum(np.searchsorted(dh, oh), len(dh) - 1)
            m = dh[p] == oh
        else:
            m = np.zeros(len(oh), dtype=bool)
        d = oe[m]
        return pa.table({"doc_id": d >> _SEG_SHIFT, "pos": d & mask_lo})

    dropped = tagged.groupby("b").map_groups(starts, batch_format="pyarrow")

    def doc_rows(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "db": pa.array((ids % n_buckets).astype(np.int32)),
                "doc_id": ids,
                "text": batch["text"],
                "pos": pa.array(np.full(len(ids), -1, dtype=np.int64)),
            }
        )

    def drop_rows(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "db": pa.array((ids % n_buckets).astype(np.int32)),
                "doc_id": ids,
                "text": pa.array([""] * len(ids), type=pa.string()),
                "pos": batch["pos"],
            }
        )

    both = docs.map_batches(doc_rows, batch_format="pyarrow").union(
        dropped.map_batches(drop_rows, batch_format="pyarrow")
    )

    def rewrite_bucket(group: pa.Table) -> pa.Table:
        pos = group["pos"].to_numpy(zero_copy_only=False)
        is_doc = pos < 0
        all_ids = group["doc_id"].to_numpy(zero_copy_only=False)
        # sort the docs by id so dropped starts can searchsorted-resolve
        d_ids = all_ids[is_doc]
        order = np.argsort(d_ids)
        d_ids = d_ids[order]
        texts = group["text"].filter(pa.array(is_doc)).take(
            pa.array(order, type=pa.int64())
        )
        sub = pa.table({"doc_id": d_ids, "text": texts})
        words, w_off, _, _ = _split_and_hash_words(sub, gram_words)
        flag = np.zeros(int(w_off[-1]), dtype=bool)
        dp_ids, dp_pos = all_ids[~is_doc], pos[~is_doc]
        if len(dp_ids):
            row = np.searchsorted(d_ids, dp_ids)
            flag[w_off[row] + dp_pos] = True
        return _spans_rewrite_from_flags(
            pa.array(d_ids), words, w_off, flag, gram_words
        )

    return both.groupby("db").map_groups(rewrite_bucket, batch_format="pyarrow")


def dedup_spans(
    sf_dir: str,
    gram_words: int = 10,
    broadcast_max_rows: int = 5_000_000,
) -> ray.data.Dataset:
    """Duplicated-SPAN removal with document rewrite (the Lee et al. 2021
    ExactSubstr-dedup shape): every word covered by any ``gram_words``-gram
    that occurs in >= 2 distinct documents is dropped from ALL documents,
    overlapping duplicated grams merging into one removed span, and each
    document's text reassembled from the surviving words. Complements
    :func:`dup_ngram_spans` (which only counts) and :func:`dedup_lines`
    (fixed segments, first copy kept).

    Two passes; text never rides a shuffle. Pass 1 folds per-(gram, doc)
    presence to global distinct-doc counts over 8-byte gram hashes; the
    dup-gram set broadcasts as one sorted array below the ceiling, and
    above it :func:`_dedup_spans_join_path` co-locates occurrences with
    dup hashes via union + hash-bucket groupby (no ``Dataset.join``).
    Pass 2 marks covered words with a per-document running-max of
    duplicated-gram start positions (pure numpy — no interval loop) and
    rebuilds the text via Arrow offsets + ``binary_join``."""
    import pyarrow.compute as pc

    docs = read(sf_dir, "documents", columns=["doc_id", "text"])

    def gram_rows(batch: pa.Table) -> pa.Table:
        _, _, gh, g_off = _split_and_hash_words(batch, gram_words)
        doc_of = np.repeat(np.arange(len(g_off) - 1), np.diff(g_off))
        uniq = (
            pd.DataFrame({"d": doc_of, "h": gh.view(np.int64)})
            .drop_duplicates()
            .groupby("h", as_index=False)
            .size()
        )
        return pa.table(
            {
                "h": pa.array(uniq["h"].to_numpy(np.int64)),
                "nd": pa.array(uniq["size"].to_numpy(np.int64)),
            }
        )

    partial_ds = docs.map_batches(
        gram_rows, batch_format="pyarrow"
    ).materialize()
    if partial_ds.count() <= _FUSED_FOLD_MAX_ROWS:
        # fused fold (see dedup_lines): in-process segment-reduce of the
        # gathered 16 B partial rows; always below the broadcast ceiling
        parts = [t for t in ray.get(partial_ds.to_arrow_refs()) if t.num_rows]
        if parts:
            t = pa.concat_tables(parts)
            h = t["h"].to_numpy(zero_copy_only=False)
            nd = t["nd"].to_numpy(zero_copy_only=False)
            order = np.argsort(h, kind="stable")
            hs_a, nd_a = h[order], nd[order]
            b = np.flatnonzero(np.r_[True, hs_a[1:] != hs_a[:-1]])
            tot = np.add.reduceat(nd_a, b)
            hs = hs_a[b][tot >= 2]  # sorted by construction
        else:
            hs = np.empty(0, np.int64)
        ref = ray.put(hs)
    else:
        folded = partial_ds.groupby("h").aggregate(Sum("nd"))
        dup = folded.map_batches(
            lambda t: t.filter(pc.greater_equal(t["sum(nd)"], 2)),
            batch_format="pyarrow",
        ).materialize()

        if dup.count() > broadcast_max_rows:
            dup = dup.select_columns(["h"])
            return canonical_sort(
                _dedup_spans_join_path(docs, dup, gram_words), ["doc_id"]
            )
        hs = np.sort(
            dup.select_columns(["h"]).to_pandas()["h"].to_numpy(np.int64)
        )
        ref = ray.put(hs)

    def rewrite(batch: pa.Table) -> pa.Table:
        words, w_off, gh, g_off = _split_and_hash_words(batch, gram_words)
        keys = ray.get(ref)
        ghi = gh.view(np.int64)
        if len(keys) and len(ghi):
            p = np.minimum(np.searchsorted(keys, ghi), len(keys) - 1)
            is_dup = keys[p] == ghi
        else:
            is_dup = np.zeros(len(ghi), dtype=bool)
        n_docs = len(w_off) - 1
        doc_of_g = np.repeat(np.arange(n_docs), np.diff(g_off))
        local_g = (
            np.arange(len(ghi), dtype=np.int64) - g_off[doc_of_g]
            if len(ghi)
            else np.empty(0, np.int64)
        )
        flag = np.zeros(int(w_off[-1]), dtype=bool)
        if len(ghi):
            flag[(w_off[doc_of_g] + local_g)[is_dup]] = True
        return _spans_rewrite_from_flags(
            batch["doc_id"], words, w_off, flag, gram_words
        )

    out = docs.map_batches(rewrite, batch_format="pyarrow")
    return canonical_sort(out, ["doc_id"])


def mixture_schedule(
    sf_dir: str,
    weights: dict[str, float] | None = None,
    bucket_span: int = 256,
) -> ray.data.Dataset:
    """Training-order operator: a deterministic weighted interleave of
    sources — the epoch schedule a trainer consumes when mixing corpora
    at different sampling rates. Each doc gets position
    ``(rank_within_source - 0.5) / weight(source)``; reading the rows in
    ``pos`` order yields each source at a rate proportional to its
    weight (the standard stride-scheduling / lottery-ticket argument:
    source s places a doc in every interval of length 1/w_s).

    ``weights`` defaults to a deterministic demo rule (sources with an
    even numeric suffix upsampled 2x); a real run passes the mixture
    config. Unknown sources weigh 1.0.

    Scale plan: rank-within-source is the pack_token_shards distributed
    prefix sum with n_tokens == 1 — per-(source, doc_id-bucket) counts
    fold to driver-bounded offsets, one coarse groupby on
    ``hash(source, bucket) % 64`` co-locates whole buckets, and a
    vectorized per-shard cumcount adds the bucket offset. No task ever
    holds a whole source; the final sort by ``pos`` is the operator's
    deliverable (a training order IS a total order)."""
    from ..functions.hashing import stable_hash64
    from ..functions.shingles import splitmix64

    n_shards = 64

    def weight_of(src: str) -> float:
        if weights is not None:
            return float(weights.get(src, 1.0))
        # FIRST digit run only — matching the SQL oracle's
        # regexp_extract(source, '[0-9]+') semantics exactly
        m = _re.search(r"[0-9]+", src)
        return 2.0 if m and int(m.group()) % 2 == 0 else 1.0

    def per_doc(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = ids // bucket_span
        src = batch["source"].to_pandas()
        shard = (
            splitmix64(stable_hash64(src) ^ bucket.astype(np.uint64))
            % np.uint64(n_shards)
        ).astype(np.int32)
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "source": batch["source"],
                "bucket": pa.array(bucket),
                "shard": pa.array(shard),
            }
        )

    ds = read(sf_dir, "documents", columns=["doc_id", "source"]).map_batches(
        per_doc, batch_format="pyarrow"
    ).materialize()  # two consumers; (doc_id, source) is text-free and compact

    partials = ds.map_batches(
        lambda b: b.group_by(["source", "bucket"]).aggregate(
            [("doc_id", "count")]
        ).rename_columns(["source", "bucket", "n"]),
        batch_format="pyarrow",
    ).to_pandas()  # ~n_docs / bucket_span rows: driver-bounded by design
    sums = (
        partials.groupby(["source", "bucket"], as_index=False)["n"]
        .sum()
        .sort_values(["source", "bucket"])
    )
    sums["offset"] = sums.groupby("source")["n"].cumsum() - sums["n"]
    oref = ray.put(sums[["source", "bucket", "offset"]])

    def assign(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(["source", "bucket", "doc_id"])
        local = group.groupby(["source", "bucket"]).cumcount().to_numpy(np.int64)
        group = group.merge(ray.get(oref), on=["source", "bucket"], how="left")
        rank = group["offset"].to_numpy(np.int64) + local + 1  # 1-based
        w = group["source"].map(weight_of).to_numpy(np.float64)
        return pd.DataFrame(
            {
                "doc_id": group["doc_id"].to_numpy(np.int64),
                "source": group["source"],
                "pos": (rank - 0.5) / w,
            }
        )

    return canonical_sort(
        ds.groupby("shard").map_groups(
            lambda g: assign(g.drop(columns=["shard"])), batch_format="pandas"
        ),
        ["pos", "doc_id"],
    )


# --------------------------------------------------------------------------
# stratified sampling
# --------------------------------------------------------------------------

def stratified_sample(
    sf_dir: str, k: int = 20, stratum: str = "source", bucket: str = "splitmix"
) -> ray.data.Dataset:
    """Deterministic k-per-stratum sample: the k docs with the smallest
    ``(hash(doc_id), doc_id)`` rank inside each stratum — a content-
    independent pseudo-random draw.

    The rank hash is a vectorized splitmix64 by default (production
    path); ``bucket='md5'`` ranks by the md5 hexdigest string instead —
    the draw DuckDB reproduces exactly, used by the registered oracle
    query. Local-top-k pattern (same as knn_topk): each batch keeps at
    most k candidates per stratum, so the final per-stratum merge sees
    k x n_batches rows, never the corpus.
    """

    def _keyed(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(np.int64)
        if bucket == "md5":
            h = [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
        else:
            from ..functions.shingles import splitmix64

            h = splitmix64(ids.astype(np.uint64) ^ _BUCKET_SALT)
        return pd.DataFrame(
            {"stratum": batch[stratum], "doc_id": ids, "h": h}
        )

    def local_topk(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            batch.sort_values(["h", "doc_id"]).groupby("stratum").head(k)
        )

    def merge_topk(group: pd.DataFrame) -> pd.DataFrame:
        out = group.sort_values(["h", "doc_id"]).head(k)
        return out[["stratum", "doc_id"]]

    return canonical_sort(
        read(sf_dir, "documents", columns=["doc_id", stratum])
        .map_batches(_keyed, batch_format="pandas")
        .map_batches(local_topk, batch_format="pandas")
        .groupby("stratum")
        .map_groups(merge_topk, batch_format="pandas"),
        ["stratum", "doc_id"],
    )


# --------------------------------------------------------------------------
# end-to-end resumable curation job
# --------------------------------------------------------------------------

def curate_corpus(
    sf_dir: str,
    out_dir: str,
    min_quality: float = 0.5,
    resume: bool = False,
) -> dict:
    """The full curation job a training run consumes: quality gate ->
    exact-dedup keep-set -> deterministic split assignment -> parquet
    output PARTITIONED BY SPLIT, each stage behind a lineage-manifest
    checkpoint (``state/checkpoint.py``) so a killed run re-executes only
    incomplete stages on ``resume=True``.

    Plan shape at scale: the keep-set is (doc_id) only — 8 bytes/doc
    through its groupby; survivors re-attach full rows with a left-semi
    ``Dataset.join`` (hash join, never a driver materialization); output
    is one directory per split with one part file per block, so a resumed
    run skips whole completed splits and downstream readers prune by
    partition directory. Returns the job summary (also written as
    ``_summary.json``) with per-stage counters.
    """
    import json as _json
    import os as _os

    from ..functions.hashing import stable_hash64
    from ..state.checkpoint import read_manifest, stage_checkpoint
    from ray.data.aggregate import Min

    cfg_hash = f"curate:q{min_quality}:v1"
    docs = read(sf_dir, "documents")

    def make_keep():
        def score(batch: pd.DataFrame) -> pd.DataFrame:
            from ..functions.textstats import quality_scores_batch

            q = quality_scores_batch(batch["text"])["quality_score"].to_numpy()
            out = pd.DataFrame(
                {
                    "doc_id": batch["doc_id"].to_numpy(np.int64),
                    "h": stable_hash64(batch["text"].fillna("").tolist()),
                }
            )
            return out[q >= min_quality]

        return (
            docs.map_batches(score, batch_format="pandas")
            .groupby("h")
            .aggregate(Min("doc_id", alias_name="doc_id"))
            .select_columns(["doc_id"])
        )

    keep = stage_checkpoint(
        make_keep, "keep_set", out_dir, cfg_hash, resume=resume
    )

    def add_split(batch: pd.DataFrame) -> pd.DataFrame:
        # production job: the vectorized splitmix64 draw (no per-row
        # hashlib in any default-path map_batches body)
        buckets = _bucket(batch["doc_id"], 100, "splitmix")
        batch = batch.copy()
        batch["split"] = np.where(
            buckets < 90, "train", np.where(buckets < 95, "val", "test")
        )
        return batch

    n_in = docs.count()
    kept_rows = docs.join(
        keep, join_type="left_semi", on=("doc_id",), num_partitions=16
    ).map_batches(add_split, batch_format="pandas")

    per_split: dict[str, int] = {}
    for split in ("train", "val", "test"):
        stage = f"output/split={split}"
        part = stage_checkpoint(
            lambda s=split: kept_rows.filter(expr=f"split == '{s}'"),
            stage,
            out_dir,
            cfg_hash,
            resume=resume,
        )
        per_split[split] = read_manifest(out_dir, stage)["num_rows"]

    n_out = sum(per_split.values())
    summary = {
        "rows_in": int(n_in),
        "rows_out": int(n_out),
        "rows_dropped": int(n_in - n_out),
        "per_split": per_split,
        "min_quality": min_quality,
        "config_hash": cfg_hash,
    }
    with open(_os.path.join(out_dir, "_summary.json"), "w") as f:
        _json.dump(summary, f, indent=2)
    return summary


def embedding_clusters(
    sf_dir: str,
    n_cells: int = 16,
    seed: int = 11,
    embs: "ray.data.Dataset | None" = None,
) -> ray.data.Dataset:
    """Document clustering over the embedding column: spherical k-means
    cell id per vector (the IVF/SemDeDup assignment surfaced as a
    first-class operator — the shape of cluster-balanced data mixing).
    Deterministic: centroids come from the block-layout-independent
    sample (:func:`fit_spherical_centroids`). Returns (vec_id, cell,
    cos_to_centroid) ordered by vec_id; no SQL oracle (iterative
    training), semantics pinned by pytest against a local replica."""
    C = fit_spherical_centroids(sf_dir, n_cells=n_cells, seed=seed, embs=embs)
    cref = ray.put(C)

    class Assign:
        def __init__(self, cref):
            self.C = ray.get(cref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["vec_id"].to_numpy()
            V = list_col_matrix(batch["embedding"])
            Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
            sims = Vn @ self.C.T
            cell = np.argmax(sims, axis=1)
            return pa.table(
                {
                    "vec_id": pa.array(ids, type=pa.int64()),
                    "cell": pa.array(cell.astype(np.int32), type=pa.int32()),
                    "cos_to_centroid": pa.array(
                        _round4(sims[np.arange(len(ids)), cell])
                    ),
                }
            )

    ds = (
        embs
        if embs is not None
        else read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    )
    return canonical_sort(
        ds.map_batches(Assign, fn_constructor_args=(cref,), batch_format="pyarrow", concurrency=(1, 8)),
        ["vec_id"],
    )


def embedding_clusters_planted(
    sf_dir: str, n_cells: int = 16
) -> "pd.DataFrame":
    """:func:`embedding_clusters` over the planted one-hot table
    (similarity.planted_onehot_embeddings), collapsed to the per-group
    invariants that hold for ANY trained centroids: a group's
    byte-identical vectors produce identical cell argmax and identical
    (rounded) cos_to_centroid, so each group occupies exactly ONE cell
    with ONE cosine value. The full iterative pipeline (sampled k-means
    training, centroid broadcast, vectorized assign) runs unchanged."""
    import pandas as pd

    from .similarity import PLANTED_N_GROUPS, planted_onehot_embeddings

    assigned = embedding_clusters(
        sf_dir, n_cells=n_cells, embs=planted_onehot_embeddings(sf_dir)
    ).to_pandas()
    g = assigned.assign(grp=assigned["vec_id"] % PLANTED_N_GROUPS).groupby(
        "grp", as_index=False
    )
    out = g.agg(
        n_vecs=("vec_id", "size"),
        n_cells_distinct=("cell", "nunique"),
        n_cos_distinct=("cos_to_centroid", "nunique"),
    )
    out["grp"] = out["grp"].astype("int64")
    out["n_vecs"] = out["n_vecs"].astype("int64")
    out["n_cells_distinct"] = out["n_cells_distinct"].astype("int64")
    out["n_cos_distinct"] = out["n_cos_distinct"].astype("int64")
    return pd.DataFrame(out).sort_values("grp").reset_index(drop=True)


def decontaminate_bloom(
    sf_dir: str, benchmark_max_id: int = 10, n: int = 5, bits_per_gram: int = 16
) -> ray.data.Dataset:
    """Decontamination with a Bloom-filter broadcast: identical output to
    :func:`decontaminate`, different scale envelope.

    At 100 TB the benchmark gram SET itself can outgrow a broadcast (64
    bits/gram sorted array); a Bloom filter needs ~``bits_per_gram`` bits
    (k=8 double-hashed probes, FP ~ 5e-4 at 16 bits/gram), a 4x smaller
    ship. The filter is a PRE-FILTER: batches probe it vectorized and
    only surviving (doc_id, gram) candidates — true hits plus the tiny
    false-positive trickle — enter a hash join against the true benchmark
    gram table, which removes false positives exactly. Verification cost
    scales with the candidate count, not the corpus."""
    from ..functions.shingles import splitmix64

    docs = read(sf_dir, "documents", columns=["doc_id", "text"])

    bench_pd = (
        docs.filter(expr=f"doc_id < {benchmark_max_id}")
        .map_batches(lambda b: _doc_gram_pairs(b, n), batch_format="pandas")
        .to_pandas()
    )
    bench_grams = np.unique(bench_pd["gram"].to_numpy(np.uint64))

    k_hashes = 8
    m = 1 << max(10, int(np.ceil(np.log2(max(1, len(bench_grams)) * bits_per_gram))))
    words = np.zeros(m // 64, dtype=np.uint64)

    def positions(g: np.ndarray) -> np.ndarray:
        h1 = splitmix64(g)
        h2 = splitmix64(g ^ np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)
        idx = np.arange(k_hashes, dtype=np.uint64)[:, None]
        return (h1[None, :] + idx * h2[None, :]) % np.uint64(m)

    pos = positions(bench_grams)
    np.bitwise_or.at(words, (pos // np.uint64(64)).ravel(),
                     np.uint64(1) << (pos % np.uint64(64)).ravel())
    bloom_ref = ray.put(words)
    truth_ds = ray.data.from_arrow(
        pa.table({"gram": pa.array(bench_grams.view(np.int64))})
    )

    class BloomProbe:
        def __init__(self, bloom_ref, max_id, n):
            self.words = ray.get(bloom_ref)
            self.max_id = max_id
            self.n = n

        def __call__(self, batch: pd.DataFrame) -> pa.Table:
            batch = batch[batch["doc_id"] >= self.max_id]
            empty = pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "gram": pa.array([], pa.int64()),
                }
            )
            if not len(batch):
                return empty
            df = _doc_gram_pairs(batch, self.n)
            g = df["gram"].to_numpy(np.uint64)
            if not len(g):
                return empty
            p = positions(g)
            hit = np.ones(len(g), dtype=bool)
            for i in range(k_hashes):
                w = self.words[p[i] // np.uint64(64)]
                hit &= (w >> (p[i] % np.uint64(64))) & np.uint64(1) != 0
            # candidates only: true hits + the ~5e-4 false-positive trickle
            return pa.table(
                {
                    "doc_id": pa.array(
                        df["doc_id"].to_numpy(np.int64)[hit]
                    ),
                    "gram": pa.array(g[hit].view(np.int64)),
                }
            )

        def __repr__(self):
            return "BloomDecontaminationProbe"

    candidates = docs.map_batches(
        BloomProbe,
        fn_constructor_args=(bloom_ref, benchmark_max_id, n),
        batch_format="pandas",
        concurrency=(1, 8),
    )
    verified = candidates.join(
        truth_ds, join_type="inner", num_partitions=join_partitions(), on=("gram",)
    )

    def count_partial(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False)
        u, c = np.unique(d, return_counts=True)
        return pa.table(
            {
                "doc_id": pa.array(u, type=pa.int64()),
                "partial": pa.array(c.astype(np.int64)),
            }
        )

    return canonical_sort(
        verified.map_batches(count_partial, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("partial", alias_name="n_contaminated_grams")),
        ["doc_id"],
    )


def quality_weighted_sample(
    sf_dir: str, full_keep_tokens: int = 40, bucket: str = "splitmix"
) -> ray.data.Dataset:
    """Quality-proportional deterministic downsampling (the DCLM-style
    "sample at a rate proportional to a quality signal" selection stage):
    each doc keeps with probability ``min(1, n_tokens / full_keep_tokens)``,
    decided by a content-independent bucket of ``doc_id`` — so the draw
    is reproducible across engines and runs (vectorized splitmix64 by
    default; ``bucket='md5'`` for the DuckDB-replicable oracle draw, same
    dual path as :func:`hash_split`). Returns the kept docs with their
    token count and keep threshold.

    Scale: one vectorized map pass + a final bounded sort; nothing
    shuffles."""

    def per_batch(batch: pd.DataFrame) -> pd.DataFrame:
        n_tokens = (
            batch["text"].fillna("").str.split().str.len().fillna(0)
        ).astype("int64")
        buckets = _bucket(batch["doc_id"], 10000, bucket)
        thresh = np.minimum(
            n_tokens.to_numpy() * 10000 // full_keep_tokens, 10000
        )
        keep = buckets < thresh
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(np.int64)[keep],
                "n_tokens": n_tokens.to_numpy()[keep],
                "keep_bps": thresh[keep],
            }
        )

    out = read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        per_batch, batch_format="pandas"
    )
    from .common import canonical_sort

    return canonical_sort(out, ["doc_id"])


def chunk_documents(
    sf_dir: str, chunk_tokens: int = 64, overlap: int = 16
) -> ray.data.Dataset:
    """Fixed-size token chunking with overlap — the RAG / context-window
    splitter: each document becomes ceil-strided chunks of
    ``chunk_tokens`` whitespace tokens, consecutive chunks sharing
    ``overlap`` tokens (stride = chunk - overlap); the final chunk is
    the remainder. Emits (doc_id, chunk_idx, tok_start, n_tokens).

    Scale pattern: a pure per-batch row EXPANSION — token counts are one
    vectorized pass (functions.textstats.token_count_batch), the chunk
    grid is closed-form numpy (repeat + arange, no Python per-row loop),
    and nothing shuffles: chunk rows inherit the input partitioning, so
    the op streams at any scale. An empty/whitespace-only doc yields one
    zero-token chunk (the doc is never silently dropped)."""
    assert 0 <= overlap < chunk_tokens
    stride = chunk_tokens - overlap

    def expand(batch: pd.DataFrame) -> pa.Table:
        from ..functions.textstats import token_count_batch

        n = token_count_batch(batch["text"]).to_numpy(np.int64)
        k = np.where(
            n <= chunk_tokens,
            np.int64(1),
            (n - chunk_tokens + stride - 1) // stride + 1,
        )
        doc = np.repeat(batch["doc_id"].to_numpy(np.int64), k)
        idx = np.arange(int(k.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(k) - k, k
        )
        start = idx * stride
        length = np.minimum(chunk_tokens, np.repeat(n, k) - start)
        return pa.table(
            {
                "doc_id": pa.array(doc),
                "chunk_idx": pa.array(idx),
                "tok_start": pa.array(start),
                "n_tokens": pa.array(length),
            }
        )

    return canonical_sort(
        read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
            expand, batch_format="pandas"
        ),
        ["doc_id", "chunk_idx"],
    )


def systematic_sample(
    sf_dir: str, every_k: int = 10, bucket_span: int = 256
) -> pd.DataFrame:
    """Systematic (every-k-th) sampling in global doc_id order — the
    equal-interval complement of hash_split's random-bucket draw and
    stratified_sample's per-stratum rates: keep exactly the rows whose
    0-based global rank is a multiple of ``every_k``. Columns: doc_id,
    rank; ordered by doc_id. Deterministic by construction (no RNG, no
    hash), so any engine reproduces the identical sample.

    Scale plan: the mixture_schedule distributed prefix sum — per-bucket
    (doc_id // bucket_span) counts fold to driver offsets (~n_docs/span
    rows; raise span with corpus size), a bucket-hash groupby co-locates
    whole buckets, and a vectorized in-shard cumcount plus the broadcast
    offset yields the exact global rank without any global sort."""
    from ..functions.shingles import splitmix64

    n_shards = 64

    def per_doc(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = ids // bucket_span
        shard = (
            splitmix64(bucket.astype(np.uint64)) % np.uint64(n_shards)
        ).astype(np.int32)
        return pa.table(
            {"doc_id": ids, "bucket": bucket, "shard": shard}
        )

    ds = read(sf_dir, "documents", columns=["doc_id"]).map_batches(
        per_doc, batch_format="pyarrow"
    ).materialize()  # two consumers of a compact int relation

    partials = ds.map_batches(
        lambda b: b.group_by("bucket")
        .aggregate([("doc_id", "count")])
        .rename_columns(["bucket", "n"]),
        batch_format="pyarrow",
    ).to_pandas()  # ~n_docs / bucket_span rows: driver-bounded by design
    sums = (
        partials.groupby("bucket", as_index=False)["n"].sum()
        .sort_values("bucket", ignore_index=True)
    )
    sums["offset"] = sums["n"].cumsum() - sums["n"]
    oref = ray.put(
        (
            sums["bucket"].to_numpy(np.int64),
            sums["offset"].to_numpy(np.int64),
        )
    )

    def pick(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(["bucket", "doc_id"], ignore_index=True)
        local = group.groupby("bucket").cumcount().to_numpy(np.int64)
        buckets, offsets = ray.get(oref)
        b = group["bucket"].to_numpy(np.int64)
        rank = offsets[np.searchsorted(buckets, b)] + local
        keep = rank % every_k == 0
        return pd.DataFrame(
            {
                "doc_id": group["doc_id"].to_numpy(np.int64)[keep],
                "rank": rank[keep],
            }
        )

    out = (
        ds.groupby("shard")
        .map_groups(
            lambda g: pick(g.drop(columns=["shard"])),
            batch_format="pandas",
        )
        .to_pandas()
    )
    return out.astype("int64").sort_values("doc_id", ignore_index=True)
