"""Text-analysis pipelines over the flat ``documents`` table:
language-ID census, quality scoring, token counting, fingerprint dedup."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Max, Mean, Sum

from ..functions.textstats import (
    lang_id_batch,
    quality_scores_batch,
    token_count_batch,
    winnow_fingerprints,
)
from .common import canonical_sort, join_partitions, read


def token_counts_by_lang(sf_dir: str) -> ray.data.Dataset:
    """Whitespace-token totals per language (sum + avg, rounded)."""

    def per_doc(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "lang": batch["lang"],
                "n_tokens": token_count_batch(batch["text"]),
            }
        )

    out = canonical_sort(
        read(sf_dir, "documents", columns=["lang", "text"])
        .map_batches(per_doc, batch_format="pandas")
        .groupby("lang")
        .aggregate(
            Sum("n_tokens", alias_name="sum_tokens"),
            Mean("n_tokens", alias_name="avg_tokens"),
        ),
        ["lang"],
    )

    def round_cols(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.set_column(
            batch.column_names.index("avg_tokens"),
            "avg_tokens",
            pc.round(batch["avg_tokens"], ndigits=4),
        )

    return out.map_batches(round_cols, batch_format="pyarrow")


def quality_scores(sf_dir: str) -> ray.data.Dataset:
    """Per-document quality features; SQL-checkable columns only
    (n_chars via length, n_tokens via split, punct_chars via regexp)."""

    def per_doc(batch: pd.DataFrame) -> pd.DataFrame:
        q = quality_scores_batch(batch["text"])
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_chars": q["n_chars"],
                "n_tokens": q["n_tokens"],
                "punct_chars": (q["punct_ratio"] * q["n_chars"].clip(lower=1))
                .round()
                .astype("int64"),
            }
        )

    return canonical_sort(
        read(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(per_doc, batch_format="pandas"),
        ["doc_id"],
    )


def quality_filter(sf_dir: str, min_score: float = 0.5) -> ray.data.Dataset:
    """Training-data quality gate: docs whose heuristic quality score
    passes the threshold (the shape of a C4/Gopher-style filter stage)."""

    def per_doc(batch: pd.DataFrame) -> pd.DataFrame:
        q = quality_scores_batch(batch["text"])
        # floor(x*1e4+0.5)/1e4: half-up rounding that DuckDB can reproduce
        # bit-for-bit (np.round's half-to-even has no cheap SQL equivalent)
        score = np.floor(q["quality_score"].to_numpy() * 1e4 + 0.5) / 1e4
        out = pd.DataFrame({"doc_id": batch["doc_id"], "quality_score": score})
        return out[q["quality_score"].to_numpy() >= min_score]

    return canonical_sort(
        read(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(per_doc, batch_format="pandas"),
        ["doc_id"],
    )


def lang_id_census(sf_dir: str) -> ray.data.Dataset:
    """Predicted-language census from the n-gram/stopword heuristic
    (no SQL oracle — the classifier itself is not SQL-expressible)."""

    def per_doc(batch: pd.DataFrame) -> pd.DataFrame:
        pred = lang_id_batch(batch["text"])
        return (
            pd.DataFrame({"pred_lang": pred})
            .groupby("pred_lang", as_index=False)
            .size()
            .rename(columns={"size": "partial"})
        )

    return canonical_sort(
        read(sf_dir, "documents", columns=["text"])
        .map_batches(per_doc, batch_format="pandas")
        .groupby("pred_lang")
        .aggregate(Sum("partial", alias_name="n")),
        ["pred_lang"],
    )


def fingerprint_dedup(
    sf_dir: str, docs: "ray.data.Dataset | None" = None
) -> ray.data.Dataset:
    """Winnowing-fingerprint exact dedup: docs sharing a full fingerprint
    are textually identical (up to the winnowing resolution); keep
    min(doc_id) per fingerprint group. ``docs`` overrides the (doc_id,
    text) input — the planted-truth hook (:func:`fingerprint_dedup_planted`)."""
    from ray.data.aggregate import Min

    def per_doc(batch: pd.DataFrame) -> pa.Table:
        _, fp = winnow_fingerprints(batch["text"].fillna("").tolist())
        # Arrow out: the fp key domain is ~n_docs groups — pandas blocks
        # would hit the slow per-group aggregate path (common.as_arrow).
        # The fp is bit-cast uint64 -> int64 (bijective): Ray's groupby
        # shuffle rebuilds blocks from Python ints with an inferred int64
        # type, so uint64 keys above 2^63 overflow there and silently
        # fall back to PICKLED object blocks (observed with the fp key).
        return pa.table(
            {
                "doc_id": pa.array(batch["doc_id"].to_numpy(), type=pa.int64()),
                "fp": pa.array(np.asarray(fp, dtype=np.uint64).view(np.int64)),
            }
        )

    ds = (
        docs
        if docs is not None
        else read(sf_dir, "documents", columns=["doc_id", "text"])
    )
    return canonical_sort(
        ds.map_batches(per_doc, batch_format="pandas")
        .groupby("fp")
        .aggregate(Min("doc_id", alias_name="doc_id"))
        .select_columns(["doc_id"]),
        ["doc_id"],
    )


def fingerprint_dedup_planted(
    sf_dir: str, dup_every: int = 10
) -> ray.data.Dataset:
    """:func:`fingerprint_dedup` over the planted-truth corpus
    (dedupe.planted_flat_docs) — the SAME winnowing/groupby pipeline, but
    with a closed-form value oracle: per-doc_id token salting makes every
    base doc's shingle set disjoint (distinct winnow fingerprints), and
    each byte-identical companion at doc_id + 1e9 shares its base's
    fingerprint exactly — so min(doc_id) per group keeps precisely the
    original documents.doc_id domain."""
    from .dedupe import planted_flat_docs

    return fingerprint_dedup(sf_dir, docs=planted_flat_docs(sf_dir, dup_every))


def bpe_token_stats(sf_dir: str) -> ray.data.Dataset:
    """Per-language totals under the BPE-ish regex pre-tokenizer
    (letter runs | digit runs | single symbols) — the tokenizer-aware
    counterpart of :func:`token_counts_by_lang`, SQL-checkable via
    DuckDB's regexp_extract_all."""
    ds = read(sf_dir, "documents", columns=["lang", "text"])

    def per_doc(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "lang": batch["lang"],
                "n_bpe": token_count_batch(batch["text"], mode="bpe"),
            }
        )

    out = canonical_sort(
        ds.map_batches(per_doc, batch_format="pandas")
        .groupby("lang")
        .aggregate(
            Sum("n_bpe", alias_name="sum_bpe_tokens"),
            Mean("n_bpe", alias_name="avg_bpe_tokens"),
        ),
        ["lang"],
    )

    def round_cols(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.set_column(
            batch.column_names.index("avg_bpe_tokens"),
            "avg_bpe_tokens",
            pc.round(batch["avg_bpe_tokens"], ndigits=4),
        )

    return out.map_batches(round_cols, batch_format="pyarrow")


def top_tokens(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Corpus-wide top-``k`` most frequent whitespace tokens (the
    canonical wordcount, heavy-hitter census shape).

    Scale pattern: each batch pre-aggregates its token counts with one
    ``np.unique`` (a combiner — one partial row per DISTINCT token per
    batch rides the shuffle, never one row per occurrence), the global
    groupby sums partials, and only the final k-row head is collected."""

    def partial(batch: pd.DataFrame) -> pa.Table:
        toks = np.concatenate([t.split() for t in batch["text"]] or [[]])
        if len(toks) == 0:
            return pa.table({"tok": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        u, c = np.unique(toks, return_counts=True)
        # Arrow out: token-domain groupby (see common.as_arrow)
        return pa.table({"tok": pa.array(u), "cnt": pa.array(c.astype(np.int64))})

    return canonical_sort(
        read(sf_dir, "documents", columns=["text"])
        .map_batches(partial, batch_format="pandas")
        .groupby("tok")
        .aggregate(Sum("cnt", alias_name="n")),
        ["n", "tok"],
        descending=[True, False],
    ).limit(k).to_pandas()


def distinct_texts_hll(sf_dir: str) -> pd.DataFrame:
    """Approximate distinct-text count per language via a HyperLogLog
    sketch (p=12, ~1.6% standard error) — the scale path for COUNT
    DISTINCT over columns whose distinct domain does NOT fit anywhere.

    Scale pattern: batches emit (lang, register, rho) partials already
    maxed within the batch, the global merge is a groupby over at most
    ``langs x 4096`` rows, and the driver folds registers into the
    estimate. Exactness is oracled in pytest against true COUNT
    DISTINCT at small scale (tolerance from the sketch's error bound)."""
    from ..functions.hashing import stable_hash64
    from ..functions.sketches import estimate_from_registers, registers_from_hashes

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        reg, rho = registers_from_hashes(stable_hash64(batch["text"].to_numpy()))
        out = pd.DataFrame({"lang": batch["lang"], "reg": reg, "rho": rho})
        return out.groupby(["lang", "reg"], as_index=False)["rho"].max()

    merged = (
        read(sf_dir, "documents", columns=["lang", "text"])
        .map_batches(partial, batch_format="pandas")
        .groupby(["lang", "reg"])
        .aggregate(Max("rho", alias_name="rho"))
        .to_pandas()
    )
    rows = [
        {
            "lang": lang,
            "est_distinct": int(round(
                estimate_from_registers(g["reg"].to_numpy(), g["rho"].to_numpy())
            )),
        }
        for lang, g in merged.groupby("lang")
    ]
    return pd.DataFrame(rows).sort_values("lang").reset_index(drop=True)


def hll_registers_md5(sf_dir: str) -> pd.DataFrame:
    """The DISTRIBUTED part of :func:`distinct_texts_hll`, value-certified
    exactly: the merged per-language HyperLogLog register table
    (lang, reg, rho) over md5-derived 64-bit hashes.

    Same oracle-parity contract as ``hash_split(bucket='md5')``
    (curation._md5_bucket): DuckDB reproduces md5 bit-for-bit, so the
    register index (top 12 bits) and rho (leading zeros of the low 52,
    +1) are SQL-derivable integers — no float anywhere, so the hash gate
    is exact. The per-row md5 loop exists ONLY in this oracle-parity
    query; production sketching (:func:`distinct_texts_hll`) hashes with
    the vectorized stable_hash64, and the scalar estimate fold stays
    pinned by tests/test_sketches.py's tolerance check."""
    import hashlib

    from ..functions.sketches import registers_from_hashes

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        h = np.array(
            [
                int.from_bytes(
                    hashlib.md5((t or "").encode("utf-8")).digest()[:8], "big"
                )
                for t in batch["text"]
            ],
            dtype=np.uint64,
        )
        reg, rho = registers_from_hashes(h)
        out = pd.DataFrame({"lang": batch["lang"], "reg": reg, "rho": rho})
        return out.groupby(["lang", "reg"], as_index=False)["rho"].max()

    merged = (
        read(sf_dir, "documents", columns=["lang", "text"])
        .map_batches(partial, batch_format="pandas")
        .groupby(["lang", "reg"])
        .aggregate(Max("rho", alias_name="rho"))
        .to_pandas()
    )
    merged["reg"] = merged["reg"].astype("int64")
    merged["rho"] = merged["rho"].astype("int64")
    return merged.sort_values(["lang", "reg"]).reset_index(drop=True)


def heavy_hitter_tokens(sf_dir: str, k: int = 100) -> pd.DataFrame:
    """Tokens whose corpus frequency EXCEEDS ``N / k`` (N = total tokens)
    — exact, via the two-pass heavy-hitter plan rather than a full-domain
    groupby.

    Pass 1 (candidates): each batch emits only the tokens exceeding the
    LOCAL threshold ``batch_tokens / k`` — by pigeonhole, every global
    heavy hitter exceeds the local threshold in at least one batch, so
    the union (a few k-sized sets) is a guaranteed superset. Pass 2
    (verify): the candidate set is broadcast and exact counts are summed
    for candidates only — the shuffle carries O(candidates) rows instead
    of one row per distinct token, which at 100 TB is the difference
    between a bounded exchange and a full-vocabulary shuffle.
    Unlike classic Misra-Gries, the output is exact and deterministic
    (batch-order-independent), so it hash-matches an ANSI-SQL oracle.
    """
    import ray

    from .common import join_partitions, read as _read

    def local_candidates(batch: pd.DataFrame) -> pd.DataFrame:
        toks = np.concatenate([t.split() for t in batch["text"]] or [[]])
        n = len(toks)
        if n == 0:
            return pd.DataFrame({"tok": pd.Series([], dtype=str),
                                 "total": pd.Series([], dtype="int64")})
        u, c = np.unique(toks, return_counts=True)
        cand = u[c > n / k]
        out = pd.DataFrame({"tok": cand, "total": np.int64(0)})
        # one sentinel row per batch carries the batch's token total so N
        # needs no second aggregate pass
        return pd.concat(
            [out, pd.DataFrame({"tok": [""], "total": [np.int64(n)]})],
            ignore_index=True,
        )

    docs = read(sf_dir, "documents", columns=["text"])
    cand_pd = docs.map_batches(local_candidates, batch_format="pandas").to_pandas()
    n_total = int(cand_pd["total"].sum())
    candidates = np.unique(cand_pd.loc[cand_pd["tok"] != "", "tok"].to_numpy(str))
    cref = ray.put(candidates)

    class CountCandidates:
        def __init__(self, cref):
            self.cand = ray.get(cref)  # sorted

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            toks = np.concatenate([t.split() for t in batch["text"]] or [[]])
            if len(toks) == 0 or len(self.cand) == 0:
                return pa.table({"tok": pa.array([], pa.string()),
                                 "cnt": pa.array([], pa.int64())})
            toks = toks.astype(str)
            pos = np.searchsorted(self.cand, toks)
            pos[pos == len(self.cand)] = 0
            hit = self.cand[pos] == toks
            u, c = np.unique(toks[hit], return_counts=True)
            return pa.table({"tok": pa.array(u), "cnt": pa.array(c.astype(np.int64))})

    out = (
        docs.map_batches(
            CountCandidates,
            fn_constructor_args=(cref,),
            batch_format="pandas",
            concurrency=(1, 8),
        )
        .groupby("tok")
        .aggregate(Sum("cnt", alias_name="n"))
        .to_pandas()
    )
    out = out[out["n"] > n_total / k]
    return out.sort_values(["n", "tok"], ascending=[False, True], ignore_index=True)


def unigram_logprob(sf_dir: str, vocab_size: int = 1000) -> ray.data.Dataset:
    """Per-document average negative log-probability under a unigram LM
    trained on the corpus itself — the CCNet/KenLM-style fluency signal,
    reduced to the distributed shape: (1) train = token census (per-batch
    ``np.unique`` combiner -> groupby sum -> top-``vocab_size`` by count),
    (2) broadcast the tiny (token, logp) model once, (3) score = one
    vectorized ``searchsorted`` pass per batch. OOV tokens get the 1/N
    floor. SQL-oracled: cross-engine float noise (ln implementations,
    SUM order) is <= ~1e-12 relative on per-doc sums of <= a few hundred
    terms, far inside the floor-to-4-decimals output contract — exactness
    verified bit-for-bit per sf in the oracle sweeps; the formula is also
    pinned by a brute-force pytest."""
    import ray

    def partial(batch: pd.DataFrame) -> pa.Table:
        toks = np.concatenate([t.split() for t in batch["text"]] or [[]])
        if len(toks) == 0:
            return pa.table({"tok": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        u, c = np.unique(toks, return_counts=True)
        return pa.table({"tok": pa.array(u), "cnt": pa.array(c.astype(np.int64))})

    docs = read(sf_dir, "documents", columns=["doc_id", "text"])
    census = (
        docs.map_batches(partial, batch_format="pandas")
        .groupby("tok")
        .aggregate(Sum("cnt", alias_name="n"))
        .materialize()  # (token, count) rows only — reused by N and top-V
    )
    n_total = int(census.sum("n"))
    vocab_pd = (
        canonical_sort(census, ["n", "tok"], descending=[True, False])
        .limit(vocab_size)
        .to_pandas()
    )
    order = np.argsort(vocab_pd["tok"].to_numpy(str), kind="stable")
    vocab = vocab_pd["tok"].to_numpy(str)[order]
    logp = np.log(vocab_pd["n"].to_numpy(np.float64)[order] / n_total)
    oov_logp = float(np.log(1.0 / n_total))
    mref = ray.put((vocab, logp, oov_logp))

    class Score:
        def __init__(self, mref):
            self.vocab, self.logp, self.oov = ray.get(mref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            token_lists = [t.split() for t in batch["text"].fillna("")]
            lens = np.fromiter((len(w) for w in token_lists), np.int64,
                               count=len(token_lists))
            flat = np.asarray(
                [w for ws in token_lists for w in ws], dtype=str
            )
            if len(flat):
                pos = np.searchsorted(self.vocab, flat)
                pos[pos == len(self.vocab)] = 0
                hit = (
                    self.vocab[pos] == flat
                    if len(self.vocab)
                    else np.zeros(len(flat), bool)
                )
                lp = np.where(hit, self.logp[pos], self.oov)
            else:
                lp = np.empty(0, np.float64)
            off = np.zeros(len(lens) + 1, dtype=np.int64)
            np.cumsum(lens, out=off[1:])
            if len(lp):
                idx = np.minimum(off[:-1], len(lp) - 1)  # reduceat needs idx < len
                sums = np.add.reduceat(lp, idx)
            else:
                sums = np.zeros(len(lens))
            sums[lens == 0] = 0.0
            avg = -sums / np.maximum(lens, 1)
            return pd.DataFrame(
                {
                    "doc_id": batch["doc_id"].to_numpy(np.int64),
                    "n_tokens": lens,
                    "avg_neg_logprob": np.floor(avg * 1e4 + 0.5) / 1e4,
                }
            )

    return canonical_sort(
        docs.map_batches(
            Score,
            fn_constructor_args=(mref,),
            batch_format="pandas",
            concurrency=(1, 8),
        ),
        ["doc_id"],
    )


def tfidf_top_terms(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Per-language top-``k`` terms by corpus TF-IDF:
    ``score(lang, tok) = count(lang, tok) * ln(N_docs / df(tok))``.

    Scale pattern: one pass emits per-batch (lang, tok) partials for BOTH
    the occurrence count and the distinct-doc count (docs never span
    batches, so per-doc dedup is local); a vocab-domain groupby merges
    them, then a token-hash-bucketed ``map_groups`` folds the global
    ``df(tok)`` (sum of per-lang doc counts) onto every (lang, tok) row of
    the bucket with a vectorized pandas transform — join-free, so no
    acero key-resolution hazard on degraded partition schemas (the round-2
    ``Dataset.join`` failure mode). Only the k-row head per language is
    collected — the vocab itself never lands on the driver."""

    def partials(batch: pd.DataFrame) -> pa.Table:
        token_lists = [t.split() for t in batch["text"].fillna("")]
        lens = np.fromiter((len(t) for t in token_lists), np.int64, len(token_lists))
        langs = batch["lang"].to_numpy()
        if lens.sum() == 0:
            return pa.table({"lang": pa.array([], pa.string()),
                             "tok": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64()),
                             "d": pa.array([], pa.int64())})
        occ = pd.DataFrame(
            {"lang": np.repeat(langs, lens), "tok": np.concatenate(token_lists)}
        )
        c = occ.groupby(["lang", "tok"], as_index=False).size()
        uniq_lists = [np.unique(np.asarray(t, dtype=object)) for t in token_lists]
        ulens = np.fromiter((len(u) for u in uniq_lists), np.int64, len(uniq_lists))
        dd = pd.DataFrame(
            {"lang": np.repeat(langs, ulens), "tok": np.concatenate(uniq_lists)}
        )
        d = dd.groupby(["lang", "tok"], as_index=False).size()
        m = c.merge(d, on=["lang", "tok"], suffixes=("_c", "_d"))
        return pa.table(
            {
                "lang": pa.array(m["lang"], pa.string()),
                "tok": pa.array(m["tok"], pa.string()),
                "c": pa.array(m["size_c"].to_numpy(np.int64)),
                "d": pa.array(m["size_d"].to_numpy(np.int64)),
            }
        )

    n_docs = read(sf_dir, "documents", columns=["doc_id"]).count()
    cnt = (
        read(sf_dir, "documents", columns=["lang", "text"])
        .map_batches(partials, batch_format="pandas")
        .groupby(["lang", "tok"])
        .aggregate(Sum("c", alias_name="c"), Sum("d", alias_name="d"))
    )

    # each doc has exactly one lang, so global df(tok) = sum over langs.
    # Co-locate every (lang, tok) row of a token in one bucket and fold df
    # vectorized — one bounded shuffle, no Dataset.join.
    from ..functions.hashing import stable_hash64

    n_buckets = max(join_partitions(), 1)

    def add_bucket(batch: pa.Table) -> pa.Table:
        toks = batch["tok"].to_pandas().to_numpy(dtype=object)
        b = (stable_hash64(toks) % np.uint64(n_buckets)).astype(np.int64)
        return batch.append_column("bucket", pa.array(b, pa.int64()))

    def fold_df(group: pd.DataFrame) -> pd.DataFrame:
        out = group[["lang", "tok", "c"]].copy()
        out["df"] = group.groupby("tok")["d"].transform("sum")
        return out

    joined = (
        cnt.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold_df, batch_format="pandas")
    )

    def score_topk(batch: pa.Table) -> pa.Table:
        c = batch["c"].to_numpy(zero_copy_only=False).astype(np.float64)
        df_ = batch["df"].to_numpy(zero_copy_only=False).astype(np.float64)
        score = c * np.log(float(n_docs) / df_)
        t = pd.DataFrame(
            {
                "lang": batch["lang"].to_pandas(),
                "tok": batch["tok"].to_pandas(),
                "tfidf_raw": score,
            }
        )
        # local combiner: only k candidate rows per lang leave the batch
        t = (
            t.sort_values(["lang", "tfidf_raw", "tok"],
                          ascending=[True, False, True])
            .groupby("lang", as_index=False)
            .head(k)
        )
        return pa.Table.from_pandas(t, preserve_index=False)

    cand = joined.map_batches(score_topk, batch_format="pyarrow").to_pandas()
    top = (
        cand.sort_values(["lang", "tfidf_raw", "tok"], ascending=[True, False, True])
        .groupby("lang", as_index=False)
        .head(k)
        .reset_index(drop=True)
    )
    top["tfidf"] = np.floor(top["tfidf_raw"].to_numpy() * 1e4 + 0.5) / 1e4
    return top[["lang", "tok", "tfidf"]]


def bm25_search(
    sf_dir: str,
    query_terms: tuple[str, ...] = ("table", "hash", "sort"),
    k1: float = 1.2,
    b: float = 0.75,
) -> ray.data.Dataset:
    """Keyword relevance search: Okapi BM25 score of every document
    against a fixed term set — the text-retrieval complement of the
    vector knn queries. Returns all docs matching >= 1 term, ordered by
    (score desc, doc_id); no top-k cutoff, so there is no rounded-score
    tie boundary (the q10 lesson).

    Plan: pass 1 is one vectorized map + a 3-scalar aggregate (N, total
    tokens, df per query term — |terms| is a constant, so the "index" is
    a handful of counters, not an inverted index shuffle); the final
    stats broadcast into pass 2, which computes tf and the BM25 formula
    per batch. Nothing but scalars crosses stages."""

    def stats_partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].fillna("").str.split()
        n_tok = toks.str.len().fillna(0).astype("int64")
        row = {"n_docs": len(batch), "n_tokens": int(n_tok.sum())}
        for t in query_terms:
            row[f"df_{t}"] = int(
                toks.map(lambda ws, t=t: t in ws if ws else False).sum()
            )
        return pd.DataFrame([row])

    cols = ["n_docs", "n_tokens"] + [f"df_{t}" for t in query_terms]
    stats = (
        read(sf_dir, "documents", columns=["text"])
        .map_batches(stats_partial, batch_format="pandas")
        .to_pandas()
        .sum()
    )
    N = float(stats["n_docs"])
    avgdl = float(stats["n_tokens"]) / max(N, 1.0)
    idf = {
        t: float(np.log((N - stats[f"df_{t}"] + 0.5)
                        / (stats[f"df_{t}"] + 0.5) + 1.0))
        for t in query_terms
    }

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].fillna("").str.split()
        dl = toks.str.len().fillna(0).astype("float64").to_numpy()
        norm = k1 * (1.0 - b + b * dl / avgdl)
        s = np.zeros(len(batch))
        matched = np.zeros(len(batch), dtype=bool)
        for t in query_terms:
            tf = toks.map(
                lambda ws, t=t: ws.count(t) if ws else 0
            ).to_numpy(np.float64)
            matched |= tf > 0
            s += idf[t] * tf * (k1 + 1.0) / np.maximum(tf + norm, 1e-12)
        out = pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(np.int64)[matched],
                "score": np.floor(s[matched] * 1e4 + 0.5) / 1e4,
            }
        )
        return out

    from .common import canonical_sort

    out = read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        score, batch_format="pandas"
    )
    return canonical_sort(out, ["score", "doc_id"], descending=[True, False])


def boilerplate_prefixes(sf_dir: str, prefix_len: int = 80) -> ray.data.Dataset:
    """Boilerplate detection: exact-prefix census over the documents
    table — every distinct first-``prefix_len``-character prefix shared
    by more than one document, with its document count and the earliest
    doc carrying it.  Shared openings at corpus scale are template /
    boilerplate text (license headers, scraped nav chrome); this is the
    cheap screen a curation pipeline runs before the heavier dedup
    family.

    Plan: a per-batch combiner pre-aggregates (prefix → n, min doc_id)
    so the groupby shuffle moves one short partial per distinct prefix
    per batch, never document text.  The group key is the prefix STRING
    itself, not a 64-bit hash: at trillion-doc scale 64-bit prefix-hash
    collisions are expected (birthday bound ~4B keys) and would silently
    merge unrelated groups — an 80-byte key on a partial-sized exchange
    is the honest trade."""
    from ray.data.aggregate import Min

    def partial(batch: pd.DataFrame) -> pa.Table:
        pre = batch["text"].fillna("").str.slice(0, prefix_len)
        g = (
            pd.DataFrame({"prefix": pre, "doc_id": batch["doc_id"]})
            .groupby("prefix", as_index=False)
            .agg(n_docs=("doc_id", "size"), first_doc=("doc_id", "min"))
        )
        return pa.table(
            {
                "prefix": pa.array(g["prefix"], pa.string()),
                "n_docs": pa.array(g["n_docs"].to_numpy(np.int64)),
                "first_doc": pa.array(g["first_doc"].to_numpy(np.int64)),
            }
        )

    per = (
        read(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(partial, batch_format="pandas")
        .groupby("prefix")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Min("first_doc", alias_name="first_doc"),
        )
    )

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = batch.filter(pc.greater(batch["n_docs"], 1))
        return pa.table(
            {
                "prefix": t["prefix"],
                "n_docs": t["n_docs"],
                "first_doc": t["first_doc"],
            }
        )

    return canonical_sort(
        per.map_batches(keep, batch_format="pyarrow"), ["first_doc"]
    )


def cooccurrence_census(
    sf_dir: str, window: int = 2, k: int = 30
) -> pd.DataFrame:
    """Top-``k`` unordered token co-occurrence pairs within a +/-``window``
    token distance (the skip-gram statistics pass behind word-vector
    training and collocation mining), ranked (count DESC, pair ASC) so
    the cutoff is deterministic.

    Scale pattern: each batch flattens its token streams once, pairs
    positions ``i`` with ``i+d`` for d = 1..window via shifted views of
    the SAME flat array (doc boundaries masked with one searchsorted —
    no per-row Python loop), canonicalizes pair order lexicographically,
    and pre-aggregates to one partial row per distinct pair per batch;
    the global groupby sums partials and only the k-row head leaves."""

    def partial(batch: pd.DataFrame) -> pa.Table:
        toks = [t.split() for t in batch["text"].fillna("")]
        lens = np.fromiter((len(w) for w in toks), np.int64, len(toks))
        empty = pa.table(
            {
                "tok_a": pa.array([], pa.string()),
                "tok_b": pa.array([], pa.string()),
                "cnt": pa.array([], pa.int64()),
            }
        )
        if lens.sum() < 2:
            return empty
        flat = np.concatenate([w for w in toks if w], dtype=object)
        ends = np.cumsum(lens[lens > 0])
        a_parts, b_parts = [], []
        for d in range(1, window + 1):
            if len(flat) <= d:
                break
            pos = np.arange(len(flat) - d)
            # pair (i, i+d) is in-document iff i+d stays under the end
            # of the doc that owns position i
            valid = pos + d < ends[np.searchsorted(ends, pos, side="right")]
            a_parts.append(flat[:-d][valid])
            b_parts.append(flat[d:][valid])
        if not a_parts:
            return empty
        a = np.concatenate(a_parts)
        b = np.concatenate(b_parts)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        g = (
            pd.DataFrame({"tok_a": lo, "tok_b": hi})
            .groupby(["tok_a", "tok_b"], as_index=False)
            .size()
        )
        return pa.table(
            {
                "tok_a": pa.array(g["tok_a"], pa.string()),
                "tok_b": pa.array(g["tok_b"], pa.string()),
                "cnt": pa.array(g["size"].to_numpy(np.int64)),
            }
        )

    return (
        canonical_sort(
            read(sf_dir, "documents", columns=["text"])
            .map_batches(partial, batch_format="pandas")
            .groupby(["tok_a", "tok_b"])
            .aggregate(Sum("cnt", alias_name="n")),
            ["n", "tok_a", "tok_b"],
            descending=[True, False, False],
        )
        .limit(k)
        .to_pandas()
    )


def vocab_size_by_lang(sf_dir: str) -> ray.data.Dataset:
    """Exact per-language vocabulary census: distinct whitespace-token
    count plus total token count (the type/token analytics pass) — the
    EXACT counterpart of :func:`distinct_texts_hll`'s sketch.

    Scale pattern: exact COUNT DISTINCT as two bounded stages — each
    batch pre-aggregates its (lang, tok) counts (one partial row per
    distinct pair per batch), the token-domain groupby merges partials
    (the only large exchange, bounded by |vocab| x |langs| rows of ~30
    bytes, never one row per occurrence), and each merged pair then
    contributes (distinct=1, n=count) to a |langs|-row census."""

    def partial(batch: pd.DataFrame) -> pa.Table:
        toks = [t.split() for t in batch["text"].fillna("")]
        lens = np.fromiter((len(w) for w in toks), np.int64, len(toks))
        if lens.sum() == 0:
            return pa.table(
                {
                    "lang": pa.array([], pa.string()),
                    "tok": pa.array([], pa.string()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        flat = np.concatenate([w for w in toks if w], dtype=object)
        lang = np.repeat(batch["lang"].to_numpy(), lens)
        g = (
            pd.DataFrame({"lang": lang, "tok": flat})
            .groupby(["lang", "tok"], as_index=False)
            .size()
        )
        return pa.table(
            {
                "lang": pa.array(g["lang"], pa.string()),
                "tok": pa.array(g["tok"], pa.string()),
                "cnt": pa.array(g["size"].to_numpy(np.int64)),
            }
        )

    def census(batch: pa.Table) -> pa.Table:
        # each row is one distinct (lang, tok) pair after the merge
        df = pd.DataFrame(
            {
                "lang": batch["lang"].to_pandas(),
                "one": np.ones(batch.num_rows, np.int64),
                "cnt": batch["cnt"].to_numpy(),
            }
        )
        g = df.groupby("lang", as_index=False).agg(
            d=("one", "sum"), n=("cnt", "sum")
        )
        return pa.table(
            {
                "lang": pa.array(g["lang"], pa.string()),
                "d": pa.array(g["d"].to_numpy(np.int64)),
                "n": pa.array(g["n"].to_numpy(np.int64)),
            }
        )

    out = (
        read(sf_dir, "documents", columns=["lang", "text"])
        .map_batches(partial, batch_format="pandas")
        .groupby(["lang", "tok"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .map_batches(census, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("d", alias_name="n_distinct_tokens"),
            Sum("n", alias_name="n_tokens"),
        )
    )
    return canonical_sort(out, ["lang"])


def collocation_lift(
    sf_dir: str, min_count: int = 5, k: int = 30
) -> pd.DataFrame:
    """PMI-style collocation mining: top-``k`` ADJACENT token bigrams by
    LIFT — ``P(x,y) / (P(x)·P(y))`` folded as the exact integer ratio
    ``c_xy · N_uni² · SCALE // (N_bi · c_x · c_y)`` — with a
    ``min_count`` support floor (the standard guard against
    rare-pair lift explosion). Columns: tok_a, tok_b (ORDERED bigram),
    n_pair, lift_scaled; ranked lift desc, count desc, pair asc.

    The finisher runs arbitrary-precision Python ints (c_xy·N_uni² tops
    int64 past ~3e5 tokens); the SQL mirror uses HUGEINT. Scale: one
    bigram census + one unigram census (both per-batch pre-combined);
    the lift join happens only on the min_count survivors."""
    from ray.data.aggregate import Sum

    def partial(batch: pd.DataFrame) -> pa.Table:
        toks = [t.split() for t in batch["text"].fillna("")]
        lens = np.fromiter((len(w) for w in toks), np.int64, len(toks))
        flat = (
            np.concatenate([w for w in toks if w], dtype=object)
            if lens.sum()
            else np.empty(0, object)
        )
        ka = kb = np.empty(0, object)
        kn = np.empty(0, np.int64)
        if lens.sum() >= 2:
            ends = np.cumsum(lens[lens > 0])
            pos = np.arange(len(flat) - 1)
            valid = pos + 1 < ends[np.searchsorted(ends, pos, side="right")]
            a, b = flat[:-1][valid], flat[1:][valid]
            if len(a):
                g = pd.DataFrame({"a": a, "b": b}).groupby(
                    ["a", "b"], as_index=False
                ).size()
                ka = g["a"].to_numpy(object)
                kb = g["b"].to_numpy(object)
                kn = g["size"].to_numpy(np.int64)
        u, uc = (
            np.unique(flat, return_counts=True)
            if len(flat)
            else (np.empty(0, object), np.empty(0, np.int64))
        )
        return pa.table(
            {
                "kind": pa.array(
                    np.r_[np.zeros(len(ka), np.int8),
                          np.ones(len(u), np.int8)]
                ),
                "tok_a": pa.array(np.r_[ka, u], pa.string()),
                "tok_b": pa.array(
                    np.r_[kb, np.full(len(u), "", object)], pa.string()
                ),
                "n": pa.array(np.r_[kn, uc.astype(np.int64)]),
            }
        )

    folds = (
        read(sf_dir, "documents", columns=["text"])
        .map_batches(partial, batch_format="pandas")
        .groupby(["kind", "tok_a", "tok_b"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    uni = folds[folds["kind"] == 1]
    big = folds[folds["kind"] == 0]
    n_uni = int(uni["n"].sum())
    n_bi = int(big["n"].sum())
    ucount = dict(zip(uni["tok_a"], (int(x) for x in uni["n"])))
    big = big[big["n"] >= min_count]
    scale = 1_000_000
    rows = []
    for r in big.itertuples():
        cx, cy, cxy = ucount[r.tok_a], ucount[r.tok_b], int(r.n)
        lift = (scale * cxy * n_uni * n_uni) // (n_bi * cx * cy)
        rows.append((r.tok_a, r.tok_b, cxy, lift))
    out = pd.DataFrame(
        rows, columns=["tok_a", "tok_b", "n_pair", "lift_scaled"]
    )
    if out.empty:
        return out.astype(
            {"n_pair": "int64", "lift_scaled": "int64"}, errors="ignore"
        )
    return (
        out.astype({"n_pair": "int64", "lift_scaled": "int64"})
        .sort_values(
            ["lift_scaled", "n_pair", "tok_a", "tok_b"],
            ascending=[False, False, True, True],
            ignore_index=True,
        )
        .head(k)
    )


def langid_confusion(sf_dir: str) -> pd.DataFrame:
    """Classifier-evaluation census: the CONFUSION MATRIX of the
    stopword/CJK language-ID heuristic against the ground-truth ``lang``
    column — (lang, pred_lang, n) plus a per-cell ``correct`` flag, the
    accuracy/error breakdown a curation pipeline reports before trusting
    a model-derived column. Ordered by (lang, pred_lang).

    The SQL oracle replays the SAME inlined stopword/CJK rule
    (__ray_entry__._lang_id_sql's expression joined with the truth
    column), so the hash match certifies the classifier's per-document
    decisions, not just its marginal census (lang_id_census)."""

    def per_doc(batch: pd.DataFrame) -> pd.DataFrame:
        pred = lang_id_batch(batch["text"])
        return (
            pd.DataFrame({"lang": batch["lang"], "pred_lang": pred})
            .groupby(["lang", "pred_lang"], as_index=False)
            .size()
            .rename(columns={"size": "partial"})
        )

    out = (
        read(sf_dir, "documents", columns=["lang", "text"])
        .map_batches(per_doc, batch_format="pandas")
        .groupby(["lang", "pred_lang"])
        .aggregate(Sum("partial", alias_name="n"))
        .to_pandas()  # bounded: |langs|²
    )
    out["correct"] = (out["lang"] == out["pred_lang"]).astype(np.int64)
    return (
        out.astype({"n": "int64"})
        .sort_values(["lang", "pred_lang"], ignore_index=True)
    )
