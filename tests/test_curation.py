"""Corpus-curation operator semantics (pipelines/curation.py) against
brute-force single-node references on crafted corpora."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from dedupe_rust_ray.pipelines import curation

SF = "/root/testdata/sf0.001"


def _write_docs(tmp_path, texts: list[str]) -> str:
    pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
            "lang": "en",
            "source": "t",
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    return str(tmp_path)


def test_hash_split_partitions_everything():
    out = curation.hash_split(SF).to_pandas()
    assert set(out["split"]) <= {"train", "val", "test"}
    n_docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    assert out["n_docs"].sum() == len(n_docs)
    # deterministic across runs
    again = curation.hash_split(SF).to_pandas()
    pd.testing.assert_frame_equal(out, again)
    # ~90/5/5: at 500 docs each bucket within a loose binomial band
    train = int(out.set_index("split").loc["train", "n_docs"])
    assert 0.8 * len(n_docs) < train < 0.97 * len(n_docs)


def test_bucket_modes_same_rates():
    """The production splitmix64 draw and the md5 oracle draw are
    different permutations with the SAME contract: deterministic,
    uniform, content-independent. Pin both paths valid (full partition,
    rate bands) — not identical (they are different hashes)."""
    n_docs = len(pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"]))
    for mode in ("splitmix", "md5"):
        out = curation.hash_split(SF, bucket=mode).to_pandas()
        assert out["n_docs"].sum() == n_docs
        train = int(out.set_index("split").loc["train", "n_docs"])
        assert 0.8 * n_docs < train < 0.97 * n_docs, mode
        again = curation.hash_split(SF, bucket=mode).to_pandas()
        pd.testing.assert_frame_equal(out, again)
    # the two draws genuinely differ (different docs per bucket), while
    # the vectorized kernel itself is deterministic
    a = curation._splitmix_bucket(np.arange(500), 100)
    b = curation._md5_bucket(np.arange(500), 100)
    assert (a != b).any()
    assert (curation._splitmix_bucket(np.arange(500), 100) == a).all()
    # uniformity of the production draw at a larger sample
    big = curation._splitmix_bucket(np.arange(100_000), 100)
    counts = np.bincount(big, minlength=100)
    assert counts.min() > 700 and counts.max() < 1300


def test_bucket_modes_stratified_and_weighted():
    for mode in ("splitmix", "md5"):
        out = curation.stratified_sample(SF, k=7, bucket=mode).to_pandas()
        assert (out.groupby("stratum").size() <= 7).all(), mode
        again = curation.stratified_sample(SF, k=7, bucket=mode).to_pandas()
        pd.testing.assert_frame_equal(out, again)
        q = curation.quality_weighted_sample(SF, bucket=mode).to_pandas()
        # every kept doc satisfies its own threshold rule and full-rate
        # docs (>= 40 tokens) are always kept in both modes
        assert (q["keep_bps"] <= 10000).all(), mode


def test_dup_ngram_spans_crafted(tmp_path):
    shared = "a b c d e f g h"  # one 8-gram, shared by docs 0 and 1
    texts = [
        shared + " tail0 x0 y0 z0",
        "head1 " + shared + " tail1",
        "u v w p q r s t entirely unique words here",
    ]
    sf = _write_docs(tmp_path, texts)
    out = curation.dup_ngram_spans(sf).to_pandas()
    got = dict(zip(out["doc_id"], out["n_dup_grams"]))
    assert set(got) == {0, 1}  # doc 2 shares nothing
    # brute force: count distinct 8-grams of each doc present in another doc
    def grams(t):
        w = t.split()
        return {" ".join(w[i : i + 8]) for i in range(len(w) - 7)}
    gs = [grams(t) for t in texts]
    for d in (0, 1):
        other = set().union(*(g for i, g in enumerate(gs) if i != d))
        assert got[d] == len(gs[d] & other)


def test_decontaminate_crafted(tmp_path):
    bench = "alpha beta gamma delta epsilon zeta"
    texts = [bench] + ["filler"] * 9
    # doc 10 contains benchmark 5-grams, doc 11 clean
    texts += [
        "x " + bench + " y",
        "totally clean words with no overlap at all here",
    ]
    sf = _write_docs(tmp_path, texts)
    out = curation.decontaminate(sf, benchmark_max_id=10, n=5).to_pandas()
    assert out["doc_id"].tolist() == [10]
    # doc 10's distinct 5-grams hitting the benchmark set
    def grams5(t):
        w = t.split()
        return {" ".join(w[i : i + 5]) for i in range(len(w) - 4)}
    hits = grams5(texts[10]) & (grams5(texts[0]) | grams5(texts[1]))
    assert int(out["n_contaminated_grams"].iloc[0]) == len(hits)


def test_repetition_stats_crafted(tmp_path):
    sf = _write_docs(
        tmp_path,
        ["x y x y x y", "all distinct words in this one", "solo"],
    )
    out = curation.repetition_stats(sf).to_pandas().set_index("doc_id")
    # "x y x y x y": bigrams (x y)*3 + (y x)*2 -> top 3 of 5
    assert int(out.loc[0, "n_bigrams"]) == 5
    assert out.loc[0, "top_bigram_frac"] == 0.6
    assert out.loc[1, "top_bigram_frac"] == pytest.approx(1 / 5, abs=1e-4)
    assert 2 not in out.index  # single word -> no bigrams -> omitted


def test_pii_scrub_crafted(tmp_path):
    texts = [
        "contact bob@example.com or alice@dev.example.org now",
        "server at 10.0.0.1 and 192.168.1.255, call 12345678 ref 999",
        "no pii here",
    ]
    sf = _write_docs(tmp_path, texts)
    out = curation.pii_scrub(sf).to_pandas().set_index("doc_id")
    assert out.loc[0, "n_emails"] == 2 and out.loc[0, "n_ipv4"] == 0
    assert out.loc[1, "n_ipv4"] == 2 and out.loc[1, "n_longnums"] == 1
    assert out.loc[2, ["n_emails", "n_ipv4", "n_longnums"]].sum() == 0
    assert out.loc[2, "clean_chars"] == len(texts[2])
    scrubbed0 = "contact [EMAIL] or [EMAIL] now"
    assert out.loc[0, "clean_chars"] == len(scrubbed0)
    scrubbed1 = "server at [IP] and [IP], call [NUM] ref 999"
    assert out.loc[1, "clean_chars"] == len(scrubbed1)


def _local_semdedup(sf: str, tau: float, n_cells: int) -> pd.DataFrame:
    """Single-node reference: same centroids, same assignment, same greedy."""
    C = curation.fit_spherical_centroids(sf, n_cells=n_cells)
    df = pd.read_parquet(f"{sf}/embeddings.parquet")
    V = np.stack([np.asarray(v, dtype=np.float64) for v in df["embedding"]])
    Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
    cells = np.argmax(Vn @ C.T, axis=1)
    ids = df["vec_id"].to_numpy(np.int64)
    parts = [
        curation.greedy_prune_cell(ids[cells == c], Vn[cells == c], tau)
        for c in np.unique(cells)
    ]
    return (
        pd.concat(parts, ignore_index=True)
        .sort_values("removed_id", ignore_index=True)
    )


def test_semdedup_matches_local_reference():
    got = curation.semdedup(SF, tau=0.4).to_pandas()
    want = _local_semdedup(SF, tau=0.4, n_cells=16)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False
    )


def test_semdedup_removes_planted_exact_duplicates(tmp_path):
    rng = np.random.default_rng(7)
    base = rng.normal(size=(40, 16)).astype(np.float32)
    # plant exact copies of vectors 0..4 as ids 40..44
    V = np.vstack([base, base[:5]])
    pd.DataFrame(
        {
            "vec_id": np.arange(len(V), dtype=np.int64),
            "embedding": [row for row in V],
            "label": np.int32(0),
        }
    ).to_parquet(tmp_path / "embeddings.parquet")
    out = curation.semdedup(str(tmp_path), tau=0.999, n_cells=4).to_pandas()
    # identical vectors always share a cell, so every copy is pruned
    assert set(out["removed_id"]) == {40, 41, 42, 43, 44}
    assert (out.set_index("removed_id")["keeper_id"] == [0, 1, 2, 3, 4]).all()
    assert (out["cos_sim"] >= 0.999).all()


def test_pack_token_shards_crafted_cross_bucket(tmp_path):
    # 10 docs x 5 tokens, one source; bucket_span=4 forces the prefix sum
    # across 3 buckets; shard_tokens=12 puts boundaries mid-bucket
    texts = [f"w{i} a b c d" for i in range(10)]
    sf = _write_docs(tmp_path, texts)
    out = curation.pack_token_shards(
        sf, shard_tokens=12, bucket_span=4
    ).to_pandas()
    # tokens before doc i = 5i -> shard = (5i) // 12
    assert out["doc_id"].tolist() == list(range(10))
    assert out["shard_idx"].tolist() == [(5 * i) // 12 for i in range(10)]
    assert (out["n_tokens"] == 5).all()


def test_pack_token_shards_multi_source(tmp_path):
    texts = ["one two three", "a b", "c d e f", "ten"]
    df = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": texts,
            "lang": "en",
            "source": ["s0", "s1", "s0", "s1"],
            "n_chars": [len(t) for t in texts],
        }
    )
    df.to_parquet(tmp_path / "documents.parquet")
    out = curation.pack_token_shards(
        str(tmp_path), shard_tokens=4, bucket_span=1
    ).to_pandas()
    got = {(r.source, r.doc_id): r.shard_idx for r in out.itertuples()}
    # s0: doc0 starts at 0 -> shard 0; doc2 starts at 3 -> shard 0
    # s1: doc1 starts at 0 -> shard 0; doc3 starts at 2 -> shard 0
    assert got == {("s0", 0): 0, ("s0", 2): 0, ("s1", 1): 0, ("s1", 3): 0}
    out2 = curation.pack_token_shards(
        str(tmp_path), shard_tokens=3, bucket_span=1
    ).to_pandas()
    got2 = {(r.source, r.doc_id): r.shard_idx for r in out2.itertuples()}
    assert got2[("s0", 2)] == 1  # 3 tokens before -> second shard


def _dedup_lines_brute(texts: list[str], seg_words: int = 10):
    """Reference: first occurrence (by doc, seg order) of each segment kept."""
    segs_of = []
    for t in texts:
        w = t.split(" ")
        segs_of.append(
            [" ".join(w[i : i + seg_words]) for i in range(0, len(w), seg_words)]
            or [""]
        )
    seen: dict[str, tuple[int, int]] = {}
    counts: dict[str, int] = {}
    for d, segs in enumerate(segs_of):
        for i, s in enumerate(segs):
            counts[s] = counts.get(s, 0) + 1
            seen.setdefault(s, (d, i))
    rows = []
    for d, segs in enumerate(segs_of):
        kept = [
            s
            for i, s in enumerate(segs)
            if counts[s] == 1 or seen[s] == (d, i)
        ]
        rows.append((d, " ".join(kept), len(kept), len(segs) - len(kept)))
    return pd.DataFrame(
        rows, columns=["doc_id", "text_clean", "n_kept", "n_dropped"]
    )


def test_dedup_lines_crafted_both_paths(tmp_path):
    dup_seg = " ".join(f"d{i}" for i in range(10))  # exactly one segment
    texts = [
        dup_seg + " " + " ".join(f"a{i}" for i in range(7)),  # seg0 dup, tail uniq
        " ".join(f"b{i}" for i in range(10)) + " " + dup_seg,  # dup at seg 1
        dup_seg,  # whole doc is the dup segment
        " ".join(f"c{i}" for i in range(25)),  # 3 unique segments
    ]
    sf = _write_docs(tmp_path, texts)
    ref = _dedup_lines_brute(texts)
    got_bcast = curation.dedup_lines(sf).to_pandas()
    pd.testing.assert_frame_equal(got_bcast, ref, check_dtype=False)
    # doc 0 keeps the dup segment (first occurrence); docs 1 and 2 lose it
    assert got_bcast.loc[0, "n_dropped"] == 0
    assert got_bcast.loc[1, "n_dropped"] == 1
    assert got_bcast.loc[2, "text_clean"] == "" and got_bcast.loc[2, "n_kept"] == 0
    # scale path: force the hash-join leg; identical output
    got_join = curation.dedup_lines(sf, broadcast_max_rows=0).to_pandas()
    pd.testing.assert_frame_equal(got_join, ref, check_dtype=False)


def test_mixture_schedule_crafted_weights(tmp_path):
    # 12 docs: 8 from s_a (weight 1), 4 from s_b (weight 2); doc_ids are
    # deliberately non-contiguous so rank != doc_id.
    ids = np.array([3, 7, 11, 15, 19, 23, 27, 31, 100, 104, 108, 112])
    src = ["s_a"] * 8 + ["s_b"] * 4
    pd.DataFrame(
        {
            "doc_id": ids.astype(np.int64),
            "text": [f"doc {i}" for i in ids],
            "lang": "en",
            "source": src,
            "n_chars": 10,
        }
    ).to_parquet(tmp_path / "documents.parquet")
    w = {"s_a": 1.0, "s_b": 2.0}
    out = curation.mixture_schedule(
        str(tmp_path), weights=w, bucket_span=4
    ).to_pandas()
    # brute force: pos = (1-based rank within source by doc_id - 0.5)/w
    ref = pd.DataFrame({"doc_id": ids, "source": src})
    ref["pos"] = (ref.groupby("source")["doc_id"].rank() - 0.5) / ref[
        "source"
    ].map(w)
    ref = ref.sort_values(["pos", "doc_id"], ignore_index=True)
    assert out["doc_id"].tolist() == ref["doc_id"].tolist()
    assert np.allclose(out["pos"], ref["pos"])
    # rate property: in pos interval [0, 2) each source s contributes
    # ~2*w_s docs — s_b (w=2) at 0.25/0.75/1.25/1.75, s_a (w=1) at 0.5/1.5
    head = out[out["pos"] < 2.0]["source"].tolist()
    assert head.count("s_b") == 4 and head.count("s_a") == 2


def test_mixture_schedule_default_rule_matches_oracle_shape():
    out = curation.mixture_schedule(SF).to_pandas()
    n_docs = len(pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"]))
    assert len(out) == n_docs
    assert out["pos"].is_monotonic_increasing
    # deterministic
    again = curation.mixture_schedule(SF).to_pandas()
    pd.testing.assert_frame_equal(out, again)


def test_stratified_sample_deterministic_and_bounded():
    out = curation.stratified_sample(SF, k=7).to_pandas()
    sizes = out.groupby("stratum").size()
    assert (sizes <= 7).all()
    again = curation.stratified_sample(SF, k=7).to_pandas()
    pd.testing.assert_frame_equal(out, again)
    # brute-force reference on the flat table (md5 ORACLE mode — the
    # production splitmix default is covered by the dual-path test)
    import hashlib as _h

    out = curation.stratified_sample(SF, k=7, bucket="md5").to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "source"])
    docs["h"] = [
        _h.md5(str(i).encode()).hexdigest() for i in docs["doc_id"]
    ]
    want = (
        docs.sort_values(["h", "doc_id"])
        .groupby("source")
        .head(7)[["source", "doc_id"]]
        .rename(columns={"source": "stratum"})
        .sort_values(["stratum", "doc_id"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(out.reset_index(drop=True), want)


def test_curate_corpus_end_to_end_and_resume(tmp_path):
    import hashlib as _h
    import json
    import os

    from dedupe_rust_ray.functions.textstats import quality_scores_batch

    # dup pair (1 kept), one low-quality doc (!!! spam fails punct+length)
    texts = [
        "the quick brown fox jumps over the lazy dog and it was good",
        "a different document with the usual words that it was for on are",
        "the quick brown fox jumps over the lazy dog and it was good",
        "!!!",
    ]
    df = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": texts,
            "lang": "en",
            "source": "s",
            "n_chars": [len(t) for t in texts],
        }
    )
    df.to_parquet(tmp_path / "documents.parquet")
    out = tmp_path / "out"
    s = curation.curate_corpus(str(tmp_path), str(out))

    # brute-force expectation: quality gate then keep min doc_id per text
    q = quality_scores_batch(df["text"])["quality_score"].to_numpy()
    passed = df[q >= 0.5]
    expect_kept = set(passed.groupby("text")["doc_id"].min())
    assert s["rows_in"] == 4
    assert s["rows_out"] == len(expect_kept)
    assert sum(s["per_split"].values()) == s["rows_out"]

    # output rows live under split=... dirs and carry the full row
    got_ids = set()
    for split in ("train", "val", "test"):
        d = out / "output" / f"split={split}"
        assert (d / "_manifest.json").exists()
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                part = pd.read_parquet(d / f)
                got_ids.update(part["doc_id"].tolist())
                assert {"doc_id", "text", "split"} <= set(part.columns)
    assert got_ids == expect_kept

    # resume: everything valid -> no stage re-runs (manifests untouched)
    mt = {
        p: os.path.getmtime(out / p / "_manifest.json")
        for p in ("keep_set", "output/split=train")
    }
    s2 = curation.curate_corpus(str(tmp_path), str(out), resume=True)
    assert s2 == s
    assert mt == {
        p: os.path.getmtime(out / p / "_manifest.json")
        for p in ("keep_set", "output/split=train")
    }

    # corrupt one split's manifest -> only that stage re-runs
    bad = out / "output" / "split=train" / "_manifest.json"
    m = json.loads(bad.read_text())
    m["complete"] = False
    bad.write_text(json.dumps(m))
    keep_mtime = os.path.getmtime(out / "keep_set" / "_manifest.json")
    s3 = curation.curate_corpus(str(tmp_path), str(out), resume=True)
    assert s3 == s
    assert os.path.getmtime(out / "keep_set" / "_manifest.json") == keep_mtime
    assert json.loads(bad.read_text())["complete"] is True


def test_embedding_clusters_matches_local_assignment():
    out = curation.embedding_clusters(SF, n_cells=8).to_pandas()
    C = curation.fit_spherical_centroids(SF, n_cells=8)
    df = pd.read_parquet(f"{SF}/embeddings.parquet")
    V = np.stack([np.asarray(v, dtype=np.float64) for v in df["embedding"]])
    Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
    sims = Vn @ C.T
    cells = np.argmax(sims, axis=1)
    ref = pd.DataFrame(
        {
            "vec_id": df["vec_id"].to_numpy(np.int64),
            "cell": cells.astype(np.int32),
            "cos_to_centroid": np.floor(
                sims[np.arange(len(cells)), cells] * 1e4 + 0.5
            )
            / 1e4,
        }
    ).sort_values("vec_id", ignore_index=True)
    pd.testing.assert_frame_equal(out.reset_index(drop=True), ref, check_dtype=False)
    # every vector appears exactly once
    assert out["vec_id"].is_unique and len(out) == len(df)


def test_semdedup_hot_cell_cap_bounds_work(tmp_path):
    """VERDICT r2 #5: a hot cell (here: ALL vectors collapse into one
    cell) must be sub-split at ``max_cell_rows`` so per-task work is
    O(cap**2), and the sub-split rule (round-robin by rank in sorted-vec_id order) must be exactly
    reproducible locally."""
    rng = np.random.default_rng(11)
    # one tight direction + tiny noise -> a single dominant cell
    base = rng.normal(size=16)
    V = (base + 0.01 * rng.normal(size=(30, 16))).astype(np.float32)
    pd.DataFrame(
        {
            "vec_id": np.arange(len(V), dtype=np.int64),
            "embedding": [row for row in V],
            "label": np.int32(0),
        }
    ).to_parquet(tmp_path / "embeddings.parquet")
    sf = str(tmp_path)
    cap = 8
    got = curation.semdedup(sf, tau=0.9, n_cells=2, max_cell_rows=cap).to_pandas()

    # local replica applying the identical assignment + sub-split rule
    # (round-robin by rank in sorted-id order — id-structure-proof)
    C = curation.fit_spherical_centroids(sf, n_cells=2)
    Vn = V.astype(np.float64)
    Vn = Vn / np.maximum(np.linalg.norm(Vn, axis=1, keepdims=True), 1e-12)
    cells = np.argmax(Vn @ C.T, axis=1)
    ids = np.arange(len(V), dtype=np.int64)
    parts = []
    for c in np.unique(cells):
        m = cells == c
        cid, cV = ids[m], Vn[m]
        if len(cid) <= cap:
            parts.append(curation.greedy_prune_cell(cid, cV, 0.9))
        else:
            n_sub = -(-len(cid) // cap)
            rank = np.empty(len(cid), np.int64)
            rank[np.argsort(cid, kind="stable")] = np.arange(len(cid))
            for s in range(n_sub):
                sm = rank % n_sub == s
                assert sm.sum() <= -(-len(cid) // n_sub)  # true bound
                parts.append(curation.greedy_prune_cell(cid[sm], cV[sm], 0.9))
    want = (
        pd.concat(parts, ignore_index=True)
        .sort_values("removed_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False
    )


def test_semdedup_output_unchanged_below_cap():
    """Default cap far above fixture cell sizes -> byte-identical output
    to an uncapped run (the round-2 behavior)."""
    a = curation.semdedup(SF, tau=0.4).to_pandas()
    b = curation.semdedup(SF, tau=0.4, max_cell_rows=10**9).to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_dedup_spans_overlap_merge_and_removal(tmp_path):
    # grams of 10 words; docs 0 and 1 share an 11-word run -> two
    # overlapping duplicated 10-grams that must merge into ONE removed
    # 11-word span; doc 2 is entirely unique
    shared = " ".join(f"s{i}" for i in range(11))
    texts = [
        shared + " " + " ".join(f"a{i}" for i in range(5)),
        " ".join(f"b{i}" for i in range(3)) + " " + shared,
        " ".join(f"u{i}" for i in range(20)),
    ]
    sf = _write_docs(tmp_path, texts)
    out = curation.dedup_spans(sf).to_pandas().set_index("doc_id")
    # doc 0: the 11 shared words removed, 5 unique kept
    assert out.loc[0, "n_removed_words"] == 11
    assert out.loc[0, "text_clean"] == " ".join(f"a{i}" for i in range(5))
    # doc 1: 3 unique kept, 11 removed
    assert out.loc[1, "n_removed_words"] == 11
    assert out.loc[1, "text_clean"] == " ".join(f"b{i}" for i in range(3))
    # doc 2 untouched
    assert out.loc[2, "n_removed_words"] == 0
    assert out.loc[2, "text_clean"] == texts[2]
    # deterministic
    again = curation.dedup_spans(sf).to_pandas().set_index("doc_id")
    pd.testing.assert_frame_equal(out, again)
    # scale path: force the union+bucket join leg; identical output
    joined = (
        curation.dedup_spans(sf, broadcast_max_rows=0)
        .to_pandas()
        .set_index("doc_id")
    )
    pd.testing.assert_frame_equal(out, joined, check_dtype=False)


def test_quality_weighted_sample_rate_proportionality(tmp_path):
    # docs with 0 tokens can never be kept; docs with >= 40 tokens always
    texts = (
        [""] * 5
        + [" ".join(f"w{i}" for i in range(50))] * 10  # 50 tokens: always
        + ["one two"] * 200  # 2/40 = 5% keep rate
    )
    sf = _write_docs(tmp_path, texts)
    out = curation.quality_weighted_sample(sf).to_pandas()
    kept = set(out["doc_id"])
    assert not kept & set(range(5))  # empty docs never kept
    assert set(range(5, 15)) <= kept  # full-rate docs always kept
    low = [d for d in kept if d >= 15]
    # binomial(200, 0.05): loose band
    assert 1 <= len(low) <= 30
    # deterministic
    again = curation.quality_weighted_sample(sf).to_pandas()
    pd.testing.assert_frame_equal(out, again)


def test_rewrite_operators_row_order_invariant(tmp_path):
    """dedup_lines / dedup_spans / mixture_schedule must not depend on the
    physical row order of the input file (winner selection is min-enc /
    set-membership / rank arithmetic, all order-free)."""
    rng = np.random.default_rng(3)
    dup_seg = " ".join(f"d{i}" for i in range(10))
    texts = [
        dup_seg + " " + " ".join(f"a{i}{j}" for i in range(7))
        for j in range(6)
    ] + [" ".join(f"u{i}{j}" for i in range(25)) for j in range(6)]
    ids = np.arange(len(texts), dtype=np.int64)

    def write(order, sub):
        df = pd.DataFrame(
            {
                "doc_id": ids[order],
                "text": np.array(texts, dtype=object)[order],
                "lang": "en",
                "source": [f"s{int(i) % 3}" for i in ids[order]],
                "n_chars": [len(texts[i]) for i in order],
            }
        )
        d = tmp_path / sub
        d.mkdir()
        df.to_parquet(d / "documents.parquet")
        return str(d)

    a = write(np.arange(len(texts)), "fwd")
    b = write(rng.permutation(len(texts)), "shuf")
    for fn in (
        curation.dedup_lines,
        curation.dedup_spans,
        curation.mixture_schedule,
    ):
        ga = fn(a).to_pandas().sort_values("doc_id", ignore_index=True)
        gb = fn(b).to_pandas().sort_values("doc_id", ignore_index=True)
        pd.testing.assert_frame_equal(ga, gb, check_dtype=False)
