"""Pytest oracles for queries whose semantics are not SQL-expressible
(the driver records only a rows-only check for these — SURVEY.md §5.2.3).

All run at sf0.001 for speed; semantic invariants are recomputed in
straight numpy/python and compared against the pipeline output."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_df():
    return pq.read_table(f"{SF}/documents.parquet").to_pandas()


def _trigrams(t):
    w = t.split()
    return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}


def test_minhash_lsh_matches_exact_jaccard(docs_df):
    """Every pair the sketch path reports at est>=0.7 must be a true
    high-Jaccard pair, and all planted (J>=0.9) pairs must be found."""
    from dedupe_rust_ray.pipelines.dedupe import minhash_lsh_dedup

    got = minhash_lsh_dedup(SF).to_pandas()
    grams = {r.doc_id: _trigrams(r.text) for r in docs_df.itertuples()}
    truth = set()
    ids = sorted(grams)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ga, gb = grams[a], grams[b]
            if ga and gb and len(ga & gb) / len(ga | gb) >= 0.9:
                truth.add((a, b))
    got_pairs = set(zip(got["doc_a"], got["doc_b"]))
    assert truth <= got_pairs  # full recall on planted near-dups
    for a, b in got_pairs:  # precision: est>=0.7 implies true J >= ~0.5
        ga, gb = grams[a], grams[b]
        assert len(ga & gb) / len(ga | gb) >= 0.5


def test_simhash_pairs_verified(docs_df):
    from dedupe_rust_ray.functions.simhash import hamming64, simhash_signatures
    from dedupe_rust_ray.pipelines.dedupe import simhash_near_dups

    got = simhash_near_dups(SF).to_pandas()
    sh = simhash_signatures(docs_df["text"].tolist(), shingle_k=3, mode="word")
    by_id = dict(zip(docs_df["doc_id"], sh))
    for r in got.itertuples():
        hd = hamming64(
            np.array([by_id[r.doc_a]]), np.array([by_id[r.doc_b]])
        )[0]
        assert hd == r.hamming and hd <= 8


def test_knn_lsh_recall_vs_brute_force():
    from dedupe_rust_ray.pipelines.similarity import knn_lsh, knn_topk

    exact = knn_topk(SF)
    approx = knn_lsh(SF)
    e = set(zip(exact["query_id"], exact["neighbor_id"]))
    a = set(zip(approx["query_id"], approx["neighbor_id"]))
    recall = len(e & a) / len(e)
    assert recall >= 0.25, recall  # 6-bit x 8-table LSH on random vectors
    # every reported sim must match the exact sim for that pair
    em = {(q, n): s for q, n, s in exact.itertuples(index=False)}
    for q, n, s in approx.itertuples(index=False):
        if (q, n) in em:
            assert abs(em[(q, n)] - s) < 1e-6


def test_media_dims_census_matches_generator():
    """Census equals what the deterministic generator implies — and the
    parsers, not the metadata, produced it."""
    from dedupe_rust_ray.pipelines.multimodal import media_dims_census
    from dedupe_rust_ray.stages.multimodal import _DIM_CHOICES, _FORMATS

    got = media_dims_census(SF).to_pandas()
    ids = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])[
        "doc_id"
    ].to_numpy()
    from collections import Counter

    want = Counter()
    for d in ids:
        d = int(d)
        fmt = _FORMATS[d % len(_FORMATS)]
        w, h = _DIM_CHOICES[(d // len(_FORMATS)) % len(_DIM_CHOICES)]
        want[(fmt, w, h)] += 1
    got_c = {
        (r.fmt, r.width, r.height): r.n for r in got.itertuples()
    }
    assert got_c == dict(want)


def test_media_features_decode_policy():
    from dedupe_rust_ray.pipelines.multimodal import media_features

    got = media_features(SF).to_pandas()
    # every synthesized format (BMP/PNG/GIF/baseline JPEG/VP8L WebP)
    # decodes for real
    assert (got["ok"] == (got["err"] == "")).all()
    assert got["ok"].all()
    assert set(got["fmt"]) == {"bmp", "png", "gif", "jpeg", "webp"}
    assert (got["mean_brightness"] > 0).all()
    assert (got["width"] > 0).all()


def test_media_decode_flags_unsupported_payloads():
    """Warn-and-skip policy: rows outside the supported decode profiles
    carry err columns, never raise (/root/reference/src/main.rs:674-680)."""
    import pyarrow as pa

    from dedupe_rust_ray.stages.multimodal import MediaDecode

    payloads = [
        b"II*\x00....",            # TIFF magic: no decoder
        b"\xff\xd8\xff\xd9",        # JPEG with no frame: decode fails
        b"GIF87a\x00",              # truncated GIF
    ]
    batch = pa.table(
        {
            "media_id": ["a", "b", "c"],
            "fmt": ["tiff", "jpeg", "gif"],
            "payload": pa.array(payloads, type=pa.binary()),
        }
    )
    out = MediaDecode()(batch).to_pandas()
    assert (~out["ok"]).all()
    assert out["err"].str.startswith("decode_").all()


def test_quality_filter_subset():
    from dedupe_rust_ray.pipelines.textpipe import quality_filter, quality_scores

    kept = quality_filter(SF, min_score=0.5).to_pandas()
    assert (kept["quality_score"] >= 0.5).all()


def test_lang_id_census_partition(docs_df):
    from dedupe_rust_ray.pipelines.textpipe import lang_id_census

    got = lang_id_census(SF).to_pandas()
    assert got["n"].sum() == len(docs_df)


def test_file_dedupe_query_finds_planted_copies():
    """Every doc_id % 7 == 0 file was written twice (base + dups/ copy);
    both must land in the same group. GIF/JPEG header-only payloads are
    byte-identical per (fmt, dims) by construction, so cross-doc groups
    are expected — but a planted copy must ALWAYS group with its base."""
    from dedupe_rust_ray.pipelines.filededupe import file_dedupe_query

    groups = file_dedupe_query(SF)
    by_path = dict(zip(groups["path"], groups["group_id"]))
    planted = [p for p in by_path if p.startswith("dups/")]
    assert planted, "no planted copies found in groups"
    for copy in planted:
        base = copy.replace("dups/", "").replace("-copy", "")
        assert by_path[copy] == by_path.get(base), (copy, base)


def test_fingerprint_dedup_keeps_distinct(docs_df):
    from dedupe_rust_ray.pipelines.textpipe import fingerprint_dedup

    got = fingerprint_dedup(SF).to_pandas()
    # at most one kept doc per distinct text; identical texts never both kept
    assert len(got) <= docs_df["text"].nunique()


def test_dedupe_join_path_matches_broadcast_path():
    """The hash-join (scale) verification plan must produce exactly the
    broadcast plan's output for both sketch and exact-trigram dedup."""
    from dedupe_rust_ray.pipelines.dedupe import (
        minhash_lsh_dedup,
        ngram_jaccard_dedup,
    )

    mh_b = minhash_lsh_dedup(SF, scale_path="broadcast").to_pandas()
    mh_j = minhash_lsh_dedup(SF, scale_path="join").to_pandas()
    pd.testing.assert_frame_equal(
        mh_b.reset_index(drop=True), mh_j.reset_index(drop=True)
    )

    ng_b = ngram_jaccard_dedup(SF, scale_path="broadcast")
    ng_j = ngram_jaccard_dedup(SF, scale_path="join")
    pd.testing.assert_frame_equal(
        ng_b.reset_index(drop=True), ng_j.reset_index(drop=True)
    )


def test_media_thumbnails_and_frame_sample():
    from dedupe_rust_ray.pipelines.multimodal import (
        media_thumbnails,
        video_frame_sample,
    )

    th = media_thumbnails(SF).to_pandas()
    assert len(th) == 500
    # every synthesized format decodes and produces a real PNG thumbnail
    assert (th["err"] == "").all()
    assert set(th["fmt"]) == {"bmp", "png", "gif", "jpeg", "webp"}
    assert (th["thumb_bytes"] > 50).all()

    fr = video_frame_sample(SF).to_pandas()
    assert len(fr) > 0
    assert (fr["decoder"] == "synthetic").all()
    # frames are 16x16 float32
    assert (fr["frame_bytes"] == 16 * 16 * 4).all()
    # frame indices respect the sampling stride
    assert (fr["frame_idx"] % 10 == 0).all()


def test_knn_ivf_recall_vs_brute_force():
    from dedupe_rust_ray.pipelines.similarity import knn_ivf, knn_topk

    exact = knn_topk(SF)
    approx = knn_ivf(SF)
    e = set(zip(exact["query_id"], exact["neighbor_id"]))
    a = set(zip(approx["query_id"], approx["neighbor_id"]))
    recall = len(e & a) / len(e)
    # n_probe=4 of 16 cells on random vectors; clustered real embeddings
    # fare far better (same caveat as knn_lsh)
    assert recall >= 0.25, recall
    # every reported sim must equal the exact sim for that pair
    em = {(q, n): s for q, n, s in exact.itertuples(index=False)}
    for q, n, s in approx.itertuples(index=False):
        if (q, n) in em:
            assert abs(em[(q, n)] - s) < 1e-6


def test_media_phash_cross_format_invariance():
    """Pixel-identical images must hash identically through different
    container formats (PNG vs BMP), and a single flipped region must
    change the hash — the property image-dedup blocking keys on."""
    import numpy as np
    import pyarrow as pa

    from dedupe_rust_ray.stages.multimodal import (
        MediaPhash,
        encode_bmp,
        encode_png,
        encode_webp,
    )

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (48, 64)).astype(np.uint8)
    other = px.copy()
    other[:24, :32] = 255 - other[:24, :32]
    batch = pa.table(
        {
            "media_id": pa.array(["a-png", "a-bmp", "a-webp", "b-png"]),
            "fmt": pa.array(["png", "bmp", "webp", "png"]),
            "payload": pa.array(
                [encode_png(px), encode_bmp(px), encode_webp(px),
                 encode_png(other)],
                type=pa.binary(),
            ),
        }
    )
    out = MediaPhash()(batch).to_pandas()
    assert out["ok"].all()
    assert out.loc[0, "phash"] == out.loc[1, "phash"]
    assert out.loc[0, "phash"] == out.loc[2, "phash"]
    assert out.loc[0, "phash"] != out.loc[3, "phash"]


def test_media_phash_query_rows_and_determinism():
    from dedupe_rust_ray.pipelines.multimodal import media_phash

    a = media_phash("/root/testdata/sf0.001").to_pandas()
    b = media_phash("/root/testdata/sf0.001").to_pandas()
    assert len(a) == 500 and a["ok"].all()
    assert a["phash"].nunique() > 400  # noise payloads: hashes spread out
    assert a.equals(b)


def test_simhash_blocking_complete_at_low_hamming(docs_df):
    """Pigeonhole EXACTNESS: with 4 disjoint 16-bit chunks, any pair at
    Hamming distance <= 3 differs in at most 3 chunks, so at least one
    chunk matches and the pair MUST be nominated. Brute-force all pairs
    and assert the query returns every pair with hd <= 3 (completeness —
    the existing test checks soundness only)."""
    import numpy as np

    from dedupe_rust_ray.functions.simhash import simhash_signatures
    from dedupe_rust_ray.pipelines.dedupe import simhash_near_dups

    got = simhash_near_dups(SF, max_hamming=3).to_pandas()
    got_pairs = set(zip(got["doc_a"], got["doc_b"]))
    sh = simhash_signatures(docs_df["text"].tolist(), shingle_k=3, mode="word")
    ids = docs_df["doc_id"].to_numpy()
    xor = sh[:, None] ^ sh[None, :]
    hd = np.zeros(xor.shape, dtype=np.int64)
    v = xor.copy()
    while v.any():
        hd += (v & np.uint64(1)).astype(np.int64)
        v >>= np.uint64(1)
    ai, bi = np.nonzero(np.triu(hd <= 3, k=1))
    want_pairs = {
        (min(ids[a], ids[b]), max(ids[a], ids[b])) for a, b in zip(ai, bi)
    }
    assert want_pairs <= got_pairs, want_pairs - got_pairs
    assert all(r.hamming <= 3 for r in got.itertuples())
