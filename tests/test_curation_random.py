"""Randomized cross-validation of curation operators against brute-force
references (fixed seeds — deterministic, no flake)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from dedupe_rust_ray.pipelines import curation


def _random_docs(tmp_path, seed: int, n: int = 120):
    rng = np.random.default_rng(seed)
    vocab = np.array([f"t{i}" for i in range(30)])  # tiny vocab -> shared grams
    lens = rng.integers(2, 40, size=n)
    texts = [" ".join(vocab[rng.integers(0, 30, size=l)]) for l in lens]
    # sprinkle exact duplicates
    for j in rng.integers(1, n, size=n // 10):
        texts[j] = texts[j - 1]
    pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": texts,
            "lang": "en",
            "source": [f"s{i % 3}" for i in range(n)],
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    return texts


def _grams(t: str, n: int) -> set[str]:
    w = t.split()
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_dup_ngram_spans_random(tmp_path, seed):
    texts = _random_docs(tmp_path, seed)
    n = 4  # short grams so collisions across docs actually occur
    out = curation.dup_ngram_spans(str(tmp_path), n=n).to_pandas()
    got = dict(zip(out["doc_id"], out["n_dup_grams"]))
    gs = [_grams(t, n) for t in texts]
    want = {}
    for d, g in enumerate(gs):
        other = set().union(*(h for i, h in enumerate(gs) if i != d))
        k = len(g & other)
        if k:
            want[d] = k
    assert got == want


@pytest.mark.parametrize("seed", [4, 5])
def test_pack_token_shards_random(tmp_path, seed):
    texts = _random_docs(tmp_path, seed)
    out = curation.pack_token_shards(
        str(tmp_path), shard_tokens=64, bucket_span=16
    ).to_pandas()
    df = pd.DataFrame(
        {
            "doc_id": np.arange(len(texts)),
            "source": [f"s{i % 3}" for i in range(len(texts))],
            "n_tokens": [len(t.split()) for t in texts],
        }
    ).sort_values(["source", "doc_id"])
    df["before"] = df.groupby("source")["n_tokens"].cumsum() - df["n_tokens"]
    df["shard_idx"] = df["before"] // 64
    want = df[["source", "doc_id", "n_tokens", "shard_idx"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), want, check_dtype=False
    )


@pytest.mark.parametrize("seed", [6, 7])
def test_decontaminate_random(tmp_path, seed):
    texts = _random_docs(tmp_path, seed)
    n = 3
    out = curation.decontaminate(str(tmp_path), benchmark_max_id=10, n=n).to_pandas()
    bench = set().union(*(_grams(t, n) for t in texts[:10]))
    want = {}
    for d in range(10, len(texts)):
        k = len(_grams(texts[d], n) & bench)
        if k:
            want[d] = k
    assert dict(zip(out["doc_id"], out["n_contaminated_grams"])) == want
