"""Unit tests for the vectorized signature kernels (SURVEY.md §5.2 item 1)."""

import numpy as np
import pytest

from dedupe_rust_ray.functions.imagehash import dct_matrix, dhash_batch, phash_batch
from dedupe_rust_ray.functions.minhash import (
    estimate_jaccard,
    lsh_band_hashes,
    minhash_signatures,
)
from dedupe_rust_ray.functions.shingles import (
    char_shingle_hashes,
    segment_min,
    word_shingle_hashes,
)
from dedupe_rust_ray.functions.simhash import hamming64, simhash_signatures
from dedupe_rust_ray.sources.corpus import media_payload

T1 = "the quick brown fox jumps over the lazy dog and runs far away tonight"
T2 = T1.replace("quick", "quack")
T3 = "completely different content about columnar query engines and shuffles"


def test_char_shingles_counts():
    win, off = char_shingle_hashes(["abcdef", "ab", ""], k=3)
    assert off.tolist() == [0, 4, 4, 4]  # 6-3+1 windows, then none, none
    assert len(win) == 4


def test_word_shingles_counts():
    win, off = word_shingle_hashes(["a b c d", "a b", ""], n=3)
    assert off.tolist() == [0, 2, 2, 2]


def test_segment_min_empty_segments():
    win = np.array([5, 3, 9], dtype=np.uint64)
    off = np.array([0, 2, 2, 3])
    out = segment_min(win, off)
    assert out[0] == 3
    assert out[1] == np.uint64(0xFFFFFFFFFFFFFFFF)
    assert out[2] == 9


def test_minhash_jaccard_sanity():
    sig = minhash_signatures([T1, T2, T3, T1], num_perm=128, shingle_k=5)
    assert (sig[0] == sig[3]).all()  # identical text -> identical signature
    near = estimate_jaccard(sig[0:1], sig[1:2])[0]
    far = estimate_jaccard(sig[0:1], sig[2:3])[0]
    assert near > 0.7
    assert far < 0.2


def test_minhash_deterministic_across_calls():
    a = minhash_signatures([T1], num_perm=64, shingle_k=5)
    b = minhash_signatures([T1], num_perm=64, shingle_k=5)
    assert (a == b).all()


def test_lsh_bands_collide_for_near_dups():
    sig = minhash_signatures([T1, T2, T3], num_perm=128, shingle_k=5)
    bands = lsh_band_hashes(sig, 16)
    assert (bands[0] == bands[1]).sum() >= 1  # near dup shares >=1 band
    assert (bands[0] == bands[2]).sum() == 0


def test_simhash_hamming():
    sh = simhash_signatures([T1, T2, T3])
    assert hamming64(sh[0:1], sh[1:2])[0] <= 8
    assert hamming64(sh[0:1], sh[2:3])[0] >= 15


def test_dct_matrix_orthonormal():
    d = dct_matrix(16)
    assert np.allclose(d @ d.T, np.eye(16), atol=1e-10)


def test_phash_noise_robust_and_discriminative():
    base = media_payload("media://deadbeefdeadbeef")
    noisy = media_payload("media://deadbeefdeadbeef.n1")
    other = media_payload("media://0123456789abcdef")
    h = phash_batch(np.stack([base, noisy, other]))
    assert hamming64(h[0:1], h[1:2])[0] <= 10
    assert hamming64(h[0:1], h[2:3])[0] >= 16


def test_dhash_batch_shapes():
    imgs = np.stack([media_payload(f"media://{i:016x}") for i in range(5)])
    h = dhash_batch(imgs)
    assert h.shape == (5,)
    assert len(set(h.tolist())) == 5  # distinct payloads -> distinct hashes


def test_media_payload_deterministic():
    a = media_payload("media://00aa00aa00aa00aa")
    b = media_payload("media://00aa00aa00aa00aa")
    assert np.array_equal(a, b)
