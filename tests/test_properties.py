"""Property-based tests (hypothesis) for the pure kernels
(SURVEY.md §5.2.4)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from dedupe_rust_ray.functions.minhash import estimate_jaccard, minhash_signatures
from dedupe_rust_ray.functions.simhash import hamming64, popcount64
from dedupe_rust_ray.functions.strsim import jaro_winkler, levenshtein_bounded
from dedupe_rust_ray.state.unionfind import UnionFind, driver_connected_components

words = st.lists(
    st.sampled_from("alpha beta gamma delta epsilon zeta eta theta".split()),
    min_size=0,
    max_size=60,
)


@settings(max_examples=30, deadline=None)
@given(words, words)
def test_minhash_estimate_tracks_exact_jaccard(wa, wb):
    ta, tb = " ".join(wa), " ".join(wb)
    sig = minhash_signatures([ta, tb], num_perm=128, shingle_k=3, mode="word")
    est = float(estimate_jaccard(sig[0:1], sig[1:2])[0])

    def grams(ws):
        return {tuple(ws[i : i + 3]) for i in range(len(ws) - 2)}

    ga, gb = grams(wa), grams(wb)
    if not ga and not gb:
        return  # both empty -> sentinel signatures
    exact = len(ga & gb) / len(ga | gb) if (ga | gb) else 0.0
    assert abs(est - exact) <= 0.25  # 128-perm sketch tolerance


@settings(max_examples=50, deadline=None)
@given(st.text(max_size=30), st.text(max_size=30))
def test_levenshtein_symmetry_and_bounds(a, b):
    d = levenshtein_bounded(a, b, 100)
    assert d == levenshtein_bounded(b, a, 100)
    assert d <= max(len(a), len(b))
    assert (d == 0) == (a == b)


@settings(max_examples=50, deadline=None)
@given(st.text(max_size=30), st.text(max_size=30))
def test_jaro_winkler_range_and_identity(a, b):
    s = jaro_winkler(a, b)
    assert 0.0 <= s <= 1.0
    if a == b and a:
        assert s == 1.0


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(0, 2**64 - 1), min_size=1, max_size=50))
def test_popcount_matches_python(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert popcount64(arr).tolist() == [bin(v).count("1") for v in vals]
    assert (hamming64(arr, arr) == 0).all()


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=0,
        max_size=80,
    )
)
def test_unionfind_matches_naive_components(pairs):
    import pandas as pd

    edges = pd.DataFrame(
        {"doc_a": [f"n{a:02d}" for a, _ in pairs],
         "doc_b": [f"n{b:02d}" for _, b in pairs]}
    )
    if not len(edges):
        return
    got = dict(
        zip(*(lambda df: (df["doc_id"], df["cluster_id"]))(
            driver_connected_components(edges)
        ))
    )
    # naive fixpoint reference
    comp = {}
    for a, b in pairs:
        comp.setdefault(f"n{a:02d}", {f"n{a:02d}"})
        comp.setdefault(f"n{b:02d}", {f"n{b:02d}"})
    changed = True
    adj = {}
    for a, b in pairs:
        adj.setdefault(f"n{a:02d}", set()).add(f"n{b:02d}")
        adj.setdefault(f"n{b:02d}", set()).add(f"n{a:02d}")
    label = {n: n for n in adj}
    while changed:
        changed = False
        for n in adj:
            m = min([label[n]] + [label[x] for x in adj[n]])
            if m < label[n]:
                label[n] = m
                changed = True
    assert got == label


@settings(max_examples=25, deadline=None)
@given(
    st.integers(1, 40),
    st.integers(1, 40),
    st.integers(0, 2**32 - 1),
)
def test_png_encode_decode_roundtrip_property(h, w, seed):
    import numpy as np

    from dedupe_rust_ray.stages.multimodal import decode_png, encode_png

    px = np.random.default_rng(seed).integers(0, 256, (h, w)).astype(np.uint8)
    out = decode_png(encode_png(px))
    assert out is not None and out.shape == (h, w)
    assert (out.astype(np.uint8) == px).all()


@settings(max_examples=25, deadline=None)
@given(
    st.integers(1, 30),
    st.integers(1, 30),
    st.integers(0, 2**32 - 1),
)
def test_gif_encode_decode_roundtrip_property(h, w, seed):
    import numpy as np

    from dedupe_rust_ray.stages.multimodal import decode_gif, encode_gif

    px = np.random.default_rng(seed).integers(0, 256, (h, w)).astype(np.uint8)
    out = decode_gif(encode_gif(px))
    assert out is not None and out.shape == (h, w)
    assert np.allclose(out, px.astype(np.float32), atol=0.51)


@settings(max_examples=40, deadline=None)
@given(st.binary(max_size=200))
def test_decoders_never_raise_on_garbage(data):
    from dedupe_rust_ray.stages.dims import heic_dims, probe_dims, sniff_format
    from dedupe_rust_ray.stages.multimodal import decode_bmp, decode_gif, decode_png

    # warn-and-skip policy: arbitrary bytes may return None, never raise
    for fn in (decode_png, decode_gif, decode_bmp, heic_dims):
        fn(data)
    fmt = sniff_format(data)
    if fmt:
        probe_dims(fmt, data)


@settings(max_examples=25, deadline=None)
@given(
    st.integers(1, 40),
    st.integers(1, 40),
    st.integers(0, 2**32 - 1),
)
def test_webp_encode_decode_roundtrip_property(h, w, seed):
    import numpy as np

    from dedupe_rust_ray.stages.dims import sniff_format, webp_dims
    from dedupe_rust_ray.stages.webp import decode_webp, encode_webp

    px = np.random.default_rng(seed).integers(0, 256, (h, w)).astype(np.uint8)
    data = encode_webp(px)
    # container must satisfy the independently-written header parser
    assert sniff_format(data) == "webp"
    assert webp_dims(data) == (w, h)
    out = decode_webp(data)
    assert out is not None and out.shape == (h, w)
    assert (out == px).all()  # VP8L is lossless


@settings(max_examples=40, deadline=None)
@given(st.binary(max_size=200))
def test_webp_decoder_never_raises_on_garbage(data):
    from dedupe_rust_ray.stages.webp import decode_webp

    decode_webp(data)
    decode_webp(b"RIFF\x00\x00\x00\x00WEBPVP8L\x00\x00\x00\x00\x2f" + data)


def test_webp_general_path_simple_codes_and_unsupported_profiles():
    """Exercise the sequential decode path (foreign-stream shape): a
    two-symbol simple green code, plus the documented refusals."""
    import numpy as np

    from dedupe_rust_ray.stages import webp as W

    # hand-rolled stream: 4x1, subtract-green, simple 2-symbol green code
    # (values 7 and 9), 0-bit red/blue/alpha/distance -> gray 7/9 pixels
    bw = W._BitWriter()
    bw.write(3, 14)  # w-1
    bw.write(0, 14)  # h-1
    bw.write(0, 1)   # alpha hint
    bw.write(0, 3)   # version
    bw.write(1, 1)   # transform present
    bw.write(2, 2)   # SUBTRACT_GREEN
    bw.write(0, 1)   # no more transforms
    bw.write(0, 1)   # no color cache
    bw.write(0, 1)   # no meta huffman
    bw.write(1, 1)   # green: simple
    bw.write(1, 1)   # two symbols
    bw.write(1, 1)   # first symbol in 8 bits
    bw.write(7, 8)   # symbol0 = 7
    bw.write(9, 8)   # symbol1 = 9
    for sym in (0, 0, 255, 0):  # red, blue, alpha, distance: single-symbol
        W._simple_code_bits(bw, sym)
    # pixels: 7, 9, 9, 7 -> canonical: 7 -> code 0, 9 -> code 1
    for bit in (0, 1, 1, 0):
        bw.write_code(bit, 1)
    payload = b"\x2f" + np.packbits(
        np.asarray(bw.bits, np.uint8), bitorder="little"
    ).tobytes()
    data = (
        b"RIFF" + (len(payload) + 12).to_bytes(4, "little") + b"WEBP"
        + b"VP8L" + len(payload).to_bytes(4, "little") + payload
    )
    out = W.decode_webp(data)
    assert out is not None and out.shape == (1, 4)
    assert out.tolist() == [[7, 9, 9, 7]]

    # unsupported: predictor transform -> None (flagged upstream)
    bw2 = W._BitWriter()
    bw2.write(0, 14); bw2.write(0, 14); bw2.write(0, 1); bw2.write(0, 3)
    bw2.write(1, 1); bw2.write(0, 2)  # PREDICTOR transform
    p2 = b"\x2f" + np.packbits(
        np.asarray(bw2.bits + [0] * 64, np.uint8), bitorder="little"
    ).tobytes()
    d2 = (
        b"RIFF" + (len(p2) + 12).to_bytes(4, "little") + b"WEBP"
        + b"VP8L" + len(p2).to_bytes(4, "little") + p2
    )
    assert W.decode_webp(d2) is None
