"""Baseline JPEG codec round-trip and robustness tests (stages/jpeg.py).

The reference hashes decoded pixels for every format via image::open
(/root/reference/src/main.rs:593-681); these tests pin the JPEG leg of
that parity: encode -> decode reproduces the source image within normal
quality-50 quantization error, dimensions survive in the SOF header, and
malformed / non-baseline streams return None instead of raising.
"""

import numpy as np
import pytest

from dedupe_rust_ray.stages.dims import jpeg_dims, sniff_format
from dedupe_rust_ray.stages.jpeg import decode_jpeg, encode_jpeg


def _smooth(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return ((np.sin(yy / 7) + np.cos(xx / 9)) * 60 + 128).clip(0, 255).astype(np.uint8)


@pytest.mark.parametrize("h,w", [(8, 8), (16, 16), (17, 23), (64, 64), (1, 1), (5, 3)])
def test_roundtrip_smooth(h, w):
    px = _smooth(h, w)
    data = encode_jpeg(px)
    assert sniff_format(data) == "jpeg"
    assert jpeg_dims(data) == (w, h)
    out = decode_jpeg(data)
    assert out is not None and out.shape == (h, w)
    # smooth content survives quality-50 quantization nearly exactly
    assert np.abs(out - px.astype(np.float32)).mean() < 3.0


def test_roundtrip_noise_bounded_error():
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(px))
    assert out is not None and out.shape == (32, 32)
    # white noise is the worst case for DCT quantization; error stays
    # bounded well inside a gray-level quadrant
    assert np.abs(out - px.astype(np.float32)).mean() < 25.0


def test_flat_image_exact():
    px = np.full((24, 24), 137, np.uint8)
    out = decode_jpeg(encode_jpeg(px))
    assert out is not None
    # flat fields survive to within one DC quantization level
    assert np.abs(out - 137.0).max() <= 2.0
    assert out.std() == 0.0


def test_decoder_rejects_garbage_not_raises():
    assert decode_jpeg(b"") is None
    assert decode_jpeg(b"\xff\xd8") is None
    assert decode_jpeg(b"\xff\xd8\xff\xd9") is None
    assert decode_jpeg(b"not a jpeg at all") is None
    # valid stream truncated mid-scan -> None, no exception
    data = encode_jpeg(_smooth(32, 32))
    assert decode_jpeg(data[: len(data) // 2]) is None


def test_decoder_rejects_progressive_sof():
    data = bytearray(encode_jpeg(_smooth(16, 16)))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    assert decode_jpeg(bytes(data)) is None


def test_decoder_tolerates_restart_markers_and_stuffing():
    # encoder emits stuffed 0xFF00 inside the scan whenever a code byte
    # lands on 0xFF; round-tripping many random images exercises it
    rng = np.random.default_rng(3)
    for _ in range(5):
        px = rng.integers(0, 256, (16, 16)).astype(np.uint8)
        assert decode_jpeg(encode_jpeg(px)) is not None
