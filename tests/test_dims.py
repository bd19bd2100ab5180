"""Dimension parsers (M2-M7) against synthesized binary headers —
the reference only has an empty test stub here (dimensions.rs:197-204)."""

import struct

import numpy as np

from dedupe_rust_ray.stages.dims import (
    bmp_dims,
    gif_dims,
    jpeg_dims,
    png_dims,
    probe_dims,
    sniff_format,
    webp_dims,
)
from dedupe_rust_ray.stages.multimodal import (
    encode_bmp,
    encode_gif_header,
    encode_jpeg_markers,
    encode_png,
)


def test_png_dims():
    data = encode_png(np.zeros((24, 17), dtype=np.uint8))
    assert png_dims(data) == (17, 24)
    assert png_dims(b"\x89PNG\r\n\x1a\n" + b"XXXX") is None
    assert png_dims(b"junk") is None


def test_gif_dims():
    assert gif_dims(encode_gif_header(320, 200)) == (320, 200)
    assert gif_dims(b"GIF") is None
    assert gif_dims(b"NOPE" + b"\x00" * 10) is None


def test_bmp_dims():
    data = encode_bmp(np.zeros((12, 34), dtype=np.uint8))
    assert bmp_dims(data) == (34, 12)
    # top-down BMP stores negative height
    neg = bytearray(data)
    neg[22:26] = struct.pack("<i", -12)
    assert bmp_dims(bytes(neg)) == (34, 12)


def test_jpeg_dims_sof_scan():
    data = encode_jpeg_markers(641, 483)
    assert jpeg_dims(data) == (641, 483)
    # SOF after a DHT (0xC4) segment, which must be skipped not treated as SOF
    dht = b"\xff\xc4" + struct.pack(">H", 4) + b"\x00\x00"
    with_dht = data[:2] + dht + data[2:]
    assert jpeg_dims(with_dht) == (641, 483)
    assert jpeg_dims(b"\xff\xd8\xff\xd9") is None
    # dimension sanity bound (dimensions.rs:72-73): 0 or >= 30000 rejected
    bad = encode_jpeg_markers(30001, 10)
    assert jpeg_dims(bad) is None


def _webp_vp8(w, h):
    payload = b"\x00" * 6 + struct.pack("<HH", w, h)
    return b"RIFF" + struct.pack("<I", 4 + 8 + len(payload)) + b"WEBP" + b"VP8 " + struct.pack("<I", len(payload)) + payload


def _webp_vp8l(w, h):
    bits = (w - 1) | ((h - 1) << 14)
    payload = b"\x2f" + struct.pack("<I", bits)
    return b"RIFF" + struct.pack("<I", 4 + 8 + len(payload)) + b"WEBP" + b"VP8L" + struct.pack("<I", len(payload)) + payload


def _webp_vp8x(w, h):
    payload = b"\x00" * 4 + (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little")
    return b"RIFF" + struct.pack("<I", 4 + 8 + len(payload)) + b"WEBP" + b"VP8X" + struct.pack("<I", len(payload)) + payload


def test_webp_variants():
    assert webp_dims(_webp_vp8(400, 300)) == (400, 300)
    assert webp_dims(_webp_vp8l(257, 129)) == (257, 129)
    assert webp_dims(_webp_vp8x(1024, 768)) == (1024, 768)
    assert webp_dims(b"RIFFxxxxNOPE") is None


def test_probe_dispatch_and_sniff():
    png = encode_png(np.zeros((8, 8), dtype=np.uint8))
    assert probe_dims("png", png) == (8, 8)
    assert probe_dims("PNG", png) == (8, 8)  # case-insensitive dispatch
    assert probe_dims("tiff", png) is None  # unsupported format
    assert sniff_format(png) == "png"
    assert sniff_format(encode_gif_header(2, 2)) == "gif"
    assert sniff_format(encode_jpeg_markers(2, 2)) == "jpeg"
    assert sniff_format(_webp_vp8(4, 4)) == "webp"
    assert sniff_format(b"garbage") is None
