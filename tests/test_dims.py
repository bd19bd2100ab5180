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


def test_png_roundtrip_all_filters():
    import numpy as np
    import struct
    import zlib

    from dedupe_rust_ray.stages.multimodal import decode_png, encode_png

    rng = np.random.default_rng(42)
    px = rng.integers(0, 256, (24, 17)).astype(np.uint8)
    out = decode_png(encode_png(px))
    assert out is not None and out.shape == (24, 17)
    assert (out.astype(np.uint8) == px).all()

    # hand-build a PNG using every filter type (1,2,3,4) and verify the
    # defilter logic reproduces the pixels
    h, w = 6, 9
    px = rng.integers(0, 256, (h, w)).astype(np.uint8)
    recon = px.astype(np.int64)
    lines = bytearray()
    for r, f in enumerate([0, 1, 2, 3, 4, 2]):
        cur = recon[r]
        up = recon[r - 1] if r else np.zeros(w, np.int64)
        if f == 0:
            enc = cur
        elif f == 1:
            enc = (cur - np.r_[0, cur[:-1]]) & 0xFF
        elif f == 2:
            enc = (cur - up) & 0xFF
        elif f == 3:
            enc = (cur - ((np.r_[0, cur[:-1]] + up) >> 1)) & 0xFF
        else:
            enc = np.zeros(w, np.int64)
            for i in range(w):
                a = cur[i - 1] if i else 0
                b, c = up[i], (up[i - 1] if i else 0)
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
                enc[i] = (cur[i] - pred) & 0xFF
        lines += bytes([f]) + bytes(enc.astype(np.uint8))

    def chunk(tag, payload):
        c = tag + payload
        return struct.pack(">I", len(payload)) + c + struct.pack(
            ">I", zlib.crc32(c) & 0xFFFFFFFF
        )

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(lines)))
        + chunk(b"IEND", b"")
    )
    out = decode_png(data)
    assert out is not None
    assert (out.astype(np.uint8) == px).all()


def test_gif_roundtrip_lzw():
    import numpy as np

    from dedupe_rust_ray.stages.multimodal import decode_gif, encode_gif
    from dedupe_rust_ray.stages.dims import probe_dims, sniff_format

    rng = np.random.default_rng(7)
    # > 250 pixels so the encoder's mid-stream CLEAR codes are exercised
    px = rng.integers(0, 256, (23, 31)).astype(np.uint8)
    data = encode_gif(px)
    assert sniff_format(data) == "gif"
    assert probe_dims("gif", data) == (31, 23)
    out = decode_gif(data)
    assert out is not None and out.shape == (23, 31)
    # grayscale palette: luma of (v,v,v) == v
    assert np.allclose(out, px.astype(np.float32), atol=0.51)


def test_heic_dims_box_walk():
    import struct

    from dedupe_rust_ray.stages.dims import heic_dims, probe_dims, sniff_format

    def box(tag, payload):
        return struct.pack(">I", 8 + len(payload)) + tag + payload

    ftyp = box(b"ftyp", b"heic" + b"\x00" * 4 + b"mif1")
    ispe_full = box(b"ispe", b"\x00" * 4 + struct.pack(">II", 1280, 960))
    ispe_thumb = box(b"ispe", b"\x00" * 4 + struct.pack(">II", 160, 120))
    ipco = box(b"ipco", ispe_full + ispe_thumb)
    iprp = box(b"iprp", ipco)
    meta = box(b"meta", b"\x00" * 4 + iprp)
    data = ftyp + meta

    assert sniff_format(data) == "heic"
    # largest ispe wins: the primary image, not the thumbnail
    assert heic_dims(data) == (1280, 960)
    assert probe_dims("heic", data) == (1280, 960)
    assert probe_dims("heif", data) == (1280, 960)

    # non-HEIF brand (e.g. mp4) must not parse
    mp4 = box(b"ftyp", b"isom" + b"\x00" * 4 + b"iso2") + meta
    assert heic_dims(mp4) is None
    # truncated / missing ispe
    assert heic_dims(ftyp) is None


def test_heic_pixel_gate_and_flag_policy():
    """pillow-heif is import-gated (absent in this sandbox): the gate
    returns None, and a MediaDecode row with a synthesized HEIC header
    carries the reference's warn-and-skip flag while its dims parse for
    real via the ispe walk (/root/reference/src/main.rs:674-680)."""
    import struct

    import pyarrow as pa

    from dedupe_rust_ray.stages.multimodal import (
        MediaDecode,
        heic_pixel_decoder,
    )

    def box(typ, payload):
        return struct.pack(">I", 8 + len(payload)) + typ + payload

    ftyp = box(b"ftyp", b"heic" + b"\x00" * 4 + b"mif1")
    ispe = box(b"ispe", b"\x00" * 4 + struct.pack(">II", 64, 48))
    meta = box(b"meta", b"\x00" * 4 + box(b"iprp", box(b"ipco", ispe)))
    data = ftyp + meta

    gate = heic_pixel_decoder()
    if gate is None:  # this sandbox: no libheif
        out = MediaDecode()(
            pa.table(
                {
                    "media_id": ["m-1"],
                    "fmt": ["heic"],
                    "payload": [data],
                }
            )
        )
        assert out["err"].to_pylist() == ["decode_unsupported:heic"]
        assert out["ok"].to_pylist() == [False]
        assert out["width"].to_pylist() == [64]
        assert out["height"].to_pylist() == [48]
    else:  # environments with pillow-heif: dispatch table gains heic
        assert "heic" in MediaDecode().decoders
