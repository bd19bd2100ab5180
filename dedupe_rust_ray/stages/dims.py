"""Image-header dimension probes (pure Python over bytes).

Re-implements the reference's header-only dimension parsers — the operators
M2-M7 of SURVEY.md §2.2 — against in-memory binary payloads instead of file
paths:

- dispatch          : /root/reference/src/dimensions.rs:10-21
- JPEG SOF scan     : /root/reference/src/dimensions.rs:24-88
  (SOF = 0xC0-0xCF excluding 0xC4/0xC8/0xCC; big-endian h/w;
   validated 0 < dim < 30000)
- PNG IHDR          : /root/reference/src/dimensions.rs:92-107
- GIF header        : /root/reference/src/dimensions.rs:111-131 (LE u16 @6)
- WebP VP8/VP8L/VP8X: /root/reference/src/dimensions.rs:135-178
- HEIC/HEIF ispe    : /root/reference/src/dimensions.rs:182-195 (the
  reference uses libheif; here a pure-bytes ISO-BMFF ftyp/meta/ispe walk
  reads the same spatial extents without any codec library)
- BMP               : not in the reference parser (it delegates BMP to the
  image crate); included here for the same whitelist
  (/root/reference/src/main.rs:129).

All parsers return ``None`` rather than raising — the warn-and-skip error
policy of the reference (/root/reference/src/main.rs:674-680)."""

from __future__ import annotations

import struct

MAX_DIM = 30_000  # same sanity bound as dimensions.rs:72-73


def _valid(w: int, h: int) -> bool:
    return 0 < w < MAX_DIM and 0 < h < MAX_DIM


def jpeg_dims(data: bytes) -> tuple[int, int] | None:
    """Scan JPEG markers to the first SOF frame header."""
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        return None
    i = 2
    while i + 9 < len(data):
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h = struct.unpack(">H", data[i + 5 : i + 7])[0]
            w = struct.unpack(">H", data[i + 7 : i + 9])[0]
            return (w, h) if _valid(w, h) else None
        seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
        i += 2 + seg_len
    return None


def png_dims(data: bytes) -> tuple[int, int] | None:
    if len(data) < 24 or data[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    if data[12:16] != b"IHDR":
        return None
    w, h = struct.unpack(">II", data[16:24])
    return (w, h) if _valid(w, h) else None


def gif_dims(data: bytes) -> tuple[int, int] | None:
    if len(data) < 10 or data[:3] != b"GIF":
        return None
    w, h = struct.unpack("<HH", data[6:10])
    return (w, h) if _valid(w, h) else None


def bmp_dims(data: bytes) -> tuple[int, int] | None:
    if len(data) < 26 or data[:2] != b"BM":
        return None
    w, h = struct.unpack("<ii", data[18:26])
    w, h = abs(w), abs(h)
    return (w, h) if _valid(w, h) else None


def webp_dims(data: bytes) -> tuple[int, int] | None:
    if len(data) < 16 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        return None
    fourcc = data[12:16]
    if fourcc == b"VP8 " and len(data) >= 30:  # lossy: keyframe header
        w = struct.unpack("<H", data[26:28])[0] & 0x3FFF
        h = struct.unpack("<H", data[28:30])[0] & 0x3FFF
    elif fourcc == b"VP8L" and len(data) >= 25:  # lossless: 14-bit fields
        bits = struct.unpack("<I", data[21:25])[0]
        w = (bits & 0x3FFF) + 1
        h = ((bits >> 14) & 0x3FFF) + 1
    elif fourcc == b"VP8X" and len(data) >= 30:  # extended: 24-bit canvas
        w = int.from_bytes(data[24:27], "little") + 1
        h = int.from_bytes(data[27:30], "little") + 1
    else:
        return None
    return (w, h) if _valid(w, h) else None


def heic_dims(data: bytes) -> tuple[int, int] | None:
    """HEIC/HEIF dimensions from the ISO-BMFF box structure — pure bytes,
    no libheif (the reference's M7 uses libheif's primary-image handle,
    /root/reference/src/dimensions.rs:182-195; the equivalent metadata
    lives in the ``ispe`` (image spatial extents) property box nested
    under ``meta``/``iprp``/``ipco``).

    Walks top-level boxes to find ``ftyp`` with a heic/heif/mif1 brand,
    then scans for ``ispe`` boxes and returns the LARGEST extent found —
    libheif's primary handle is the full-resolution image, while smaller
    ``ispe`` entries belong to thumbnails."""
    if len(data) < 16:
        return None
    # first box must be ftyp with an HEIF-family brand
    (size,) = struct.unpack(">I", data[0:4])
    if data[4:8] != b"ftyp" or size < 16 or size > len(data):
        return None
    brands = {data[i : i + 4] for i in range(8, size, 4)}
    if not brands & {b"heic", b"heix", b"heif", b"mif1", b"msf1", b"hevc"}:
        return None
    best: tuple[int, int] | None = None
    i = 0
    # ispe payload: version/flags (4 B) + width u32 + height u32, both BE.
    # A flat scan over box headers is robust to the deep container nesting
    # (meta -> iprp -> ipco -> ispe) without tracking every parent size.
    while i + 8 <= len(data):
        if data[i : i + 4] == b"ispe" and i + 16 <= len(data):
            w, h = struct.unpack(">II", data[i + 8 : i + 16])
            if _valid(w, h) and (best is None or w * h > best[0] * best[1]):
                best = (w, h)
        i += 1
    return best


_PARSERS = {
    "jpeg": jpeg_dims,
    "jpg": jpeg_dims,
    "png": png_dims,
    "gif": gif_dims,
    "bmp": bmp_dims,
    "webp": webp_dims,
    "heic": heic_dims,
    "heif": heic_dims,
}


def probe_dims(fmt: str, data: bytes) -> tuple[int, int] | None:
    """Per-format dispatch (dimensions.rs:10-21)."""
    parser = _PARSERS.get(fmt.lower())
    return parser(data) if parser else None


def sniff_format(data: bytes) -> str | None:
    """Magic-byte format detection (the target-side replacement for the
    reference's extension-based dispatch)."""
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if data[:3] == b"GIF":
        return "gif"
    if data[:2] == b"BM":
        return "bmp"
    if data[:2] == b"\xff\xd8":
        return "jpeg"
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return "webp"
    if len(data) >= 12 and data[4:8] == b"ftyp":
        return "heic"
    return None
