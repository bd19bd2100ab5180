"""Multimodal (binary media) plumbing: synthetic encoders + decode stage.

The sandbox has no image libraries (no Pillow/libheif), so:

- **Encoders** here synthesize REAL minimal files (valid PNG via stdlib
  zlib + CRC, uncompressed 24-bit BMP, GIF87a with LZW image data, JPEG
  marker stream, lossless VP8L WebP — see stages/webp.py) determin-
  istically from a seed — the target-side replacement for the reference's
  checked-in fixture generator
  (/root/reference/test_images/create_test_image.rs:4-41).
- **MediaDecode** is the actor-pool decode stage with REAL Ray plumbing
  (schema, batching, per-row error columns). All five whitelisted-and-
  synthesizable formats decode for real — BMP, PNG (8-bit gray/RGB, all
  five filters), GIF (LZW, global/local palettes), baseline JPEG (full
  T.81 scan decode, stages/jpeg.py) and lossless WebP (VP8L subset,
  stages/webp.py) — mirroring the reference's decoded-pixel phase
  (/root/reference/src/main.rs:593-681; WebP via image::open at 659-681).
  Payloads outside those profiles (progressive JPEG, interlaced PNG/GIF,
  lossy VP8, predictor/indexed VP8L, unknown magic) surface
  ``err='decode_*'`` per row, never a task failure (the warn-and-skip
  policy of /root/reference/src/main.rs:674-680).
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pyarrow as pa

from .dims import probe_dims, sniff_format
from .jpeg import decode_jpeg, encode_jpeg
from .webp import decode_webp, encode_webp

# ---------------------------------------------------------------- encoders


def encode_png(pixels: np.ndarray) -> bytes:
    """Minimal valid grayscale PNG (8-bit, no interlace)."""
    h, w = pixels.shape

    def chunk(tag: bytes, payload: bytes) -> bytes:
        c = tag + payload
        return struct.pack(">I", len(payload)) + c + struct.pack(
            ">I", zlib.crc32(c) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + pixels[r].astype(np.uint8).tobytes() for r in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Uncompressed 24-bit BMP (grayscale replicated to BGR)."""
    h, w = pixels.shape
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    header = b"BM" + struct.pack("<IHHI", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = []
    for r in range(h - 1, -1, -1):  # bottom-up
        px = np.repeat(pixels[r].astype(np.uint8), 3).tobytes()
        rows.append(px + b"\x00" * (row_size - w * 3))
    return header + info + b"".join(rows)


def decode_bmp(data: bytes) -> np.ndarray | None:
    """Inverse of :func:`encode_bmp` (24-bit uncompressed only)."""
    if data[:2] != b"BM" or len(data) < 54:
        return None
    off = struct.unpack("<I", data[10:14])[0]
    w, h = struct.unpack("<ii", data[18:26])
    bpp = struct.unpack("<H", data[28:30])[0]
    if bpp != 24 or w <= 0 or h <= 0:
        return None
    row_size = (w * 3 + 3) & ~3
    if len(data) < off + row_size * h:
        return None
    buf = np.frombuffer(data, dtype=np.uint8, count=row_size * h, offset=off)
    rows = buf.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    return rows[::-1, :, 0].astype(np.float32)  # bottom-up -> top-down, gray


def decode_png(data: bytes) -> np.ndarray | None:
    """Inverse of :func:`encode_png`, generalized: 8-bit grayscale or RGB,
    non-interlaced, all five scanline filters (the reference decodes PNG
    pixels via the png crate, /root/reference/src/dimensions.rs:92-107 and
    image::open at src/main.rs:659-681). Returns float32 grayscale."""
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos, w, h, color, idat = 8, None, None, None, bytearray()
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8 or color not in (0, 2) or interlace:
                return None
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if not w or not h:
        return None
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    ch = 1 if color == 0 else 3
    stride = w * ch
    if len(raw) != (stride + 1) * h:
        return None
    lines = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    out = np.zeros((h, stride), np.int64)
    for r in range(h):
        f = lines[r, 0]
        cur = lines[r, 1:].astype(np.int64)
        up = out[r - 1] if r else np.zeros(stride, np.int64)
        if f == 0:
            out[r] = cur
        elif f == 1:  # sub: cumulative left-neighbor per channel lane
            out[r] = np.cumsum(cur.reshape(w, ch), axis=0).reshape(stride) & 0xFF
        elif f == 2:  # up
            out[r] = (cur + up) & 0xFF
        elif f == 3:  # average
            row = out[r]
            for i in range(stride):
                left = row[i - ch] if i >= ch else 0
                row[i] = (cur[i] + ((left + up[i]) >> 1)) & 0xFF
        elif f == 4:  # paeth
            row = out[r]
            for i in range(stride):
                a = row[i - ch] if i >= ch else 0
                b = up[i]
                c = up[i - ch] if i >= ch else 0
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
                row[i] = (cur[i] + pred) & 0xFF
        else:
            return None
    px = out.reshape(h, w, ch)
    return (
        px[:, :, 0] if ch == 1 else px.mean(axis=2)
    ).astype(np.float32)


def encode_gif_header(w: int, h: int) -> bytes:
    """GIF87a header + logical screen descriptor (enough for dim probing)."""
    return b"GIF87a" + struct.pack("<HH", w, h) + b"\x00\x00\x00\x3b"


def encode_gif(pixels: np.ndarray) -> bytes:
    """Real GIF87a: grayscale palette + LZW-coded image data.

    Uses the "uncompressed GIF" trick — every pixel is emitted as its own
    literal 9-bit code with a CLEAR before the decoder's dictionary would
    force a code-width bump — a fully conformant stream any GIF decoder
    reads, without implementing dictionary compression."""
    h, w = pixels.shape
    gct = bytes(v for i in range(256) for v in (i, i, i))
    out = bytearray(b"GIF87a")
    out += struct.pack("<HH", w, h) + bytes([0xF7, 0x00, 0x00]) + gct
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    out.append(8)  # LZW min code size
    clear, eoi = 256, 257
    # all codes are fixed 9-bit (CLEAR keeps the dict small), packed
    # LSB-first — fully vectorized: interleave a CLEAR before every
    # 250-pixel run, append EOI, expand each code to 9 little-endian
    # bits, packbits
    flat = pixels.astype(np.uint16).ravel()
    chunks: list[np.ndarray] = []
    for s in range(0, len(flat), 250):
        chunks.append(np.array([clear], np.uint16))
        chunks.append(flat[s : s + 250])
    chunks.append(np.array([eoi], np.uint16))
    cod = np.concatenate(chunks)
    bits = ((cod[:, None] >> np.arange(9)[None, :]) & 1).astype(np.uint8)
    codes = np.packbits(bits.ravel(), bitorder="little").tobytes()
    for s in range(0, len(codes), 255):
        block = codes[s : s + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"
    return bytes(out)


def _gif_lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytearray | None:
    """Full GIF-variant LZW decoder (variable code width, clear/EOI)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)]
    table = base + [b"", b""]
    width = min_code_size + 1
    out = bytearray()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = base + [b"", b""]
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return out
            if code < len(table):
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]
            else:
                return None
            out += entry
            if prev is not None and len(table) < 4096:
                table.append(prev + entry[:1])
            if len(table) >= (1 << width) and width < 12:
                width += 1
            prev = entry
            if len(out) >= n_pixels:
                return out
    return out


def decode_gif(data: bytes) -> np.ndarray | None:
    """Decode a GIF87a/89a first frame (global color table, no interlace),
    LZW and all. Returns float32 grayscale (palette luma)."""
    if data[:6] not in (b"GIF87a", b"GIF89a") or len(data) < 13:
        return None
    sw, sh = struct.unpack("<HH", data[6:10])
    flags = data[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data, np.uint8, count=3 * n, offset=pos).reshape(n, 3)
        pos += 3 * n
    while pos < len(data):
        b0 = data[pos]
        if b0 == 0x2C:  # image descriptor
            left, top, w, h = struct.unpack("<HHHH", data[pos + 1 : pos + 9])
            iflags = data[pos + 9]
            pos += 10
            lct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                lct = np.frombuffer(
                    data, np.uint8, count=3 * n, offset=pos
                ).reshape(n, 3)
                pos += 3 * n
            if iflags & 0x40 or lct is None:  # interlaced unsupported
                return None
            min_code = data[pos]
            pos += 1
            lzw = bytearray()
            while pos < len(data) and data[pos]:
                ln = data[pos]
                lzw += data[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            idx = _gif_lzw_decode(bytes(lzw), min_code, w * h)
            if idx is None or len(idx) < w * h:
                return None
            pal_idx = np.frombuffer(bytes(idx[: w * h]), np.uint8)
            if int(pal_idx.max(initial=0)) >= len(lct):
                return None
            rgb = lct[pal_idx].reshape(h, w, 3)
            # gray palettes (r==g==b — our own encoder and most grayscale
            # GIFs) return the exact value; color reduces to BT.601 luma
            # accumulated in float64 (float32 products drift a whole
            # count: 74 -> 73.99999)
            if np.array_equal(rgb[..., 0], rgb[..., 1]) and np.array_equal(
                rgb[..., 2], rgb[..., 1]
            ):
                return rgb[..., 0].astype(np.float32)
            return (
                rgb.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
            ).astype(np.float32)
        if b0 == 0x21:  # extension block: skip sub-blocks
            pos += 2
            while pos < len(data) and data[pos]:
                pos += 1 + data[pos]
            pos += 1
        elif b0 == 0x3B:
            return None  # trailer before any image data
        else:
            return None
    return None


def encode_jpeg_markers(w: int, h: int) -> bytes:
    """SOI + APP0 + SOF0 marker stream with real dimensions (no scan data)."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">HH", h, w)
        + b"\x01\x11\x00"
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


_FORMATS = ("png", "bmp", "gif", "jpeg", "webp")
_DIM_CHOICES = ((16, 16), (32, 32), (32, 16), (64, 64), (48, 32))


def synth_media_batch(batch: pa.Table) -> pa.Table:
    """documents batch -> media rows (media_id, fmt, payload, n_bytes).

    Format and dimensions derive deterministically from doc_id; every
    format gets a real pixel payload (seeded) through its real encoder."""
    ids = batch["doc_id"].to_numpy()
    media_ids, fmts, payloads = [], [], []
    for d in ids:
        d = int(d)
        fmt = _FORMATS[d % len(_FORMATS)]
        w, h = _DIM_CHOICES[(d // len(_FORMATS)) % len(_DIM_CHOICES)]
        rng = np.random.default_rng(d)
        if fmt == "png":
            data = encode_png(rng.integers(0, 256, (h, w)).astype(np.uint8))
        elif fmt == "bmp":
            data = encode_bmp(rng.integers(0, 256, (h, w)).astype(np.uint8))
        elif fmt == "gif":
            data = encode_gif(rng.integers(0, 256, (h, w)).astype(np.uint8))
        elif fmt == "webp":
            data = encode_webp(rng.integers(0, 256, (h, w)).astype(np.uint8))
        else:
            data = encode_jpeg(rng.integers(0, 256, (h, w)).astype(np.uint8))
        media_ids.append(f"m-{d:09d}")
        fmts.append(fmt)
        payloads.append(data)
    return pa.table(
        {
            "media_id": pa.array(media_ids, type=pa.string()),
            "fmt": pa.array(fmts, type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "n_bytes": pa.array([len(p) for p in payloads], type=pa.int64()),
        }
    )


def probe_dims_batch(batch: pa.Table) -> pa.Table:
    """Add width/height from header probing (never trusts metadata)."""
    fmts = batch["fmt"].to_pylist()
    payloads = batch["payload"].to_pylist()
    ws, hs = [], []
    for f, p in zip(fmts, payloads):
        wh = probe_dims(f, p)
        ws.append(wh[0] if wh else 0)
        hs.append(wh[1] if wh else 0)
    return pa.table(
        {
            "media_id": batch["media_id"],
            "fmt": batch["fmt"],
            "width": pa.array(ws, type=pa.int32()),
            "height": pa.array(hs, type=pa.int32()),
        }
    )


def heic_pixel_decoder():
    """libheif-backed HEIC grayscale decode, gated on ``pillow-heif``
    being importable (it is NOT in this sandbox — no network, no
    libheif). When available, pixels decode for real and HEIC rows flow
    through the same feature path as every other format, mirroring the
    reference's libheif decode with interleaved/grayscale fallbacks
    (/root/reference/src/main.rs:684-792). When absent, callers keep the
    per-row ``decode_unsupported:heic`` flag — the reference's
    warn-and-skip (/root/reference/src/main.rs:674-680). Dims still parse
    for real either way via the pure-bytes ISO-BMFF ispe walk
    (stages/dims.py)."""
    try:  # pragma: no cover - pillow-heif not installable here
        import pillow_heif
        from PIL import Image
    except ImportError:
        return None
    import io

    pillow_heif.register_heif_opener()

    def decode_heic(data: bytes):
        try:
            img = Image.open(io.BytesIO(data)).convert("L")
            return np.asarray(img, dtype=np.float64)
        except Exception:  # noqa: BLE001 - per-row error policy
            return None

    return decode_heic


class MediaDecode:
    """Actor-pool decode + feature stage (stateful: format dispatch table
    built once per actor; a real deployment loads codecs/models here).

    Output columns: media_id, ok, err, width, height, mean_brightness,
    thumb (8x8 block-mean, packed float32) — brightness mirrors the
    reference's HEIC harness statistic (/root/reference/test_heic.rs:61-63).
    """

    def __init__(self):
        self.decoders = {
            "bmp": decode_bmp,
            "png": decode_png,
            "gif": decode_gif,
            "jpeg": decode_jpeg,
            "webp": decode_webp,
        }
        heic = heic_pixel_decoder()  # import-gated: None in this sandbox
        if heic is not None:
            self.decoders["heic"] = heic

    def __call__(self, batch: pa.Table) -> pa.Table:
        fmts = batch["fmt"].to_pylist()
        payloads = batch["payload"].to_pylist()
        ok, err, ws, hs, bright, thumbs = [], [], [], [], [], []
        for f, p in zip(fmts, payloads):
            sniffed = sniff_format(p) or f
            dec = self.decoders.get(sniffed)
            wh = probe_dims(sniffed, p)
            ws.append(wh[0] if wh else 0)
            hs.append(wh[1] if wh else 0)
            if dec is None:
                ok.append(False)
                err.append(f"decode_unsupported:{sniffed}")
                bright.append(0.0)
                thumbs.append(b"")
                continue
            img = dec(p)
            if img is None:
                ok.append(False)
                err.append("decode_failed")
                bright.append(0.0)
                thumbs.append(b"")
                continue
            ok.append(True)
            err.append("")
            bright.append(float(img.mean()))
            ry = np.linspace(0, img.shape[0], 9).astype(np.int64)[:-1]
            rx = np.linspace(0, img.shape[1], 9).astype(np.int64)[:-1]
            pooled = np.add.reduceat(np.add.reduceat(img, ry, axis=0), rx, axis=1)
            counts = np.outer(np.diff(np.append(ry, img.shape[0])),
                              np.diff(np.append(rx, img.shape[1])))
            thumbs.append((pooled / counts).astype("<f4").tobytes())
        return pa.table(
            {
                "media_id": batch["media_id"],
                "fmt": batch["fmt"],
                "ok": pa.array(ok, type=pa.bool_()),
                "err": pa.array(err, type=pa.string()),
                "width": pa.array(ws, type=pa.int32()),
                "height": pa.array(hs, type=pa.int32()),
                "mean_brightness": pa.array(
                    [round(b, 4) for b in bright], type=pa.float64()
                ),
                "thumb": pa.array(thumbs, type=pa.binary()),
            }
        )


def resize_block_mean(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Area (block-mean) downsample of a 2-D grayscale image — the
    vectorized resize kernel used by the thumbnail stage."""
    h, w = img.shape
    ry = np.linspace(0, h, out_h + 1).astype(np.int64)
    rx = np.linspace(0, w, out_w + 1).astype(np.int64)
    pooled = np.add.reduceat(np.add.reduceat(img, ry[:-1], axis=0), rx[:-1], axis=1)
    counts = np.outer(np.diff(ry), np.diff(rx))
    return (pooled / counts).astype(np.float32)


def fit_to_grid(img: np.ndarray, edge: int) -> np.ndarray:
    """Resample a grayscale image to an (edge, edge) grid — THE shared
    fitting rule for every pHash consumer (MediaPhash and the data:hex
    ER signature path must agree bit-for-bit or cross-container dedup
    breaks). Block-mean for downsampling; images SMALLER than the grid
    take nearest-neighbor replication — block-mean with out > in yields
    zero-width blocks (0/0 = NaN) and the NaN hashes of every small
    image collapse together."""
    if img.shape == (edge, edge):
        return np.asarray(img, dtype=np.float32)
    if img.shape[0] < edge or img.shape[1] < edge:
        ry = np.arange(edge) * img.shape[0] // edge
        rx = np.arange(edge) * img.shape[1] // edge
        return img[np.ix_(ry, rx)].astype(np.float32)
    return resize_block_mean(img, edge, edge)


class MediaResize:
    """Actor-pool resize stage: decode (where a codec exists) -> area
    downsample to ``edge`` x ``edge`` -> re-encode as PNG.

    Same per-row error policy as :class:`MediaDecode`: rows whose format
    cannot be decoded here carry ``err`` and an empty payload, never a
    task failure (/root/reference/src/main.rs:674-680)."""

    def __init__(self, edge: int = 16):
        self.edge = edge
        self.decoders = {
            "bmp": decode_bmp,
            "png": decode_png,
            "gif": decode_gif,
            "jpeg": decode_jpeg,
            "webp": decode_webp,
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        fmts = batch["fmt"].to_pylist()
        payloads = batch["payload"].to_pylist()
        out_p, errs = [], []
        for f, p in zip(fmts, payloads):
            sniffed = sniff_format(p) or f
            dec = self.decoders.get(sniffed)
            img = dec(p) if dec else None
            if img is None:
                out_p.append(b"")
                errs.append(f"decode_unsupported:{sniffed}" if dec is None else "decode_failed")
                continue
            small = resize_block_mean(img, self.edge, self.edge)
            # round-to-nearest quantization (not truncation): a decoder
            # whose luma path lands at 73.99999 must re-encode as 74
            out_p.append(
                encode_png(np.clip(np.rint(small), 0, 255).astype(np.uint8))
            )
            errs.append("")
        return pa.table(
            {
                "media_id": batch["media_id"],
                "fmt": batch["fmt"],
                "thumb_png": pa.array(out_p, type=pa.binary()),
                "err": pa.array(errs, type=pa.string()),
            }
        )


class VideoFrameSample:
    """Actor-pool frame-sampling stage for opaque video payloads.

    Real video demuxing needs codec libraries this environment lacks, so
    the DECODE step is a deterministic fake (frames synthesized from the
    payload hash) clearly marked per row with ``decoder='synthetic'`` —
    while the Ray-side plumbing (schema, batching, actor signature,
    one-row-per-sampled-frame explode) is real and tested. Swap
    ``_decode_frames`` for a PyAV/ffmpeg call in a full environment."""

    def __init__(self, every_n: int = 10, frame_edge: int = 16):
        self.every_n = every_n
        self.frame_edge = frame_edge

    def _decode_frames(self, payload: bytes) -> np.ndarray:
        # deterministic fake: "frame count" from payload length, pixels
        # from a splitmix64 stream over the payload hash
        from ..functions.shingles import splitmix64

        n_frames = max(1, len(payload) // 256)
        seed = np.uint64(int.from_bytes(
            hashlib.sha256(payload).digest()[:8], "little"
        ))
        e = self.frame_edge
        k = np.arange(n_frames * e * e, dtype=np.uint64)
        with np.errstate(over="ignore"):
            px = (splitmix64(seed * np.uint64(0x9E3779B97F4A7C15) ^ k)
                  % np.uint64(256))
        return px.astype(np.float32).reshape(n_frames, e, e)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        payloads = batch["payload"].to_pylist()
        out_id, out_idx, out_frame, out_dec = [], [], [], []
        for mid, p in zip(ids, payloads):
            frames = self._decode_frames(p)
            for j in range(0, len(frames), self.every_n):
                out_id.append(mid)
                out_idx.append(j)
                out_frame.append(frames[j].astype("<f4").tobytes())
                out_dec.append("synthetic")
        return pa.table(
            {
                "media_id": pa.array(out_id, type=pa.string()),
                "frame_idx": pa.array(out_idx, type=pa.int32()),
                "frame": pa.array(out_frame, type=pa.binary()),
                "decoder": pa.array(out_dec, type=pa.string()),
            }
        )


class MediaPhash:
    """Actor-pool perceptual-hash stage: decode -> area resize to the
    DCT grid -> 64-bit pHash (functions/imagehash.phash_batch).

    The hash is computed from DECODED PIXELS, so pixel-identical images
    reach the same hash regardless of container format (the property the
    reference's deep-hash phase relies on, /root/reference/src/main.rs:
    593-681); tests/test_queries_oracle.py pins it by encoding one pixel
    array through PNG and BMP. Per-row error policy as MediaDecode."""

    def __init__(self, grid: int = 32):
        from ..functions.imagehash import dct_matrix

        self.grid = grid
        self._dct = dct_matrix(grid)
        self.decoders = {
            "bmp": decode_bmp,
            "png": decode_png,
            "gif": decode_gif,
            "jpeg": decode_jpeg,
            "webp": decode_webp,
        }

    def _fit(self, img: np.ndarray) -> np.ndarray:
        return fit_to_grid(img, self.grid)  # shared rule — see fit_to_grid

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.imagehash import phash_batch

        if batch.num_rows == 0:  # np.stack([]) would raise
            return pa.table(
                {
                    "media_id": batch["media_id"],
                    "fmt": batch["fmt"],
                    "ok": pa.array([], type=pa.bool_()),
                    "err": pa.array([], type=pa.string()),
                    "phash": pa.array([], type=pa.int64()),
                }
            )
        fmts = batch["fmt"].to_pylist()
        payloads = batch["payload"].to_pylist()
        oks, errs, imgs = [], [], []
        for f, p in zip(fmts, payloads):
            sniffed = sniff_format(p) or f
            dec = self.decoders.get(sniffed)
            img = dec(p) if dec else None
            if img is None:
                oks.append(False)
                errs.append(
                    f"decode_unsupported:{sniffed}" if dec is None
                    else "decode_failed"
                )
                imgs.append(np.zeros((self.grid, self.grid), np.float32))
            else:
                oks.append(True)
                errs.append("")
                imgs.append(self._fit(img))
        ph = phash_batch(np.stack(imgs), basis=self._dct)
        ph = np.where(oks, ph, np.uint64(0))
        return pa.table(
            {
                "media_id": batch["media_id"],
                "fmt": batch["fmt"],
                "ok": pa.array(oks, type=pa.bool_()),
                "err": pa.array(errs, type=pa.string()),
                # bit-cast to int64: uint64 keys above 2^63 degrade Ray's
                # groupby combine to pickled blocks (see analytics._h64_as_i64)
                "phash": pa.array(np.asarray(ph, np.uint64).view(np.int64)),
            }
        )
