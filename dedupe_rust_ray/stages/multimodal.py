"""Multimodal (binary media) plumbing: synthetic encoders + decode stage.

The sandbox has no image libraries (no Pillow/libheif), so:

- **Encoders** here synthesize REAL minimal files (valid PNG via stdlib
  zlib + CRC, uncompressed 24-bit BMP, GIF87a header, JPEG marker stream)
  deterministically from a seed — the target-side replacement for the
  reference's checked-in fixture generator
  (/root/reference/test_images/create_test_image.rs:4-41).
- **MediaDecode** is the actor-pool decode stage with REAL Ray plumbing
  (schema, batching, per-row error columns). BMP decode is fully
  implemented (numpy over the uncompressed pixel array); other formats are
  STUBBED — they surface ``err='decode_unsupported:<fmt>'`` per row, never
  a task failure (the warn-and-skip policy of
  /root/reference/src/main.rs:674-680). Swap in Pillow in ``__init__``
  when available.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa

from .dims import probe_dims, sniff_format

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


def encode_gif_header(w: int, h: int) -> bytes:
    """GIF87a header + logical screen descriptor (enough for dim probing)."""
    return b"GIF87a" + struct.pack("<HH", w, h) + b"\x00\x00\x00\x3b"


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


_FORMATS = ("png", "bmp", "gif", "jpeg")
_DIM_CHOICES = ((16, 16), (32, 32), (32, 16), (64, 64), (48, 32))


def synth_media_batch(batch: pa.Table) -> pa.Table:
    """documents batch -> media rows (media_id, fmt, payload, n_bytes).

    Format and dimensions derive deterministically from doc_id; PNG/BMP get
    real pixel payloads (seeded), GIF/JPEG get header-only payloads."""
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
            data = encode_gif_header(w, h)
        else:
            data = encode_jpeg_markers(w, h)
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


class MediaDecode:
    """Actor-pool decode + feature stage (stateful: format dispatch table
    built once per actor; a real deployment loads codecs/models here).

    Output columns: media_id, ok, err, width, height, mean_brightness,
    thumb (8x8 block-mean, packed float32) — brightness mirrors the
    reference's HEIC harness statistic (/root/reference/test_heic.rs:61-63).
    """

    def __init__(self):
        self.decoders = {"bmp": decode_bmp}

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
