"""WebP VP8L (lossless) codec built from the public "WebP Lossless
Bitstream Specification" — reference parity for the one whitelisted
format the repo could not previously pixel-decode
(/root/reference/src/main.rs:659-681 decodes WebP via ``image::open``;
whitelist at src/main.rs:129).

Scope (documented subset, per-row flags cover the rest):

- **Encoder** (:func:`encode_webp`): grayscale 8-bit -> RIFF/VP8L with the
  SUBTRACT_GREEN transform. Red/blue become constant 0 and alpha constant
  255 (0-bit simple codes); gray values ride a flat 8-bit literal green
  code (a complete canonical Huffman code: 256 literals of length 8). No
  backward references or color cache — the synthetic payloads are
  incompressible noise, so LZ77 would only add structure to validate.
- **Decoder** (:func:`decode_webp`): full header parse, simple and
  normal (code-length-coded) Huffman codes, color cache, LZ77 backward
  references with absolute distances, SUBTRACT_GREEN inverse. Flags as
  unsupported: PREDICTOR / COLOR_TRANSFORM / COLOR_INDEXING transforms,
  entropy-image (meta Huffman) streams, and the 120-entry 2D distance
  neighborhood (its exact spec ordering cannot be validated in this
  sandbox — no libwebp — so it is refused rather than risked; our encoder
  never emits backrefs). Failures return ``None`` -> the decode stage's
  per-row warn-and-skip policy (/root/reference/src/main.rs:674-680).

Bit conventions (shared by both sides, matching libwebp): the byte stream
is consumed LSB-first; Huffman codes are canonical (RFC-1951 ordering:
by length, then symbol) and transmitted MSB-first — i.e. the writer emits
``reverse_bits(code)`` into the LSB-first stream.

The decoder has a vectorized fast path for exactly the profile the
encoder writes (flat 8-bit green, 0-bit side channels): the pixel section
is then a fixed-stride bit slice decoded with one ``np.unpackbits`` /
``np.packbits`` pair — no per-pixel Python in the hot decode stage.
"""

from __future__ import annotations

import struct

import numpy as np

_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)


# ------------------------------------------------------------------ writer


class _BitWriter:
    def __init__(self) -> None:
        self.bits: list[int] = []

    def write(self, value: int, n: int) -> None:
        """n bits of value, LSB-first (spec ReadBits order)."""
        for i in range(n):
            self.bits.append((value >> i) & 1)

    def write_code(self, code: int, length: int) -> None:
        """Huffman code bits, MSB-first."""
        for i in range(length - 1, -1, -1):
            self.bits.append((code >> i) & 1)


def _simple_code_bits(w: _BitWriter, symbol: int) -> None:
    """One-symbol simple Huffman code (0 bits per use)."""
    w.write(1, 1)  # is_simple
    w.write(0, 1)  # num_symbols - 1 = 0
    if symbol < 2:
        w.write(0, 1)  # first symbol fits in 1 bit
        w.write(symbol, 1)
    else:
        w.write(1, 1)
        w.write(symbol, 8)


def _flat_green_code_bits(w: _BitWriter) -> None:
    """Normal code: literals 0..255 at length 8, everything else unused.

    Code-length code: symbols {0, 8}, 1 bit each (canonical: 0 -> code 0,
    8 -> code 1); then 256 x "8" and 24 x "0"."""
    w.write(0, 1)  # not simple
    w.write(7, 4)  # num_code_lengths = 4 + 7 = 11 (covers symbol 8 in _ORDER)
    cl = {0: 1, 8: 1}
    for i in range(11):
        w.write(cl.get(_ORDER[i], 0), 3)
    w.write(0, 1)  # no max_symbol shortcut
    for _ in range(256):
        w.write_code(1, 1)  # CL symbol 8
    for _ in range(24):
        w.write_code(0, 1)  # CL symbol 0


def encode_webp(pixels: np.ndarray) -> bytes:
    """Grayscale (h, w) uint8 -> lossless WebP (RIFF/VP8L) bytes."""
    pixels = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w = pixels.shape
    if not (1 <= w <= 1 << 14 and 1 <= h <= 1 << 14):
        raise ValueError(f"VP8L dims out of range: {w}x{h}")
    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version
    # transforms: SUBTRACT_GREEN, then end-of-transforms
    bw.write(1, 1)
    bw.write(2, 2)
    bw.write(0, 1)
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta huffman (single group)
    _flat_green_code_bits(bw)      # green + length + cache
    _simple_code_bits(bw, 0)       # red  (post-subtract-green: 0)
    _simple_code_bits(bw, 0)       # blue (post-subtract-green: 0)
    _simple_code_bits(bw, 255)     # alpha
    _simple_code_bits(bw, 0)       # distance (never used)
    head = np.asarray(bw.bits, dtype=np.uint8)
    # flat 8-bit green code: canonical code == symbol, transmitted
    # MSB-first -> each pixel contributes its value's bits in 'big' order
    px = np.unpackbits(pixels.reshape(-1, 1), axis=1, bitorder="big").ravel()
    stream = np.concatenate([head, px])
    payload = b"\x2f" + np.packbits(stream, bitorder="little").tobytes()
    if len(payload) & 1:  # RIFF chunks are even-padded
        chunk = payload + b"\x00"
    else:
        chunk = payload
    riff = (
        b"WEBP"
        + b"VP8L"
        + struct.pack("<I", len(payload))
        + chunk
    )
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


# ------------------------------------------------------------------ reader


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.bits = np.unpackbits(
            np.frombuffer(data, dtype=np.uint8), bitorder="little"
        )
        self.pos = 0

    def read(self, n: int) -> int:
        if self.pos + n > len(self.bits):
            raise EOFError("VP8L bitstream truncated")
        v = 0
        for k in range(n):
            v |= int(self.bits[self.pos + k]) << k
        self.pos += n
        return v


class _Huffman:
    """Canonical Huffman decode table: {(length, code): symbol}."""

    def __init__(self, lengths: dict[int, int]):
        used = sorted((l, s) for s, l in lengths.items() if l > 0)
        self.single = used[0][1] if len(used) == 1 else None
        self.table: dict[tuple[int, int], int] = {}
        code, prev_len = 0, 0
        total = 0.0
        for l, s in used:
            code <<= l - prev_len
            self.table[(l, code)] = s
            total += 2.0 ** -l
            code += 1
            prev_len = l
        if used and self.single is None and abs(total - 1.0) > 1e-12:
            raise ValueError("incomplete/over-subscribed Huffman code")
        self.lengths = lengths

    def read_symbol(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | br.read(1)
            length += 1
            s = self.table.get((length, code))
            if s is not None:
                return s
        raise ValueError("bad Huffman code")


def _read_code(br: _BitReader, alphabet_size: int) -> _Huffman:
    if br.read(1):  # simple
        num_symbols = br.read(1) + 1
        first_8bit = br.read(1)
        s0 = br.read(8 if first_8bit else 1)
        if num_symbols == 1:
            h0 = _Huffman({})
            h0.single = s0  # 0-bit code: always s0
            return h0
        s1 = br.read(8)
        return _Huffman({s0: 1, s1: 1})
    num_cl = 4 + br.read(4)
    cl_lens = {s: 0 for s in range(19)}
    for i in range(num_cl):
        cl_lens[_ORDER[i]] = br.read(3)
    cl_code = _Huffman(cl_lens)
    if br.read(1):  # explicit max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths: dict[int, int] = {}
    symbol, prev = 0, 8
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        s = cl_code.read_symbol(br)
        if s < 16:
            lengths[symbol] = s
            symbol += 1
            if s:
                prev = s
        elif s == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                lengths[symbol] = prev
                symbol += 1
        elif s == 17:
            symbol += 3 + br.read(3)
        else:  # 18
            symbol += 11 + br.read(7)
    return _Huffman({s: l for s, l in lengths.items() if l > 0})


def _prefix_value(code: int, br: _BitReader) -> int:
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _is_flat_profile(
    green: _Huffman, red: _Huffman, blue: _Huffman,
    alpha: _Huffman, dist: _Huffman, cache_bits: int,
) -> bool:
    if cache_bits:
        return False
    for side in (red, blue, alpha, dist):
        if side.single is None:
            return False
    if green.single is not None:
        return False
    lens = green.lengths
    return (
        all(lens.get(s, 0) == 8 for s in range(256))
        and all(lens.get(s, 0) == 0 for s in range(256, 280))
    )


def decode_webp(data: bytes) -> np.ndarray | None:
    """WebP bytes -> grayscale (h, w) uint8, or None (unsupported/corrupt).

    Color images reduce to BT.601 luma; gray (r==g==b) returns the exact
    channel, so :func:`encode_webp` round-trips losslessly."""
    try:
        if len(data) < 21 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
            return None
        if data[12:16] != b"VP8L" or data[20] != 0x2F:
            return None  # lossy VP8 / VP8X profiles not decoded
        br = _BitReader(data[21:])
        w = br.read(14) + 1
        h = br.read(14) + 1
        br.read(1)  # alpha hint
        if br.read(3) != 0:
            return None  # unknown version
        subtract_green = False
        while br.read(1):
            t = br.read(2)
            if t == 2:
                subtract_green = True
            else:
                return None  # predictor/color-transform/indexing: unsupported
        cache_bits = br.read(4) if br.read(1) else 0
        cache = [0] * (1 << cache_bits) if cache_bits else None
        if br.read(1):
            return None  # entropy image (meta Huffman): unsupported
        n_green = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
        green = _read_code(br, n_green)
        red = _read_code(br, 256)
        blue = _read_code(br, 256)
        alpha = _read_code(br, 256)
        dist = _read_code(br, 40)
        n = w * h

        if _is_flat_profile(green, red, blue, alpha, dist, cache_bits):
            # fixed 8-bit stride: one unpackbits slice decodes every pixel
            lo, hi = br.pos, br.pos + 8 * n
            if hi > len(br.bits):
                return None
            g = np.packbits(
                br.bits[lo:hi].reshape(n, 8), axis=1, bitorder="big"
            ).ravel()
            r = np.full(n, red.single, np.uint16)
            b = np.full(n, blue.single, np.uint16)
            if subtract_green:
                r = (r + g) & 0xFF
                b = (b + g) & 0xFF
            return _to_gray(r, g.astype(np.uint16), b, h, w)

        # general sequential path (foreign streams)
        G = np.zeros(n, np.uint16)
        R = np.zeros(n, np.uint16)
        B = np.zeros(n, np.uint16)
        A = np.zeros(n, np.uint16)

        def cache_put(pos: int) -> None:
            argb = (
                (int(A[pos]) << 24)
                | (int(R[pos]) << 16)
                | (int(G[pos]) << 8)
                | int(B[pos])
            )
            # spec: 32-bit truncating multiply before the shift
            cache[((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - cache_bits)] = argb

        pos = 0
        while pos < n:
            s = green.read_symbol(br)
            if s < 256:
                G[pos] = s
                R[pos] = red.read_symbol(br)
                B[pos] = blue.read_symbol(br)
                A[pos] = alpha.read_symbol(br)
                if cache is not None:
                    cache_put(pos)
                pos += 1
            elif s < 280:
                length = _prefix_value(s - 256, br)
                dcode = _prefix_value(dist.read_symbol(br), br)
                if dcode <= 120:
                    return None  # 2D neighborhood map: refused (see module doc)
                d = dcode - 120
                if d < 1 or d > pos or pos + length > n:
                    return None
                for _ in range(length):
                    G[pos], R[pos], B[pos], A[pos] = (
                        G[pos - d], R[pos - d], B[pos - d], A[pos - d],
                    )
                    if cache is not None:
                        cache_put(pos)
                    pos += 1
            else:
                if cache is None:
                    return None
                argb = cache[s - 280]
                A[pos] = (argb >> 24) & 0xFF
                R[pos] = (argb >> 16) & 0xFF
                G[pos] = (argb >> 8) & 0xFF
                B[pos] = argb & 0xFF
                pos += 1
        if subtract_green:
            R = (R + G) & 0xFF
            B = (B + G) & 0xFF
        return _to_gray(R, G, B, h, w)
    except (EOFError, ValueError, IndexError):
        return None


def _to_gray(
    r: np.ndarray, g: np.ndarray, b: np.ndarray, h: int, w: int
) -> np.ndarray:
    if np.array_equal(r, g) and np.array_equal(b, g):
        return g.astype(np.uint8).reshape(h, w)
    luma = 0.299 * r + 0.587 * g + 0.114 * b
    return np.clip(np.round(luma), 0, 255).astype(np.uint8).reshape(h, w)
