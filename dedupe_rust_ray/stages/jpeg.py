"""Baseline JPEG codec (ITU-T T.81), grayscale, pure numpy + stdlib.

Completes the decode dispatch for the one format that previously flagged
``decode_unsupported:jpeg``: the reference's phase-2 hashes DECODED pixels
for every supported format via image::open (/root/reference/src/main.rs:
593-681), jpeg included, so the target engine needs a real scan decoder,
not just the SOF dimension probe.

Everything here is public spec: 8x8 type-II DCT, the Annex K.1 luminance
quantization table, the Annex K.3.3 "typical" Huffman tables, zigzag
ordering, DC differential + AC run-length entropy coding with 0xFF00 byte
stuffing. Encoder emits single-component (grayscale) baseline sequential
JFIF; the decoder accepts any single-component 8-bit baseline stream and
uses the tables embedded in the file (not assumptions about ours).

The block DCT/IDCT and quantization are vectorized over all blocks at
once (one tensordot per axis); only the entropy coder walks blocks in
Python, which is fine for the thumbnail-scale payloads the media pipeline
synthesizes and is the industry layout anyway (entropy decode is
inherently sequential per restart interval).
"""

from __future__ import annotations

import struct

import numpy as np

# Annex K.1 luminance quantization table (quality 50), row-major.
STD_LUMA_QUANT = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)

# Zigzag position -> row-major index.
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.3.3.1: luminance DC table (BITS counts for code lengths 1..16,
# then HUFFVAL symbols in order).
DC_BITS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
DC_VALS = tuple(range(12))

# Annex K.3.3.2: luminance AC table.
AC_BITS = (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
AC_VALS = (
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
)

# Orthonormal 8-point DCT-II matrix: coef = D @ block @ D.T
_k = np.arange(8)
_DCT = np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16) * np.sqrt(0.25)
_DCT[0] *= np.sqrt(0.5)


def _canonical_codes(bits, vals):
    """BITS/HUFFVAL -> {symbol: (code, length)} per T.81 C.2."""
    out, code = {}, 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


_LUT_CACHE: dict[tuple, tuple[bytes, bytes]] = {}


def _decode_table(bits, vals):
    """BITS/HUFFVAL -> flat 16-bit-prefix LUT ``(sym, len)`` as two bytes
    objects: a peeked 16-bit window indexes both in O(1) (bytes indexing
    is the fastest scalar lookup CPython offers). len 0 marks an invalid
    code. Cached per table definition — real streams almost always carry
    the Annex K tables, so the 64 KiB build cost is paid once."""
    key = (bits, vals)
    hit = _LUT_CACHE.get(key)
    if hit is not None:
        return hit
    sym_arr = np.zeros(1 << 16, np.uint8)
    len_arr = np.zeros(1 << 16, np.uint8)
    for s, (c, ln) in _canonical_codes(bits, vals).items():
        start = c << (16 - ln)
        sym_arr[start : start + (1 << (16 - ln))] = s
        len_arr[start : start + (1 << (16 - ln))] = ln
    if len(_LUT_CACHE) > 64:  # bound worker-process memory
        _LUT_CACHE.clear()
    out = (sym_arr.tobytes(), len_arr.tobytes())
    _LUT_CACHE[key] = out
    return out


# Encoder-side flat code tables: symbol -> (code, length) as numpy arrays.
_DC_CODE = np.zeros(12, np.uint32)
_DC_CLEN = np.zeros(12, np.uint32)
for _s, (_c, _l) in _canonical_codes(DC_BITS, DC_VALS).items():
    _DC_CODE[_s], _DC_CLEN[_s] = _c, _l
_AC_CODE = np.zeros(256, np.uint32)
_AC_CLEN = np.zeros(256, np.uint32)
for _s, (_c, _l) in _canonical_codes(AC_BITS, AC_VALS).items():
    _AC_CODE[_s], _AC_CLEN[_s] = _c, _l


def _size_bits(v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized T.81 magnitude coding: value -> (category, appended
    bits). Exact for |v| < 2^24 (frexp on float64)."""
    s = np.where(v == 0, 0, np.frexp(np.abs(v).astype(np.float64))[1]).astype(np.int64)
    bits = np.where(v > 0, v, v + (1 << s) - 1).astype(np.int64)
    return s, bits


def _entropy_encode(zz: np.ndarray) -> bytes:
    """Vectorized baseline entropy coder: zigzagged blocks (nblk, 64) ->
    stuffed scan bytes. Builds one flat (sortkey, code, length) entry
    list with numpy (DC diffs, ZRL runs, AC symbols, extra bits, EOBs),
    orders it, then bit-packs via a 16-wide bit matrix + packbits."""
    nblk = zz.shape[0]
    blocks = np.arange(nblk, dtype=np.int64)

    def key(b, pos, rank):
        return (b * 65 + pos) * 8 + rank

    keys, codes, lens = [], [], []

    # DC: differential magnitude + appended bits
    dc = zz[:, 0]
    diff = np.diff(dc, prepend=0)
    s, bits = _size_bits(diff)
    keys.append(key(blocks, 0, 0))
    codes.append(_DC_CODE[s])
    lens.append(_DC_CLEN[s])
    has = s > 0  # zero-length appended bits are dropped by the mask later
    keys.append(key(blocks[has], 0, 1))
    codes.append(bits[has].astype(np.uint32))
    lens.append(s[has].astype(np.uint32))

    # AC: run lengths between nonzeros inside each block
    pos = np.arange(1, 64, dtype=np.int64)
    nz = zz[:, 1:] != 0
    last_nz = np.where(nz, pos, 0).max(axis=1)  # 0 when block is AC-empty
    incl = np.maximum.accumulate(np.where(nz, pos, 0), axis=1)
    prev = np.concatenate(
        [np.zeros((nblk, 1), np.int64), incl[:, :-1]], axis=1
    )  # last nonzero strictly before each cell
    bi, ki = np.nonzero(nz)
    kpos = ki + 1
    run = kpos - prev[bi, ki] - 1
    v = zz[:, 1:][bi, ki]
    s, bits = _size_bits(v)
    nzrl = run >> 4
    rem = run & 15
    # ZRL entries (run >= 16): up to 3 per coefficient
    rep = np.repeat(np.arange(len(bi)), nzrl)
    if len(rep):
        zk = np.repeat(np.arange(3)[None, :], len(bi), axis=0)[
            np.arange(3)[None, :] < nzrl[:, None]
        ]
        keys.append(key(bi[rep], kpos[rep], zk))
        codes.append(np.full(len(rep), _AC_CODE[0xF0], np.uint32))
        lens.append(np.full(len(rep), _AC_CLEN[0xF0], np.uint32))
    sym = (rem << 4) | s
    keys.append(key(bi, kpos, 5))
    codes.append(_AC_CODE[sym])
    lens.append(_AC_CLEN[sym])
    keys.append(key(bi, kpos, 6))
    codes.append(bits.astype(np.uint32))
    lens.append(s.astype(np.uint32))

    # EOB for every block whose last nonzero is before position 63
    eob = blocks[last_nz < 63]
    keys.append(key(eob, 64, 0))
    codes.append(np.full(len(eob), _AC_CODE[0x00], np.uint32))
    lens.append(np.full(len(eob), _AC_CLEN[0x00], np.uint32))

    k = np.concatenate(keys)
    c = np.concatenate(codes)
    ln = np.concatenate(lens)
    order = np.argsort(k, kind="stable")
    c, ln = c[order], ln[order]

    # bit-pack: row i contributes its low `ln[i]` bits MSB-first
    width = np.arange(16, dtype=np.int64)[None, :]
    shift = ln[:, None].astype(np.int64) - 1 - width
    mat = (c[:, None].astype(np.int64) >> np.maximum(shift, 0)) & 1
    mask = width < ln[:, None]
    flat = mat[mask].astype(np.uint8)
    pad = (-len(flat)) % 8
    if pad:
        flat = np.concatenate([flat, np.ones(pad, np.uint8)])  # 1-fill
    out = np.packbits(flat)
    # byte stuffing (T.81 F.1.2.3): 0xFF -> 0xFF 0x00
    ff = np.nonzero(out == 0xFF)[0]
    if len(ff):
        out = np.insert(out, ff + 1, 0)
    return out.tobytes()


def encode_jpeg(pixels: np.ndarray) -> bytes:
    """Grayscale baseline JFIF from a (h, w) uint8 array."""
    h, w = pixels.shape
    ph, pw = (h + 7) & ~7, (w + 7) & ~7
    img = np.empty((ph, pw), np.float64)
    img[:h, :w] = pixels
    img[h:, :w] = pixels[h - 1 : h, :]  # edge-replicate pad
    img[:, w:] = img[:, w - 1 : w]
    img -= 128.0

    by, bx = ph // 8, pw // 8
    blocks = img.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    coef = np.einsum("ij,njk,lk->nil", _DCT, blocks, _DCT)
    q = np.round(coef / STD_LUMA_QUANT).astype(np.int64)
    zz = q.reshape(-1, 64)[:, ZIGZAG]

    scan = _entropy_encode(zz)

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    app0 = seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dqt = seg(0xDB, b"\x00" + bytes(
        int(STD_LUMA_QUANT.reshape(-1)[ZIGZAG][i]) for i in range(64)
    ))
    sof = seg(0xC0, b"\x08" + struct.pack(">HH", h, w) + b"\x01" + b"\x01\x11\x00")
    dht = seg(
        0xC4,
        b"\x00" + bytes(DC_BITS) + bytes(DC_VALS)
        + b"\x10" + bytes(AC_BITS) + bytes(AC_VALS),
    )
    sos = seg(0xDA, b"\x01" + b"\x01\x00" + b"\x00\x3f\x00")
    return b"\xff\xd8" + app0 + dqt + sof + dht + sos + scan + b"\xff\xd9"


def decode_jpeg(data: bytes) -> np.ndarray | None:
    """Decode a single-component 8-bit baseline JPEG to float32 grayscale.

    Uses the DQT/DHT tables carried in the stream. Returns ``None`` for
    anything outside baseline single-component (progressive, subsampled
    color, 12-bit) — the caller flags the row, mirroring the reference's
    warn-and-skip policy (/root/reference/src/main.rs:674-680).
    """
    if data[:2] != b"\xff\xd8":
        return None
    try:
        return _decode_jpeg_inner(data)
    except (IndexError, ValueError, struct.error):
        return None  # truncated/corrupt stream: flag, never raise


def _decode_jpeg_inner(data: bytes) -> np.ndarray | None:
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    w = h = None
    comp_q = dc_id = ac_id = None
    scan_start = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            return None
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (ln,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        payload = data[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                if pq != 0:
                    return None  # 16-bit tables: not baseline
                tbl = np.frombuffer(payload, np.uint8, 64, p + 1).astype(np.int32)
                quant[tq] = tbl[UNZIGZAG].reshape(8, 8)
                p += 65
        elif marker == 0xC4:
            p = 0
            while p + 17 <= len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0x0F
                bits = tuple(payload[p + 1 : p + 17])
                n = sum(bits)
                vals = tuple(payload[p + 17 : p + 17 + n])
                if len(vals) < n:
                    return None  # truncated table
                huff[(tc, th)] = _decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xC0:
            if payload[0] != 8 or payload[5] != 1:
                return None  # not 8-bit single-component
            h, w = struct.unpack(">HH", payload[1:5])
            if payload[7] != 0x11:
                return None  # subsampling on a 1-comp image: refuse
            comp_q = payload[8]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            return None  # non-baseline SOF
        elif marker == 0xDA:
            if payload[0] != 1:
                return None
            dc_id, ac_id = payload[2] >> 4, payload[2] & 0x0F
            scan_start = pos + 2 + ln
            break
        pos += 2 + ln
    if scan_start is None or w is None or comp_q not in quant:
        return None
    dc_tbl = huff.get((0, dc_id))
    ac_tbl = huff.get((1, ac_id))
    if dc_tbl is None or ac_tbl is None:
        return None

    # Extract entropy bytes: un-stuff 0xFF00, drop RST markers, stop at EOI.
    scan = bytearray()
    p = scan_start
    while p < len(data):
        b = data[p]
        if b == 0xFF:
            nxt = data[p + 1] if p + 1 < len(data) else 0xD9
            if nxt == 0x00:
                scan.append(0xFF)
                p += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                p += 2
                continue
            break  # EOI or next segment
        scan.append(b)
        p += 1
    # MSB-first bit cursor over the scan: an int accumulator refilled a
    # byte at a time (never more than ~24 bits wide), with logical zero
    # padding past the end; `used` counts consumed REAL bits so overruns
    # into padding are detected after the block loop.
    sdata = bytes(scan)
    total_real = len(sdata) * 8
    slen = len(sdata)
    dc_sym, dc_len = dc_tbl
    ac_sym, ac_len = ac_tbl
    acc = 0
    nacc = 0
    pos = 0
    used = 0

    by, bx = (h + 7) // 8, (w + 7) // 8
    zz = np.zeros((by * bx, 64), np.int64)
    prev_dc = 0
    for n in range(by * bx):
        # --- DC symbol (16-bit-prefix LUT) + magnitude bits
        while nacc < 16:
            acc = (acc << 8) | (sdata[pos] if pos < slen else 0)
            pos += 1
            nacc += 8
        peek = (acc >> (nacc - 16)) & 0xFFFF
        ln = dc_len[peek]
        if ln == 0:
            return None
        s = dc_sym[peek]
        nacc -= ln
        used += ln
        if s:
            while nacc < s:
                acc = (acc << 8) | (sdata[pos] if pos < slen else 0)
                pos += 1
                nacc += 8
            v = (acc >> (nacc - s)) & ((1 << s) - 1)
            nacc -= s
            used += s
            prev_dc += v if v >= (1 << (s - 1)) else v - (1 << s) + 1
        acc &= (1 << nacc) - 1
        zz[n, 0] = prev_dc
        # --- AC run-length symbols
        k = 1
        while k < 64:
            while nacc < 16:
                acc = (acc << 8) | (sdata[pos] if pos < slen else 0)
                pos += 1
                nacc += 8
            peek = (acc >> (nacc - 16)) & 0xFFFF
            ln = ac_len[peek]
            if ln == 0:
                return None
            rs = ac_sym[peek]
            nacc -= ln
            used += ln
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:  # ZRL
                    k += 16
                    continue
                break  # EOB
            k += r
            if k > 63:
                return None
            while nacc < s:
                acc = (acc << 8) | (sdata[pos] if pos < slen else 0)
                pos += 1
                nacc += 8
            v = (acc >> (nacc - s)) & ((1 << s) - 1)
            nacc -= s
            used += s
            zz[n, k] = v if v >= (1 << (s - 1)) else v - (1 << s) + 1
            acc &= (1 << nacc) - 1
            k += 1
    if used > total_real:
        return None  # ran into padding: truncated stream

    q = np.zeros((by * bx, 64), np.int64)
    q[:, ZIGZAG] = zz
    coef = q.reshape(-1, 8, 8) * quant[comp_q]
    blocks = np.einsum("ji,njk,kl->nil", _DCT, coef.astype(np.float64), _DCT)
    img = (
        blocks.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        + 128.0
    )
    return np.clip(img[:h, :w], 0, 255).astype(np.float32)
