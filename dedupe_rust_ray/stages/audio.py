"""Audio payload synthesis, WAV codec, and spectral feature extraction.

The audio leg of the multimodal plumbing (same contract as
``stages/multimodal.py``'s image path, generalizing the reference's
decode-then-hash phase, /root/reference/src/main.rs:593-681): payloads are
REAL RIFF/WAVE PCM16 bytes produced by :func:`encode_wav`, the decode
stage re-parses them from the bytes (never trusting metadata), and
features come from the decoded samples.

Synthesis is a closed-form function of ``doc_id`` — a pure sine at
``100 + (doc_id % 40) * 20`` Hz, ``2000 + (doc_id % 2) * 2000`` samples at
8 kHz, plus low-amplitude deterministic noise — with the tone frequency
always an exact rFFT bin (f divisible by sr/n for both lengths), so the
spectral-peak feature the pipeline measures equals the planted value and
the whole synth -> WAV-encode -> parse -> FFT path is verifiable against
a closed-form SQL oracle.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from ..functions.shingles import splitmix64

SAMPLE_RATE = 8000


def encode_wav(samples: np.ndarray, sample_rate: int = SAMPLE_RATE) -> bytes:
    """Minimal canonical RIFF/WAVE: PCM16 mono, fmt + data chunks."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
    )
    data = struct.pack("<4sI", b"data", len(pcm)) + pcm
    body = b"WAVE" + fmt + data
    return struct.pack("<4sI", b"RIFF", len(body)) + body


def parse_wav(data: bytes) -> tuple[int, np.ndarray]:
    """Parse RIFF/WAVE bytes -> (sample_rate, int16 samples). Walks chunks
    (tolerates extras like LIST/INFO); raises ValueError on malformed
    input — callers convert that into a per-row error flag."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not RIFF/WAVE")
    pos, sr, pcm = 12, None, None
    while pos + 8 <= len(data):
        cid, size = data[pos : pos + 4], struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("short fmt chunk")
            audio_fmt, channels, sr = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError(f"unsupported wav ({audio_fmt},{channels},{bits})")
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if sr is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    return sr, np.frombuffer(pcm[: len(pcm) & ~1], dtype="<i2")


def planted_tone_params(doc_ids: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(freq_hz, n_samples, amplitude) planted for each doc id; freq is an
    exact rFFT bin for every n (sr/n in {4, 2} Hz and freq % 4 == 0)."""
    ids = np.asarray(doc_ids, dtype=np.int64)
    freq = 100 + (ids % 40) * 20
    n = 2000 + (ids % 2) * 2000
    amp = 0.3 + (ids % 5) * 0.1
    return freq, n, amp


def synth_audio_batch(batch: pa.Table) -> pa.Table:
    """One WAV payload per doc id (deterministic; payload is real bytes)."""
    ids = batch["doc_id"].to_numpy()
    freqs, ns, amps = planted_tone_params(ids)
    payloads = []
    for did, f, n, a in zip(ids, freqs, ns, amps):
        t = np.arange(n, dtype=np.float64) / SAMPLE_RATE
        wave = a * np.sin(2 * np.pi * f * t)
        # deterministic dither, small enough never to move the FFT argmax
        noise_bits = splitmix64(
            np.arange(n, dtype=np.uint64) ^ np.uint64(did * 0x9E37 + 1)
        )
        wave += 0.02 * ((noise_bits >> np.uint64(11)).astype(np.float64)
                        / float(1 << 53) - 0.5)
        payloads.append(encode_wav(np.round(wave * 32767.0).astype("<i2")))
    return pa.table(
        {
            "media_id": pa.array(ids, type=pa.int64()),
            "payload": pa.array(payloads, type=pa.binary()),
        }
    )


class AudioFeatures:
    """Actor-pool decode + spectral features. Per-row error policy: a
    payload that fails to parse yields ok=False with an err label, never a
    dead task (the repo-wide decode contract)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_numpy()
        out = {
            "media_id": ids,
            "ok": np.ones(len(ids), dtype=bool),
            "err": np.full(len(ids), "", dtype=object),
            "n_samples": np.zeros(len(ids), dtype=np.int64),
            "duration_ms": np.zeros(len(ids), dtype=np.int64),
            "dom_freq_hz": np.zeros(len(ids), dtype=np.int64),
            "rms": np.zeros(len(ids), dtype=np.float64),
            "zcr": np.zeros(len(ids), dtype=np.float64),
        }
        payloads = batch["payload"]
        for i in range(len(ids)):
            try:
                sr, pcm = parse_wav(payloads[i].as_py())
                x = pcm.astype(np.float64) / 32768.0
                n = len(x)
                if n == 0:
                    raise ValueError("empty pcm")
                spec = np.abs(np.fft.rfft(x))
                spec[0] = 0.0  # ignore DC
                out["n_samples"][i] = n
                out["duration_ms"][i] = (n * 1000) // sr
                out["dom_freq_hz"][i] = int(round(np.argmax(spec) * sr / n))
                out["rms"][i] = float(np.sqrt(np.mean(x * x)))
                out["zcr"][i] = float(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])) / max(n - 1, 1))
            except (ValueError, struct.error) as e:
                out["ok"][i] = False
                out["err"][i] = f"decode_error:{e}"
        out["rms"] = np.floor(out["rms"] * 1e4 + 0.5) / 1e4
        out["zcr"] = np.floor(out["zcr"] * 1e4 + 0.5) / 1e4
        return pa.table(
            {k: pa.array(v) for k, v in out.items()}
        )
