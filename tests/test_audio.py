"""WAV codec + audio feature stage (stages/audio.py)."""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import pytest

from dedupe_rust_ray.stages.audio import (
    SAMPLE_RATE,
    AudioFeatures,
    encode_wav,
    parse_wav,
    planted_tone_params,
    synth_audio_batch,
)


def test_wav_roundtrip_and_odd_length():
    x = (np.sin(np.arange(777) * 0.07) * 30000).astype("<i2")
    sr, y = parse_wav(encode_wav(x, 44100))
    assert sr == 44100
    assert np.array_equal(x, y)


def test_parse_tolerates_extra_chunks():
    x = np.array([1, -2, 3], dtype="<i2")
    wav = bytearray(encode_wav(x))
    # splice a LIST chunk (odd-sized, so word-alignment padding is hit)
    extra = struct.pack("<4sI", b"LIST", 5) + b"INFOx" + b"\x00"
    out = wav[:12] + extra + wav[12:]
    out[4:8] = struct.pack("<I", len(out) - 8)
    sr, y = parse_wav(bytes(out))
    assert sr == SAMPLE_RATE and np.array_equal(x, y)


@pytest.mark.parametrize(
    "payload",
    [b"", b"RIFFxxxx", b"RIFF\x00\x00\x00\x00WAVE", b"garbage" * 10],
)
def test_parse_rejects_garbage(payload):
    with pytest.raises(ValueError):
        parse_wav(payload)


def test_features_measure_planted_tones_and_flag_errors():
    ids = np.arange(24, dtype=np.int64)
    t = synth_audio_batch(pa.table({"doc_id": pa.array(ids)}))
    # corrupt one payload
    payloads = t["payload"].to_pylist()
    payloads[7] = b"not a wav"
    t = pa.table({"media_id": t["media_id"], "payload": pa.array(payloads, type=pa.binary())})
    df = AudioFeatures()(t).to_pandas().set_index("media_id")

    assert not df.loc[7, "ok"] and df.loc[7, "err"].startswith("decode_error")
    good = df.drop(index=7)
    freq, n, amp = planted_tone_params(good.index.to_numpy())
    assert (good["dom_freq_hz"].to_numpy() == freq).all()
    assert (good["n_samples"].to_numpy() == n).all()
    # rms of a sine ~ a/sqrt(2); zcr ~ 2f/sr
    assert np.allclose(good["rms"], amp / np.sqrt(2), atol=0.01)
    assert np.allclose(good["zcr"], 2 * freq / SAMPLE_RATE, atol=0.01)


def test_audio_features_pipeline_matches_planted(tmp_path):
    import pandas as pd

    from dedupe_rust_ray.pipelines.multimodal import audio_features

    pd.DataFrame(
        {
            "doc_id": np.arange(40, dtype=np.int64),
            "text": "t",
            "lang": "en",
            "source": "s",
            "n_chars": 1,
        }
    ).to_parquet(tmp_path / "documents.parquet")
    out = audio_features(str(tmp_path)).to_pandas()
    freq, n, _ = planted_tone_params(out["media_id"].to_numpy())
    assert (out["dom_freq_hz"].to_numpy() == freq).all()
    assert (out["duration_ms"].to_numpy() == n * 1000 // SAMPLE_RATE).all()
