"""Planted-truth certification of the media family (VERDICT r4
missing-item #2 applied to media_features / media_thumbnails /
media_phash / video_frame_sample): solid-gray lossless payloads make
decoded dims/means closed-form, byte-identical noise payloads make the
equal-pHash pair set closed-form, and closed-form payload lengths make
frame sampling closed-form — all through the UNCHANGED production
stages. The value certification itself runs through oracle_sql() in the
driver harness and scripts/check_oracle.py; this file pins the
structural guarantees the closed forms rest on.
"""

from __future__ import annotations

import numpy as np

from dedupe_rust_ray.pipelines.multimodal import (
    _LOSSLESS_FORMATS,
    _PLANTED_MEDIA_OFFSET,
    media_features_planted,
    media_phash_planted,
    media_thumbnails_planted,
    planted_solid_media,
    video_frame_sample_planted,
)
from dedupe_rust_ray.stages.multimodal import (
    _DIM_CHOICES,
    decode_bmp,
    decode_gif,
    decode_png,
)
from dedupe_rust_ray.stages.webp import decode_webp

SF = "/root/testdata/sf0.001"

_DECODERS = {
    "png": decode_png,
    "bmp": decode_bmp,
    "gif": decode_gif,
    "webp": decode_webp,
}


def test_lossless_solid_roundtrip_every_color():
    """All four lossless codecs reproduce EVERY gray value exactly on a
    solid image — the invariant mean_brightness/thumb_mean truth needs."""
    from dedupe_rust_ray.stages.multimodal import (
        encode_bmp,
        encode_gif,
        encode_png,
    )
    from dedupe_rust_ray.stages.webp import encode_webp

    encoders = {
        "png": encode_png,
        "bmp": encode_bmp,
        "gif": encode_gif,
        "webp": encode_webp,
    }
    for color in (0, 1, 73, 74, 127, 128, 254, 255):
        img = np.full((16, 16), color, np.uint8)
        for fmt, enc in encoders.items():
            out = _DECODERS[fmt](enc(img))
            assert out is not None, (fmt, color)
            assert float(out.mean()) == float(color), (fmt, color)


def test_planted_solid_media_is_closed_form():
    rows = planted_solid_media(SF).take_all()
    for r in rows:
        d = int(r["media_id"][2:])
        assert r["fmt"] == _LOSSLESS_FORMATS[d % 4]
        w, h = _DIM_CHOICES[(d // 4) % len(_DIM_CHOICES)]
        img = _DECODERS[r["fmt"]](r["payload"])
        assert img.shape == (h, w)
        assert float(img.mean()) == float((d * 37) % 256)


def test_media_features_planted_values():
    df = media_features_planted(SF).to_pandas()
    ids = df["media_id"].str[2:].astype(np.int64)
    assert bool(df["ok"].all()) and (df["err"] == "").all()
    assert (df["mean_brightness"] == ((ids * 37) % 256).astype(float)).all()
    assert (
        df["width"].to_numpy()
        == np.array([_DIM_CHOICES[i][0] for i in (ids // 4) % 5])
    ).all()


def test_media_thumbnails_planted_values():
    df = media_thumbnails_planted(SF).to_pandas()
    ids = df["media_id"].str[2:].astype(np.int64)
    assert (df["err"] == "").all()
    assert (df["thumb_mean"] == ((ids * 37) % 256).astype(float)).all()


def test_media_phash_planted_pairs_are_exactly_the_plants():
    df = media_phash_planted(SF).to_pandas()
    a = df["media_a"].str[2:].astype(np.int64).to_numpy()
    b = df["media_b"].str[2:].astype(np.int64).to_numpy()
    assert (a % 10 == 0).all()
    assert (b == a + _PLANTED_MEDIA_OFFSET).all()
    # every planted pair present (one per 10th doc), nothing organic
    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    assert len(df) == (n_docs + 9) // 10


def test_video_frame_sample_planted_counts():
    df = video_frame_sample_planted(SF).to_pandas()
    ids = df["media_id"].str[2:].astype(np.int64)
    n_frames = 1 + ids % 40
    assert (df["frame_idx"] < n_frames).all()
    assert (df["frame_idx"] % 10 == 0).all()
    assert (df["frame_bytes"] == 16 * 16 * 4).all()
    assert (df["decoder"] == "synthetic").all()
