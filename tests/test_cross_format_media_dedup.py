"""Cross-container image near-dup through the ER pipeline (VERDICT r2
stretch): media_refs can embed REAL container bytes (``data:hex,``) which
the signature stage decodes through the same codec stack as the media
pipelines — so pixel-identical images in different formats share a pHash,
a blocking key, and a media score of 1.0 (the reference's decoded-pixel
duplicate semantics across containers, /root/reference/src/main.rs:593-681)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from dedupe_rust_ray.config import ERConfig
from dedupe_rust_ray.pipelines.er import er_pipeline
from dedupe_rust_ray.sources.corpus import DOCS_SCHEMA, media_payload_batch
from dedupe_rust_ray.stages.multimodal import encode_bmp, encode_png, encode_webp


def _media_doc(doc_id: str, payload: bytes) -> dict:
    return {
        "doc_id": doc_id,
        "spans": [
            {
                "kind": "media",
                "text": "",
                "media_ref": "data:hex," + payload.hex(),
                "offset": 0,
            }
        ],
    }


@pytest.fixture(scope="module")
def pixels():
    rng = np.random.default_rng(5)
    p = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    q = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    return p, q


def test_data_refs_decode_to_identical_grids(pixels):
    p, _ = pixels
    refs = [
        "data:hex," + encode_png(p).hex(),
        "data:hex," + encode_webp(p).hex(),
        "data:hex," + encode_bmp(p).hex(),
    ]
    grids = media_payload_batch(refs, 32)
    assert np.array_equal(grids[0], grids[1])
    assert np.array_equal(grids[0], grids[2])
    assert np.array_equal(grids[0], p.astype(np.float32))


def test_garbage_data_ref_falls_back_deterministically():
    grids_a = media_payload_batch(["data:hex,zz-not-hex"], 32)
    grids_b = media_payload_batch(["data:hex,zz-not-hex"], 32)
    assert np.array_equal(grids_a, grids_b)  # warn-and-skip, deterministic


def test_er_clusters_cross_format_planted_dup(pixels):
    p, q = pixels
    rows = [
        _media_doc("doc-a-png", encode_png(p)),
        _media_doc("doc-b-webp", encode_webp(p)),
        _media_doc("doc-c-png-other", encode_png(q)),
        _media_doc("doc-d-bmp", encode_bmp(q)),
    ]
    docs = ray.data.from_arrow(
        pa.Table.from_pylist(rows, schema=DOCS_SCHEMA)
    )
    got = (
        er_pipeline(docs, ERConfig())
        .to_pandas()
        .sort_values(["cluster_id", "doc_id"], ignore_index=True)
    )
    # P in PNG and P in WebP cluster; Q in PNG and Q in BMP cluster;
    # the two clusters stay apart
    assert got.values.tolist() == [
        ["doc-a-png", "doc-a-png"],
        ["doc-a-png", "doc-b-webp"],
        ["doc-c-png-other", "doc-c-png-other"],
        ["doc-c-png-other", "doc-d-bmp"],
    ]
