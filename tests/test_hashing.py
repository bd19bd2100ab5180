import numpy as np
import pyarrow as pa

from dedupe_rust_ray.functions.hashing import (
    canonical_span_strings,
    content_hash_batch,
    stable_hash64,
)
from dedupe_rust_ray.sources.corpus import DOCS_SCHEMA


def test_stable_hash_deterministic():
    a = stable_hash64(["x", "y", "x", ""])
    b = stable_hash64(["x", "y", "x", ""])
    assert a.dtype == np.uint64
    assert (a == b).all()
    assert a[0] == a[2]
    assert a[0] != a[1]


def _docs(spans_lists):
    return pa.Table.from_pydict(
        {
            "doc_id": [f"d{i}" for i in range(len(spans_lists))],
            "spans": spans_lists,
        },
        schema=DOCS_SCHEMA,
    )


def test_content_hash_span_sequence_equality():
    s1 = [
        {"kind": "text", "text": "hello", "media_ref": "", "offset": 0},
        {"kind": "media", "text": "", "media_ref": "media://aa", "offset": 1},
    ]
    s2 = [dict(x) for x in s1]
    s3 = [dict(s1[1], offset=0), dict(s1[0], offset=1)]  # reordered
    s4 = [dict(s1[0]), dict(s1[1], media_ref="media://bb")]
    t = content_hash_batch(_docs([s1, s2, s3, s4]))
    h = t["content_hash"].to_pylist()
    assert h[0] == h[1]
    assert h[0] != h[2]  # order matters (span-sequence equality)
    assert h[0] != h[3]


def test_canonical_strings_preserve_all_fields():
    s = [{"kind": "text", "text": "a\x1fb", "media_ref": "", "offset": 0}]
    out = canonical_span_strings(_docs([s])["spans"])
    assert len(out) == 1
    assert "a\x1fb" in out[0]
