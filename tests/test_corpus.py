import pyarrow as pa

from dedupe_rust_ray.sources.corpus import (
    DOCS_SCHEMA,
    media_payload,
    synth_corpus_table,
)


def test_schema_matches_input_hint():
    docs, _, _ = synth_corpus_table(50)
    assert docs.schema.equals(DOCS_SCHEMA)


def test_deterministic_regeneration():
    a, la, ca = synth_corpus_table(80, seed=42)
    b, lb, cb = synth_corpus_table(80, seed=42)
    assert a.equals(b)
    assert la.equals(lb)
    assert ca.equals(cb)


def test_label_kinds_and_clusters():
    docs, labels, clusters = synth_corpus_table(300, seed=42)
    kinds = set(labels["kind"].to_pylist())
    assert kinds == {"exact", "near", "distractor"}
    # every expected cluster has >= 2 members and cluster_id == min(doc_id)
    df = clusters.to_pandas()
    sizes = df.groupby("cluster_id").size()
    assert (sizes >= 2).all()
    assert (df.groupby("cluster_id")["doc_id"].min() == sizes.index).all()


def test_span_offsets_strictly_increasing():
    docs, _, _ = synth_corpus_table(40, seed=1)
    for spans in docs["spans"].to_pylist():
        offs = [s["offset"] for s in spans]
        assert offs == list(range(len(spans)))


def test_media_payload_noise_is_small():
    import numpy as np

    base = media_payload("media://aabbccddeeff0011")
    noisy = media_payload("media://aabbccddeeff0011.n1")
    assert np.abs(base - noisy).max() <= 3.0
