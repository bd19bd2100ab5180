"""Golden end-to-end ER test (SURVEY.md §5.2 item 2, BASELINE.md F1 >= 0.99).

Planted exact/near/distractor ground truth -> run the full Ray pipeline ->
pairwise F1 over labeled pairs and exact golden-cluster parity.
"""

import pandas as pd
import pytest
import ray.data

from dedupe_rust_ray.config import ERConfig
from dedupe_rust_ray.pipelines.er import er_pipeline
from dedupe_rust_ray.sources.corpus import synth_corpus_table


def _pairwise_scores(labels: pd.DataFrame, clusters: pd.DataFrame):
    cl = dict(zip(clusters["doc_id"], clusters["cluster_id"]))
    tp = fp = fn = 0
    for _, r in labels.iterrows():
        same = cl.get(r.doc_a) is not None and cl.get(r.doc_a) == cl.get(r.doc_b)
        if r.is_dup and same:
            tp += 1
        elif r.is_dup and not same:
            fn += 1
        elif not r.is_dup and same:
            fp += 1
    prec = tp / max(1, tp + fp)
    rec = tp / max(1, tp + fn)
    return prec, rec, 2 * prec * rec / max(1e-9, prec + rec)


@pytest.fixture(scope="module")
def corpus():
    return synth_corpus_table(200, seed=42)


@pytest.fixture(scope="module")
def clusters(corpus):
    docs, _, _ = corpus
    return er_pipeline(ray.data.from_arrow(docs), ERConfig()).to_pandas()


def test_pairwise_f1(corpus, clusters):
    _, labels, _ = corpus
    prec, rec, f1 = _pairwise_scores(labels.to_pandas(), clusters)
    assert f1 >= 0.99, (prec, rec, f1)


def test_golden_cluster_parity(corpus, clusters):
    _, _, expected = corpus
    exp = set(map(tuple, expected.to_pandas()[["cluster_id", "doc_id"]].values))
    got = set(map(tuple, clusters[["cluster_id", "doc_id"]].values))
    assert exp == got


def test_output_sorted_and_canonical(clusters):
    assert clusters["cluster_id"].is_monotonic_increasing
    # cluster_id is the min member doc_id (reference canonicalization,
    # /root/reference/src/main.rs:630)
    mins = clusters.groupby("cluster_id")["doc_id"].min()
    assert (mins.index == mins.values).all()


def test_hash_join_scale_path_matches_broadcast(corpus, clusters):
    """Forcing the hash-join scorer path (broadcast_max_docs=0) must give
    the identical cluster set as the broadcast path."""
    docs, _, _ = corpus
    got = er_pipeline(
        ray.data.from_arrow(docs), ERConfig(broadcast_max_docs=0)
    ).to_pandas()
    a = set(map(tuple, clusters[["cluster_id", "doc_id"]].values))
    b = set(map(tuple, got[["cluster_id", "doc_id"]].values))
    assert a == b


def test_shard_count_invariance(corpus, clusters):
    """Cluster output must not depend on the shuffle shard count
    (SURVEY §5.2.4 salt/partitioning invariance)."""
    docs, _, _ = corpus
    got = er_pipeline(
        ray.data.from_arrow(docs), ERConfig(n_shards=7)
    ).to_pandas()
    a = set(map(tuple, clusters[["cluster_id", "doc_id"]].values))
    b = set(map(tuple, got[["cluster_id", "doc_id"]].values))
    assert a == b


def test_distributed_unionfind_path_matches_driver(corpus, clusters):
    """Forcing the distributed label-propagation clustering
    (driver_unionfind_max_edges=0) must reproduce the driver-DSU clusters."""
    docs, _, _ = corpus
    got = er_pipeline(
        ray.data.from_arrow(docs), ERConfig(driver_unionfind_max_edges=0)
    ).to_pandas()
    a = set(map(tuple, clusters[["cluster_id", "doc_id"]].values))
    b = set(map(tuple, got[["cluster_id", "doc_id"]].values))
    assert a == b


def test_permutation_invariance(corpus, clusters):
    """Shuffling input rows yields the identical cluster set
    (SURVEY.md §5.2 item 4)."""
    import numpy as np

    docs, _, _ = corpus
    perm = np.random.default_rng(7).permutation(docs.num_rows)
    ds = ray.data.from_arrow(docs.take(perm))
    got = er_pipeline(ds, ERConfig()).to_pandas()
    a = set(map(tuple, clusters[["cluster_id", "doc_id"]].values))
    b = set(map(tuple, got[["cluster_id", "doc_id"]].values))
    assert a == b


def test_semijoin_candidate_broadcast_path_matches(corpus, clusters):
    """When the corpus exceeds the broadcast ceiling but the CANDIDATE set
    fits, scoring reduces the broadcast to candidate profiles (semi-join
    reduction) — output must be identical to the default path."""
    docs, _, _ = corpus
    # ceiling below the 200-doc corpus, above the candidate-endpoint count
    got = er_pipeline(
        ray.data.from_arrow(docs), ERConfig(broadcast_max_docs=199)
    ).to_pandas()
    a = set(map(tuple, clusters[["cluster_id", "doc_id"]].values))
    b = set(map(tuple, got[["cluster_id", "doc_id"]].values))
    assert a == b


def test_empty_corpus_yields_empty_clusters():
    import pyarrow as pa

    schema = pa.schema(
        [
            ("doc_id", pa.string()),
            (
                "spans",
                pa.list_(
                    pa.struct(
                        [
                            ("kind", pa.string()),
                            ("text", pa.string()),
                            ("media_ref", pa.string()),
                            ("offset", pa.int32()),
                        ]
                    )
                ),
            ),
        ]
    )
    empty = pa.table(
        {"doc_id": pa.array([], pa.string()), "spans": pa.array([], schema.field("spans").type)}
    )
    out = er_pipeline(ray.data.from_arrow(empty), ERConfig()).to_pandas()
    assert len(out) == 0


def test_64_byte_identical_docs_one_cluster():
    """Pathological full-skew corpus: every doc byte-identical. The exact
    fast path must produce ONE cluster without a candidate-pair blow-up."""
    import pyarrow as pa

    spans = [
        [{"kind": "text", "text": "same text every time", "media_ref": "", "offset": 0}]
    ] * 64
    docs = pa.table(
        {
            "doc_id": pa.array([f"d{i:03d}" for i in range(64)]),
            "spans": spans,
        }
    )
    out = er_pipeline(ray.data.from_arrow(docs), ERConfig()).to_pandas()
    assert len(out) == 64
    assert out["cluster_id"].nunique() == 1
    assert out["cluster_id"].iloc[0] == "d000"
