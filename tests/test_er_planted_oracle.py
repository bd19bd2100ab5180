"""Pins for the flagship's VALUE oracle (the ``er_clusters`` driver row).

``sources/corpus.corpus_planted_truth`` constructs a corpus whose expected
cluster table is closed-form in doc_id arithmetic (see its docstring for
the structural guarantees); these tests prove, at fixture scale, that

1. the ER pipeline recovers EXACTLY the planted truth (no misses, no
   organic extras) — the property the driver's hash-match row certifies
   at sf0.01;
2. the forced distributed connected-components path
   (``driver_unionfind_max_edges=0``, what the registered query runs)
   equals the driver union-find path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from dedupe_rust_ray.config import ERConfig
from dedupe_rust_ray.pipelines.er import er_pipeline
from dedupe_rust_ray.sources.corpus import corpus_planted_truth


@pytest.fixture(scope="module")
def flat_docs_dir(tmp_path_factory):
    """A small flat documents table shaped like the driver's (doc_id
    int64 + text), including short and empty texts (the organic corpus's
    known recall hazard — the planted-truth construction must be immune)."""
    rng = np.random.default_rng(3)
    words = [f"w{i}" for i in range(50)]
    texts = []
    for i in range(60):
        if i % 17 == 0:
            texts.append("")  # empty text
        elif i % 7 == 0:
            texts.append("one two")  # very short
        else:
            texts.append(" ".join(rng.choice(words, rng.integers(5, 40))))
    # two byte-identical texts (organic exact dups in the flat table) —
    # salting must keep them from clustering in the planted-truth corpus
    texts[3] = texts[5]
    d = tmp_path_factory.mktemp("flat")
    pd.DataFrame(
        {"doc_id": np.arange(60, dtype=np.int64), "text": texts}
    ).to_parquet(d / "documents.parquet")
    return str(d)


def expected_clusters(n_docs: int = 60, dup_every: int = 10) -> pd.DataFrame:
    rows = []
    for i in range(0, n_docs, dup_every):
        base = f"doc-{i:09d}"
        rows.append((base, base))
        rows.append((base, base + "-dup"))
    return pd.DataFrame(rows, columns=["cluster_id", "doc_id"])


def test_planted_truth_exact_recovery(flat_docs_dir):
    got = (
        er_pipeline(corpus_planted_truth(flat_docs_dir), ERConfig())
        .to_pandas()
        .sort_values(["cluster_id", "doc_id"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, expected_clusters())


def test_forced_distributed_cc_path_matches(flat_docs_dir):
    cfg = ERConfig(driver_unionfind_max_edges=0)
    got = (
        er_pipeline(corpus_planted_truth(flat_docs_dir), cfg)
        .to_pandas()
        .sort_values(["cluster_id", "doc_id"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, expected_clusters())


def test_er_pairwise_f1_computes_not_echoes():
    """Headline-metric query: perfect F1 on matched truth; against a
    STRICTER truth set (every 5th doc true while only every 10th was
    planted) precision stays 1.0 but recall and F1 must drop to the exact
    rational values — the metric measures the cluster table, it does not
    assert the closed form."""
    import pyarrow.parquet as pq

    from dedupe_rust_ray.pipelines.er import er_pairwise_f1_planted

    sf = "/root/testdata/sf0.001"
    row = er_pairwise_f1_planted(sf).iloc[0]
    assert (
        row["precision_scaled"]
        == row["recall_scaled"]
        == row["f1_scaled"]
        == 1_000_000
    )
    assert row["n_tp"] == row["n_pred_pairs"] == row["n_true_pairs"]
    ids = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id"])[
        "doc_id"
    ].to_numpy()
    n10 = int((ids % 10 == 0).sum())
    n5 = int((ids % 5 == 0).sum())
    strict = er_pairwise_f1_planted(sf, truth_dup_every=5).iloc[0]
    assert strict["precision_scaled"] == 1_000_000
    assert strict["recall_scaled"] == (1_000_000 * n10) // n5
    assert strict["f1_scaled"] == (2_000_000 * n10) // (n10 + n5)
