"""Planted-truth certification of the approximate ANN/prune family
(VERDICT r4 missing-item #2): knn_lsh, knn_ivf and semdedup over the
one-hot planted embedding table have closed-form expected answers in pure
vec_id arithmetic, and fingerprint_dedup over the salted planted corpus
keeps exactly the original id domain.

The structural guarantees the closed forms rest on are pinned here; the
value certification itself runs through oracle_sql() in the driver
harness and scripts/check_oracle.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from dedupe_rust_ray.pipelines.curation import semdedup_planted
from dedupe_rust_ray.pipelines.similarity import (
    PLANTED_N_GROUPS,
    _planted_queries,
    knn_ivf_planted,
    knn_lsh_planted,
    planted_onehot_embeddings,
)
from dedupe_rust_ray.pipelines.textpipe import fingerprint_dedup_planted

SF = "/root/testdata/sf0.001"


def _expected_knn(ids: np.ndarray, n_queries: int = 10, k: int = 10):
    rows = []
    for q in range(n_queries):
        grp = sorted(i for i in ids if i % PLANTED_N_GROUPS == q % PLANTED_N_GROUPS and i != q)
        for n in grp[:k]:
            rows.append((q, n, 1.0))
    return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "cos_sim"])


def test_planted_table_is_exact_onehot():
    t = planted_onehot_embeddings(SF).take_all()
    ids = np.array([r["vec_id"] for r in t])
    M = np.stack([np.asarray(r["embedding"]) for r in t])
    assert M.shape[1] == PLANTED_N_GROUPS
    # exactly one 1.0 per row, at vec_id % n_groups — norms exact
    assert (M.sum(axis=1) == 1.0).all()
    assert (M.argmax(axis=1) == ids % PLANTED_N_GROUPS).all()
    assert ((M == 0.0) | (M == 1.0)).all()
    # queries are bit-identical to the data vectors of their group
    qids, Q = _planted_queries(10)
    assert (Q.argmax(axis=1) == qids % PLANTED_N_GROUPS).all()
    assert (np.linalg.norm(Q, axis=1) == 1.0).all()


def test_knn_planted_closed_form_and_deterministic():
    t = planted_onehot_embeddings(SF).select_columns(["vec_id"]).take_all()
    ids = np.array(sorted(r["vec_id"] for r in t))
    exp = _expected_knn(ids)
    for fn in (knn_lsh_planted, knn_ivf_planted):
        a = fn(SF).sort_values(["query_id", "neighbor_id"], ignore_index=True)
        b = fn(SF).sort_values(["query_id", "neighbor_id"], ignore_index=True)
        pd.testing.assert_frame_equal(a, b)  # run-to-run determinism
        pd.testing.assert_frame_equal(
            a[["query_id", "neighbor_id", "cos_sim"]].astype(
                {"query_id": np.int64, "neighbor_id": np.int64}
            ),
            exp.astype({"query_id": np.int64, "neighbor_id": np.int64}),
        )


def test_semdedup_planted_closed_form():
    out = semdedup_planted(SF).to_pandas()
    t = planted_onehot_embeddings(SF).select_columns(["vec_id"]).take_all()
    ids = np.array(sorted(r["vec_id"] for r in t))
    grp_min = {}
    for i in ids:
        grp_min.setdefault(int(i % PLANTED_N_GROUPS), int(i))
    exp = pd.DataFrame(
        [
            (int(i), grp_min[int(i % PLANTED_N_GROUPS)], 1.0)
            for i in ids
            if int(i) != grp_min[int(i % PLANTED_N_GROUPS)]
        ],
        columns=["removed_id", "keeper_id", "cos_sim"],
    )
    pd.testing.assert_frame_equal(
        out.sort_values("removed_id", ignore_index=True).astype(
            {"removed_id": np.int64, "keeper_id": np.int64}
        ),
        exp.sort_values("removed_id", ignore_index=True),
    )


def test_fingerprint_dedup_planted_keeps_id_domain():
    import pyarrow.parquet as pq

    keep = fingerprint_dedup_planted(SF).to_pandas()["doc_id"].to_numpy()
    ids = np.sort(
        pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])["doc_id"]
        .to_numpy()
    )
    assert (np.sort(keep) == ids).all()
