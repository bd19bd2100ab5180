"""Structural pins for the round-5 planted/contract oracles:
er_incremental_planted, embedding_clusters_planted, hll_registers_md5.
Value certification runs through oracle_sql() (driver harness and
scripts/check_oracle.py); these pin the invariants the closed forms
rest on at fixture scale.
"""

from __future__ import annotations

import hashlib

import numpy as np

SF = "/root/testdata/sf0.001"


def test_er_incremental_planted_matches_batch_flagship():
    import importlib

    m = importlib.import_module("__ray_entry__")
    qs = m.queries()
    inc = qs["er_incremental_planted"](SF)
    batch = qs["er_clusters"](SF)
    batch = batch.to_pandas() if hasattr(batch, "to_pandas") else batch
    a = inc.sort_values(["cluster_id", "doc_id"]).reset_index(drop=True)
    b = batch.sort_values(["cluster_id", "doc_id"]).reset_index(drop=True)
    assert a.equals(b[a.columns])


def test_embedding_clusters_planted_invariants():
    from dedupe_rust_ray.pipelines.curation import embedding_clusters_planted

    df = embedding_clusters_planted(SF)
    assert (df["n_cells_distinct"] == 1).all()
    assert (df["n_cos_distinct"] == 1).all()
    assert df["grp"].tolist() == sorted(df["grp"].tolist())


def test_hll_registers_md5_matches_local_replica():
    import pyarrow.parquet as pq

    from dedupe_rust_ray.functions.sketches import registers_from_hashes
    from dedupe_rust_ray.pipelines.textpipe import hll_registers_md5

    got = hll_registers_md5(SF)
    assert (got["reg"] >= 0).all() and (got["reg"] < 4096).all()
    assert (got["rho"] >= 1).all() and (got["rho"] <= 53).all()

    t = pq.read_table(f"{SF}/documents.parquet", columns=["lang", "text"])
    langs = t["lang"].to_pylist()
    texts = t["text"].to_pylist()
    h = np.array(
        [
            int.from_bytes(
                hashlib.md5((x or "").encode("utf-8")).digest()[:8], "big"
            )
            for x in texts
        ],
        dtype=np.uint64,
    )
    reg, rho = registers_from_hashes(h)
    import pandas as pd

    exp = (
        pd.DataFrame({"lang": langs, "reg": reg, "rho": rho})
        .groupby(["lang", "reg"], as_index=False)["rho"]
        .max()
        .sort_values(["lang", "reg"])
        .reset_index(drop=True)
    )
    got2 = got.sort_values(["lang", "reg"]).reset_index(drop=True)
    assert got2["reg"].tolist() == exp["reg"].tolist()
    assert got2["rho"].tolist() == exp["rho"].tolist()
