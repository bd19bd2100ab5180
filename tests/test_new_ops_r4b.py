"""Second round-4 operator batch (reshape/analytics): global NTILE via
bucketed prefix-sum rank, deterministic per-group mode, partition-total
window share, and survivorship golden records.  Each has a driver SQL
oracle; these tests pin the kernels against independent pandas replicas
at sf0.001 plus crafted edge cases (n < k tiles, mode count ties,
single-nation share, all-unique prefixes)."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def test_ntile_matches_pandas_replica():
    from dedupe_rust_ray.pipelines.reshape import ntile_customers

    got = ntile_customers(SF, k=4).to_pandas().reset_index(drop=True)
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    cust = cust.sort_values(["c_acctbal", "c_custkey"], ignore_index=True)
    n, k = len(cust), 4
    q, r0 = divmod(n, k)
    rank = np.arange(n)
    cut = r0 * (q + 1)
    tile = np.where(rank < cut, rank // (q + 1), r0 + (rank - cut) // max(q, 1)) + 1
    exp = (
        pd.DataFrame({"c_custkey": cust["c_custkey"].astype("int64"), "tile": tile})
        .sort_values("c_custkey", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, exp.astype({"tile": "int64"}))


def test_ntile_fewer_rows_than_tiles(ray_session, tmp_path):
    # SQL NTILE with n < k gives each row its own tile (1..n)
    from dedupe_rust_ray.pipelines.reshape import ntile_customers

    pd.DataFrame(
        {"c_custkey": [7, 3, 9], "c_acctbal": [5.00, 1.25, 1.25]}
    ).to_parquet(tmp_path / "customer.parquet")
    got = ntile_customers(str(tmp_path), k=10).to_pandas()
    # order (acctbal, custkey): 3, 9, 7 -> tiles 1, 2, 3
    exp = {3: 1, 9: 2, 7: 3}
    assert dict(zip(got["c_custkey"], got["tile"])) == exp


def test_mode_matches_bruteforce():
    from dedupe_rust_ray.pipelines.reshape import mode_quantity_by_flag

    got = mode_quantity_by_flag(SF).reset_index(drop=True)
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    df = pd.DataFrame(
        {
            "l_returnflag": li["l_returnflag"],
            "qty": li["l_quantity"].astype("int64"),
        }
    )
    cnt = df.groupby(["l_returnflag", "qty"], as_index=False).size()
    cnt = cnt.sort_values(
        ["l_returnflag", "size", "qty"], ascending=[True, False, True]
    )
    exp = cnt.groupby("l_returnflag", as_index=False).first()
    for r in exp.itertuples():
        row = got[got["l_returnflag"] == r.l_returnflag].iloc[0]
        assert row["mode_qty"] == r.qty and row["n_rows"] == r.size


def test_mode_tie_breaks_to_smallest_value(ray_session, tmp_path):
    from dedupe_rust_ray.pipelines.reshape import mode_quantity_by_flag

    pd.DataFrame(
        {
            "l_returnflag": ["A"] * 4 + ["B"] * 3,
            "l_quantity": [9.0, 9.0, 2.0, 2.0, 5.0, 5.0, 1.0],
        }
    ).to_parquet(tmp_path / "lineitem.parquet")
    got = mode_quantity_by_flag(str(tmp_path))
    a = got[got["l_returnflag"] == "A"].iloc[0]
    assert a["mode_qty"] == 2 and a["n_rows"] == 2  # tie 2-vs-9 -> smaller
    b = got[got["l_returnflag"] == "B"].iloc[0]
    assert b["mode_qty"] == 5 and b["n_rows"] == 2


def test_share_matches_exact_cents_replica():
    from dedupe_rust_ray.pipelines.reshape import supplier_share_of_nation

    got = supplier_share_of_nation(SF).to_pandas().reset_index(drop=True)
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    supp = pd.read_parquet(f"{SF}/supplier.parquet")
    units = np.rint(li["l_extendedprice"].to_numpy() * 100).astype(np.int64) * (
        100 - np.rint(li["l_discount"].to_numpy() * 100).astype(np.int64)
    )
    per = (
        pd.DataFrame({"s_suppkey": li["l_suppkey"].astype("int64"), "u": units})
        .groupby("s_suppkey", as_index=False)["u"]
        .sum()
        .merge(
            supp[["s_suppkey", "s_nationkey"]].astype("int64"), on="s_suppkey"
        )
    )
    per["nu"] = per.groupby("s_nationkey")["u"].transform("sum")
    per["supp_rev"] = ((per["u"] + 50) // 100).astype(float) / 100
    per["nation_rev"] = ((per["nu"] + 50) // 100).astype(float) / 100
    exp = per[["s_suppkey", "s_nationkey", "supp_rev", "nation_rev"]].sort_values(
        "s_suppkey", ignore_index=True
    )
    pd.testing.assert_frame_equal(got, exp)


def test_share_join_leg_matches_broadcast_leg():
    from dedupe_rust_ray.pipelines.reshape import supplier_share_of_nation

    a = supplier_share_of_nation(SF).to_pandas().reset_index(drop=True)
    b = (
        supplier_share_of_nation(SF, broadcast_max_rows=0)
        .to_pandas()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_golden_records_matches_bruteforce():
    from dedupe_rust_ray.pipelines.analytics import golden_records

    got = golden_records(SF).to_pandas().reset_index(drop=True)
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    pre = docs["text"].fillna("").str.slice(0, 80)
    d = pd.DataFrame(
        {"pre": pre, "doc_id": docs["doc_id"].astype("int64"), "source": docs["source"]}
    )
    g = d.groupby("pre").agg(
        cluster_id=("doc_id", "min"),
        max_doc=("doc_id", "max"),
        n_members=("doc_id", "size"),
    )
    g = g[g["n_members"] > 1]
    votes = d.groupby(["pre", "source"], as_index=False).size()
    votes = votes.sort_values(["pre", "size", "source"], ascending=[True, False, True])
    rep = votes.groupby("pre", as_index=False).first()[["pre", "source"]]
    exp = (
        g.reset_index()
        .merge(rep, on="pre")
        .rename(columns={"source": "rep_source"})[
            ["cluster_id", "n_members", "max_doc", "rep_source"]
        ]
        .astype({"cluster_id": "int64", "n_members": "int64", "max_doc": "int64"})
        .sort_values("cluster_id", ignore_index=True)
    )
    assert len(exp) > 0, "fixture must contain shared prefixes"
    pd.testing.assert_frame_equal(got, exp)


def test_golden_records_all_unique_is_empty(ray_session, tmp_path):
    from dedupe_rust_ray.pipelines.analytics import golden_records

    pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["alpha one", "beta two", "gamma three"],
            "source": ["s1", "s1", "s2"],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    got = golden_records(str(tmp_path)).to_pandas()
    assert len(got) == 0
