"""Third round-4 operator batch: exact grouped PERCENTILE_CONT from the
bounded-domain histogram, per-user sequential transition census (LAG
bigrams with exact distinct-user counts resolved inside the user shard),
and the join-free cohort-retention matrix.  Each has a driver SQL
oracle; these tests pin the kernels against independent pandas replicas
at sf0.001 plus crafted edge cases (single-event users, one-customer
cohorts, quantiles on a 1-row group)."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_quantiles_match_numpy_percentile():
    from dedupe_rust_ray.pipelines.reshape import quantile_quantity_by_flag

    got = quantile_quantity_by_flag(SF).reset_index(drop=True)
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    rows = []
    for flag, g in li.groupby("l_returnflag"):
        v = np.sort(g["l_quantity"].to_numpy(np.float64))
        rows.append(
            {
                "l_returnflag": flag,
                "n_rows": len(v),
                "p25_qty": float(np.percentile(v, 25, method="linear")),
                "median_qty": float(np.percentile(v, 50, method="linear")),
                "p75_qty": float(np.percentile(v, 75, method="linear")),
            }
        )
    exp = pd.DataFrame(rows).astype({"n_rows": "int64"})
    pd.testing.assert_frame_equal(got, exp)


def test_quantiles_single_row_group(ray_session, tmp_path):
    from dedupe_rust_ray.pipelines.reshape import quantile_quantity_by_flag

    pd.DataFrame(
        {"l_returnflag": ["A", "B", "B"], "l_quantity": [7.0, 1.0, 3.0]}
    ).to_parquet(tmp_path / "lineitem.parquet")
    got = quantile_quantity_by_flag(str(tmp_path)).set_index("l_returnflag")
    # 1-row group: all quantiles equal the value; 2-row: interpolate
    assert got.loc["A", ["p25_qty", "median_qty", "p75_qty"]].tolist() == [
        7.0,
        7.0,
        7.0,
    ]
    assert got.loc["B", ["p25_qty", "median_qty", "p75_qty"]].tolist() == [
        1.5,
        2.0,
        2.5,
    ]


def test_event_transitions_match_pandas_lag():
    from dedupe_rust_ray.pipelines.sessions import event_transitions

    got = event_transitions(SF).to_pandas().reset_index(drop=True)
    ev = pd.read_parquet(f"{SF}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"], ignore_index=True
    )
    prev = ev.groupby("user_id")["event_type"].shift(1)
    df = pd.DataFrame(
        {
            "prev_type": prev,
            "event_type": ev["event_type"],
            "user_id": ev["user_id"],
        }
    ).dropna(subset=["prev_type"])
    exp = (
        df.groupby(["prev_type", "event_type"], as_index=False)
        .agg(n_pairs=("user_id", "size"), n_users=("user_id", "nunique"))
        .astype({"n_pairs": "int64", "n_users": "int64"})
        .sort_values(["prev_type", "event_type"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_event_transitions_single_event_users(ray_session, tmp_path):
    # users with one event contribute no transition at all
    from dedupe_rust_ray.pipelines.sessions import event_transitions

    ts = pd.to_datetime(
        ["2024-01-01 00:00", "2024-01-01 00:05", "2024-01-01 00:00"]
    )
    pd.DataFrame(
        {
            "user_id": [1, 1, 2],
            "ts": ts,
            "event_id": [10, 11, 12],
            "event_type": ["view", "purchase", "view"],
        }
    ).to_parquet(tmp_path / "events.parquet")
    got = event_transitions(str(tmp_path)).to_pandas()
    assert len(got) == 1
    assert got.iloc[0].tolist() == ["view", "purchase", 1, 1]


def test_retention_cohorts_match_pandas():
    from dedupe_rust_ray.pipelines.sessions import retention_cohorts

    got = retention_cohorts(SF).to_pandas().reset_index(drop=True)
    o = pd.read_parquet(f"{SF}/orders.parquet")
    d = pd.to_datetime(o["o_orderdate"])
    q = (d.dt.year * 10 + d.dt.quarter).astype("int64")
    cq = (
        pd.DataFrame({"cust": o["o_custkey"].astype("int64"), "order_q": q})
        .drop_duplicates()
    )
    cq["cohort_q"] = cq.groupby("cust")["order_q"].transform("min")
    exp = (
        cq.groupby(["cohort_q", "order_q"], as_index=False)
        .size()
        .rename(columns={"size": "n_customers"})
        .astype({"n_customers": "int64"})
        .sort_values(["cohort_q", "order_q"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, exp)
    # diagonal cells are the cohort sizes; no cell below the diagonal
    assert (got["order_q"] >= got["cohort_q"]).all()


def test_retention_cohorts_one_customer(ray_session, tmp_path):
    from dedupe_rust_ray.pipelines.sessions import retention_cohorts

    pd.DataFrame(
        {
            "o_custkey": [5, 5, 5],
            "o_orderdate": pd.to_datetime(
                ["2024-01-15", "2024-02-01", "2024-07-04"]
            ),
        }
    ).to_parquet(tmp_path / "orders.parquet")
    got = retention_cohorts(str(tmp_path)).to_pandas()
    # cohort 20241 (Q1 2024); two distinct quarters visited, Q1 deduped
    exp = pd.DataFrame(
        {
            "cohort_q": [20241, 20241],
            "order_q": [20241, 20243],
            "n_customers": [1, 1],
        }
    ).astype("int64")
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp)


def test_chunk_documents_matches_bruteforce():
    from dedupe_rust_ray.pipelines.curation import chunk_documents

    got = chunk_documents(SF).to_pandas().reset_index(drop=True)
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    rows = []
    for doc_id, text in zip(docs["doc_id"], docs["text"].fillna("")):
        n = len(text.split())
        k = 1 if n <= 64 else -(-(n - 64) // 48) + 1
        for i in range(k):
            rows.append(
                {
                    "doc_id": doc_id,
                    "chunk_idx": i,
                    "tok_start": i * 48,
                    "n_tokens": min(64, n - i * 48),
                }
            )
    exp = (
        pd.DataFrame(rows)
        .astype("int64")
        .sort_values(["doc_id", "chunk_idx"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, exp)
    # overlap invariant: consecutive chunks share exactly 16 token slots
    g = got[got["doc_id"] == got["doc_id"].iloc[0]]
    if len(g) > 1:
        starts = g["tok_start"].to_numpy()
        assert (np.diff(starts) == 48).all()


def test_chunk_documents_empty_and_exact_boundary(ray_session, tmp_path):
    from dedupe_rust_ray.pipelines.curation import chunk_documents

    texts = ["", " ".join(["w"] * 64), " ".join(["w"] * 65)]
    pd.DataFrame({"doc_id": [1, 2, 3], "text": texts}).to_parquet(
        tmp_path / "documents.parquet"
    )
    got = chunk_documents(str(tmp_path)).to_pandas()
    by = {d: g for d, g in got.groupby("doc_id")}
    assert len(by[1]) == 1 and by[1]["n_tokens"].iloc[0] == 0
    assert len(by[2]) == 1 and by[2]["n_tokens"].iloc[0] == 64
    # 65 tokens: chunk 0 = [0, 64), chunk 1 = [48, 65) -> 17 tokens
    assert by[3]["n_tokens"].tolist() == [64, 17]
    assert by[3]["tok_start"].tolist() == [0, 48]


def test_cooccurrence_census_matches_bruteforce():
    from collections import Counter

    from dedupe_rust_ray.pipelines.textpipe import cooccurrence_census

    got = cooccurrence_census(SF).reset_index(drop=True)
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    cnt = Counter()
    for text in docs["text"].fillna(""):
        w = text.split()
        for d in (1, 2):
            for i in range(len(w) - d):
                a, b = sorted((w[i], w[i + d]))
                cnt[(a, b)] += 1
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:30]
    exp = pd.DataFrame(
        {
            "tok_a": [p[0] for p, _ in top],
            "tok_b": [p[1] for p, _ in top],
            "n": [c for _, c in top],
        }
    ).astype({"n": "int64"})
    pd.testing.assert_frame_equal(got, exp)


def test_cooccurrence_doc_boundary_isolation(ray_session, tmp_path):
    # tokens never pair across documents
    from dedupe_rust_ray.pipelines.textpipe import cooccurrence_census

    pd.DataFrame(
        {"doc_id": [1, 2], "text": ["a b", "c d"]}
    ).to_parquet(tmp_path / "documents.parquet")
    got = cooccurrence_census(str(tmp_path))
    pairs = set(zip(got["tok_a"], got["tok_b"]))
    assert pairs == {("a", "b"), ("c", "d")}


def test_session_spans_matches_pandas():
    from dedupe_rust_ray.pipelines.sessions import session_spans

    got = session_spans(SF).to_pandas().reset_index(drop=True)
    ev = pd.read_parquet(f"{SF}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"], ignore_index=True
    )
    us = ev["ts"].astype("datetime64[us]").astype("int64")
    prev = us.groupby(ev["user_id"]).shift()
    brk = prev.isna() | ((us - prev) > 30 * 60 * 1_000_000)
    sid = brk.cumsum()
    d = pd.DataFrame({"user_id": ev["user_id"], "sid": sid, "us": us})
    exp = d.groupby(["user_id", "sid"], as_index=False).agg(
        start_us=("us", "min"), end_us=("us", "max"), n_events=("us", "size")
    )
    exp["session_idx"] = exp.groupby("user_id").cumcount()
    exp = exp[
        ["user_id", "session_idx", "start_us", "end_us", "n_events"]
    ].astype({"session_idx": "int64", "n_events": "int64"})
    pd.testing.assert_frame_equal(got, exp.reset_index(drop=True))
    # spans are disjoint and ordered within a user
    for _, g in got.groupby("user_id"):
        assert (g["start_us"].to_numpy()[1:] > g["end_us"].to_numpy()[:-1]).all()


def test_session_spans_consistent_with_sessionize():
    from dedupe_rust_ray.pipelines.sessions import session_spans, sessionize

    spans = session_spans(SF).to_pandas()
    stats = sessionize(SF).to_pandas()
    agg = spans.groupby("user_id", as_index=False).agg(
        n_sessions=("session_idx", "size"), n_events=("n_events", "sum")
    )
    pd.testing.assert_frame_equal(
        agg.astype({"n_sessions": "int64", "n_events": "int64"}),
        stats.reset_index(drop=True),
    )


def test_session_spans_exact_gap_boundary(ray_session, tmp_path):
    # a gap of exactly 30 min does NOT split (strict > semantics)
    from dedupe_rust_ray.pipelines.sessions import session_spans

    t0 = pd.Timestamp("2024-01-01 00:00:00")
    pd.DataFrame(
        {
            "user_id": [1, 1, 1],
            "ts": [t0, t0 + pd.Timedelta(minutes=30), t0 + pd.Timedelta(minutes=61)],
            "event_id": [1, 2, 3],
        }
    ).to_parquet(tmp_path / "events.parquet")
    got = session_spans(str(tmp_path)).to_pandas()
    assert got["n_events"].tolist() == [2, 1]
    assert got["session_idx"].tolist() == [0, 1]


def test_vocab_size_by_lang_matches_bruteforce():
    from dedupe_rust_ray.pipelines.textpipe import vocab_size_by_lang

    got = vocab_size_by_lang(SF).to_pandas().reset_index(drop=True)
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    rows = []
    for lang, g in docs.groupby("lang"):
        toks = [w for t in g["text"].fillna("") for w in t.split()]
        rows.append(
            {
                "lang": lang,
                "n_distinct_tokens": len(set(toks)),
                "n_tokens": len(toks),
            }
        )
    exp = pd.DataFrame(rows).astype(
        {"n_distinct_tokens": "int64", "n_tokens": "int64"}
    )
    pd.testing.assert_frame_equal(got, exp)


def test_dense_topk_keeps_ties(ray_session, tmp_path):
    from dedupe_rust_ray.pipelines.joins import dense_topk_orders

    pd.DataFrame(
        {
            "o_custkey": [1, 1, 1, 1, 2],
            "o_orderkey": [10, 11, 12, 13, 20],
            "o_totalprice": [100.0, 100.0, 90.0, 80.0, 50.0],
        }
    ).to_parquet(tmp_path / "orders.parquet")
    got = dense_topk_orders(str(tmp_path)).to_pandas()
    # level 1 = {10, 11} (tie kept), level 2 = {12}; 13 is rank 3, cut
    by = got.set_index("o_orderkey")["rnk"].to_dict()
    assert by == {10: 1, 11: 1, 12: 2, 20: 1}


def test_dense_topk_matches_pandas_rank():
    from dedupe_rust_ray.pipelines.joins import dense_topk_orders

    got = dense_topk_orders(SF).to_pandas().reset_index(drop=True)
    o = pd.read_parquet(f"{SF}/orders.parquet")[
        ["o_custkey", "o_orderkey", "o_totalprice"]
    ]
    o["rnk"] = (
        o.groupby("o_custkey")["o_totalprice"]
        .rank(method="dense", ascending=False)
        .astype("int64")
    )
    exp = (
        o[o["rnk"] <= 2]
        .sort_values(["o_custkey", "rnk", "o_orderkey"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_retention_intersect_partitions_with_churn():
    # EXCEPT + INTERSECT partition the first-window-active pairs exactly
    from dedupe_rust_ray.pipelines.sessions import (
        user_churn,
        user_retention_intersect,
    )

    churn = user_churn(SF).to_pandas()
    kept = user_retention_intersect(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    us = ev["ts"].astype("datetime64[us]").astype("int64")
    cut = us.min() + (us.max() - us.min()) * 9 // 10
    act = pd.DataFrame(
        {
            "user_id": ev["user_id"],
            "event_type": ev["event_type"],
            "first": (us < cut).astype(int),
            "second": (us >= cut).astype(int),
        }
    ).groupby(["user_id", "event_type"], as_index=False).sum()
    n_first_active = int((act["first"] > 0).sum())
    assert len(churn) + len(kept) == n_first_active
    # disjoint
    a = set(zip(churn["user_id"], churn["event_type"]))
    b = set(zip(kept["user_id"], kept["event_type"]))
    assert not (a & b)
    # counts match the replica on the intersect side
    exp = act[(act["first"] > 0) & (act["second"] > 0)].sort_values(
        ["user_id", "event_type"], ignore_index=True
    )
    got = kept.sort_values(["user_id", "event_type"], ignore_index=True)
    assert (got["n_events_first"].to_numpy() == exp["first"].to_numpy()).all()
    assert (got["n_events_second"].to_numpy() == exp["second"].to_numpy()).all()
