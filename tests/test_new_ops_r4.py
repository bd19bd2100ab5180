"""Round-4 operator-family additions (sessions/joins/textpipe): temporal
set-difference churn, LAG gap stats, join-free FULL OUTER reconcile,
ROWS-frame rolling window, boilerplate prefix census.  Each also has a
driver SQL oracle; these tests pin the kernels against independent pandas
brute-force replicas at sf0.001 plus crafted edge cases (exact-cutoff
events, single-event users, timestamp ties, window shorter than frame).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _events() -> pd.DataFrame:
    return pd.read_parquet(f"{SF}/events.parquet")


def _orders() -> pd.DataFrame:
    return pd.read_parquet(f"{SF}/orders.parquet")


# ---------------------------------------------------------------- churn
def _churn_replica(ev: pd.DataFrame) -> pd.DataFrame:
    us = ev["ts"].astype("datetime64[us]").astype("int64")
    lo, hi = int(us.min()), int(us.max())
    cut = lo + (hi - lo) * 9 // 10
    df = pd.DataFrame(
        {
            "user_id": ev["user_id"].astype("int64"),
            "event_type": ev["event_type"],
            "n_first": (us < cut).astype("int64"),
            "n_second": (us >= cut).astype("int64"),
        }
    )
    g = df.groupby(["user_id", "event_type"], as_index=False).sum()
    g = g[(g["n_first"] > 0) & (g["n_second"] == 0)]
    out = g[["user_id", "event_type", "n_first"]].rename(
        columns={"n_first": "n_events_first"}
    )
    return out.sort_values(["user_id", "event_type"], ignore_index=True)


def test_user_churn_matches_bruteforce():
    from dedupe_rust_ray.pipelines.sessions import user_churn

    got = user_churn(SF).to_pandas().reset_index(drop=True)
    want = _churn_replica(_events())
    assert len(got) > 0  # the 90/10 split is non-trivial at every sf
    pd.testing.assert_frame_equal(got, want)


def test_user_churn_exact_cutoff_is_second_half(tmp_path):
    """An event landing exactly AT the cutoff belongs to the second half
    (strict <): users 1/2 are symmetric except user 2's late event sits
    exactly on the integer cutoff, so only user 1 churns."""
    from dedupe_rust_ray.pipelines.sessions import user_churn

    t0 = pd.Timestamp("2024-01-01")
    lo = t0
    hi = t0 + pd.Timedelta(microseconds=1_000_000)
    cut = lo + (hi - lo) * 9 / 10  # integer µs: 900_000
    ev = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "user_id": [1, 1, 2, 2],
            "event_type": ["click"] * 4,
            "ts": [lo, cut - pd.Timedelta(microseconds=1), cut, hi],
            "value": [1.0] * 4,
        }
    )
    pq.write_table(pa.Table.from_pandas(ev), tmp_path / "events.parquet")
    got = user_churn(str(tmp_path)).to_pandas()
    assert got["user_id"].tolist() == [1]
    assert got["n_events_first"].tolist() == [2]


# ------------------------------------------------------------- gap stats
def _gap_replica(ev: pd.DataFrame) -> pd.DataFrame:
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    us = ev["ts"].astype("datetime64[us]").astype("int64")
    gap = us.groupby(ev["user_id"]).diff()
    d = pd.DataFrame({"user_id": ev["user_id"], "gap": gap}).dropna()
    d["gap"] = d["gap"].astype("int64")
    out = d.groupby("user_id", as_index=False).agg(
        n_gaps=("gap", "size"),
        max_gap_us=("gap", "max"),
        sum_gap_us=("gap", "sum"),
        n_rapid=("gap", lambda g: int((g < 60_000_000).sum())),
    )
    return out.astype(
        {c: "int64" for c in ["n_gaps", "max_gap_us", "sum_gap_us", "n_rapid"]}
    ).sort_values("user_id", ignore_index=True)


def test_event_gap_stats_matches_bruteforce():
    from dedupe_rust_ray.pipelines.sessions import event_gap_stats

    got = event_gap_stats(SF).to_pandas().reset_index(drop=True)
    want = _gap_replica(_events())
    pd.testing.assert_frame_equal(got, want)


def test_event_gap_stats_single_event_user_and_ties(tmp_path):
    """A single-event user has no gap (drops out, SQL LAG semantics);
    duplicate timestamps yield a 0-µs gap counted as rapid."""
    from dedupe_rust_ray.pipelines.sessions import event_gap_stats

    t0 = pd.Timestamp("2024-01-01")
    ev = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "user_id": [7, 9, 9, 9],
            "event_type": ["click"] * 4,
            "ts": [t0, t0, t0, t0 + pd.Timedelta(seconds=120)],
            "value": [1.0] * 4,
        }
    )
    pq.write_table(pa.Table.from_pandas(ev), tmp_path / "events.parquet")
    got = event_gap_stats(str(tmp_path)).to_pandas()
    assert got["user_id"].tolist() == [9]  # user 7 has one event
    assert got["n_gaps"].tolist() == [2]
    assert got["max_gap_us"].tolist() == [120_000_000]
    assert got["sum_gap_us"].tolist() == [120_000_000]
    assert got["n_rapid"].tolist() == [1]  # the tie-gap of 0 µs


# -------------------------------------------------------------- reconcile
def test_customer_reconcile_matches_pandas_outer():
    from dedupe_rust_ray.pipelines.joins import customer_reconcile

    got = customer_reconcile(SF).to_pandas().reset_index(drop=True)

    o = _orders()
    e = _events()
    oc = (
        pd.DataFrame(
            {
                "custkey": o["o_custkey"].astype("int64"),
                "cents": np.rint(o["o_totalprice"] * 100).astype("int64"),
            }
        )
        .groupby("custkey", as_index=False)
        .agg(n_orders=("cents", "size"), oc=("cents", "sum"))
    )
    ec = (
        pd.DataFrame(
            {
                "custkey": e["user_id"].astype("int64"),
                "cents": np.rint(e["value"] * 100).astype("int64"),
            }
        )
        .groupby("custkey", as_index=False)
        .agg(n_events=("cents", "size"), ec=("cents", "sum"))
    )
    m = oc.merge(ec, on="custkey", how="outer", indicator=True)
    want = pd.DataFrame(
        {
            "custkey": m["custkey"].astype("int64"),
            "n_orders": m["n_orders"].fillna(0).astype("int64"),
            "orders_total": m["oc"].fillna(0).astype("int64") / 100.0,
            "n_events": m["n_events"].fillna(0).astype("int64"),
            "events_value": m["ec"].fillna(0).astype("int64") / 100.0,
            "presence": m["_merge"]
            .map(
                {
                    "both": "both",
                    "left_only": "orders_only",
                    "right_only": "events_only",
                }
            )
            .astype(str),
        }
    ).sort_values("custkey", ignore_index=True)
    pd.testing.assert_frame_equal(got, want)
    # both sides must actually be exercised by the fixture
    assert (got["presence"] == "both").any()
    assert (got["presence"] == "orders_only").any()


# ------------------------------------------------------------ rolling sum
def test_rolling_order_sum_matches_pandas_rolling():
    from dedupe_rust_ray.pipelines.joins import rolling_order_sum

    got = rolling_order_sum(SF).to_pandas().reset_index(drop=True)

    o = _orders().sort_values(
        ["o_custkey", "o_orderdate", "o_orderkey"], ignore_index=True
    )
    cents = np.rint(o["o_totalprice"] * 100).astype("int64")
    grp = pd.DataFrame({"c": o["o_custkey"], "cents": cents}).groupby("c")[
        "cents"
    ]
    wsum = grp.rolling(3, min_periods=1).sum().reset_index(drop=True)
    wn = grp.rolling(3, min_periods=1).count().reset_index(drop=True)
    want = pd.DataFrame(
        {
            "o_orderkey": o["o_orderkey"].astype("int64"),
            "window_n": wn.astype("int64"),
            "window_sum": wsum.astype("int64") / 100.0,
        }
    ).sort_values("o_orderkey", ignore_index=True)
    pd.testing.assert_frame_equal(got, want)
    # frames shorter than the window must appear (first orders per cust)
    assert (got["window_n"] < 3).any() and (got["window_n"] == 3).any()


def test_rolling_order_sum_partition_isolation(tmp_path):
    """The frame never crosses a customer boundary even when two
    customers land in the same shard and are adjacent after the sort."""
    from dedupe_rust_ray.pipelines.joins import rolling_order_sum

    d0 = pd.Timestamp("1995-01-01")
    o = pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3, 4],
            # 32 and 64 share shard 0 under % 32
            "o_custkey": [32, 32, 64, 64],
            "o_orderdate": [d0, d0 + pd.Timedelta(days=1)] * 2,
            "o_totalprice": [10.0, 20.0, 40.0, 80.0],
        }
    )
    pq.write_table(pa.Table.from_pandas(o), tmp_path / "orders.parquet")
    got = (
        rolling_order_sum(str(tmp_path))
        .to_pandas()
        .sort_values("o_orderkey", ignore_index=True)
    )
    assert got["window_sum"].tolist() == [10.0, 30.0, 40.0, 120.0]
    assert got["window_n"].tolist() == [1, 2, 1, 2]


# ------------------------------------------------------------ boilerplate
def test_boilerplate_prefixes_matches_bruteforce():
    from dedupe_rust_ray.pipelines.textpipe import boilerplate_prefixes

    got = boilerplate_prefixes(SF).to_pandas().reset_index(drop=True)

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    g = (
        pd.DataFrame(
            {
                "prefix": docs["text"].fillna("").str.slice(0, 80),
                "doc_id": docs["doc_id"].astype("int64"),
            }
        )
        .groupby("prefix", as_index=False)
        .agg(n_docs=("doc_id", "size"), first_doc=("doc_id", "min"))
    )
    want = (
        g[g["n_docs"] > 1]
        .astype({"n_docs": "int64", "first_doc": "int64"})
        .sort_values("first_doc", ignore_index=True)
    )[["prefix", "n_docs", "first_doc"]]
    assert len(want) > 0  # fixture really contains shared prefixes
    pd.testing.assert_frame_equal(got, want)
