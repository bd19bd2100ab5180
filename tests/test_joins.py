"""Join-variety pipeline tests (pipelines/joins.py): semi, anti, as-of,
windowed top-k. Each query also has a driver SQL oracle at sf0.01; these
tests pin the in-partition kernels' edge semantics at sf0.001 against an
inline DuckDB recomputation plus hand-built corner cases.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    return con.sql(sql).df()


def test_q4_semi_join_matches_exists():
    from dedupe_rust_ray.pipelines.joins import q4_order_priority

    got = q4_order_priority(SF).reset_index(drop=True)
    want = _duck(
        "SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders "
        "FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01' "
        "AND o_orderdate < TIMESTAMP '1997-01-01' "
        "AND EXISTS (SELECT 1 FROM lineitem "
        "  WHERE l_orderkey = o_orderkey AND l_quantity > 45) "
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"
    )
    pd.testing.assert_frame_equal(got, want)


def test_anti_join_matches_not_exists():
    from dedupe_rust_ray.pipelines.joins import customers_without_orders

    got = customers_without_orders(SF).reset_index(drop=True)
    want = _duck(
        "SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers, "
        "ROUND(SUM(c_acctbal), 2) AS sum_acctbal "
        "FROM customer WHERE NOT EXISTS "
        "(SELECT 1 FROM orders WHERE o_custkey = c_custkey "
        " AND o_orderdate >= TIMESTAMP '1997-01-01' "
        " AND o_orderdate < TIMESTAMP '1998-01-01') "
        "GROUP BY c_mktsegment ORDER BY c_mktsegment"
    )
    assert len(got) > 0  # window chosen so the anti side is non-trivial
    pd.testing.assert_frame_equal(got, want)


def test_asof_join_end_to_end():
    from dedupe_rust_ray.pipelines.joins import asof_purchase_view

    got = asof_purchase_view(SF).to_pandas()
    want = _duck(
        "WITH x AS (SELECT event_id, user_id, ts, event_type, "
        " MAX(CASE WHEN event_type = 'view' THEN ts END) OVER "
        "  (PARTITION BY user_id ORDER BY ts, event_id "
        "   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_view_ts "
        " FROM events WHERE event_type IN ('view', 'purchase')) "
        "SELECT event_id, user_id, prev_view_ts "
        "FROM x WHERE event_type = 'purchase' ORDER BY event_id"
    )
    assert len(got) == len(want)
    pd.testing.assert_series_equal(
        got["prev_view_ts"], want["prev_view_ts"], check_index=False
    )
    # null lag exactly where there is no prior view
    assert got["lag_s"].isna().equals(got["prev_view_ts"].isna())
    ok = got.dropna(subset=["lag_s"])
    assert (ok["lag_s"] > 0).all()


def test_asof_kernel_corner_cases():
    """No-prior-view -> null; same-timestamp tie broken by event_id (a
    view sharing a purchase's ts counts only if its event_id is lower)."""
    from dedupe_rust_ray.pipelines.joins import asof_purchase_view  # noqa: F401
    # exercise the per-shard kernel directly through a module-level copy
    import dedupe_rust_ray.pipelines.joins as joins

    t0 = pd.Timestamp("2024-01-01 00:00:00")
    g = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 5, 6],
            "user_id": [7, 7, 7, 8, 9, 9],
            "ts": [t0, t0, t0 + pd.Timedelta("1h"), t0, t0, t0],
            "event_type": [
                "view",      # u7: view at t0, id 1
                "purchase",  # u7: purchase at the SAME ts, higher id -> matches
                "purchase",  # u7: later purchase -> matches t0 view
                "purchase",  # u8: no view at all -> null
                "purchase",  # u9: purchase id 5 BEFORE view id 6 at same ts -> null
                "view",
            ],
        }
    )
    # reuse the same in-partition logic by running the full pipeline on a
    # one-shard frame via the module's per-shard closure shape
    out = joins._asof_per_shard(g)
    out = out.set_index("event_id")
    assert out.loc[2, "prev_view_ts"] == t0
    assert out.loc[3, "prev_view_ts"] == t0
    assert pd.isna(out.loc[4, "prev_view_ts"])
    assert pd.isna(out.loc[5, "prev_view_ts"])


def test_window_topk_rank_semantics():
    from dedupe_rust_ray.pipelines.joins import window_topk_orders

    got = window_topk_orders(SF, k=3).to_pandas()
    assert (got["rnk"] >= 1).all() and (got["rnk"] <= 3).all()
    # per customer: ranks are 1..n without gaps, prices non-increasing
    for _, grp in got.groupby("o_custkey"):
        grp = grp.sort_values("rnk")
        assert grp["rnk"].tolist() == list(range(1, len(grp) + 1))
        assert (grp["o_totalprice"].diff().dropna() <= 0).all()
    want = _duck(
        "WITH r AS (SELECT o_custkey, o_orderkey, o_totalprice, "
        " ROW_NUMBER() OVER (PARTITION BY o_custkey "
        "  ORDER BY o_totalprice DESC, o_orderkey) AS rnk FROM orders) "
        "SELECT o_custkey, o_orderkey, o_totalprice, CAST(rnk AS BIGINT) AS rnk "
        "FROM r WHERE rnk <= 3 ORDER BY o_custkey, rnk"
    )
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)


def test_range_join_quarters():
    from dedupe_rust_ray.pipelines.joins import orders_by_quarter

    got = orders_by_quarter(SF).reset_index(drop=True)
    want = _duck(
        "WITH q AS (SELECT unnest(generate_series(TIMESTAMP '1995-01-01', "
        "TIMESTAMP '2001-07-01', INTERVAL 3 MONTH)) AS q_start) "
        "SELECT q_start, CAST(COUNT(*) AS BIGINT) AS n_orders, "
        "ROUND(SUM(o_totalprice), 2) AS revenue "
        "FROM orders JOIN q ON o_orderdate >= q_start "
        "AND o_orderdate < q_start + INTERVAL 3 MONTH "
        "GROUP BY q_start ORDER BY q_start"
    )
    pd.testing.assert_frame_equal(got, want)
    # every order lands in exactly one interval
    assert got["n_orders"].sum() == len(pd.read_parquet(f"{SF}/orders.parquet"))


def test_running_total_window():
    from dedupe_rust_ray.pipelines.joins import running_total_orders

    got = running_total_orders(SF).to_pandas()
    want = _duck(
        "SELECT o_custkey, o_orderkey, "
        "ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey "
        " ORDER BY o_orderdate, o_orderkey ROWS UNBOUNDED PRECEDING), 2) "
        "AS run_total FROM orders ORDER BY o_custkey, o_orderkey"
    )
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)


def test_events_range_join_band_self_join(tmp_path):
    """Band self-join (+/- 10 min window per user) against an O(n^2)
    brute-force reference on crafted events, including exact-boundary
    timestamps (BETWEEN is inclusive both ends)."""
    import numpy as np

    from dedupe_rust_ray.pipelines.sessions import events_range_join

    base = pd.Timestamp("2024-01-01")
    rows = [
        # user 1: purchase at +0; events at -10min (inclusive), -11min
        # (out), +5min, +10min (inclusive)
        (0, base, 1, "purchase", 10.0),
        (1, base - pd.Timedelta(minutes=10), 1, "view", 1.0),
        (2, base - pd.Timedelta(minutes=11), 1, "view", 2.0),
        (3, base + pd.Timedelta(minutes=5), 1, "view", 4.0),
        (4, base + pd.Timedelta(minutes=10), 1, "purchase", 8.0),
        # user 2: isolated purchase
        (5, base, 2, "purchase", 100.0),
        # user 3: no purchases at all
        (6, base, 3, "view", 7.0),
    ]
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    df["props"] = "{}"
    df.to_parquet(tmp_path / "events.parquet")
    got = events_range_join(str(tmp_path)).to_pandas()

    w = pd.Timedelta(minutes=10)
    exp = []
    for p in df[df["event_type"] == "purchase"].itertuples():
        near = df[
            (df["user_id"] == p.user_id)
            & (df["event_id"] != p.event_id)
            & (df["ts"] >= p.ts - w)
            & (df["ts"] <= p.ts + w)
        ]
        exp.append(
            (p.event_id, p.user_id, len(near),
             np.floor(near["value"].sum() * 100 + 0.5) / 100)
        )
    want = pd.DataFrame(
        exp, columns=["event_id", "user_id", "n_nearby", "nearby_value"]
    ).sort_values("event_id", ignore_index=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # spot pins: purchase 0 sees events 1,3,4 (not 2); purchase 5 sees none
    g = got.set_index("event_id")
    assert g.loc[0, "n_nearby"] == 3 and g.loc[0, "nearby_value"] == 13.0
    assert g.loc[5, "n_nearby"] == 0 and g.loc[5, "nearby_value"] == 0.0


def test_conversion_funnel_ordering_semantics(tmp_path):
    """A purchase BEFORE the first signup does not convert; at-or-after
    does; users without signup don't enter the funnel."""
    import numpy as np

    from dedupe_rust_ray.pipelines.sessions import conversion_funnel

    t = pd.Timestamp("2024-01-01")
    h = pd.Timedelta(hours=1)
    rows = [
        # user 1: purchase before signup only -> signed, NOT converted
        (0, t, 1, "purchase", 1.0),
        (1, t + h, 1, "signup", 0.0),
        # user 2: signup then purchase -> converted
        (2, t, 2, "signup", 0.0),
        (3, t + h, 2, "purchase", 5.0),
        # user 3: purchase, never signed up -> not in funnel
        (4, t, 3, "purchase", 2.0),
        # user 4: signup exactly at purchase ts -> converts (>= semantics)
        (5, t, 4, "signup", 0.0),
        (6, t, 4, "purchase", 3.0),
    ]
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    df["props"] = "{}"
    df.to_parquet(tmp_path / "events.parquet")
    out = conversion_funnel(str(tmp_path)).iloc[0]
    assert out["n_users"] == 4
    assert out["n_signup"] == 3
    assert out["n_converted"] == 2  # users 2 and 4
    assert out["conv_rate"] == np.floor(2 / 3 * 1e4 + 0.5) / 1e4


def test_percent_rank_tie_semantics(tmp_path):
    """Ties share a rank (PERCENT_RANK, not cume_dist): three equal
    prices in a 5-row quarter all get rank 1 -> pct 0."""
    import numpy as np

    from dedupe_rust_ray.pipelines.joins import percent_rank_orders

    df = pd.DataFrame(
        {
            "o_orderkey": np.arange(5, dtype=np.int64),
            "o_custkey": np.int64(1),
            "o_orderstatus": "O",
            "o_totalprice": [10.0, 10.0, 10.0, 20.0, 30.0],
            "o_orderdate": pd.Timestamp("1995-02-01"),
            "o_orderpriority": "1-URGENT",
        }
    )
    df.to_parquet(tmp_path / "orders.parquet")
    out = percent_rank_orders(str(tmp_path)).to_pandas()
    got = dict(zip(out["o_orderkey"], out["pct_rank"]))
    assert got[0] == got[1] == got[2] == 0.0
    assert got[3] == 0.75 and got[4] == 1.0
    assert (out["quarter"] == 1995 * 10 + 1).all()
