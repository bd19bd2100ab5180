"""Mining / link-prediction / concentration / range-search operators
(pipelines/mining.py, reshape.gini_quantity_by_flag,
similarity.embedding_range_search): registered-oracle comparison at
sf0.001, dual-plan parity with forced-zero gates, and closed-form pins
on hand-built inputs."""

import importlib.util

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _entry_module():
    spec = importlib.util.spec_from_file_location(
        "ray_entry_for_mining_tests", "/root/repo/__ray_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("lineitem", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con.sql(sql).df()


@pytest.mark.parametrize(
    "name",
    [
        "part_association_rules",
        "part_common_neighbors",
        "gini_quantity_by_flag",
        "embedding_range_search",
    ],
)
def test_mining_query_matches_registered_oracle(name):
    mod = _entry_module()
    got = mod.queries()[name](SF).reset_index(drop=True)
    want = _duck(mod.oracle_sql()[name])
    cols = sorted(got.columns)
    got = got[cols].sort_values(cols, ignore_index=True)
    want = want[cols].sort_values(cols, ignore_index=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(got) > 0


def test_association_rules_dual_plan_parity():
    from dedupe_rust_ray.pipelines.mining import part_association_rules

    fast = part_association_rules(SF)
    dist = part_association_rules(SF, driver_max_rows=0)
    pd.testing.assert_frame_equal(fast, dist)


def test_common_neighbors_dual_plan_parity():
    from dedupe_rust_ray.pipelines.mining import part_common_neighbors

    fast = part_common_neighbors(SF)
    dist = part_common_neighbors(SF, driver_max_edges=0)
    pd.testing.assert_frame_equal(fast, dist)


def _write_lineitem(tmp_path, orders_to_parts) -> str:
    rows_o, rows_p = [], []
    for o, parts in orders_to_parts.items():
        for p in parts:
            rows_o.append(o)
            rows_p.append(p)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(rows_o, pa.int64()),
                "l_partkey": pa.array(rows_p, pa.int64()),
                "l_quantity": pa.array([50.0] * len(rows_o), pa.float64()),
            }
        ),
        f"{tmp_path}/lineitem.parquet",
    )
    return str(tmp_path)


def test_association_rules_closed_form(tmp_path):
    """3 baskets: {1,2} twice and {1,3} once. supp(1)=3, supp(2)=2,
    supp(3)=1, N=3. Rule 1->2: support 2, conf 2/3, lift 2*3/(3*2)=1.
    Rule 2->1: conf 1, lift 1. Rule 1->3: conf 1/3, lift 1. Rule 3->1:
    conf 1, lift 1. A duplicate lineitem row of an existing (o, p) must
    not change any support."""
    from dedupe_rust_ray.pipelines.mining import part_association_rules

    sf = _write_lineitem(tmp_path, {10: [1, 2], 11: [1, 2, 2], 12: [1, 3]})
    got = part_association_rules(sf)
    want = {
        (1, 2): (2, 666_666, 1_000_000),
        (2, 1): (2, 1_000_000, 1_000_000),
        (1, 3): (1, 333_333, 1_000_000),
        (3, 1): (1, 1_000_000, 1_000_000),
    }
    assert len(got) == 4
    for r in got.itertuples():
        assert want[(r.antecedent, r.consequent)] == (
            r.support,
            r.conf_scaled,
            r.lift_scaled,
        )
    dist = part_association_rules(sf, driver_max_rows=0)
    pd.testing.assert_frame_equal(got, dist)


def test_common_neighbors_closed_form(tmp_path):
    """Star baskets {c, x} for x in 1..3 plus basket {1, 2}: parts 1 and 2
    share neighbor c AND each other... common neighbors of (1,2) = {c}
    only (adjacency is not common-neighborhood), so with min_common=1 the
    pair list is exactly the leaf pairs through c. Jaccard(1,2) =
    1 // (2 + 2 - 1) scaled."""
    from dedupe_rust_ray.pipelines.mining import part_common_neighbors

    sf = _write_lineitem(
        tmp_path, {1: [100, 1], 2: [100, 2], 3: [100, 3], 4: [1, 2]}
    )
    got = part_common_neighbors(sf, min_common=1)
    # leaf pairs through c=100: (1,2), (1,3), (2,3); plus wedges through
    # 1 and 2 (each has neighbors {100, other-leaf}): (2,100) via 1,
    # (1,100) via 2 -> pairs (100 sorted after leaves): (1,100), (2,100)
    pairs = set(zip(got["part_a"], got["part_b"]))
    assert pairs == {(1, 2), (1, 3), (2, 3), (1, 100), (2, 100)}
    row12 = got[(got["part_a"] == 1) & (got["part_b"] == 2)].iloc[0]
    # deg(1)=2 (100, 2), deg(2)=2 (100, 1), common={100}
    assert row12["n_common"] == 1
    assert row12["jaccard_scaled"] == 1_000_000 // 3
    dist = part_common_neighbors(sf, min_common=1, driver_max_edges=0)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), dist.reset_index(drop=True)
    )


def test_gini_closed_form(tmp_path):
    """Equal values => Gini 0; values [1, 0-like spread] pin the rank-sum
    formula: flag A = [5, 5, 5] -> 0; flag B = [1, 9] -> G = (2*(1*1+2*9)
    - 3*10) / (2*10) = 8/20 = 0.4 -> 400000 scaled."""
    from dedupe_rust_ray.pipelines.reshape import gini_quantity_by_flag

    pq.write_table(
        pa.table(
            {
                "l_returnflag": pa.array(["A", "A", "A", "B", "B"]),
                "l_quantity": pa.array([5.0, 5.0, 5.0, 1.0, 9.0]),
            }
        ),
        f"{tmp_path}/lineitem.parquet",
    )
    got = gini_quantity_by_flag(str(tmp_path))
    assert got.to_dict("records") == [
        {"l_returnflag": "A", "n_rows": 3, "sum_qty": 15, "gini_scaled": 0},
        {"l_returnflag": "B", "n_rows": 2, "sum_qty": 10,
         "gini_scaled": 400_000},
    ]


def test_range_search_matches_brute_force():
    """Every emitted neighbor is >= threshold against the full matrix and
    every qualifying vector is emitted (completeness both ways)."""
    from dedupe_rust_ray.pipelines.similarity import embedding_range_search

    got = embedding_range_search(SF, n_queries=5, threshold=0.3)
    t = pq.read_table(f"{SF}/embeddings.parquet")
    ids = t["vec_id"].to_numpy()
    from dedupe_rust_ray.stages.codec import list_col_matrix

    V = list_col_matrix(t["embedding"])
    V /= np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
    order = np.argsort(ids)
    ids, V = ids[order], V[order]
    qmask = ids < 5
    S = V[qmask] @ V.T
    qi, vi = np.nonzero((S >= 0.3) & (ids[qmask][:, None] != ids[None, :]))
    want = pd.DataFrame(
        {
            "query_id": ids[qmask][qi].astype(np.int64),
            "neighbor_id": ids[vi].astype(np.int64),
            "cos_sim": np.round(S[qi, vi], 4),
        }
    ).sort_values(["query_id", "neighbor_id"], ignore_index=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_blocking_quality_closed_form_and_detection():
    """Over the planted corpus the REAL LSH banding must nominate exactly
    the planted pairs (completeness 1.0, zero organic candidates); with a
    STRICTER truth set (every 5th doc a 'true' dup while only every 10th
    was planted) the measured completeness must drop to matched/true —
    proving the metric detects blocking misses rather than asserting 1."""
    import pyarrow.parquet as pq

    from dedupe_rust_ray.pipelines.dedupe import blocking_quality_planted

    got = blocking_quality_planted(SF)
    row = got.iloc[0]
    assert row["pairs_completeness_scaled"] == 1_000_000
    assert row["n_candidate_pairs"] == row["n_true_pairs"] == row["n_matched"]
    ids = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])[
        "doc_id"
    ].to_numpy()
    n10 = int((ids % 10 == 0).sum())
    n5 = int((ids % 5 == 0).sum())
    assert row["n_true_pairs"] == n10
    strict = blocking_quality_planted(SF, truth_dup_every=5).iloc[0]
    assert strict["n_true_pairs"] == n5
    assert strict["n_matched"] == n10
    assert strict["pairs_completeness_scaled"] == (1_000_000 * n10) // n5


def test_contingency_closed_form(tmp_path):
    """2x2 table [[30, 10], [10, 10]]: N=60, R=(40,20), C=(40,20).
    Cell (A,x): expected 40*40/60 = 26.666 -> 26666666 scaled... with
    SCALE 1e6: (1e6*40*40)//60 = 26666666; lift = (1e6*30*60)//(40*40)
    = 1125000. Independence (uniform 15s) pins lift exactly 1e6."""
    import pyarrow.parquet as pq

    from dedupe_rust_ray.pipelines.reshape import contingency_flag_status

    rows_f = ["A"] * 40 + ["B"] * 20
    rows_s = ["x"] * 30 + ["y"] * 10 + ["x"] * 10 + ["y"] * 10
    pq.write_table(
        pa.table({"l_returnflag": rows_f, "l_linestatus": rows_s}),
        f"{tmp_path}/lineitem.parquet",
    )
    got = contingency_flag_status(str(tmp_path))
    ax = got[(got["l_returnflag"] == "A") & (got["l_linestatus"] == "x")].iloc[0]
    assert ax["n_obs"] == 30
    assert ax["n_expected_scaled"] == (1_000_000 * 40 * 40) // 60
    assert ax["lift_scaled"] == (1_000_000 * 30 * 60) // (40 * 40)
    # independent table: every lift exactly 1.0
    pq.write_table(
        pa.table(
            {
                "l_returnflag": ["A"] * 30 + ["B"] * 30,
                "l_linestatus": (["x"] * 15 + ["y"] * 15) * 2,
            }
        ),
        f"{tmp_path}/lineitem.parquet",
    )
    ind = contingency_flag_status(str(tmp_path))
    assert (ind["lift_scaled"] == 1_000_000).all()
    assert (ind["n_expected_scaled"] == 15_000_000).all()


def test_band_join_bucket_boundary(tmp_path):
    """Hand-built prices pin the ghost-replication rules: pairs straddling
    a bucket boundary are found exactly once, pairs wider than eps are
    absent, and an exact-tie pair (same cents) is found once. eps=25:
    buckets [0,25), [25,50), ... Prices (cents): 10, 24, 26, 49, 51, 99,
    99 -> qualifying pairs (diff<=25): (10,24) same bucket, (24,26)
    cross-boundary, (10,26)? diff 16 <= 25 cross-boundary, (26,49) same
    bucket, (24,49) diff 25 == eps cross, (49,51) cross, (26,51) exactly
    25 cross, (99,99) tie, (51,?)... enumerate via brute force instead of
    hand-listing."""
    import itertools

    import pyarrow.parquet as pq

    from dedupe_rust_ray.pipelines.joins import part_price_band_pairs

    cents = [10, 24, 26, 49, 51, 99, 99]
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(range(1, len(cents) + 1), pa.int64()),
                "p_retailprice": pa.array([c / 100 for c in cents]),
            }
        ),
        f"{tmp_path}/part.parquet",
    )
    got = part_price_band_pairs(str(tmp_path))
    want = sorted(
        (i + 1, j + 1, cents[i], cents[j], abs(cents[i] - cents[j]))
        for i, j in itertools.combinations(range(len(cents)), 2)
        if abs(cents[i] - cents[j]) <= 25
    )
    want = [
        (a, b, ca if a < b else cb, cb if a < b else ca, d)
        for a, b, ca, cb, d in want
    ]
    got_t = [tuple(r) for r in got.values.tolist()]
    assert got_t == [
        (a, b, ca, cb, d) for (a, b, ca, cb, d) in want
    ]
    # no duplicates (each pair exactly once)
    assert len(got_t) == len(set((a, b) for a, b, *_ in got_t))


def test_monthly_trend_negative_delta_truncation(tmp_path):
    """Month 1 revenue 300.00, month 2 revenue 100.00: delta -2000000
    units, pct = trunc(-2/3 * 1e6) = -666666 (NOT floor's -666667 —
    pinned because DuckDB's integer // truncates on negatives). First
    month's delta/pct are NULL."""
    import pyarrow.parquet as pq

    from dedupe_rust_ray.pipelines.reshape import monthly_revenue_trend

    pq.write_table(
        pa.table(
            {
                "l_shipdate": pa.array(
                    [pd.Timestamp("2024-01-15"), pd.Timestamp("2024-02-15")]
                ),
                "l_extendedprice": pa.array([300.0, 100.0]),
                "l_discount": pa.array([0.0, 0.0]),
            }
        ),
        f"{tmp_path}/lineitem.parquet",
    )
    got = monthly_revenue_trend(str(tmp_path))
    assert got["revenue_units"].tolist() == [3_000_000, 1_000_000]
    assert pd.isna(got["delta_units"].iloc[0])
    assert got["delta_units"].iloc[1] == -2_000_000
    assert got["pct_change_scaled"].iloc[1] == -666_666


def test_range_frame_peer_group_and_window(tmp_path):
    """RANGE frame semantics pinned: date ties are PEERS (both rows see
    the full tie-group sum even the 'later' orderkey), and a row exactly
    window_days back is inside the frame while one day further is out."""
    import pyarrow.parquet as pq

    from dedupe_rust_ray.pipelines.joins import orders_range_frame_sum

    t = pd.Timestamp("2024-06-01")
    d = pd.Timedelta(days=1)
    ev = pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3, 4, 5],
            "o_custkey": [7, 7, 7, 7, 9],
            "o_totalprice": [10.0, 20.0, 40.0, 80.0, 5.0],
            "o_orderdate": [t - 31 * d, t - 30 * d, t, t, t],
            "o_orderstatus": ["O"] * 5,
            "o_orderpriority": ["1-URGENT"] * 5,
        }
    )
    pq.write_table(pa.Table.from_pandas(ev), f"{tmp_path}/orders.parquet")
    got = orders_range_frame_sum(str(tmp_path)).to_pandas()
    by_key = dict(zip(got["o_orderkey"], got["frame_sum_cents"]))
    assert by_key[1] == 1000                # nothing before it
    assert by_key[2] == 3000                # 31d-old row still in (30d window, exact boundary)
    assert by_key[3] == by_key[4] == 14000  # peers: 20+40+80 (31d row out)
    assert by_key[5] == 500                 # other customer isolated


def test_relational_division_closed_form(tmp_path):
    """Customer 1 covers both priorities -> kept with its order count;
    customer 2 covers one -> dropped."""
    import pyarrow.parquet as pq

    from dedupe_rust_ray.pipelines.joins import customers_all_priorities

    ev = pd.DataFrame(
        {
            "o_custkey": [1, 1, 1, 2, 2],
            "o_orderpriority": ["a", "b", "a", "a", "a"],
        }
    )
    pq.write_table(pa.Table.from_pandas(ev), f"{tmp_path}/orders.parquet")
    got = customers_all_priorities(str(tmp_path))
    assert got.to_dict("records") == [{"o_custkey": 1, "n_orders": 3}]


def test_event_value_outliers_closed_form(tmp_path):
    """Values [10, 10, 10, 10, 100] (cents 1000x5?, no — dollars):
    median 10.00, deviations [0,0,0,0,90.00] -> MAD 0 -> every nonzero
    deviation is an outlier. Values [1..5] give med 3, MAD 1, k=3 ->
    |v-3| > 3 never (max dev 2): zero outliers."""
    import pyarrow.parquet as pq

    from dedupe_rust_ray.pipelines.reshape import event_value_outliers

    ev = pd.DataFrame(
        {
            "event_type": ["a"] * 5 + ["b"] * 5,
            "value": [10.0, 10.0, 10.0, 10.0, 100.0]
            + [1.0, 2.0, 3.0, 4.0, 5.0],
            "ts": [pd.Timestamp("2024-01-01")] * 10,
            "user_id": list(range(10)),
            "event_id": list(range(10)),
        }
    )
    pq.write_table(pa.Table.from_pandas(ev), f"{tmp_path}/events.parquet")
    got = event_value_outliers(str(tmp_path))
    a = got[got["event_type"] == "a"].iloc[0]
    assert (a["med4"], a["mad4"], a["n_outliers"]) == (4000, 0, 1)
    b = got[got["event_type"] == "b"].iloc[0]
    assert (b["med4"], b["mad4"], b["n_outliers"]) == (1200, 400, 0)


def test_systematic_sample_every_k(tmp_path):
    """doc_ids with gaps: global rank follows doc_id ORDER, not value —
    ids [3, 7, 8, 20, 21, 40] with k=2 keep ranks 0, 2, 4 = ids 3, 8, 21."""
    import pyarrow.parquet as pq

    from dedupe_rust_ray.pipelines.curation import systematic_sample

    pq.write_table(
        pa.table({"doc_id": pa.array([21, 3, 8, 40, 7, 20], pa.int64())}),
        f"{tmp_path}/documents.parquet",
    )
    got = systematic_sample(str(tmp_path), every_k=2)
    assert got["doc_id"].tolist() == [3, 8, 21]
    assert got["rank"].tolist() == [0, 2, 4]


def test_fully_distributed_mining_derivation_parity():
    """fused_items_max=0 forces the exchange-based paths (basket shard
    groupby + tagged fold / edge dedup) — pinned equal to the fused
    defaults for both mining operators."""
    from dedupe_rust_ray.pipelines.mining import (
        part_association_rules,
        part_common_neighbors,
    )

    pd.testing.assert_frame_equal(
        part_association_rules(SF),
        part_association_rules(SF, fused_items_max=0),
    )
    pd.testing.assert_frame_equal(
        part_common_neighbors(SF),
        part_common_neighbors(SF, fused_items_max=0),
    )


def test_trending_parts_decay_semantics(tmp_path):
    """Two parts, same order count: the one shipped at the anchor month
    gets full weight 2^20 per row, the one shipped 2 months earlier gets
    2^18 — the fresher part must rank first; a 21-month-old row adds 0."""
    import pyarrow.parquet as pq

    from dedupe_rust_ray.pipelines.analytics import trending_parts

    t = pd.Timestamp("2024-12-31")
    d30 = pd.Timedelta(days=30)
    ev = pd.DataFrame(
        {
            "l_partkey": [1, 1, 2, 2, 3],
            "l_shipdate": [t, t, t - 2 * d30, t - 2 * d30, t - 21 * d30],
        }
    )
    pq.write_table(pa.Table.from_pandas(ev), f"{tmp_path}/lineitem.parquet")
    got = trending_parts(str(tmp_path))
    recs = {r.p_partkey: (r.n_orders, r.decay_units) for r in got.itertuples()}
    assert recs[1] == (2, 2 * (1 << 20))
    assert recs[2] == (2, 2 * (1 << 18))
    assert recs[3] == (1, 0)
    assert got["p_partkey"].tolist()[0] == 1  # freshest first


def test_collocation_lift_closed_form(tmp_path):
    """Corpus 'a b' x5 + 'a c' x5: bigrams (a,b) and (a,c) each 5;
    unigrams a=10, b=5, c=5; N_uni=20, N_bi=10.
    lift(a,b) = 5*400/(10*10*5) = 4.0 -> 4000000; doc boundaries cut
    bigrams (no (b,a) across docs)."""
    import pyarrow.parquet as pq

    from dedupe_rust_ray.pipelines.textpipe import collocation_lift

    docs = ["a b"] * 5 + ["a c"] * 5
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(10), pa.int64()),
                "text": pa.array(docs),
            }
        ),
        f"{tmp_path}/documents.parquet",
    )
    got = collocation_lift(str(tmp_path), min_count=5)
    recs = {(r.tok_a, r.tok_b): (r.n_pair, r.lift_scaled)
            for r in got.itertuples()}
    assert recs == {("a", "b"): (5, 4_000_000), ("a", "c"): (5, 4_000_000)}


def test_format_and_confusion_queries_match_oracle():
    """Late-r5 certifications: the JSONL/CSV-sourced censuses and the
    language-ID confusion matrix all hash-match their registered oracles
    at sf0.001 (the driver's comparison, locally)."""
    mod = _entry_module()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    for name in (
        "census_by_lang_jsonl",
        "census_by_lang_csv",
        "langid_confusion",
    ):
        res = mod.queries()[name](SF)
        got = (res.to_pandas() if hasattr(res, "to_pandas") else res).reset_index(
            drop=True
        )
        want = con.sql(mod.oracle_sql()[name]).df()
        cols = sorted(got.columns)
        pd.testing.assert_frame_equal(
            got[cols].sort_values(cols, ignore_index=True),
            want[cols].sort_values(cols, ignore_index=True),
            check_dtype=False,
        )
        assert len(got) > 0
