"""Pins for the round-5 data-quality / profiling family:
profile_documents, ref_integrity_audit (broadcast vs join-leg parity),
user_behavior_entropy (edge semantics). Value certification runs through
oracle_sql(); these pin ladders and edge cases.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from dedupe_rust_ray.pipelines.joins import ref_integrity_audit
from dedupe_rust_ray.pipelines.reshape import profile_documents
from dedupe_rust_ray.pipelines.sessions import user_behavior_entropy

SF = "/root/testdata/sf0.001"


def test_ref_integrity_audit_ladder_parity():
    """Forced tiny ceiling routes EVERY dimension through the left_anti
    join leg — results must match the broadcast leg bit-for-bit."""
    bcast = ref_integrity_audit(SF)
    joined = ref_integrity_audit(SF, broadcast_max_rows=0)
    assert bcast.equals(joined)


def test_ref_integrity_audit_counts_known_orphans():
    """Synthetic check against a local replica: the audit's orphan count
    equals the set-difference cardinality for every edge."""
    out = ref_integrity_audit(SF).set_index(["fact", "fk"])
    tables = {
        t: pq.read_table(f"{SF}/{t}.parquet")
        for t in ("orders", "customer", "lineitem", "part", "supplier", "events")
    }
    for fact, fk, dim, key in (
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("events", "user_id", "customer", "c_custkey"),
    ):
        probe = tables[fact][fk].to_numpy()
        keys = set(tables[dim][key].to_pylist())
        expected = int(sum(1 for v in probe if int(v) not in keys))
        row = out.loc[(fact, fk)]
        assert int(row["n_rows"]) == len(probe)
        assert int(row["n_orphans"]) == expected


def test_profile_documents_matches_local_replica():
    out = profile_documents(SF).set_index(["col", "stat"])["value"]
    t = pq.read_table(f"{SF}/documents.parquet")
    n = t.num_rows
    texts = t["text"].to_pylist()
    lens = [len(x) for x in texts if x is not None]
    ids = t["doc_id"].to_numpy()
    assert out[("doc_id", "n_rows")] == n
    assert out[("doc_id", "min")] == ids.min()
    assert out[("doc_id", "max")] == ids.max()
    assert out[("text", "sum_len")] == sum(lens)
    assert out[("text", "min_len")] == min(lens)
    assert out[("text", "max_len")] == max(lens)
    assert out[("lang", "n_null")] == t["lang"].null_count


def test_mad_matches_numpy_replica():
    """Grouped MAD from the histogram equals the brute-force two-median
    replica (even AND odd group sizes at fixture scale)."""
    from dedupe_rust_ray.pipelines.reshape import mad_quantity_by_flag

    out = mad_quantity_by_flag(SF).set_index("l_returnflag")
    li = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_returnflag", "l_quantity"]
    ).to_pandas()

    def qcont(a, q):
        a = np.sort(np.asarray(a, float))
        h = q * (len(a) - 1)
        lo, hi = int(np.floor(h)), int(np.ceil(h))
        return a[lo] + (h - lo) * (a[hi] - a[lo])

    for flag, g in li.groupby("l_returnflag"):
        v = g["l_quantity"].to_numpy(float)
        med = qcont(v, 0.5)
        mad = qcont(np.abs(v - med), 0.5)
        assert out.loc[flag, "median_qty"] == med
        assert out.loc[flag, "mad_qty"] == mad
        assert int(out.loc[flag, "n_rows"]) == len(v)


def test_user_behavior_entropy_edges():
    df = user_behavior_entropy(SF).to_pandas()
    # entropy bounds: 0 <= H <= ln(|types|); -0.0 never leaks
    assert (df["entropy"] >= 0).all()
    assert (df["entropy"] <= np.log(5) + 1e-9).all()
    assert not np.signbit(df["entropy"].to_numpy()).any()
    # replica on one user
    ev = pq.read_table(f"{SF}/events.parquet", columns=["user_id", "event_type"]).to_pandas()
    uid = int(df["user_id"].iloc[0])
    c = ev[ev["user_id"] == uid]["event_type"].value_counts().sort_index().to_numpy(np.float64)
    p = c / c.sum()
    h = float(-(p * np.log(p)).sum())
    assert df.set_index("user_id").loc[uid, "entropy"] == np.floor(h * 10000 + 0.5) / 10000
    assert int(df.set_index("user_id").loc[uid, "n_events"]) == int(c.sum())


def test_user_behavior_entropy_single_type_user_is_zero():
    """A user with exactly one event type must score exactly 0.0 (the
    -0.0 / ln(1) edge) through the REAL fold; a 4:1 user must match the
    closed form."""
    import pyarrow as pa
    import ray.data

    t = pa.table(
        {
            "user_id": pa.array([7, 7, 7, 9, 9, 9, 9, 9], type=pa.int64()),
            "event_type": pa.array(
                ["click", "click", "click",
                 "click", "click", "click", "click", "view"]
            ),
        }
    )
    out = (
        user_behavior_entropy("", events=ray.data.from_arrow(t))
        .to_pandas()
        .set_index("user_id")
    )
    assert out.loc[7, "entropy"] == 0.0
    assert not np.signbit(out.loc[7, "entropy"])
    p = np.array([4 / 5, 1 / 5])
    h = float(-(p * np.log(p)).sum())
    assert out.loc[9, "entropy"] == np.floor(h * 10000 + 0.5) / 10000


def test_events_debounce_burst_semantics(tmp_path):
    """Burst of 4 events 10 min apart with min_gap 1 h: LAG semantics drop
    EVERY follower (each compares to its immediate predecessor, kept or
    not) — unlike greedy-anchor dedup which would keep a later one. A
    different event_type in the middle of the burst is its own key and
    survives; the next event 2 h later survives."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dedupe_rust_ray.pipelines.sessions import events_debounce

    t0 = pd.Timestamp("2024-01-01")
    mins = [0, 10, 20, 30, 150]
    ev = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 5, 6],
            "user_id": [7] * 6,
            "event_type": ["click"] * 5 + ["view"],
            "ts": [t0 + pd.Timedelta(minutes=m) for m in mins]
            + [t0 + pd.Timedelta(minutes=15)],
            "value": [1.0] * 6,
        }
    )
    pq.write_table(pa.Table.from_pandas(ev), tmp_path / "events.parquet")
    got = events_debounce(str(tmp_path)).to_pandas()
    assert got["event_id"].tolist() == [1, 5, 6]


def test_events_debounce_matches_registered_oracle():
    import duckdb
    import importlib.util
    import pandas as pd

    spec = importlib.util.spec_from_file_location(
        "ray_entry_for_debounce", "/root/repo/__ray_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    got = mod.queries()["events_debounce"](SF)
    got = (got.to_pandas() if hasattr(got, "to_pandas") else got).reset_index(
        drop=True
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    want = con.sql(mod.oracle_sql()["events_debounce"]).df()
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)],
        check_dtype=False,
    )
    assert len(got) < 1000  # the 1-hour threshold actually drops rows


def test_top_event_paths_user_isolation_and_ties(tmp_path):
    """Triples never cross a user boundary; equal-count paths order
    lexicographically. User 1: a,b,c,d -> paths (a,b,c), (b,c,d); user 2:
    x,y (too short, contributes nothing)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dedupe_rust_ray.pipelines.sessions import top_event_paths

    t0 = pd.Timestamp("2024-01-01")
    ev = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 5, 6],
            "user_id": [1, 1, 1, 1, 2, 2],
            "event_type": ["a", "b", "c", "d", "x", "y"],
            "ts": [t0 + pd.Timedelta(minutes=m) for m in range(6)],
            "value": [1.0] * 6,
        }
    )
    pq.write_table(pa.Table.from_pandas(ev), tmp_path / "events.parquet")
    got = top_event_paths(str(tmp_path))
    assert got[["t1", "t2", "t3", "n"]].values.tolist() == [
        ["a", "b", "c", 1],
        ["b", "c", "d", 1],
    ]
