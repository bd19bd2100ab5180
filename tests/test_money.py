"""Exact fixed-point money aggregation (pipelines/common money helpers).

Round-3 post-mortem: q10_returned_items hash-flaked because float64
revenue partials summed in Ray-block-layout order flip FLOOR(x*100+0.5)
by one cent when a group's sum lands on a .xx5 boundary. The fix —
exact int64 units end to end — is pinned here three ways: unit-level
exactness of the helpers, equivalence of the broadcast and join ladder
legs, and run-to-run determinism of a converted revenue query.
"""

from __future__ import annotations

import numpy as np
import pytest

from dedupe_rust_ray.pipelines.common import (
    cents_to_money,
    money_cents,
    revenue_units,
    units_to_money,
)

SF_DIR = "/root/testdata/sf0.001"


def test_money_cents_exact_on_2dp_grid():
    rng = np.random.default_rng(7)
    cents = rng.integers(-1_000_000, 50_000_000, size=20_000)
    vals = cents / 100.0  # float64 representation of 2-decimal values
    assert (money_cents(vals) == cents).all()


def test_revenue_units_matches_floor_rounding_off_boundary():
    # away from .xx5 boundaries the float path and the exact path agree
    rng = np.random.default_rng(11)
    price = rng.integers(100, 10_000_000, size=5_000) / 100.0
    disc = rng.integers(0, 11, size=5_000) / 100.0
    units = revenue_units(price, disc)
    assert units.dtype == np.int64
    exact = money_cents(price) * (100 - money_cents(disc))
    assert (units == exact).all()


def test_units_to_money_half_up_boundary():
    # 1.005 dollars = 10050 units: half-up -> 1.01 (floor form), and the
    # adjacent units land on the right cents
    assert units_to_money(np.array([10050])).tolist() == [1.01]
    assert units_to_money(np.array([10049])).tolist() == [1.0]
    assert units_to_money(np.array([10150])).tolist() == [1.02]
    assert cents_to_money(np.array([-155])).tolist() == [-1.55]


def test_units_to_money_matches_oracle_sql_form():
    """The SQL mirror CAST((S+50)//100 AS DOUBLE)/100 must equal
    units_to_money on nonnegative sums (DuckDB // truncates, numpy
    floors — identical for the nonnegative revenue domain)."""
    duckdb = pytest.importorskip("duckdb")
    rng = np.random.default_rng(13)
    sums = rng.integers(0, 10**15, size=1_000)
    got = units_to_money(sums)
    con = duckdb.connect()
    con.register(
        "t", __import__("pandas").DataFrame({"u": sums.astype(np.int64)})
    )
    want = (
        con.sql("SELECT CAST((u + 50) // 100 AS DOUBLE) / 100 AS m FROM t")
        .df()["m"]
        .to_numpy()
    )
    assert (got == want).all()


def test_q17_broadcast_and_join_paths_agree():
    from dedupe_rust_ray.pipelines.relational import q17_small_quantity_revenue

    a = q17_small_quantity_revenue(SF_DIR)
    b = q17_small_quantity_revenue(SF_DIR, broadcast_max_rows=0)
    assert a.equals(b)


def test_revenue_query_is_run_to_run_deterministic():
    """The flake reproduced ACROSS runs (block layout), not within one —
    two full executions must produce bit-identical revenue values."""
    from dedupe_rust_ray.pipelines.joins import q10_returned_items

    a = q10_returned_items(SF_DIR, k=10)
    b = q10_returned_items(SF_DIR, k=10)
    assert a["revenue"].tolist() == b["revenue"].tolist()
    assert a["c_custkey"].tolist() == b["c_custkey"].tolist()
