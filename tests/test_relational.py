"""Relational join-shape pack tests (pipelines/relational.py): Q13/Q15/
Q17/Q18/Q22/Q9-shaped queries. Each is pinned at sf0.001 against the
EXACT driver oracle SQL (imported from __ray_entry__.oracle_sql, so the
test and the driver check can never drift), plus edge-semantics cases
the sf tables don't exercise."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"

_TABLES = ("region nation customer supplier part orders lineitem").split()


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in _TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con.sql(sql).df()


@pytest.fixture(scope="module")
def oracles():
    import __ray_entry__

    return __ray_entry__.oracle_sql()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns), ignore_index=True)


def _assert_matches(got: pd.DataFrame, want: pd.DataFrame):
    assert sorted(got.columns) == sorted(want.columns)
    a, b = _canon(got), _canon(want)
    assert len(a) == len(b)
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]) or pd.api.types.is_float_dtype(b[c]):
            np.testing.assert_allclose(
                a[c].astype(float), b[c].astype(float), rtol=1e-9, atol=1e-8
            )
        else:
            assert a[c].astype(str).equals(b[c].astype(str)), c


@pytest.mark.parametrize(
    "name",
    [
        "q13_order_count_distribution",
        "q15_top_supplier",
        "q17_small_quantity_revenue",
        "q18_large_orders",
        "q22_idle_rich_customers",
        "q9_profit_by_nation_year",
        "q2_min_cost_supplier",
        "q7_nation_trade_volume",
        "q8_market_share",
        "q11_important_parts",
        "q12_priority_by_returnflag",
        "q16_supplier_count_by_part_attr",
        "q19_bracket_revenue",
        "q20_heavy_shippers",
        "q21_sole_returners",
    ],
)
def test_matches_driver_oracle(name, oracles):
    from dedupe_rust_ray.pipelines import relational

    got = getattr(relational, name)(SF)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    _assert_matches(got, _duck(oracles[name]))


def test_q13_zero_bucket_present(oracles):
    """The outer-join semantics: the zero-order bucket appears whenever
    some customer has no orders (every sf customer has orders, so the
    bucket logic is pinned arithmetically instead)."""
    from dedupe_rust_ray.pipelines.relational import q13_order_count_distribution

    got = q13_order_count_distribution(SF)
    n_orders = _duck("SELECT COUNT(*) AS n FROM orders")["n"][0]
    n_cust = _duck("SELECT COUNT(*) AS n FROM customer")["n"][0]
    assert (got["c_count"] * got["custdist"]).sum() == n_orders
    assert got["custdist"].sum() == n_cust


def test_q18_threshold_and_order():
    """HAVING filter really bounds sum_qty, and output order is the
    deterministic (o_totalprice DESC, o_orderkey) total order."""
    from dedupe_rust_ray.pipelines.relational import q18_large_orders

    got = q18_large_orders(SF)
    assert (got["sum_qty"] > 250.0).all()
    key = list(zip(-got["o_totalprice"], got["o_orderkey"]))
    assert key == sorted(key)


def test_q22_empty_result_schema():
    """An idleness cutoff before the data's first order date empties the
    anti-join; the result must keep its schema (the driver hashes
    column names even for 0 rows)."""
    from dedupe_rust_ray.pipelines.relational import q22_idle_rich_customers

    got = q22_idle_rich_customers(SF, cutoff="1990-01-01")
    assert list(got.columns) == ["c_nationkey", "n_customers", "sum_acctbal"]
    assert len(got) == 0


def test_q15_argmax_is_rounded_comparison():
    """Winners are selected on ROUNDED revenue — every winner's rounded
    revenue equals the rounded max exactly."""
    from dedupe_rust_ray.pipelines.relational import q15_top_supplier

    got = q15_top_supplier(SF)
    assert len(got) >= 1
    assert (got["total_revenue"] == got["total_revenue"].max()).all()


def test_empty_dimension_parameterizations_return_empty():
    """A selective parameter that matches nothing must yield an empty
    (or zero) result, not crash: the broadcast probe sees an empty key
    array and the fact x fact join sees an all-empty probe side (the
    acero schema-degradation hazard, guarded by a sentinel row)."""
    from dedupe_rust_ray.pipelines import relational

    sf = "/root/testdata/sf0.001"
    assert len(relational.q9_profit_by_nation_year(sf, pattern="zz_none")) == 0
    assert len(relational.q20_heavy_shippers(sf, pattern="zz_none")) == 0
    assert len(relational.q11_important_parts(sf, nationkey=99)) == 0
    q17 = relational.q17_small_quantity_revenue(sf, brand="Brand#none")
    assert len(q17) == 1  # scalar aggregate over nothing -> zero revenue
