"""Broadcast<->join ladder equivalence (the q5 discipline).

Every query that ships a dimension side as a broadcast sorted array
documents a ``broadcast_max_rows`` ceiling above which it switches to a
hash ``Dataset.join``. These tests force the join leg (ceiling too small
for the dimension) and pin it equal to the broadcast leg — so the
documented 100x-scale path is executable, not an assert."""

from __future__ import annotations

SF_DIR = "/root/testdata/sf0.001"


def _eq(a, b):
    assert list(a.columns) == list(b.columns)
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_q19_bracket_mask_join_leg():
    from dedupe_rust_ray.pipelines.relational import q19_bracket_revenue

    _eq(
        q19_bracket_revenue(SF_DIR),
        q19_bracket_revenue(SF_DIR, broadcast_max_rows=0),
    )


def test_q16_attr_code_join_leg():
    from dedupe_rust_ray.pipelines.relational import (
        q16_supplier_count_by_part_attr,
    )

    _eq(
        q16_supplier_count_by_part_attr(SF_DIR),
        q16_supplier_count_by_part_attr(SF_DIR, broadcast_max_rows=0),
    )


def test_q7_q8_customer_join_leg():
    from dedupe_rust_ray.pipelines.relational import (
        q7_nation_trade_volume,
        q8_market_share,
    )

    # ceiling between |supplier| (sf*10k) and |customer| (sf*150k):
    # supplier stays broadcast, the customer leg switches to the join
    _eq(
        q7_nation_trade_volume(SF_DIR),
        q7_nation_trade_volume(SF_DIR, broadcast_max_rows=50),
    )
    _eq(
        q8_market_share(SF_DIR),
        q8_market_share(SF_DIR, broadcast_max_rows=50),
    )
