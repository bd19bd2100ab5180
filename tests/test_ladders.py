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


def test_q7_q8_supplier_join_leg():
    from dedupe_rust_ray.pipelines.relational import (
        q7_nation_trade_volume,
        q8_market_share,
    )

    # ceiling of 0 forces BOTH legs over: supplier attaches s_nationkey
    # on the lineitem read, customer attaches c_nationkey on orders
    _eq(
        q7_nation_trade_volume(SF_DIR),
        q7_nation_trade_volume(SF_DIR, broadcast_max_rows=0),
    )
    _eq(
        q8_market_share(SF_DIR),
        q8_market_share(SF_DIR, broadcast_max_rows=0),
    )


def test_q22_cutoff_after_all_orders_empty_keys_side():
    """A cutoff later than every order date makes the anti-join's keys
    side empty — the acero schema-degradation hazard the sentinel row
    guards. All above-average-balance customers must come back."""
    import duckdb

    from dedupe_rust_ray.pipelines.relational import q22_idle_rich_customers

    got = q22_idle_rich_customers(SF_DIR, cutoff="2099-01-01")
    con = duckdb.connect()
    want = con.sql(
        f"""
        SELECT CAST(c_nationkey AS INTEGER) AS c_nationkey,
               COUNT(*) AS n_customers,
               FLOOR(SUM(c_acctbal) * 100 + 0.5) / 100 AS sum_acctbal
        FROM read_parquet('{SF_DIR}/customer.parquet')
        WHERE c_acctbal > (
            SELECT AVG(c_acctbal)
            FROM read_parquet('{SF_DIR}/customer.parquet')
            WHERE c_acctbal > 0.0)
        GROUP BY 1 ORDER BY 1
        """
    ).df()
    assert got["c_nationkey"].tolist() == want["c_nationkey"].tolist()
    assert got["n_customers"].tolist() == want["n_customers"].tolist()
    assert got["sum_acctbal"].tolist() == want["sum_acctbal"].tolist()


def test_q9_both_dimension_join_legs():
    from dedupe_rust_ray.pipelines.relational import q9_profit_by_nation_year

    base = q9_profit_by_nation_year(SF_DIR)
    # ceiling 0 forces BOTH legs to join; a mid ceiling (between the
    # pattern-key count and |supplier|) mixes one broadcast + one join
    _eq(base, q9_profit_by_nation_year(SF_DIR, broadcast_max_rows=0))
    _eq(base, q9_profit_by_nation_year(SF_DIR, broadcast_max_rows=8))


def test_q11_supplier_join_leg():
    from dedupe_rust_ray.pipelines.relational import q11_important_parts

    _eq(
        q11_important_parts(SF_DIR),
        q11_important_parts(SF_DIR, broadcast_max_rows=0),
    )


def test_q20_part_keys_join_leg():
    from dedupe_rust_ray.pipelines.relational import q20_heavy_shippers

    _eq(
        q20_heavy_shippers(SF_DIR),
        q20_heavy_shippers(SF_DIR, broadcast_max_rows=0),
    )


def test_q2_part_attr_join_leg():
    from dedupe_rust_ray.pipelines.relational import q2_min_cost_supplier

    _eq(
        q2_min_cost_supplier(SF_DIR),
        q2_min_cost_supplier(SF_DIR, broadcast_max_rows=0),
    )


def test_lsh_fused_vs_sharded_candidate_paths(monkeypatch):
    import dedupe_rust_ray.pipelines.dedupe as D

    def run(q, **kw):
        r = q(SF_DIR, **kw)
        df = r.to_pandas() if hasattr(r, "to_pandas") else r
        return df.reset_index(drop=True)

    fused_mh = run(D.minhash_lsh_dedup)
    fused_ng = run(D.ngram_jaccard_dedup)
    fused_sh = run(D.simhash_near_dups)
    # ceiling 0 forces the sharded groupby path + actor-pool verify
    monkeypatch.setattr(D, "_FUSED_BAND_ROWS_MAX", 0)
    _eq(fused_mh, run(D.minhash_lsh_dedup))
    _eq(fused_ng, run(D.ngram_jaccard_dedup))
    sharded_sh = run(D.simhash_near_dups)
    assert fused_sh[["doc_a", "doc_b"]].values.tolist() == (
        sharded_sh[["doc_a", "doc_b"]].values.tolist()
    )
    assert (
        fused_sh["hamming"].astype("int64").tolist()
        == sharded_sh["hamming"].astype("int64").tolist()
    )


def test_dedup_fused_fold_vs_groupby_paths(monkeypatch):
    import dedupe_rust_ray.pipelines.curation as C

    def run():
        a = C.dedup_lines(SF_DIR).to_pandas().reset_index(drop=True)
        b = C.dedup_spans(SF_DIR).to_pandas().reset_index(drop=True)
        return a, b

    fused = run()
    monkeypatch.setattr(C, "_FUSED_FOLD_MAX_ROWS", 0)
    grouped = run()
    for f, g in zip(fused, grouped):
        _eq(f, g)


def test_er_fused_vs_sharded_candidate_paths():
    import ray

    from dedupe_rust_ray.config import ERConfig
    from dedupe_rust_ray.pipelines.er import er_pipeline
    from dedupe_rust_ray.sources.corpus import synth_corpus_distributed

    corpus = synth_corpus_distributed(800, blocks=4).materialize()
    fused = er_pipeline(corpus, ERConfig()).to_pandas()
    sharded = er_pipeline(
        corpus, ERConfig(fused_band_rows_max=0)
    ).to_pandas()
    _eq(fused, sharded)


def test_er_fused_path_calls_pair_kernel_per_shard(monkeypatch):
    # the fused (gathered) candidate path must apply cfg.max_pairs_per_shard
    # with the SAME granularity as the distributed map_groups path: one
    # kernel call per shard group, never one global call over the gather
    import dedupe_rust_ray.pipelines.er as er_mod
    from dedupe_rust_ray.config import ERConfig
    from dedupe_rust_ray.sources.corpus import synth_corpus_distributed

    calls = []
    orig = er_mod.candidate_pairs_in_shard

    def spy(group, cfg):
        calls.append(int(group["shard"].nunique()))
        return orig(group, cfg)

    monkeypatch.setattr(er_mod, "candidate_pairs_in_shard", spy)
    corpus = synth_corpus_distributed(300, blocks=2).materialize()
    er_mod.er_pipeline(corpus, ERConfig()).to_pandas()
    assert calls, "fused path not taken at 300 docs"
    assert all(c == 1 for c in calls)
