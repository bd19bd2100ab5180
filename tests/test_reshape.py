"""Reshape / statistical-aggregate pipeline tests (pipelines/reshape.py +
textpipe.tfidf_top_terms). Each query is compared at sf0.001 against the
SAME oracle SQL the driver runs at sf0.01 (pulled from
``__ray_entry__.oracle_sql()`` so the two can never drift), plus targeted
kernel checks for the moment-formula correlation."""

import importlib.util

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
NEW_QUERIES = [
    "pivot_lang_by_source",
    "rollup_census",
    "corr_quantity_price",
    "supplier_directory",
    "event_value_histogram",
    "tfidf_top_terms",
    "q14_promo_revenue",
    "events_sliding_window",
    "decontaminate_bloom",
    "graph_components",
    "q10_returned_items",
    "props_k_stats",
]


def _entry_module():
    spec = importlib.util.spec_from_file_location(
        "ray_entry_for_tests", "/root/repo/__ray_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con.sql(sql).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns), ignore_index=True)


@pytest.mark.parametrize("name", NEW_QUERIES)
def test_reshape_query_matches_registered_oracle(name):
    mod = _entry_module()
    res = mod.queries()[name](SF)
    got = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    want = _duck(mod.oracle_sql()[name])
    assert sorted(got.columns) == sorted(want.columns)
    a, b = _canon(got), _canon(want)
    assert len(a) == len(b)
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]) or pd.api.types.is_float_dtype(b[c]):
            np.testing.assert_allclose(
                a[c].astype(float), b[c].astype(float), rtol=1e-9, atol=1e-8
            )
        else:
            assert a[c].astype(str).tolist() == b[c].astype(str).tolist(), c


def test_corr_moments_match_numpy():
    """The six-moment closed form must agree with np.corrcoef / np.cov on
    the raw columns (population covariance)."""
    from dedupe_rust_ray.pipelines.reshape import corr_quantity_price

    got = corr_quantity_price(SF).set_index("l_returnflag")
    df = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )
    for flag, grp in df.groupby("l_returnflag"):
        x = grp["l_quantity"].to_numpy(np.float64)
        y = grp["l_extendedprice"].to_numpy(np.float64)
        assert got.loc[flag, "n_rows"] == len(grp)
        np.testing.assert_allclose(
            got.loc[flag, "corr_qp"], np.corrcoef(x, y)[0, 1], atol=1e-5
        )
        np.testing.assert_allclose(
            got.loc[flag, "covar_pop_qp"],
            np.cov(x, y, bias=True)[0, 1],
            atol=0.01,
        )


def test_rollup_levels_are_consistent():
    """Rollup invariants: every lang subtotal equals the sum of its
    (lang, source) cells, and the grand total equals the table size."""
    from dedupe_rust_ray.pipelines.reshape import rollup_census

    out = rollup_census(SF)
    finest = out[(out["lang"] != "(all)") & (out["source"] != "(all)")]
    lang_totals = out[(out["lang"] != "(all)") & (out["source"] == "(all)")]
    grand = out[(out["lang"] == "(all)") & (out["source"] == "(all)")]
    assert len(grand) == 1
    assert grand["n"].iloc[0] == finest["n"].sum() == lang_totals["n"].sum()
    merged = finest.groupby("lang")["n"].sum()
    for _, row in lang_totals.iterrows():
        assert merged[row["lang"]] == row["n"]


def test_tfidf_scores_match_brute_force():
    """TF-IDF raw scores for every reported (lang, tok) recomputed from
    plain Python dicts over the whole corpus."""
    from collections import Counter

    from dedupe_rust_ray.pipelines.textpipe import tfidf_top_terms

    got = tfidf_top_terms(SF, k=5)
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["lang", "text"])
    n_docs = len(docs)
    cnt: Counter = Counter()
    df_cnt: Counter = Counter()
    for lang, text in zip(docs["lang"], docs["text"]):
        toks = (text or "").split()
        for t in toks:
            cnt[(lang, t)] += 1
        for t in set(toks):
            df_cnt[t] += 1
    assert (got.groupby("lang").size() <= 5).all()
    for _, row in got.iterrows():
        want = cnt[(row["lang"], row["tok"])] * np.log(
            n_docs / df_cnt[row["tok"]]
        )
        np.testing.assert_allclose(row["tfidf"], want, atol=1e-3)


def test_ddsketch_quantiles_within_alpha():
    """DDSketch quantile estimates must be within the configured relative
    error of exact numpy quantiles for every (event_type, q)."""
    from dedupe_rust_ray.pipelines.reshape import value_quantiles_dd

    alpha = 0.005
    got = value_quantiles_dd(SF, alpha=alpha)
    df = pd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "value"])
    df = df[df["value"] > 0]
    for _, row in got.iterrows():
        # inverted_cdf = the actual order statistic: DDSketch's guarantee
        # is relative to the rank-q SAMPLE, not numpy's default
        # interpolation between order stats (which diverges in sparse
        # tails at small n)
        exact = np.quantile(
            df.loc[df["event_type"] == row["event_type"], "value"].to_numpy(),
            row["q"],
            method="inverted_cdf",
        )
        rel = abs(row["value_est"] - exact) / exact
        assert rel <= 1.5 * alpha, (row.tolist(), exact, rel)
