"""Cardinality-sketch and distributed-quantile tests: HLL estimate
accuracy bounds, register-merge associativity, and PERCENTILE_CONT
parity for the histogram-merge quantile path."""

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_hll_accuracy_bounds():
    """p=12 HLL has ~1.6% stderr; require 5% (3 sigma) across scales."""
    from dedupe_rust_ray.functions.hashing import stable_hash64
    from dedupe_rust_ray.functions.sketches import (
        estimate_from_registers,
        registers_from_hashes,
    )

    rng = np.random.default_rng(5)
    for true_n in (10, 500, 20_000, 300_000):
        vals = np.array([f"item-{i}" for i in range(true_n)], dtype=object)
        # duplicates must not move the estimate
        dup = rng.integers(0, true_n, true_n // 2)
        all_vals = np.concatenate([vals, vals[dup]])
        reg, rho = registers_from_hashes(stable_hash64(all_vals))
        df = pd.DataFrame({"reg": reg, "rho": rho}).groupby("reg", as_index=False).max()
        est = estimate_from_registers(df["reg"].to_numpy(), df["rho"].to_numpy())
        assert abs(est - true_n) / true_n < 0.05, (true_n, est)


def test_hll_merge_associative():
    """Sharded merge (max per register) == single-pass sketch."""
    from dedupe_rust_ray.functions.hashing import stable_hash64
    from dedupe_rust_ray.functions.sketches import (
        estimate_from_registers,
        registers_from_hashes,
    )

    vals = np.array([f"x{i}" for i in range(5000)], dtype=object)
    reg, rho = registers_from_hashes(stable_hash64(vals))
    whole = pd.DataFrame({"reg": reg, "rho": rho}).groupby("reg")["rho"].max()
    parts = []
    for chunk in np.array_split(np.arange(5000), 7):
        r, o = registers_from_hashes(stable_hash64(vals[chunk]))
        parts.append(pd.DataFrame({"reg": r, "rho": o}))
    merged = pd.concat(parts).groupby("reg")["rho"].max()
    pd.testing.assert_series_equal(whole, merged)
    assert estimate_from_registers(
        whole.index.to_numpy(), whole.to_numpy()
    ) == estimate_from_registers(merged.index.to_numpy(), merged.to_numpy())


def test_distinct_texts_hll_tracks_exact():
    from dedupe_rust_ray.pipelines.textpipe import distinct_texts_hll

    got = distinct_texts_hll(SF).set_index("lang")["est_distinct"]
    want = duckdb.sql(
        f"SELECT lang, COUNT(DISTINCT text) AS n FROM '{SF}/documents.parquet' "
        "GROUP BY lang ORDER BY lang"
    ).df().set_index("lang")["n"]
    assert set(got.index) == set(want.index)
    for lang in want.index:
        assert abs(got[lang] - want[lang]) / max(want[lang], 1) < 0.05


def test_doc_len_quantiles_matches_percentile_cont():
    from dedupe_rust_ray.pipelines.analytics import doc_len_quantiles

    got = doc_len_quantiles(SF).reset_index(drop=True)
    want = duckdb.sql(
        "SELECT lang, "
        "ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY n_chars), 4) AS p50, "
        "ROUND(percentile_cont(0.9) WITHIN GROUP (ORDER BY n_chars), 4) AS p90, "
        f"CAST(COUNT(*) AS BIGINT) AS n FROM '{SF}/documents.parquet' "
        "GROUP BY lang ORDER BY lang"
    ).df()
    pd.testing.assert_frame_equal(got, want)


def test_top_tokens_matches_exact_counts():
    from dedupe_rust_ray.pipelines.textpipe import top_tokens

    got = top_tokens(SF, k=15).reset_index(drop=True)
    want = duckdb.sql(
        "WITH t AS (SELECT unnest(regexp_split_to_array(text, '\\s+')) AS tok "
        f"FROM '{SF}/documents.parquet') "
        "SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM t WHERE tok <> '' "
        "GROUP BY tok ORDER BY n DESC, tok LIMIT 15"
    ).df()
    pd.testing.assert_frame_equal(got, want)
