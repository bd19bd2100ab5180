import pytest

from dedupe_rust_ray.functions.strsim import jaro, jaro_winkler, levenshtein_bounded


def test_jaro_known_values():
    assert jaro("martha", "marhta") == pytest.approx(0.9444, abs=1e-3)
    assert jaro_winkler("martha", "marhta") == pytest.approx(0.9611, abs=1e-3)
    assert jaro("abc", "abc") == 1.0
    assert jaro("abc", "xyz") == 0.0
    assert jaro("", "abc") == 0.0


def test_levenshtein():
    assert levenshtein_bounded("kitten", "sitting", 10) == 3
    assert levenshtein_bounded("abc", "abc", 2) == 0
    assert levenshtein_bounded("abc", "abcdefgh", 2) == 3  # bound exceeded
    assert levenshtein_bounded("", "abcd", 10) == 4


def test_jaro_winkler_boost_threshold_matches_duckdb():
    """boost_threshold=0.7 reproduces DuckDB's jaro_winkler_similarity
    exactly (no boost below 0.7 base Jaro; '' vs '' handled upstream)."""
    import duckdb

    from dedupe_rust_ray.functions.strsim import jaro_winkler

    con = duckdb.connect()
    pairs = [
        ("Customer#000000001", "Customer#000000002"),
        ("abc", "acb"),  # base jaro < 0.7: boost must NOT apply
        ("DIXON", "DICKSONX"),
        ("Jones", "Jonse"),
        ("", "x"),
        ("a", "a"),
    ]
    for a, b in pairs:
        want = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        got = jaro_winkler(a, b, boost_threshold=0.7)
        assert abs(got - want) < 1e-12, (a, b, got, want)
    # default keeps the ER scorer's historical always-boost behavior
    assert jaro_winkler("abc", "acb") > jaro_winkler(
        "abc", "acb", boost_threshold=0.7
    )
