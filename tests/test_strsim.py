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
