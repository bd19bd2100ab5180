import pandas as pd

from dedupe_rust_ray.functions.textstats import (
    lang_id_batch,
    quality_scores_batch,
    token_count_batch,
    winnow_fingerprints,
)


def test_lang_id():
    s = pd.Series(
        [
            "the cat and the dog are in the house",
            "le chat est dans la maison avec le chien",
            "el gato y el perro en la casa",
            "der Hund ist in dem Haus und die Katze",
            "这是一个中文句子用于测试语言识别",
            "",
        ]
    )
    assert lang_id_batch(s).tolist() == ["en", "fr", "es", "de", "zh", "und"]


def test_token_count_matches_python_split():
    texts = ["a b  c", "", "  leading and trailing  ", "one"]
    s = pd.Series(texts)
    assert token_count_batch(s).tolist() == [len(t.split()) for t in texts]


def test_token_count_bpe_counts_symbols():
    s = pd.Series(["hello, world! 42"])
    # hello , world ! 42 -> 5 pieces
    assert token_count_batch(s, mode="bpe").tolist() == [5]


def test_quality_scores_ranges():
    s = pd.Series(["The quick brown fox jumps over the lazy dog near the bank.", "!!!", ""])
    q = quality_scores_batch(s)
    assert (q["quality_score"] >= 0).all() and (q["quality_score"] <= 1).all()
    assert q["quality_score"][0] > q["quality_score"][1]
    assert q["n_tokens"].tolist() == [12, 1, 0]


def test_winnow_fingerprints():
    sel, fp = winnow_fingerprints(["abcdefghij xyz 123456", "abcdefghij xyz 123456", "zzzz"])
    assert fp[0] == fp[1]
    assert fp[0] != fp[2]
    assert sel[0] == sel[1]
