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


def test_lang_id_sql_oracle_parity_multilingual():
    """The DuckDB replica in __ray_entry__._lang_id_sql must agree with
    lang_id_batch on every branch: each language, CJK, tie-breaks, und."""
    import sys

    import duckdb

    sys.path.insert(0, "/root/repo")
    from __ray_entry__ import _lang_id_sql

    texts = [
        "the cat and the dog are in the house",
        "le chat est dans la maison avec le chien",
        "el gato y el perro en la casa",
        "der Hund ist in dem Haus und die Katze",
        "这是一个中文句子用于测试语言识别",
        "xyzzy plugh qwerty",            # no stopwords -> und
        "",                               # empty -> und
        "the le el der",                  # 4-way tie -> en (dict order)
        "le el der",                      # 3-way tie among fr/es/de -> fr
        "el der",                         # es/de tie -> es
        "short 中文 mix with enough the and of cjk below threshold",
    ]
    py = lang_id_batch(pd.Series(texts)).value_counts().sort_index()

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?)", [(t,) for t in texts])
    odf = con.execute(_lang_id_sql()).fetchdf()
    sql = dict(zip(odf["pred_lang"], odf["n"].astype(int)))
    assert dict(py) == sql


def test_heavy_hitter_tokens_matches_bruteforce():
    import numpy as np

    from dedupe_rust_ray.pipelines.textpipe import heavy_hitter_tokens

    SF = "/root/testdata/sf0.001"
    k = 100
    out = heavy_hitter_tokens(SF, k=k)
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    toks = np.concatenate([t.split() for t in docs["text"]])
    u, c = np.unique(toks, return_counts=True)
    heavy = {t: int(n) for t, n in zip(u, c) if n > len(toks) / k}
    assert dict(zip(out["tok"], out["n"])) == heavy
    assert (out["n"].to_numpy()[:-1] >= out["n"].to_numpy()[1:]).all()


def test_unigram_logprob_matches_bruteforce():
    import numpy as np

    from dedupe_rust_ray.pipelines.textpipe import unigram_logprob

    SF = "/root/testdata/sf0.001"
    V = 30  # force real OOV traffic
    out = unigram_logprob(SF, vocab_size=V).to_pandas()

    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    toks = np.concatenate([t.split() for t in docs["text"]])
    u, c = np.unique(toks, return_counts=True)
    n_total = len(toks)
    order = np.lexsort((u, -c))[:V]
    model = {u[i]: np.log(c[i] / n_total) for i in order}
    oov = np.log(1.0 / n_total)

    for _, row in docs.iterrows():
        ws = row["text"].split()
        lp = np.array([model.get(w, oov) for w in ws])
        want = np.floor((-lp.sum() / max(len(ws), 1)) * 1e4 + 0.5) / 1e4
        got = float(out.loc[out["doc_id"] == row["doc_id"], "avg_neg_logprob"].iloc[0])
        assert got == want, (row["doc_id"], got, want)
    assert (out["n_tokens"] > 0).all()


def test_bm25_search_ranking_semantics(tmp_path):
    """BM25 ranks a doc with more query-term occurrences (and shorter
    length) above sparser matches; non-matching docs are excluded."""
    import pandas as pd
    import numpy as np

    from dedupe_rust_ray.pipelines.textpipe import bm25_search

    texts = [
        "table hash sort",                       # all three terms, short
        "table " + " ".join(["x"] * 50),         # one term, long
        "no query words here at all",            # excluded
        "table table hash " + " ".join(["y"] * 10),
    ]
    pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": texts,
            "lang": "en",
            "source": "t",
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    out = bm25_search(str(tmp_path)).to_pandas()
    assert set(out["doc_id"]) == {0, 1, 3}
    top = out.iloc[0]
    assert top["doc_id"] == 0  # densest match, shortest doc
    assert (out["score"].to_numpy()[:-1] >= out["score"].to_numpy()[1:]).all()
