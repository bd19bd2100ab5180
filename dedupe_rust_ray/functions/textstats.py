"""Text analysis kernels for large-scale training-data pipelines.

All operate on whole batches (pandas/numpy vectorized or one pass per batch):
language ID (stopword + script heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), and winnowing document fingerprints.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from .shingles import char_shingle_hashes
from .hashing import stable_hash64

# --- language identification (n-gram / stopword heuristic) -----------------

_LANG_STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to a in is it you that he was for on are with as i his they be at".split()),
    "fr": frozenset("le la les de des un une et est dans que pour sur avec ne pas au du ce il elle nous vous".split()),
    "es": frozenset("el la los las de un una y es en que por para con no se su al lo como mas pero sus le".split()),
    "de": frozenset("der die das und ist in den von zu mit sich des auf fur nicht ein eine als auch es an".split()),
}

_TOKEN_RE = re.compile(r"\w+", re.UNICODE)
# BPE-ish pre-tokenizer: word pieces, numbers, or single non-space symbols
# (public GPT-2-style pattern simplified to stdlib `re` syntax).
_BPE_RE = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]")


def lang_id_batch(texts: pd.Series) -> pd.Series:
    """Best-guess language code per text: CJK script ratio -> 'zh', else the
    stopword profile with the most hits; 'und' when nothing matches."""
    lowered = texts.fillna("").str.lower()
    token_lists = lowered.str.findall(_TOKEN_RE)

    def classify(entry: tuple[str, list[str]]) -> str:
        text, toks = entry
        if text:
            cjk = sum(1 for ch in text if "一" <= ch <= "鿿")
            if cjk / max(1, len(text)) > 0.2:
                return "zh"
        best, best_hits = "und", 0
        for lang, stops in _LANG_STOPWORDS.items():
            hits = sum(1 for t in toks if t in stops)
            if hits > best_hits:
                best, best_hits = lang, hits
        return best

    return pd.Series(
        [classify(e) for e in zip(lowered.tolist(), token_lists.tolist())],
        index=texts.index,
        dtype="object",
    )


def token_count_batch(texts: pd.Series, *, mode: str = "ws") -> pd.Series:
    """Token counts per text. ``ws``: whitespace tokens; ``bpe``: BPE-ish."""
    filled = texts.fillna("")
    if mode == "bpe":
        return filled.str.count(_BPE_RE).astype("int64")
    return filled.str.split().str.len().fillna(0).astype("int64")


def quality_scores_batch(texts: pd.Series) -> pd.DataFrame:
    """Heuristic quality features per text (all vectorized):

    - n_chars, n_tokens, mean_token_len
    - punct_ratio   : punctuation chars / chars
    - upper_ratio   : uppercase chars / chars
    - stopword_ratio: English stopword tokens / tokens
    - quality_score : simple fused score in [0, 1]
    """
    filled = texts.fillna("")
    n_chars = filled.str.len().astype("int64")
    tokens = filled.str.split()
    n_tokens = tokens.str.len().fillna(0).astype("int64")
    denom_c = n_chars.clip(lower=1)
    denom_t = n_tokens.clip(lower=1)
    punct = filled.str.count(r"[^\w\s]").astype("int64")
    upper = filled.str.count(r"[A-Z]").astype("int64")
    stops = _LANG_STOPWORDS["en"]
    stop_hits = tokens.map(
        lambda ws: sum(1 for w in ws if w.lower() in stops) if isinstance(ws, list) else 0
    ).astype("int64")
    mean_tok = ((n_chars - n_tokens + 1).clip(lower=0) / denom_t).astype("float64")
    punct_ratio = punct / denom_c
    upper_ratio = upper / denom_c
    stop_ratio = stop_hits / denom_t
    length_ok = ((n_chars >= 20) & (n_chars <= 100_000)).astype("float64")
    score = (
        0.4 * length_ok
        + 0.2 * (1.0 - punct_ratio.clip(0, 1))
        + 0.2 * (1.0 - (upper_ratio * 2).clip(0, 1))
        + 0.2 * stop_ratio.clip(0, 1)
    )
    return pd.DataFrame(
        {
            "n_chars": n_chars,
            "n_tokens": n_tokens,
            "mean_token_len": mean_tok,
            "punct_ratio": punct_ratio,
            "upper_ratio": upper_ratio,
            "stopword_ratio": stop_ratio,
            "quality_score": score,
        },
        index=texts.index,
    )


def winnow_fingerprints(
    texts: list[str], k: int = 8, window: int = 4
) -> tuple[list[list[int]], np.ndarray]:
    """Winnowing fingerprints (Schleimer et al., SIGMOD 2003): min k-gram
    hash per sliding window of ``window`` consecutive k-grams, deduplicated.

    Returns (per-doc sorted selected hashes, per-doc 64-bit doc fingerprint).
    """
    win, doc_off = char_shingle_hashes(texts, k)
    n = len(doc_off) - 1
    selected: list[list[int]] = []
    for d in range(n):
        seg = win[doc_off[d] : doc_off[d + 1]]
        if len(seg) == 0:
            selected.append([])
            continue
        if len(seg) <= window:
            sel = np.array([seg.min()])
        else:
            sw = np.lib.stride_tricks.sliding_window_view(seg, window)
            sel = np.unique(sw.min(axis=1))
        selected.append(sorted(int(x) for x in sel))
    doc_fp = stable_hash64(
        [",".join(map(str, s)) if s else "" for s in selected]
    )
    return selected, doc_fp
