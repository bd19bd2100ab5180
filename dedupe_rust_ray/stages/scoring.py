"""Stage 5 — pairwise scoring (stateful actor pool over joined pair rows).

Replaces the reference's deep-confirmation phase — full decode + u64 equality
(/root/reference/src/main.rs:586-648) — with a fused similarity score:

- exact fast path : equal ``content_hash`` -> score 1.0 (phase-2 equality);
- text            : MinHash-estimated Jaccard over char shingles, blended
                    with Jaro-Winkler on the 256-char text head when the
                    estimate is in the uncertain band;
- media           : per-aligned-span pHash Hamming similarity (1 - hd/64),
                    averaged; SimHash Hamming as a corroborating signal.

Input rows carry BOTH profiles (suffixes ``_a`` / ``_b`` from the two joins
in pipelines/er.py). Output adds ``score: float64``; the pipeline filters
``score >= cfg.score_threshold`` into match edges.

Vectorization: everything except Jaro-Winkler is numpy over the whole batch;
JW runs only on rows inside the uncertain band (a small fraction), mirroring
the cheap-then-deep split of the reference.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import ERConfig
from ..functions.minhash import estimate_jaccard
from ..functions.simhash import hamming64
from ..functions.strsim import jaro_winkler
from .codec import decode_sig_matrix, decode_varlen_u64


class PairScorer:
    def __init__(self, cfg: ERConfig | None = None):
        self.cfg = cfg or ERConfig()

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        n = batch.num_rows
        if n == 0:
            return batch.append_column("score", pa.array([], type=pa.float64()))

        def col(name):
            c = batch[name]
            return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

        ch_a = col("content_hash_a").to_numpy()
        ch_b = col("content_hash_b").to_numpy()
        exact = ch_a == ch_b

        sig_a = decode_sig_matrix(col("minhash_sig_a"), cfg.num_perm)
        sig_b = decode_sig_matrix(col("minhash_sig_b"), cfg.num_perm)
        jac = estimate_jaccard(sig_a, sig_b)

        sim_hd = hamming64(col("simhash_a").to_numpy(), col("simhash_b").to_numpy())
        sim_score = 1.0 - sim_hd / 64.0

        pa_flat, pa_off = decode_varlen_u64(col("phashes_a"))
        pb_flat, pb_off = decode_varlen_u64(col("phashes_b"))
        media_score = np.full(n, np.nan)
        na = pa_off[1:] - pa_off[:-1]
        nb = pb_off[1:] - pb_off[:-1]
        both = (na > 0) & (nb > 0)
        for i in np.flatnonzero(both):
            # aligned comparison over min(len) spans; short python loop over
            # the (few) media spans of one pair
            m = min(na[i], nb[i])
            ha = pa_flat[pa_off[i] : pa_off[i] + m]
            hb = pb_flat[pb_off[i] : pb_off[i] + m]
            media_score[i] = float(np.mean(1.0 - hamming64(ha, hb) / 64.0))

        text_a = col("text_head_a").to_pylist()
        text_b = col("text_head_b").to_pylist()
        has_text = np.array(
            [bool(a) and bool(b) for a, b in zip(text_a, text_b)]
        )

        text_score = np.where(has_text, jac, np.nan)
        # Jaro-Winkler tiebreak in the uncertain band only
        band = has_text & (jac > 0.4) & (jac < 0.95)
        for i in np.flatnonzero(band):
            jw = jaro_winkler(text_a[i], text_b[i])
            text_score[i] = 0.6 * jac[i] + 0.4 * jw
        # corroborate with simhash where text exists
        text_score = np.where(
            has_text, 0.8 * text_score + 0.2 * np.where(has_text, sim_score, 0.0),
            np.nan,
        )

        w_t = np.where(~np.isnan(text_score), cfg.w_text, 0.0)
        w_m = np.where(~np.isnan(media_score), cfg.w_media, 0.0)
        denom = np.maximum(w_t + w_m, 1e-9)
        fused = (
            w_t * np.nan_to_num(text_score) + w_m * np.nan_to_num(media_score)
        ) / denom
        fused = np.where(exact, 1.0, fused)
        return batch.append_column("score", pa.array(fused, type=pa.float64()))
