"""Pipeline configuration.

Mirrors (and generalizes) the reference CLI surface
(/root/reference/src/main.rs:60-74: ``-d/--directory``, ``-b/--batch_size``,
``--exclude``) as a dataclass consumed by every pipeline. The config hash is
part of each checkpoint manifest so resume only reuses work produced under an
identical configuration (SURVEY.md §3.4).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass


@dataclass(frozen=True)
class ERConfig:
    """Configuration of the flagship entity-resolution pipeline.

    Defaults are tuned so that the exact-duplicate path dominates labeled
    pairs (F1 >= 0.99 vs planted clusters) while the near-dup path catches
    small text edits / media noise (FIXTURES.md F1).
    """

    # --- MinHash / text signatures -------------------------------------
    num_perm: int = 128           # minhash permutations per text signature
    shingle_k: int = 3            # shingle width (words by default)
    shingle_mode: str = "word"    # 'word' (cheap, robust to char edits) | 'char'
    lsh_bands: int = 32           # bands over the minhash signature
    # rows per band = num_perm // lsh_bands = 4 -> s-curve midpoint ~0.42:
    # word-shingle Jaccard of a near-dup SHORT text can sit near 0.6-0.7
    # (each edited word kills k shingles), so banding must recall there;
    # precision comes from the fused score threshold, not the bands

    # --- media signatures ----------------------------------------------
    phash_size: int = 32          # synthetic payload edge (pixels)
    phash_dct: int = 8            # low-frequency DCT block kept (8x8 -> 64 bits)
    phash_prefix_bits: int = 16   # leading pHash bits used as a blocking key
    phash_hamming_max: int = 10   # near-dup threshold on 64-bit pHash

    # --- pair scoring ---------------------------------------------------
    text_jaccard_min: float = 0.72   # minhash-estimated Jaccard screen
    score_threshold: float = 0.80    # fused score -> match edge
    w_text: float = 0.5
    w_media: float = 0.5

    # --- skew / scale guards --------------------------------------------
    max_block_size: int = 512     # blocks beyond this switch to neighbor chaining
    max_pairs_per_shard: int = 2_000_000  # hard cap per shard task (skew guard)
    n_shards: int = 64            # coarse shuffle shards for block/pair groupbys

    broadcast_max_docs: int = 1_000_000
    # profile sets up to this size are ray.put once and mapped READ-ONLY
    # (zero-copy numpy) by every scorer worker (~1.3 KB/doc -> 1.3 GB);
    # beyond it, the hash-join path runs.

    fused_band_rows_max: int = 2_000_000
    # below this many exploded blocking-key rows (~26 B each, <=52 MB) the
    # candidate stage gathers the band-row relation once and enumerates +
    # cross-band-dedups pairs in ONE in-process pass — eliding the two
    # groupby exchanges (band-shard pair enumeration + pair dedup) whose
    # fixed barrier cost dominates small corpora. A block key never spans
    # shards, so global enumeration yields the identical pair set; the
    # distributed path is unchanged above the ceiling (set 0 to force it).

    # --- execution -------------------------------------------------------
    batch_size: int = 1024        # rows per signature batch
    sig_concurrency: int | tuple[int, int] | None = None  # actor pool size; None = tasks decide
    checkpoint_dir: str | None = None  # enable per-stage checkpoints when set
    resume: bool = False          # reuse matching checkpoints

    # --- union-find -------------------------------------------------------
    max_label_rounds: int = 50    # O(log diameter) in practice; hard stop
    driver_unionfind_max_edges: int = 2_000_000
    # below this edge count the driver runs union-find locally (cheaper than
    # distributed rounds); above it, iterative label propagation is used.

    def config_hash(self) -> str:
        """Stable hash of every semantic knob, stamped into manifests."""
        payload = {k: v for k, v in asdict(self).items()
                   if k not in ("checkpoint_dir", "resume", "sig_concurrency",
                                "batch_size")}
        blob = json.dumps(payload, sort_keys=True).encode()
        return hashlib.sha256(blob).hexdigest()[:16]


DEFAULT_CONFIG = ERConfig()
