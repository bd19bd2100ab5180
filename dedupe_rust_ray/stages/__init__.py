from .signatures import SpanSignatures, PROFILE_COLUMNS
from .blocking import emit_blocking_keys
from .pairs import candidate_pairs_in_block, dedup_pairs
from .scoring import PairScorer

__all__ = [
    "SpanSignatures",
    "PROFILE_COLUMNS",
    "emit_blocking_keys",
    "candidate_pairs_in_block",
    "dedup_pairs",
    "PairScorer",
]
