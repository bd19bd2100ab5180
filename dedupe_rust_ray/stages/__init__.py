from .signatures import SpanSignatures, PROFILE_COLUMNS
from .blocking import emit_blocking_keys
from .pairs import candidate_pairs_in_shard, dedup_pairs
from .scoring import PairScorer

__all__ = [
    "SpanSignatures",
    "PROFILE_COLUMNS",
    "emit_blocking_keys",
    "candidate_pairs_in_shard",
    "dedup_pairs",
    "PairScorer",
]
