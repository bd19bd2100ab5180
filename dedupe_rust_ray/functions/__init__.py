from .hashing import stable_hash64, canonical_span_strings, content_hash_batch

__all__ = ["stable_hash64", "canonical_span_strings", "content_hash_batch"]
