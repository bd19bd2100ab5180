from .storage import read_table, write_table, storage_format
from .corpus import (
    DOCS_SCHEMA,
    synth_corpus_table,
    synth_corpus_dataset,
    corpus_from_flat_documents,
)

__all__ = [
    "read_table",
    "write_table",
    "storage_format",
    "DOCS_SCHEMA",
    "synth_corpus_table",
    "synth_corpus_dataset",
    "corpus_from_flat_documents",
]
