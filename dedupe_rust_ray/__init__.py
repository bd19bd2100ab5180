"""dedupe_rust_ray — a Ray-Data-native entity-resolution / data-processing engine.

A from-scratch re-expression of the capabilities of ``vteam-com/dedupe-rust``
(a single-node Rust duplicate-image finder, see SURVEY.md) as an idiomatic
Ray Data pipeline library:

- ``sources``   : storage layer (Parquet always; Lance gated on import) and
                  the deterministic interleaved-document corpus generator.
- ``functions`` : pure vectorized kernels (stable hashing, MinHash, SimHash,
                  perceptual image hashes, text statistics, string similarity).
- ``stages``    : ``map_batches`` callables — stateless fns and stateful
                  actor-pool classes (signatures, blocking, pair scoring,
                  image-header dimension probes, multimodal decode plumbing).
- ``state``     : distributed union-find (iterative min-label propagation)
                  and checkpoint/lineage manifests.
- ``pipelines`` : end-to-end pipelines — the flagship entity-resolution
                  pipeline, dedup family (exact / MinHash-LSH / SimHash /
                  n-gram Jaccard / embedding-cosine), similarity search,
                  text analysis, and SQL-checkable analytics.

Nothing in this package calls ``ray.init`` / ``ray.shutdown`` — sessions are
owned by the caller (driver, bench.py, or the pytest fixture).
"""

from . import _blas  # caps BLAS threads in every worker (see _blas.py)

__version__ = "0.1.0"
