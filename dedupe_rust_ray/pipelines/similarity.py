"""Similarity search over the ``embeddings`` table.

- :func:`knn_topk`  — brute-force cosine top-k as distributed partial
  top-k: each batch scores against the broadcast query matrix and emits its
  LOCAL top-k per query; a tiny groupby merge keeps the global top-k.
  Exact, SQL-checkable.
- :func:`knn_lsh`   — random-hyperplane LSH bucketed variant (the scale
  path): vectors land in sign-bit buckets; queries probe only matching
  buckets (multi-probe over nearby buckets). Approximate — recall is
  asserted against brute force in tests, not an SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .common import read


def _load_queries(sf_dir: str, n_queries: int) -> tuple[np.ndarray, np.ndarray]:
    import pyarrow.parquet as pq
    import pyarrow.compute as pc

    # filter pushed into the read: row groups whose vec_id stats exclude
    # [0, n_queries) are never deserialized — the driver reads O(1) row
    # groups at any SF instead of the whole embeddings table
    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", n_queries)],
    )
    t = t.filter(pc.less(t["vec_id"], n_queries))
    ids = t["vec_id"].to_numpy()
    from ..stages.codec import list_col_matrix

    Q = list_col_matrix(t["embedding"])
    Q /= np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    return ids, Q


def knn_topk(sf_dir: str, n_queries: int = 10, k: int = 10) -> pd.DataFrame:
    """Exact top-``k`` cosine neighbors for query vectors vec_id <
    ``n_queries`` (self excluded). Columns: query_id, neighbor_id, cos_sim."""
    qids, Q = _load_queries(sf_dir, n_queries)
    ref = ray.put((qids, Q))

    class LocalTopK:
        def __init__(self, ref, k):
            self.qids, self.Q = ray.get(ref)
            self.k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["vec_id"].to_numpy()
            from ..stages.codec import list_col_matrix

            V = list_col_matrix(batch["embedding"])
            V /= np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
            S = self.Q @ V.T  # (n_queries, batch)
            out_q, out_n, out_s = [], [], []
            for qi in range(len(self.qids)):
                sims = S[qi]
                mask = ids != self.qids[qi]  # exclude self
                cand = np.flatnonzero(mask)
                if not len(cand):
                    continue
                # lexsort: primary -sims, secondary neighbor_id — equal
                # sims must select deterministically regardless of the
                # block/group row order (exact ties are real: byte-equal
                # vectors score identical cosines)
                top = cand[np.lexsort((ids[cand], -sims[cand]))[: self.k]]
                out_q.extend([int(self.qids[qi])] * len(top))
                out_n.extend(int(x) for x in ids[top])
                out_s.extend(float(x) for x in sims[top])
            return pa.table(
                {
                    "query_id": pa.array(out_q, type=pa.int64()),
                    "neighbor_id": pa.array(out_n, type=pa.int64()),
                    "cos_sim": pa.array(out_s, type=pa.float64()),
                }
            )

    def merge_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(
            ["cos_sim", "neighbor_id"], ascending=[False, True]
        ).head(k)
        return g

    # plain tasks (no actor pool): LocalTopK's only state is the
    # broadcast (qids, Q) pack — ray.get is zero-copy per batch
    local = read(sf_dir, "embeddings", columns=["vec_id", "embedding"]).map_batches(
        lambda b: LocalTopK(ref, k)(b),
        batch_format="pyarrow",
    )
    # the local-top-k contract bounds candidates to n_queries x k x
    # n_blocks; below a ceiling the final merge is one driver-side pandas
    # groupby (no exchange barrier — Ray's groupby costs seconds of fixed
    # shuffle scheduling for kilobyte inputs); above it (huge block
    # counts) the distributed merge runs
    cand = local.materialize()
    if cand.count() <= 2_000_000:
        out = (
            cand.to_pandas()
            .groupby("query_id", group_keys=False)[
                ["query_id", "neighbor_id", "cos_sim"]
            ]
            .apply(merge_topk)
            .reset_index(drop=True)
        )
    else:
        out = (
            cand.groupby("query_id")
            .map_groups(merge_topk, batch_format="pandas")
            .to_pandas()
        )
    out["cos_sim"] = np.round(out["cos_sim"], 4)
    return out.sort_values(
        ["query_id", "cos_sim", "neighbor_id"], ascending=[True, False, True],
        ignore_index=True,
    )


def knn_lsh(
    sf_dir: str,
    n_queries: int = 10,
    k: int = 10,
    n_bits: int = 6,
    n_tables: int = 8,
    seed: int = 7,
    embs: "ray.data.Dataset | None" = None,
    queries: "tuple[np.ndarray, np.ndarray] | None" = None,
) -> pd.DataFrame:
    """Approximate top-k via random-hyperplane LSH.

    ``n_tables`` independent sign-bit codes per vector; a query is compared
    only against vectors sharing a bucket in ANY table. This is the
    sub-linear scale path: at 10^12 vectors the per-bucket groupby replaces
    the full scan. Recall vs :func:`knn_topk` is asserted in tests.

    Defaults (6 bits x 8 tables) trade bucket size for recall ~0.4 even on
    uniformly random vectors, where "neighbors" sit near cosine 0.4 and any
    LSH is weak; clustered real embeddings fare far better. More bits =
    smaller buckets = cheaper scan but lower recall.

    ``embs`` / ``queries`` override the embeddings Dataset and the
    (qids, Q) pack — the planted-truth hook (:func:`knn_lsh_planted`)."""
    qids, Q = queries if queries is not None else _load_queries(sf_dir, n_queries)
    rng = np.random.default_rng(seed)
    dim = Q.shape[1]
    planes = rng.standard_normal((n_tables, n_bits, dim))
    ref = ray.put((qids, Q, planes))

    def codes(M: np.ndarray, planes_t: np.ndarray) -> np.ndarray:
        bits = (M @ planes_t.T) > 0
        w = 1 << np.arange(bits.shape[1])
        return (bits * w).sum(axis=1)

    class BucketRows:
        def __init__(self, ref):
            _, _, self.planes = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            from ..stages.codec import list_col_matrix, pack_f8_rows

            ids = batch["vec_id"].to_numpy()
            V = list_col_matrix(batch["embedding"])
            Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
            n, dim = Vn.shape
            n_tab = self.planes.shape[0]
            # numeric bucket keys (table_idx << 32 | code) and ONE packed
            # float blob per batch reused for every table copy — no
            # per-row Python strings/bytes on this explode
            keys = np.concatenate(
                [
                    (np.uint64(t) << np.uint64(32))
                    | codes(Vn, self.planes[t]).astype(np.uint64)
                    for t in range(n_tab)
                ]
            )
            emb = pack_f8_rows(Vn)
            return pa.table(
                {
                    "bucket": pa.array(keys, type=pa.uint64()),
                    "vec_id": pa.array(np.tile(ids, n_tab), type=pa.int64()),
                    "emb": pa.concat_arrays([emb] * n_tab),
                }
            )

    # query buckets (driver side; queries are tiny)
    qbuckets: dict[int, list[int]] = {}
    for t in range(n_tables):
        c = codes(Q, planes[t])
        for qi, code in enumerate(c):
            qbuckets.setdefault((t << 32) | int(code), []).append(qi)
    qref = ray.put(qbuckets)

    class ProbeBucket:
        def __init__(self, ref, qref, k):
            self.qids, self.Q, _ = ray.get(ref)
            self.qbuckets = ray.get(qref)
            self.k = k

        def __call__(self, group: pd.DataFrame) -> pd.DataFrame:
            key = int(group["bucket"].iloc[0])
            probes = self.qbuckets.get(key)
            if not probes:
                return pd.DataFrame(
                    {"query_id": [], "neighbor_id": [], "cos_sim": []}
                )
            g = group.drop_duplicates("vec_id")
            ids = g["vec_id"].to_numpy()
            V = np.frombuffer(b"".join(g["emb"]), dtype="<f8").reshape(len(g), -1)
            out_q, out_n, out_s = [], [], []
            for qi in probes:
                sims = self.Q[qi] @ V.T
                mask = ids != self.qids[qi]
                cand = np.flatnonzero(mask)
                # lexsort: primary -sims, secondary neighbor_id — equal
                # sims must select deterministically regardless of the
                # block/group row order (exact ties are real: byte-equal
                # vectors score identical cosines)
                top = cand[np.lexsort((ids[cand], -sims[cand]))[: self.k]]
                out_q.extend([int(self.qids[qi])] * len(top))
                out_n.extend(int(x) for x in ids[top])
                out_s.extend(float(x) for x in sims[top])
            return pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "cos_sim": out_s}
            )

    ds = (
        embs
        if embs is not None
        else read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    )
    local = (
        ds.map_batches(BucketRows, fn_constructor_args=(ref,), batch_format="pyarrow",
                       concurrency=(1, 4))
        .groupby("bucket")
        .map_groups(
            ProbeBucket,
            fn_constructor_args=(ref, qref, k),
            batch_format="pandas",
            concurrency=(1, 4),
        )
    )

    def merge_topk(group: pd.DataFrame) -> pd.DataFrame:
        return (
            group.drop_duplicates(["query_id", "neighbor_id"])
            .sort_values(["cos_sim", "neighbor_id"], ascending=[False, True])
            .head(k)
        )

    out = (
        local.groupby("query_id").map_groups(merge_topk, batch_format="pandas").to_pandas()
    )
    if not len(out):
        return pd.DataFrame({"query_id": [], "neighbor_id": [], "cos_sim": []})
    out["cos_sim"] = np.round(out["cos_sim"], 4)
    return out.sort_values(
        ["query_id", "cos_sim", "neighbor_id"], ascending=[True, False, True],
        ignore_index=True,
    )


def knn_ivf(
    sf_dir: str,
    n_queries: int = 10,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    kmeans_iters: int = 5,
    sample_max: int = 4096,
    seed: int = 11,
    embs: "ray.data.Dataset | None" = None,
    queries: "tuple[np.ndarray, np.ndarray] | None" = None,
) -> pd.DataFrame:
    """Approximate top-k via an IVF (inverted-file) index.

    The other scale path next to :func:`knn_lsh`: spherical k-means
    centroids are trained on a driver-side SAMPLE (bounded by
    ``sample_max``), broadcast once, and every vector is assigned to its
    nearest cell in one vectorized pass; a query scans only its
    ``n_probe`` closest cells. At 10^12 vectors the per-cell groupby
    replaces the full scan and the sample/centroids stay tiny. Recall vs
    :func:`knn_topk` is asserted in tests (no SQL oracle — iterative
    training is not ANSI-SQL-expressible). ``embs`` / ``queries``
    override the embeddings Dataset and the (qids, Q) pack — the
    planted-truth hook (:func:`knn_ivf_planted`)."""
    qids, Q = queries if queries is not None else _load_queries(sf_dir, n_queries)

    ds = (
        embs
        if embs is not None
        else read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    )
    n_total = ds.count()
    frac = min(1.0, sample_max / max(n_total, 1))
    sample = ds.random_sample(frac, seed=seed).take(sample_max)
    S = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in sample])
    S /= np.maximum(np.linalg.norm(S, axis=1, keepdims=True), 1e-12)

    rng = np.random.default_rng(seed)
    n_cells = min(n_cells, len(S))
    C = S[rng.choice(len(S), n_cells, replace=False)]
    for _ in range(kmeans_iters):
        assign = np.argmax(S @ C.T, axis=1)
        for c in range(n_cells):
            members = S[assign == c]
            if len(members):
                v = members.sum(axis=0)
                C[c] = v / max(np.linalg.norm(v), 1e-12)
    cref = ray.put(C)

    class CellRows:
        def __init__(self, cref):
            self.C = ray.get(cref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["vec_id"].to_numpy()
            from ..stages.codec import list_col_matrix, pack_f8_rows

            V = list_col_matrix(batch["embedding"])
            Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
            cell = np.argmax(Vn @ self.C.T, axis=1)
            return pa.table(
                {
                    "cell": pa.array(cell.astype(np.int32), type=pa.int32()),
                    "vec_id": pa.array(ids, type=pa.int64()),
                    "emb": pack_f8_rows(Vn),
                }
            )

    # query -> n_probe nearest cells (tiny, driver side)
    probes: dict[int, list[int]] = {}
    qsims = Q @ C.T
    for qi in range(len(qids)):
        top = np.argsort(-qsims[qi], kind="stable")[:n_probe]
        for c in top:
            probes.setdefault(int(c), []).append(qi)
    qref = ray.put((qids, Q, probes))

    class ProbeCell:
        def __init__(self, qref, k):
            self.qids, self.Q, self.probes = ray.get(qref)
            self.k = k

        def __call__(self, group: pd.DataFrame) -> pd.DataFrame:
            cell = int(group["cell"].iloc[0])
            qis = self.probes.get(cell)
            if not qis:
                return pd.DataFrame(
                    {"query_id": [], "neighbor_id": [], "cos_sim": []}
                )
            ids = group["vec_id"].to_numpy()
            V = np.frombuffer(b"".join(group["emb"]), dtype="<f8").reshape(
                len(group), -1
            )
            out_q, out_n, out_s = [], [], []
            for qi in qis:
                sims = self.Q[qi] @ V.T
                cand = np.flatnonzero(ids != self.qids[qi])
                # lexsort: primary -sims, secondary neighbor_id — equal
                # sims must select deterministically regardless of the
                # block/group row order (exact ties are real: byte-equal
                # vectors score identical cosines)
                top = cand[np.lexsort((ids[cand], -sims[cand]))[: self.k]]
                out_q.extend([int(self.qids[qi])] * len(top))
                out_n.extend(int(x) for x in ids[top])
                out_s.extend(float(x) for x in sims[top])
            return pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "cos_sim": out_s}
            )

    local = (
        ds.map_batches(
            CellRows, fn_constructor_args=(cref,), batch_format="pyarrow",
            concurrency=(1, 4),
        )
        .groupby("cell")
        .map_groups(
            ProbeCell,
            fn_constructor_args=(qref, k),
            batch_format="pandas",
            concurrency=(1, 4),
        )
    )

    def merge_topk(group: pd.DataFrame) -> pd.DataFrame:
        return (
            group.drop_duplicates(["query_id", "neighbor_id"])
            .sort_values(["cos_sim", "neighbor_id"], ascending=[False, True])
            .head(k)
        )

    out = (
        local.groupby("query_id")
        .map_groups(merge_topk, batch_format="pandas")
        .to_pandas()
    )
    if not len(out):
        return pd.DataFrame({"query_id": [], "neighbor_id": [], "cos_sim": []})
    out["cos_sim"] = np.round(out["cos_sim"], 4)
    return out.sort_values(
        ["query_id", "cos_sim", "neighbor_id"], ascending=[True, False, True],
        ignore_index=True,
    )


# --------------------------------------------------------------------------
# planted-truth certification of the approximate ANN paths
# --------------------------------------------------------------------------

PLANTED_N_GROUPS = 32


def planted_onehot_embeddings(
    sf_dir: str, n_groups: int = PLANTED_N_GROUPS
) -> ray.data.Dataset:
    """Planted-truth embedding table (the ``corpus_planted_truth`` /
    ``planted_flat_docs`` trick applied to the ANN family): vec_id keeps
    the real table's id domain, the vector becomes the one-hot basis
    vector ``e_{vec_id % n_groups}`` (float32, the real schema's width
    semantics).

    Construction guarantees, by design rather than by tuning:

    - within a group every vector is BYTE-IDENTICAL -> identical LSH
      sign codes in every table, identical IVF/k-means cell argmax, and
      cosine exactly 1.0 after normalization (one-hot norms are exact);
    - across groups the cosine is exactly 0.0 (orthogonal basis), below
      any tau/top-k cut wherever >= k same-group neighbors exist.

    Every bucketed/celled ANN or prune pipeline over this table therefore
    has a closed-form expected answer in pure vec_id arithmetic —
    SQL-derivable from the embeddings view — while the FULL production
    kernels (bucket explode, cell groupby, probe, merge, greedy prune)
    run end-to-end unchanged."""

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy()
        g = (ids % n_groups).astype(np.int64)
        M = np.zeros((len(ids), n_groups), np.float32)
        M[np.arange(len(ids)), g] = np.float32(1.0)
        emb = pa.ListArray.from_arrays(
            pa.array(
                np.arange(0, (len(ids) + 1) * n_groups, n_groups),
                type=pa.int32(),
            ),
            pa.array(M.ravel(), type=pa.float32()),
        )
        return pa.table(
            {"vec_id": pa.array(ids, type=pa.int64()), "embedding": emb}
        )

    return read(sf_dir, "embeddings", columns=["vec_id"]).map_batches(
        explode, batch_format="pyarrow"
    )


def _planted_queries(
    n_queries: int, n_groups: int = PLANTED_N_GROUPS
) -> tuple[np.ndarray, np.ndarray]:
    """(qids, Q) for the planted table: ids 0..n_queries-1, each the exact
    one-hot of its group — bit-identical to the planted data vectors."""
    qids = np.arange(n_queries, dtype=np.int64)
    Q = np.zeros((n_queries, n_groups), np.float64)
    Q[qids, qids % n_groups] = 1.0
    return qids, Q


def knn_lsh_planted(
    sf_dir: str, n_queries: int = 10, k: int = 10
) -> pd.DataFrame:
    """:func:`knn_lsh` over the planted one-hot table — the SAME LSH
    pipeline end-to-end (sign-bit codes, per-table bucket explode, bucket
    groupby, probe, global merge), but with a closed-form value oracle:
    every group member shares every bucket, so the result is exactly the
    k smallest other vec_ids of the query's group at cosine 1.0."""
    return knn_lsh(
        sf_dir,
        n_queries,
        k,
        embs=planted_onehot_embeddings(sf_dir),
        queries=_planted_queries(n_queries),
    )


def knn_ivf_planted(
    sf_dir: str, n_queries: int = 10, k: int = 10
) -> pd.DataFrame:
    """:func:`knn_ivf` over the planted one-hot table — same IVF pipeline
    (sampled k-means training, cell assign, n_probe scan, merge), closed
    form because a group's identical vectors all land in ONE cell and the
    query's first probe IS that cell (same argmax over the same floats),
    for ANY trained centroids."""
    return knn_ivf(
        sf_dir,
        n_queries,
        k,
        embs=planted_onehot_embeddings(sf_dir),
        queries=_planted_queries(n_queries),
    )


def embedding_range_search(
    sf_dir: str, n_queries: int = 10, threshold: float = 0.3
) -> pd.DataFrame:
    """Radius (range) similarity search — the fixed-threshold complement
    of knn_topk's fixed-k contract: ALL vectors within cosine >=
    ``threshold`` of each query (vec_id < ``n_queries``), self excluded.
    Columns: query_id, neighbor_id, cos_sim (4-decimal).

    Scale plan: this is the one similarity shape with NO merge step at
    all — each batch matmuls against the broadcast normalized query
    matrix and emits its qualifying rows; the result streams straight out
    (output is bounded by the radius, not by candidate fan-in). The
    threshold compares the UNROUNDED float64 cosine, mirroring the
    embedding_cosine_pairs oracle convention."""
    qids, Q = _load_queries(sf_dir, n_queries)
    ref = ray.put((qids, Q))

    def per_batch(batch: pa.Table) -> pa.Table:
        _qids, _Q = ray.get(ref)
        ids = batch["vec_id"].to_numpy()
        from ..stages.codec import list_col_matrix

        V = list_col_matrix(batch["embedding"])
        V /= np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        S = _Q @ V.T  # (n_queries, batch)
        qi, vi = np.nonzero((S >= threshold) & (_qids[:, None] != ids[None, :]))
        return pa.table(
            {
                "query_id": pa.array(_qids[qi], type=pa.int64()),
                "neighbor_id": pa.array(ids[vi], type=pa.int64()),
                "cos_sim": pa.array(np.round(S[qi, vi], 4), type=pa.float64()),
            }
        )

    out = (
        read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        .map_batches(per_batch, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values(["query_id", "neighbor_id"], ignore_index=True)
