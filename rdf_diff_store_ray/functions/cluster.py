"""Distributed k-means and SemDeDup-style semantic deduplication.

K-means here is the canonical iterative broadcast / partial-fold shape
for Ray Data: the k×d centroid matrix is ``ray.put`` once per iteration
and read inside every batch task; each batch emits k partial rows
(member count + vector sum), so the wire carries k×d floats per batch
— never embeddings — and the driver folds partials into new centroids
(k×d, trivially driver-sized). Embeddings are materialized once into
the object store so the per-iteration pass re-reads blocks instead of
parquet; at corpus scales beyond the store this spills, and callers can
pass ``materialize=False`` to re-read from the source each pass.

SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication", arXiv:2303.09540) composes
on top: cluster the corpus, then drop within-cluster cosine
near-duplicates, keeping one representative per duplicate set. Cluster
cardinality is k (bounded), so the per-cluster pass is a legal
``groupby.map_groups``; oversized clusters are processed in id-sorted
chunks exactly like :func:`.dedup.embedding_near_pairs`.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


def _matrix(col) -> np.ndarray:
    """Arrow list<float> column → (n, d) float64 matrix."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if len(arr) == 0:
        return np.empty((0, 0), dtype=np.float64)
    flat = np.asarray(arr.flatten(), dtype=np.float64)
    return flat.reshape(len(arr), -1)


def kmeans_fit(emb_ds, k: int = 8, *, n_iter: int = 25, tol: float = 1e-6,
               seed: int = 0, sample_size: int = 4096,
               materialize: bool = True) -> np.ndarray:
    """Lloyd's k-means over an ``(vec_id, embedding)`` Dataset; returns
    the (k, d) centroid matrix. Deterministic: k-means++ init on a
    bounded, order-stable driver sample (``limit(sample_size)``) with a
    seeded RNG; ties in assignment break to the lowest cluster index
    (numpy argmin). Empty clusters keep their previous centroid."""
    if k < 1:
        raise ValueError("k must be >= 1")
    sample = emb_ds.select_columns(["embedding"]).limit(sample_size)
    X = np.asarray(sample.to_pandas()["embedding"].tolist(),
                   dtype=np.float64)
    if len(X) < k:
        raise ValueError(f"sample of {len(X)} rows cannot seed {k} centroids")
    rng = np.random.default_rng(seed)
    # k-means++ seeding over the sample
    cent = [X[int(rng.integers(len(X)))]]
    for _ in range(k - 1):
        C = np.asarray(cent)
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1).min(axis=1)
        total = float(d2.sum())
        if total <= 0:  # degenerate sample: identical points
            cent.append(X[int(rng.integers(len(X)))])
            continue
        cent.append(X[int(rng.choice(len(X), p=d2 / total))])
    C = np.asarray(cent, dtype=np.float64)

    ds = emb_ds.select_columns(["embedding"])
    if materialize:
        ds = ds.materialize()

    for _ in range(n_iter):
        ref = ray.put(C)

        def partial(batch: pa.Table, _ref=ref, _k=k) -> pa.Table:
            cent = ray.get(_ref)
            V = _matrix(batch["embedding"])
            if V.size == 0:
                return pa.table(
                    {
                        "cluster": pa.array([], pa.int32()),
                        "count": pa.array([], pa.float64()),
                        "vecsum": pa.array([], pa.list_(pa.float64())),
                    }
                )
            # ||x-c||² = ||x||² - 2x·c + ||c||²; ||x||² is constant per
            # row, so argmin over -2x·c + ||c||² suffices
            scores = -2.0 * (V @ cent.T) + (cent * cent).sum(axis=1)[None, :]
            assign = np.argmin(scores, axis=1)
            onehot = (assign[:, None] == np.arange(_k)[None, :]).astype(
                np.float64
            )
            sums = onehot.T @ V  # (k, d) BLAS, no Python loop
            counts = onehot.sum(axis=0)
            return pa.table(
                {
                    "cluster": pa.array(np.arange(_k), pa.int32()),
                    "count": pa.array(counts, pa.float64()),
                    "vecsum": pa.array(list(sums), pa.list_(pa.float64())),
                }
            )

        parts = ds.map_batches(
            partial, batch_format="pyarrow", batch_size=4096
        ).to_pandas()  # nbatches × k tiny partial rows
        counts = np.zeros(k)
        sums = np.zeros_like(C)
        for cl, cnt, vs in zip(parts["cluster"], parts["count"],
                               parts["vecsum"]):
            counts[cl] += cnt
            sums[cl] += np.asarray(vs)
        newC = C.copy()
        nz = counts > 0
        newC[nz] = sums[nz] / counts[nz, None]
        shift = float(np.abs(newC - C).max())
        C = newC
        if shift < tol:
            break
    return C


def kmeans_assign(emb_ds, centroids: np.ndarray, *, round_to: int = 6):
    """Assign each vector to its nearest centroid (L2). Returns a
    Dataset ``(vec_id, cluster, dist)`` — ``dist`` rounded so output
    bytes are platform-stable. Centroids are broadcast once."""
    ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(batch: pa.Table) -> pa.Table:
        cent = ray.get(ref)
        V = _matrix(batch["embedding"])
        if V.size == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "cluster": pa.array([], pa.int32()),
                    "dist": pa.array([], pa.float64()),
                }
            )
        d2 = ((V * V).sum(axis=1)[:, None] - 2.0 * (V @ cent.T)
              + (cent * cent).sum(axis=1)[None, :])
        a = np.argmin(d2, axis=1)
        dist = np.sqrt(np.maximum(d2[np.arange(len(a)), a], 0.0))
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "cluster": pa.array(a, pa.int32()),
                "dist": pa.array(np.round(dist, round_to), pa.float64()),
            }
        )

    return emb_ds.map_batches(assign, batch_format="pyarrow",
                              batch_size=4096)


def semantic_dedup(emb_ds, *, k: int = 16, threshold: float = 0.95,
                   seed: int = 0, n_iter: int = 25,
                   cluster_cap: int = 4096):
    """SemDeDup: k-means cluster, then drop within-cluster cosine
    near-duplicates. A vector is a duplicate when some LOWER-id member
    of its cluster has cosine ≥ ``threshold`` with it; the lowest such
    id is recorded as ``dup_of`` (deterministic representative choice).
    Returns a Dataset ``(vec_id, cluster, keep, dup_of)`` with
    ``dup_of = -1`` for kept rows.

    Scale shape: the only shuffle is the ``groupby(cluster)`` over k
    bounded keys; within a cluster the pairwise pass runs over id-sorted
    chunks of ``cluster_cap`` rows (O(m·cap) work, O(cap²) peak memory)
    with a one-row overlap — the hot-bucket chaining guard of
    :func:`.dedup.embedding_near_pairs`."""
    centroids = kmeans_fit(emb_ds, k, n_iter=n_iter, seed=seed)
    ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def tag(batch: pa.Table) -> pa.Table:
        cent = ray.get(ref)
        V = _matrix(batch["embedding"])
        if V.size == 0:
            return batch.append_column(
                "cluster", pa.array([], pa.int32())
            )
        scores = -2.0 * (V @ cent.T) + (cent * cent).sum(axis=1)[None, :]
        return batch.append_column(
            "cluster", pa.array(np.argmin(scores, axis=1), pa.int32())
        )

    def dedup_in_cluster(group: pa.Table) -> pa.Table:
        ids_all = np.asarray(group["vec_id"].to_pylist(), dtype=np.int64)
        order = np.argsort(ids_all)
        ids_all = ids_all[order]
        V_all = _matrix(group["embedding"])[order]
        norms = np.linalg.norm(V_all, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        V_all = V_all / norms
        n = len(ids_all)
        dup_of = np.full(n, -1, dtype=np.int64)
        step = max(1, cluster_cap - 1)
        for start in range(0, max(n - 1, 1), step):
            ids = ids_all[start:start + cluster_cap]
            V = V_all[start:start + cluster_cap]
            sim = V @ V.T
            # earliest lower-id neighbor ≥ threshold per column (ids are
            # sorted, so argmax over the strict upper triangle IS the
            # minimum such id) — fully vectorized
            hit = np.triu(sim >= threshold, k=1)
            anyh = hit.any(axis=0)
            first = hit.argmax(axis=0)
            jidx = np.flatnonzero(anyh)
            if len(jidx):
                g = start + jidx
                cand = ids[first[jidx]]
                upd = (dup_of[g] == -1) | (cand < dup_of[g])
                dup_of[g[upd]] = cand[upd]
        cl = group["cluster"][0].as_py() if len(group) else -1
        return pa.table(
            {
                "vec_id": pa.array(ids_all, pa.int64()),
                "cluster": pa.array(np.full(n, cl, np.int32())),
                "keep": pa.array(dup_of == -1),
                "dup_of": pa.array(dup_of, pa.int64()),
            }
        )

    tagged = emb_ds.map_batches(tag, batch_format="pyarrow",
                                batch_size=4096)
    return tagged.groupby("cluster").map_groups(
        dedup_in_cluster, batch_format="pyarrow"
    )


def label_centroid_outliers(emb_ds, k: int = 3):
    """Per-label outlier ranking: each label's centroid is folded from
    per-batch partial sums (the wire carries labels × d floats per
    batch, never embeddings), broadcast once, and every vector scores
    its L2 distance to its own label's centroid in-stream; the top-k
    farthest per label are ranked (distance DESC, vec_id ASC). Returns
    ``(label, vec_id, rank)`` — integer output, so the result is
    platform-stable. The final per-label pass is a legal
    ``groupby.map_groups`` because label cardinality is bounded."""
    src = emb_ds.select_columns(["vec_id", "label", "embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        V = _matrix(batch["embedding"])
        labs = np.asarray(batch["label"].to_pandas(), dtype=np.int64)
        rows = []
        for lab in np.unique(labs):
            m = V[labs == lab]
            rows.append({"label": int(lab), "n": float(len(m)),
                         "vecsum": m.sum(axis=0).tolist()})
        return pa.Table.from_pylist(rows) if rows else pa.table(
            {"label": pa.array([], pa.int64()),
             "n": pa.array([], pa.float64()),
             "vecsum": pa.array([], pa.list_(pa.float64()))}
        )

    parts = src.map_batches(
        partial, batch_format="pyarrow", batch_size=4096
    ).to_pandas()  # nbatches × nlabels tiny partial rows
    sums: dict = {}
    counts: dict = {}
    for lab, n, vs in zip(parts["label"], parts["n"], parts["vecsum"]):
        lab = int(lab)
        counts[lab] = counts.get(lab, 0.0) + float(n)
        cur = sums.get(lab)
        sums[lab] = np.asarray(vs) if cur is None else cur + np.asarray(vs)
    cent = {lab: sums[lab] / counts[lab] for lab in sums}
    ref = ray.put(cent)

    def score(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        V = _matrix(batch["embedding"])
        labs = np.asarray(batch["label"].to_pandas(), dtype=np.int64)
        if V.size == 0:
            return pa.table(
                {"label": pa.array([], pa.int64()),
                 "vec_id": pa.array([], pa.int64()),
                 "dist": pa.array([], pa.float64())}
            )
        C = np.stack([c[int(lab)] for lab in labs])
        dist = np.sqrt(((V - C) ** 2).sum(axis=1))
        return pa.table(
            {"label": pa.array(labs, pa.int64()),
             "vec_id": batch["vec_id"],
             "dist": pa.array(dist, pa.float64())}
        )

    import pandas as pd

    def topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["dist", "vec_id"],
                              ascending=[False, True], kind="stable").head(k)
        g = g.assign(rank=np.arange(1, len(g) + 1, dtype="int64"))
        return g[["label", "vec_id", "rank"]]

    return (
        src.map_batches(score, batch_format="pyarrow", batch_size=4096)
        .groupby("label")
        .map_groups(topk, batch_format="pandas")
    )
