"""Similarity search over an embedding column (``list<float>``).

- :func:`brute_force_topk` — exact cosine top-k: the query matrix is
  broadcast once (``ray.put``), each ``map_batches`` task computes a
  float64 matmul against its batch and emits only its local top-k; the
  driver merges ``num_batches × k`` candidate rows (tiny). No full
  materialization of scores.
- :func:`lsh_topk` — the scale path: hyperplane-LSH buckets (same family
  as ``dedup.HyperplaneLSH``) with multi-probe (flip each plane bit) so a
  query touches a handful of buckets instead of the whole corpus; exact
  rescoring within probed buckets. Recall vs brute force is measured in
  tests.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa
import ray


class _TopKScorer:
    """Actor: holds the (broadcast) normalized query matrix."""

    def __init__(self, query_ref, k: int):
        q = ray.get(query_ref) if isinstance(query_ref, ray.ObjectRef) else query_ref
        q = np.asarray(q, dtype=np.float64)
        n = np.linalg.norm(q, axis=1, keepdims=True)
        n[n == 0] = 1.0
        self.q = q / n  # (Q, d)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        V = np.asarray(batch["embedding"].to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(V, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (V / norms) @ self.q.T  # (B, Q)
        k = min(self.k, len(ids))
        out_q, out_id, out_sim = [], [], []
        for qi in range(sims.shape[1]):
            col = sims[:, qi]
            # local top-k (argpartition = O(B))
            idx = np.argpartition(-col, k - 1)[:k]
            out_q.extend([qi] * len(idx))
            out_id.extend(ids[idx])
            out_sim.extend(col[idx])
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_id, pa.int64()),
                "cosine": pa.array(out_sim, pa.float64()),
            }
        )


# per-worker memoized scorer (broadcast query matrix fetched once; see
# stages/link.py for the task-mode-vs-actor-pool rationale)
_SCORER_CACHE: dict = {}


def _topk_score_batch(batch: pa.Table, query_ref=None, k: int = 10) -> pa.Table:
    key = (query_ref, k)
    scorer = _SCORER_CACHE.get(key)
    if scorer is None:
        scorer = _TopKScorer(query_ref, k)
        _SCORER_CACHE.clear()
        _SCORER_CACHE[key] = scorer
    return scorer(batch)


def _merge_local_topk(cand_rows, k: int) -> pa.Table:
    """Driver-side merge of per-batch local top-k rows — the only thing
    any top-k variant ever materializes (``num_batches × Q × k`` rows).
    Rank is 1-based, ordered by (cosine desc, vec_id asc)."""
    best: dict[int, list] = {}
    for r in cand_rows:
        best.setdefault(r["query_id"], []).append((-r["cosine"], r["vec_id"]))
    rows = []
    for qid in sorted(best):
        top = heapq.nsmallest(k, best[qid])
        for rank, (negsim, vid) in enumerate(top, start=1):
            rows.append((qid, vid, rank, -negsim))
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in rows], pa.int64()),
            "vec_id": pa.array([r[1] for r in rows], pa.int64()),
            "rank": pa.array([r[2] for r in rows], pa.int64()),
            "cosine": pa.array([r[3] for r in rows], pa.float64()),
        }
    )


def brute_force_topk(emb_ds, query_vecs, k: int = 10) -> pa.Table:
    """Exact top-k rows ``(query_id, vec_id, rank, cosine)``; rank is
    1-based, ordered by (cosine desc, vec_id asc) — fully deterministic."""
    qref = ray.put(np.asarray(query_vecs, dtype=np.float64))
    cand = emb_ds.map_batches(
        _topk_score_batch,
        fn_kwargs={"query_ref": qref, "k": k},
        batch_format="pyarrow",
        batch_size=8192,
    ).take_all()  # num_batches × Q × k rows — small by construction
    return _merge_local_topk(cand, k)


class _ProbedTopKScorer:
    """Per-batch exact rescoring restricted to each query's probed key
    set (IVF inverted lists / LSH buckets). Like :class:`_TopKScorer`
    but with a per-query eligibility mask on ``key_col`` — so candidate
    *embeddings* never leave the workers; only local top-k rows do."""

    def __init__(self, query_ref, probe_ref, key_col: str, k: int):
        q = ray.get(query_ref) if isinstance(query_ref, ray.ObjectRef) else query_ref
        q = np.asarray(q, dtype=np.float64)
        n = np.linalg.norm(q, axis=1, keepdims=True)
        n[n == 0] = 1.0
        self.q = q / n
        probe = ray.get(probe_ref) if isinstance(probe_ref, ray.ObjectRef) else probe_ref
        self.keysets = [
            np.fromiter(sorted(probe[qi]), dtype=np.int64, count=len(probe[qi]))
            for qi in range(len(probe))
        ]
        self.key_col = key_col
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        keys = np.asarray(batch[self.key_col].to_pylist(), dtype=np.int64)
        V = np.asarray(batch["embedding"].to_pylist(), dtype=np.float64)
        if len(ids) == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        norms = np.linalg.norm(V, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (V / norms) @ self.q.T  # (B, Q)
        out_q, out_id, out_sim = [], [], []
        for qi, ks in enumerate(self.keysets):
            mask = np.isin(keys, ks)
            if not mask.any():
                continue
            col = sims[mask, qi]
            sub_ids = ids[mask]
            kk = min(self.k, len(sub_ids))
            idx = np.argpartition(-col, kk - 1)[:kk]
            out_q.extend([qi] * len(idx))
            out_id.extend(sub_ids[idx])
            out_sim.extend(col[idx])
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_id, pa.int64()),
                "cosine": pa.array(out_sim, pa.float64()),
            }
        )


def _probed_topk_batch(batch: pa.Table, query_ref=None, probe_ref=None,
                       key_col: str = "cluster", k: int = 10) -> pa.Table:
    key = (query_ref, probe_ref, key_col, k)
    scorer = _SCORER_CACHE.get(key)
    if scorer is None:
        scorer = _ProbedTopKScorer(query_ref, probe_ref, key_col, k)
        _SCORER_CACHE.clear()
        _SCORER_CACHE[key] = scorer
    return scorer(batch)


def _kmeans_centroids(sample: np.ndarray, n_clusters: int, seed: int = 7,
                      iters: int = 10) -> np.ndarray:
    """Deterministic Lloyd's k-means on a driver-side sample (the coarse
    quantizer is tiny: ``n_clusters × dim`` floats)."""
    rng = np.random.default_rng(seed)
    n = len(sample)
    idx = rng.choice(n, size=min(n_clusters, n), replace=False)
    C = sample[np.sort(idx)].copy()
    for _ in range(iters):
        d = ((sample[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(C)):
            mask = assign == c
            if mask.any():
                C[c] = sample[mask].mean(axis=0)
    return C


def ivf_topk(emb_ds, query_vecs, k: int = 10, *, n_clusters: int = 16,
             nprobe: int = 4, train_size: int = 2048, seed: int = 7) -> pa.Table:
    """IVF approximate top-k (the scale path for very large corpora).

    Train a coarse quantizer on a bounded driver-side sample
    (``limit(train_size)`` — never the full corpus), broadcast the
    centroids once, assign vectors in ``map_batches``, then exact-rescore
    only the ``nprobe`` inverted lists nearest each query. Same output
    schema as :func:`brute_force_topk`; recall vs brute force is measured
    in tests.
    """
    sample = np.asarray(
        [r["embedding"] for r in emb_ds.limit(train_size).take_all()],
        dtype=np.float64,
    )
    norms = np.linalg.norm(sample, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    C = _kmeans_centroids(sample / norms, n_clusters, seed=seed)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    cref = ray.put(Cn)

    q = np.asarray(query_vecs, dtype=np.float64)
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    qref = ray.put(qn)
    # nprobe nearest centroids per query (by cosine)
    cq = qn @ Cn.T  # (Q, C)
    probe = {qi: set(np.argsort(-cq[qi])[:nprobe].tolist()) for qi in range(len(q))}
    all_probed = sorted(set().union(*probe.values()))

    class AssignAndFilter:
        """Assign each vector to its nearest centroid; emit only vectors
        in a probed list (candidate pruning happens inside the stream)."""

        def __init__(self, centroids_ref, probed):
            self.C = ray.get(centroids_ref)
            self.probed = np.asarray(probed, dtype=np.int64)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
            V = np.asarray(batch["embedding"].to_pylist(), dtype=np.float64)
            n = np.linalg.norm(V, axis=1, keepdims=True)
            n[n == 0] = 1.0
            Vn = V / n
            assign = (Vn @ self.C.T).argmax(axis=1)
            keep = np.isin(assign, self.probed)
            return pa.table(
                {
                    "vec_id": pa.array(ids[keep], pa.int64()),
                    "cluster": pa.array(assign[keep], pa.int64()),
                    "embedding": pa.array(
                        [v.tolist() for v in Vn[keep]],
                        pa.list_(pa.float64()),
                    ),
                }
            )

    def assign_and_filter_batch(batch: pa.Table, centroids_ref=None,
                                probed=()) -> pa.Table:
        key = (centroids_ref, tuple(probed))
        stage = _SCORER_CACHE.get(key)
        if stage is None:
            stage = AssignAndFilter(centroids_ref, list(probed))
            _SCORER_CACHE.clear()
            _SCORER_CACHE[key] = stage
        return stage(batch)

    probe_list = [probe[qi] for qi in range(len(q))]
    pref = ray.put(probe_list)
    cand = (
        emb_ds.map_batches(
            assign_and_filter_batch,
            fn_kwargs={"centroids_ref": cref, "probed": tuple(all_probed)},
            batch_format="pyarrow",
            batch_size=8192,
        )
        .map_batches(
            _probed_topk_batch,
            fn_kwargs={"query_ref": qref, "probe_ref": pref,
                       "key_col": "cluster", "k": k},
            batch_format="pyarrow",
            batch_size=8192,
        )
        .take_all()  # num_batches × Q × k rows — embeddings never land here
    )
    return _merge_local_topk(cand, k)


def lsh_topk(emb_ds, query_vecs, k: int = 10, *, n_planes: int = 8,
             dim: int = 64, seed: int = 5) -> pa.Table:
    """Approximate top-k: probe the query's bucket plus all 1-bit-flip
    neighbors, exact-rescore those candidates. Same output schema as
    :func:`brute_force_topk`."""
    from .dedup import HyperplaneLSH

    lsh = HyperplaneLSH(dim=dim, n_planes=n_planes, seed=seed)
    q = np.asarray(query_vecs, dtype=np.float64)
    qb = lsh.bucket_of(q)
    probe: dict[int, set] = {}
    for qi, b in enumerate(qb):
        probes = {int(b)} | {int(b) ^ (1 << p) for p in range(n_planes)}
        probe[qi] = probes
    all_probed = set().union(*probe.values())

    from .dedup import hyperplane_lsh_batch

    bucketed = emb_ds.map_batches(
        hyperplane_lsh_batch,
        fn_kwargs={"dim": dim, "n_planes": n_planes, "seed": seed},
        batch_format="pyarrow",
        batch_size=8192,
    )
    wanted = pa.array(sorted(all_probed), pa.int64())

    def in_probed(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.is_in(batch["bucket"], value_set=wanted))

    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    qref = ray.put(qn)
    pref = ray.put([probe[qi] for qi in range(len(q))])
    cand = (
        bucketed.map_batches(in_probed, batch_format="pyarrow")
        .map_batches(
            _probed_topk_batch,
            fn_kwargs={"query_ref": qref, "probe_ref": pref,
                       "key_col": "bucket", "k": k},
            batch_format="pyarrow",
            batch_size=8192,
        )
        .take_all()  # num_batches × Q × k rows — embeddings never land here
    )
    return _merge_local_topk(cand, k)


def quantize_embeddings(emb_ds, *, bits: int = 8, sample_size: int = 8192):
    """Scalar int8 quantization of an embedding column — the 4× storage
    cut a 100-TB vector corpus takes before ANN indexing (per-dimension
    affine codes, the faiss ScalarQuantizer shape). Two passes:

    1. per-dimension (min, max) from per-batch partials folded on the
       driver (d floats per batch on the wire, never vectors), clamped
       against a bounded driver sample only for the empty-input guard;
    2. in-stream encode: ``code = round((x - min) / scale)`` per dim.

    Returns a Dataset ``(vec_id, codes: list<int8-as-int32>, ...)`` plus
    the broadcastable ``(mins, scales)`` pair for decode; and
    :func:`dequantize_embeddings` inverts it with reconstruction error
    ≤ scale/2 per dimension (pytest-gated)."""
    import ray

    levels = (1 << bits) - 1

    def minmax(batch: pa.Table) -> pa.Table:
        from ..functions.cluster import _matrix

        V = _matrix(batch["embedding"])
        if V.size == 0:
            return pa.table({"mins": pa.array([], pa.list_(pa.float64())),
                             "maxs": pa.array([], pa.list_(pa.float64()))})
        return pa.table(
            {
                "mins": pa.array([V.min(axis=0).tolist()]),
                "maxs": pa.array([V.max(axis=0).tolist()]),
            }
        )

    parts = emb_ds.select_columns(["embedding"]).map_batches(
        minmax, batch_format="pyarrow"
    ).to_pandas()
    if not len(parts):
        raise ValueError("cannot quantize an empty embedding Dataset")
    mins = np.min(np.stack(parts["mins"].to_numpy()), axis=0)
    maxs = np.max(np.stack(parts["maxs"].to_numpy()), axis=0)
    scales = np.maximum(maxs - mins, 1e-12) / levels
    ref = ray.put((mins, scales))

    def encode(batch: pa.Table) -> pa.Table:
        from ..functions.cluster import _matrix

        mn, sc = ray.get(ref)
        V = _matrix(batch["embedding"])
        codes = np.clip(
            np.round((V - mn[None, :]) / sc[None, :]), 0, levels
        ).astype(np.int32)
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "codes": pa.array([c.tolist() for c in codes],
                                  pa.list_(pa.int32())),
            }
        )

    return emb_ds.map_batches(encode, batch_format="pyarrow"), (mins, scales)


def dequantize_embeddings(codes_ds, params):
    """Inverse of :func:`quantize_embeddings`: ``x ≈ min + code*scale``."""
    import ray

    ref = ray.put(params)

    def decode(batch: pa.Table) -> pa.Table:
        mn, sc = ray.get(ref)
        C = np.asarray(
            [np.asarray(c, dtype=np.float64) for c in
             batch["codes"].to_pylist()]
        )
        V = mn[None, :] + C * sc[None, :]
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "embedding": pa.array([v.tolist() for v in V],
                                      pa.list_(pa.float64())),
            }
        )

    return codes_ds.map_batches(decode, batch_format="pyarrow")
