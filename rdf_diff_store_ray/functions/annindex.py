"""Persisted IVF ANN index — similarity search with TRUE I/O pruning.

:func:`..functions.similarity.ivf_topk` re-assigns the whole corpus on
every query call; this module persists the inverted lists instead, so a
query READS only the ``nprobe`` probed lists' files — at 4096 lists and
``nprobe=8``, ~0.2% of the index bytes leave storage per query batch
(the pruning happens at the parquet-file level, before Ray schedules a
single read task).

Layout (the repo's log-structured store pattern):

- ``index.json`` — knobs pinned at build time (cluster count, dim);
  extend/query calls validate against it,
- ``centroids.parquet`` — the coarse quantizer, ``n_clusters × dim``
  (driver-sized by construction; broadcast once per query call),
- ``list-<cluster>-<seq>.parquet`` — one segment per inverted list per
  ingest batch, vectors stored L2-NORMALIZED so queries skip the
  renorm; existing segments are never rewritten, readers glob.

Extension assigns new vectors with the FROZEN quantizer (the standard
IVF contract — recall for new data degrades only if its distribution
drifts from the training sample; rebuild to re-train).
"""

from __future__ import annotations

import glob as globmod
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from .. import fs
from .similarity import (
    _kmeans_centroids,
    _merge_local_topk,
    _probed_topk_batch,
)


def _load_meta(index_dir: str) -> dict:
    meta_path = os.path.join(index_dir, "index.json")
    if not os.path.exists(meta_path):
        raise FileNotFoundError(f"no IVF index at {index_dir!r}")
    with open(meta_path) as f:
        return json.load(f)


def _load_centroids(index_dir: str) -> np.ndarray:
    t = pq.read_table(os.path.join(index_dir, "centroids.parquet"))
    return np.asarray(t["embedding"].to_pylist(), dtype=np.float64)


def _next_seq(index_dir: str) -> int:
    segs = globmod.glob(os.path.join(index_dir, "list-*-*.parquet"))
    seqs = [int(os.path.basename(s).split("-")[2].split(".")[0]) for s in segs]
    return (max(seqs) + 1) if seqs else 0


def compact_ivf_index(index_dir: str) -> pd.DataFrame:
    """Merge each inverted list's append segments into one base segment
    (the git-gc analog for the ANN index): per touched list, concat +
    sort all ``list-<cluster>-*.parquet`` rows, publish atomically as
    the NEXT seq, delete the inputs. Single-writer; rows are an
    unordered set, so query results are unchanged. Returns
    (cluster, segments_merged, rows) accounting."""
    index_dir = fs.local(index_dir)
    _load_meta(index_dir)  # validates the index exists
    seq = _next_seq(index_dir)
    by_cluster: dict[int, list] = {}
    for f in sorted(globmod.glob(os.path.join(index_dir, "list-*-*.parquet"))):
        by_cluster.setdefault(
            int(os.path.basename(f).split("-")[1]), []
        ).append(f)
    out = []
    for cluster, files in sorted(by_cluster.items()):
        if len(files) < 2:
            continue
        t = pa.concat_tables([pq.read_table(f) for f in files])
        t = t.sort_by([("vec_id", "ascending")])
        path = os.path.join(index_dir, f"list-{cluster:05d}-{seq:06d}.parquet")
        fs.put_table(t, path)
        for f in files:
            os.remove(f)
        out.append((cluster, len(files), t.num_rows))
    return pd.DataFrame(
        out, columns=["cluster", "segments_merged", "rows"]
    ).astype("int64")


def extend_ivf_index(emb_ds, index_dir: str) -> pd.DataFrame:
    """Assign the vectors to the index's FROZEN centroids and append one
    ``list-<cluster>-<seq>.parquet`` segment per touched inverted list
    (existing bytes untouched). Returns per-list (cluster, rows)
    accounting."""
    index_dir = fs.local(index_dir)
    meta = _load_meta(index_dir)
    Cn = _load_centroids(index_dir)
    cref = ray.put(Cn)
    dim = int(meta["dim"])

    def assign(batch: pa.Table) -> pa.Table:
        C = ray.get(cref)
        ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        V = np.asarray(batch["embedding"].to_pylist(), dtype=np.float64)
        if V.ndim != 2 or V.shape[1] != dim:
            raise ValueError(
                f"index expects dim={dim}, got {V.shape}"
            )
        n = np.linalg.norm(V, axis=1, keepdims=True)
        n[n == 0] = 1.0
        Vn = V / n
        cl = (Vn @ C.T).argmax(axis=1).astype(np.int64)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cluster": pa.array(cl, pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for v in Vn], pa.list_(pa.float64())
                ),
            }
        )

    def write_list(part: pd.DataFrame) -> pd.DataFrame:
        cluster = int(part["cluster"].iloc[0])
        part = part.sort_values("vec_id", ignore_index=True)
        tbl = pa.table(
            {
                "vec_id": pa.array(
                    part["vec_id"].to_numpy("int64"), pa.int64()
                ),
                "cluster": pa.array(
                    part["cluster"].to_numpy("int64"), pa.int64()
                ),
                "embedding": pa.array(
                    [list(v) for v in part["embedding"]],
                    pa.list_(pa.float64()),
                ),
            }
        )
        path = os.path.join(
            index_dir, f"list-{cluster:05d}-{seq:06d}.parquet"
        )
        fs.put_table(tbl, path)
        return pd.DataFrame(
            {
                "cluster": pd.Series([cluster], dtype="int64"),
                "rows": pd.Series([len(part)], dtype="int64"),
            }
        )

    # cluster cardinality is bounded (= n_clusters) by construction, so a
    # per-cluster map_groups is safe here. seq is claimed under the
    # single-writer lock — two concurrent extenders would otherwise both
    # claim the same segment number
    from ..state.append import StoreWriteLock

    with StoreWriteLock(index_dir):
        seq = _next_seq(index_dir)
        out = (
            emb_ds.select_columns(["vec_id", "embedding"])
            .map_batches(assign, batch_format="pyarrow")
            .groupby("cluster")
            .map_groups(write_list, batch_format="pandas")
            .to_pandas()
        )
        if out.empty:  # empty ingest batch: nothing written
            return pd.DataFrame({"cluster": pd.Series(dtype="int64"),
                                 "rows": pd.Series(dtype="int64")})
        return out.sort_values("cluster", ignore_index=True)


def build_ivf_index(
    emb_ds,
    index_dir: str,
    *,
    n_clusters: int = 16,
    train_size: int = 2048,
    seed: int = 7,
) -> pd.DataFrame:
    """Train the coarse quantizer on a bounded driver-side sample (never
    the full corpus), persist it, then ingest the corpus as the first
    extension batch. Refuses to overwrite an existing index."""
    index_dir = fs.local(index_dir)
    if os.path.exists(os.path.join(index_dir, "index.json")):
        raise ValueError(f"index already exists at {index_dir!r}")
    os.makedirs(index_dir, exist_ok=True)
    sample = np.asarray(
        [r["embedding"] for r in emb_ds.limit(train_size).take_all()],
        dtype=np.float64,
    )
    if sample.ndim != 2 or not len(sample):
        raise ValueError("cannot train an IVF quantizer on an empty corpus")
    norms = np.linalg.norm(sample, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    C = _kmeans_centroids(sample / norms, n_clusters, seed=seed)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    pq.write_table(
        pa.table(
            {
                "cluster": pa.array(
                    np.arange(len(Cn), dtype=np.int64), pa.int64()
                ),
                "embedding": pa.array(
                    [c.tolist() for c in Cn], pa.list_(pa.float64())
                ),
            }
        ),
        os.path.join(index_dir, "centroids.parquet"),
    )
    with open(os.path.join(index_dir, "index.json"), "w") as f:
        json.dump(
            {
                "n_clusters": int(len(Cn)),
                "dim": int(Cn.shape[1]),
                "seed": seed,
            },
            f,
        )
    return extend_ivf_index(emb_ds, index_dir)


def ivf_index_topk(
    index_dir: str,
    query_vecs,
    k: int = 10,
    *,
    nprobe: int = 4,
):
    """Exact-rescored top-k over ONLY the probed inverted lists: the
    parquet files of unprobed lists are never opened (file-level
    pruning, decided on the driver from the tiny centroid table before
    any Ray task is scheduled). Same output schema as
    ``brute_force_topk`` — ``(query_id, vec_id, rank, cosine)``."""
    index_dir = fs.local(index_dir)
    meta = _load_meta(index_dir)
    Cn = _load_centroids(index_dir)
    q = np.asarray(query_vecs, dtype=np.float64)
    if q.ndim != 2 or q.shape[1] != int(meta["dim"]):
        raise ValueError(f"queries must be (Q, {meta['dim']})")
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    cq = qn @ Cn.T  # (Q, C)
    nprobe = min(nprobe, len(Cn))
    probe = [
        set(np.argsort(-cq[qi])[:nprobe].tolist()) for qi in range(len(q))
    ]
    probed = sorted(set().union(*probe))

    files = [
        f
        for c in probed
        for f in sorted(
            globmod.glob(os.path.join(index_dir, f"list-{c:05d}-*.parquet"))
        )
    ]
    if not files:
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
    import ray.data as rd

    qref = ray.put(qn)
    pref = ray.put(probe)
    cand = (
        rd.read_parquet(files)
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
