"""Persisted IVF ANN index: recall, pruning, extension, hygiene."""

import glob
import os

import numpy as np
import pyarrow as pa
import pytest


def _emb_table(n, dim=16, seed=0, start_id=0):
    rng = np.random.default_rng(seed)
    V = rng.normal(size=(n, dim))
    return pa.table(
        {
            "vec_id": pa.array(
                np.arange(start_id, start_id + n, dtype=np.int64)
            ),
            "embedding": pa.array(
                [v.tolist() for v in V], pa.list_(pa.float64())
            ),
        }
    )


def _brute(tbl, queries, k):
    from rdf_diff_store_ray.functions.similarity import brute_force_topk

    import ray.data as rd

    return brute_force_topk(rd.from_arrow(tbl), queries, k=k).to_pandas()


def test_ivf_index_recall_and_full_probe_exactness(ray_session, tmp_path):
    import ray.data as rd

    from rdf_diff_store_ray.functions.annindex import (
        build_ivf_index,
        ivf_index_topk,
    )

    tbl = _emb_table(400, seed=1)
    idx = str(tmp_path / "ivf")
    stats = build_ivf_index(
        rd.from_arrow(tbl), idx, n_clusters=8, train_size=400
    )
    assert int(stats["rows"].sum()) == 400
    rng = np.random.default_rng(5)
    queries = rng.normal(size=(6, 16))
    exact = _brute(tbl, queries, k=5)

    # probing every list must reproduce brute force exactly (ids/ranks
    # identical; cosines to float ulps — the index stores pre-normalized
    # vectors, brute force normalizes at query time)
    full = ivf_index_topk(idx, queries, k=5, nprobe=8).to_pandas()
    assert full[["query_id", "vec_id", "rank"]].equals(
        exact[["query_id", "vec_id", "rank"]]
    ), (full, exact)
    assert np.allclose(full["cosine"], exact["cosine"])

    # nprobe=3: measured recall stays high
    part = ivf_index_topk(idx, queries, k=5, nprobe=3).to_pandas()
    got = set(zip(part["query_id"], part["vec_id"]))
    want = set(zip(exact["query_id"], exact["vec_id"]))
    recall = len(got & want) / len(want)
    assert recall >= 0.6, recall


def test_ivf_index_extension_and_log_structure(ray_session, tmp_path):
    import ray.data as rd

    from rdf_diff_store_ray.functions.annindex import (
        build_ivf_index,
        extend_ivf_index,
        ivf_index_topk,
    )

    idx = str(tmp_path / "ivf")
    a = _emb_table(200, seed=2)
    build_ivf_index(rd.from_arrow(a), idx, n_clusters=4, train_size=200)
    seg0 = set(glob.glob(os.path.join(idx, "list-*-*.parquet")))
    mtimes0 = {f: os.path.getmtime(f) for f in seg0}

    # extension batch contains an exact copy of vector 7 under a new id
    b = _emb_table(50, seed=3, start_id=1000)
    v7 = a["embedding"].to_pylist()[7]
    b = b.set_column(
        1, "embedding", pa.array(
            [v7] + b["embedding"].to_pylist()[1:], pa.list_(pa.float64())
        )
    )
    extend_ivf_index(rd.from_arrow(b), idx)
    seg1 = set(glob.glob(os.path.join(idx, "list-*-*.parquet")))
    assert seg0 < seg1
    assert all(os.path.getmtime(f) == mtimes0[f] for f in seg0)

    # the new exact copy is now the (joint-)top hit for itself
    out = ivf_index_topk(idx, [v7], k=2, nprobe=4).to_pandas()
    assert set(out["vec_id"]) == {7, 1000}
    assert np.allclose(out["cosine"], 1.0)


def test_ivf_index_file_level_pruning(ray_session, tmp_path):
    """nprobe < n_clusters must leave unprobed lists' files unopened —
    proven by making them unreadable."""
    import ray.data as rd

    from rdf_diff_store_ray.functions.annindex import (
        _load_centroids,
        build_ivf_index,
        ivf_index_topk,
    )

    idx = str(tmp_path / "ivf")
    tbl = _emb_table(300, seed=4)
    build_ivf_index(rd.from_arrow(tbl), idx, n_clusters=8, train_size=300)
    Cn = _load_centroids(idx)
    # query = the first centroid itself -> probed lists are known
    qn = Cn[0]
    probed = set(np.argsort(-(Cn @ qn))[:2].tolist())
    # corrupt every unprobed list file; a pruned read never notices
    for f in glob.glob(os.path.join(idx, "list-*-*.parquet")):
        c = int(os.path.basename(f).split("-")[1])
        if c not in probed:
            with open(f, "wb") as fh:
                fh.write(b"not parquet")
    out = ivf_index_topk(idx, [qn.tolist()], k=3, nprobe=2).to_pandas()
    assert len(out) == 3


def test_ivf_index_errors(ray_session, tmp_path):
    import ray.data as rd

    from rdf_diff_store_ray.functions.annindex import (
        build_ivf_index,
        extend_ivf_index,
        ivf_index_topk,
    )

    idx = str(tmp_path / "ivf")
    tbl = _emb_table(50, seed=6)
    build_ivf_index(rd.from_arrow(tbl), idx, n_clusters=4, train_size=50)
    with pytest.raises(ValueError):
        build_ivf_index(rd.from_arrow(tbl), idx)  # refuses overwrite
    with pytest.raises(FileNotFoundError):
        ivf_index_topk(str(tmp_path / "nope"), [[0.0] * 16])
    with pytest.raises(ValueError):
        ivf_index_topk(idx, [[0.0] * 7])  # wrong dim
    bad = _emb_table(5, seed=7, dim=7)
    with pytest.raises(Exception):
        extend_ivf_index(rd.from_arrow(bad), idx)


def test_ann_index_cli(ray_session, tmp_path, capsys):
    import json as _json

    import pyarrow.parquet as pq

    from rdf_diff_store_ray.__main__ import main

    emb = _emb_table(120, seed=9)
    pq.write_table(emb, str(tmp_path / "emb.parquet"))
    pq.write_table(
        pa.table(
            {"embedding": pa.array(
                emb["embedding"].to_pylist()[:2], pa.list_(pa.float64())
            )}
        ),
        str(tmp_path / "q.parquet"),
    )
    idx = str(tmp_path / "ivf")
    assert main(["ann-index-build", "--embeddings",
                 str(tmp_path / "emb.parquet"), "--index", idx,
                 "--clusters", "4", "--train-size", "120"]) == 0
    out = _json.loads(capsys.readouterr().out.strip())
    assert out["rows"] == 120
    assert main(["ann-index-query", "--index", idx, "--queries",
                 str(tmp_path / "q.parquet"), "--k", "3"]) == 0
    res = _json.loads(capsys.readouterr().out.strip())
    assert res["rows"] == 6
    # each query's own vector is its rank-1 hit
    by_q = {r["query_id"]: r for r in res["results"] if r["rank"] == 1}
    assert by_q[0]["vec_id"] == 0 and by_q[1]["vec_id"] == 1
    # extend via CLI
    emb2 = _emb_table(30, seed=10, start_id=500)
    pq.write_table(emb2, str(tmp_path / "emb2.parquet"))
    assert main(["ann-index-build", "--embeddings",
                 str(tmp_path / "emb2.parquet"), "--index", idx,
                 "--extend"]) == 0
    out = _json.loads(capsys.readouterr().out.strip())
    assert out["rows"] == 30


def test_compact_ivf_index_preserves_queries(ray_session, tmp_path):
    import pandas as pd

    import ray.data as rd

    from rdf_diff_store_ray.functions.annindex import (
        build_ivf_index,
        compact_ivf_index,
        extend_ivf_index,
        ivf_index_topk,
    )

    idx = str(tmp_path / "ivf")
    build_ivf_index(
        rd.from_arrow(_emb_table(100, seed=1)), idx,
        n_clusters=4, train_size=100,
    )
    extend_ivf_index(rd.from_arrow(_emb_table(50, seed=2, start_id=500)), idx)
    q = np.random.default_rng(3).normal(size=(4, 16))
    before = ivf_index_topk(idx, q, k=5, nprobe=4).to_pandas()
    n_before = len(glob.glob(os.path.join(idx, "list-*-*.parquet")))
    compact_ivf_index(idx)
    n_after = len(glob.glob(os.path.join(idx, "list-*-*.parquet")))
    assert n_after < n_before
    after = ivf_index_topk(idx, q, k=5, nprobe=4).to_pandas()
    pd.testing.assert_frame_equal(before, after)
    assert len(compact_ivf_index(idx)) == 0
