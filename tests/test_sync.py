"""Store replication (state/sync.py) — the git-fetch analog: replica
parity after appends, incremental quick-check, compaction mirroring,
lock exclusion, no-delete mode."""

import glob
import os

import pyarrow.dataset as pads
import pytest

G_A = '<https://x/a> <https://x/p> "1" .\n'
G_A2 = '<https://x/a> <https://x/p> "changed" .\n'
G_B = '<https://x/b> <https://x/p> "2" .\n'

T1, T2, T3 = 1_700_000_000, 1_700_000_100, 1_700_000_200


def _files(d):
    return sorted(
        os.path.relpath(p, d)
        for p in glob.glob(os.path.join(d, "partition=*", "*"))
    )


def _state(d, ts):
    from rdf_diff_store_ray.state.reconstruct import state_at_table

    files = sorted(glob.glob(os.path.join(d, "partition=*", "*.parquet")))
    live = state_at_table(pads.dataset(files).to_table(), ts)
    return sorted(zip(live["graph_id"].to_pylist(),
                      live["delta_text"].to_pylist()))


@pytest.fixture()
def src(ray_session, tmp_path):
    from rdf_diff_store_ray.state.append import append_graphs, init_log

    d = init_log(str(tmp_path / "src"), num_partitions=4)
    append_graphs(d, {"g1": G_A, "g2": G_B}, T1)
    append_graphs(d, {"g1": G_A2}, T2)
    return d


def test_sync_fresh_replica_reaches_parity(src, tmp_path):
    from rdf_diff_store_ray.state.sync import sync_store

    dst = str(tmp_path / "dst")
    out = sync_store(src, dst)
    assert out["partitions"] == 4 and out["copied"] > 0
    assert _files(dst) == _files(src)
    assert _state(dst, T3) == _state(src, T3)
    assert _state(dst, T1) == _state(src, T1)

    # unchanged source: second sync is a no-op (rsync quick-check)
    again = sync_store(src, dst)
    assert again["copied"] == 0 and again["removed"] == 0


def test_sync_incremental_fetch_copies_only_new(src, tmp_path):
    from rdf_diff_store_ray.state.append import append_graphs
    from rdf_diff_store_ray.state.sync import sync_store

    dst = str(tmp_path / "dst")
    sync_store(src, dst)
    n_before = len(_files(dst))

    append_graphs(src, {"g3": G_B}, T3)
    out = sync_store(src, dst)
    # exactly the new segment + its partition manifest move
    assert 0 < out["copied"] <= 2
    assert len(_files(dst)) > n_before
    assert _state(dst, T3) == _state(src, T3)


def test_sync_mirrors_compaction(src, tmp_path):
    from rdf_diff_store_ray.state.append import compact_log
    from rdf_diff_store_ray.state.sync import sync_store

    dst = str(tmp_path / "dst")
    sync_store(src, dst)
    assert any("seg-" in f for f in _files(dst)), "fixture needs segments"

    compact_log(src)
    out = sync_store(src, dst)
    assert out["removed"] > 0, "stale replica segments must drop"
    assert _files(dst) == _files(src)
    assert _state(dst, T3) == _state(src, T3)

    # no-delete mode keeps them instead
    dst2 = str(tmp_path / "dst2")
    sync_store(src, dst2)
    from rdf_diff_store_ray.state.append import append_graphs

    append_graphs(src, {"g9": G_B}, T3)
    compact_log(src)
    out = sync_store(src, dst2, delete=False)
    assert out["removed"] == 0


def test_sync_respects_replica_writer_lock(src, tmp_path):
    from rdf_diff_store_ray.state.append import (
        LogLockedError,
        StoreWriteLock,
        init_log,
    )
    from rdf_diff_store_ray.state.sync import sync_store

    dst = init_log(str(tmp_path / "dst"), num_partitions=4)
    other = StoreWriteLock(dst)
    other._try_acquire()
    # fake a foreign holder so same-host staleness-breaking can't kick in
    import json as _json

    with open(other.path, "w") as f:
        _json.dump({"pid": 1, "host": "elsewhere"}, f)
    try:
        with pytest.raises(LogLockedError):
            sync_store(src, dst)
    finally:
        os.unlink(other.path)
    # and lock_src=True refuses a locked source the same way
    srclock = StoreWriteLock(src)
    srclock._try_acquire()
    with open(srclock.path, "w") as f:
        _json.dump({"pid": 1, "host": "elsewhere"}, f)
    try:
        with pytest.raises(LogLockedError):
            sync_store(src, str(tmp_path / "dst3"), lock_src=True)
    finally:
        os.unlink(srclock.path)


def test_sync_replica_passes_fsck_and_serves(src, tmp_path):
    """A synced replica is a fully valid store: fsck-clean and readable
    through the ordinary query surface."""
    from rdf_diff_store_ray.query.bgp import DiffStoreReader
    from rdf_diff_store_ray.state.fsck import fsck_ok, fsck_store
    from rdf_diff_store_ray.state.sync import sync_store

    dst = str(tmp_path / "dst")
    sync_store(src, dst)
    assert fsck_ok(fsck_store(dst))
    files = sorted(glob.glob(os.path.join(dst, "partition=*", "*.parquet")))
    reader = DiffStoreReader(pads.dataset(files).to_table())
    assert reader.graphs_at(T3).splitlines() == sorted(
        (G_A2 + G_B).splitlines())
