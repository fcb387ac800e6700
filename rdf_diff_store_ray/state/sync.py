"""Store replication: bring a read replica's delta log up to date.

The reference replicates through git remotes — its writer commits and
pushes, and every query-cache request fetches updates before reading
(``src/git.rs`` ``checkout_main_and_fetch_updates``, called at the top
of each handler in ``src/bin/rdf-query-cache.rs:59,91``). The delta-log
analog: log files are immutable once written (appends create new
``deltas.seg-NNNNNN.parquet`` segments; only compaction/truncation
rewrites the base file and deletes stale segments), so a fetch is a
file-level rsync — copy files the replica lacks, refresh files whose
(size, mtime) changed, and drop files the source compacted away.

Change detection is rsync's quick check: a file is up to date when
name, size and mtime all match (copies preserve mtime). A real remote
transport would carry the same decision on a manifest/etag instead of
a local stat — the sync unit and ordering would not change.

Consistency: within each partition, data files are copied BEFORE
``manifest.json`` from one directory snapshot, so a replica's manifest
never describes content it does not have. Syncing while the source is
being COMPACTED can race a file deletion; the affected partition is
re-listed and retried once, then raises. For a fully quiescent copy,
pass ``lock_src=True`` to hold the source's writer lock during the
sync (the reference's pool-of-one gives its fetches the same
guarantee). The destination's writer lock is always held — a replica
being synced must not also be written.
"""

from __future__ import annotations

import os
import shutil

from .. import fs
from .append import StoreWriteLock


def _listing(d: str) -> dict:
    """name → listing signature for visible objects in ``d`` (hidden
    keys — locks, staging garbage — are not store namespace)."""
    out = {}
    for name in fs.visible_listdir(d):
        p = os.path.join(d, name)
        if os.path.isfile(p):
            out[name] = fs.stat_sig(p)
    return out


def _copy_atomic(src: str, dst: str) -> None:
    fs.copy_file(src, dst)  # atomic publish, signature-preserving


def _sync_dir(src_d: str, dst_d: str, *, delete: bool) -> dict:
    os.makedirs(dst_d, exist_ok=True)
    for attempt in (0, 1):
        src_files = _listing(src_d)
        dst_files = _listing(dst_d)
        # data files first, manifest.json last (see module docstring)
        order = sorted(src_files, key=lambda n: (n == "manifest.json", n))
        copied = 0
        try:
            for name in order:
                if dst_files.get(name) != src_files[name]:
                    _copy_atomic(os.path.join(src_d, name),
                                 os.path.join(dst_d, name))
                    copied += 1
        except FileNotFoundError:
            if attempt:
                raise
            continue  # source compacted mid-sync: re-list, retry once
        removed = 0
        if delete:
            for name in set(dst_files) - set(src_files):
                os.unlink(os.path.join(dst_d, name))
                removed += 1
        return {"copied": copied, "removed": removed}
    raise AssertionError("unreachable")


def sync_store(src: str, dst: str, *, delete: bool = True,
               lock_src: bool = False) -> dict:
    """Fetch ``src``'s delta log into ``dst`` (created if absent).

    Returns ``{"copied": n, "removed": n, "partitions": n}``. Raises
    :class:`..state.append.LogLockedError` when ``dst`` (or, with
    ``lock_src=True``, ``src``) is locked by a live writer. A second
    sync over an unchanged source copies nothing (quick-check hit).
    """
    src, dst = fs.local(src), fs.local(dst)
    parts = sorted(
        p for p in os.listdir(src)
        if p.startswith("partition=")
        and os.path.isdir(os.path.join(src, p))
    )
    if not parts:
        raise ValueError(f"no delta partitions under {src!r}")
    os.makedirs(dst, exist_ok=True)

    from contextlib import ExitStack

    totals = {"copied": 0, "removed": 0, "partitions": len(parts)}
    with ExitStack() as stack:
        stack.enter_context(StoreWriteLock(dst))
        if lock_src:
            stack.enter_context(StoreWriteLock(src))
        for p in parts:
            r = _sync_dir(os.path.join(src, p), os.path.join(dst, p),
                          delete=delete)
            totals["copied"] += r["copied"]
            totals["removed"] += r["removed"]
        if delete:
            for extra in sorted(
                q for q in os.listdir(dst)
                if q.startswith("partition=") and q not in parts
                and os.path.isdir(os.path.join(dst, q))
            ):
                shutil.rmtree(os.path.join(dst, extra))
                totals["removed"] += 1
        # top-level metadata (_SUCCESS build marker etc.) last: a replica
        # only advertises a completed state it fully holds
        r = _sync_dir(src, dst, delete=delete)
        totals["copied"] += r["copied"]
        totals["removed"] += r["removed"]
    return totals
