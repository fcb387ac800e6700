"""Storage shim: the store and index layers against object-store rules.

The reference's durable store is a *remote* (a Gitea server,
``/root/reference/src/git.rs:38-59``, ``docker-compose.yaml:48-63``);
this engine's logs and indexes live on shared storage. Deployed on a
real cluster that storage is an object store (S3/GCS-style), whose
contract differs from POSIX in three ways that matter here:

1. **No rename.** Publishing is one atomic PUT of a whole object under
   its final key — readers see the old object, the new object, or (for
   a fresh key) nothing, never a partial write.
2. **Conditional create.** Locks use conditional PUT
   (``If-None-Match: *``), not ``O_CREAT|O_EXCL``.
3. **Listings carry (size, last-modified, etag).** Change detection
   keys off the listing, never off inode metadata tricks.

This module makes every write path follow those rules uniformly, so
the same code is correct on POSIX *and* maps 1:1 onto an object-store
client:

- :func:`put_bytes` / :func:`put_table` stage under a HIDDEN key
  (``.put-<uuid>``) and publish with one atomic swap into the final
  key — the local emulation of a whole-object PUT. No sibling
  ``<name>.tmp`` ever appears under a visible name, and no VISIBLE key
  is ever renamed to another; crash garbage is an unreachable hidden
  key, cleaned opportunistically. Multi-file outputs still publish
  data objects first and commit via a small manifest object last
  (``deltas.py`` ordering), so a reader never follows a manifest to a
  missing object.
- :func:`put_if_absent` is the conditional-create primitive.
- :func:`stat_sig` returns the listing signature ``(size, mtime_ns)``
  (LastModified in a real listing) used by the sync quick-check;
  :func:`copy_file` preserves it so a re-sync of unchanged objects
  copies nothing.

Paths may be plain POSIX paths or ``file://`` URIs; public store entry
points normalize through :func:`local` so every internal layer sees
one canonical form. Hidden keys (basename starting with ``.``) are
never part of a store's namespace: globs don't match them and
:func:`visible_listdir` filters them.

**Second scheme (round 5): ``mocks3://bucket/key``** — an object store
emulated over a local directory (``$KG_MOCKS3_ROOT``, default
``/tmp/kg_mocks3``) whose durable-write verbs all route through an
**fsspec client** instead of raw ``os`` calls: ``pipe_file`` is the
whole-object PUT, ``open(mode="xb")`` the conditional create,
``ls(detail=True)`` the listing. ``local()`` maps a ``mocks3://`` URI
onto the bucket's backing directory, so readers (Ray ``read_parquet``,
glob-based log replay) see the same namespace from every worker
process — the directory plays the server, the fsspec calls play the
client, and the whole append/compact/sync/fsck/index matrix runs on
the adapter (``tests/test_mocks3.py``). A real ``s3://`` deployment
swaps the fsspec protocol (s3fs) behind the same
:class:`_FsspecClient`; its conditional PUT should use
``If-None-Match: *`` where the SDK exposes it.
"""

from __future__ import annotations

import os
import uuid

SCHEME = "file://"
MOCKS3_SCHEME = "mocks3://"


def _mocks3_root() -> str:
    return os.environ.get("KG_MOCKS3_ROOT", "/tmp/kg_mocks3")


def is_uri(path: str) -> bool:
    return isinstance(path, str) and (
        path.startswith(SCHEME) or path.startswith(MOCKS3_SCHEME)
    )


def local(path: str) -> str:
    """Canonical local form of a path or URI. For ``mocks3://`` this is
    the bucket's backing directory — what readers (glob, Ray parquet
    reads) address; the write verbs recognize it and route through the
    fsspec client."""
    if not isinstance(path, str):
        return path
    if path.startswith(SCHEME):
        return path[len(SCHEME):]
    if path.startswith(MOCKS3_SCHEME):
        return os.path.join(_mocks3_root(), path[len(MOCKS3_SCHEME):])
    if path.startswith("s3://"):
        raise NotImplementedError(
            "s3:// stores need the s3fs-backed client (same _FsspecClient "
            "shape as mocks3://) plus URI-native readers; this sandbox "
            "has no network, so only the dir-backed emulation is wired"
        )
    return path


def _in_mocks3(local_path: str) -> bool:
    root = _mocks3_root()
    return local_path == root or local_path.startswith(root + os.sep)


class _FsspecClient:
    """Object-store client over fsspec: only object verbs, no POSIX.

    PUT publishes atomically (hidden staging key + server-side move —
    the emulation of the store's internally-atomic whole-object PUT;
    clients never rename a VISIBLE key). Conditional PUT is an
    exclusive create. A real S3 adapter keeps these five methods and
    swaps ``protocol="s3"``."""

    def __init__(self, protocol: str = "file") -> None:
        import fsspec

        self.fs = fsspec.filesystem(protocol, auto_mkdir=True)

    def put(self, key: str, data: bytes) -> None:
        self.fs.makedirs(os.path.dirname(key), exist_ok=True)
        tmp = _staging_name(key)
        self.fs.pipe_file(tmp, data)
        self.fs.mv(tmp, key)  # the mock server's atomic-PUT boundary

    def put_if_absent(self, key: str, data: bytes) -> bool:
        self.fs.makedirs(os.path.dirname(key), exist_ok=True)
        try:
            with self.fs.open(key, "xb") as f:
                f.write(data)
        except FileExistsError:
            return False
        return True

    def list_visible(self, prefix: str) -> list:
        return sorted(
            os.path.basename(p.rstrip("/"))
            for p in self.fs.ls(prefix, detail=False)
            if not os.path.basename(p.rstrip("/")).startswith(".")
        )


_MOCKS3_CLIENT = None


def _client() -> _FsspecClient:
    global _MOCKS3_CLIENT
    if _MOCKS3_CLIENT is None:
        _MOCKS3_CLIENT = _FsspecClient("file")
    return _MOCKS3_CLIENT


def _staging_name(final: str) -> str:
    d, name = os.path.split(final)
    return os.path.join(d, f".put-{uuid.uuid4().hex}")


def put_bytes(path: str, data: bytes) -> None:
    """Atomic whole-object publish (the PUT emulation): write a hidden
    staging key, fsync, swap into the final key. Readers of ``path``
    never observe a partial object; a crash leaves only an unreachable
    hidden key. ``mocks3://`` paths (or paths under the mock bucket
    root) PUT through the fsspec client instead."""
    path = local(path)
    if _in_mocks3(path):
        _client().put(path, data)
        return
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = _staging_name(path)
    with open(tmp, "wb") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)  # the emulation's atomic-PUT boundary


def put_text(path: str, text: str) -> None:
    put_bytes(path, text.encode("utf-8"))


def put_table(table, path: str) -> None:
    """Atomic parquet publish under the final key. On ``mocks3://`` the
    table serializes to one buffer and ships as a whole-object PUT —
    exactly what a real object-store write would do."""
    import pyarrow.parquet as pq

    path = local(path)
    if _in_mocks3(path):
        import pyarrow as pa

        sink = pa.BufferOutputStream()
        pq.write_table(table, sink)
        _client().put(path, sink.getvalue().to_pybytes())
        return
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = _staging_name(path)
    pq.write_table(table, tmp)
    os.replace(tmp, path)


def put_if_absent(path: str, data: bytes) -> bool:
    """Conditional create (``If-None-Match: *``): True iff this call
    created the object. The lock primitive."""
    path = local(path)
    if _in_mocks3(path):
        return _client().put_if_absent(path, data)
    try:
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        return False
    try:
        os.write(fd, data)
    finally:
        os.close(fd)
    return True


def stat_sig(path: str) -> tuple:
    """Listing signature for change detection: (size, mtime_ns) — the
    (Size, LastModified) pair of an object listing."""
    st = os.stat(local(path))
    return (st.st_size, st.st_mtime_ns)


def copy_file(src: str, dst: str) -> None:
    """Server-side-copy analog: publish ``dst`` atomically with the
    SAME listing signature as ``src`` so sync quick-checks hit."""
    import shutil

    src, dst = local(src), local(dst)
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    tmp = _staging_name(dst)
    shutil.copy2(src, tmp)  # copy2 preserves mtime
    os.replace(tmp, dst)


def visible_listdir(path: str) -> list:
    """Names under a prefix, excluding hidden keys (staging garbage,
    locks) — the store's namespace as a reader sees it. ``mocks3://``
    lists through the fsspec client (the LIST verb)."""
    path = local(path)
    if _in_mocks3(path):
        return _client().list_visible(path)
    return sorted(n for n in os.listdir(path) if not n.startswith("."))


def sweep_staging(path: str) -> int:
    """Remove crash-orphaned hidden staging keys under one directory
    (opportunistic GC; they are unreachable either way)."""
    d = local(path)
    n = 0
    if not os.path.isdir(d):
        return 0
    for name in os.listdir(d):
        if name.startswith(".put-"):
            try:
                os.remove(os.path.join(d, name))
                n += 1
            except OSError:
                pass
    return n
