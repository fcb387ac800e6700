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
"""

from __future__ import annotations

import os
import uuid

SCHEME = "file://"


def is_uri(path: str) -> bool:
    return isinstance(path, str) and path.startswith(SCHEME)


def local(path: str) -> str:
    """Canonical local form of a path or ``file://`` URI."""
    return path[len(SCHEME):] if is_uri(path) else path


def _staging_name(final: str) -> str:
    d, name = os.path.split(final)
    return os.path.join(d, f".put-{uuid.uuid4().hex}")


def put_bytes(path: str, data: bytes) -> None:
    """Atomic whole-object publish (the PUT emulation): write a hidden
    staging key, fsync, swap into the final key. Readers of ``path``
    never observe a partial object; a crash leaves only an unreachable
    hidden key."""
    path = local(path)
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
    """Atomic parquet publish under the final key."""
    import pyarrow.parquet as pq

    path = local(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = _staging_name(path)
    pq.write_table(table, tmp)
    os.replace(tmp, path)


def put_if_absent(path: str, data: bytes) -> bool:
    """Conditional create (``If-None-Match: *``): True iff this call
    created the object. The lock primitive."""
    path = local(path)
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
    locks) — the store's namespace as a reader sees it."""
    return sorted(
        n for n in os.listdir(local(path)) if not n.startswith(".")
    )


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
