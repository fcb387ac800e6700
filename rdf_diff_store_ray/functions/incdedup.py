"""Incremental MinHash-LSH dedup against a PERSISTED band index — the
shape a continuously-ingesting pipeline needs (CCNet / FineWeb dedup
each new crawl against everything already kept, without re-shuffling
the historical corpus): the index stores only ``(band_id, band_hash,
doc_id)`` rows, hash-bucketed into a FIXED partition layout on disk, so

- an ingest batch's band rows meet the index rows of the same buckets
  in exactly ONE partition each (same key as the in-corpus LSH path:
  ``(band_hash + band_id) % num_partitions``),
- extension is log-structured: each ingest appends one
  ``bands-<pid>-<seq>.parquet`` segment per touched partition and never
  rewrites existing bytes (readers glob; the delta-store pattern),
- the duplicate decision is collision-based (``>= min_bands`` band
  collisions), the standard signature-only rule when historical TEXTS
  are not retained — with 128 perms / 32 bands a single-band collision
  concentrates around Jaccard ~0.7, and ``min_bands`` trades recall
  against false positives.

Per-doc aggregation never runs per-group Python: each new band row
lives in exactly one partition, where it is marked hit / not-hit in one
vectorized merge; the per-doc fold hashes docs into bounded partitions
and runs one vectorized pandas groupby per partition (every doc has
exactly ``bands`` rows, so zero-hit docs survive).
"""

from __future__ import annotations

import glob as globmod
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .dedup import doc_minhash_batch
from .. import fs

_NO_MATCH = np.int64(2**62)


def _exact_hash_batch(batch: pa.Table) -> pa.Table:
    """Exact mode: one pseudo-band row per doc, ``band_hash`` = the
    text's md5 folded to a nonnegative int64 (the band machinery then
    gives exact-duplicate detection for free)."""
    import hashlib

    h = np.array(
        [
            int.from_bytes(
                hashlib.md5((t or "").encode("utf-8")).digest()[:8], "big"
            )
            >> 1
            for t in batch["text"].to_pylist()
        ],
        dtype=np.int64,
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "band_id": pa.array(
                np.zeros(batch.num_rows, np.int32), pa.int32()
            ),
            "band_hash": pa.array(h, pa.int64()),
        }
    )


def _band_rows(docs_ds, *, num_perm: int, bands: int, num_partitions: int,
               exact: bool = False):
    """docs -> (doc_id, band_id, band_hash, pid) rows, bucketed on the
    index's fixed partition key."""

    def add_pid(batch: pa.Table) -> pa.Table:
        key = pc.add(batch["band_hash"], batch["band_id"].cast(pa.int64()))
        pid = pc.subtract(
            key,
            pc.multiply(
                pc.divide(key, pa.scalar(num_partitions, pa.int64())),
                pa.scalar(num_partitions, pa.int64()),
            ),
        ).cast(pa.int32())
        return batch.append_column("pid", pid)

    hashed = docs_ds.select_columns(["doc_id", "text"])
    if exact:
        hashed = hashed.map_batches(_exact_hash_batch, batch_format="pyarrow")
    else:
        hashed = hashed.map_batches(
            doc_minhash_batch,
            fn_kwargs={"num_perm": num_perm, "bands": bands},
            batch_format="pyarrow",
        )
    return hashed.map_batches(add_pid, batch_format="pyarrow")


def _next_seq(index_dir: str) -> int:
    segs = globmod.glob(os.path.join(index_dir, "bands-*-*.parquet"))
    seqs = [int(os.path.basename(s).split("-")[2].split(".")[0]) for s in segs]
    return (max(seqs) + 1) if seqs else 0


def extend_minhash_index(
    docs_ds,
    index_dir: str,
    *,
    num_perm: int = 128,
    bands: int = 32,
    num_partitions: int = 64,
    mode: str = "minhash",
) -> pd.DataFrame:
    """Append the docs' band rows to the index as ONE new segment per
    touched partition (``bands-<pid>-<seq>.parquet``; existing files
    untouched). Also the bootstrap: extending an empty directory builds
    the index. Returns per-partition (pid, rows) accounting. The LSH
    knobs must match across every extend/dedup call on one index — they
    are recorded in ``index.json`` on first write and validated after."""
    index_dir = fs.local(index_dir)
    os.makedirs(index_dir, exist_ok=True)
    meta_path = os.path.join(index_dir, "index.json")
    import json

    if mode not in ("minhash", "exact"):
        raise ValueError(f"unknown mode {mode!r}")
    if mode == "exact":
        num_perm, bands = 1, 1  # one pseudo-band of md5 hashes
    meta = {
        "num_perm": num_perm,
        "bands": bands,
        "num_partitions": num_partitions,
        "mode": mode,
    }
    rows = _band_rows(
        docs_ds, num_perm=num_perm, bands=bands,
        num_partitions=num_partitions, exact=(mode == "exact"),
    )
    from ..state.append import StoreWriteLock

    # everything that reads-then-writes index state (meta validation,
    # seq assignment, segment writes) happens under the single-writer
    # lock — two concurrent extenders would otherwise both claim the
    # same seq after both passing validation
    with StoreWriteLock(index_dir):
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                old = json.load(f)
            if old != meta:
                raise ValueError(
                    f"index at {index_dir!r} was built with {old}, got {meta}"
                )
        else:
            with open(meta_path, "w") as f:
                json.dump(meta, f)
        seq = _next_seq(index_dir)

        def write_partition(part: pd.DataFrame) -> pd.DataFrame:
            pid = int(part["pid"].iloc[0])
            tbl = pa.Table.from_pandas(
                part[["doc_id", "band_id", "band_hash"]].sort_values(
                    ["band_hash", "band_id", "doc_id"], ignore_index=True
                ),
                preserve_index=False,
            )
            pq.write_table(
                tbl,
                os.path.join(index_dir, f"bands-{pid:05d}-{seq:06d}.parquet"),
            )
            return pd.DataFrame(
                {
                    "pid": pd.Series([pid], dtype="int64"),
                    "rows": pd.Series([len(part)], dtype="int64"),
                }
            )

        out = (
            rows.groupby("pid")
            .map_groups(write_partition, batch_format="pandas")
            .to_pandas()
        )
        if out.empty:  # empty ingest batch: nothing written
            return pd.DataFrame({"pid": pd.Series(dtype="int64"),
                                 "rows": pd.Series(dtype="int64")})
        return out.sort_values("pid", ignore_index=True)


def compact_index(index_dir: str) -> pd.DataFrame:
    """Merge each partition's append segments into one base segment (the
    ``compact_log`` / git-gc analog for the dedup index): per touched
    partition, concat + sort all ``bands-<pid>-*.parquet`` rows, publish
    atomically as the NEXT seq, then delete the inputs. Single-writer
    like every store write path — do not run concurrently with extend.
    Rows are an unordered set, so reads before and after are identical.
    Returns (pid, segments_merged, rows) accounting."""
    index_dir = fs.local(index_dir)
    _read_index_meta(index_dir)  # validates the index exists
    from ..state.append import StoreWriteLock

    with StoreWriteLock(index_dir):
        return _compact_index_locked(index_dir)


def _compact_index_locked(index_dir: str) -> pd.DataFrame:
    seq = _next_seq(index_dir)
    by_pid: dict[int, list] = {}
    for f in sorted(globmod.glob(os.path.join(index_dir, "bands-*-*.parquet"))):
        by_pid.setdefault(int(os.path.basename(f).split("-")[1]), []).append(f)
    out = []
    for pid, files in sorted(by_pid.items()):
        if len(files) < 2:
            continue
        t = pa.concat_tables([pq.read_table(f) for f in files])
        t = t.sort_by(
            [("band_hash", "ascending"), ("band_id", "ascending"),
             ("doc_id", "ascending")]
        )
        path = os.path.join(index_dir, f"bands-{pid:05d}-{seq:06d}.parquet")
        fs.put_table(t, path)
        for f in files:
            os.remove(f)
        out.append((pid, len(files), t.num_rows))
    return pd.DataFrame(
        out, columns=["pid", "segments_merged", "rows"]
    ).astype("int64")


def _read_index_meta(index_dir: str) -> dict:
    import json

    meta_path = os.path.join(index_dir, "index.json")
    if not os.path.exists(meta_path):
        raise FileNotFoundError(f"no index at {index_dir!r}")
    with open(meta_path) as f:
        return json.load(f)


def dedup_against_index(
    docs_ds,
    index_dir: str,
    *,
    min_bands: int = 1,
):
    """Flag each new document whose bands collide with the index in
    ``>= min_bands`` bands (an ``mode="exact"`` index has one md5
    pseudo-band, so collisions mean byte-identical text). Returns a
    Dataset of one row per input doc: ``(doc_id, n_hit_bands,
    matched_doc, is_dup)`` where ``matched_doc`` is the smallest
    colliding index doc id (-1 when not a duplicate). Batch-INTERNAL
    duplicates are deliberately not flagged — run the in-corpus
    operators (``dedup.minhash_dedup_clusters`` / ``exact_dedup``) on
    the batch first; this call checks new-vs-history only. Streaming end to
    end: index segments are read per-partition, new band rows meet them
    in one bounded-partition pass, and the per-doc fold is a vectorized
    pandas groupby inside bounded doc-hash partitions (docs and the
    index never co-materialize anywhere)."""
    index_dir = fs.local(index_dir)
    import ray.data as rd

    meta = _read_index_meta(index_dir)
    num_partitions = int(meta["num_partitions"])
    bands = int(meta["bands"])
    if not 1 <= min_bands <= bands:
        raise ValueError(f"min_bands must be in [1, {bands}]")

    new_rows = _band_rows(
        docs_ds,
        num_perm=int(meta["num_perm"]),
        bands=bands,
        num_partitions=num_partitions,
        exact=(meta.get("mode", "minhash") == "exact"),
    ).map_batches(
        lambda b: b.append_column(
            "origin", pa.array(np.ones(b.num_rows, np.int8))
        ),
        batch_format="pyarrow",
    )

    seg_files = sorted(
        globmod.glob(os.path.join(index_dir, "bands-*-*.parquet"))
    )

    def tag_index(batch: pa.Table) -> pa.Table:
        key = pc.add(batch["band_hash"], batch["band_id"].cast(pa.int64()))
        pid = pc.subtract(
            key,
            pc.multiply(
                pc.divide(key, pa.scalar(num_partitions, pa.int64())),
                pa.scalar(num_partitions, pa.int64()),
            ),
        ).cast(pa.int32())
        return batch.append_column("pid", pid).append_column(
            "origin", pa.array(np.zeros(batch.num_rows, np.int8))
        )

    if seg_files:
        index_rows = rd.read_parquet(seg_files).map_batches(
            tag_index, batch_format="pyarrow"
        )
        unioned = new_rows.union(index_rows)
    else:
        unioned = new_rows

    def match_partition(part: pd.DataFrame) -> pd.DataFrame:
        new = part[part["origin"] == 1]
        old = part[part["origin"] == 0]
        if not len(new):
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype="int64"),
                    "hit": pd.Series(dtype="int64"),
                    "matched_key": pd.Series(dtype="int64"),
                }
            )
        if len(old):
            best = (
                old.groupby(["band_id", "band_hash"], sort=False)["doc_id"]
                .min()
                .rename("matched_key")
            )
            out = new.merge(
                best, left_on=["band_id", "band_hash"], right_index=True,
                how="left",
            )
        else:
            out = new.copy()
            out["matched_key"] = np.nan
        hit = out["matched_key"].notna()
        return pd.DataFrame(
            {
                "doc_id": out["doc_id"].to_numpy("int64"),
                "hit": hit.to_numpy().astype("int64"),
                "matched_key": out["matched_key"]
                .fillna(float(_NO_MATCH))
                .to_numpy("int64"),
            }
        )

    # per-doc fold in bounded partitions: Ray's keyed aggregate pays
    # ~ms per distinct key (measured 10 s over 2k docs), so hash docs
    # into a fixed partition count and fold with one vectorized pandas
    # groupby per partition instead
    def add_dpid(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"]
        pid = pc.subtract(
            d,
            pc.multiply(
                pc.divide(d, pa.scalar(num_partitions, pa.int64())),
                pa.scalar(num_partitions, pa.int64()),
            ),
        ).cast(pa.int32())
        return batch.append_column("dpid", pid)

    def fold_docs(part: pd.DataFrame) -> pd.DataFrame:
        g = (
            part.groupby("doc_id", sort=False)
            .agg(
                n_hit_bands=("hit", "sum"),
                matched_min=("matched_key", "min"),
            )
            .reset_index()
        )
        return g.astype(
            {"doc_id": "int64", "n_hit_bands": "int64",
             "matched_min": "int64"}
        )

    per_doc = (
        unioned.groupby("pid")
        .map_groups(match_partition, batch_format="pandas")
        .map_batches(add_dpid, batch_format="pyarrow")
        .groupby("dpid")
        .map_groups(fold_docs, batch_format="pandas")
    )

    def finalize(batch: pa.Table) -> pa.Table:
        n = batch["n_hit_bands"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        m = batch["matched_min"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        dup = n >= min_bands
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_hit_bands": pa.array(n, pa.int64()),
                "matched_doc": pa.array(np.where(dup, m, -1), pa.int64()),
                "is_dup": pa.array(dup, pa.bool_()),
            }
        )

    return per_doc.map_batches(finalize, batch_format="pyarrow")
