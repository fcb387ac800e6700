"""Persisted inverted text index — keyword search with file-level
pruning, the lexical sibling of the IVF ANN index (`annindex.py`).

A full-corpus scan per keyword query is the `decontaminate`-entry
shape; at 100 TB a search index must read only the postings of the
query's terms. Layout (the repo's log-structured store pattern):

- ``index.json`` — knobs pinned at build time (partition count,
  lowercasing); extend/query calls validate against it,
- ``post-<pid>-<seq>.parquet`` — posting segments, rows
  ``(token, doc_id, tf)`` with ``pid = stable_hash(token) % P``;
  existing segments are never rewritten, readers glob, a query opens
  ONLY the pids its terms hash to (at P=64 and a 2-term query, ~3% of
  the index bytes leave storage — pruning decided on the driver before
  any Ray task is scheduled).

Term frequencies are per-document integers, so query results
hash-stably match a SQL oracle. Document-length tables (for BM25) are
derivable downstream from `doc_stats`; the index stores postings only.
"""

from __future__ import annotations

import glob as globmod
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

TOKEN_PATTERN = r"\S+"


def _load_meta(index_dir: str) -> dict:
    meta_path = os.path.join(index_dir, "index.json")
    if not os.path.exists(meta_path):
        raise FileNotFoundError(f"no text index at {index_dir!r}")
    with open(meta_path) as f:
        return json.load(f)


def _next_seq(index_dir: str) -> int:
    segs = globmod.glob(os.path.join(index_dir, "post-*-*.parquet"))
    seqs = [int(os.path.basename(s).split("-")[2].split(".")[0])
            for s in segs]
    return (max(seqs) + 1) if seqs else 0


def _term_pids(terms, num_partitions: int) -> dict:
    from ..shuffle_utils import stable_hash_array

    h = stable_hash_array(np.array(sorted(terms), dtype=object))
    return dict(zip(sorted(terms),
                    (h % np.uint64(num_partitions)).astype(int)))


def extend_text_index(docs_ds, index_dir: str, *,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> pd.DataFrame:
    """Tokenize the batch stream and append ONE posting segment per
    touched partition (existing bytes untouched; all-or-nothing under
    the single-writer lock). A document must arrive whole in one row —
    per-batch term frequencies are then exact, so the shuffle carries
    one (token, doc, tf) row per distinct pair, never token streams.
    Returns per-partition (pid, rows) accounting."""
    from ..shuffle_utils import add_partition_id
    from ..state.append import StoreWriteLock

    meta = _load_meta(index_dir)
    P = int(meta["num_partitions"])
    lower = bool(meta["lowercase"])

    def postings(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        if lower:
            text = pc.utf8_lower(text)
        toks_list = pc.split_pattern_regex(
            text.combine_chunks(), pattern=r"\s+"
        )
        flat = pc.list_flatten(toks_list)
        parent = pc.list_parent_indices(toks_list)
        ids = pc.take(
            batch[id_col].combine_chunks().cast(pa.int64()), parent
        )
        keep = pc.not_equal(flat, "")
        keyed = pc.binary_join_element_wise(
            pc.cast(ids.filter(keep), pa.string()),
            flat.filter(keep), "\x1f",
        )
        vc = pc.value_counts(keyed)
        split = pc.split_pattern(vc.field("values"), "\x1f", max_splits=1)
        out = pa.table(
            {
                "token": pc.list_element(split, 1),
                "doc_id": pc.cast(
                    pc.list_element(split, 0), pa.int64()
                ),
                "tf": vc.field("counts").cast(pa.int64()),
            }
        )
        return add_partition_id(out, key="token", num_partitions=P,
                                col="pid")

    def write_partition(part: pd.DataFrame) -> pd.DataFrame:
        pid = int(part["pid"].iloc[0])
        part = part.sort_values(["token", "doc_id"], ignore_index=True)
        tbl = pa.table(
            {
                "token": pa.array(part["token"].to_numpy(object),
                                  pa.string()),
                "doc_id": pa.array(part["doc_id"].to_numpy("int64"),
                                   pa.int64()),
                "tf": pa.array(part["tf"].to_numpy("int64"), pa.int64()),
            }
        )
        path = os.path.join(index_dir,
                            f"post-{pid:05d}-{seq:06d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)
        return pd.DataFrame({"pid": pd.Series([pid], dtype="int64"),
                             "rows": pd.Series([len(part)],
                                               dtype="int64")})

    # pid cardinality is bounded (= P) so per-pid map_groups is safe;
    # seq claimed inside the lock (cells are late-bound — cloudpickle
    # snapshots at execution)
    with StoreWriteLock(index_dir):
        seq = _next_seq(index_dir)
        out = (
            docs_ds.select_columns([id_col, text_col])
            .map_batches(postings, batch_format="pyarrow")
            .groupby("pid")
            .map_groups(write_partition, batch_format="pandas")
            .to_pandas()
        )
        if out.empty:
            return pd.DataFrame({"pid": pd.Series(dtype="int64"),
                                 "rows": pd.Series(dtype="int64")})
        return out.sort_values("pid", ignore_index=True)


def build_text_index(docs_ds, index_dir: str, *,
                     num_partitions: int = 64, lowercase: bool = True,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> pd.DataFrame:
    """Create the index layout and ingest the corpus as the first
    extension batch. Refuses to overwrite an existing index."""
    if os.path.exists(os.path.join(index_dir, "index.json")):
        raise ValueError(f"index already exists at {index_dir!r}")
    os.makedirs(index_dir, exist_ok=True)
    with open(os.path.join(index_dir, "index.json"), "w") as f:
        json.dump({"num_partitions": int(num_partitions),
                   "lowercase": bool(lowercase),
                   "token_pattern": TOKEN_PATTERN}, f)
    return extend_text_index(docs_ds, index_dir, id_col=id_col,
                             text_col=text_col)


def compact_text_index(index_dir: str) -> pd.DataFrame:
    """Merge each partition's append segments into one base segment,
    summing duplicate (token, doc_id) rows across segments (a document
    re-ingested by a later extension contributes one combined tf).
    Single-writer; returns (pid, segments_merged, rows) accounting."""
    from ..state.append import StoreWriteLock

    _load_meta(index_dir)
    with StoreWriteLock(index_dir):
        seq = _next_seq(index_dir)
        by_pid: dict[int, list] = {}
        for f in sorted(
            globmod.glob(os.path.join(index_dir, "post-*-*.parquet"))
        ):
            by_pid.setdefault(
                int(os.path.basename(f).split("-")[1]), []
            ).append(f)
        out = []
        for pid, files in sorted(by_pid.items()):
            if len(files) < 2:
                continue
            t = pa.concat_tables([pq.read_table(f) for f in files])
            df = (
                t.to_pandas()
                .groupby(["token", "doc_id"], sort=True)["tf"].sum()
                .reset_index()
            )
            tbl = pa.table({
                "token": pa.array(df["token"].to_numpy(object),
                                  pa.string()),
                "doc_id": pa.array(df["doc_id"].to_numpy("int64"),
                                   pa.int64()),
                "tf": pa.array(df["tf"].to_numpy("int64"), pa.int64()),
            })
            path = os.path.join(index_dir,
                                f"post-{pid:05d}-{seq:06d}.parquet")
            tmp = path + ".tmp"
            pq.write_table(tbl, tmp)
            os.replace(tmp, path)
            for f in files:
                os.remove(f)
            out.append((pid, len(files), tbl.num_rows))
        return pd.DataFrame(
            out, columns=["pid", "segments_merged", "rows"]
        ).astype("int64")


def query_text_index(index_dir: str, terms, *, mode: str = "and"):
    """Documents matching the query terms, reading ONLY the partitions
    the terms hash to (file-level pruning, decided on the driver).
    Returns an Arrow table ``(doc_id, n_matched, total_tf)`` — matched
    distinct terms and their summed frequencies, integers only —
    sorted by doc_id; ``mode="and"`` keeps docs matching every term,
    ``"or"`` any."""
    if mode not in ("and", "or"):
        raise ValueError(f"unknown mode {mode!r}")
    meta = _load_meta(index_dir)
    P = int(meta["num_partitions"])
    terms = sorted({t.lower() if meta["lowercase"] else t
                    for t in terms})
    if not terms:
        raise ValueError("query needs at least one term")
    pids = sorted(set(_term_pids(terms, P).values()))
    files = [
        f
        for pid in pids
        for f in sorted(globmod.glob(
            os.path.join(index_dir, f"post-{pid:05d}-*.parquet")
        ))
    ]
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "n_matched": pa.array([], pa.int64()),
                      "total_tf": pa.array([], pa.int64())})
    if not files:
        return empty
    import ray.data as rd
    from ray.data.aggregate import Sum

    tset = pa.array(terms)

    def match(batch: pa.Table) -> pa.Table:
        hit = batch.filter(pc.is_in(batch["token"], value_set=tset))
        df = hit.to_pandas().groupby(
            ["doc_id", "token"], sort=False
        )["tf"].sum().reset_index()
        return pa.table({
            "doc_id": pa.array(df["doc_id"].to_numpy("int64"),
                               pa.int64()),
            "token": pa.array(df["token"].to_numpy(object), pa.string()),
            "tf": pa.array(df["tf"].to_numpy("int64"), pa.int64()),
        })

    # fold per (doc, token) FIRST: before compaction a pair's postings
    # can span segments, and a per-doc term count summed straight off
    # the batches would count such a term twice
    pairs = (
        rd.read_parquet(files)
        .map_batches(match, batch_format="pyarrow")
        .groupby(["doc_id", "token"])
        .aggregate(Sum("tf", alias_name="tf"))
    )
    agg = (
        pairs.map_batches(
            lambda b: pa.table({
                "doc_id": b["doc_id"],
                "n_matched": pa.array(
                    np.ones(b.num_rows, np.int64)
                ),
                "total_tf": b["tf"],
            }),
            batch_format="pyarrow",
        )
        .groupby("doc_id")
        .aggregate(Sum("n_matched", alias_name="n_matched"),
                   Sum("total_tf", alias_name="total_tf"))
    )
    if mode == "and":
        need = len(terms)
        agg = agg.map_batches(
            lambda b, _n=need: b.filter(
                pc.greater_equal(b["n_matched"], _n)
            ),
            batch_format="pyarrow",
        )
    out = agg.sort("doc_id").to_pandas()
    if not len(out):
        return empty
    return pa.table({
        "doc_id": pa.array(out["doc_id"].to_numpy("int64"), pa.int64()),
        "n_matched": pa.array(out["n_matched"].to_numpy("int64"),
                              pa.int64()),
        "total_tf": pa.array(out["total_tf"].to_numpy("int64"),
                             pa.int64()),
    })
