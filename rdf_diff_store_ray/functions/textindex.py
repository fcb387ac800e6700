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
hash-stably match a SQL oracle. Each ingest also lands a
``doclen-<seq>/`` doc-length segment and a ``stats-<seq>.json``
(n_docs, total_tokens) aggregate, which power ``score="bm25"``
ranking: exact df from the pruned postings, N/avgdl from the stats
files, matched docs' lengths from a filtered doc-length scan.
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
from .. import fs

from ..shuffle_utils import sort_values_nul_safe

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
    index_dir = fs.local(index_dir)
    from ..shuffle_utils import add_partition_id
    from ..state.append import StoreWriteLock

    meta = _load_meta(index_dir)
    P = int(meta["num_partitions"])
    lower = bool(meta["lowercase"])

    def postings(batch: pa.Table) -> pa.Table:
        # NUL bytes normalize to spaces BEFORE tokenizing: pandas
        # folds inside the query path hash object keys through a
        # C-string table that truncates at \x00, so NUL-bearing
        # tokens could collapse — normalizing keeps postings and
        # doc lengths consistent with each other
        text = pc.replace_substring(batch[text_col], "\x00", " ")
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
        part = sort_values_nul_safe(part, ["token", "doc_id"],
                                    ignore_index=True)
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
        fs.put_table(tbl, path)
        return pd.DataFrame({"pid": pd.Series([pid], dtype="int64"),
                             "rows": pd.Series([len(part)],
                                               dtype="int64")})

    def doclens(batch: pa.Table) -> pa.Table:
        text = pc.replace_substring(batch[text_col], "\x00", " ")
        return pa.table({
            "doc_id": batch[id_col].cast(pa.int64()),
            "dl": pc.count_substring_regex(
                text, meta.get("token_pattern", TOKEN_PATTERN)
            ).cast(pa.int64()),
        })

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
        # doc-length segment + per-ingest corpus stats (the BM25 side
        # of the index): a second cheap streaming pass (regex COUNT
        # kernel, no explode). Extension assumes NEW documents — a
        # re-ingested doc merges its postings but double-counts in
        # N/avgdl (the standard incremental-index contract; rebuild to
        # re-baseline).
        dl_ds = docs_ds.select_columns([id_col, text_col]).map_batches(
            doclens, batch_format="pyarrow"
        )
        dl_dir = os.path.join(index_dir, f"doclen-{seq:06d}")
        dl_ds.write_parquet(dl_dir)
        n_docs = 0
        total = 0
        for f in globmod.glob(os.path.join(dl_dir, "*.parquet")):
            t = pq.read_table(f, columns=["dl"])
            n_docs += t.num_rows
            total += int(pc.sum(t["dl"]).as_py() or 0)
        with open(os.path.join(index_dir, f"stats-{seq:06d}.json"),
                  "w") as f:
            json.dump({"n_docs": n_docs, "total_tokens": total}, f)
        return out.sort_values("pid", ignore_index=True)


def build_text_index(docs_ds, index_dir: str, *,
                     num_partitions: int = 64, lowercase: bool = True,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> pd.DataFrame:
    """Create the index layout and ingest the corpus as the first
    extension batch. Refuses to overwrite an existing index."""
    index_dir = fs.local(index_dir)
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
    index_dir = fs.local(index_dir)
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
            fs.put_table(tbl, path)
            for f in files:
                os.remove(f)
            out.append((pid, len(files), tbl.num_rows))
        return pd.DataFrame(
            out, columns=["pid", "segments_merged", "rows"]
        ).astype("int64")


def query_text_index(index_dir: str, terms, *, mode: str = "and",
                     score: str | None = None,
                     limit: int | None = None):
    """Documents matching the query terms, reading ONLY the partitions
    the terms hash to (file-level pruning, decided on the driver).
    Returns an Arrow table ``(doc_id, n_matched, total_tf)`` — matched
    distinct terms and their summed frequencies, integers only —
    sorted by doc_id; ``mode="and"`` keeps docs matching every term,
    ``"or"`` any.

    ``score="bm25"`` additionally ranks: Okapi BM25 (Robertson et al.,
    k1=1.2, b=0.75, idf floored at 0 via the ln(1+x) form) over exact
    df from the pruned postings, corpus N/avgdl from the per-ingest
    stats files, and matched docs' lengths from a column-pruned
    doc-length scan filtered by the (bounded) matched-id set. Scores
    are emitted as ``score_micro`` = round(score × 1e6) int64 so
    results stay hash-stable; rows sort by (-score_micro, doc_id) and
    ``limit`` bounds them."""
    index_dir = fs.local(index_dir)
    if mode not in ("and", "or"):
        raise ValueError(f"unknown mode {mode!r}")
    if score not in (None, "bm25"):
        raise ValueError(f"unknown score {score!r}")
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
    if score == "bm25":
        return _bm25_rank(index_dir, pairs, terms, mode=mode,
                          limit=limit, empty=empty)
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


def _bm25_rank(index_dir: str, pairs, terms, *, mode: str,
               limit: int | None, empty: pa.Table):
    """Driver-side BM25 over the (bounded) matched-pair frame: exact
    per-term df from the pruned postings, N/avgdl summed from the
    per-ingest stats files, matched docs' lengths via an in-stream
    filtered scan of the doc-length segments (the scan is column-
    pruned two-int64 rows; only matched rows ever reach the driver)."""
    import ray
    import ray.data as rd

    pdf = pairs.to_pandas()
    out_schema = pa.schema([
        ("doc_id", pa.int64()), ("n_matched", pa.int64()),
        ("total_tf", pa.int64()), ("score_micro", pa.int64()),
    ])
    if not len(pdf):
        return empty.cast(pa.schema([
            ("doc_id", pa.int64()), ("n_matched", pa.int64()),
            ("total_tf", pa.int64()),
        ])).append_column("score_micro", pa.array([], pa.int64()))
    # df per term over EVERY doc containing it — computed before any
    # AND filtering (document frequency is a corpus property, not a
    # result-set one)
    df_per_term = pdf.groupby("token")["doc_id"].nunique()
    per_doc = pdf.groupby("doc_id", sort=True).agg(
        n_matched=("token", "nunique"), total_tf=("tf", "sum")
    ).reset_index()
    if mode == "and":
        keep = per_doc[per_doc["n_matched"] == len(terms)]
    else:
        keep = per_doc
    if not len(keep):
        return pa.table({n: pa.array([], t)
                         for n, t in zip(out_schema.names,
                                         out_schema.types)})
    kept_ids = set(keep["doc_id"].tolist())
    pdf = pdf[pdf["doc_id"].isin(kept_ids)]

    # corpus stats: O(#ingests) tiny json reads
    n_docs = 0
    total_tokens = 0
    for f in sorted(globmod.glob(os.path.join(index_dir,
                                              "stats-*.json"))):
        with open(f) as fh:
            st = json.load(fh)
        n_docs += int(st["n_docs"])
        total_tokens += int(st["total_tokens"])
    if n_docs == 0:
        raise ValueError(
            "index has no doc-length stats (built before BM25 support?) "
            "— rebuild or re-extend to enable scoring"
        )
    avgdl = total_tokens / n_docs

    # matched docs' lengths: filtered streaming scan, never the corpus
    dl_files = sorted(globmod.glob(os.path.join(
        index_dir, "doclen-*", "*.parquet"
    )))
    ids_arr = np.sort(np.fromiter(kept_ids, np.int64, len(kept_ids)))
    ids_ref = ray.put(ids_arr)

    def pick(batch: pa.Table) -> pa.Table:
        ids = ray.get(ids_ref)
        d = batch["doc_id"].to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(ids, d), 0, len(ids) - 1)
        return batch.filter(pa.array(ids[pos] == d))

    dl_df = (
        rd.read_parquet(dl_files)
        .map_batches(pick, batch_format="pyarrow")
        .to_pandas()
        .groupby("doc_id", sort=True)["dl"].sum()  # re-ingest: summed
    )

    # BM25 (k1=1.2, b=0.75), idf = ln(1 + (N - df + 0.5)/(df + 0.5))
    k1, b = 1.2, 0.75
    pdf = sort_values_nul_safe(pdf, ["doc_id", "token"],
                               ignore_index=True)
    tf = pdf["tf"].to_numpy("float64")
    dfv = df_per_term.loc[pdf["token"]].to_numpy("float64")
    dl = dl_df.reindex(pdf["doc_id"]).to_numpy("float64")
    if np.isnan(dl).any():
        raise ValueError("doc-length segment missing matched docs — "
                         "index is inconsistent")
    idf = np.log1p((n_docs - dfv + 0.5) / (dfv + 0.5))
    part = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    scores = pd.Series(part).groupby(
        pdf["doc_id"].to_numpy("int64")
    ).sum()
    out = keep.set_index("doc_id")
    out["score_micro"] = np.round(
        scores.reindex(out.index) * 1e6
    ).astype("int64")
    out = out.reset_index().sort_values(
        ["score_micro", "doc_id"], ascending=[False, True],
        ignore_index=True,
    )
    if limit is not None:
        out = out.head(limit)
    return pa.table({
        "doc_id": pa.array(out["doc_id"].to_numpy("int64"), pa.int64()),
        "n_matched": pa.array(out["n_matched"].to_numpy("int64"),
                              pa.int64()),
        "total_tf": pa.array(out["total_tf"].to_numpy("int64"),
                             pa.int64()),
        "score_micro": pa.array(out["score_micro"].to_numpy("int64"),
                                pa.int64()),
    })
