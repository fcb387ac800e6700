"""Training-shard writer — the terminal stage of the LM data pipeline:
BPE-encode the corpus, concatenate the token-id stream in ``doc_id``
order, split it at fixed ``capacity`` boundaries (pack-and-cross, no
padding — the layout :mod:`.packing` assigns spans for), and write the
sequences as partitioned parquet shards of ``list<int32>`` token ids.

Scale shape (no stage ever holds the corpus in one place):

1. **Count pass** — streaming; each batch encodes only its DISTINCT
   words (per-worker memo over the broadcast merge table) and ships one
   ``(bucket, n)`` partial per bucket per batch. The keyed sum is
   bounded by the bucket count (``doc_id // bucket_span``), so the
   driver fold that turns bucket sums into exclusive bucket starts sees
   ~10^6 rows even at 10^12 docs; the starts dict is broadcast once.
2. **Emit pass** — docs are hash-partitioned by bucket (every doc of a
   bucket lands in one partition), so each partition re-derives its
   docs' within-bucket offsets locally (sort by doc_id + cumsum over
   encoded lengths) and adds the broadcast bucket start: global token
   offsets WITHOUT a corpus-scale join. Each doc then emits one
   ``(seq_id, pos, ids)`` segment row per training sequence it touches.
3. **Assemble pass** — segments shuffle once, keyed by a BALANCED
   contiguous shard range (``seq_id * num_shards // total_seqs``); each
   shard sorts its segments by ``(seq_id, pos)`` — disjoint token
   ranges, so the key is unique — flattens, and reshapes at ``capacity``
   boundaries (every sequence except the global last is exactly full).
   One parquet file per shard => a failed run resumes per shard.

The vocabulary is the corpus's own distinct BPE tokens ranked by
``(count DESC, token ASC)`` — deterministic, bounded by the merge count,
broadcast once.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from .. import fs

from .bpe import _PRETOK_RE, bpe_token_counts, encode_word


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — a BIJECTION on uint64, so distinct keys
    never collide and the sort below has no ties to break."""
    x = x.astype(np.uint64, copy=True)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def epoch_order(ds, *, key_col: str = "seq_id", epoch: int = 0,
                seed: int = 0, mode: str = "full"):
    """Deterministic per-epoch training order: every row gets the
    pseudorandom sort key ``splitmix64(key ^ mix(seed, epoch))`` — a
    pure function of ``(key, seed, epoch)``, so the order is identical
    across runs, cluster sizes and batch boundaries, and different for
    every epoch. ``mode="full"`` globally sorts on the key (ONE
    all-to-all — the cost of a true global shuffle, but reproducible);
    ``mode="blocks"`` only permutes block order and sorts within each
    block (zero extra network — the scale path when approximate mixing
    is enough for training). Caveats of ``"blocks"``: within-block
    order is content-deterministic, but the BLOCK permutation rides
    Ray's ``randomize_block_order``, whose emitted order varies with
    executor scheduling (measured) — only ``"full"`` guarantees a
    run-identical, blocking-invariant order. ``key_col`` values must be
    unique — equal keys map to equal sort keys and their relative order
    is then unspecified. Returns the Dataset with the original columns,
    reordered."""
    if mode not in ("full", "blocks"):
        raise ValueError(f"unknown mode {mode!r}")
    salt = _mix64(
        np.array([np.uint64(seed) ^ (np.uint64(epoch) << np.uint64(32))],
                 np.uint64)
    )[0]

    def add_key(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        eo = _mix64(k ^ salt).view(np.int64)
        return batch.append_column("_eo", pa.array(eo, pa.int64()))

    def drop_key(batch: pa.Table) -> pa.Table:
        return batch.drop_columns(["_eo"])

    def sort_within(batch: pa.Table) -> pa.Table:
        k = _mix64(
            batch[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
            ^ salt
        )
        return batch.take(pa.array(np.argsort(k), pa.int64()))

    if mode == "full":
        return (
            ds.map_batches(add_key, batch_format="pyarrow")
            .sort("_eo")
            .map_batches(drop_key, batch_format="pyarrow")
        )
    # batch_size=None = one whole block per call: the within-sort then
    # depends only on block contents, keeping the order run-identical
    # for a fixed input blocking (the mode is still only approximate
    # mixing — re-blocking the input changes it; use "full" for the
    # blocking-invariant order)
    return ds.randomize_block_order(seed=int(salt % np.uint64(2**31))).map_batches(
        sort_within, batch_format="pyarrow", batch_size=None
    )


def read_training_shards(shard_dir: str, *, epoch: int = 0, seed: int = 0,
                         mode: str = "full"):
    """Consume a shard directory written by :func:`write_training_shards`
    in the deterministic order of ``(epoch, seed)`` — the training-side
    reader. Streams: nothing is materialized beyond the epoch reorder."""
    import glob as globmod

    import ray.data as rd

    files = sorted(globmod.glob(os.path.join(shard_dir, "shard-*.parquet")))
    if not files:
        raise FileNotFoundError(f"no shard-*.parquet under {shard_dir}")
    return epoch_order(
        rd.read_parquet(files), key_col="seq_id", epoch=epoch, seed=seed,
        mode=mode,
    )


def build_vocab(docs_ds, merges: list, *, text_col: str = "text") -> pd.DataFrame:
    """Corpus vocabulary under the trained merges: one row per distinct
    token, ``token_id`` assigned by (count DESC, token ASC) rank."""
    counts = bpe_token_counts(docs_ds, merges, text_col=text_col).to_pandas()
    counts = counts.sort_values(
        ["n", "token"], ascending=[False, True], ignore_index=True
    )
    counts["token_id"] = np.arange(len(counts), dtype="int32")
    return counts


def write_training_shards(
    docs_ds_factory,
    out_dir: str,
    *,
    merges: list,
    vocab: pd.DataFrame,
    capacity: int = 1024,
    num_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_span: int = 4096,
    num_partitions: int = 64,
    resume: bool = False,
):
    """Write the packed token-id sequences of a corpus as parquet shards.

    ``docs_ds_factory`` is a zero-arg callable returning a fresh
    ``(doc_id, text)`` Dataset — the corpus is read twice (count pass,
    emit pass) and Datasets are single-consumer, so the caller hands us
    the recipe, not a Dataset. Returns a pandas DataFrame of per-shard
    stats ``(shard_id, n_seqs, n_tokens, first_seq, last_seq)`` plus the
    ``vocab_size``/``total_tokens`` attrs; the shards land at
    ``out_dir/shard-NNNNN.parquet`` with rows
    ``(seq_id, input_ids list<int32>, n_tok)``.

    Size ``num_shards`` so one shard (= ``total_tokens / num_shards``
    × 4 bytes, assembled in one task) stays ~1 GiB: at 100 TB of text
    (~25T tokens) that is ~100k shards.

    Shard files are published atomically (write to ``.tmp``, rename), so
    ``resume=True`` after a killed run skips every shard whose file
    already exists and recreates only the missing ones — the output is
    a pure function of the corpus, so surviving files are already
    correct.
    """
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    if num_shards <= 0:
        raise ValueError("num_shards must be positive")
    import ray
    from ray.data.aggregate import Sum

    os.makedirs(out_dir, exist_ok=True)
    ranks_ref = ray.put({p: i for i, p in enumerate(merges)})
    tok2id_ref = ray.put(
        dict(zip(vocab["token"].tolist(), vocab["token_id"].tolist()))
    )
    worker_state: dict = {}

    def _ids_state():
        """(tok2id, word -> np.int32[] memo), one per worker process."""
        key = id(ranks_ref)
        if key not in worker_state:
            worker_state.clear()
            worker_state[key] = (
                ray.get(ranks_ref),
                ray.get(tok2id_ref),
                {},
            )
        return worker_state[key]

    def _encode_ids(word: str) -> np.ndarray:
        ranks, tok2id, memo = _ids_state()
        ids = memo.get(word)
        if ids is None:
            ids = np.array(
                [tok2id[t] for t in encode_word(word, ranks)], dtype=np.int32
            )
            memo[word] = ids
        return ids

    # ---- pass 1: bounded (bucket, n) sums -> exclusive bucket starts
    def bucket_partials(batch: pa.Table) -> pa.Table:
        _ids_state()
        s = batch[text_col].to_pandas().fillna("")
        words = s.str.findall(_PRETOK_RE)
        lens = words.map(
            lambda ws: int(sum(len(_encode_ids(w)) for w in ws))
        ).to_numpy("int64")
        buckets = (
            batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            // bucket_span
        )
        sums = pd.Series(lens).groupby(buckets).sum()
        return pa.table(
            {
                "bucket": pa.array(sums.index.to_numpy("int64"), pa.int64()),
                "n": pa.array(sums.to_numpy("int64"), pa.int64()),
            }
        )

    bucket_rows = (
        docs_ds_factory()
        .map_batches(bucket_partials, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    starts: dict = {}
    acc = 0
    for r in sorted(bucket_rows, key=lambda r: r["bucket"]):
        starts[r["bucket"]] = acc
        acc += r["n"]
    total_tokens = acc
    if total_tokens == 0:
        raise ValueError("corpus has no tokens to shard")
    total_seqs = (total_tokens + capacity - 1) // capacity
    starts_ref = ray.put(starts)

    # ---- pass 2: emit (seq_id, pos, ids) segments, offsets derived
    # in-partition (a bucket's docs are co-located by construction)
    def emit_segments(part: pd.DataFrame) -> pd.DataFrame:
        bucket_start = ray.get(starts_ref)
        part = part.sort_values([id_col], ignore_index=True)
        docs_words = part[text_col].fillna("").str.findall(_PRETOK_RE)
        doc_ids = [
            np.concatenate([_encode_ids(w) for w in ws])
            if ws
            else np.empty(0, np.int32)
            for ws in docs_words
        ]
        lens = np.array([len(a) for a in doc_ids], dtype=np.int64)
        buckets = part[id_col].to_numpy().astype(np.int64) // bucket_span
        within = (
            pd.Series(lens).groupby(buckets).cumsum().to_numpy("int64") - lens
        )
        off = (
            pd.Series(buckets).map(bucket_start).to_numpy("int64") + within
        )
        seq_ids, poss, segs = [], [], []
        for ids, o in zip(doc_ids, off):
            if not len(ids):
                continue
            lo = 0
            while lo < len(ids):
                seq = (o + lo) // capacity
                hi = min(len(ids), (seq + 1) * capacity - o)
                seq_ids.append(seq)
                poss.append(o + lo)
                segs.append(ids[lo:hi])
                lo = hi
        shard = (
            np.array(seq_ids, np.int64) * num_shards // total_seqs
            if seq_ids
            else np.empty(0, np.int64)
        )
        return pd.DataFrame(
            {
                "seq_id": pd.Series(seq_ids, dtype="int64"),
                "pos": pd.Series(poss, dtype="int64"),
                "ids": segs,
                "shard": shard,
            }
        )

    def add_pid(batch: pa.Table) -> pa.Table:
        b = (
            batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            // bucket_span
        )
        return batch.append_column(
            "seg_pid", pa.array((b % num_partitions).astype(np.int32))
        )

    segments = (
        docs_ds_factory()
        .map_batches(add_pid, batch_format="pyarrow")
        .groupby("seg_pid")
        .map_groups(emit_segments, batch_format="pandas")
    )

    # ---- pass 3: assemble + write one parquet file per shard
    def assemble_shard(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values(["seq_id", "pos"], ignore_index=True)
        shard = int(part["shard"].iloc[0])
        flat = np.concatenate([np.asarray(a, np.int32) for a in part["ids"]])
        lo_seq = int(part["seq_id"].min())
        hi_seq = int(part["seq_id"].max())
        n_seqs = hi_seq - lo_seq + 1
        lens = np.full(n_seqs, capacity, np.int64)
        if hi_seq == total_seqs - 1:
            lens[-1] = total_tokens - (total_seqs - 1) * capacity
        if int(lens.sum()) != len(flat):
            raise AssertionError(
                f"shard {shard}: {len(flat)} tokens != expected {lens.sum()}"
            )
        path = os.path.join(out_dir, f"shard-{shard:05d}.parquet")
        if not (resume and os.path.exists(path)):
            bounds = np.cumsum(lens)[:-1]
            seq_arrays = np.split(flat, bounds)
            tbl = pa.table(
                {
                    "seq_id": pa.array(
                        np.arange(lo_seq, hi_seq + 1, dtype=np.int64)
                    ),
                    "input_ids": pa.array(
                        [a.tolist() for a in seq_arrays],
                        pa.list_(pa.int32()),
                    ),
                    "n_tok": pa.array(lens, pa.int64()),
                }
            )
            # atomic publish: a killed run never leaves a partial shard,
            # so resume=True can trust any file that exists
            fs.put_table(tbl, path)
        return pd.DataFrame(
            {
                "shard_id": pd.Series([shard], dtype="int64"),
                "n_seqs": pd.Series([n_seqs], dtype="int64"),
                "n_tokens": pd.Series([int(lens.sum())], dtype="int64"),
                "first_seq": pd.Series([lo_seq], dtype="int64"),
                "last_seq": pd.Series([hi_seq], dtype="int64"),
            }
        )

    stats = (
        segments.groupby("shard")
        .map_groups(assemble_shard, batch_format="pandas")
        .to_pandas()
        .sort_values("shard_id", ignore_index=True)
    )
    stats.attrs["vocab_size"] = int(len(vocab))
    stats.attrs["total_tokens"] = int(total_tokens)
    stats.attrs["total_seqs"] = int(total_seqs)
    return stats
