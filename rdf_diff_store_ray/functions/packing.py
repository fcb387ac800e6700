"""Training-sequence packing — concatenate the token stream in document
order and split it at fixed capacity boundaries (the GPT-style
pack-and-cross layout used for LM pretraining batches; documents may
span sequence boundaries, no padding is ever emitted).

The global token offset of every document is a distributed prefix sum,
computed the classic two-level way:

1. one streaming pass counts tokens per document (vectorized regex,
   nothing leaves the workers but ``(doc_id, n, bucket)`` rows),
2. per-bucket token sums (``bucket = doc_id // bucket_span``) are a
   small keyed aggregate; the driver folds the BOUNDED bucket table
   into exclusive bucket offsets and broadcasts it once (``ray.put``),
3. a second pass resolves each document's exact offset inside its
   bucket with a vectorized within-bucket cumulative sum (buckets are
   hashed into ``num_partitions`` bounded partitions; pandas
   ``groupby().cumsum`` is a C kernel, no per-group Python), then
   explodes each document into one row per training sequence it
   touches (``np.repeat`` — most documents emit exactly one row).

Size ``bucket_span`` so the driver's bucket table stays small (at
10^12 docs and span 2^20 it is ~10^6 rows); a third prefix level would
bound it further but is unnecessary below that scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..shuffle_utils import sort_values_nul_safe

_TOKEN_RE = r"\S+"


def pack_sequences(
    docs_ds,
    capacity: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_span: int = 4096,
    num_partitions: int = 64,
):
    """Assign every document its training-sequence spans.

    Returns a Dataset of ``(doc_id, seq_id, n_tok)`` — one row per
    sequence the document's tokens land in, where ``seq_id`` is the
     0-based index of the fixed-``capacity`` sequence in the packed
    stream ordered by ``doc_id``. Empty documents pack nothing and are
    absent. Deterministic: depends only on ids, texts and ``capacity``.
    """
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    import ray
    from ray.data.aggregate import Sum

    def count_tokens(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(
            batch[text_col].cast(pa.string()), _TOKEN_RE
        ).cast(pa.int64())
        ids = batch[id_col]
        out = pa.table(
            {
                "doc_id": ids,
                "n": n,
                "bucket": pc.divide(ids.cast(pa.int64()), bucket_span),
            }
        )
        return out.filter(pc.greater(out["n"], 0))

    # One tokenizing pass over the corpus, pinned in the object store:
    # both consumers below (the bucket aggregate and the spans pass) read
    # the materialized (doc_id, n, bucket) table instead of re-reading and
    # re-tokenizing the documents. At ~24 bytes/doc it is ~0.002% of a web
    # corpus's bytes, so it fits cluster memory (with spill) at any scale
    # where the corpus itself is readable.
    counts = docs_ds.map_batches(count_tokens, batch_format="pyarrow").materialize()

    # level 2: bounded bucket table -> exclusive offsets, broadcast once
    bucket_rows = counts.groupby("bucket").aggregate(Sum("n", alias_name="n")).take_all()
    buckets = sorted(r["bucket"] for r in bucket_rows)
    sums = {r["bucket"]: r["n"] for r in bucket_rows}
    starts = {}
    acc = 0
    for b in buckets:
        starts[b] = acc
        acc += sums[b]
    starts_ref = ray.put(starts)

    def spans_partition(part: pd.DataFrame) -> pd.DataFrame:
        bucket_start = ray.get(starts_ref)
        part = sort_values_nul_safe(part, ["bucket", "doc_id"],
                                    ignore_index=True)
        n = part["n"].to_numpy(np.int64)
        within = part.groupby("bucket")["n"].cumsum().to_numpy(np.int64) - n
        off = part["bucket"].map(bucket_start).to_numpy(np.int64) + within
        first = off // capacity
        last = (off + n - 1) // capacity
        reps = (last - first + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(part)), reps)
        # sequence index within each doc's span run: 0..reps-1
        run = np.arange(reps.sum()) - np.repeat(
            np.cumsum(np.r_[0, reps[:-1]]), reps
        )
        seq = first[idx] + run
        lo = np.maximum(off[idx], seq * capacity)
        hi = np.minimum(off[idx] + n[idx], (seq + 1) * capacity)
        return pd.DataFrame(
            {
                "doc_id": part["doc_id"].to_numpy()[idx],
                "seq_id": seq.astype(np.int64),
                "n_tok": (hi - lo).astype(np.int64),
            }
        )

    def add_pid(batch: pa.Table) -> pa.Table:
        b = batch["bucket"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "pack_pid", pa.array((b % num_partitions).astype(np.int32))
        )

    return (
        counts.map_batches(add_pid, batch_format="pyarrow")
        .groupby("pack_pid")
        .map_groups(spans_partition, batch_format="pandas")
    )
