"""Deterministic text embeddings via the hashing trick.

Feature hashing (Weinberger et al. 2009, "Feature Hashing for Large
Scale Multitask Learning"): token ``t`` adds ``sign(h(t))`` at index
``h(t) % dim``; rows are L2-normalized. Vocabulary-free and stateless,
so the embedder needs no model artifact, broadcasts nothing, and two
corpora embed identically on any cluster size — the right baseline for
an embedding column when no learned model is available (and the test
substrate for the ANN operators: real models slot into the same
``map_batches`` signature).

Fully vectorized per batch: whitespace tokenization through Arrow's
``utf8_split_whitespace`` (list offsets → token→row mapping via
``np.repeat``), one NUL-safe stable hash over the flattened token
array, and a single ``np.add.at`` scatter into the (rows × dim)
matrix. No per-token Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def hash_embed_batch(batch: pa.Table, *, dim: int = 64,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> pa.Table:
    """(id, embedding list<float64>) rows; all-empty texts embed as the
    zero vector (norm guard keeps it finite)."""
    from ..shuffle_utils import stable_hash_array

    n = batch.num_rows
    # null text embeds like the empty string (zero vector) — a null list
    # would otherwise NaN-poison list_value_length → np.repeat
    toks = pc.utf8_split_whitespace(pc.utf8_lower(
        pc.fill_null(pc.cast(batch[text_col], pa.string()), "")))
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    lengths = pc.list_value_length(toks).to_numpy(
        zero_copy_only=False).astype(np.int64)
    flat = toks.flatten()
    M = np.zeros((n, dim), dtype=np.float64)
    if len(flat):
        row = np.repeat(np.arange(n, dtype=np.int64), lengths)
        # Arrow's split emits empty tokens for leading/trailing/repeated
        # whitespace (and for the empty string) — drop them
        keep = pc.greater(pc.utf8_length(flat), 0).to_numpy(
            zero_copy_only=False)
        if keep.any():
            h = stable_hash_array(flat.filter(pa.array(keep)))
            idx = (h % np.uint64(dim)).astype(np.int64)
            sign = 1.0 - 2.0 * ((h >> np.uint64(32))
                                & np.uint64(1)).astype(np.float64)
            np.add.at(M, (row[keep], idx), sign)
    norms = np.linalg.norm(M, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    M /= norms
    return pa.table({
        "vec_id": batch[id_col],
        "embedding": pa.array(list(M), pa.list_(pa.float64())),
    })


def hash_embed(ds, *, dim: int = 64, id_col: str = "doc_id",
               text_col: str = "text"):
    """Dataset form: streaming, no shuffle, no broadcast state."""

    def embed_batch(batch: pa.Table) -> pa.Table:
        return hash_embed_batch(batch, dim=dim, id_col=id_col,
                                text_col=text_col)

    return ds.map_batches(embed_batch, batch_format="pyarrow")
