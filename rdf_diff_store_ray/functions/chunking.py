"""Document chunking: overlapping fixed-size character windows.

The RAG/context-window preparation step of a training-data pipeline —
split each document into chunks of ``size`` characters starting every
``stride`` characters (``stride < size`` = overlap), keeping
``(doc_id, chunk_id, off)`` provenance so chunks join back to their
source. Runs inside ``map_batches``; per-doc chunk counts derive
vectorized (numpy), and the only per-chunk work is the C-speed string
slice that materializes the chunk text (output-sized, like any
explode). Empty documents produce no chunks.

Character (code-point) semantics match SQL ``substr`` on VARCHAR, so
the operator has an exact DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def chunk_documents_batch(batch: pa.Table, *, size: int = 200,
                          stride: int = 150, id_col: str = "doc_id",
                          text_col: str = "text") -> pa.Table:
    """One input row → ``ceil(n_chars / stride)`` chunk rows (0 for
    empty text). Chunk ``i`` covers ``text[i*stride : i*stride+size]``;
    the tail chunk may be shorter than ``size``."""
    if size < 1 or stride < 1:
        raise ValueError("size and stride must be >= 1")
    # null text behaves like the empty string (0 chunks) — a null
    # utf8_length would otherwise become NaN and poison the int cast
    col = pc.fill_null(pc.cast(batch[text_col], pa.string()), "")
    texts = col.to_pylist()
    n_chars = pc.utf8_length(col).to_numpy(
        zero_copy_only=False).astype(np.int64)
    n_chunks = -(-n_chars // stride)  # ceil; 0 stays 0

    doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), n_chunks)
    # chunk_id restarts at 0 per doc: global position minus the doc's
    # first position (vectorized run-relative index)
    starts = np.concatenate(([0], np.cumsum(n_chunks)[:-1]))
    chunk_id = np.arange(doc_idx.size, dtype=np.int64) - np.repeat(
        starts, n_chunks)
    off = chunk_id * stride

    ids = batch[id_col].take(pa.array(doc_idx))
    chunks = [
        texts[d][o:o + size]
        for d, o in zip(doc_idx.tolist(), off.tolist())
    ]
    return pa.table({
        id_col: ids,
        "chunk_id": pa.array(chunk_id),
        "off": pa.array(off),
        "chunk": pa.array(chunks, pa.string()),
    })


def chunk_documents(docs, *, size: int = 200, stride: int = 150,
                    id_col: str = "doc_id", text_col: str = "text"):
    """Dataset form: streaming explode, no shuffle (chunks inherit the
    input's partitioning, so a downstream embed/dedup stage pipelines
    behind the read)."""
    def chunk_batch(batch: pa.Table) -> pa.Table:
        return chunk_documents_batch(batch, size=size, stride=stride,
                                     id_col=id_col, text_col=text_col)

    return docs.map_batches(chunk_batch, batch_format="pyarrow")
