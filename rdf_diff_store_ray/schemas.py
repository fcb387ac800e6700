"""Arrow schema contracts.

The reference's schema contract is OpenAPI-generated Rust models
(``/root/reference/src/models/graph.rs:14-22``,
``src/models/metadata.rs:14-20``; ``openapi.yaml:21-41``). Here the contract
is a set of ``pyarrow.Schema`` constants; every stage validates against
these at its boundary.

The ``PAGES`` shape is mandated verbatim by ``BASELINE.json`` ``input_hint``:
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.
Timestamps are second-resolution, matching the reference's version axis of
unix seconds (``src/git.rs:82,157``).
"""

from __future__ import annotations

import pyarrow as pa

# -- input corpus (replaces the reference's HTTP POST stream) ----------------
PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("s")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

# -- extracted text + per-row digest (byte-identity invariant) ---------------
EXTRACTED = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("s")),
        ("text", pa.string()),
        ("digest", pa.binary()),  # sha256 of extracted text (32 bytes)
        ("lang", pa.string()),
    ]
)

# -- raw triples (surfaces, pre-linking) -------------------------------------
TRIPLES_RAW = pa.schema(
    [
        ("graph_id", pa.string()),  # = url; one logical graph per url
        ("warc_ts", pa.timestamp("s")),
        ("subj_surface", pa.string()),
        ("pred", pa.string()),
        ("obj_surface", pa.string()),
        ("obj_is_literal", pa.bool_()),
    ]
)

# -- linked + canonicalized triples ------------------------------------------
TRIPLES = pa.schema(
    [
        ("subj", pa.string()),  # canonical entity IRI
        ("pred", pa.string()),  # property IRI
        ("obj", pa.string()),  # IRI or literal lexical form
        ("obj_is_literal", pa.bool_()),
        ("graph_id", pa.string()),
        ("warc_ts", pa.timestamp("s")),
    ]
)

# -- per-(graph, version) canonical snapshot ---------------------------------
VERSIONS = pa.schema(
    [
        ("graph_id", pa.string()),
        ("warc_ts", pa.timestamp("s")),
        ("delta_text", pa.large_string()),  # canonical N-Triples document
        ("digest", pa.binary()),  # sha256 of delta_text
    ]
)

# -- delta log row: the git-commit analog ------------------------------------
# op 'update' | 'delete' mirrors commit messages "update: {id}" / "delete: {id}"
# (reference src/graphs.rs:71,88).
DELTAS = pa.schema(
    [
        ("graph_id", pa.string()),
        ("warc_ts", pa.timestamp("s")),
        ("op", pa.string()),
        ("delta_text", pa.large_string()),
        ("digest", pa.binary()),
        ("partition_id", pa.int32()),
        # explicit replay order within a partition: unique, monotone in
        # write order (base file rows, then each append segment continues
        # from max+1). Same-second ties resolve by (warc_ts, seq) — an
        # explicit total order, never sort stability (pyarrow's
        # sort_indices is NOT stable).
        ("seq", pa.int64()),
    ]
)

OP_UPDATE = "update"
OP_DELETE = "delete"


def ensure_seq(table: pa.Table, start: int = 0) -> pa.Table:
    """Guarantee a ``seq`` replay-order column: tables written by the
    current code carry it; a legacy table (pre-seq parquet) gets
    ``start + arange`` in its CURRENT row order, which for a file read in
    segment order is the replay order it was written in."""
    if "seq" in table.column_names:
        return table
    import numpy as np

    return table.append_column(
        "seq", pa.array(start + np.arange(table.num_rows, dtype=np.int64))
    )


def ensure_schema(table: pa.Table, schema: pa.Schema, where: str = "") -> pa.Table:
    """Cast ``table`` to exactly ``schema`` (column order + types) or raise."""
    try:
        return table.select(schema.names).cast(schema)
    except (KeyError, pa.ArrowInvalid, pa.ArrowTypeError) as exc:  # pragma: no cover
        raise ValueError(
            f"schema contract violation{' in ' + where if where else ''}: "
            f"expected {schema}, got {table.schema}: {exc}"
        ) from exc
