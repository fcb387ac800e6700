"""Extraction stage: ``pages`` → extracted text + SHA-256 digest.

Stateless ``map_batches`` function (zero-copy Arrow in/out). Module-level
compiled regexes (see ``html_extract``) mean zero per-batch setup.

The per-row **byte-identity invariant** from ``BASELINE.json`` ``input_hint``
is enforced here: when the input batch carries the ground-truth ``text``
column, each extracted text must equal it byte-for-byte (compared via
SHA-256, mirroring the reference's byte-compare in ``store_graph``,
``/root/reference/src/graphs.rs:52-61``). ``enforce="raise"`` aborts the
build on mismatch; ``"count"`` records a ``digest_ok`` column instead.
"""

from __future__ import annotations

import pyarrow as pa

from ..html_extract import extract_text
from ..ntriples import sha256_text
from ..schemas import EXTRACTED


def extract_batch(batch: pa.Table, enforce: str = "raise") -> pa.Table:
    htmls = batch["html"].to_pylist()
    texts = [extract_text(h) for h in htmls]
    digests = [sha256_text(t) for t in texts]
    out = pa.table(
        {
            "url": batch["url"],
            "warc_ts": batch["warc_ts"],
            "text": pa.array(texts, pa.string()),
            "digest": pa.array(digests, pa.binary()),
            "lang": batch["lang"],
        }
    ).cast(EXTRACTED)
    if "text" in batch.column_names and enforce != "off":
        ok = [
            sha256_text(t_in) == d if t_in is not None else False
            for t_in, d in zip(batch["text"].to_pylist(), digests)
        ]
        if enforce == "raise" and not all(ok):
            bad = [u for u, o in zip(batch["url"].to_pylist(), ok) if not o]
            raise ValueError(
                f"extracted text is not byte-identical for {len(bad)} rows, "
                f"e.g. {bad[:3]} — extraction determinism invariant violated"
            )
        if enforce == "count":
            out = out.append_column("digest_ok", pa.array(ok, pa.bool_()))
    return out
