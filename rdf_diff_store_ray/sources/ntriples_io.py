"""N-Triples source / sink.

The reference's store IS a directory of per-graph ``.ttl`` files read in
bulk (``read_all_files``, ``/root/reference/src/graphs.rs:114-135``) and
written one file per graph (``store_graph``, ``src/graphs.rs:35-79``).
These are the Ray-Data equivalents:

- :func:`read_ntriples` — ``ray.data.read_text`` over ``*.nt`` files →
  vectorized line parse in ``map_batches`` → a columnar ``triples``
  Dataset ``(subj, pred, obj, obj_is_literal, graph_id)``. ``graph_id``
  is decoded from the filename using the reference's base64 encoding
  (``src/graphs.rs:42-45``) so hostile ids round-trip.
- :func:`write_ntriples` — the inverse sink: hash graphs into bounded
  partitions and write one canonical ``.ttl``-named file per graph under
  ``out_dir``. Files are written from inside the grouped stage (one
  writer task per partition owns all of its graphs' files), never on
  the driver.

Both stream; nothing materializes the corpus.
"""

from __future__ import annotations

import os

import pyarrow as pa

from ..ntriples import graph_filename, graph_id_from_filename, parse, serialize

TRIPLES_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("obj_is_literal", pa.bool_()),
        ("graph_id", pa.string()),
    ]
)


def _parse_lines(batch: pa.Table) -> pa.Table:
    """Parse one batch of (text, path) rows into triple rows."""
    subjs, preds, objs, lits, gids = [], [], [], [], []
    paths = batch["path"].to_pylist() if "path" in batch.column_names else None
    for i, line in enumerate(batch["text"].to_pylist()):
        line = (line or "").strip()
        if not line or line.startswith("#"):
            continue
        for s, p, o, lit in parse(line):
            subjs.append(s)
            preds.append(p)
            objs.append(o)
            lits.append(lit)
            if paths is not None:
                name = os.path.basename(paths[i])
                try:
                    gids.append(graph_id_from_filename(name))
                except ValueError:
                    gids.append(name)
            else:
                gids.append("")
    return pa.table(
        {
            "subj": pa.array(subjs, pa.string()),
            "pred": pa.array(preds, pa.string()),
            "obj": pa.array(objs, pa.string()),
            "obj_is_literal": pa.array(lits, pa.bool_()),
            "graph_id": pa.array(gids, pa.string()),
        }
    )


def read_ntriples(paths):
    """Read ``.nt``/``.ttl`` canonical N-Triples file(s) into a columnar
    triples Dataset. ``paths`` is a file, directory, or list of either."""
    import ray.data as rd

    ds = rd.read_text(paths, include_paths=True)
    return ds.map_batches(_parse_lines, batch_format="pyarrow")


def _parse_turtle_files(batch: pa.Table) -> pa.Table:
    """Whole-document parse (Turtle is not line-oriented): one input row
    per file from ``read_binary_files(include_paths=True)``."""
    from ..turtle import parse_turtle

    subjs, preds, objs, lits, gids = [], [], [], [], []
    for data, path in zip(batch["bytes"].to_pylist(), batch["path"].to_pylist()):
        name = os.path.basename(path)
        try:
            gid = graph_id_from_filename(name)
        except ValueError:
            gid = name
        for s, p, o, lit in parse_turtle(data.decode("utf-8")):
            subjs.append(s)
            preds.append(p)
            objs.append(o)
            lits.append(lit)
            gids.append(gid)
    return pa.table(
        {
            "subj": pa.array(subjs, pa.string()),
            "pred": pa.array(preds, pa.string()),
            "obj": pa.array(objs, pa.string()),
            "obj_is_literal": pa.array(lits, pa.bool_()),
            "graph_id": pa.array(gids, pa.string()),
        }
    )


def read_turtle(paths):
    """Read Turtle file(s) — ``@prefix``/``a``/``;``/``,`` abbreviations,
    typed and lang-tagged literals — into the same columnar triples
    Dataset as :func:`read_ntriples`. This is the ingestion path for a
    reference-style ``.ttl`` store (``src/query.rs:148-169`` semantics:
    prefix headers are expanded away, not carried)."""
    import ray.data as rd

    ds = rd.read_binary_files(paths, include_paths=True)
    return ds.map_batches(_parse_turtle_files, batch_format="pyarrow")


def write_ntriples(triples_ds, out_dir: str, num_partitions: int = 64):
    """Write one canonical N-Triples file per graph (the reference's
    one-file-per-graph store layout). Returns a manifest Dataset
    ``(graph_id, file, n_triples)``.

    ``graph_id`` cardinality is corpus-scale (one per url), so the
    shuffle key is ``hash(graph_id) % num_partitions`` — one grouped
    call per *partition*, each writing every one of its graphs' files
    (the bounded-partition pattern from ``stages/deltas.py``), never one
    Ray group per graph."""
    import pandas as pd
    import zlib

    os.makedirs(out_dir, exist_ok=True)

    def add_pid(batch: pa.Table) -> pa.Table:
        pids = pa.array(
            [
                zlib.crc32(g.encode("utf-8")) % num_partitions
                for g in batch["graph_id"].to_pylist()
            ],
            pa.int32(),
        )
        return batch.append_column("partition_id", pids)

    def write_partition_files(group: pd.DataFrame) -> pd.DataFrame:
        gids, files, counts = [], [], []
        for gid, g in group.groupby("graph_id", sort=False):
            triples = list(
                zip(g["subj"], g["pred"], g["obj"], g["obj_is_literal"])
            )
            text = serialize(triples)
            fname = graph_filename(gid)
            final = os.path.join(out_dir, fname)
            tmp = final + ".tmp"
            with open(tmp, "w", encoding="utf-8") as f:
                f.write(text)
            os.replace(tmp, final)
            gids.append(gid)
            files.append(fname)
            counts.append(len(text.splitlines()))
        return pd.DataFrame({"graph_id": gids, "file": files, "n_triples": counts})

    return (
        triples_ds.map_batches(add_pid, batch_format="pyarrow")
        .groupby("partition_id")
        .map_groups(write_partition_files, batch_format="pandas")
    )


def read_nquads(paths):
    """``ray.data.read_text`` over ``.nq`` files → a columnar quads
    Dataset ``(subj, pred, obj, obj_is_literal, graph_id)`` (the graph
    id decoded from the quad's graph IRI). Streams; one parse task per
    file block."""
    import ray.data as rd

    from ..nquads import parse_quad_line

    def parse_lines(batch: pa.Table) -> pa.Table:
        gids, subjs, preds, objs, lits = [], [], [], [], []
        for line in batch["text"].to_pylist():
            line = (line or "").strip()
            if not line or line.startswith("#"):
                continue
            g, s, p, o, lit = parse_quad_line(line)
            gids.append(g)
            subjs.append(s)
            preds.append(p)
            objs.append(o)
            lits.append(lit)
        return pa.table(
            {
                "subj": pa.array(subjs, pa.string()),
                "pred": pa.array(preds, pa.string()),
                "obj": pa.array(objs, pa.string()),
                "obj_is_literal": pa.array(lits, pa.bool_()),
                "graph_id": pa.array(gids, pa.string()),
            }
        )

    return rd.read_text(paths).map_batches(
        parse_lines, batch_format="pyarrow"
    )


def write_nquads(quads_ds, out_dir: str, num_partitions: int = 64):
    """Write the quad view as partitioned canonical N-Quads: one sorted
    ``part-NNNNN.nq`` file per graph-hash partition (N-Quads is
    multi-graph, so the file unit is the partition, not the graph; the
    graph-hash key keeps each graph's quads in one file). Returns a
    manifest Dataset ``(partition_id, file, n_quads)``. Deterministic:
    lines are sorted+deduped within each file and the partition of a
    graph is a pure hash of its id."""
    import zlib

    import pandas as pd

    from ..nquads import format_quad_line

    os.makedirs(out_dir, exist_ok=True)

    def add_pid(batch: pa.Table) -> pa.Table:
        pids = pa.array(
            [
                zlib.crc32(g.encode("utf-8")) % num_partitions
                for g in batch["graph_id"].to_pylist()
            ],
            pa.int32(),
        )
        return batch.append_column("partition_id", pids)

    def write_partition_file(group: pd.DataFrame) -> pd.DataFrame:
        pid = int(group["partition_id"].iloc[0])
        lines = sorted(
            {
                format_quad_line(g, s, p, o, lit)
                for g, s, p, o, lit in zip(
                    group["graph_id"], group["subj"], group["pred"],
                    group["obj"], group["obj_is_literal"],
                )
            }
        )
        fname = f"part-{pid:05d}.nq"
        final = os.path.join(out_dir, fname)
        tmp = final + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write("\n".join(lines) + "\n" if lines else "")
        os.replace(tmp, final)
        return pd.DataFrame(
            {"partition_id": [pid], "file": [fname], "n_quads": [len(lines)]}
        )

    return (
        quads_ds.map_batches(add_pid, batch_format="pyarrow")
        .groupby("partition_id")
        .map_groups(write_partition_file, batch_format="pandas")
    )
