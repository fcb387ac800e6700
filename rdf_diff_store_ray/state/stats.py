"""Store summary from manifests + parquet footers only — the cheap
operational ``du``/``git count-objects`` analog: no row data is read,
so it is O(files) on the driver and safe to run against a live store
(readers never lock). Complements ``fsck`` (which validates content)
with the at-a-glance numbers an operator checks first.

Exactness notes: ``rows``/``bytes``/file counts and the timestamp
range are exact (segment rows and ts bounds come from parquet footer
metadata, the same statistics the as-of pruner trusts);
``graphs_base`` counts distinct graphs in the COMPACTED base files
(from their manifests) — graphs that only exist in un-compacted append
segments are not in it, by design (counting them would read rows).
"""

from __future__ import annotations

import glob
import json
import os


def _footer_ts_range(path: str):
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    col_idx = next(
        (i for i in range(md.num_columns)
         if md.schema.column(i).name == "warc_ts"), None)
    if col_idx is None:
        return None, None, md.num_rows
    lo = hi = None
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(col_idx).statistics
        if st is None or not st.has_min_max:
            continue
        lo = st.min if lo is None else min(lo, st.min)
        hi = st.max if hi is None else max(hi, st.max)
    return lo, hi, md.num_rows


def store_stats(delta_dir: str) -> dict:
    parts = sorted(glob.glob(os.path.join(delta_dir, "partition=*")))
    if not parts:
        raise ValueError(f"no delta partitions under {delta_dir!r}")
    out = {
        "partitions": len(parts),
        "rows": 0,
        "graphs_base": 0,
        "base_files": 0,
        "segment_files": 0,
        "bytes": 0,
        "ts_min": None,
        "ts_max": None,
        "locked": os.path.exists(os.path.join(delta_dir, ".write.lock")),
    }

    def fold_ts(lo, hi):
        if lo is not None:
            out["ts_min"] = lo if out["ts_min"] is None else min(
                out["ts_min"], lo)
        if hi is not None:
            out["ts_max"] = hi if out["ts_max"] is None else max(
                out["ts_max"], hi)

    for d in parts:
        for f in sorted(glob.glob(os.path.join(d, "*.parquet"))):
            out["bytes"] += os.path.getsize(f)
            lo, hi, n_rows = _footer_ts_range(f)
            out["rows"] += n_rows
            fold_ts(lo, hi)
            if ".seg-" in os.path.basename(f):
                out["segment_files"] += 1
            else:
                out["base_files"] += 1
        man = os.path.join(d, "manifest.json")
        if os.path.exists(man):
            with open(man) as fh:
                out["graphs_base"] += int(json.load(fh).get("graphs", 0))
    for k in ("ts_min", "ts_max"):
        if out[k] is not None:
            out[k] = str(out[k])
    return out
