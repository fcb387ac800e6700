"""Partitioning / shuffle helpers shared by stages.

All hashing here must be **stable across processes and nodes** (Python's
builtin ``hash`` is salted per process and must never be used for
partitioning). We use ``pandas.util.hash_array`` (fixed default key,
vectorized) for bulk columns and ``zlib.crc32`` for scalars.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa


def stable_hash_str(s: str) -> int:
    return zlib.crc32(s.encode("utf-8")) & 0xFFFFFFFF


def stable_hash_array(values) -> np.ndarray:
    """Vectorized stable uint64 hash of a string column (Arrow or numpy).

    ``categorize=False`` is REQUIRED for correctness, not a tuning knob:
    pandas' default categorize path factorizes through a C-string hash
    table that truncates at the first NUL byte, so ``"a\\x00x"`` and
    ``"a\\x00y"`` collapse to one key — and whether truncation happens
    depends on array size, making the same value hash differently in
    different batches (measured: co-partitioned ``\\x00``-composite keys
    landed on different partitions per branch). The non-categorize path
    siphashes the full UTF-8 bytes and returns identical values for
    NUL-free strings, so existing partition layouts are unaffected."""
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = values.to_numpy(zero_copy_only=False)
    return pd.util.hash_array(np.asarray(values, dtype=object),
                              categorize=False)


def partition_ids(urls, num_partitions: int) -> np.ndarray:
    """``hash(graph_id) % P`` — single-writer-per-partition ownership, the
    engine's replacement for the reference's global write lock (repo pool of
    size 1, ``/root/reference/src/bin/rdf-diff-writer.rs:25-31``)."""
    return (stable_hash_array(urls) % np.uint64(num_partitions)).astype(np.int32)


def add_partition_id(batch: pa.Table, key: str, num_partitions: int,
                     col: str = "partition_id") -> pa.Table:
    pids = partition_ids(batch[key], num_partitions)
    return batch.append_column(col, pa.array(pids, pa.int32()))


def merge_outer_nul_safe(left: pd.DataFrame, right: pd.DataFrame, on, *,
                         suffixes=("_x", "_y"),
                         indicator: bool = False) -> pd.DataFrame:
    """FULL OUTER column merge that stays correct when key columns carry
    NUL bytes.

    pandas' OUTER merge factorizes keys through the NUL-truncating
    C-string table and then ``safe_sort`` REJECTS the resulting
    duplicate "uniques" (``ValueError: values should be unique if codes
    is not None``) — multi-key at ANY size, single-key above the
    factorize-size threshold (measured on pandas 2.2.2; at small sizes
    single-key outer succeeds). inner/left/right merges and INDEX joins
    are unaffected (measured — ``tests/test_nul_distinct.py`` pins all
    of it). At least it's a loud crash, not a silent wrong answer.

    The NUL-free common case delegates to pandas. Otherwise each key
    column maps to exact integer codes over the UNION of both sides
    (``np.unique`` — full-byte comparison), the merge runs on the code
    columns, and the key values reconstruct from the code tables (merge
    keys are never null, so reconstruction is total). Key columns must
    be non-null; non-key overlapping columns get ``suffixes`` as usual.
    """
    cols = [on] if isinstance(on, str) else list(on)
    if not (_keys_have_nul(left, cols) or _keys_have_nul(right, cols)):
        return left.merge(right, on=cols, how="outer", suffixes=suffixes,
                          indicator=indicator)
    nl = len(left)
    lf, rf = left.copy(), right.copy()
    code_cols, tables = [], []
    for c in cols:
        both = np.concatenate([
            lf[c].to_numpy(object), rf[c].to_numpy(object)
        ])
        u, inv = np.unique(both, return_inverse=True)
        cc = f"__nulsafe_{c}"
        lf[cc] = inv[:nl].astype(np.int64)
        rf[cc] = inv[nl:].astype(np.int64)
        code_cols.append(cc)
        tables.append(u)
    m = lf.merge(rf.drop(columns=cols), on=code_cols, how="outer",
                 suffixes=suffixes, indicator=indicator)
    for c, cc, u in zip(cols, code_cols, tables):
        m[c] = pd.Series(u[m[cc].to_numpy(np.int64)], index=m.index,
                         dtype=object)
    return m.drop(columns=code_cols)


def sort_values_nul_safe(df: pd.DataFrame, by, ascending=True,
                         ignore_index: bool = False) -> pd.DataFrame:
    """Multi-key ``DataFrame.sort_values`` that stays correct when object
    (string) key columns contain NUL bytes.

    pandas' multi-key sort factorizes object columns through the same
    NUL-truncating C-string hash table as ``pd.factorize``:
    ``"m\\x00k"`` and ``"m\\x00n"`` compare EQUAL, so distinct keys
    interleave and any downstream run detection (``arr[1:] != arr[:-1]``)
    sees thousands of runs where there should be two (measured on pandas
    2.2.2 at 1,000 rows). Single-key sorts take the comparison-based
    path (full Python string compare) and are safe — so we sort once per
    key, last key first, each with a stable kind; the composition is
    exactly the lexicographic multi-key order.
    """
    if isinstance(by, str):
        by = [by]
    if isinstance(ascending, bool):
        ascending = [ascending] * len(by)
    out = df
    for col, asc in zip(reversed(by), reversed(list(ascending))):
        out = out.sort_values(col, ascending=asc, kind="stable")
    return out.reset_index(drop=True) if ignore_index else out


def salt_column(batch: pa.Table, key: str, salt_buckets: int,
                col: str = "salt") -> pa.Table:
    """Split hot keys across ``salt_buckets`` sub-keys for two-phase
    aggregation (partial agg on ``(key, salt)``, final agg on ``key``)."""
    n = batch.num_rows
    # deterministic per-row salt: hash of row position within a stable
    # secondary column is unnecessary — round-robin is valid for salting
    # partial aggregations because the final phase re-merges on the key.
    salts = (np.arange(n) % salt_buckets).astype(np.int32)
    return batch.append_column(col, pa.array(salts, pa.int32()))


def _col_codes_nul_safe(col: pd.Series) -> np.ndarray:
    """Exact integer codes for one column: equal values → equal codes,
    distinct values → distinct codes, NaN/None → -1. Object columns go
    through ``np.unique`` (Python ``==``/``<`` — full-byte string
    comparison, never the C-string table)."""
    arr = col.to_numpy()
    n = len(arr)
    codes = np.empty(n, dtype=np.int64)
    if arr.dtype == object:
        na = pd.isna(arr)
        codes[na] = -1
        vals = arr[~na]
        if len(vals):
            _, inv = np.unique(vals.astype(object), return_inverse=True)
            codes[~na] = inv
        return codes
    na = pd.isna(arr)
    codes[na] = -1
    vals = arr[~na]
    if len(vals):
        _, inv = np.unique(vals, return_inverse=True)
        codes[~na] = inv
    return codes


def drop_duplicates_nul_safe(df: pd.DataFrame, subset=None,
                             keep: str = "first",
                             ignore_index: bool = False) -> pd.DataFrame:
    """Multi-key ``DataFrame.drop_duplicates`` that stays correct when
    string key columns contain NUL bytes.

    pandas' MULTI-column dedup factorizes object columns through the
    same NUL-truncating C-string hash table as ``pd.factorize``: rows
    that differ only past a ``\\x00`` collapse into one (measured on
    pandas 2.2.2: 5,000 rows of two NUL-distinct string columns dedup
    to ONE row). Single-column ``drop_duplicates`` takes a different
    path and is safe at every size we measured — so single-key calls
    delegate straight to pandas.

    For multi-key calls: a fast O(n) scan checks whether any object key
    actually contains a NUL; the overwhelmingly common NUL-free case
    delegates to pandas. Otherwise EXACT per-column integer codes
    (``np.unique`` — full-byte comparison) feed one
    ``np.unique(axis=0)`` over the code matrix; first/last occurrence
    indices reproduce pandas' keep semantics in original row order.
    """
    if isinstance(df, pd.Series):
        # single-key dedup is safe in pandas at every size we measured
        out = df.drop_duplicates(keep=keep)
        return out.reset_index(drop=True) if ignore_index else out
    cols = list(subset) if subset is not None else list(df.columns)
    if len(df) == 0 or len(cols) <= 1:
        out = df.drop_duplicates(subset=subset, keep=keep)
        return out.reset_index(drop=True) if ignore_index else out
    has_nul = False
    for c in cols:
        s = df[c]
        if s.dtype == object:
            for v in s.to_numpy():
                if isinstance(v, str) and "\x00" in v:
                    has_nul = True
                    break
        if has_nul:
            break
    if not has_nul:
        out = df.drop_duplicates(subset=subset, keep=keep)
        return out.reset_index(drop=True) if ignore_index else out
    codes = np.stack([_col_codes_nul_safe(df[c]) for c in cols], axis=1)
    if keep == "last":
        codes = codes[::-1]
    _, first = np.unique(codes, axis=0, return_index=True)
    if keep == "last":
        first = len(df) - 1 - first
    out = df.iloc[np.sort(first)]
    return out.reset_index(drop=True) if ignore_index else out


def _keys_have_nul(df: pd.DataFrame, cols) -> bool:
    for c in cols:
        s = df[c]
        if s.dtype == object:
            for v in s.to_numpy():
                if isinstance(v, str) and "\x00" in v:
                    return True
    return False


def groupby_nul_safe(df: pd.DataFrame, by):
    """Iterate ``(key_tuple, sub_df)`` like ``df.groupby(by,
    dropna=False, sort=False)`` but exact for NUL-carrying object keys.

    pandas groupby factorizes object key columns — SINGLE column
    included — through the NUL-truncating C-string table, so groups
    whose keys differ only past a ``\\x00`` silently merge (measured on
    pandas 2.2.2). The NUL-free common case delegates to pandas;
    otherwise exact per-column integer codes feed one
    ``np.unique(axis=0)`` and groups yield in first-occurrence order
    (pandas ``sort=False`` semantics). Keys always yield as tuples."""
    cols = list(by)
    if not _keys_have_nul(df, cols):
        for key, sub in df.groupby(cols, dropna=False, sort=False):
            yield (key if isinstance(key, tuple) else (key,)), sub
        return
    codes = np.stack([_col_codes_nul_safe(df[c]) for c in cols], axis=1)
    _, first, inv = np.unique(
        codes, axis=0, return_index=True, return_inverse=True
    )
    inv = inv.reshape(-1)
    for g in np.argsort(first, kind="stable"):
        rows = np.flatnonzero(inv == g)
        sub = df.iloc[rows]
        yield tuple(df[c].iloc[rows[0]] for c in cols), sub
