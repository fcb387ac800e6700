"""Weighted reservoir sampling without replacement — Efraimidis &
Spirakis 2006 ("Weighted random sampling with a reservoir"): each row
gets the key ``u^(1/w)`` (equivalently ordered by ``ln(u)/w``) and the
k LARGEST keys form an exact weighted sample without replacement.

Distributed shape: the keys are a pure per-row function — ``u`` comes
from ``splitmix64(row_key ^ seed)``, so the draw is deterministic and
batch/cluster-invariant — and top-k commutes with partitioning, so each
batch emits only its local top-k and the driver merges
``num_batches × k`` rows (the ``brute_force_topk`` merge pattern; the
corpus never gathers anywhere).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..shuffle_utils import sort_values_nul_safe
from .shards import _mix64


def _es_keys(row_keys: np.ndarray, weights: np.ndarray,
             seed: int) -> np.ndarray:
    """ln(u)/w per row: u in (0,1) from the hashed row key (never exactly
    0 or 1), zero/negative weights get -inf (never selected)."""
    u = (
        _mix64(row_keys.astype(np.uint64) ^ np.uint64(seed)).astype(
            np.float64
        )
        + 0.5
    ) / float(2**64)
    w = weights.astype(np.float64)
    out = np.full(len(w), -np.inf)
    pos = w > 0
    out[pos] = np.log(u[pos]) / w[pos]
    return out


def weighted_sample(
    ds,
    *,
    k: int,
    weight_col: str,
    key_col: str,
    seed: int = 0,
):
    """Draw ``k`` rows without replacement with probability proportional
    to ``weight_col``. Returns a pandas DataFrame of the sampled rows
    (all input columns) plus ``rank`` (1 = largest key). ``key_col``
    values must be unique non-negative ints (they seed the per-row
    uniform). Zero/negative weights are never selected."""
    if k <= 0:
        raise ValueError("k must be positive")

    def local_topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        keys = _es_keys(
            df[key_col].to_numpy(np.int64),
            df[weight_col].to_numpy(),
            seed,
        )
        df["_es"] = keys
        df = df[np.isfinite(keys)]
        df = sort_values_nul_safe(
            df, ["_es", key_col], ascending=[False, True]
        ).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    if parts.empty:
        out = pd.DataFrame(columns=list(ds.schema().names) + ["rank"])
        return out
    out = parts.sort_values(
        ["_es", key_col], ascending=[False, True], ignore_index=True
    ).head(k)
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out.drop(columns=["_es"])
