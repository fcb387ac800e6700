"""Distributed graph analytics over the KG's entity graph.

PageRank here is the canonical iterative *co-partitioned join* shape
for Ray Data — the complement of the kmeans broadcast-fold
(`cluster.py`): the rank vector is corpus-scale (one entry per entity),
so it can NEVER be broadcast; instead each iteration co-partitions
edges and ranks by ``hash(node) % P``, joins them inside the bounded
partition, and re-aggregates contributions by destination. Two
shuffles per iteration, both over (node, float) pairs — never over
edges' payloads, never through the driver. The driver holds only three
scalars per iteration (node count, dangling mass, L1 shift).

Entity importance is the curation signal: rank-weighted sampling and
head-entity QA both need it (degree alone over-counts boilerplate
mentions). Algorithm: Page, Brin, Motwani, Winograd (1999), "The
PageRank citation ranking", with the uniform dangling-mass correction
of Berkhin (2005), "A survey on PageRank computing".
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _rename(ds, mapping: dict):
    """Column rename that tolerates pandas-formatted blocks (Ray's
    ``rename_columns`` assumes Arrow blocks after some aggregates)."""
    return ds.map_batches(
        lambda b: b.rename_columns(
            [mapping.get(c, c) for c in b.column_names]
        ),
        batch_format="pyarrow",
    )


def _copartition(ds, key: str, num_partitions: int, col: str):
    from ..shuffle_utils import add_partition_id

    return ds.map_batches(
        lambda b: add_partition_id(b, key=key, num_partitions=num_partitions,
                                   col=col),
        batch_format="pyarrow",
    )


def pagerank(edges_ds, *, damping: float = 0.85, n_iter: int = 20,
             tol: float | None = None, num_partitions: int = 32,
             round_to: int = 10, method: str = "auto",
             broadcast_threshold: int = 2_000_000):
    """PageRank over a directed edge Dataset ``(src, dst)`` (string node
    ids, parallel edges collapse). Returns a Dataset ``(node, rank)``
    with ranks rounded to ``round_to`` decimals so output bytes are
    partition-order-stable; ranks sum to 1. Dangling nodes (no
    out-edges) spread their mass uniformly, the standard correction.

    Two execution paths, the dedup ``components="auto"`` precedent:

    - ``broadcast`` (node count ≤ ``broadcast_threshold``): the rank
      vector broadcasts via ``ray.put`` each iteration and every batch
      of integer-factorized edges emits one ``bincount`` partial — ONE
      Ray job per iteration, the kmeans fold shape.
    - ``copartition`` (the 100×-scale path): ranks never leave the
      cluster; each iteration co-partitions edges and ranks by
      ``hash(node) % P``, joins inside the bounded partition and
      re-aggregates by destination. More jobs per iteration, so at
      sandbox scale it is the parity-tested fallback, not the default.

    ``tol``: optional early stop on L1 shift (costs one extra pass per
    iteration on the copartition path)."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    edges = (
        edges_ds.select_columns(["src", "dst"])
        .groupby(["src", "dst"]).aggregate(Count(alias_name="_c"))
        .select_columns(["src", "dst"])
        .materialize()  # re-read every iteration: block cache, not parquet
    )

    nodes = (
        _rename(edges.select_columns(["src"]), {"src": "node"})
        .union(_rename(edges.select_columns(["dst"]), {"dst": "node"}))
        .groupby("node").aggregate(Count(alias_name="_c"))
        .select_columns(["node"])
        .materialize()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return rd.from_arrow(pa.table({"node": pa.array([], pa.string()),
                                       "rank": pa.array([], pa.float64())}))
    degrees = (
        _rename(edges.groupby("src").aggregate(Count(alias_name="out_deg")),
                {"src": "node"})
    )

    if method == "auto":
        method = ("broadcast" if n_nodes <= broadcast_threshold
                  else "copartition")
    if method == "broadcast":
        return _pagerank_broadcast(
            edges, nodes, n_nodes, damping=damping, n_iter=n_iter,
            tol=tol, round_to=round_to)

    # state: (node, rank, out_deg) — out_deg 0 for dangling nodes
    def seed(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "rank", pa.array(np.full(batch.num_rows, 1.0 / n_nodes))
        )

    def merge_state(group: pd.DataFrame) -> pd.DataFrame:
        g = group.groupby("node", sort=False).agg(
            rank=("rank", "sum"), out_deg=("out_deg", "sum")
        ).reset_index()
        return g

    state = (
        _copartition(
            nodes.map_batches(seed, batch_format="pyarrow").map_batches(
                lambda b: b.append_column(
                    "out_deg", pa.array(np.zeros(b.num_rows, np.int64))
                ),
                batch_format="pyarrow",
            ).union(
                degrees.map_batches(
                    lambda b: b.append_column(
                        "rank", pa.array(np.zeros(b.num_rows))
                    ),
                    batch_format="pyarrow",
                ).select_columns(["node", "rank", "out_deg"])
            ),
            "node", num_partitions, "pr_pid",
        )
        .groupby("pr_pid")
        .map_groups(merge_state, batch_format="pandas")
        .materialize()
    )

    eps = (1.0 - damping) / n_nodes
    for _ in range(n_iter):
        # driver scalars: dangling mass + current L1 baseline
        from ray.data.aggregate import Sum as _Sum

        dang = state.map_batches(
            lambda b: pa.table({"m": pa.array([float(
                np.where(np.asarray(b["out_deg"]) == 0,
                         np.asarray(b["rank"]), 0.0).sum())])}),
            batch_format="pyarrow",
        ).sum("m")
        base = eps + damping * dang / n_nodes

        # contributions: co-partition edges with state by src, emit
        # rank/out_deg per edge, re-aggregate by dst
        tagged_edges = _copartition(
            _rename(edges, {"src": "node"}), "node",
            num_partitions, "pr_pid",
        )
        tagged_state = _copartition(
            state.select_columns(["node", "rank", "out_deg"]), "node",
            num_partitions, "pr_pid",
        ).map_batches(
            lambda b: b.append_column(
                "dst", pa.array([None] * b.num_rows, pa.string())
            ),
            batch_format="pyarrow",
        )

        def contribs(group: pd.DataFrame) -> pd.DataFrame:
            st = group[group["dst"].isna()]
            ed = group[group["dst"].notna()]
            if not len(ed):
                return pd.DataFrame({"dst": [], "contrib": []})
            m = ed[["node", "dst"]].merge(
                st[["node", "rank", "out_deg"]], on="node", how="inner"
            )
            m = m[m["out_deg"] > 0]
            c = (m.assign(contrib=m["rank"] / m["out_deg"])
                 .groupby("dst", sort=False)["contrib"].sum().reset_index())
            return c

        sums = (
            tagged_edges.map_batches(
                lambda b: b.append_column(
                    "rank", pa.array(np.zeros(b.num_rows))
                ).append_column(
                    "out_deg", pa.array(np.zeros(b.num_rows, np.int64))
                ),
                batch_format="pyarrow",
            ).select_columns(["node", "dst", "rank", "out_deg", "pr_pid"])
            .union(tagged_state.select_columns(
                ["node", "dst", "rank", "out_deg", "pr_pid"]
            ))
            .groupby("pr_pid")
            .map_groups(contribs, batch_format="pandas")
            .groupby("dst")
            .aggregate(_Sum("contrib", alias_name="inflow"))
        )
        sums = _rename(sums, {"dst": "node"})

        # new state: base + damping * inflow, joined back to the node set
        def apply_update(group: pd.DataFrame) -> pd.DataFrame:
            st = group[group["_side"] == 0]
            infl = group[group["_side"] == 1]
            m = st[["node", "out_deg", "_old"]].merge(
                infl[["node", "inflow"]], on="node", how="left"
            )
            m["rank"] = base + damping * m["inflow"].fillna(0.0)
            return m[["node", "rank", "out_deg", "_old"]]

        old = state.map_batches(
            lambda b: pa.table(
                {
                    "node": b["node"],
                    "rank": b["rank"],
                    "out_deg": b["out_deg"],
                    "_old": b["rank"],
                    "inflow": pa.array(np.zeros(b.num_rows)),
                    "_side": pa.array(np.zeros(b.num_rows, np.int8)),
                }
            ),
            batch_format="pyarrow",
        )
        infl = sums.map_batches(
            lambda b: pa.table(
                {
                    "node": b["node"],
                    "rank": pa.array(np.zeros(b.num_rows)),
                    "out_deg": pa.array(np.zeros(b.num_rows, np.int64)),
                    "_old": pa.array(np.zeros(b.num_rows)),
                    "inflow": b["inflow"],
                    "_side": pa.array(np.ones(b.num_rows, np.int8)),
                }
            ),
            batch_format="pyarrow",
        )
        new_state = (
            _copartition(old.union(infl), "node", num_partitions, "pr_pid")
            .groupby("pr_pid")
            .map_groups(apply_update, batch_format="pandas")
            .materialize()
        )
        shift = None
        if tol is not None:
            shift = new_state.map_batches(
                lambda b: pa.table({"d": pa.array([float(
                    np.abs(np.asarray(b["rank"])
                           - np.asarray(b["_old"])).sum()
                )])}),
                batch_format="pyarrow",
            ).sum("d")
        state = new_state.select_columns(["node", "rank", "out_deg"]) \
            .materialize()
        if shift is not None and shift < tol:
            break

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch["node"],
                "rank": pa.array(
                    np.round(np.asarray(batch["rank"]), round_to)
                ),
            }
        )

    return state.map_batches(finish, batch_format="pyarrow")


def _pagerank_broadcast(edges, nodes, n_nodes: int, *, damping: float,
                        n_iter: int, tol, round_to: int):
    """The bounded-N fold: the rank vector lives on the driver (N ≤
    broadcast_threshold floats) and broadcasts via ``ray.put`` per
    iteration; edges stay distributed as integer-factorized blocks and
    each batch emits ONE dense ``bincount`` partial. One Ray job per
    iteration — the kmeans shape (`cluster.py:kmeans_fit`)."""
    import ray
    import ray.data as rd

    node_arr = np.sort(
        nodes.to_pandas()["node"].to_numpy(dtype=object)
    )
    idx_ref = ray.put({n: i for i, n in enumerate(node_arr)})

    def encode(batch: pa.Table) -> pa.Table:
        idx = ray.get(idx_ref)
        n = batch.num_rows
        s_ = np.fromiter((idx[v] for v in batch["src"].to_pylist()),
                         np.int64, n)
        d_ = np.fromiter((idx[v] for v in batch["dst"].to_pylist()),
                         np.int64, n)
        return pa.table({"s": pa.array(s_), "d": pa.array(d_)})

    int_edges = edges.map_batches(
        encode, batch_format="pyarrow"
    ).materialize()
    outdeg = np.zeros(n_nodes, np.float64)
    deg_parts = int_edges.map_batches(
        lambda b: pa.table({"deg": pa.array(
            [np.bincount(np.asarray(b["s"]),
                         minlength=n_nodes).tobytes()]
        )}),
        batch_format="pyarrow",
    ).to_pandas()
    for buf in deg_parts["deg"]:
        outdeg += np.frombuffer(buf, dtype=np.int64)

    r = np.full(n_nodes, 1.0 / n_nodes)
    safe_deg = np.maximum(outdeg, 1.0)
    for _ in range(n_iter):
        w_ref = ray.put(r / safe_deg)

        def partial(batch: pa.Table, _ref=w_ref) -> pa.Table:
            w = ray.get(_ref)
            c = np.bincount(
                np.asarray(batch["d"]),
                weights=w[np.asarray(batch["s"])],
                minlength=n_nodes,
            )
            return pa.table({"c": pa.array([c.tobytes()])})

        parts = int_edges.map_batches(
            partial, batch_format="pyarrow"
        ).to_pandas()
        inflow = np.zeros(n_nodes)
        for buf in parts["c"]:
            inflow += np.frombuffer(buf)
        dang = float(r[outdeg == 0].sum())
        new = ((1.0 - damping) / n_nodes
               + damping * (inflow + dang / n_nodes))
        shift = float(np.abs(new - r).sum())
        r = new
        if tol is not None and shift < tol:
            break
    return rd.from_arrow(
        pa.table({"node": pa.array(node_arr, pa.string()),
                  "rank": pa.array(np.round(r, round_to))})
    )
