"""Relational operator demos over the TPC-H-ish test tables.

These exercise the engine's generic operator surface (grouped aggregation
with two-phase partial combine, broadcast joins, sort/top-k, tumbling
windows, as-of state, change-log derivation) with DuckDB-checkable SQL
oracles. Money is handled in integer cents (``round(x*100)::bigint``)
so engine and oracle sums are exact-integer equal regardless of
summation order.

Scale patterns demonstrated:
- **two-phase aggregation**: per-batch partial sums inside ``map_batches``
  (one row per key per batch) before the keyed shuffle — the shuffle
  carries partials, not rows (SURVEY §2.5 salted/partial requirement);
- **broadcast join**: small dimension tables (`customer`→`nation`) are
  ``ray.put`` once and mapped per batch — no shuffle join;
- **as-of / change-log**: the diff-store semantics (latest-≤-ts,
  suppress-unchanged) expressed over an ordinary event stream.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum


def _round_away(arr):
    """DuckDB-compatible rounding (round() = half away from zero)."""
    return pc.round(arr, ndigits=0, round_mode="half_towards_infinity")


def _cents(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    return _round_away(pc.multiply(arr, pa.scalar(100.0))).cast(pa.int64())


# ------------------------------------------------------------------ Q1 ------
def q1_pricing_summary(sf_dir: str):
    """Pricing summary (TPC-H Q1 shape, integer-exact): per
    (l_returnflag, l_linestatus): sum_qty, revenue_cents, n_rows.
    Two-phase: per-batch partial aggregation, then a small keyed shuffle."""
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        rev = _round_away(
            pc.multiply(
                pc.multiply(batch["l_extendedprice"],
                            pc.subtract(pa.scalar(1.0), batch["l_discount"])),
                pa.scalar(100.0),
            )
        ).cast(pa.int64())
        qty = _round_away(pc.multiply(batch["l_quantity"], pa.scalar(100.0))).cast(
            pa.int64()
        )
        df = pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "qty_c": qty,
                "rev_c": rev,
            }
        ).to_pandas()
        g = (
            df.groupby(["l_returnflag", "l_linestatus"], sort=True)
            .agg(sum_qty_cents=("qty_c", "sum"), revenue_cents=("rev_c", "sum"),
                 n_rows=("qty_c", "size"))
            .reset_index()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty_cents", alias_name="sum_qty_cents"),
            Sum("revenue_cents", alias_name="revenue_cents"),
            Sum("n_rows", alias_name="n_rows"),
        )
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       sum(CAST(round(l_quantity * 100) AS BIGINT)) AS sum_qty_cents,
       sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS revenue_cents,
       count(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


# ------------------------------------------------------- top-k by sort ------
def top_orders(sf_dir: str, k: int = 20):
    """Top-k orders by price (sort + limit, deterministic tie-break)."""
    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )

    def to_cents(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "total_cents": _cents(batch["o_totalprice"]),
            }
        )

    return (
        ds.map_batches(to_cents, batch_format="pyarrow")
        .sort([("total_cents"), ("o_orderkey")], descending=[True, False])
        .limit(k)
    )


TOP_ORDERS_SQL = """
SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents
FROM orders
ORDER BY total_cents DESC, o_orderkey
LIMIT 20
"""


# ------------------------------------------------- broadcast join agg -------
def orders_by_nation(sf_dir: str):
    """Orders per customer nation: two broadcast lookups (customer →
    nationkey, nation → name) applied inside ``map_batches`` — the
    small-side join pattern (no shuffle join)."""
    import pyarrow.parquet as pq

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    cust_map = dict(
        zip(cust["c_custkey"].to_pylist(), cust["c_nationkey"].to_pylist())
    )
    nation_map = dict(
        zip(nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist())
    )
    ref = ray.put((cust_map, nation_map))

    class AttachNation:
        def __init__(self, lookup_ref):
            self.cust_map, self.nation_map = ray.get(lookup_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            keys = batch["o_custkey"].to_pylist()
            names = [
                self.nation_map.get(self.cust_map.get(k), "UNKNOWN") for k in keys
            ]
            return pa.table(
                {
                    "n_name": pa.array(names, pa.string()),
                    "total_cents": _cents(batch["o_totalprice"]),
                }
            )

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    return (
        ds.map_batches(
            AttachNation,
            fn_constructor_kwargs={"lookup_ref": ref},
            batch_format="pyarrow",
            batch_size=65536,
            concurrency=(1, 4),
        )
        .groupby("n_name")
        .aggregate(
            Count(alias_name="n_orders"), Sum("total_cents", alias_name="total_cents")
        )
    )


ORDERS_BY_NATION_SQL = """
SELECT n.n_name AS n_name, count(*) AS n_orders,
       sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS total_cents
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


# -------------------------------------------------- partitioned hash join ---
def lineitem_part_join(sf_dir: str):
    """Large-large join: lineitem ⋈ part on partkey via the engine's
    ``Dataset.join`` (hash-partitioned); falls back to a bucketed
    map_groups join on Ray versions without it. Output: per brand count +
    qty (integer cents)."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_quantity"]
    ).map_batches(
        lambda b: pa.table(
            {
                "l_partkey": b["l_partkey"],
                "qty_cents": _round_away(
                    pc.multiply(b["l_quantity"], pa.scalar(100.0))
                ).cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    part = rd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    )
    joined = li.join(
        part,
        join_type="inner",
        num_partitions=8,
        on=("l_partkey",),
        right_on=("p_partkey",),
    )
    return (
        joined.groupby("p_brand")
        .aggregate(Count(alias_name="n_items"), Sum("qty_cents", alias_name="qty_cents"))
    )


LINEITEM_PART_JOIN_SQL = """
SELECT p.p_brand AS p_brand, count(*) AS n_items,
       sum(CAST(round(l.l_quantity * 100) AS BIGINT)) AS qty_cents
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
"""


# --------------------------------------------------- tumbling window --------
def events_hourly(sf_dir: str):
    """Tumbling 1-hour window per event_type: count + value cents.
    Window assignment is a vectorized column op; aggregation is two-phase."""
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch["ts"], unit="hour")
        df = pa.table(
            {
                "event_type": batch["event_type"],
                "hour": hour,
                "value_cents": _cents(batch["value"]),
            }
        ).to_pandas()
        g = (
            df.groupby(["event_type", "hour"], sort=True)
            .agg(n_events=("value_cents", "size"), value_cents=("value_cents", "sum"))
            .reset_index()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby(["event_type", "hour"])
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("value_cents", alias_name="value_cents"),
        )
    )


EVENTS_HOURLY_SQL = """
SELECT event_type, date_trunc('hour', ts) AS hour,
       count(*) AS n_events,
       sum(CAST(round(value * 100) AS BIGINT)) AS value_cents
FROM events
GROUP BY event_type, date_trunc('hour', ts)
"""


# ------------------------------------------------------- as-of state --------
ASOF_CUTOFF = "2024-01-03 00:00:00"


def events_asof_state(sf_dir: str, cutoff: str = ASOF_CUTOFF):
    """Per-user latest event at the cutoff — the diff-store as-of
    semantics (latest delta ≤ ts, ``src/git.rs:157-161``) over an event
    stream. Deterministic tie-break: (ts, event_id) descending."""
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "event_type"]
    )
    cut = pa.scalar(pd.Timestamp(cutoff), pa.timestamp("us"))

    def upto(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.less_equal(batch["ts"], cut))

    def latest(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["ts", "event_id"], kind="stable")
        last = g.iloc[[-1]]
        return pd.DataFrame(
            {
                "user_id": last["user_id"].to_numpy(),
                "last_ts": last["ts"].to_numpy(),
                "last_event_type": last["event_type"].to_numpy(),
            }
        )

    return (
        ds.map_batches(upto, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(latest, batch_format="pandas")
    )


EVENTS_ASOF_SQL = f"""
SELECT user_id, ts AS last_ts, event_type AS last_event_type
FROM (
  SELECT user_id, ts, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events WHERE ts <= TIMESTAMP '{ASOF_CUTOFF}'
) WHERE rn = 1
"""


# ------------------------------------------------------- change log ---------
def events_change_log(sf_dir: str):
    """Per-user event-type change log with no-op suppression: a row only
    where event_type differs from the user's previous event — the delta
    derivation semantics (``src/graphs.rs:52-61``) over an event stream."""
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "event_type"]
    )

    def changes(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["ts", "event_id"], kind="stable")
        keep = g["event_type"].ne(g["event_type"].shift())
        out = g[keep]
        return pd.DataFrame(
            {
                "user_id": out["user_id"].to_numpy(),
                "ts": out["ts"].to_numpy(),
                "event_type": out["event_type"].to_numpy(),
            }
        )

    return ds.groupby("user_id").map_groups(changes, batch_format="pandas")


EVENTS_CHANGE_LOG_SQL = """
SELECT user_id, ts, event_type
FROM (
  SELECT user_id, ts, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
) WHERE prev IS NULL OR event_type <> prev
"""


# ----------------------------------------------------------- metadata -------
def events_metadata(sf_dir: str):
    """(start_time, end_time) — Min/Max tree-reduce, no shuffle
    (``repo_metadata`` analog, ``src/git.rs:78-85``)."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
    res = ds.aggregate(Min("ts"), Max("ts"))
    return pa.table(
        {
            "start_time": pa.array([res["min(ts)"]], pa.timestamp("us")),
            "end_time": pa.array([res["max(ts)"]], pa.timestamp("us")),
        }
    )


EVENTS_METADATA_SQL = """
SELECT min(ts) AS start_time, max(ts) AS end_time FROM events
"""


# ---------------------------------------------------- version instants ------
def events_version_times(sf_dir: str):
    """Sorted distinct event days (``list_commit_times`` analog over the
    stream: per-batch partial distinct → grouped distinct)."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def distinct_days(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"day": pc.floor_temporal(batch["ts"], unit="day").unique()}
        )

    return (
        ds.map_batches(distinct_days, batch_format="pyarrow")
        .groupby("day")
        .count()
        .select_columns(["day"])
        .sort("day")
    )


EVENTS_VERSION_TIMES_SQL = """
SELECT DISTINCT date_trunc('day', ts) AS day FROM events ORDER BY day
"""
