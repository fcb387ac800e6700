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


def _add_key_partition(batch: pa.Table, key: str, num_partitions: int = 64,
                       ) -> pa.Table:
    """Bounded-partition shuffle key: ``hash(key) % num_partitions``. Used
    wherever a per-key ``map_groups`` would otherwise pay Ray's per-group
    overhead once per DISTINCT key (users, urls, ...) — the group count
    stays fixed while all rows of any key still co-locate, and the
    per-partition function handles its keys in one vectorized pass."""
    from ..shuffle_utils import add_partition_id

    return add_partition_id(batch, key=key, num_partitions=num_partitions)


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
       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
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
       CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
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
       CAST(sum(CAST(round(l.l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents
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
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events
GROUP BY event_type, date_trunc('hour', ts)
"""


# ------------------------------------------------------ sliding window ------
SLIDE_HOURS = 3


def events_sliding_window(sf_dir: str, window_hours: int = SLIDE_HOURS):
    """Sliding ``window_hours``-hour count per event_type, advancing
    hourly: each event EXPLODES into the ``window_hours`` window ends it
    belongs to (the flat_map pattern — output rows ≫ input rows), then a
    two-phase count. Only windows an event actually lands in exist
    (sparse, like the SQL oracle's DISTINCT-hours join)."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])
    hour_us = 3_600 * 10**6

    def explode(batch: pa.Table) -> pa.Table:
        hours = pc.floor_temporal(batch["ts"], unit="hour").cast(pa.int64())
        n = batch.num_rows
        out_end, out_type = [], []
        types = batch["event_type"].to_pylist()
        hrs = hours.to_pylist()
        for k in range(window_hours):
            off = k * hour_us
            out_end.extend(h + off for h in hrs)
            out_type.extend(types)
        t = pa.table(
            {
                "window_end_hour": pa.array(out_end, pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "event_type": pa.array(out_type, pa.string()),
            }
        )
        # partial count: one row per (window, type) per batch
        df = (
            t.to_pandas()
            .groupby(["window_end_hour", "event_type"])
            .size()
            .reset_index(name="n")
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    from ray.data.aggregate import Sum

    counts = (
        ds.map_batches(explode, batch_format="pyarrow", batch_size=65536)
        .groupby(["window_end_hour", "event_type"])
        .aggregate(Sum("n", alias_name="n_events"))
    )
    # keep only windows anchored at an hour actually PRESENT in the
    # stream (the oracle's window set): distinct hours are computed with
    # a grouped distinct (bounded by the time range — hours, not events)
    # and broadcast into the filter
    present = (
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
        .map_batches(
            lambda b: pa.table(
                {"h": pc.floor_temporal(b["ts"], unit="hour").unique()}
            ),
            batch_format="pyarrow",
        )
        .groupby("h")
        .count()
        .take_all()
    )
    hours = pa.array(sorted(r["h"] for r in present), pa.timestamp("us"))

    def clip(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.is_in(batch["window_end_hour"], value_set=hours)
        )

    return counts.map_batches(clip, batch_format="pyarrow")


EVENTS_SLIDING_SQL = f"""
SELECT w.hour AS window_end_hour, e.event_type, count(*) AS n_events
FROM (SELECT DISTINCT date_trunc('hour', ts) AS hour FROM events) w
JOIN events e
  ON e.ts >= w.hour - INTERVAL {SLIDE_HOURS - 1} HOUR
 AND e.ts < w.hour + INTERVAL 1 HOUR
GROUP BY w.hour, e.event_type
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

    def latest_per_user(group: pd.DataFrame) -> pd.DataFrame:
        """All users hashed into this partition, handled in ONE
        vectorized pass (sort + drop_duplicates keep-last) — key
        cardinality is unbounded at scale, so never one map_groups call
        per user."""
        g = group.sort_values(["user_id", "ts", "event_id"], kind="stable")
        last = g.drop_duplicates(subset=["user_id"], keep="last")
        return pd.DataFrame(
            {
                "user_id": last["user_id"].to_numpy(),
                "last_ts": last["ts"].to_numpy(),
                "last_event_type": last["event_type"].to_numpy(),
            }
        )

    return (
        ds.map_batches(upto, batch_format="pyarrow")
        .map_batches(
            _add_key_partition, fn_kwargs={"key": "user_id"},
            batch_format="pyarrow",
        )
        .groupby("partition_id")
        .map_groups(latest_per_user, batch_format="pandas")
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

    def changes_per_user(group: pd.DataFrame) -> pd.DataFrame:
        """Vectorized over ALL users in one hash partition: a row is kept
        where the event_type differs from the same user's previous event
        (a user boundary always starts a new run)."""
        g = group.sort_values(["user_id", "ts", "event_id"], kind="stable")
        new_user = g["user_id"].ne(g["user_id"].shift())
        keep = new_user | g["event_type"].ne(g["event_type"].shift())
        out = g[keep]
        return pd.DataFrame(
            {
                "user_id": out["user_id"].to_numpy(),
                "ts": out["ts"].to_numpy(),
                "event_type": out["event_type"].to_numpy(),
            }
        )

    return (
        ds.map_batches(
            _add_key_partition, fn_kwargs={"key": "user_id"},
            batch_format="pyarrow",
        )
        .groupby("partition_id")
        .map_groups(changes_per_user, batch_format="pandas")
    )


EVENTS_CHANGE_LOG_SQL = """
SELECT user_id, ts, event_type
FROM (
  SELECT user_id, ts, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
) WHERE prev IS NULL OR event_type <> prev
"""


# ------------------------------------------------- state diff ---------------
DIFF_TS1 = "2024-01-02 00:00:00"
DIFF_TS2 = "2024-01-04 00:00:00"


def events_state_diff(sf_dir: str, ts1: str = DIFF_TS1, ts2: str = DIFF_TS2):
    """Difference between two as-of states — the diff-store's namesake
    operation (state(ts2) vs state(ts1), ``src/git.rs:151-190``) over an
    event stream: users whose latest event_type changed between the
    cutoffs ('changed') or who first appeared ('added'). ONE scan bounded
    at ts2 and one keyed shuffle; both states resolve per partition in a
    single vectorized pass."""
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    cut1 = pa.scalar(pd.Timestamp(ts1), pa.timestamp("us"))
    cut2 = pa.scalar(pd.Timestamp(ts2), pa.timestamp("us"))
    t1 = pd.Timestamp(ts1)

    def upto2(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.less_equal(batch["ts"], cut2))

    def diff_per_user(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["user_id", "ts", "event_id"], kind="stable")
        new = g.drop_duplicates(subset=["user_id"], keep="last")
        old = g[g["ts"] <= t1].drop_duplicates(subset=["user_id"], keep="last")
        m = new[["user_id", "event_type"]].merge(
            old[["user_id", "event_type"]], on="user_id", how="left",
            suffixes=("_new", "_old"),
        )
        appeared = m["event_type_old"].isna()
        keep = m[appeared | m["event_type_old"].ne(m["event_type_new"])]
        return pd.DataFrame(
            {
                "user_id": keep["user_id"].to_numpy(),
                "old_event_type": keep["event_type_old"].fillna("").to_numpy(),
                "new_event_type": keep["event_type_new"].to_numpy(),
                "change": np.where(keep["event_type_old"].isna(),
                                   "added", "changed"),
            }
        )

    return (
        ds.map_batches(upto2, batch_format="pyarrow")
        .map_batches(
            _add_key_partition, fn_kwargs={"key": "user_id"},
            batch_format="pyarrow",
        )
        .groupby("partition_id")
        .map_groups(diff_per_user, batch_format="pandas")
    )


EVENTS_STATE_DIFF_SQL = f"""
WITH s1 AS (
  SELECT user_id, event_type FROM (
    SELECT user_id, event_type,
           row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE ts <= TIMESTAMP '{DIFF_TS1}') WHERE rn = 1
), s2 AS (
  SELECT user_id, event_type FROM (
    SELECT user_id, event_type,
           row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE ts <= TIMESTAMP '{DIFF_TS2}') WHERE rn = 1
)
SELECT s2.user_id,
       coalesce(s1.event_type, '') AS old_event_type,
       s2.event_type AS new_event_type,
       CASE WHEN s1.user_id IS NULL THEN 'added' ELSE 'changed' END AS change
FROM s2 LEFT JOIN s1 ON s1.user_id = s2.user_id
WHERE s1.user_id IS NULL OR s1.event_type <> s2.event_type
"""


# ------------------------------------------------- filter + global agg ------
def revenue_q6(sf_dir: str):
    """Selective filter + global sum (TPC-H Q6 shape): predicate pushdown
    at the read (filter expression), per-batch partial sums, tree-reduce
    final — no shuffle at all."""
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )
    lo = pa.scalar(pd.Timestamp("1996-01-01"), pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp("1997-01-01"), pa.timestamp("us"))

    def partial(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.and_(
                pc.and_(
                    pc.greater_equal(batch["l_shipdate"], lo),
                    pc.less(batch["l_shipdate"], hi),
                ),
                pc.and_(
                    pc.greater_equal(batch["l_discount"], pa.scalar(0.05)),
                    pc.less_equal(batch["l_discount"], pa.scalar(0.07)),
                ),
            ),
            pc.less(batch["l_quantity"], pa.scalar(24.0)),
        )
        f = batch.filter(mask)
        rev = _round_away(
            pc.multiply(
                pc.multiply(f["l_extendedprice"], f["l_discount"]), pa.scalar(100.0)
            )
        ).cast(pa.int64())
        return pa.table(
            {
                "revenue_cents": pa.array(
                    [pc.sum(rev).as_py() or 0], pa.int64()
                ),
                "n_rows": pa.array([f.num_rows], pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .aggregate(Sum("revenue_cents"), Sum("n_rows"))
    )
    return pa.table(
        {
            "revenue_cents": pa.array([agg["sum(revenue_cents)"] or 0], pa.int64()),
            "n_rows": pa.array([agg["sum(n_rows)"] or 0], pa.int64()),
        }
    )


REVENUE_Q6_SQL = """
SELECT CAST(coalesce(sum(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT)), 0) AS BIGINT)
           AS revenue_cents,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


# ------------------------------------------------------------ distinct ------
def distinct_priorities(sf_dir: str):
    """Global distinct (``unique`` op): per-batch partial distinct →
    grouped distinct → sort. The shuffle carries only distinct values."""
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderpriority"])

    def distinct(batch: pa.Table) -> pa.Table:
        return pa.table({"o_orderpriority": batch["o_orderpriority"].unique()})

    return (
        ds.map_batches(distinct, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .count()
        .select_columns(["o_orderpriority"])
        .sort("o_orderpriority")
    )


DISTINCT_PRIORITIES_SQL = """
SELECT DISTINCT o_orderpriority FROM orders ORDER BY o_orderpriority
"""


# ----------------------------------------------------------- anti join ------
def customers_without_orders(sf_dir: str, year: int = 1995):
    """Anti join (large ⟕̸ large, §2.4): customers that placed no order
    in ``year``. Neither side is broadcast: both are projected (and the
    order side row-filtered) AT THE READ, the order side pre-deduped per
    batch (the shuffle carries distinct keys, not order rows), tagged,
    and hash-co-partitioned on the customer key; each partition
    subtracts its order-key set from its customer rows in one vectorized
    ``isin`` pass. Flip the mask for a semi join."""
    import pyarrow.dataset as pads

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"])
    lo = pd.Timestamp(f"{year}-01-01")
    hi = pd.Timestamp(f"{year + 1}-01-01")
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey"],
        filter=(pads.field("o_orderdate") >= lo)
        & (pads.field("o_orderdate") < hi),
    )

    def tag_customers(batch: pa.Table) -> pa.Table:
        out = pa.table(
            {
                "key": batch["c_custkey"].cast(pa.int64()),
                "c_mktsegment": batch["c_mktsegment"],
                "side": pa.array(["cust"] * batch.num_rows, pa.string()),
            }
        )
        return _add_key_partition(out, "key")

    def tag_orders(batch: pa.Table) -> pa.Table:
        keys = batch["o_custkey"].cast(pa.int64()).unique()
        out = pa.table(
            {
                "key": keys,
                "c_mktsegment": pa.nulls(len(keys), pa.string()),
                "side": pa.array(["ord"] * len(keys), pa.string()),
            }
        )
        return _add_key_partition(out, "key")

    def anti(group: pd.DataFrame) -> pd.DataFrame:
        c = group[group["side"] == "cust"]
        have = group.loc[group["side"] == "ord", "key"].to_numpy()
        keep = c[~c["key"].isin(have)]
        return pd.DataFrame(
            {
                "c_custkey": keep["key"].astype("int64"),
                "c_mktsegment": keep["c_mktsegment"],
            }
        )

    return (
        cust.map_batches(tag_customers, batch_format="pyarrow")
        .union(orders.map_batches(tag_orders, batch_format="pyarrow"))
        .groupby("partition_id")
        .map_groups(anti, batch_format="pandas")
        .sort("c_custkey")
    )


CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT c_custkey, c_mktsegment
FROM customer
WHERE c_custkey NOT IN (
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= DATE '1995-01-01'
      AND o_orderdate <  DATE '1996-01-01')
ORDER BY c_custkey
"""


# ------------------------------------------------------ left outer join -----
def customer_order_counts(sf_dir: str, method: str = "broadcast"):
    """Left-outer join: every customer with their order count (0 when no
    orders). The fact side is pre-aggregated per key (two-phase) BEFORE
    anything else, so whichever join runs carries one row per customer
    with orders, not one per order.

    ``method="broadcast"`` (default): the aggregated counts (bounded by
    distinct customers, ≪ orders) are collected once, ``ray.put`` once,
    and mapped over the streaming customer scan — measured ~4× faster
    than ``Dataset.join`` at sf0.1 because the join's repartition cost
    dwarfs the 1,500-row merge. ``method="join"`` keeps the shuffle
    left-outer join for when even the per-customer aggregate outgrows a
    single broadcast object."""
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().groupby("o_custkey").size().reset_index(name="n")
        return pa.Table.from_pandas(df, preserve_index=False)

    counts = (
        orders.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("o_custkey")
        .aggregate(Sum("n", alias_name="n_orders"))
    )
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])

    if method == "broadcast":
        import numpy as np

        rows = counts.take_all()
        keys = np.fromiter((r["o_custkey"] for r in rows), dtype=np.int64,
                           count=len(rows))
        vals = np.fromiter((r["n_orders"] for r in rows), dtype=np.int64,
                           count=len(rows))
        order = np.argsort(keys)
        ref = ray.put((keys[order], vals[order]))

        def attach_counts(batch: pa.Table, lookup_ref=None) -> pa.Table:
            keys, vals = ray.get(lookup_ref)
            ck = batch["c_custkey"].to_numpy()
            if len(keys):
                pos = np.clip(np.searchsorted(keys, ck), 0, len(keys) - 1)
                n = np.where(keys[pos] == ck, vals[pos], 0)
            else:
                n = np.zeros(len(ck), dtype=np.int64)
            return pa.table(
                {
                    "c_custkey": batch["c_custkey"],
                    "n_orders": pa.array(n, pa.int64()),
                }
            )

        return cust.map_batches(
            attach_counts,
            fn_kwargs={"lookup_ref": ref},
            batch_format="pyarrow",
            batch_size=65536,
        )

    joined = cust.join(
        counts,
        join_type="left_outer",
        num_partitions=8,
        on=("c_custkey",),
        right_on=("o_custkey",),
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": batch["c_custkey"],
                "n_orders": pc.coalesce(
                    batch["n_orders"], pa.scalar(0, pa.int64())
                ).cast(pa.int64()),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


CUSTOMER_ORDER_COUNTS_SQL = """
SELECT c.c_custkey AS c_custkey, count(o.o_custkey) AS n_orders
FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_custkey
"""


# ------------------------------------------------------- session window -----
SESSION_GAP_MIN = 30


def events_sessionize(sf_dir: str, gap_minutes: int = SESSION_GAP_MIN):
    """Session windows per user (gap > ``gap_minutes`` starts a new
    session): groupby(user) + in-group sort, vectorized gap/cumsum —
    the windowed-aggregate op the reference lacks (SURVEY §2.8)."""
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )
    gap = pd.Timedelta(minutes=gap_minutes)

    def sessions_per_user(group: pd.DataFrame) -> pd.DataFrame:
        """Vectorized over ALL users in one hash partition: session
        boundaries are user changes or >gap silences; one groupby over
        (user, session) aggregates every session in the partition."""
        g = group.sort_values(["user_id", "ts", "event_id"], kind="stable")
        new_user = g["user_id"].ne(g["user_id"].shift())
        new_session = new_user | (g["ts"].diff() > gap)
        sid = new_session.cumsum()
        out = g.groupby(sid).agg(
            user_id=("user_id", "first"),
            session_start=("ts", "min"),
            session_end=("ts", "max"),
            n_events=("ts", "size"),
        )
        out["n_events"] = out["n_events"].astype("int64")
        return out.reset_index(drop=True)

    return (
        ds.map_batches(
            _add_key_partition, fn_kwargs={"key": "user_id"},
            batch_format="pyarrow",
        )
        .groupby("partition_id")
        .map_groups(sessions_per_user, batch_format="pandas")
    )


def _interval_followers(group: pd.DataFrame, w_us: np.int64) -> pd.DataFrame:
    """Per-partition kernel for :func:`events_interval_join` (module
    level so the int64-overflow fallback is unit-testable)."""
    g = group.sort_values(["user_id", "ts", "event_id"], kind="stable")
    t = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
    u = g["user_id"].to_numpy(np.int64)
    # dense user rank × a span wide enough that (t + W) never
    # crosses into the next user's key range → plain searchsorted
    # answers the per-user window query over the whole partition
    _, r = np.unique(u, return_inverse=True)
    t0 = t.min() if len(t) else np.int64(0)
    span = (t.max() - t0 if len(t) else np.int64(0)) + w_us + 1
    n_ranks = int(r[-1]) + 1 if len(r) else 0
    if n_ranks * int(span) < np.iinfo(np.int64).max:
        key = r.astype(np.int64) * span + (t - t0)
        lo = np.searchsorted(key, key, side="right")  # strictly later
        hi = np.searchsorted(key, key + w_us, side="right")
    else:
        # rank × span would wrap int64 (many users over a very wide
        # time range in one partition): per-user searchsorted slices
        # — same O(n log n), just segmented
        lo = np.empty(len(t), dtype=np.int64)
        hi = np.empty(len(t), dtype=np.int64)
        starts = np.flatnonzero(np.r_[True, r[1:] != r[:-1]])
        ends = np.r_[starts[1:], len(r)]
        for s, e in zip(starts, ends):
            seg = t[s:e]
            lo[s:e] = s + np.searchsorted(seg, seg, side="right")
            hi[s:e] = s + np.searchsorted(seg, seg + w_us, side="right")
    n = (hi - lo).astype("int64")
    keep = n > 0
    return pd.DataFrame({
        "event_id": g["event_id"].to_numpy(np.int64)[keep],
        "n_following": n[keep],
    })


def events_interval_join(sf_dir: str, window_minutes: int = 5):
    """Stream-stream interval self-join: for every event, how many of
    the SAME user's events land strictly later but within
    ``window_minutes`` — the follow-up/burst signal a streaming engine
    answers with a windowed join. Events co-locate per user in bounded
    hash partitions; inside a partition the pair counting is TWO
    ``searchsorted`` calls over one composite (user-rank, µs) key —
    never a pair materialization, so a W-dense user costs O(n log n),
    not O(n·W). Emits ``(event_id, n_following)`` for events with ≥1
    follower (inner-join count semantics, matching the SQL oracle)."""
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )
    w_us = np.int64(window_minutes) * 60 * 1_000_000

    def count_followers(group: pd.DataFrame) -> pd.DataFrame:
        return _interval_followers(group, w_us)

    return (
        ds.map_batches(
            _add_key_partition, fn_kwargs={"key": "user_id"},
            batch_format="pyarrow",
        )
        .groupby("partition_id")
        .map_groups(count_followers, batch_format="pandas")
    )


EVENTS_INTERVAL_JOIN_SQL = """
SELECT a.event_id, CAST(count(*) AS BIGINT) AS n_following
FROM events a
JOIN events b
  ON b.user_id = a.user_id
 AND b.ts > a.ts
 AND b.ts <= a.ts + INTERVAL 5 MINUTE
GROUP BY a.event_id
"""


EVENTS_SESSIONIZE_SQL = f"""
SELECT min(user_id) AS user_id, min(ts) AS session_start,
       max(ts) AS session_end, count(*) AS n_events
FROM (
  SELECT user_id, ts,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM (
    SELECT user_id, event_id, ts,
           CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     IS NULL
                  OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     > INTERVAL {SESSION_GAP_MIN} MINUTE
                THEN 1 ELSE 0 END AS is_new
    FROM events
  )
)
GROUP BY user_id, session_id
"""


# ------------------------------------------ salted two-phase aggregate ------
def events_user_counts_salted(sf_dir: str, salt_buckets: int = 8):
    """Per-user event counts via EXPLICIT salting: partial aggregate on
    ``(user_id, salt)`` (a hot user's rows spread across ``salt_buckets``
    reducers), then final aggregate on ``user_id`` over the tiny partial
    table — the hot-key/two-phase pattern the north rule mandates
    (SURVEY §2.5). Result is identical to a direct groupby; what changes
    is that no single reducer ever owns all rows of a hot key."""
    from ..shuffle_utils import salt_column

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    salted = ds.map_batches(
        salt_column,
        fn_kwargs={"key": "user_id", "salt_buckets": salt_buckets},
        batch_format="pyarrow",
    )
    partial = (
        salted.groupby(["user_id", "salt"])
        .aggregate(Count(alias_name="n_partial"))
    )
    return (
        partial.groupby("user_id")
        .aggregate(Sum("n_partial", alias_name="n_events"))
    )


EVENTS_USER_COUNTS_SQL = """
SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id
"""


# ------------------------------------------------- deterministic sample -----
def lineitem_sample(sf_dir: str, modulus: int = 20, residue: int = 7):
    """Deterministic systematic sample (~1/modulus of orders): keyed
    residue filter inside ``map_batches`` — reproducible across runs and
    cluster sizes, unlike ``random_sample`` (which exists for the
    non-reproducible case)."""
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_linenumber"]
    )

    def keep(batch: pa.Table) -> pa.Table:
        mask = pc.equal(
            pc.subtract(
                batch["l_orderkey"],
                pc.multiply(
                    pc.divide(batch["l_orderkey"], pa.scalar(modulus, pa.int64())),
                    pa.scalar(modulus, pa.int64()),
                ),
            ),
            pa.scalar(residue, pa.int64()),
        )
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")


LINEITEM_SAMPLE_SQL = """
SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_orderkey % 20 = 7
"""


# --------------------------------------------------------------- union ------
def region_nation_names(sf_dir: str):
    """``Dataset.union`` of two sources into one keyed output (bag
    semantics, like SQL UNION ALL), tagged with provenance."""
    regions = rd.read_parquet(f"{sf_dir}/region.parquet", columns=["r_name"])
    nations = rd.read_parquet(f"{sf_dir}/nation.parquet", columns=["n_name"])

    def tag(col: str, src: str):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "name": batch[col],
                    "src": pa.array([src] * batch.num_rows, pa.string()),
                }
            )

        return fn

    return (
        regions.map_batches(tag("r_name", "region"), batch_format="pyarrow")
        .union(nations.map_batches(tag("n_name", "nation"), batch_format="pyarrow"))
        .sort(["name", "src"])
    )


REGION_NATION_NAMES_SQL = """
SELECT name, src FROM (
  SELECT r_name AS name, 'region' AS src FROM region
  UNION ALL
  SELECT n_name AS name, 'nation' AS src FROM nation
) ORDER BY name, src
"""


# ------------------------------------------------------ running total -------
def customer_running_totals(sf_dir: str):
    """Per-customer cumulative order value (a per-key ordered window):
    bounded hash partitions, one vectorized sort + grouped cumsum per
    partition — never a map_groups per customer."""
    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )

    def to_cents(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "o_custkey": batch["o_custkey"],
                "o_orderdate": batch["o_orderdate"],
                "total_cents": _cents(batch["o_totalprice"]),
            }
        )

    def running(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(
            ["o_custkey", "o_orderdate", "o_orderkey"], kind="stable"
        )
        g = g.assign(
            running_cents=g.groupby("o_custkey", sort=False)["total_cents"].cumsum()
        )
        return g[["o_orderkey", "o_custkey", "running_cents"]]

    return (
        ds.map_batches(to_cents, batch_format="pyarrow")
        .map_batches(
            _add_key_partition, fn_kwargs={"key": "o_custkey"},
            batch_format="pyarrow",
        )
        .groupby("partition_id")
        .map_groups(running, batch_format="pandas")
    )


CUSTOMER_RUNNING_TOTALS_SQL = """
SELECT o_orderkey, o_custkey,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
           OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents
FROM orders
"""


# ----------------------------------------------------- per-group top-k ------
def events_top_users_per_type(sf_dir: str, k: int = 3):
    """Top-k users by event count within each event_type: two-phase
    count on the composite key (the heavy, corpus-scale step), then a
    per-type top-k — grouped on ``event_type`` directly because the type
    vocabulary is small and bounded (per-group map_groups is fine ONLY
    for bounded-cardinality keys)."""
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = (
            batch.to_pandas()
            .groupby(["event_type", "user_id"])
            .size()
            .reset_index(name="n")
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    counts = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby(["event_type", "user_id"])
        .aggregate(Sum("n", alias_name="n_events"))
    )

    def topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(
            ["n_events", "user_id"], ascending=[False, True], kind="stable"
        ).head(k)
        g = g.assign(rank=np.arange(1, len(g) + 1, dtype="int64"))
        return g[["event_type", "user_id", "n_events", "rank"]]

    return counts.groupby("event_type").map_groups(topk, batch_format="pandas")


EVENTS_TOP_USERS_SQL = """
SELECT event_type, user_id, n_events, rank FROM (
  SELECT event_type, user_id, n_events,
         CAST(row_number() OVER (PARTITION BY event_type
                                 ORDER BY n_events DESC, user_id) AS BIGINT) AS rank
  FROM (SELECT event_type, user_id, count(*) AS n_events
        FROM events GROUP BY event_type, user_id)
) WHERE rank <= 3
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


# ------------------------------------------------- grouped quantiles --------
def events_value_quantiles(sf_dir: str):
    """Exact discrete p50/p90 of value (cents) per event_type, computed
    from per-value COUNTS so nothing row-scale ever co-locates: the
    shuffle carries ``(event_type, value_cents) → n`` partials (bounded
    by the distinct-value domain, ≪ rows at scale), and the final
    per-type pass walks the sorted value histogram to the target rank.
    DuckDB's ``quantile_disc`` picks ``sorted[ceil(n·p) − 1]`` —
    reproduced exactly so the hash-compare is deterministic."""
    import math

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def partial_counts(batch: pa.Table) -> pa.Table:
        df = pa.table(
            {"event_type": batch["event_type"], "value_cents": _cents(batch["value"])}
        ).to_pandas()
        g = (
            df.groupby(["event_type", "value_cents"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    # merge partial counts in BOUNDED partitions (hash of the composite
    # key), one vectorized pandas sum per partition — a groupby/aggregate
    # keyed by (type, value) directly would pay Ray's per-group overhead
    # once per distinct value (measured 5.7 s vs 1.3 s at sf0.1)
    def add_vq_pid(batch: pa.Table) -> pa.Table:
        key = batch["value_cents"]
        pid = pc.subtract(
            key,
            pc.multiply(pc.divide(key, pa.scalar(64, pa.int64())),
                        pa.scalar(64, pa.int64())),
        ).cast(pa.int32())
        return batch.append_column("vq_pid", pid)

    def merge_counts(group):
        g = (
            group.groupby(["event_type", "value_cents"], sort=False)["n"]
            .sum()
            .reset_index()
        )
        return g

    counts = (
        ds.map_batches(partial_counts, batch_format="pyarrow", batch_size=65536)
        .map_batches(add_vq_pid, batch_format="pyarrow")
        .groupby("vq_pid")
        .map_groups(merge_counts, batch_format="pandas")
    )

    def quantiles_from_histogram(group):
        import pandas as pd

        g = group.sort_values("value_cents", ignore_index=True)
        v = g["value_cents"].to_numpy()
        c = g["n"].to_numpy()
        cum = np.cumsum(c)
        n = int(cum[-1])

        def qd(p):
            rank = max(1, math.ceil(n * p))  # 1-based target rank
            return int(v[np.searchsorted(cum, rank)])

        return pd.DataFrame(
            {
                "event_type": [group["event_type"].iloc[0]],
                "p50_cents": [qd(0.5)],
                "p90_cents": [qd(0.9)],
            }
        )

    return counts.groupby("event_type").map_groups(
        quantiles_from_histogram, batch_format="pandas"
    )


EVENTS_QUANTILES_SQL = """
SELECT event_type,
       quantile_disc(CAST(round(value * 100) AS BIGINT), 0.5) AS p50_cents,
       quantile_disc(CAST(round(value * 100) AS BIGINT), 0.9) AS p90_cents
FROM events
GROUP BY event_type
"""


# ------------------------------------------------------- range join ---------
VALUE_BUCKETS = (  # (name, lo_cents, hi_cents) — inclusive bounds
    ("low", 0, 999),
    ("mid", 1000, 4999),
    ("high", 5000, 10_000_000),
)


def events_range_join(sf_dir: str):
    """Range join of the events stream against a small interval table
    (the brief's range-join operator): bucket bounds are broadcast and
    each batch assigns rows via a vectorized ``searchsorted`` on the
    interval starts — a shuffle-free broadcast range join. At scale the
    small side stays a handful of intervals; only the grouped aggregate
    shuffles (bounded by bucket count)."""
    import numpy as np

    los = np.array([b[1] for b in VALUE_BUCKETS], dtype=np.int64)
    his = np.array([b[2] for b in VALUE_BUCKETS], dtype=np.int64)
    names = np.array([b[0] for b in VALUE_BUCKETS], dtype=object)

    def assign(batch: pa.Table) -> pa.Table:
        cents = _cents(batch["value"]).to_numpy()
        idx = np.searchsorted(los, cents, side="right") - 1
        idx = np.clip(idx, 0, len(los) - 1)
        inside = (cents >= los[idx]) & (cents <= his[idx])
        return pa.table(
            {
                "bucket": pa.array(names[idx][inside], pa.string()),
                "value_cents": pa.array(cents[inside], pa.int64()),
            }
        )

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
    return (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(
            Count(alias_name="n_events"),
            Sum("value_cents", alias_name="value_cents"),
        )
    )


EVENTS_RANGE_JOIN_SQL = """
SELECT b.bucket AS bucket, count(*) AS n_events,
       CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events e
JOIN (VALUES ('low', 0, 999), ('mid', 1000, 4999),
             ('high', 5000, 10000000)) AS b(bucket, lo, hi)
  ON CAST(round(e.value * 100) AS BIGINT) BETWEEN b.lo AND b.hi
GROUP BY b.bucket
"""


# ----------------------------------------------- HyperLogLog sketch ---------
def _hll_registers(hashes, m: int = 4096):
    """Register array for one batch of 64-bit hashes (numpy)."""
    import numpy as np

    h = np.asarray(hashes, dtype=np.uint64)
    reg_idx = (h & np.uint64(m - 1)).astype(np.int64)
    rest = h >> np.uint64(12)  # log2(m) = 12
    # rank = leading-zero position of the remaining 52 bits + 1; count
    # via bit_length: rank = 53 - bit_length(rest)
    bl = np.zeros(len(h), dtype=np.int64)
    nz = rest > 0
    bl[nz] = np.floor(np.log2(rest[nz].astype(np.float64))).astype(np.int64) + 1
    rank = 53 - bl
    regs = np.zeros(m, dtype=np.int8)
    np.maximum.at(regs, reg_idx, rank.astype(np.int8))
    return regs


def approx_distinct_users(sf_dir: str, m: int = 4096):
    """Approximate distinct ``user_id`` count via a HyperLogLog sketch
    (the brief's "novel sketch" operator): each batch folds its hashes
    into an ``m``-register array (a few KB), partial registers merge by
    elementwise max — a tree-reduce, never a shuffle of user ids. The
    relative error is ~1.04/√m ≈ 1.6 % at m=4096; the pytest gate
    asserts the bound against the exact count. Rows-only entry (an
    approximate result can't hash-match an exact SQL oracle)."""
    import numpy as np

    def partial(batch: pa.Table) -> pa.Table:
        import hashlib as hl

        ids = batch["user_id"].to_numpy()
        hashes = np.fromiter(
            (
                int.from_bytes(
                    hl.blake2b(int(u).to_bytes(8, "little"), digest_size=8).digest(),
                    "big",
                )
                for u in ids
            ),
            dtype=np.uint64,
            count=len(ids),
        )
        regs = _hll_registers(hashes, m)
        return pa.table({"registers": pa.array([regs.tolist()], pa.list_(pa.int8()))})

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    import numpy as np

    regs = np.zeros(m, dtype=np.int8)
    for row in parts.iter_rows():  # num_batches tiny rows, 4 KB each
        regs = np.maximum(regs, np.asarray(row["registers"], dtype=np.int8))
    # standard HLL estimator with small-range correction
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return pa.table(
        {
            "approx_distinct_users": pa.array([int(round(est))], pa.int64()),
            "m": pa.array([m], pa.int64()),
        }
    )


# ------------------------------------------------ Q3 shipping priority ------
def q3_shipping_priority(sf_dir: str, segment: str = "BUILDING",
                         cutoff: str = "1997-01-01", k: int = 10):
    """TPC-H Q3 shape: 3-table composition (customer ⋈ orders ⋈
    lineitem) with the scale-shape choices made explicit — the small
    side (segment customers) broadcasts as an id set; lineitem
    pre-aggregates revenue per orderkey BEFORE the join, so the hash
    join is mid × mid rather than large × mid; top-k with deterministic
    tie-breaks. Money is integer cents throughout."""
    import numpy as np

    import ray

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"],
    ).map_batches(
        lambda b: b.filter(pc.equal(b["c_mktsegment"], segment)),
        batch_format="pyarrow",
    ).select_columns(["c_custkey"]).to_pandas()
    keys_ref = ray.put(frozenset(cust["c_custkey"].tolist()))
    cut = pa.scalar(np.datetime64(cutoff, "s"), pa.timestamp("s"))

    def orders_side(batch: pa.Table) -> pa.Table:
        keys = ray.get(keys_ref)
        mask = pa.array(
            [k_ in keys for k_ in batch["o_custkey"].to_pylist()],
            pa.bool_(),
        )
        t = batch.filter(
            pc.and_(mask, pc.less(batch["o_orderdate"].cast(
                pa.timestamp("s")), cut))
        )
        return t.select(["o_orderkey", "o_orderdate", "o_orderpriority"])

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate",
                 "o_orderpriority"],
    ).map_batches(orders_side, batch_format="pyarrow")

    def li_partial(batch: pa.Table) -> pa.Table:
        t = batch.filter(
            pc.greater(batch["l_shipdate"].cast(pa.timestamp("s")), cut)
        )
        rev = _round_away(
            pc.multiply(
                pc.multiply(
                    t["l_extendedprice"],
                    pc.subtract(pa.scalar(1.0), t["l_discount"]),
                ),
                pa.scalar(100.0),
            )
        ).cast(pa.int64())
        df = pa.table(
            {"l_orderkey": t["l_orderkey"], "revenue_cents": rev}
        ).to_pandas()
        g = df.groupby("l_orderkey", sort=False)["revenue_cents"] \
            .sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    li = (
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_extendedprice", "l_discount",
                     "l_shipdate"],
        )
        .map_batches(li_partial, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"))
    )
    joined = li.join(
        orders,
        join_type="inner",
        num_partitions=8,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    out = joined.sort(
        [("revenue_cents"), ("o_orderdate"), ("l_orderkey")],
        descending=[True, False, False],
    ).limit(k).to_pandas()
    return out[["l_orderkey", "o_orderdate", "o_orderpriority",
                "revenue_cents"]]


Q3_SHIPPING_PRIORITY_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority, revenue_cents FROM (
  SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
         CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                       AS BIGINT)) AS BIGINT) AS revenue_cents
  FROM customer c
  JOIN orders o ON c.c_custkey = o.o_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE c.c_mktsegment = 'BUILDING'
    AND o.o_orderdate < DATE '1997-01-01'
    AND l.l_shipdate > DATE '1997-01-01'
  GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
)
ORDER BY revenue_cents DESC, o_orderdate, l_orderkey LIMIT 10
"""


def approx_quantiles_price(
    sf_dir: str,
    qs=(0.01, 0.25, 0.5, 0.75, 0.99),
    target_sample: int = 65536,
    seed: int = 17,
):
    """Approximate quantiles of a CONTINUOUS high-cardinality column
    (``l_extendedprice`` cents) via a mergeable deterministic-sample
    sketch — the missing member of the sketch family next to HLL
    (distinct) and Count-Min (heavy hitters). ``events_quantiles``'s
    exact per-value count-merge needs bounded value cardinality; this
    works at any cardinality:

    pass 1 counts rows (parquet metadata); pass 2 keeps each row iff
    ``splitmix64(row_key ^ seed) < p·2^64`` with ``p =
    target_sample/n`` — a pure function of the row KEY, so the sample
    is deterministic, batch/cluster-invariant and globally uniform;
    partials merge by concatenation (equal weights). The driver sorts
    ~``target_sample`` scalars and reads type-1 empirical quantiles.
    Rank error ~ sqrt(q(1-q)/m): ≲0.3 % at 64k samples (pytest-gated
    against the exact quantiles). Rows-only entry (a sampled result
    can't hash-match an exact SQL oracle)."""
    import numpy as np

    from ..functions.shards import _mix64

    path = f"{sf_dir}/lineitem.parquet"
    ds = rd.read_parquet(path, columns=["l_orderkey", "l_linenumber",
                                        "l_extendedprice"])
    n = ds.count()  # metadata-only
    if n == 0:
        raise ValueError("cannot sketch quantiles of an empty table")
    p = min(1.0, target_sample / n)
    # uint64 threshold without the C-long overflow at p == 1
    threshold = (
        np.uint64(0xFFFFFFFFFFFFFFFF)
        if p >= 1.0
        else np.uint64(int(p * float(2**63)) * 2)
    )
    salt = np.uint64(seed)

    def sample_batch(batch: pa.Table) -> pa.Table:
        # row key: the table's natural composite primary key, folded
        key = (
            batch["l_orderkey"].to_numpy(zero_copy_only=False)
            .astype(np.uint64) * np.uint64(8)
            + batch["l_linenumber"].to_numpy(zero_copy_only=False)
            .astype(np.uint64)
        )
        keep = _mix64(key ^ salt) <= threshold
        vals = batch["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
        return pa.table({"v": pa.array(vals.astype(np.int64), pa.int64())})

    sample = np.array(
        [r["v"] for r in
         ds.map_batches(sample_batch, batch_format="pyarrow").iter_rows()],
        dtype=np.int64,
    )
    if not len(sample):
        raise ValueError("sample came back empty; raise target_sample")
    sample.sort()
    out_q, out_v = [], []
    for q in qs:
        idx = min(len(sample) - 1, int(np.ceil(q * len(sample))) - 1)
        idx = max(idx, 0)
        out_q.append(int(round(q * 100)))
        out_v.append(int(sample[idx]))
    return pa.table(
        {
            "q_pct": pa.array(out_q, pa.int64()),
            "price_cents": pa.array(out_v, pa.int64()),
            "n_rows": pa.array([int(n)] * len(out_q), pa.int64()),
            "n_sampled": pa.array([int(len(sample))] * len(out_q),
                                  pa.int64()),
        }
    )
