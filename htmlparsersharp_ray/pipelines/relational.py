"""Relational operator demos over the TPC-H-ish test tables.

The reference is a transform library with NO relational operators
(SURVEY.md §2.6) — these exist to exercise the engine-level primitives the
north_rule needs around the per-turn transform: pruned reads, vectorized
filters/projections, partial aggregation before groupby, broadcast joins,
sort/limit, distinct, windowed aggregates. Each function takes ``sf_dir``
and returns a small result; each has a matching oracle in
``__ray_entry__.oracle_sql``.

Column names are chosen to match the oracle SQL exactly (driver compares
sorted-by-name value hashes).
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Sum


def _t(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def q_lineitem_agg(sf_dir: str):
    """TPC-H Q1 shape: grouped aggregate with a computed revenue column.
    Pre-aggregation happens inside Ray's hash aggregate; the read is pruned
    to the 6 needed columns."""
    ds = ray.data.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount"],
    )

    def add_revenue(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
        )
        return batch.append_column("revenue", rev)

    out = (
        ds.map_batches(add_revenue, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("l_extendedprice", alias_name="sum_base_price"),
            Sum("revenue", alias_name="sum_revenue"),
            Mean("l_discount", alias_name="avg_disc"),
            Count(alias_name="count_order"),
        )
    )
    df = out.to_pandas().sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)
    df["count_order"] = df["count_order"].astype("int64")
    return df


def q_filter_project(sf_dir: str):
    """Pruned read + vectorized filter + projection (no shuffle)."""
    cutoff = pd.Timestamp("1995-06-01")
    ds = ray.data.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_linenumber", "l_shipdate", "l_quantity"],
    )

    def f(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.greater_equal(batch.column("l_shipdate"), pa.scalar(cutoff)),
            pc.greater(batch.column("l_quantity"), pa.scalar(40.0)),
        )
        t = batch.filter(mask)
        return t.select(["l_orderkey", "l_linenumber", "l_quantity"])

    return ds.map_batches(f, batch_format="pyarrow")


def q_orders_topk(sf_dir: str):
    """Global sort + limit (top-k)."""
    ds = ray.data.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_totalprice", "o_orderdate"]
    )
    out = ds.sort("o_totalprice", descending=True).limit(10)
    return out.to_pandas()


def q_join_broadcast(sf_dir: str):
    """Orders ⋈ customer with the small side broadcast via ray.put — the
    scale pattern for dimension joins (no shuffle; ray_guide joins)."""
    cust = ray.data.read_parquet(
        _t(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"]
    ).to_pandas()
    lookup_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_mktsegment"])))

    class JoinSegment:
        def __init__(self):
            self.lookup = ray.get(lookup_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            batch["c_mktsegment"] = batch["o_custkey"].map(self.lookup)
            return batch

    ds = ray.data.read_parquet(
        _t(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"]
    )
    out = (
        ds.map_batches(JoinSegment, batch_format="pandas", concurrency=(1, 2))
        .groupby("c_mktsegment")
        .aggregate(
            Sum("o_totalprice", alias_name="total_price"),
            Count(alias_name="n_orders"),
        )
    )
    df = out.to_pandas().sort_values("c_mktsegment").reset_index(drop=True)
    df["n_orders"] = df["n_orders"].astype("int64")
    return df


def q_join_nation_region(sf_dir: str):
    """Two-level broadcast join: nation → region name, counted."""
    region = ray.data.read_parquet(_t(sf_dir, "region")).to_pandas()
    rmap_ref = ray.put(dict(zip(region["r_regionkey"], region["r_name"])))

    class AddRegion:
        def __init__(self):
            self.rmap = ray.get(rmap_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            batch["r_name"] = batch["n_regionkey"].map(self.rmap)
            return batch[["n_name", "r_name"]]

    ds = ray.data.read_parquet(_t(sf_dir, "nation"))
    out = (
        ds.map_batches(AddRegion, batch_format="pandas", concurrency=1)
        .groupby("r_name")
        .aggregate(Count(alias_name="n_nations"))
    )
    df = out.to_pandas().sort_values("r_name").reset_index(drop=True)
    df["n_nations"] = df["n_nations"].astype("int64")
    return df


def q_events_window(sf_dir: str):
    """Tumbling 1-hour window aggregate per event_type — the stream-shaped
    operator expressed as a grouped aggregate over a derived window key
    (ray_guide: streaming-shaped workloads)."""
    ds = ray.data.read_parquet(
        _t(sf_dir, "events"), columns=["event_type", "ts", "value"]
    )

    def add_window(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch.column("ts"), unit="hour")
        return batch.append_column("window_start", hour)

    out = (
        ds.map_batches(add_window, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(
            Sum("value", alias_name="sum_value"),
            Count(alias_name="n_events"),
        )
    )
    df = out.to_pandas().sort_values(["event_type", "window_start"]).reset_index(drop=True)
    df["n_events"] = df["n_events"].astype("int64")
    return df


def q_distinct(sf_dir: str):
    """Distinct values (shuffle-light: tiny cardinality)."""
    ds = ray.data.read_parquet(_t(sf_dir, "events"), columns=["event_type"])
    vals = sorted(ds.unique("event_type"))
    return pd.DataFrame({"event_type": vals})


def q_union_limit(sf_dir: str):
    """Union + count: supplier ∪ customer keys as a single id column."""
    sup = ray.data.read_parquet(_t(sf_dir, "supplier"), columns=["s_suppkey"])
    cust = ray.data.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey"])
    sup = sup.map_batches(
        lambda t: pa.table({"key": t.column("s_suppkey")}), batch_format="pyarrow"
    )
    cust = cust.map_batches(
        lambda t: pa.table({"key": t.column("c_custkey")}), batch_format="pyarrow"
    )
    n = sup.union(cust).count()
    return pd.DataFrame({"n_keys": [n]})


def q_part_stats(sf_dir: str):
    """Per-brand part statistics (min/max/mean)."""
    ds = ray.data.read_parquet(
        _t(sf_dir, "part"), columns=["p_brand", "p_retailprice", "p_size"]
    )
    out = ds.groupby("p_brand").aggregate(
        Min("p_retailprice", alias_name="min_price"),
        Max("p_retailprice", alias_name="max_price"),
        Mean("p_size", alias_name="avg_size"),
        Count(alias_name="n_parts"),
    )
    df = out.to_pandas().sort_values("p_brand").reset_index(drop=True)
    df["n_parts"] = df["n_parts"].astype("int64")
    return df


def q_events_sessions(sf_dir: str):
    """Session windows (30-min inactivity gap) per user — the stream-shaped
    custom operator: partition by key, order by time inside the group, and
    segment on gaps (ray_guide: streaming-shaped workloads; SURVEY.md §2
    custom operators). Deterministic tie-break on (ts, event_id)."""
    gap = pd.Timedelta(minutes=30)
    ds = ray.data.read_parquet(
        _t(sf_dir, "events"), columns=["user_id", "event_id", "ts", "value"]
    )

    def sessions(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["ts", "event_id"])
        new_session = (g["ts"].diff() > gap) | g["ts"].diff().isna()
        g["session_no"] = new_session.cumsum()
        out = (
            g.groupby("session_no")
            .agg(
                user_id=("user_id", "first"),
                session_start=("ts", "min"),
                n_events=("event_id", "count"),
                sum_value=("value", "sum"),
            )
            .reset_index(drop=True)
        )
        out["n_events"] = out["n_events"].astype("int64")
        return out

    out = ds.groupby("user_id").map_groups(sessions, batch_format="pandas")
    return (
        out.to_pandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )


def q_topk_per_group(sf_dir: str):
    """Grouped top-k: 3 highest-value orders per market segment —
    broadcast dimension join + per-group head after sort."""
    cust = ray.data.read_parquet(
        _t(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"]
    ).to_pandas()
    lookup_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_mktsegment"])))

    class AddSegment:
        def __init__(self):
            self.lookup = ray.get(lookup_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            batch["c_mktsegment"] = batch["o_custkey"].map(self.lookup)
            return batch[["c_mktsegment", "o_orderkey", "o_totalprice"]]

    def topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True]
        ).head(3)
        g = g.reset_index(drop=True)
        g["rank"] = range(1, len(g) + 1)
        g["rank"] = g["rank"].astype("int64")
        return g

    ds = ray.data.read_parquet(
        _t(sf_dir, "orders"), columns=["o_custkey", "o_orderkey", "o_totalprice"]
    )
    out = (
        ds.map_batches(AddSegment, batch_format="pandas", concurrency=(1, 2))
        .groupby("c_mktsegment")
        .map_groups(topk, batch_format="pandas")
    )
    return (
        out.to_pandas()
        .sort_values(["c_mktsegment", "rank"])
        .reset_index(drop=True)
    )


def q_order_revenue_top10(sf_dir: str):
    """TPC-H Q3 shape: lineitem ⋈ orders (broadcast) → revenue per order,
    top 10 by revenue. The orders side is the broadcast dimension; at a
    scale where orders no longer fits a worker, this becomes the bucketed
    hash join (ray_guide joins)."""
    orders = ray.data.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_orderdate"]
    ).to_pandas()

    ds = ray.data.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    # High-cardinality aggregate: Ray's groupby().aggregate() costs ~1 ms
    # PER GROUP (measured 16 s for 15k groups) — pre-aggregate per batch,
    # then merge partials in one task. At a cardinality where the merged
    # partials exceed one worker, the merge becomes the salted-bucket
    # exchange used by the flagship pipeline instead.
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b["revenue"] = b["l_extendedprice"] * (1 - b["l_discount"])
        return b.groupby("l_orderkey", as_index=False)["revenue"].sum()

    def merge(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("l_orderkey", as_index=False)["revenue"].sum()

    df = (
        ds.map_batches(partial, batch_format="pandas")
        .repartition(1)
        .map_batches(merge, batch_format="pandas", batch_size=None)
        .to_pandas()
    )
    dates = dict(zip(orders["o_orderkey"], orders["o_orderdate"]))
    df["o_orderdate"] = df["l_orderkey"].map(dates)
    out = df.sort_values(["revenue", "l_orderkey"], ascending=[False, True]).head(10)
    return out.reset_index(drop=True)
