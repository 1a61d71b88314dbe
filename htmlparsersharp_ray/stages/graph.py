"""Distributed graph analytics over edge Datasets.

Companion to the connected-components op (``stages/dedup.py::
dup_clusters``, min-label propagation): this module holds the
POWER-ITERATION family — an integer-exact distributed PageRank over a
directed edge Dataset — plus the co-occurrence edge builder that turns
a ``(group, item)`` table into a graph (items sharing a group link to
each other), the standard way a relational fact table becomes a graph
(parts co-purchased in an order, terms co-occurring in a doc).

Everything is fixed-point int64 arithmetic: ranks carry a 1e6 scale,
each edge's contribution floor-divides by the source's out-degree
BEFORE any summation, and the damping step is one integer multiply +
floor-divide applied once per node per iteration. Every operation is
order-independent, so the result is BITWISE identical at any
parallelism AND expressible in ANSI SQL — the driver oracle unrolls
the K iterations as chained CTEs with the same integer expressions.

Scale shape: out-degrees attach in ONE bounded src-bucket exchange
(reused, materialized once); each iteration is exactly two bounded
bucket groupbys (rank·edge join + per-dst partial sums, then the
final per-node sum), mirroring a Pregel superstep. Driver memory is
O(1) — ranks live in the object store as a bucket-partitioned
Dataset. No reference-engine counterpart (engine-level extension,
like dup_clusters).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from .dedup import _ibucket, _pair_bucket

_EDGE_SCHEMA = pa.schema([
    ("kb", pa.int64()),      # shuffle bucket
    ("node", pa.int64()),    # edge rows: src; rank rows: the node
    ("dst", pa.int64()),     # edge rows only
    ("deg", pa.int64()),     # edge rows only (src out-degree)
    ("r", pa.int64()),       # rank rows only
])

_SUM_SCHEMA = pa.schema([
    ("kb", pa.int64()),
    ("node", pa.int64()),
    ("s", pa.int64()),       # partial contribution sum (node rows: 0)
])


def group_cooccurrence_edges(
    ds: ray.data.Dataset, group_col: str, item_col: str,
) -> ray.data.Dataset:
    """Distinct directed edges ``(src, dst)`` between every ordered pair
    of distinct items sharing a group — both directions, no self-loops.

    Group sizes are assumed bounded (an order's lineitems, a doc's
    terms-of-interest): the within-group pair expansion is quadratic in
    GROUP size only. Two bounded exchanges: group-bucket (pair
    expansion, vectorized pandas self-merge) then pair-bucket (global
    distinct — the same pair can arise from many groups).
    """

    def add_gb(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "gb": pa.array(_ibucket(g)),
            "g": pa.array(g),
            "item": batch.column(item_col).cast(pa.int64()),
        })

    def group_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(["g", "item"])[["g", "item"]]
        m = g.merge(g, on="g")
        m = m[m["item_x"] != m["item_y"]]
        src = m["item_x"].to_numpy(dtype=np.int64)
        dst = m["item_y"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "pb": _pair_bucket(src, dst), "src": src, "dst": dst,
        }).drop_duplicates(["src", "dst"])

    def pair_distinct(group: pd.DataFrame) -> pd.DataFrame:
        return group.drop_duplicates(["src", "dst"])[["src", "dst"]]

    return (
        ds.map_batches(add_gb, batch_format="pyarrow")
        .groupby("gb")
        .map_groups(group_pairs, batch_format="pandas")
        .groupby("pb")
        .map_groups(pair_distinct, batch_format="pandas")
    )


def pagerank(
    edges: ray.data.Dataset, iters: int = 5,
    damping_num: int = 85, damping_den: int = 100,
    scale: int = 1_000_000,
) -> ray.data.Dataset:
    """Integer-exact PageRank over distinct directed ``(src, dst)``
    edges; returns a Dataset of ``(node, r)`` after ``iters`` power
    iterations.

        r_0(v)     = scale
        contrib(u→v) = r_k(u) // outdeg(u)                (per edge)
        r_{k+1}(v) = (scale*(den-num)) // den
                     + (num * Σ_incoming contrib) // den

    All values stay positive int64 (floor division == SQL ``//`` for
    positives), every reduction is an integer sum → order-independent,
    bitwise-deterministic at any parallelism (pytest differential vs a
    sequential numpy reference across block layouts). int64 headroom:
    a node's incoming sum is bounded by total mass = n_nodes·scale, so
    ``damping_num · n_nodes · scale`` must stay < 2^63 (holds beyond
    1e14 nodes at the default scale).

    Nodes = src ∪ dst of the edge set. Dangling nodes (no out-edges)
    leak their mass — the classic simple variant; the teleport term
    keeps every node's rank ≥ the floor. Nodes with no in-edges settle
    at exactly the teleport floor.
    """
    teleport = (scale * (damping_den - damping_num)) // damping_den

    def edge_rows(batch: pa.Table) -> pa.Table:
        src = batch.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(src)
        return pa.table({
            "kb": pa.array(_ibucket(src)),
            "node": pa.array(src),
            "dst": batch.column("dst").cast(pa.int64()),
            "deg": pa.array([None] * n, pa.int64()),
            "r": pa.array([None] * n, pa.int64()),
        }, schema=_EDGE_SCHEMA)

    def attach_deg(group: pd.DataFrame) -> pd.DataFrame:
        out = group[["kb", "node", "dst"]].copy()
        out["deg"] = (
            group.groupby("node")["node"].transform("size").astype("int64"))
        out["r"] = pd.array([None] * len(out), dtype="Int64")
        return out

    # out-degrees attach in ONE src-bucket exchange; the decorated edge
    # table is reused by every iteration, hence the materialize
    deco_edges = (
        edges.map_batches(edge_rows, batch_format="pyarrow")
        .groupby("kb")
        .map_groups(attach_deg, batch_format="pandas")
        # pin the union-side block schema to arrow so every iteration's
        # union(rank_rows, deco_edges) sees one schema
        .map_batches(lambda b: pa.Table.from_pandas(
            b, schema=_EDGE_SCHEMA, preserve_index=False),
            batch_format="pandas")
        .materialize()
    )

    def endpoint_rows(batch: pa.Table) -> pa.Table:
        src = batch.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        dst = batch.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        node = np.concatenate([src, dst])
        return pa.table({"kb": pa.array(_ibucket(node)), "node": pa.array(node)})

    def node_distinct(group: pd.DataFrame) -> pd.DataFrame:
        return group.drop_duplicates("node")[["kb", "node"]]

    nodes = (
        edges.map_batches(endpoint_rows, batch_format="pyarrow")
        .groupby("kb")
        .map_groups(node_distinct, batch_format="pandas")
        .materialize()
    )

    def init_ranks(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "node": batch.column("node"),
            "r": pa.array(np.full(n, scale, dtype=np.int64)),
        })

    ranks = nodes.map_batches(init_ranks, batch_format="pyarrow").materialize()

    def rank_rows(batch: pa.Table) -> pa.Table:
        node = batch.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(node)
        return pa.table({
            "kb": pa.array(_ibucket(node)),
            "node": pa.array(node),
            "dst": pa.array([None] * n, pa.int64()),
            "deg": pa.array([None] * n, pa.int64()),
            "r": batch.column("r").cast(pa.int64()),
        }, schema=_EDGE_SCHEMA)

    def send_contribs(group: pd.DataFrame) -> pd.DataFrame:
        """Rank rows meet this bucket's out-edges: contribution floors
        per edge, then PARTIAL-sums per dst before leaving the group
        (the damping transform applies only after the FULL sum)."""
        rk = group[group["r"].notna()][["node", "r"]]
        eg = group[group["deg"].notna()][["node", "dst", "deg"]]
        m = eg.merge(rk, on="node", how="inner")
        contrib = (m["r"].to_numpy(dtype=np.int64)
                   // m["deg"].to_numpy(dtype=np.int64))
        part = (
            pd.DataFrame({"node": m["dst"].to_numpy(dtype=np.int64),
                          "s": contrib})
            .groupby("node", as_index=False, sort=False)["s"].sum()
        )
        node = part["node"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "kb": _ibucket(node), "node": node,
            "s": part["s"].astype("int64"),
        })

    def zero_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "kb": batch.column("kb"),
            "node": batch.column("node"),
            "s": pa.array(np.zeros(n, dtype=np.int64)),
        }, schema=_SUM_SCHEMA)

    def combine_ranks(group: pd.DataFrame) -> pd.DataFrame:
        tot = group.groupby("node", as_index=False, sort=False)["s"].sum()
        s = tot["s"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "node": tot["node"].astype("int64"),
            "r": teleport + (damping_num * s) // damping_den,
        })

    for _ in range(iters):
        ranks = (
            ranks.map_batches(rank_rows, batch_format="pyarrow")
            .union(deco_edges)
            .groupby("kb")
            .map_groups(send_contribs, batch_format="pandas")
            .map_batches(lambda b: pa.Table.from_pandas(
                b, schema=_SUM_SCHEMA, preserve_index=False),
                batch_format="pandas")
            .union(nodes.map_batches(zero_rows, batch_format="pyarrow"))
            .groupby("kb")
            .map_groups(combine_ranks, batch_format="pandas")
            # unions double block counts; pin down before the next round
            .repartition(16)
            .materialize()
        )
    return ranks


def triangle_counts(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Per-node triangle counts over the UNDIRECTED graph induced by an
    edge Dataset ``(src, dst)`` — returns ``(node, triangles)`` for every
    node in at least one triangle.

    Degree-ordered orientation (the standard wedge bound): each
    undirected edge points from the (degree, node)-smaller endpoint to
    the larger, so every node's OUT-degree is O(sqrt(m)) amortized for
    ANY degree distribution — a hub of degree d generates ~0 wedges
    instead of C(d, 2). Wedges (pairs of out-neighbors) close into
    triangles via one pair-bucket semi-join against the undirected edge
    set; each triangle is found exactly once (at its orientation-minimal
    corner). Six bounded bucket exchanges total, all in-bucket work
    vectorized; nothing driver-resident.
    """

    def und_rows(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        u, v = np.minimum(s, d), np.maximum(s, d)
        return pa.table({"pb": pa.array(_pair_bucket(u, v)),
                         "u": pa.array(u), "v": pa.array(v)})

    def und_distinct(group: pd.DataFrame) -> pd.DataFrame:
        return group.drop_duplicates(["u", "v"])[["u", "v"]]

    und = (
        edges.map_batches(und_rows, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(und_distinct, batch_format="pandas")
        .materialize()
    )

    def endpoint_rows(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
        node = np.concatenate([u, v])
        return pa.table({"kb": pa.array(_ibucket(node)), "node": pa.array(node)})

    def count_deg(group: pd.DataFrame) -> pd.DataFrame:
        out = group.groupby("node", as_index=False, sort=False).size()
        return pd.DataFrame({"node": out["node"].astype("int64"),
                             "deg": out["size"].astype("int64")})

    degs = (
        und.map_batches(endpoint_rows, batch_format="pyarrow")
        .groupby("kb")
        .map_groups(count_deg, batch_format="pandas")
        .materialize()
    )

    # attach deg to each endpoint in turn (two bucket exchanges); union
    # rows: deg rows carry other=null, edge rows carry deg=null
    _ATT = pa.schema([("kb", pa.int64()), ("node", pa.int64()),
                      ("other", pa.int64()), ("odeg", pa.int64()),
                      ("deg", pa.int64())])

    def deg_rows(batch: pa.Table) -> pa.Table:
        node = batch.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(node)
        return pa.table({
            "kb": pa.array(_ibucket(node)), "node": pa.array(node),
            "other": pa.array([None] * n, pa.int64()),
            "odeg": pa.array([None] * n, pa.int64()),
            "deg": batch.column("deg").cast(pa.int64()),
        }, schema=_ATT)

    def edge_by(col_key, col_other, carry_deg):
        def fn(batch: pa.Table) -> pa.Table:
            k = batch.column(col_key).to_numpy(zero_copy_only=False).astype(np.int64)
            n = len(k)
            od = (batch.column(carry_deg).cast(pa.int64()) if carry_deg
                  else pa.array([None] * n, pa.int64()))
            return pa.table({
                "kb": pa.array(_ibucket(k)), "node": pa.array(k),
                "other": batch.column(col_other).cast(pa.int64()),
                "odeg": od,
                "deg": pa.array([None] * n, pa.int64()),
            }, schema=_ATT)
        return fn

    def attach(group: pd.DataFrame) -> pd.DataFrame:
        """Edge rows pick up this endpoint's degree; the previously
        attached other-endpoint degree rides along in ``odeg``."""
        dg = group[group["deg"].notna()][["node", "deg"]]
        eg = group[group["other"].notna()][["node", "other", "odeg"]]
        m = eg.merge(dg, on="node", how="inner")
        return pd.DataFrame({
            "node": m["node"].astype("int64"),
            "other": m["other"].astype("int64"),
            "odeg": m["odeg"].astype("Int64"),
            "deg": m["deg"].astype("int64"),
        })

    # first pass: key by u, attach deg(u); second: key by v, attach deg(v)
    half = (
        und.map_batches(edge_by("u", "v", None), batch_format="pyarrow")
        .union(degs.map_batches(deg_rows, batch_format="pyarrow"))
        .groupby("kb")
        .map_groups(attach, batch_format="pandas")
    )  # rows: node=u, other=v, deg=deg(u), odeg=null

    def flip(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch["other"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "kb": _ibucket(v), "node": v,
            "other": batch["node"].astype("int64"),
            "odeg": batch["deg"].astype("int64"),
            "deg": pd.array([None] * len(batch), dtype="Int64"),
        })

    both = (
        half.map_batches(flip, batch_format="pandas")
        .map_batches(lambda b: pa.Table.from_pandas(
            b, schema=_ATT, preserve_index=False), batch_format="pandas")
        .union(degs.map_batches(deg_rows, batch_format="pyarrow"))
        .groupby("kb")
        .map_groups(attach, batch_format="pandas")
    )  # rows: node=v, other=u, deg=deg(v), odeg=deg(u)

    _WEDGE = pa.schema([("pb", pa.int64()), ("x", pa.int64()),
                        ("y", pa.int64()), ("center", pa.int64())])

    def oriented_rows(batch: pd.DataFrame) -> pd.DataFrame:
        """Orient each undirected edge from the (deg, node)-smaller
        endpoint (=tail) to the larger; key by tail's bucket."""
        v = batch["node"].to_numpy(dtype=np.int64)
        u = batch["other"].to_numpy(dtype=np.int64)
        dv = batch["deg"].to_numpy(dtype=np.int64)
        du = batch["odeg"].to_numpy(dtype=np.int64)
        u_first = (du < dv) | ((du == dv) & (u < v))
        tail = np.where(u_first, u, v)
        head = np.where(u_first, v, u)
        return pd.DataFrame({"tb": _ibucket(tail), "tail": tail, "head": head})

    def wedges(group: pd.DataFrame) -> pd.DataFrame:
        """Pairs of out-neighbors per tail (vectorized per tail's
        neighbor list) → closure-probe rows keyed by the pair bucket."""
        out_x, out_y, out_c = [], [], []
        for t, sub in group.groupby("tail", sort=False):
            h = np.sort(sub["head"].to_numpy(dtype=np.int64))
            if len(h) < 2:
                continue
            ii, jj = np.triu_indices(len(h), k=1)
            out_x.append(h[ii]); out_y.append(h[jj])
            out_c.append(np.full(len(ii), t, dtype=np.int64))
        if not out_x:
            return pd.DataFrame({"pb": pd.Series([], dtype="int64"),
                                 "x": pd.Series([], dtype="int64"),
                                 "y": pd.Series([], dtype="int64"),
                                 "center": pd.Series([], dtype="int64")})
        x = np.concatenate(out_x); y = np.concatenate(out_y)
        return pd.DataFrame({"pb": _pair_bucket(x, y), "x": x, "y": y,
                             "center": np.concatenate(out_c)})

    def edge_probe_rows(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "pb": pa.array(_pair_bucket(u, v)),
            "x": pa.array(u), "y": pa.array(v),
            "center": pa.array([None] * len(u), pa.int64()),
        }, schema=_WEDGE)

    def close_triangles(group: pd.DataFrame) -> pd.DataFrame:
        """A wedge (x, y) closes iff the undirected edge {x, y} exists in
        this bucket → emit the 3 corner rows of each found triangle."""
        eg = group[group["center"].isna()][["x", "y"]]
        wg = group[group["center"].notna()]
        m = wg.merge(eg, on=["x", "y"], how="inner")
        node = np.concatenate([
            m["x"].to_numpy(dtype=np.int64),
            m["y"].to_numpy(dtype=np.int64),
            m["center"].to_numpy(dtype=np.int64),
        ])
        return pd.DataFrame({"kb": _ibucket(node), "node": node})

    def count_tris(group: pd.DataFrame) -> pd.DataFrame:
        out = group.groupby("node", as_index=False, sort=False).size()
        return pd.DataFrame({"node": out["node"].astype("int64"),
                             "triangles": out["size"].astype("int64")})

    return (
        both.map_batches(oriented_rows, batch_format="pandas")
        .groupby("tb")
        .map_groups(wedges, batch_format="pandas")
        .map_batches(lambda b: pa.Table.from_pandas(
            b, schema=_WEDGE, preserve_index=False), batch_format="pandas")
        .union(und.map_batches(edge_probe_rows, batch_format="pyarrow"))
        .groupby("pb")
        .map_groups(close_triangles, batch_format="pandas")
        .groupby("kb")
        .map_groups(count_tris, batch_format="pandas")
    )
