"""Differential + adversarial tests for the distributed Borůvka
minimum spanning forest (stages/graph.py::minimum_spanning_forest).

The op is rows-only at the driver (MST is not ANSI-SQL-expressible),
so the correctness gate lives here: sequential Kruskal over the same
(w, ua, ub) total order must reproduce the forest EXACTLY.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from htmlparsersharp_ray.stages.graph import minimum_spanning_forest


def _kruskal(edges):
    """Sequential reference under the same (w, ua, ub) total order."""
    es = {}
    for u, v, w in edges:
        if u == v:
            continue
        a, b = min(u, v), max(u, v)
        es[(a, b)] = min(es.get((a, b), w), w)
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = []
    for (a, b), w in sorted(es.items(), key=lambda kv: (kv[1], kv[0])):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            out.append((a, b, w))
    return sorted(out)


def _run(u, v, w):
    ds = ray.data.from_arrow(pa.table({
        "src": pa.array(u, pa.int64()),
        "dst": pa.array(v, pa.int64()),
        "w": pa.array(w, pa.int64()),
    }))
    got = minimum_spanning_forest(ds).to_pandas()
    return sorted(zip(got["ua"].astype(int), got["ub"].astype(int),
                      got["w"].astype(int)))


class TestMinimumSpanningForest:
    def test_random_differential(self, ray_session):
        for seed, (n, m) in [(1, (40, 120)), (2, (80, 500))]:
            rng = np.random.default_rng(seed)
            u = rng.integers(0, n, m)
            v = rng.integers(0, n, m)
            w = rng.integers(1, 25, m)
            ref = _kruskal(list(zip(u.tolist(), v.tolist(), w.tolist())))
            assert _run(u, v, w) == ref, f"seed {seed}"

    def test_increasing_chain_deep_pointer_jumping(self, ray_session):
        """Path graph with increasing weights: every component's min
        edge points LEFT, producing one n-deep parent chain — the
        pointer-jumping worst case must still converge and keep every
        path edge (a path's MST is itself)."""
        n = 64
        u = np.arange(n - 1)
        v = np.arange(1, n)
        w = np.arange(1, n)
        got = _run(u, v, w)
        assert got == [(i, i + 1, i + 1) for i in range(n - 1)]

    def test_disconnected_forest(self, ray_session):
        # two triangles far apart -> 2+2 edges, heaviest of each
        # triangle excluded
        u = np.array([0, 1, 2, 10, 11, 12])
        v = np.array([1, 2, 0, 11, 12, 10])
        w = np.array([1, 2, 3, 5, 4, 6])
        got = _run(u, v, w)
        assert got == [(0, 1, 1), (1, 2, 2), (10, 11, 5), (11, 12, 4)]

    def test_self_loops_and_parallel_edges(self, ray_session):
        u = np.array([0, 0, 0, 1, 1])
        v = np.array([0, 1, 1, 1, 2])
        w = np.array([7, 9, 3, 8, 2])  # self-loops dropped, min parallel
        got = _run(u, v, w)
        assert got == [(0, 1, 3), (1, 2, 2)]

    def test_weight_ties_unique_by_endpoint_order(self, ray_session):
        """All-equal weights: the (w, ua, ub) total order still makes
        the forest unique — verify against Kruskal under that order."""
        rng = np.random.default_rng(9)
        u = rng.integers(0, 30, 90)
        v = rng.integers(0, 30, 90)
        w = np.full(90, 5)
        ref = _kruskal(list(zip(u.tolist(), v.tolist(), w.tolist())))
        assert _run(u, v, w) == ref

    def test_layout_independence(self, ray_session):
        """Same edges split across many tiny blocks must give the
        identical forest (determinism at any parallelism)."""
        rng = np.random.default_rng(4)
        u = rng.integers(0, 50, 200)
        v = rng.integers(0, 50, 200)
        w = rng.integers(1, 9, 200)
        t = pa.table({"src": pa.array(u, pa.int64()),
                      "dst": pa.array(v, pa.int64()),
                      "w": pa.array(w, pa.int64())})
        one = minimum_spanning_forest(
            ray.data.from_arrow(t)).to_pandas()
        many = minimum_spanning_forest(
            ray.data.from_arrow(t).repartition(23)).to_pandas()
        key = lambda d: sorted(zip(d["ua"], d["ub"], d["w"]))  # noqa: E731
        assert key(one) == key(many)
