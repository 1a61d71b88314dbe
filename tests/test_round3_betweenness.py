"""Differential tests for k-source betweenness centrality
(stages/graph.py::betweenness) — sequential Brandes under the SAME
2^20 fixed-point flooring rule must reproduce the distributed result
exactly (the op is rows-only at the driver: iterative BFS +
dependency accumulation is not ANSI-SQL-expressible).
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pyarrow as pa

import ray

from htmlparsersharp_ray.stages.graph import betweenness

SCALE = 1 << 20


def _brandes_fixed(edges, sources):
    """Sequential reference with the identical per-edge flooring."""
    adj = defaultdict(set)
    for u, v in edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    bc = defaultdict(int)
    for s in sources:
        dist = {s: 0}
        sigma = {s: 1}
        levels = {0: [s]}
        lvl = 0
        frontier = [s]
        while frontier:
            nxt = set()
            for v in frontier:
                for w in adj[v]:
                    if w not in dist:
                        nxt.add(w)
            newf = sorted(nxt)
            for w in newf:
                dist[w] = lvl + 1
                sigma[w] = sum(sigma[p] for p in adj[w]
                               if dist.get(p) == lvl)
            if not newf:
                break
            levels[lvl + 1] = newf
            frontier = newf
            lvl += 1
        delta = defaultdict(int)
        for level in range(lvl, 0, -1):
            for v in levels.get(level - 1, []):
                tot = 0
                for w in adj[v]:
                    if dist.get(w) == level:
                        tot += sigma[v] * (SCALE + delta[w]) // sigma[w]
                if tot:
                    delta[v] = tot
        for v, dv in delta.items():
            if v != s:
                bc[v] += dv
    return {k: v for k, v in bc.items() if v}


def _run(u, v, sources):
    ds = ray.data.from_arrow(pa.table({
        "src": pa.array(u, pa.int64()),
        "dst": pa.array(v, pa.int64()),
    }))
    got = betweenness(ds, sources).to_pandas()
    return {int(r.node): int(r.bc_scaled)
            for r in got.itertuples() if r.bc_scaled}


class TestBetweenness:
    def test_random_differential(self, ray_session):
        rng = np.random.default_rng(5)
        for trial, (n, m, k) in enumerate([(20, 40, 3), (60, 150, 5)]):
            u = rng.integers(0, n, m)
            v = rng.integers(0, n, m)
            nodes = np.unique(np.r_[u, v])
            sources = sorted(set(int(x) for x in rng.choice(nodes, k)))
            ref = _brandes_fixed(list(zip(u.tolist(), v.tolist())),
                                 sources)
            assert _run(u, v, sources) == ref, f"trial {trial}"

    def test_path_graph_center_dominates(self, ray_session):
        """On a path 0-1-2-3-4 with all nodes as sources, the center
        carries the most shortest paths; endpoints carry none."""
        u = np.arange(4)
        v = np.arange(1, 5)
        got = _run(u, v, [0, 1, 2, 3, 4])
        ref = _brandes_fixed(list(zip(u.tolist(), v.tolist())),
                             [0, 1, 2, 3, 4])
        assert got == ref
        assert got[2] == max(got.values())
        assert 0 not in got and 4 not in got

    def test_diamond_split_paths(self, ray_session):
        """s=0, diamond 0-{1,2}-3 extended to 4: sigma(3) = sigma(4)
        = 2. delta(3) = sigma(3)/sigma(4)·(1+0) = 1 → S; nodes 1 and 2
        each get floor(1·(S + delta(3))/2) = S (half of 3's paths plus
        half of 3's dependency each)."""
        u = np.array([0, 0, 1, 2, 3])
        v = np.array([1, 2, 3, 3, 4])
        got = _run(u, v, [0])
        ref = _brandes_fixed(list(zip(u.tolist(), v.tolist())), [0])
        assert got == ref
        assert got[1] == got[2] == SCALE
        assert got[3] == SCALE  # one unit: 3 brokers every path to 4

    def test_disconnected_sources(self, ray_session):
        """A source in a separate component contributes nothing to the
        other component."""
        u = np.array([0, 1, 10, 11])
        v = np.array([1, 2, 11, 12])
        got = _run(u, v, [0, 10])
        ref = _brandes_fixed(list(zip(u.tolist(), v.tolist())),
                             [0, 10])
        assert got == ref
        assert set(got) == {1, 11}

    def test_layout_independence(self, ray_session):
        rng = np.random.default_rng(8)
        u = rng.integers(0, 30, 80)
        v = rng.integers(0, 30, 80)
        t = pa.table({"src": pa.array(u, pa.int64()),
                      "dst": pa.array(v, pa.int64())})
        one = betweenness(ray.data.from_arrow(t), [0, 1, 2]).to_pandas()
        many = betweenness(ray.data.from_arrow(t).repartition(19),
                           [0, 1, 2]).to_pandas()
        key = lambda d: sorted(zip(d["node"], d["bc_scaled"]))  # noqa
        assert key(one) == key(many)
