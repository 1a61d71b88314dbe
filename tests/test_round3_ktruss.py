"""Semantics tests for the distributed k-truss peel against a
sequential reference peeler: planted clique survival, bridge/pendant
removal, cascade peeling (an edge that loses support only after a
neighbor peels), and randomized graphs.
"""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from htmlparsersharp_ray.stages.graph import ktruss


def _edges_ds(pairs):
    src = [a for a, b in pairs] + [b for a, b in pairs]
    dst = [b for a, b in pairs] + [a for a, b in pairs]
    return ray.data.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()),
        "dst": pa.array(dst, pa.int64()),
    }))


def _ref_ktruss(pairs, k):
    """Sequential peel: recompute per-edge support, drop < k-2,
    repeat to fixpoint."""
    edges = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    while True:
        adj = {}
        for u, v in edges:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        drop = {(u, v) for u, v in edges
                if len(adj[u] & adj[v]) < k - 2}
        if not drop:
            return sorted(edges)
        edges -= drop


class TestKTruss:
    def test_clique_survives_pendants_peel(self, ray_session):
        clique = list(itertools.combinations([1, 2, 3, 4], 2))
        pendants = [(1, 10), (2, 20), (10, 20)]
        out, rounds = ktruss(_edges_ds(clique + pendants), k=4)
        got = list(map(tuple, out.itertuples(index=False)))
        assert got == _ref_ktruss(clique + pendants, 4)
        assert got == sorted(map(tuple, clique))
        assert rounds >= 1

    def test_cascade_peel(self, ray_session):
        # two K4s sharing the edge (3,4); edge (4,5) bridges into a
        # triangle that peels, which then strips nothing further from
        # the cliques — reference decides the exact fixpoint
        k4a = list(itertools.combinations([1, 2, 3, 4], 2))
        k4b = list(itertools.combinations([3, 4, 5, 6], 2))
        tri = [(5, 7), (6, 7)]
        pairs = k4a + k4b + tri
        out, _ = ktruss(_edges_ds(pairs), k=4)
        got = list(map(tuple, out.itertuples(index=False)))
        assert got == _ref_ktruss(pairs, 4)
        assert (5, 7) not in got and (6, 7) not in got

    def test_everything_peels(self, ray_session):
        # a pure triangle has support 1 per edge < k-2=2
        out, _ = ktruss(_edges_ds([(1, 2), (2, 3), (1, 3)]), k=4)
        assert len(out) == 0
        assert list(out.columns) == ["u", "v"]

    def test_k3_keeps_triangles(self, ray_session):
        pairs = [(1, 2), (2, 3), (1, 3), (3, 9)]
        out, _ = ktruss(_edges_ds(pairs), k=3)
        got = list(map(tuple, out.itertuples(index=False)))
        assert got == [(1, 2), (1, 3), (2, 3)]

    def test_randomized_vs_reference(self, ray_session):
        rng = np.random.default_rng(4242)
        pairs = {tuple(sorted((int(a), int(b))))
                 for a, b in rng.integers(0, 25, size=(120, 2))
                 if a != b}
        pairs = sorted(pairs)
        out, _ = ktruss(_edges_ds(pairs), k=4)
        got = list(map(tuple, out.itertuples(index=False)))
        assert got == _ref_ktruss(pairs, 4)
