"""Semantics tests for the Hodges-Lehmann shift estimator: doubled
median of all n1*n2 pairwise 'view' - 'purchase' cent differences,
selected by histogram binary search — brute-forced here by actually
materializing the pairs on tiny inputs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from htmlparsersharp_ray.pipelines import relational as r


def _write_events(tmp_path, view_vals, purchase_vals, other_vals=()):
    n = len(view_vals) + len(purchase_vals) + len(other_vals)
    types = (["view"] * len(view_vals)
             + ["purchase"] * len(purchase_vals)
             + ["click"] * len(other_vals))
    vals = list(view_vals) + list(purchase_vals) + list(other_vals)
    t = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array([1_700_000_000_000_000 + i for i in range(n)],
                       pa.timestamp("us")),
        "user_id": pa.array([i % 3 for i in range(n)], pa.int64()),
        "event_type": pa.array(types),
        "value": pa.array([float(v) for v in vals], pa.float64()),
        "props": pa.array(["{}"] * n),
    })
    tmp_path.mkdir(parents=True, exist_ok=True)
    pq.write_table(t, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _ref_hl(view_vals, purchase_vals):
    a = np.round(np.asarray(view_vals, dtype=np.float64) * 100)
    b = np.round(np.asarray(purchase_vals, dtype=np.float64) * 100)
    a, b = a.astype(np.int64), b.astype(np.int64)
    diffs = np.sort((a[:, None] - b[None, :]).ravel())
    m = len(diffs)
    lo = int(diffs[(m + 1) // 2 - 1])
    hi = int(diffs[m // 2])
    return len(a), len(b), lo + hi


class TestHodgesLehmann:
    def test_singletons(self, tmp_path, ray_session):
        sf = _write_events(tmp_path / "a", [5.0], [2.0])
        out = r.q_events_hodges_lehmann(sf)
        assert tuple(out.iloc[0]) == (1, 1, 600)

    def test_even_pair_count_midpoint(self, tmp_path, ray_session):
        # 2x2 = 4 diffs: sorted middle two must be summed
        view, purchase = [1.0, 4.0], [2.0, 3.0]
        sf = _write_events(tmp_path / "b", view, purchase)
        out = r.q_events_hodges_lehmann(sf)
        assert tuple(out.iloc[0]) == _ref_hl(view, purchase)

    def test_heavy_ties(self, tmp_path, ray_session):
        view = [2.0, 2.0, 2.0, 7.5, 7.5]
        purchase = [2.0, 2.0, 5.25, 5.25]
        sf = _write_events(tmp_path / "c", view, purchase)
        out = r.q_events_hodges_lehmann(sf)
        assert tuple(out.iloc[0]) == _ref_hl(view, purchase)

    def test_other_types_excluded(self, tmp_path, ray_session):
        view, purchase = [3.0, 1.0], [0.5]
        sf = _write_events(tmp_path / "d", view, purchase,
                           other_vals=[99.0, 0.0])
        out = r.q_events_hodges_lehmann(sf)
        assert tuple(out.iloc[0]) == _ref_hl(view, purchase)

    def test_one_side_empty(self, tmp_path, ray_session):
        sf = _write_events(tmp_path / "e", [1.0, 2.0], [])
        out = r.q_events_hodges_lehmann(sf)
        assert len(out) == 0
        assert list(out.columns) == ["n1", "n2", "hl_x2"]

    def test_randomized_vs_bruteforce(self, tmp_path, ray_session):
        rng = np.random.default_rng(424242)
        view = (rng.integers(0, 500, size=70) * 0.25).tolist()
        purchase = (rng.integers(0, 500, size=55) * 0.25).tolist()
        sf = _write_events(tmp_path / "f", view, purchase)
        out = r.q_events_hodges_lehmann(sf)
        assert tuple(out.iloc[0]) == _ref_hl(view, purchase)

    def test_negative_shift(self, tmp_path, ray_session):
        view = [1.0, 1.5, 2.0]
        purchase = [10.0, 11.0, 12.0, 13.0]
        sf = _write_events(tmp_path / "g", view, purchase)
        n1, n2, hl = _ref_hl(view, purchase)
        out = r.q_events_hodges_lehmann(sf)
        assert hl < 0
        assert tuple(out.iloc[0]) == (n1, n2, hl)
