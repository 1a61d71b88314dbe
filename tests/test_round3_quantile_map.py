"""Semantics tests for quantile normalization: each distinct purchase
value maps to the view value at the same discrete quantile
(t = ceil(r*n1/n2), smallest view value with cum >= t) — brute-forced
against a sorted-array reference.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from htmlparsersharp_ray.pipelines import relational as r


def _write_events(tmp_path, view_vals, purchase_vals):
    n = len(view_vals) + len(purchase_vals)
    types = (["view"] * len(view_vals)
             + ["purchase"] * len(purchase_vals))
    vals = list(view_vals) + list(purchase_vals)
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


def _ref(view_vals, purchase_vals):
    a = np.sort(np.round(np.asarray(view_vals) * 100).astype(np.int64))
    b = np.round(np.asarray(purchase_vals) * 100).astype(np.int64)
    n1, n2 = len(a), len(b)
    rows = []
    for v in np.unique(b):
        cnt = int((b == v).sum())
        rk = int((b <= v).sum())
        tgt = (rk * n1 + n2 - 1) // n2
        rows.append((int(v), cnt, rk, int(a[tgt - 1])))
    return rows


class TestQuantileMap:
    def test_identical_distributions_map_to_self(self, tmp_path,
                                                 ray_session):
        vals = [1.0, 2.0, 3.0, 4.0]
        sf = _write_events(tmp_path / "a", vals, vals)
        out = r.q_events_quantile_map(sf)
        assert (out["mapped"] == out["v"]).all()

    def test_shift_and_ties(self, tmp_path, ray_session):
        view = [10.0, 20.0, 20.0, 30.0, 40.0]
        purchase = [1.0, 2.0, 2.0, 3.0]
        sf = _write_events(tmp_path / "b", view, purchase)
        out = r.q_events_quantile_map(sf)
        assert [tuple(x) for x in out.itertuples(index=False)] == \
            _ref(view, purchase)

    def test_unequal_sizes(self, tmp_path, ray_session):
        view = [5.0, 6.0, 7.0]
        purchase = [1.0, 1.5, 2.0, 2.5, 3.0, 3.5, 4.0]
        sf = _write_events(tmp_path / "c", view, purchase)
        out = r.q_events_quantile_map(sf)
        assert [tuple(x) for x in out.itertuples(index=False)] == \
            _ref(view, purchase)
        # max purchase maps to max view
        assert int(out.iloc[-1]["mapped"]) == 700

    def test_one_side_empty(self, tmp_path, ray_session):
        sf = _write_events(tmp_path / "d", [1.0], [])
        out = r.q_events_quantile_map(sf)
        assert len(out) == 0
        assert list(out.columns) == ["v", "n", "r", "mapped"]

    def test_randomized_vs_bruteforce(self, tmp_path, ray_session):
        rng = np.random.default_rng(8080)
        view = (rng.integers(0, 300, size=80) * 0.5).tolist()
        purchase = (rng.integers(0, 200, size=60) * 0.25).tolist()
        sf = _write_events(tmp_path / "e", view, purchase)
        out = r.q_events_quantile_map(sf)
        assert [tuple(x) for x in out.itertuples(index=False)] == \
            _ref(view, purchase)
