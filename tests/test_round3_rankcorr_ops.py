"""Semantics tests for the bivariate rank statistics: exact-integer
Spearman (doubled midranks, closed-form centering) and Kendall tau-b
pair counts (nc via bucketed grid cumsums, nd brute-checked
independently of the engine's pair identity).

Tiny hand-crafted and seeded-random inputs pin the math against
brute-force numpy references; DuckDB equivalence at sf scale is
tools/check_oracle.py's job.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from htmlparsersharp_ray.pipelines import relational as r


def _write_events(tmp_path, hours, vals):
    n = len(hours)
    assert len(vals) == n
    ts = pd.to_datetime(
        [f"2024-01-0{1 + i % 3} {h:02d}:{i % 60:02d}:00"
         for i, h in enumerate(hours)])
    t = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array([i % 5 for i in range(n)], pa.int64()),
        "event_type": pa.array(["view"] * n),
        "value": pa.array([float(v) for v in vals], pa.float64()),
        "props": pa.array(["{}"] * n),
    })
    tmp_path.mkdir(parents=True, exist_ok=True)
    pq.write_table(t, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _r2(x):
    """Doubled midranks: 2*(#smaller) + (#equal) + 1, exact ints."""
    x = np.asarray(x)
    return np.array([2 * int((x < v).sum()) + int((x == v).sum()) + 1
                     for v in x], dtype=object)


def _ref_spearman(hours, vals):
    h = np.asarray(hours, dtype=np.int64)
    v = np.round(np.asarray(vals, dtype=np.float64) * 100).astype(
        np.int64)
    n = len(h)
    rx, ry = _r2(h), _r2(v)
    cen = n * (n + 1) * (n + 1)
    sxy = int(sum(int(a) * int(b) for a, b in zip(rx, ry))) - cen
    sxx = int(sum(int(a) * int(a) for a in rx)) - cen
    syy = int(sum(int(b) * int(b) for b in ry)) - cen
    return n, sxy, sxx, syy


def _ref_kendall(hours, vals):
    h = np.asarray(hours, dtype=np.int64)
    v = np.round(np.asarray(vals, dtype=np.float64) * 100).astype(
        np.int64)
    n = len(h)
    nc = nd = tx = ty = txy = 0
    for i in range(n):
        for j in range(i + 1, n):
            dh, dv = h[i] - h[j], v[i] - v[j]
            if dh == 0 and dv == 0:
                tx += 1
                ty += 1
                txy += 1
            elif dh == 0:
                tx += 1
            elif dv == 0:
                ty += 1
            elif dh * dv > 0:
                nc += 1
            else:
                nd += 1
    return n, nc, nd, tx, ty, txy


class TestSpearman:
    def test_perfect_monotone(self, tmp_path, ray_session):
        hours = [1, 2, 3, 4, 5]
        vals = [1.0, 2.0, 3.0, 4.0, 5.0]
        sf = _write_events(tmp_path / "a", hours, vals)
        out = r.q_events_spearman(sf)
        n, sxy, sxx, syy = _ref_spearman(hours, vals)
        row = out.iloc[0]
        assert (row["n"], row["sxy"], row["sxx"], row["syy"]) == (
            n, sxy, sxx, syy)
        # rho == +1 exactly: sxy^2 == sxx*syy with sxy > 0
        assert row["sxy"] > 0 and row["sxy"] ** 2 == row["sxx"] * row["syy"]

    def test_ties_both_axes(self, tmp_path, ray_session):
        hours = [3, 3, 3, 7, 7, 11, 11, 11, 11]
        vals = [2.5, 2.5, 9.0, 9.0, 1.25, 2.5, 7.75, 7.75, 0.0]
        sf = _write_events(tmp_path / "b", hours, vals)
        out = r.q_events_spearman(sf)
        assert tuple(out.iloc[0]) == _ref_spearman(hours, vals)

    def test_constant_value_column(self, tmp_path, ray_session):
        hours = [0, 5, 9, 17]
        vals = [4.0, 4.0, 4.0, 4.0]
        sf = _write_events(tmp_path / "c", hours, vals)
        out = r.q_events_spearman(sf)
        assert out.iloc[0]["syy"] == 0
        assert out.iloc[0]["sxy"] == 0

    def test_empty_table(self, tmp_path, ray_session):
        sf = _write_events(tmp_path / "d", [], [])
        out = r.q_events_spearman(sf)
        assert len(out) == 0
        assert list(out.columns) == ["n", "sxy", "sxx", "syy"]

    def test_randomized_vs_bruteforce(self, tmp_path, ray_session):
        rng = np.random.default_rng(20240820)
        hours = rng.integers(0, 24, size=120).tolist()
        vals = (rng.integers(0, 40, size=120) * 0.25).tolist()
        sf = _write_events(tmp_path / "e", hours, vals)
        out = r.q_events_spearman(sf)
        assert tuple(out.iloc[0]) == _ref_spearman(hours, vals)


class TestKendall:
    def test_hand_case(self, tmp_path, ray_session):
        hours = [1, 1, 2, 3, 3, 4]
        vals = [1.0, 2.0, 2.0, 1.0, 3.0, 3.0]
        sf = _write_events(tmp_path / "a", hours, vals)
        out = r.q_events_kendall(sf)
        assert tuple(out.iloc[0]) == _ref_kendall(hours, vals)

    def test_pair_counts_partition_all_pairs(self, tmp_path,
                                             ray_session):
        rng = np.random.default_rng(7)
        hours = rng.integers(0, 24, size=90).tolist()
        vals = (rng.integers(0, 15, size=90) * 0.5).tolist()
        sf = _write_events(tmp_path / "b", hours, vals)
        out = r.q_events_kendall(sf)
        row = out.iloc[0]
        n = int(row["n"])
        # nc + nd + tx + ty - txy == n(n-1)/2 (txy double-counted)
        assert (row["nc"] + row["nd"] + row["tx"] + row["ty"]
                - row["txy"]) == n * (n - 1) // 2
        assert tuple(row) == _ref_kendall(hours, vals)

    def test_single_row(self, tmp_path, ray_session):
        sf = _write_events(tmp_path / "c", [12], [3.5])
        out = r.q_events_kendall(sf)
        assert tuple(out.iloc[0]) == (1, 0, 0, 0, 0, 0)

    def test_all_one_hour(self, tmp_path, ray_session):
        hours = [9] * 6
        vals = [1.0, 2.0, 2.0, 3.0, 4.0, 4.0]
        sf = _write_events(tmp_path / "d", hours, vals)
        out = r.q_events_kendall(sf)
        row = out.iloc[0]
        assert row["tx"] == 15 and row["nc"] == 0 and row["nd"] == 0
        assert tuple(row) == _ref_kendall(hours, vals)

    def test_empty_table(self, tmp_path, ray_session):
        sf = _write_events(tmp_path / "e", [], [])
        out = r.q_events_kendall(sf)
        assert len(out) == 0

    def test_randomized_vs_bruteforce(self, tmp_path, ray_session):
        rng = np.random.default_rng(31337)
        hours = rng.integers(0, 24, size=150).tolist()
        vals = (rng.integers(0, 60, size=150) * 0.2).tolist()
        sf = _write_events(tmp_path / "f", hours, vals)
        out = r.q_events_kendall(sf)
        assert tuple(out.iloc[0]) == _ref_kendall(hours, vals)
