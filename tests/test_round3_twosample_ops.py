"""Semantics tests for the two-sample rank statistics: exact-integer
Kolmogorov-Smirnov (d_num = max |c1*n2 - c2*n1|) and Mann-Whitney U
with midranks (2*R1 / 2*U1 / tie_sum all integral).

Tiny hand-crafted inputs pin the math against brute-force numpy
references; DuckDB equivalence at sf scale is tools/check_oracle.py's
job (verified hash-exact at sf0.01 and sf0.1).
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


def _ref_ks(view_vals, purchase_vals):
    """Brute-force integer KS numerator over exact cents."""
    a = np.round(np.asarray(view_vals, dtype=np.float64) * 100)
    b = np.round(np.asarray(purchase_vals, dtype=np.float64) * 100)
    a, b = a.astype(np.int64), b.astype(np.int64)
    n1, n2 = len(a), len(b)
    vs = np.unique(np.concatenate([a, b]))
    best, at = -1, None
    for v in vs:
        c1 = int((a <= v).sum())
        c2 = int((b <= v).sum())
        dn = abs(c1 * n2 - c2 * n1)
        if dn > best:
            best, at = dn, int(v)
    return n1, n2, best, at


def _ref_mwu(view_vals, purchase_vals):
    """Brute-force doubled midrank sum over exact cents."""
    a = np.round(np.asarray(view_vals, dtype=np.float64) * 100)
    b = np.round(np.asarray(purchase_vals, dtype=np.float64) * 100)
    a, b = a.astype(np.int64), b.astype(np.int64)
    allv = np.concatenate([a, b])
    order = np.sort(allv)
    r1_x2 = 0
    for v in a:
        less = int((order < v).sum())
        eq = int((order == v).sum())
        # midrank = less + (eq + 1) / 2 ; doubled stays integral
        r1_x2 += 2 * less + eq + 1
    _, cnts = np.unique(allv, return_counts=True)
    tie_sum = int((cnts.astype(object) ** 3 - cnts).sum())
    n1 = len(a)
    return r1_x2, r1_x2 - n1 * (n1 + 1), tie_sum


class TestKSTest:
    def test_matches_bruteforce_with_ties(self, ray_session, tmp_path):
        view = [1.00, 1.00, 2.50, 3.75, 3.75, 9.99]
        purch = [1.00, 2.50, 2.50, 8.00, 9.99, 9.99, 12.00]
        sf = _write_events(tmp_path / "a", view, purch,
                           other_vals=[500.0])  # ignored type
        out = r.q_events_ks_test(sf)
        n1, n2, d_num, at_v = _ref_ks(view, purch)
        assert out.iloc[0].to_dict() == {
            "n1": n1, "n2": n2, "d_num": d_num, "at_v": at_v}

    def test_tie_break_is_smallest_value(self, ray_session, tmp_path):
        # D attained at every value in [100,300) cents: at_v must be
        # the smallest (100)
        view = [1.00, 4.00]
        purch = [3.00, 4.00]
        sf = _write_events(tmp_path / "b", view, purch)
        out = r.q_events_ks_test(sf)
        assert int(out["at_v"].iloc[0]) == 100
        assert int(out["d_num"].iloc[0]) == 2  # |1*2 - 0*2|

    def test_bucket_straddle_large_values(self, ray_session, tmp_path):
        # values spanning a wide range force shift > 0 so multiple
        # distinct values share a range bucket and offsets matter
        rng = np.random.RandomState(7)
        view = (rng.randint(1, 5_000_000, size=200) / 100.0).tolist()
        purch = (rng.randint(1, 5_000_000, size=150) / 100.0).tolist()
        sf = _write_events(tmp_path / "c", view, purch)
        out = r.q_events_ks_test(sf)
        n1, n2, d_num, at_v = _ref_ks(view, purch)
        assert out.iloc[0].to_dict() == {
            "n1": n1, "n2": n2, "d_num": d_num, "at_v": at_v}

    def test_empty_sample_returns_empty(self, ray_session, tmp_path):
        sf = _write_events(tmp_path / "d", [1.0, 2.0], [])
        out = r.q_events_ks_test(sf)
        assert len(out) == 0
        assert list(out.columns) == ["n1", "n2", "d_num", "at_v"]


class TestMannWhitney:
    def test_matches_bruteforce_midranks(self, ray_session, tmp_path):
        view = [1.00, 1.00, 2.50, 3.75, 3.75, 9.99]
        purch = [1.00, 2.50, 2.50, 8.00, 9.99, 9.99, 12.00]
        sf = _write_events(tmp_path / "a", view, purch,
                           other_vals=[500.0])
        out = r.q_events_mannwhitney(sf)
        r1_x2, u1_x2, tie_sum = _ref_mwu(view, purch)
        assert out.iloc[0].to_dict() == {
            "n1": 6, "n2": 7, "r1_x2": r1_x2, "u1_x2": u1_x2,
            "tie_sum": tie_sum}

    def test_u_statistics_sum_identity(self, ray_session, tmp_path):
        # U1 + U2 = n1*n2  =>  2*U1 + 2*U2 = 2*n1*n2; derive 2*U2 by
        # symmetry from total rank sum: 2*(R1+R2) = 2*N(N+1)/2
        rng = np.random.RandomState(11)
        view = (rng.randint(1, 1000, size=80) / 100.0).tolist()
        purch = (rng.randint(1, 1000, size=60) / 100.0).tolist()
        sf = _write_events(tmp_path / "b", view, purch)
        out = r.q_events_mannwhitney(sf)
        n1, n2 = 80, 60
        n = n1 + n2
        r1_x2 = int(out["r1_x2"].iloc[0])
        u1_x2 = int(out["u1_x2"].iloc[0])
        r2_x2 = n * (n + 1) - r1_x2
        u2_x2 = r2_x2 - n2 * (n2 + 1)
        assert u1_x2 + u2_x2 == 2 * n1 * n2

    def test_no_ties_tie_sum_zero(self, ray_session, tmp_path):
        sf = _write_events(tmp_path / "c", [1.00, 3.00], [2.00, 4.00])
        out = r.q_events_mannwhitney(sf)
        assert int(out["tie_sum"].iloc[0]) == 0
        # ranks of view = 1, 3 => R1 = 4, 2R1 = 8
        assert int(out["r1_x2"].iloc[0]) == 8
        assert int(out["u1_x2"].iloc[0]) == 8 - 2 * 3

    def test_empty_sample_returns_empty(self, ray_session, tmp_path):
        sf = _write_events(tmp_path / "d", [], [1.0])
        out = r.q_events_mannwhitney(sf)
        assert len(out) == 0
