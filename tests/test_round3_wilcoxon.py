"""Semantics tests for the paired Wilcoxon signed-rank test: per-user
exact cent differences, zero-difference drops, doubled midranks of
|d|, positive-side sum — brute-forced on tiny inputs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from htmlparsersharp_ray.pipelines import relational as r


def _write_events(tmp_path, rows):
    """rows: list of (user_id, event_type, value)."""
    n = len(rows)
    t = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array([1_700_000_000_000_000 + i for i in range(n)],
                       pa.timestamp("us")),
        "user_id": pa.array([u for u, _, _ in rows], pa.int64()),
        "event_type": pa.array([e for _, e, _ in rows]),
        "value": pa.array([float(v) for _, _, v in rows],
                          pa.float64()),
        "props": pa.array(["{}"] * n),
    })
    tmp_path.mkdir(parents=True, exist_ok=True)
    pq.write_table(t, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _ref(rows):
    agg = {}
    for u, e, v in rows:
        if e not in ("view", "purchase"):
            continue
        sv, sp, hv, hp = agg.get(u, (0, 0, False, False))
        c = round(v * 100)
        if e == "view":
            agg[u] = (sv + c, sp, True, hp)
        else:
            agg[u] = (sv, sp + c, hv, True)
    ds = [sv - sp for sv, sp, hv, hp in agg.values()
          if hv and hp and sv != sp]
    if not ds:
        return None
    a = np.array([abs(d) for d in ds])
    order = np.sort(a)
    wp = 0
    tie = 0
    for v in np.unique(a):
        ct = int((a == v).sum())
        cumb = int((order < v).sum())
        r2 = 2 * cumb + ct + 1
        cp = sum(1 for d in ds if d > 0 and abs(d) == v)
        wp += cp * r2
        tie += ct ** 3 - ct
    return len(ds), wp, tie


class TestWilcoxon:
    def test_hand_case_with_ties_and_zero(self, tmp_path,
                                          ray_session):
        rows = [
            (1, "view", 5.0), (1, "purchase", 2.0),    # d=+300
            (2, "view", 1.0), (2, "purchase", 4.0),    # d=-300 (tie |d|)
            (3, "view", 2.0), (3, "purchase", 2.0),    # d=0 dropped
            (4, "view", 9.0), (4, "purchase", 1.0),    # d=+800
            (5, "view", 3.0),                          # unpaired, drop
            (6, "purchase", 3.0),                      # unpaired, drop
            (7, "click", 100.0),                       # other type
        ]
        sf = _write_events(tmp_path / "a", rows)
        out = r.q_events_wilcoxon(sf)
        assert tuple(out.iloc[0]) == _ref(rows)
        # n_users counts only nonzero paired users
        assert int(out.iloc[0]["n_users"]) == 3

    def test_all_positive(self, tmp_path, ray_session):
        rows = [(u, "view", 10.0 + u) for u in range(1, 6)] + \
               [(u, "purchase", 1.0) for u in range(1, 6)]
        sf = _write_events(tmp_path / "b", rows)
        out = r.q_events_wilcoxon(sf)
        n, wp, tie = _ref(rows)
        # W+ doubled over all n ranks = n(n+1) when every d > 0
        assert wp == n * (n + 1)
        assert tuple(out.iloc[0]) == (n, wp, tie)

    def test_no_paired_users(self, tmp_path, ray_session):
        rows = [(1, "view", 1.0), (2, "purchase", 2.0)]
        sf = _write_events(tmp_path / "c", rows)
        out = r.q_events_wilcoxon(sf)
        assert len(out) == 0
        assert list(out.columns) == ["n_users", "w_plus_x2",
                                     "tie_sum"]

    def test_multi_event_users_sum_before_diff(self, tmp_path,
                                               ray_session):
        # user 1: views 2+3=5, purchases 1+1=2 => d=+300 (not per-event)
        rows = [(1, "view", 2.0), (1, "view", 3.0),
                (1, "purchase", 1.0), (1, "purchase", 1.0),
                (2, "view", 1.0), (2, "purchase", 7.0)]
        sf = _write_events(tmp_path / "d", rows)
        out = r.q_events_wilcoxon(sf)
        assert tuple(out.iloc[0]) == _ref(rows)

    def test_randomized_vs_bruteforce(self, tmp_path, ray_session):
        rng = np.random.default_rng(2468)
        rows = []
        for u in range(40):
            for _ in range(int(rng.integers(0, 4))):
                rows.append((u, "view",
                             float(rng.integers(0, 50)) * 0.5))
            for _ in range(int(rng.integers(0, 4))):
                rows.append((u, "purchase",
                             float(rng.integers(0, 50)) * 0.5))
        sf = _write_events(tmp_path / "e", rows)
        out = r.q_events_wilcoxon(sf)
        ref = _ref(rows)
        if ref is None:
            assert len(out) == 0
        else:
            assert tuple(out.iloc[0]) == ref
