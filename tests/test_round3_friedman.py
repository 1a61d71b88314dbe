"""Semantics tests for the Friedman within-blocks rank report:
complete blocks only, within-user doubled midranks, per-type rank
sums, tie term — brute-forced on tiny inputs. Invariant: rank sums
across types total n_blocks * k(k+1).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from htmlparsersharp_ray.pipelines import relational as r


def _write_events(tmp_path, rows):
    """rows: (user_id, event_type, value)."""
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
    types = sorted({e for _, e, _ in rows})
    k = len(types)
    per = {}
    for u, e, v in rows:
        per.setdefault(u, {}).setdefault(e, 0)
        per[u][e] += round(v * 100)
    blocks = {u: d for u, d in per.items() if len(d) == k}
    sums = {t: [0, 0] for t in types}
    tie = 0
    for d in blocks.values():
        vals = np.array([d[t] for t in types])
        for u_v in np.unique(vals):
            c = int((vals == u_v).sum())
            tie += c ** 3 - c
        for t in types:
            v = d[t]
            r2 = 2 * int((vals < v).sum()) + int((vals == v).sum()) + 1
            sums[t][0] += 1
            sums[t][1] += r2
    return {t: (nb, s, tie) for t, (nb, s) in sums.items()
            if nb > 0}


class TestFriedman:
    def test_hand_case(self, tmp_path, ray_session):
        rows = [
            (1, "a", 1.0), (1, "b", 2.0), (1, "c", 3.0),
            (2, "a", 3.0), (2, "b", 2.0), (2, "c", 1.0),
            (3, "a", 2.0), (3, "b", 2.0), (3, "c", 2.0),  # all tied
            (4, "a", 1.0), (4, "b", 5.0),                 # incomplete
        ]
        sf = _write_events(tmp_path / "x", rows)
        out = r.q_events_friedman(sf)
        ref = _ref(rows)
        assert len(out) == 3
        for _, row in out.iterrows():
            assert (int(row["n_blocks"]), int(row["r2_sum"]),
                    int(row["tie_sum"])) == ref[row["event_type"]]
        # invariant: sum over types = n_blocks * k(k+1)
        assert int(out["r2_sum"].sum()) == 3 * 3 * 4

    def test_repeat_events_sum_before_rank(self, tmp_path,
                                           ray_session):
        rows = [(1, "a", 1.0), (1, "a", 5.0),   # a: 600 total
                (1, "b", 4.0)]                  # b: 400
        sf = _write_events(tmp_path / "y", rows)
        out = r.q_events_friedman(sf).set_index("event_type")
        # within user 1: b < a -> doubled midranks 2 and 4
        assert int(out.loc["b", "r2_sum"]) == 2
        assert int(out.loc["a", "r2_sum"]) == 4

    def test_no_complete_blocks(self, tmp_path, ray_session):
        rows = [(1, "a", 1.0), (2, "b", 2.0)]
        sf = _write_events(tmp_path / "z", rows)
        out = r.q_events_friedman(sf)
        assert len(out) == 0

    def test_randomized_vs_bruteforce(self, tmp_path, ray_session):
        rng = np.random.default_rng(90210)
        rows = []
        types = ["a", "b", "c"]
        for u in range(30):
            for t in types:
                if rng.random() < 0.8:
                    rows.append((u, t,
                                 float(rng.integers(0, 20)) * 0.5))
        sf = _write_events(tmp_path / "w", rows)
        out = r.q_events_friedman(sf)
        ref = _ref(rows)
        if not ref:
            assert len(out) == 0
        else:
            assert len(out) == len(ref)
            for _, row in out.iterrows():
                assert (int(row["n_blocks"]), int(row["r2_sum"]),
                        int(row["tie_sum"])) == \
                    ref[row["event_type"]]
