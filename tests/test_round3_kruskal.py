"""Semantics tests for the Kruskal-Wallis pooled-rank report: doubled
midranks over the pooled sample, per-type exact rank sums, global tie
term — brute-forced on tiny inputs. Rank-sum invariant: the doubled
rank sums across all types total n(n+1).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from htmlparsersharp_ray.pipelines import relational as r


def _write_events(tmp_path, pairs):
    """pairs: list of (event_type, value)."""
    n = len(pairs)
    t = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array([1_700_000_000_000_000 + i for i in range(n)],
                       pa.timestamp("us")),
        "user_id": pa.array([i % 3 for i in range(n)], pa.int64()),
        "event_type": pa.array([t for t, _ in pairs]),
        "value": pa.array([float(v) for _, v in pairs], pa.float64()),
        "props": pa.array(["{}"] * n),
    })
    tmp_path.mkdir(parents=True, exist_ok=True)
    pq.write_table(t, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _ref(pairs):
    vals = np.array([round(v * 100) for _, v in pairs],
                    dtype=np.int64)
    types = [t for t, _ in pairs]
    out = {}
    tie = 0
    for u in np.unique(vals):
        cnt = int((vals == u).sum())
        tie += cnt ** 3 - cnt
    for i, (t, _) in enumerate(pairs):
        v = vals[i]
        r2 = 2 * int((vals < v).sum()) + int((vals == v).sum()) + 1
        n_t, s_t = out.get(t, (0, 0))
        out[t] = (n_t + 1, s_t + r2)
    return {t: (n_t, s_t, tie) for t, (n_t, s_t) in out.items()}


class TestKruskal:
    def test_hand_case_with_cross_type_ties(self, tmp_path,
                                            ray_session):
        pairs = [("a", 1.0), ("a", 2.0), ("b", 2.0), ("b", 3.0),
                 ("c", 2.0), ("c", 9.0)]
        sf = _write_events(tmp_path / "x", pairs)
        out = r.q_events_kruskal(sf)
        ref = _ref(pairs)
        for _, row in out.iterrows():
            assert (int(row["n"]), int(row["r2_sum"]),
                    int(row["tie_sum"])) == ref[row["event_type"]]
        # doubled rank sums over all groups total n(n+1)
        n = sum(v[0] for v in ref.values())
        assert int(out["r2_sum"].sum()) == n * (n + 1)

    def test_single_type_degenerates_to_full_ranksum(self, tmp_path,
                                                     ray_session):
        pairs = [("only", float(v)) for v in (5, 1, 3)]
        sf = _write_events(tmp_path / "y", pairs)
        out = r.q_events_kruskal(sf)
        assert len(out) == 1
        assert int(out.iloc[0]["r2_sum"]) == 3 * 4

    def test_empty(self, tmp_path, ray_session):
        sf = _write_events(tmp_path / "z", [])
        out = r.q_events_kruskal(sf)
        assert len(out) == 0
        assert list(out.columns) == ["event_type", "n", "r2_sum",
                                     "tie_sum"]

    def test_randomized_vs_bruteforce(self, tmp_path, ray_session):
        rng = np.random.default_rng(777)
        types = ["t0", "t1", "t2", "t3"]
        pairs = [(types[int(rng.integers(0, 4))],
                  float(rng.integers(0, 30)) * 0.5)
                 for _ in range(150)]
        sf = _write_events(tmp_path / "w", pairs)
        out = r.q_events_kruskal(sf)
        ref = _ref(pairs)
        assert len(out) == len(ref)
        for _, row in out.iterrows():
            assert (int(row["n"]), int(row["r2_sum"]),
                    int(row["tie_sum"])) == ref[row["event_type"]]
