"""Semantics tests for the Zipf log-log fit (fixed-point regression
over exact top-k ranks) and the Wald-Wolfowitz runs test (median-drop
convention, run counting in day order).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from htmlparsersharp_ray.pipelines import relational as r


def _write_docs(tmp_path, texts):
    n = len(texts)
    t = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * n),
        "source": pa.array(["s"] * n),
        "n_chars": pa.array([len(x) for x in texts], pa.int64()),
    })
    tmp_path.mkdir(parents=True, exist_ok=True)
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _write_events_daily(tmp_path, day_cents):
    """One event per (day, cents) entry; day 0 = 2024-01-01."""
    rows = []
    for day, cents in day_cents:
        rows.append((day, cents))
    n = len(rows)
    base = pd.Timestamp("2024-01-01")
    ts = [base + pd.Timedelta(days=d, hours=1) for d, _ in rows]
    t = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(pd.to_datetime(ts), pa.timestamp("us")),
        "user_id": pa.array([0] * n, pa.int64()),
        "event_type": pa.array(["view"] * n),
        "value": pa.array([c / 100.0 for _, c in rows], pa.float64()),
        "props": pa.array(["{}"] * n),
    })
    tmp_path.mkdir(parents=True, exist_ok=True)
    pq.write_table(t, str(tmp_path / "events.parquet"))
    return str(tmp_path)


class TestZipf:
    def test_exact_power_law_slope(self, tmp_path, ray_session):
        # geometric counts decay much faster than rank^-1: the fitted
        # log-log slope must come out steeply negative (exactness is
        # pinned by test_matches_reference_fixed_point)
        texts = []
        for i, cnt in enumerate((4096, 1024, 256, 64)):
            texts.append(" ".join([f"w{i}"] * cnt))
        sf = _write_docs(tmp_path / "a", texts)
        out = r.q_docs_zipf(sf, k=4)
        assert int(out.iloc[0]["n_terms"]) == 4
        assert float(out.iloc[0]["slope"]) < -1.0

    def test_flat_corpus_slope_zero(self, tmp_path, ray_session):
        texts = [" ".join([f"t{i}"] * 16) for i in range(6)]
        sf = _write_docs(tmp_path / "b", texts)
        out = r.q_docs_zipf(sf, k=6)
        assert abs(float(out.iloc[0]["slope"])) < 1e-6

    def test_fewer_than_two_terms_empty(self, tmp_path, ray_session):
        sf = _write_docs(tmp_path / "c", ["word word word"])
        out = r.q_docs_zipf(sf)
        assert len(out) == 0

    def test_matches_reference_fixed_point(self, tmp_path,
                                           ray_session):
        rng = np.random.default_rng(12)
        counts = sorted(rng.integers(2, 500, size=12).tolist(),
                        reverse=True)
        texts = [" ".join([f"z{i:02d}"] * c)
                 for i, c in enumerate(counts)]
        sf = _write_docs(tmp_path / "d", texts)
        out = r.q_docs_zipf(sf, k=12)
        # reference: identical fixed-point regression
        ranked = sorted(
            [(f"z{i:02d}", c) for i, c in enumerate(counts)],
            key=lambda tc: (-tc[1], tc[0]))
        xs = [math.floor(math.log(float(i)) * 1073741824.0)
              for i in range(1, 13)]
        ys = [math.floor(math.log(float(c)) * 1073741824.0)
              for _, c in ranked]
        n = 12
        num = n * sum(a * b for a, b in zip(xs, ys)) \
            - sum(xs) * sum(ys)
        den = n * sum(a * a for a in xs) - sum(xs) ** 2
        assert float(out.iloc[0]["slope"]) == r._h2d(num) / r._h2d(den)


class TestRunsTest:
    def test_alternating_max_runs(self, tmp_path, ray_session):
        # days alternate low/high around the median; median day drops
        day_cents = [(0, 10), (1, 100), (2, 10), (3, 100), (4, 50)]
        sf = _write_events_daily(tmp_path / "a", day_cents)
        out = r.q_events_runs_test(sf)
        row = out.iloc[0]
        # median of (10,100,10,100,50) = 50 -> day 4 drops
        assert int(row["median_cents"]) == 50
        assert (int(row["n1"]), int(row["n2"])) == (2, 2)
        assert int(row["n_runs"]) == 4

    def test_trending_two_runs(self, tmp_path, ray_session):
        day_cents = [(d, 10) for d in range(3)] + \
                    [(d, 100) for d in range(3, 6)]
        sf = _write_events_daily(tmp_path / "b", day_cents)
        out = r.q_events_runs_test(sf)
        row = out.iloc[0]
        # median = sorted[ceil(6/2)-1] = third smallest = 10 -> the
        # three low days drop as median-equal
        assert int(row["median_cents"]) == 10
        assert (int(row["n1"]), int(row["n2"])) == (3, 0)
        assert int(row["n_runs"]) == 1

    def test_all_days_equal(self, tmp_path, ray_session):
        day_cents = [(d, 25) for d in range(4)]
        sf = _write_events_daily(tmp_path / "c", day_cents)
        out = r.q_events_runs_test(sf)
        row = out.iloc[0]
        assert (int(row["n1"]), int(row["n2"]),
                int(row["n_runs"])) == (0, 0, 0)
        assert int(row["median_cents"]) == 25  # one 25c event/day
