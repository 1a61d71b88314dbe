"""Semantics tests for the hour x type mutual-information report:
fixed-point floor-then-sum per cell, zero for exactly independent
tables, matching a direct float reference within the flooring bound.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from htmlparsersharp_ray.pipelines import relational as r


def _write_events(tmp_path, hours, types):
    n = len(hours)
    ts = pd.to_datetime([f"2024-01-01 {h:02d}:00:00" for h in hours])
    t = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array([0] * n, pa.int64()),
        "event_type": pa.array(list(types)),
        "value": pa.array([0.0] * n, pa.float64()),
        "props": pa.array(["{}"] * n),
    })
    tmp_path.mkdir(parents=True, exist_ok=True)
    pq.write_table(t, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _ref_scaled(hours, types):
    df = pd.DataFrame({"h": hours, "t": types})
    cells = df.groupby(["h", "t"]).size()
    rh = df.groupby("h").size()
    ct = df.groupby("t").size()
    n = len(df)
    s = 0
    for (h, t), c in cells.items():
        s += math.floor((c / n)
                        * math.log((c * n) / (rh[h] * ct[t]))
                        * 1073741824.0)
    return n, len(cells), s


class TestMutualInfo:
    def test_exact_independence_is_zero(self, tmp_path, ray_session):
        # every (hour, type) combo equally often => c*n == rh*ct
        hours, types = [], []
        for h in (1, 2, 3):
            for t in ("a", "b"):
                hours += [h] * 4
                types += [t] * 4
        sf = _write_events(tmp_path / "a", hours, types)
        out = r.q_events_mutual_info(sf)
        assert int(out.iloc[0]["mi_scaled"]) == 0
        assert int(out.iloc[0]["n_cells"]) == 6

    def test_perfect_dependence(self, tmp_path, ray_session):
        # type fully determined by hour: MI = H(type) = ln 2 for a
        # 50/50 split; fixed point: 2 cells each floor(.5*ln2*2^30)
        hours = [9] * 5 + [17] * 5
        types = ["x"] * 5 + ["y"] * 5
        sf = _write_events(tmp_path / "b", hours, types)
        out = r.q_events_mutual_info(sf)
        expect = 2 * math.floor(0.5 * math.log(2.0) * 1073741824.0)
        assert int(out.iloc[0]["mi_scaled"]) == expect

    def test_matches_float_reference(self, tmp_path, ray_session):
        rng = np.random.default_rng(55)
        hours = rng.integers(0, 24, size=200).tolist()
        types = [["a", "b", "c"][i] for i in
                 rng.integers(0, 3, size=200)]
        sf = _write_events(tmp_path / "c", hours, types)
        out = r.q_events_mutual_info(sf)
        assert tuple(out.iloc[0]) == _ref_scaled(hours, types)
