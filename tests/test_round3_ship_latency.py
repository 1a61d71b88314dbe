"""Semantics tests for the ship-latency SLA report: join pairing,
whole-day floor arithmetic, per-priority discrete quantiles
(sorted[ceil(q*n)-1]), and priorities absent from the join dropping.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from htmlparsersharp_ray.pipelines import relational as r


def _write(tmp_path, orders, lineitems):
    """orders: (orderkey, orderdate, priority);
    lineitems: (orderkey, shipdate)."""
    t = pa.table({
        "o_orderkey": pa.array([o for o, _, _ in orders], pa.int64()),
        "o_custkey": pa.array([1] * len(orders), pa.int64()),
        "o_orderstatus": pa.array(["F"] * len(orders)),
        "o_totalprice": pa.array([1.0] * len(orders), pa.float64()),
        "o_orderdate": pa.array(
            pd.to_datetime([d for _, d, _ in orders]),
            pa.timestamp("us")),
        "o_orderpriority": pa.array([p for _, _, p in orders]),
    })
    li = pa.table({
        "l_orderkey": pa.array([o for o, _ in lineitems], pa.int64()),
        "l_partkey": pa.array([1] * len(lineitems), pa.int64()),
        "l_suppkey": pa.array([1] * len(lineitems), pa.int64()),
        "l_linenumber": pa.array([1] * len(lineitems), pa.int32()),
        "l_quantity": pa.array([1.0] * len(lineitems), pa.float64()),
        "l_extendedprice": pa.array([1.0] * len(lineitems),
                                    pa.float64()),
        "l_discount": pa.array([0.0] * len(lineitems), pa.float64()),
        "l_tax": pa.array([0.0] * len(lineitems), pa.float64()),
        "l_returnflag": pa.array(["N"] * len(lineitems)),
        "l_linestatus": pa.array(["O"] * len(lineitems)),
        "l_shipdate": pa.array(
            pd.to_datetime([d for _, d in lineitems]),
            pa.timestamp("us")),
    })
    tmp_path.mkdir(parents=True, exist_ok=True)
    pq.write_table(t, str(tmp_path / "orders.parquet"))
    pq.write_table(li, str(tmp_path / "lineitem.parquet"))
    return str(tmp_path)


def _q(vals, q):
    s = sorted(vals)
    return s[math.ceil(q * len(s)) - 1]


class TestShipLatency:
    def test_quantiles_per_priority(self, tmp_path, ray_session):
        orders = [(1, "2024-01-01", "1-URGENT"),
                  (2, "2024-01-01", "1-URGENT"),
                  (3, "2024-01-10", "5-LOW")]
        lineitems = [(1, "2024-01-03"),   # 2 days
                     (1, "2024-01-08"),   # 7 days
                     (2, "2024-01-02"),   # 1 day
                     (3, "2024-01-30")]   # 20 days
        sf = _write(tmp_path / "a", orders, lineitems)
        out = r.q_lineitem_ship_latency(sf).set_index(
            "o_orderpriority")
        urgent = [2, 7, 1]
        assert int(out.loc["1-URGENT", "n"]) == 3
        assert int(out.loc["1-URGENT", "p50_days"]) == _q(urgent, 0.5)
        assert int(out.loc["1-URGENT", "p90_days"]) == _q(urgent, 0.9)
        assert int(out.loc["5-LOW", "n"]) == 1
        assert int(out.loc["5-LOW", "p50_days"]) == 20

    def test_unjoined_priority_drops(self, tmp_path, ray_session):
        orders = [(1, "2024-01-01", "1-URGENT"),
                  (2, "2024-01-01", "5-LOW")]   # no lineitems
        lineitems = [(1, "2024-01-05")]
        sf = _write(tmp_path / "b", orders, lineitems)
        out = r.q_lineitem_ship_latency(sf)
        assert list(out["o_orderpriority"]) == ["1-URGENT"]

    def test_empty_join(self, tmp_path, ray_session):
        orders = [(1, "2024-01-01", "1-URGENT")]
        lineitems = [(99, "2024-01-05")]
        sf = _write(tmp_path / "c", orders, lineitems)
        out = r.q_lineitem_ship_latency(sf)
        assert len(out) == 0
        assert list(out.columns) == ["o_orderpriority", "n",
                                     "p50_days", "p90_days"]

    def test_randomized_vs_bruteforce(self, tmp_path, ray_session):
        rng = np.random.default_rng(606)
        prios = ["1-URGENT", "3-MEDIUM", "5-LOW"]
        orders, lineitems = [], []
        base = pd.Timestamp("2024-01-01")
        for ok in range(1, 41):
            od = base + pd.Timedelta(days=int(rng.integers(0, 30)))
            orders.append((ok, str(od.date()),
                           prios[int(rng.integers(0, 3))]))
            for _ in range(int(rng.integers(0, 4))):
                sd = od + pd.Timedelta(days=int(rng.integers(0, 60)))
                lineitems.append((ok, str(sd.date())))
        sf = _write(tmp_path / "d", orders, lineitems)
        out = r.q_lineitem_ship_latency(sf)
        od_of = {ok: pd.Timestamp(d) for ok, d, _ in orders}
        pr_of = {ok: p for ok, _, p in orders}
        by_p = {}
        for ok, sd in lineitems:
            if ok in od_of:
                d = (pd.Timestamp(sd) - od_of[ok]).days
                by_p.setdefault(pr_of[ok], []).append(d)
        assert len(out) == len(by_p)
        for _, row in out.iterrows():
            vals = by_p[row["o_orderpriority"]]
            assert int(row["n"]) == len(vals)
            assert int(row["p50_days"]) == _q(vals, 0.5)
            assert int(row["p90_days"]) == _q(vals, 0.9)
