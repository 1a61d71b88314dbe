"""Semantics tests for the sixth late-round-3 batch: 4-cycle census
(`q_part_four_cycles`), forecast backtest comparison
(`q_events_forecast_eval`), and brand-profile Jaccard
(`q_part_brand_jaccard`).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from htmlparsersharp_ray.pipelines import relational as r

DAY_US = 86_400_000_000


def _write_lineitem(tmp_path, pairs):
    li = pa.table({
        "l_orderkey": pa.array([o for o, _ in pairs], pa.int64()),
        "l_partkey": pa.array([p for _, p in pairs], pa.int64()),
        "l_suppkey": pa.array([1] * len(pairs), pa.int64()),
        "l_linenumber": pa.array(range(len(pairs)), pa.int32()),
        "l_quantity": pa.array([1.0] * len(pairs)),
        "l_extendedprice": pa.array([1.0] * len(pairs)),
        "l_discount": pa.array([0.0] * len(pairs)),
        "l_tax": pa.array([0.0] * len(pairs)),
        "l_returnflag": pa.array(["N"] * len(pairs)),
        "l_linestatus": pa.array(["O"] * len(pairs)),
        "l_shipdate": pa.array([0] * len(pairs), pa.timestamp("us")),
    })
    tmp_path.mkdir(parents=True, exist_ok=True)
    pq.write_table(li, str(tmp_path / "lineitem.parquet"))
    return str(tmp_path)


class TestFourCycles:
    def test_single_square(self, tmp_path, ray_session):
        # edges 1-2, 2-3, 3-4, 4-1 via two-part orders: one 4-cycle
        pairs = [(1, 1), (1, 2), (2, 2), (2, 3), (3, 3), (3, 4),
                 (4, 4), (4, 1)]
        out = r.q_part_four_cycles(_write_lineitem(tmp_path / "sq",
                                                   pairs))
        # diagonals (1,3) and (2,4) each have cn=2 -> C(2,2)=1 each
        assert int(out["sum_choose2"].iloc[0]) == 2
        assert int(out["n_cycles4"].iloc[0]) == 1

    def test_clique_formula(self, tmp_path, ray_session):
        # K5 in one order: C4(K_n) = 3*C(n,4) = 3*5 = 15
        pairs = [(1, p) for p in range(1, 6)]
        out = r.q_part_four_cycles(_write_lineitem(tmp_path / "k5",
                                                   pairs))
        assert int(out["n_cycles4"].iloc[0]) == 15

    def test_triangle_has_none(self, tmp_path, ray_session):
        pairs = [(1, 1), (1, 2), (1, 3)]
        out = r.q_part_four_cycles(_write_lineitem(tmp_path / "t",
                                                   pairs))
        assert int(out["n_cycles4"].iloc[0]) == 0


class TestForecastEval:
    def test_sequential_reference(self, tmp_path, ray_session):
        vals = [10.00, 12.00, 9.00, 20.00, 8.00, 8.00, 8.00, 8.00,
                30.00]
        rows = []
        for i, v in enumerate(vals):
            rows.append((i, i * DAY_US + 1000, v))
        t = pa.table({
            "event_id": pa.array([x[0] for x in rows], pa.int64()),
            "ts": pa.array([x[1] for x in rows], pa.timestamp("us")),
            "user_id": pa.array([0] * len(rows), pa.int64()),
            "event_type": pa.array(["view"] * len(rows)),
            "value": pa.array([float(x[2]) for x in rows]),
            "props": pa.array(["{}"] * len(rows)),
        })
        tmp_path.mkdir(parents=True, exist_ok=True)
        pq.write_table(t, str(tmp_path / "events.parquet"))
        out = r.q_events_forecast_eval(str(tmp_path))
        cents = [round(v * 100) for v in vals]
        ses, se, sn = None, 0, 0
        for x in cents:
            if ses is not None:
                se += abs(x - ses)
                sn += 1
            ses = x if ses is None else (ses + x) // 2
        sne = sum(abs(cents[i] - cents[i - 7])
                  for i in range(7, len(cents)))
        got = {row["method"]: (int(row["n_evals"]),
                               int(row["abs_err_sum"]))
               for _, row in out.iterrows()}
        assert got == {"ses": (sn, se),
                       "seasonal_naive": (len(cents) - 7, sne)}


class TestBrandJaccard:
    def test_hand_profiles(self, tmp_path, ray_session):
        brands = ["b1", "b1", "b2", "b2", "b3"]
        types = ["t1", "t2", "t2", "t3", "t9"]
        t = pa.table({
            "p_partkey": pa.array(range(5), pa.int64()),
            "p_name": pa.array(["p"] * 5),
            "p_brand": pa.array(brands),
            "p_type": pa.array(types),
            "p_size": pa.array([1] * 5, pa.int32()),
            "p_retailprice": pa.array([1.0] * 5),
        })
        tmp_path.mkdir(parents=True, exist_ok=True)
        pq.write_table(t, str(tmp_path / "part.parquet"))
        out = r.q_part_brand_jaccard(str(tmp_path))
        # only (b1,b2) overlap, via t2
        assert len(out) == 1
        row = out.iloc[0]
        assert (row["brand_a"], row["brand_b"]) == ("b1", "b2")
        assert (int(row["n_inter"]), int(row["n_a"]),
                int(row["n_b"])) == (1, 2, 2)
