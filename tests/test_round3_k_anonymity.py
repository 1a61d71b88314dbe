"""Semantics tests for the k-anonymity generalization-ladder audit:
per-level equivalence-class counts, sub-k classes, and rows at risk,
rolled up from one finest-grain cell pass.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from htmlparsersharp_ray.pipelines import relational as r


def _write_customer(tmp_path, nations, segments):
    n = len(nations)
    t = pa.table({
        "c_custkey": pa.array(range(n), pa.int64()),
        "c_name": pa.array([f"c{i}" for i in range(n)]),
        "c_nationkey": pa.array(nations, pa.int64()),
        "c_acctbal": pa.array([0.0] * n, pa.float64()),
        "c_mktsegment": pa.array(segments),
    })
    tmp_path.mkdir(parents=True, exist_ok=True)
    pq.write_table(t, str(tmp_path / "customer.parquet"))
    return str(tmp_path)


class TestKAnonymity:
    def test_ladder_counts(self, tmp_path, ray_session):
        # nation 1: 6 x segA (safe at level 0), 2 x segB (violating)
        # nation 2: 3 x segA (violating at level 0; nation total 3 < 5
        #           still violating at level 1)
        nations = [1] * 8 + [2] * 3
        segments = ["A"] * 6 + ["B"] * 2 + ["A"] * 3
        sf = _write_customer(tmp_path / "a", nations, segments)
        out = r.q_audit_k_anonymity(sf).set_index("level")
        assert out.loc[0, "n_classes"] == 3
        assert out.loc[0, "n_violating"] == 2
        assert out.loc[0, "rows_at_risk"] == 5
        assert out.loc[1, "n_classes"] == 2
        assert out.loc[1, "n_violating"] == 1
        assert out.loc[1, "rows_at_risk"] == 3
        assert out.loc[2, "n_classes"] == 1
        assert out.loc[2, "n_violating"] == 0
        assert out.loc[2, "rows_at_risk"] == 0

    def test_fully_anonymous_input(self, tmp_path, ray_session):
        nations = [7] * 10
        segments = ["X"] * 10
        sf = _write_customer(tmp_path / "b", nations, segments)
        out = r.q_audit_k_anonymity(sf)
        assert (out["n_violating"] == 0).all()
        assert (out["rows_at_risk"] == 0).all()

    def test_empty_table_mirrors_oracle(self, tmp_path, ray_session):
        sf = _write_customer(tmp_path / "c", [], [])
        out = r.q_audit_k_anonymity(sf)
        # the oracle's level-2 COUNT(*) emits one empty sub-k class
        assert len(out) == 1
        assert tuple(out.iloc[0]) == (2, 1, 1, 0)
