"""Semantics tests for the calendar-month cohort retention matrix:
first-order month anchors, cross-year offset arithmetic, distinct-
customer cell counts, same-month repeat orders collapsing.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from htmlparsersharp_ray.pipelines import relational as r


def _write_orders(tmp_path, custkeys, dates):
    n = len(custkeys)
    t = pa.table({
        "o_orderkey": pa.array(range(n), pa.int64()),
        "o_custkey": pa.array(custkeys, pa.int64()),
        "o_orderstatus": pa.array(["F"] * n),
        "o_totalprice": pa.array([1.0] * n, pa.float64()),
        "o_orderdate": pa.array(pd.to_datetime(dates),
                                pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * n),
    })
    tmp_path.mkdir(parents=True, exist_ok=True)
    pq.write_table(t, str(tmp_path / "orders.parquet"))
    return str(tmp_path)


class TestOrdersCohort:
    def test_matrix_and_cross_year_offsets(self, tmp_path,
                                           ray_session):
        # cust 1: first 2023-11, returns 2024-01 (offset 2) — crosses
        # the year boundary; cust 2: first 2023-11 only; cust 3:
        # first 2024-01, returns 2024-01 again (same month collapses)
        custkeys = [1, 1, 2, 3, 3]
        dates = ["2023-11-05", "2024-01-20", "2023-11-30",
                 "2024-01-02", "2024-01-28"]
        sf = _write_orders(tmp_path / "a", custkeys, dates)
        out = r.q_orders_cohort(sf)
        nov23 = 2023 * 12 + 10
        jan24 = 2024 * 12 + 0
        expect = pd.DataFrame({
            "cohort_month": [nov23, nov23, jan24],
            "month_offset": [0, 2, 0],
            "n_customers": [2, 1, 1],
        })
        pd.testing.assert_frame_equal(out, expect.astype("int64"))

    def test_offset_zero_counts_whole_cohort(self, tmp_path,
                                             ray_session):
        custkeys = [10, 11, 12, 10, 11]
        dates = ["2024-03-01", "2024-03-15", "2024-03-31",
                 "2024-05-01", "2024-06-30"]
        sf = _write_orders(tmp_path / "b", custkeys, dates)
        out = r.q_orders_cohort(sf).set_index("month_offset")
        assert int(out.loc[0, "n_customers"]) == 3
        assert int(out.loc[2, "n_customers"]) == 1
        assert int(out.loc[3, "n_customers"]) == 1

    def test_empty(self, tmp_path, ray_session):
        sf = _write_orders(tmp_path / "c", [], [])
        out = r.q_orders_cohort(sf)
        assert len(out) == 0
        assert list(out.columns) == ["cohort_month", "month_offset",
                                     "n_customers"]
