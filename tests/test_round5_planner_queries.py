"""Round-5 (VERDICT r4 item 1): the three TPC-H queries that still
shipped a region/nation-pruned SUPPLIER slice via an ungated ray.put
(q_region_revenue, q_nation_volume, q_nation_market_share) are now
size-gated — supplier is 10k rows/SF, linear in table scale, so the
planner rule ("no driver-built array may grow with table scale
ungated") applies exactly as it did to part/customer in round 4.

Each test forces the 1-byte broadcast cap (driving the bucketed-shuffle
attach path) and asserts frame equality with the default broadcast path
— the path the full oracle sweep grades against DuckDB — proving the
queries carry no broadcast-only assumption.
"""

from __future__ import annotations

import pandas as pd

from htmlparsersharp_ray.pipelines import relational as r

SF = "/root/testdata/sf0.001"


def _agree(q, **kw):
    a = q(SF).reset_index(drop=True)
    b = q(SF, broadcast_threshold_bytes=1, **kw).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    return a


def test_region_revenue_paths_agree(ray_session):
    out = _agree(r.q_region_revenue)
    assert list(out.columns) == ["n_name", "revenue"]


def test_nation_volume_paths_agree(ray_session):
    out = _agree(r.q_nation_volume)
    assert list(out.columns) == ["supp_nation", "cust_nation", "l_year",
                                 "revenue"]


def test_nation_market_share_paths_agree(ray_session):
    out = _agree(r.q_nation_market_share)
    assert list(out.columns) == ["o_year", "mkt_share"]
    # the numerator can't exceed the denominator on any path
    assert ((out["mkt_share"] >= 0) & (out["mkt_share"] <= 1)).all()
