"""Round-4 (VERDICT r3 item 2): the dimension-attaching queries that
used to ray.put a driver-built ``dict(zip(customer…))`` must route
through the size-aware join planner, and the planner must degrade to the
bucketed shuffle join when the dimension exceeds the broadcast cap.

Two layers:
- identity: q_segment_status_pivot / q_topk_per_group produce the same
  frame whether the planner broadcasts (default 64 MB cap, customer at
  sf0.001 is tiny) or is FORCED onto the shuffle path (cap = 1 byte),
  proving the queries carry no broadcast-only assumption;
- path assertion: with the 1-byte cap the spy records that hash_join
  (not broadcast_join) ran — the planner really picks shuffle when the
  customer side exceeds the cap.
"""

from __future__ import annotations

import pandas as pd
import pytest

from htmlparsersharp_ray.pipelines import joins
from htmlparsersharp_ray.pipelines import relational as r

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def tiny_broadcast_cap(monkeypatch):
    """Force the planner onto the shuffle path and spy which path ran."""
    called = {"broadcast": 0, "hash": 0}
    orig_join = joins.join
    orig_broadcast, orig_hash = joins.broadcast_join, joins.hash_join

    def spy_broadcast(*a, **k):
        called["broadcast"] += 1
        return orig_broadcast(*a, **k)

    def spy_hash(*a, **k):
        called["hash"] += 1
        return orig_hash(*a, **k)

    def capped_join(*a, **k):
        k["broadcast_threshold_bytes"] = 1
        return orig_join(*a, **k)

    monkeypatch.setattr(joins, "broadcast_join", spy_broadcast)
    monkeypatch.setattr(joins, "hash_join", spy_hash)
    monkeypatch.setattr(joins, "join", capped_join)
    return called


def test_segment_status_pivot_same_on_shuffle_path(
    ray_session, tiny_broadcast_cap
):
    shuffled = r.q_segment_status_pivot(SF)
    assert tiny_broadcast_cap["hash"] >= 1
    assert tiny_broadcast_cap["broadcast"] == 0


def test_segment_status_pivot_paths_agree(ray_session, tiny_broadcast_cap):
    shuffled = r.q_segment_status_pivot(SF)
    # fixture teardown restores the real planner for the broadcast leg
    # only at function exit, so compare against a plain pandas oracle
    import pyarrow.parquet as pq

    orders = pq.read_table(
        SF + "/orders.parquet", columns=["o_custkey", "o_orderstatus"]
    ).to_pandas()
    cust = pq.read_table(
        SF + "/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).to_pandas()
    j = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    exp = (
        j.pivot_table(
            index="c_mktsegment", columns="o_orderstatus",
            values="o_custkey", aggfunc="count", fill_value=0,
        )
    )
    for status in ("F", "O", "P"):
        col = exp[status] if status in exp.columns else 0
        got = shuffled.set_index("c_mktsegment")[f"n_{status.lower()}"]
        assert (got == pd.Series(col, index=got.index).fillna(0)).all()
    assert (
        shuffled["n_f"] + shuffled["n_o"] + shuffled["n_p"]
        == shuffled["n_orders"]
    ).all()


def test_join_broadcast_falls_back_to_shuffle(ray_session):
    """q_join_broadcast with a 1-byte cap must take the shuffle hash
    join and produce the identical frame as the broadcast demo path."""
    demo = r.q_join_broadcast(SF)
    shuffled = r.q_join_broadcast(SF, broadcast_threshold_bytes=1)
    pd.testing.assert_frame_equal(demo, shuffled)


def test_orders_semi_falls_back_to_shuffle(ray_session):
    demo = r.q_orders_semi(SF)
    shuffled = r.q_orders_semi(SF, broadcast_threshold_bytes=1)
    pd.testing.assert_frame_equal(demo, shuffled)


def test_promo_revenue_falls_back_to_shuffle(ray_session):
    demo = r.q_promo_revenue(SF)
    shuffled = r.q_promo_revenue(SF, broadcast_threshold_bytes=1)
    pd.testing.assert_frame_equal(demo, shuffled)


def test_lineitem_disjunctive_falls_back_to_shuffle(ray_session):
    demo = r.q_lineitem_disjunctive(SF)
    shuffled = r.q_lineitem_disjunctive(SF, broadcast_threshold_bytes=1)
    pd.testing.assert_frame_equal(demo, shuffled)


def test_customer_anti_falls_back_to_shuffle(ray_session):
    demo = r.q_customer_anti(SF)
    shuffled = r.q_customer_anti(SF, broadcast_threshold_bytes=1)
    pd.testing.assert_frame_equal(demo, shuffled)


def test_region_nation_share_same_on_shuffle_path(
    ray_session, tiny_broadcast_cap
):
    shuffled = r.q_region_nation_share(SF)
    assert tiny_broadcast_cap["hash"] >= 1
    assert tiny_broadcast_cap["broadcast"] == 0
    assert (shuffled["share_in_region"] > 0).all()
    # shares within a region sum to 1 (exact-cents construction)
    import numpy as np

    for _, g in shuffled.groupby("n_regionkey"):
        assert abs(g["share_in_region"].sum() - 1.0) < 1e-9


def test_part_brand_itemsets_same_on_shuffle_path(
    ray_session, tiny_broadcast_cap
):
    shuffled = r.q_part_brand_itemsets(SF, min_support=1)
    assert tiny_broadcast_cap["hash"] >= 1
    assert tiny_broadcast_cap["broadcast"] == 0
    assert (shuffled["b1"] < shuffled["b2"]).all()
    assert (shuffled["b2"] < shuffled["b3"]).all()


def test_topk_per_group_same_on_shuffle_path(ray_session, tiny_broadcast_cap):
    shuffled = r.q_topk_per_group(SF)
    assert tiny_broadcast_cap["hash"] >= 1
    assert tiny_broadcast_cap["broadcast"] == 0

    import pyarrow.parquet as pq

    orders = pq.read_table(
        SF + "/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_totalprice"],
    ).to_pandas()
    cust = pq.read_table(
        SF + "/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).to_pandas()
    j = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    exp = (
        j.sort_values(["o_totalprice", "o_orderkey"],
                      ascending=[False, True])
        .groupby("c_mktsegment", sort=False)
        .head(3)
        .sort_values(["c_mktsegment", "o_totalprice", "o_orderkey"],
                     ascending=[True, False, True])
        .reset_index(drop=True)
    )
    got = shuffled[["c_mktsegment", "o_orderkey", "o_totalprice"]]
    pd.testing.assert_frame_equal(
        got, exp[["c_mktsegment", "o_orderkey", "o_totalprice"]]
    )
    assert (shuffled.groupby("c_mktsegment")["rank"].apply(
        lambda s: list(s) == list(range(1, len(s) + 1))
    )).all()
