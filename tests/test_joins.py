"""Tests for the bucketed two-sided shuffle hash join (pipelines/joins.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _mk_ds(df: pd.DataFrame, n_blocks: int = 4):
    import ray.data

    return ray.data.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)
    ).repartition(n_blocks)


@pytest.fixture(scope="module")
def join_inputs(ray_session):
    rng = np.random.default_rng(42)
    left = pd.DataFrame({
        "k": rng.integers(0, 500, size=5000).astype(np.int64),
        "lv": np.arange(5000, dtype=np.int64),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, 600, size=800).astype(np.int64),
        "rv": np.arange(800, dtype=np.int64) * 10,
    })
    return left, right


def test_hash_join_inner_matches_pandas(join_inputs):
    from htmlparsersharp_ray.pipelines.joins import hash_join

    left, right = join_inputs
    out = hash_join(_mk_ds(left), _mk_ds(right), "k", "k").to_pandas()
    expected = left.merge(right, on="k", how="inner")
    key = ["k", "lv", "rv"]
    got = out[key].sort_values(key).reset_index(drop=True)
    exp = expected[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)


def test_hash_join_different_key_names(join_inputs):
    from htmlparsersharp_ray.pipelines.joins import hash_join

    left, right = join_inputs
    r2 = right.rename(columns={"k": "rk"})
    out = hash_join(_mk_ds(left), _mk_ds(r2), "k", "rk").to_pandas()
    expected = left.merge(r2, left_on="k", right_on="rk", how="inner")
    key = ["k", "lv", "rv"]
    got = out[key].sort_values(key).reset_index(drop=True)
    exp = expected[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)


def test_hash_join_string_keys(ray_session):
    from htmlparsersharp_ray.pipelines.joins import hash_join

    left = pd.DataFrame({"name": [f"u{i % 37}" for i in range(400)],
                         "lv": np.arange(400, dtype=np.int64)})
    right = pd.DataFrame({"name": [f"u{i}" for i in range(50)],
                          "rv": np.arange(50, dtype=np.int64)})
    out = hash_join(_mk_ds(left, 3), _mk_ds(right, 2), "name", "name").to_pandas()
    expected = left.merge(right, on="name", how="inner")
    key = ["name", "lv", "rv"]
    got = out[key].sort_values(key).reset_index(drop=True)
    exp = expected[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)


def test_hash_join_no_matches_yields_empty_with_schema(ray_session):
    from htmlparsersharp_ray.pipelines.joins import hash_join

    left = pd.DataFrame({"k": np.arange(10, dtype=np.int64),
                         "lv": np.arange(10, dtype=np.int64)})
    right = pd.DataFrame({"k": np.arange(100, 110, dtype=np.int64),
                          "rv": np.arange(10, dtype=np.int64)})
    out = hash_join(_mk_ds(left, 2), _mk_ds(right, 2), "k", "k",
                    strict_empty_schema=True)
    # Dataset-level schema keeps the joined layout even when every block
    # is empty (Ray's to_pandas drops columns for all-empty datasets).
    assert set(out.schema().names) == {"k", "lv", "rv"}
    assert out.count() == 0
    # default lazy mode still joins correctly; only the fully-disjoint
    # empty-schema guarantee needs the strict flag
    lazy = hash_join(_mk_ds(left, 2), _mk_ds(right, 2), "k", "k")
    assert lazy.count() == 0


def test_hash_join_rejects_unknown_how(ray_session):
    from htmlparsersharp_ray.pipelines.joins import hash_join

    with pytest.raises(ValueError):
        hash_join(None, None, "k", "k", how="outer")


def test_join_planner_broadcasts_small_metadata_side(join_inputs, ray_session):
    import ray.data
    from htmlparsersharp_ray.pipelines import joins

    left, right = join_inputs
    # right side read from parquet => size known from metadata
    import tempfile, os
    import pyarrow.parquet as pq
    import pyarrow as pa_

    d = tempfile.mkdtemp(prefix="join_planner_")
    pq.write_table(pa_.Table.from_pandas(right, preserve_index=False),
                   os.path.join(d, "right.parquet"))
    right_ds = ray.data.read_parquet(os.path.join(d, "right.parquet"))

    called = {}
    orig_broadcast, orig_hash = joins.broadcast_join, joins.hash_join
    try:
        def spy_broadcast(*a, **k):
            called["broadcast"] = True
            return orig_broadcast(*a, **k)

        def spy_hash(*a, **k):
            called["hash"] = True
            return orig_hash(*a, **k)

        joins.broadcast_join, joins.hash_join = spy_broadcast, spy_hash
        out = joins.join(_mk_ds(left), right_ds, "k", "k").to_pandas()
    finally:
        joins.broadcast_join, joins.hash_join = orig_broadcast, orig_hash
    assert called.get("broadcast") and "hash" not in called
    expected = left.merge(right, on="k", how="inner")
    key = ["k", "lv", "rv"]
    got = out[key].sort_values(key).reset_index(drop=True)
    exp = expected[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)


def test_join_planner_shuffles_over_threshold(join_inputs, ray_session):
    from htmlparsersharp_ray.pipelines import joins

    left, right = join_inputs
    out = joins.join(_mk_ds(left), _mk_ds(right), "k", "k",
                     broadcast_threshold_bytes=1).to_pandas()
    expected = left.merge(right, on="k", how="inner")
    key = ["k", "lv", "rv"]
    got = out[key].sort_values(key).reset_index(drop=True)
    exp = expected[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)


def test_hash_join_left(join_inputs, ray_session):
    from htmlparsersharp_ray.pipelines.joins import hash_join

    left, right = join_inputs
    dedup_right = right.drop_duplicates("k")  # keep row counts predictable
    out = hash_join(_mk_ds(left), _mk_ds(dedup_right), "k", "k",
                    how="left").to_pandas()
    expected = left.merge(dedup_right, on="k", how="left")
    assert len(out) == len(expected)
    key = ["k", "lv"]
    got = out.sort_values(key).reset_index(drop=True)
    exp = expected.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["k", "lv"]], exp[["k", "lv"]])
    # unmatched rows are null-filled on the right
    assert got["rv"].isna().equals(exp["rv"].isna())
    matched = exp["rv"].notna()
    assert (got.loc[matched, "rv"] == exp.loc[matched, "rv"]).all()
