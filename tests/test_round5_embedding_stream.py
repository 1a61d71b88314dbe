"""Round-5 (VERDICT r4 item 2): the two graded EXACT embedding
baselines — knn_graph_exact and embedding_cosine_dup_pairs_exact — now
stream the corpus block-by-block inside the scan actors (the round-4
kNN-classifier shape: materialized block refs + bounded running top-k
pool) instead of ds.to_pandas() + ray.put of the full normalized
matrix on the driver.

The old broadcast computation is kept HERE as the single-node numpy
differential only: the streamed result must equal it bitwise across
block layouts (1, 3 and 7 blocks), including the (sim desc, id asc)
tie-break on planted exact-duplicate vectors.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _corpus(n=120, d=12, seed=5, dups=6):
    """Clustered corpus with planted exact duplicates (cosine ties)."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(8, d)) * 3
    x = (centers[rng.integers(0, 8, n)]
         + rng.normal(size=(n, d)) * 0.4).astype(np.float32)
    for i in range(min(dups, n // 2)):  # exact dups -> guaranteed ties
        x[n - 1 - i] = x[i]
    ids = np.arange(n, dtype=np.int64) * 7 + 3  # non-contiguous ids
    return ids, x


def _table(ids, x):
    return pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array([r.tolist() for r in x],
                              pa.list_(pa.float32())),
    })


def _normalized(m):
    nr = np.linalg.norm(m, axis=1, keepdims=True)
    nr[nr == 0] = 1.0
    return m / nr


def _knn_broadcast_reference(ids, x, k):
    """The pre-round-5 broadcast algorithm, single-node: one matmul of
    every row against the full id-sorted normalized matrix, stable
    argsort of -sims (ties to the lower id-sorted column)."""
    order = np.argsort(ids, kind="stable")
    sids = ids[order]
    sx = _normalized(x.astype(np.float64)[order])
    rows = []
    sims = sx @ sx.T
    np.fill_diagonal(sims, -np.inf)
    kk = min(k, len(sids) - 1)
    sel = np.argsort(-sims, axis=1, kind="stable")[:, :kk]
    for i in range(len(sids)):
        for r in range(kk):
            rows.append((sids[i], r + 1, sids[sel[i, r]]))
    return (pd.DataFrame(rows, columns=["vec_id", "rank", "nbr_id"])
            .astype("int64").sort_values(["vec_id", "rank"])
            .reset_index(drop=True))


def _pairs_broadcast_reference(ids, x, threshold):
    sx = _normalized(x.astype(np.float64))
    sims = sx @ sx.T
    ii, jj = np.nonzero(sims >= threshold)
    keep = ids[ii] < ids[jj]
    return (pd.DataFrame({"doc_a": ids[ii][keep], "doc_b": ids[jj][keep]})
            .astype("int64").sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True))


@pytest.mark.parametrize("n_blocks", [1, 3, 7])
def test_knn_graph_exact_streamed_equals_broadcast(ray_session, n_blocks):
    import ray.data
    from htmlparsersharp_ray.stages.similarity import knn_graph_exact

    ids, x = _corpus()
    ds = ray.data.from_arrow(_table(ids, x)).repartition(n_blocks)
    got = knn_graph_exact(ds, k=3)
    exp = _knn_broadcast_reference(ids, x, k=3)
    pd.testing.assert_frame_equal(got, exp)


@pytest.mark.parametrize("n_blocks", [1, 3, 7])
def test_cosine_dup_pairs_streamed_equals_broadcast(ray_session, n_blocks):
    import ray.data
    from htmlparsersharp_ray.stages.dedup import (
        embedding_cosine_dup_pairs_exact,
    )

    ids, x = _corpus()
    ds = ray.data.from_arrow(_table(ids, x)).repartition(n_blocks)
    got = embedding_cosine_dup_pairs_exact(ds, threshold=0.9)
    exp = _pairs_broadcast_reference(ids, x, threshold=0.9)
    assert len(exp) >= 6  # planted duplicates really fire
    pd.testing.assert_frame_equal(got, exp)


def test_knn_graph_exact_single_vector(ray_session):
    """n=1: no neighbors exist — empty typed frame, no crash."""
    import ray.data
    from htmlparsersharp_ray.stages.similarity import knn_graph_exact

    ids, x = _corpus(n=1)
    out = knn_graph_exact(ray.data.from_arrow(_table(ids, x)), k=3)
    assert len(out) == 0
    assert list(out.columns) == ["vec_id", "rank", "nbr_id"]
