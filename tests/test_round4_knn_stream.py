"""Round-4 kNN classifier scale path: the graded query streams the
train side as object-store blocks with a bounded running top-k pool
(no driver to_pandas of the corpus). These tests force MULTI-BLOCK
train sides — the pool-merge + (dist, id) lexsort tie-break path the
single-file sf corpus may not exercise — and pin them against the
brute-force reference.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from htmlparsersharp_ray.pipelines import relational as r


def _write_embeddings(tmp_path, mat, labels, row_group_size=8):
    t = pa.table({
        "vec_id": pa.array(range(len(labels)), pa.int64()),
        "embedding": pa.array([list(map(float, row)) for row in mat],
                              pa.list_(pa.float32())),
        "label": pa.array([int(x) for x in labels], pa.int32()),
    })
    tmp_path.mkdir(parents=True, exist_ok=True)
    pq.write_table(t, str(tmp_path / "embeddings.parquet"),
                   row_group_size=row_group_size)
    return str(tmp_path)


def _brute(mat, labels, k=5):
    SCALE = float(1 << 20)
    vq = np.rint(np.asarray(
        [list(map(float, np.asarray(row, dtype=np.float32)))
         for row in mat], dtype=np.float64) * SCALE).astype(np.int64)
    train = [i for i in range(len(labels)) if i % 2 == 0]
    want = {}
    for i in range(len(labels)):
        if i % 2 == 0:
            continue
        ds_ = sorted((int(((vq[i] - vq[j]) ** 2).sum()), j)
                     for j in train)[:k]
        votes = {}
        for _, j in ds_:
            votes[int(labels[j])] = votes.get(int(labels[j]), 0) + 1
        want[i] = min(votes, key=lambda l: (-votes[l], l))
    return want


def test_multiblock_stream_matches_bruteforce(tmp_path, ray_session):
    """Small row groups → several object-store blocks → the running
    pool folds across blocks; ties must still break to the smaller
    train id exactly as the one-matrix argsort does."""
    rng = np.random.default_rng(23)
    n, d = 120, 3
    labels = rng.integers(0, 4, size=n)
    # coarse grid → many EXACT distance ties across blocks
    mat = rng.integers(-2, 3, size=(n, d)).astype(float) / 4.0
    sf = _write_embeddings(tmp_path, mat, labels, row_group_size=8)
    out = r.q_embeddings_knn_classifier(sf)
    got = dict(zip(out["vec_id"].astype(int), out["pred_label"].astype(int)))
    assert got == _brute(mat, labels)


def test_k_larger_than_train_side(tmp_path, ray_session):
    labels = [0, 1, 2, 0, 1, 0]
    mat = np.eye(6)[:, :4]
    sf = _write_embeddings(tmp_path, mat, labels, row_group_size=2)
    out = r.q_embeddings_knn_classifier(sf)  # k=5 > 3 train rows
    want = _brute(mat, labels)
    got = dict(zip(out["vec_id"].astype(int), out["pred_label"].astype(int)))
    assert got == want


def test_empty_train_side(tmp_path, ray_session):
    labels = [1, 2, 3]
    mat = np.eye(3)
    t = pa.table({
        "vec_id": pa.array([1, 3, 5], pa.int64()),  # all odd: no train
        "embedding": pa.array([list(map(float, row)) for row in mat],
                              pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    })
    tmp_path.mkdir(parents=True, exist_ok=True)
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    out = r.q_embeddings_knn_classifier(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["vec_id", "pred_label"]
