"""Distributed classifier training over Dataset streams — the
filter-model step of a curation pipeline (modern corpus work trains a
lightweight linear probe on embeddings or cheap statistics, then
applies it corpus-wide; e.g. the DCLM / phi-style quality classifiers
— public methods).

Determinism contract (the kmeans/PCA precedent from
``stages/clustering.py``): every float contribution is quantized to
fixed point PER ROW (``round(v * 2^SHIFT)`` as int64), so partial sums
are exact integers and associative — the gradient, loss and accuracy
of every iteration are BITWISE identical at any parallelism / block
layout. The weight update itself runs on the driver over a k-sized
vector in plain float64, which is deterministic because its inputs
are.

Reference n/a — engine-level op (the reference parses HTML; this is
the training-data-pipeline extension surface).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .clustering import _batch_matrix
from .exchange import checkpoint

# contribution quantization grid: exact multiples of 2^-20
_SHIFT = 20
_GRID = float(1 << _SHIFT)


def probe_features(target_label: int):
    """Batch fn: (vec_id, embedding, label) → one bias column, the raw
    embedding dims as f0..f{d-1}, and the one-vs-rest label
    ``y = (label == target_label)``. The flatten is the zero-copy
    Arrow-value-buffer path (:func:`clustering._batch_matrix`)."""

    def fn(batch: pa.Table) -> pd.DataFrame:
        x = _batch_matrix(batch, "embedding")
        lab = batch.column("label").to_numpy(zero_copy_only=False)
        out = {"vec_id": batch.column("vec_id").to_numpy(
            zero_copy_only=False).astype(np.int64)}
        out["bias"] = np.ones(len(lab))
        for j in range(x.shape[1]):
            out[f"f{j}"] = x[:, j].astype(np.float64)
        out["y"] = (lab == target_label).astype(np.int64)
        return pd.DataFrame(out)

    return fn


def _quantized_partials(w: np.ndarray, cols: list, pos_weight: float):
    """Per-batch gradient/loss/accuracy partials on the fixed-point
    grid, emitted as ONE-ROW int64 frames — the driver merges Python
    ints (2k+3 integers of driver state per pass). ``pos_weight``
    up-weights positive rows' gradient contributions (the standard
    imbalanced-class fix; it multiplies BEFORE the per-row
    quantization, so determinism is unaffected)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        x = b[cols].to_numpy(np.float64)
        y = b["y"].to_numpy(np.float64)
        z = np.clip(x @ w, -30.0, 30.0)
        p = 1.0 / (1.0 + np.exp(-z))
        rw = np.where(y > 0, pos_weight, 1.0)
        # per-ROW quantization -> integer partial sums are associative
        g = np.rint(x * ((rw * (p - y)) * _GRID)[:, None]).astype(np.int64)
        loss = np.rint(
            (np.log1p(np.exp(-np.abs(z))) + np.where(y > 0, 0.0, 1.0) * z
             + np.maximum(-z, 0.0)) * _GRID).astype(np.int64)
        correct = ((p >= 0.5) == (y > 0)).sum()
        out = {f"g{j}": [int(v)] for j, v in enumerate(g.sum(axis=0))}
        out["loss_q"] = [int(loss.sum())]
        out["n"] = [len(b)]
        out["n_correct"] = [int(correct)]
        return pd.DataFrame(out)

    return partial


def logreg_train(
    features: ray.data.Dataset,
    feature_cols: list,
    iters: int = 20,
    lr: float = 5.0,
    l2: float = 1e-4,
    pos_weight: float = 1.0,
):
    """Full-batch logistic-regression gradient descent over a feature
    Dataset (columns = ``feature_cols`` + ``y``): each iteration is
    ONE streaming pass emitting one-row integer partials; the driver
    merges Python ints, dequantizes once, and updates the k-vector.
    Returns ``(weights, history)`` with history rows
    ``(iter, mean_loss, accuracy)`` — the loss/accuracy of iteration
    ``i`` are measured at the weights BEFORE update ``i``.

    Scale shape: the feature table is checkpointed once (iterations
    re-stream materialized blocks, never re-derive lineage —
    CLAUDE.md's iterative-loop rule); the model ships in the
    task-function closure (k floats — the kmeans lesson: actor pools
    are for heavy per-actor state, not tiny broadcast arrays); no
    driver-resident rows, ever."""
    feats = checkpoint(features)
    k = len(feature_cols)
    w = np.zeros(k, dtype=np.float64)
    history = []
    for it in range(iters):
        parts = feats.map_batches(
            _quantized_partials(w, list(feature_cols), pos_weight),
            batch_format="pandas").to_pandas()
        n = int(parts["n"].sum())
        g = np.array(
            [float(sum(int(v) for v in parts[f"g{j}"])) / _GRID
             for j in range(k)]) / max(n, 1)
        loss = (float(sum(int(v) for v in parts["loss_q"]))
                / _GRID / max(n, 1))
        acc = float(sum(int(v) for v in parts["n_correct"])) / max(n, 1)
        history.append((it, loss, acc))
        w = w - lr * (g + l2 * w)
    return w, history


def train_embedding_probe(
    embeddings: ray.data.Dataset,
    target_label: int = 0,
    iters: int = 20,
    lr: float = 5.0,
    pos_weight: float = 1.0,
):
    """One-vs-rest linear probe on the embedding table: returns
    ``(weights, history, feature_names)`` where the first weight is
    the bias and the rest align with embedding dims. For a 1-in-k
    label, pass ``pos_weight≈k-1`` so the minority class's gradient
    isn't drowned by the majority plateau."""
    sample = embeddings.take_batch(1, batch_format="pyarrow")
    d = len(sample.column("embedding")[0])
    cols = ["bias"] + [f"f{j}" for j in range(d)]
    feats = embeddings.map_batches(
        probe_features(target_label), batch_format="pyarrow")
    w, history = logreg_train(feats, cols, iters=iters, lr=lr,
                              pos_weight=pos_weight)
    return w, history, cols
