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


# ---------------------------------------------------------------------------
# ALS matrix factorization (alternating least squares) — recommender /
# embedding-learning over an interaction table
# ---------------------------------------------------------------------------


def _hash_init_factors(ids: np.ndarray, k: int, scale: float = 0.1):
    """Deterministic seedless init: factor (id, j) maps through
    splitmix64 to a float in [-scale/2, scale/2). No RNG state, so any
    worker can materialize any factor row identically."""
    from .hashing import mix64

    grid = ids.astype(np.uint64)[:, None] * np.uint64(k) + np.arange(
        k, dtype=np.uint64)[None, :]
    h = mix64(grid.ravel()).reshape(grid.shape)
    return ((h / np.float64(2.0 ** 64)) - 0.5) * scale


def _solve_side(
    interactions: ray.data.Dataset,
    fixed: ray.data.Dataset,
    solve_col: str,
    fixed_col: str,
    k: int,
    reg: float,
    n_buckets: int,
):
    """One ALS half-step: attach the FIXED side's factors to every
    interaction (hash join on ``fixed_col``), then solve the normal
    equations per ``solve_col`` entity inside hash buckets.

    Determinism: rows sort by (entity, counterpart id) before the
    segment sums, so each entity's k×k Gram matrix and k-vector are
    accumulated in a canonical order — bitwise identical at any block
    layout — and the batched LAPACK solve is a pure function of them.
    Vectorization: outer products for the WHOLE bucket at once,
    np.add.reduceat over entity boundaries, ONE stacked
    np.linalg.solve — no per-entity Python loop."""
    from ..pipelines.joins import hash_join

    fcols = [f"y{j}" for j in range(k)]

    def rename_fixed(b: pa.Table) -> pa.Table:
        cols = {"fid": b.column("id")}
        for j, c in enumerate(fcols):
            cols[c] = b.column(f"f{j}")
        return pa.table(cols)

    joined = hash_join(
        interactions, fixed.map_batches(rename_fixed,
                                        batch_format="pyarrow"),
        left_on=fixed_col, right_on="fid", n_buckets=n_buckets)

    def bucketize(b: pd.DataFrame) -> pd.DataFrame:
        ent = b[solve_col].to_numpy(np.int64)
        out = {"eb": (ent % np.int64(n_buckets)).astype(np.int64),
               "ent": ent,
               "cid": b[fixed_col].to_numpy(np.int64),
               "c": b["c"].to_numpy(np.float64)}
        for c in fcols:
            out[c] = b[c].to_numpy(np.float64)
        return pd.DataFrame(out)

    def solve(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ent", "cid"])
        f = g[fcols].to_numpy(np.float64)
        c = g["c"].to_numpy(np.float64)
        ent = g["ent"].to_numpy(np.int64)
        starts = np.flatnonzero(np.r_[True, ent[1:] != ent[:-1]])
        outer = f[:, :, None] * f[:, None, :]
        a = np.add.reduceat(outer, starts, axis=0)
        a += np.eye(k) * reg
        b = np.add.reduceat(f * c[:, None], starts, axis=0)
        x = np.linalg.solve(a, b)
        out = {"id": ent[starts]}
        for j in range(k):
            out[f"f{j}"] = x[:, j]
        return pd.DataFrame(out)

    return (joined.map_batches(bucketize, batch_format="pandas")
            .groupby("eb")
            .map_groups(solve, batch_format="pandas"))


def als_train(
    interactions: ray.data.Dataset,
    k: int = 8,
    iters: int = 4,
    reg: float = 0.1,
    n_buckets: int = 32,
    track_sse: str = "all",
):
    """Distributed ALS over an ``(u, i, c)`` interaction Dataset
    (int64 ids, float/int counts): alternating exact least-squares —
    each half-step solves one side's regularized normal equations with
    the other side FIXED, which never increases the regularized
    objective (textbook alternating minimization; public method —
    Zhou et al. 2008 large-scale ALS). Returns
    ``(user_factors_ds, item_factors_ds, history)`` where history rows
    are (iter, sse_q/2^20) — the training squared error measured AFTER
    the iteration, quantized per row on the fixed-point grid so the
    reported metric is bitwise deterministic too.

    Scale shape: factors are DATASETS throughout (never driver-
    resident); each half-step is one hash join + one bucket solve with
    canonical-order segment sums; every round re-roots lineage via
    checkpoint() (CLAUDE.md iterative-loop rule). Item init is a
    seedless hash so round 1's fixed side needs no materialized
    state. ``track_sse``: "all" measures after every iteration (two
    extra joins each), "final" only after the last, "none" skips."""

    def c_float(b: pa.Table) -> pa.Table:
        return pa.table({
            "u": b.column("u").cast(pa.int64()),
            "i": b.column("i").cast(pa.int64()),
            "c": b.column("c").cast(pa.float64()),
        })

    inter = checkpoint(interactions.map_batches(
        c_float, batch_format="pyarrow"))

    def init_items(b: pa.Table) -> pd.DataFrame:
        ids = np.unique(b.column("i").to_numpy(zero_copy_only=False)
                        .astype(np.int64))
        f = _hash_init_factors(ids, k)
        out = {"ib": (ids % np.int64(n_buckets)).astype(np.int64),
               "id": ids}
        for j in range(k):
            out[f"f{j}"] = f[:, j]
        return pd.DataFrame(out)

    def dedup_items(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates("id").drop(columns=["ib"])

    items = checkpoint(
        inter.map_batches(init_items, batch_format="pyarrow")
        .groupby("ib")
        .map_groups(dedup_items, batch_format="pandas"))

    history = []
    users = None
    for it in range(iters):
        users = checkpoint(_solve_side(
            inter, items, "u", "i", k, reg, n_buckets))
        items = checkpoint(_solve_side(
            inter, users, "i", "u", k, reg, n_buckets))
        if track_sse == "all" or (track_sse == "final"
                                  and it == iters - 1):
            history.append(
                (it, _als_sse(inter, users, items, k, n_buckets)))
    return users, items, history


def _als_sse(inter, users, items, k, n_buckets):
    """Training squared error Σ(c − x_u·y_i)² with per-row fixed-point
    quantization (bitwise-deterministic partial sums)."""
    from ..pipelines.joins import hash_join

    fcols = [f"f{j}" for j in range(k)]

    def rename(prefix):
        def fn(b: pa.Table) -> pa.Table:
            cols = {f"{prefix}id": b.column("id")}
            for j in range(k):
                cols[f"{prefix}{j}"] = b.column(f"f{j}")
            return pa.table(cols)
        return fn

    joined = hash_join(
        hash_join(inter, users.map_batches(rename("u_"),
                                           batch_format="pyarrow"),
                  left_on="u", right_on="u_id", n_buckets=n_buckets),
        items.map_batches(rename("i_"), batch_format="pyarrow"),
        left_on="i", right_on="i_id", n_buckets=n_buckets)

    ucols = [f"u_{j}" for j in range(k)]
    icols = [f"i_{j}" for j in range(k)]

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        xu = b[ucols].to_numpy(np.float64)
        yi = b[icols].to_numpy(np.float64)
        err = b["c"].to_numpy(np.float64) - (xu * yi).sum(axis=1)
        q = np.rint(err * err * _GRID).astype(np.int64)
        return pd.DataFrame({"sse_q": [int(q.sum())], "n": [len(b)]})

    parts = joined.map_batches(partial, batch_format="pandas").to_pandas()
    return float(sum(int(v) for v in parts["sse_q"])) / _GRID
