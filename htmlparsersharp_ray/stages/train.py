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


# --- gradient-boosted stumps (LS-Boost, integer-exact) -----------------------
GBDT_SCALE = 1 << 20


def _gbdt_bins(mat: np.ndarray) -> np.ndarray:
    """The embeddings_stump binning: floor(v·16) clipped to [-8, 7]."""
    return np.clip(np.floor(mat.astype(np.float64) * 16.0),
                   -8, 7).astype(np.int64)


def _gbdt_apply(q: np.ndarray, f0: int, models: list) -> np.ndarray:
    """Vectorized prediction on the fixed-point grid: F = F0 + Σ leaf."""
    f = np.full(len(q), f0, dtype=np.int64)
    for (dim, thr, lfp, rfp) in models:
        f += np.where(q[:, dim] <= thr, np.int64(lfp), np.int64(rfp))
    return f


def _gbdt_best_split(cnt: np.ndarray, rsum: np.ndarray):
    """Exact argmax of the LS gain S_L²/n_L + S_R²/n_R over the
    (dim, thr) candidate grid using Fraction-free Python-int
    cross-multiplication; ties to the smallest (dim, thr); splits with
    an empty side are excluded. Returns (dim, thr_index) or None."""
    d, nb = cnt.shape
    left_n = np.cumsum(cnt, axis=1)[:, :-1]
    left_s = np.cumsum(rsum, axis=1)[:, :-1]
    tot_n = cnt.sum(axis=1, keepdims=True)
    tot_s = rsum.sum(axis=1, keepdims=True)
    right_n = tot_n - left_n
    right_s = tot_s - left_s
    best = None  # (num, den, dim, thr) — gain = num/den exact
    for dim in range(d):
        for t in range(nb - 1):
            nl, nr = int(left_n[dim, t]), int(right_n[dim, t])
            if nl == 0 or nr == 0:
                continue
            sl, sr = int(left_s[dim, t]), int(right_s[dim, t])
            num = sl * sl * nr + sr * sr * nl
            den = nl * nr
            if best is None or num * best[1] > best[0] * den:
                best = (num, den, dim, t)
    if best is None:
        return None
    return best[2], best[3]


def gbdt_train(ds: ray.data.Dataset, pos_label: int = 0,
               rounds: int = 5) -> pd.DataFrame:
    """GRADIENT-BOOSTED STUMPS (LS-Boost on ±1 labels): the iterative
    ensemble trainer built from the embeddings_stump histogram pass —
    round m fits a depth-1 regression stump to the residuals
    r_i = y_i − F_{m−1}(x_i) and adds it with shrinkage ν = 1/2.

    Integer-exactness: y is ±GBDT_SCALE; every F, residual and leaf
    value lives on the 2^20 fixed-point grid (leaf = S_L // (2·n_L),
    floor division); gains compare EXACTLY by Python-int
    cross-multiplication (S²/n fractions, no float); so models,
    predictions and the final accuracy are bitwise identical at any
    parallelism (pytest-gated vs a sequential reference).

    Scale shape: each round is ONE map-only pass emitting bounded
    (dim, bin) → (count, residual-sum) integer partials (64×16 cube)
    merged on the driver in Python ints — no exchange, no per-row
    state: F recomputes per batch from the ≤rounds·4-int model list
    shipped in the task closure. One final pass counts sign matches."""
    ds = checkpoint(ds)

    def hist_partial_fn(f0: int, models: tuple):
        def hist_partial(b: pd.DataFrame) -> pd.DataFrame:
            if not len(b):
                return pd.DataFrame({
                    "dim": pd.Series([], dtype="int64"),
                    "bin": pd.Series([], dtype="int64"),
                    "n": pd.Series([], dtype="int64"),
                    "rs": pd.Series([], dtype="int64")})
            q = _gbdt_bins(np.stack(b["embedding"].to_numpy()))
            y = np.where(b["label"].to_numpy() == pos_label,
                         np.int64(GBDT_SCALE), np.int64(-GBDT_SCALE))
            resid = y - _gbdt_apply(q, f0, list(models))
            n_rows, d = q.shape
            flat = pd.DataFrame({
                "dim": np.repeat(np.arange(d, dtype=np.int64), n_rows),
                "bin": q.T.ravel() + 8,
                "rs": np.tile(resid, d),
            })
            out = flat.groupby(["dim", "bin"], as_index=False).agg(
                n=("rs", "size"), rs=("rs", "sum"))
            return out.astype("int64")
        return hist_partial

    # F0 = floor(mean(y)) on the grid — one count pass
    def y_partial(b: pd.DataFrame) -> pd.DataFrame:
        pos = int((b["label"].to_numpy() == pos_label).sum())
        return pd.DataFrame({"pos": [pos], "n": [len(b)]})

    yp = ds.map_batches(y_partial, batch_format="pandas").to_pandas()
    n_total = int(sum(int(v) for v in yp["n"]))
    n_pos = int(sum(int(v) for v in yp["pos"]))
    if n_total == 0:
        return pd.DataFrame({"round": [], "dim": [], "thr": [],
                             "left_fp": [], "right_fp": [],
                             "n_train": [], "n_correct": []})
    f0 = (n_pos * GBDT_SCALE - (n_total - n_pos) * GBDT_SCALE) // n_total

    models: list[tuple[int, int, int, int]] = []
    for _ in range(rounds):
        parts = ds.map_batches(
            hist_partial_fn(f0, tuple(models)),
            batch_format="pandas").to_pandas()
        agg = parts.groupby(["dim", "bin"], as_index=False).sum()
        d = int(agg["dim"].max()) + 1
        cnt = np.zeros((d, 16), dtype=object)
        rsum = np.zeros((d, 16), dtype=object)
        # object dtype: Python-int exact merge (63-bit-sum rule)
        for dim_v, bin_v, n_v, rs_v in zip(
                agg["dim"], agg["bin"], agg["n"], agg["rs"]):
            cnt[int(dim_v), int(bin_v)] += int(n_v)
            rsum[int(dim_v), int(bin_v)] += int(rs_v)
        pick = _gbdt_best_split(cnt.astype(np.int64),
                                rsum.astype(object))
        if pick is None:
            break
        dim, t = pick
        nl = int(cnt[dim, : t + 1].sum())
        nr = int(cnt[dim, t + 1:].sum())
        sl = int(sum(int(v) for v in rsum[dim, : t + 1]))
        sr = int(sum(int(v) for v in rsum[dim, t + 1:]))
        lfp = sl // (2 * nl)   # shrinkage nu = 1/2, floor division
        rfp = sr // (2 * nr)
        models.append((int(dim), int(t - 8), lfp, rfp))

    def acc_partial(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame({"ok": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        q = _gbdt_bins(np.stack(b["embedding"].to_numpy()))
        y_pos = b["label"].to_numpy() == pos_label
        f = _gbdt_apply(q, f0, models)
        return pd.DataFrame({"ok": [int(((f > 0) == y_pos).sum())],
                             "n": [len(b)]})

    ap = ds.map_batches(acc_partial, batch_format="pandas").to_pandas()
    n_ok = int(sum(int(v) for v in ap["ok"]))
    return pd.DataFrame({
        "round": np.arange(1, len(models) + 1, dtype=np.int64),
        "dim": np.array([m[0] for m in models], dtype=np.int64),
        "thr": np.array([m[1] for m in models], dtype=np.int64),
        "left_fp": np.array([m[2] for m in models], dtype=np.int64),
        "right_fp": np.array([m[3] for m in models], dtype=np.int64),
        "n_train": np.full(len(models), n_total, dtype=np.int64),
        "n_correct": np.full(len(models), n_ok, dtype=np.int64),
    })


def ridge_regression(ds: ray.data.Dataset, l2: float = 1.0,
                     target_col: str = "label"):
    """Closed-form RIDGE REGRESSION over an embedding column: solve
    (XᵀX + λI)w = Xᵀy from EXACT integer sufficient statistics — the
    distributed normal-equations trainer beside the iterative probe.

    One streaming pass: each batch quantizes vectors to the fixed
    grid, emits the exact d×d second-moment partial (the PCA hi/lo
    split-matmul trick — BLAS speed, bitwise-exact), plus Σxᵀy, Σx,
    Σy, Σy², n (y = the integer target, exact as-is). The driver
    merges partials in Python ints, augments with a BIAS row/column
    (intercept), converts ONCE to float64 and runs one (d+1)×(d+1)
    LAPACK solve — bitwise-deterministic at any parallelism because
    every input integer is. λ applies to the weight dims only (not
    the intercept), the standard convention.

    Returns (w: np.ndarray [d], b: float, mse: float, n: int) with
    mse computed from the same sufficient statistics
    (||Xw+b−y||²/n = wᵀAw + 2bwᵀs − 2wᵀc + nb² − 2bt + q, all exact
    integers contracted in float64 in one deterministic order)."""
    scale = float(1 << _SHIFT)

    def partial(batch: pa.Table) -> pa.Table:
        emb = _batch_matrix(batch, "embedding")
        y = batch.column(target_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        q = np.rint(emb * scale).astype(np.int64)
        if len(q) > (1 << 14):
            raise ValueError("ridge partial: batch too large for the "
                             "exact split-matmul bound (2^14 rows)")
        hi = (q >> 11).astype(np.float64)
        lo = (q - ((q >> 11) << 11)).astype(np.float64)
        hh = (hi.T @ hi).astype(np.int64)
        hl = (hi.T @ lo).astype(np.int64)
        lh = (lo.T @ hi).astype(np.int64)
        ll = (lo.T @ lo).astype(np.int64)
        outer = (hh << 22) + ((hl + lh) << 11) + ll
        xty = (q * y[:, None]).sum(axis=0)
        return pa.table({
            "n": pa.array([len(q)], pa.int64()),
            "s": pa.array([q.sum(axis=0).tolist()],
                          pa.list_(pa.int64())),
            "outer": pa.array([outer.ravel().tolist()],
                              pa.list_(pa.int64())),
            "xty": pa.array([xty.tolist()], pa.list_(pa.int64())),
            "sy": pa.array([int(y.sum())], pa.int64()),
            "syy": pa.array([int((y * y).sum())], pa.int64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=8192).to_pandas()
    n = sum(int(v) for v in parts["n"])
    if n == 0:
        raise ValueError("ridge_regression: empty input")
    d = len(parts["s"].iloc[0])
    s_tot = np.zeros(d, dtype=object)
    o_tot = np.zeros(d * d, dtype=object)
    c_tot = np.zeros(d, dtype=object)
    sy = syy = 0
    for _, row in parts.iterrows():
        s_tot = s_tot + np.asarray(row["s"], dtype=object)
        o_tot = o_tot + np.asarray(row["outer"], dtype=object)
        c_tot = c_tot + np.asarray(row["xty"], dtype=object)
        sy += int(row["sy"])
        syy += int(row["syy"])
    # augmented system in ORIGINAL units (x = q / scale):
    #   [ XtX   Xt1 ] [w]   [Xty]
    #   [ 1tX    n  ] [b] = [1ty]
    a = np.zeros((d + 1, d + 1), dtype=np.float64)
    a[:d, :d] = np.asarray(o_tot.reshape(d, d), dtype=np.float64) \
        / (scale * scale)
    a[:d, d] = a[d, :d] = np.asarray(s_tot, dtype=np.float64) / scale
    a[d, d] = float(n)
    a[:d, :d] += np.eye(d) * float(l2)
    rhs = np.zeros(d + 1, dtype=np.float64)
    rhs[:d] = np.asarray(c_tot, dtype=np.float64) / scale
    rhs[d] = float(sy)
    sol = np.linalg.solve(a, rhs)
    w, b = sol[:d], float(sol[d])
    # training MSE from the same moments (one deterministic order)
    xtx = np.asarray(o_tot.reshape(d, d), dtype=np.float64) \
        / (scale * scale)
    s_f = np.asarray(s_tot, dtype=np.float64) / scale
    c_f = np.asarray(c_tot, dtype=np.float64) / scale
    sse = (w @ xtx @ w + 2.0 * b * (w @ s_f) - 2.0 * (w @ c_f)
           + float(n) * b * b - 2.0 * b * float(sy) + float(syy))
    return w, b, sse / float(n), n
