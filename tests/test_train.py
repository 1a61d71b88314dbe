"""Gates for the distributed classifier trainer (stages/train.py):
bitwise determinism across block layouts (the fixed-point-per-row
contract), learnability on a planted separable corpus, loss descent,
and the pos_weight imbalance fix.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from htmlparsersharp_ray.stages.train import (
    logreg_train, probe_features, train_embedding_probe)


def _planted_embeddings(n=400, d=8, sep=4.0, pos_frac=0.25, seed=11):
    """Two Gaussian blobs, label 0 = the positive blob shifted by
    ``sep`` along every dim."""
    rng = np.random.RandomState(seed)
    n_pos = int(n * pos_frac)
    x = rng.randn(n, d)
    x[:n_pos] += sep
    labels = np.r_[np.zeros(n_pos, dtype=np.int32),
                   np.ones(n - n_pos, dtype=np.int32)]
    order = rng.permutation(n)
    return pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array([row.astype(np.float32).tolist()
                               for row in x[order]],
                              pa.list_(pa.float32())),
        "label": pa.array(labels[order], pa.int32()),
    })


class TestLogregTrain:
    def test_learns_planted_separable(self, ray_session):
        """Separable blobs: accuracy >= 0.95 within 25 iterations and
        the loss strictly decreases over the run."""
        emb = ray.data.from_arrow(_planted_embeddings())
        w, hist, cols = train_embedding_probe(
            emb, target_label=0, iters=25, lr=5.0)
        assert hist[-1][2] >= 0.95
        losses = [h[1] for h in hist]
        assert losses[-1] < losses[0] * 0.5
        # fixed-step GD may oscillate locally; require overall descent
        assert losses[-1] <= min(losses[:5])

    def test_bitwise_deterministic_across_layouts(self, ray_session):
        """1-block and 17-block layouts produce IDENTICAL weights and
        history — the per-row fixed-point quantization contract."""
        t = _planted_embeddings(n=300)
        a = ray.data.from_arrow(t)
        b = ray.data.from_arrow(t).repartition(17)
        wa, ha, _ = train_embedding_probe(a, 0, iters=10, lr=5.0)
        wb, hb, _ = train_embedding_probe(b, 0, iters=10, lr=5.0)
        assert (wa == wb).all()
        assert ha == hb

    def test_pos_weight_lifts_recall(self, ray_session):
        """On an imbalanced OVERLAPPING corpus (sep=0.6, 10% positive),
        pos_weight=9 must recover far more positives than the
        unweighted run (measured 0.88 vs 0.43 recall)."""
        t = _planted_embeddings(n=600, sep=0.6, pos_frac=0.10, seed=3)

        def recall(pos_weight):
            emb = ray.data.from_arrow(t)
            w, _, cols = train_embedding_probe(
                emb, 0, iters=30, lr=5.0, pos_weight=pos_weight)
            feats = emb.map_batches(probe_features(0),
                                    batch_format="pyarrow").to_pandas()
            x = feats[cols].to_numpy(np.float64)
            y = feats["y"].to_numpy(np.int64)
            pred = (x @ w) >= 0.0
            return int((pred & (y > 0)).sum()) / max(int((y > 0).sum()), 1)

        assert recall(9.0) > recall(1.0) + 0.2

    def test_generic_feature_table(self, ray_session, tmp_path):
        """logreg_train consumes any (features..., y) Dataset — a
        2-feature XOR-free AND dataset trains to a perfect separator."""
        rng = np.random.RandomState(5)
        n = 200
        f1 = rng.uniform(-1, 1, n)
        f2 = rng.uniform(-1, 1, n)
        y = ((f1 + f2) > 0).astype(np.int64)
        ds = ray.data.from_pandas(pd.DataFrame({
            "bias": np.ones(n), "f1": f1, "f2": f2, "y": y}))
        w, hist = logreg_train(ds, ["bias", "f1", "f2"],
                               iters=40, lr=5.0)
        assert hist[-1][2] >= 0.97
        assert w[1] > 0 and w[2] > 0


class TestProbeQuery:
    def test_driver_query_schema(self, ray_session):
        """The graded query returns one row per coefficient plus the
        four metric rows, with finite values."""
        from __ray_entry__ import queries

        out = queries()["embeddings_train_probe"]("/root/testdata/sf0.001")
        assert list(out.columns) == ["feature", "weight"]
        assert out["feature"].tolist()[0] == "bias"
        tail = out["feature"].tolist()[-4:]
        assert tail == ["_final_loss", "_precision", "_recall", "_n_train"]
        assert np.isfinite(out["weight"].to_numpy()).all()


class TestALS:
    def _planted(self, seed=7, nu=60, ni=40, per_user=12):
        """Interactions from a planted positive rank-2 factorization."""
        rng = np.random.RandomState(seed)
        xu = rng.uniform(0.5, 1.5, (nu, 2))
        yi = rng.uniform(0.5, 1.5, (ni, 2))
        rows = []
        for u in range(nu):
            for i in rng.choice(ni, per_user, replace=False):
                rows.append((u, i, float(xu[u] @ yi[i])))
        return pd.DataFrame(rows, columns=["u", "i", "c"])

    def test_recovers_planted_low_rank(self, ray_session):
        """k=2 ALS on exact rank-2 data: SSE falls by >99% of the
        zero-prediction baseline within 4 iterations, monotonically."""
        from htmlparsersharp_ray.stages.train import als_train

        df = self._planted()
        users, items, hist = als_train(
            ray.data.from_pandas(df), k=2, iters=4, reg=0.01,
            n_buckets=8)
        baseline = float((df["c"] ** 2).sum())
        sses = [s for _, s in hist]
        assert sses[-1] < baseline * 0.01
        assert all(b <= a + 1e-9 for a, b in zip(sses, sses[1:]))
        assert users.count() == 60 and items.count() == 40

    def test_bitwise_deterministic_across_layouts(self, ray_session):
        """1-block vs 9-block interactions: identical SSE history and
        identical factor tables (canonical-order segment sums)."""
        from htmlparsersharp_ray.stages.train import als_train

        df = self._planted(seed=3)
        a = als_train(ray.data.from_pandas(df), k=2, iters=3,
                      reg=0.01, n_buckets=8)
        b = als_train(ray.data.from_pandas(df).repartition(9), k=2,
                      iters=3, reg=0.01, n_buckets=8)
        assert a[2] == b[2]
        fa = a[0].to_pandas().sort_values("id").reset_index(drop=True)
        fb = b[0].to_pandas().sort_values("id").reset_index(drop=True)
        assert (fa.to_numpy() == fb.to_numpy()).all()

    def test_single_interaction_entity(self, ray_session):
        """A user with ONE interaction still solves (regularization
        keeps the normal equations nonsingular) and predicts its own
        rating within the planted value's neighborhood (the item's
        factors are shared with the planted users, so the lone rating
        can't be fit exactly — measured ~1.47 for c=2.0)."""
        from htmlparsersharp_ray.stages.train import als_train

        df = pd.concat([self._planted(seed=5),
                        pd.DataFrame({"u": [999], "i": [0], "c": [2.0]})],
                       ignore_index=True)
        users, items, hist = als_train(
            ray.data.from_pandas(df), k=2, iters=3, reg=0.01,
            n_buckets=8)
        u = users.to_pandas().set_index("id")
        i = items.to_pandas().set_index("id")
        pred = float(np.dot(u.loc[999].to_numpy(),
                            i.loc[0].to_numpy()))
        assert np.isfinite(pred)
        assert 1.0 < pred < 3.0

    def test_track_sse_final(self, ray_session):
        """track_sse='final' reports exactly one history row, equal to
        the last row of a track-all run."""
        from htmlparsersharp_ray.stages.train import als_train

        df = self._planted(seed=9, nu=20, ni=15, per_user=6)
        _, _, h_all = als_train(ray.data.from_pandas(df), k=2,
                                iters=3, reg=0.01, n_buckets=4)
        _, _, h_fin = als_train(ray.data.from_pandas(df), k=2,
                                iters=3, reg=0.01, n_buckets=4,
                                track_sse="final")
        assert len(h_fin) == 1
        assert h_fin[0] == h_all[-1]


def _gbdt_sequential_reference(emb, labels, pos_label=0, rounds=5):
    """Independent in-memory LS-Boost: same integer rules, scalar
    Python loops and Fractions instead of the histogram partials."""
    from fractions import Fraction

    S = 1 << 20
    q = np.clip(np.floor(emb.astype(np.float64) * 16.0), -8, 7).astype(int)
    y = np.where(labels == pos_label, S, -S).astype(object)
    n = len(y)
    f0 = (int(y.sum())) // n
    f = np.full(n, f0, dtype=object)
    models = []
    d = q.shape[1]
    for _ in range(rounds):
        r = y - f
        best = None  # (gain Fraction, dim, thr)
        for dim in range(d):
            for thr in range(-8, 7):
                lm = q[:, dim] <= thr
                nl, nr = int(lm.sum()), int((~lm).sum())
                if nl == 0 or nr == 0:
                    continue
                sl = int(r[lm].sum())
                sr = int(r[~lm].sum())
                g = Fraction(sl * sl, nl) + Fraction(sr * sr, nr)
                if best is None or g > best[0]:
                    best = (g, dim, thr, sl, sr, nl, nr)
        if best is None:
            break
        _, dim, thr, sl, sr, nl, nr = best
        lfp, rfp = sl // (2 * nl), sr // (2 * nr)
        models.append((dim, thr, lfp, rfp))
        f = f + np.where(q[:, dim] <= thr, lfp, rfp).astype(object)
    ok = int(((np.array([int(v) for v in f]) > 0)
              == (labels == pos_label)).sum())
    return models, f0, ok


def test_gbdt_matches_sequential_reference(ray_session):
    """Distributed LS-Boost == the Fraction-based sequential reference,
    bitwise, across block layouts."""
    import ray.data
    from htmlparsersharp_ray.stages.train import gbdt_train

    rng = np.random.default_rng(31)
    emb = rng.uniform(-0.5, 0.5, (300, 6)).astype(np.float32)
    labels = rng.integers(0, 4, 300)
    exp_models, _, exp_ok = _gbdt_sequential_reference(
        emb.astype(np.float64), labels, rounds=4)
    t = pa.table({
        "vec_id": pa.array(range(300), pa.int64()),
        "label": pa.array(labels, pa.int64()),
        "embedding": pa.array(emb.tolist(), pa.list_(pa.float32())),
    })
    for blocks in (1, 9):
        out = gbdt_train(ray.data.from_arrow(t).repartition(blocks),
                         rounds=4)
        got = [(int(a), int(b), int(c), int(dd)) for a, b, c, dd in zip(
            out["dim"], out["thr"], out["left_fp"], out["right_fp"])]
        assert got == exp_models
        assert int(out["n_correct"].iloc[0]) == exp_ok


def test_gbdt_boosting_improves_on_one_stump(ray_session):
    """A target needing TWO thresholds (x0 > 0.25 OR x1 > 0.25) is not
    separable by one stump; later rounds must strictly improve
    training accuracy."""
    import ray.data
    from htmlparsersharp_ray.stages.train import gbdt_train

    rng = np.random.default_rng(5)
    emb = rng.uniform(-0.5, 0.5, (600, 4)).astype(np.float32)
    pos = (emb[:, 0] > 0.25) | (emb[:, 1] > 0.25)
    labels = np.where(pos, 0, 7)
    t = pa.table({
        "vec_id": pa.array(range(600), pa.int64()),
        "label": pa.array(labels, pa.int64()),
        "embedding": pa.array(emb.tolist(), pa.list_(pa.float32())),
    })
    ds = ray.data.from_arrow(t)
    one = gbdt_train(ds, rounds=1)
    six = gbdt_train(ds, rounds=6)
    acc1 = int(one["n_correct"].iloc[0])
    acc6 = int(six["n_correct"].iloc[0])
    assert acc6 > acc1
    assert acc6 >= 570  # the OR-of-two-thresholds concept is learnable


class TestRidgeRegression:
    def _emb_table(self, X, y):
        import pyarrow as pa

        return pa.table({
            "vec_id": pa.array(range(len(y)), pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in X],
                                  pa.list_(pa.float32())),
            "label": pa.array(y, pa.int32()),
        })

    def _reference(self, X, y, l2=1.0, shift=20):
        """Quantized-numpy closed form replicating the engine's exact
        pipeline (same grid, same augmented system, same solve)."""
        import numpy as np

        scale = float(1 << shift)
        q = np.rint(np.asarray(X, np.float64).astype(np.float32)
                    .astype(np.float64) * scale).astype(np.int64)
        yv = np.asarray(y, np.int64)
        d = q.shape[1]
        a = np.zeros((d + 1, d + 1))
        a[:d, :d] = (q.T @ q).astype(np.float64) / (scale * scale) \
            + np.eye(d) * l2
        a[:d, d] = a[d, :d] = q.sum(axis=0).astype(np.float64) / scale
        a[d, d] = float(len(yv))
        rhs = np.zeros(d + 1)
        rhs[:d] = (q * yv[:, None]).sum(axis=0).astype(np.float64) / scale
        rhs[d] = float(yv.sum())
        sol = np.linalg.solve(a, rhs)
        return sol[:d], float(sol[d])

    def test_bitwise_vs_quantized_numpy(self, ray_session):
        import numpy as np
        import ray as _ray

        from htmlparsersharp_ray.stages.train import ridge_regression

        rng = np.random.default_rng(11)
        X = rng.normal(size=(500, 8))
        y = rng.integers(0, 10, 500)
        ds = _ray.data.from_arrow(self._emb_table(X, y))
        w, b, mse, n = ridge_regression(ds, l2=1.0)
        wr, br = self._reference(X, y)
        assert n == 500
        assert list(w) == list(wr) and b == br  # bitwise

    def test_layout_invariance(self, ray_session):
        import numpy as np
        import ray as _ray

        from htmlparsersharp_ray.stages.train import ridge_regression

        rng = np.random.default_rng(5)
        X = rng.normal(size=(400, 6))
        y = rng.integers(0, 5, 400)
        t = self._emb_table(X, y)
        one = ridge_regression(_ray.data.from_arrow(t))
        many = ridge_regression(_ray.data.from_arrow(t).repartition(17))
        assert list(one[0]) == list(many[0]) and one[1] == many[1]
        assert one[2] == many[2]

    def test_planted_linear_recovery(self, ray_session):
        import numpy as np
        import ray as _ray

        from htmlparsersharp_ray.stages.train import ridge_regression

        rng = np.random.default_rng(3)
        X = rng.normal(size=(2000, 4))
        w_true = np.array([3.0, -2.0, 0.0, 1.0])
        y = np.rint(X @ w_true + 5.0).astype(int)
        ds = _ray.data.from_arrow(self._emb_table(X, y))
        w, b, mse, _ = ridge_regression(ds, l2=1e-6)
        assert np.allclose(w, w_true, atol=0.05)
        assert abs(b - 5.0) < 0.05
        assert mse < 0.2  # rounding noise of rint only
