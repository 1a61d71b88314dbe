"""Semantics tests for the fourth late-round-3 batch: Kaplan–Meier
survival (`q_events_survival`), k-fold CV of the nearest-centroid
classifier (`q_embeddings_cv`), TwoNN intrinsic dimension
(`q_embeddings_twonn`), and source novelty (`q_docs_source_novelty`).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from htmlparsersharp_ray.pipelines import relational as r

DAY_US = 86_400_000_000


def _write_events(tmp_path, rows):
    """rows: (user_id, event_type, day_float)."""
    n = len(rows)
    t = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array([int(d * DAY_US) for _, _, d in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([u for u, _, _ in rows], pa.int64()),
        "event_type": pa.array([t for _, t, _ in rows]),
        "value": pa.array([1.0] * n, pa.float64()),
        "props": pa.array(["{}"] * n),
    })
    tmp_path.mkdir(parents=True, exist_ok=True)
    pq.write_table(t, str(tmp_path / "events.parquet"))
    return str(tmp_path)


class TestSurvival:
    def test_hand_km_with_censoring(self, tmp_path, ray_session):
        rows = [
            (1, "signup", 0.1), (1, "purchase", 2.2),   # dur 2, event
            (2, "signup", 0.2), (2, "purchase", 2.9),   # dur 2, event
            (3, "signup", 1.0),                         # censored
            (4, "signup", 0.5), (4, "purchase", 5.4),   # dur 5, event
            (5, "purchase", 1.0),                       # no signup: out
            (6, "signup", 3.0), (6, "purchase", 1.0),   # pre-signup buy
            (0, "view", 9.5),                           # horizon day 9
        ]
        sf = _write_events(tmp_path / "x", rows)
        out = r.q_events_survival(sf)
        # users 1,2: dur 2 event; 4: dur 5 event (5.4->5 minus 0.5->0);
        # 3 censored at 9-1=8; 6 censored at 9-3=6
        got = {int(t): (int(n), int(d))
               for t, n, d in zip(out["t_day"], out["n_risk"],
                                  out["d_event"])}
        assert got == {2: (5, 2), 5: (3, 1)}
        # cumulative log-survival: floor-then-sum in day order
        s1 = math.floor(math.log(3 / 5) * (1 << 30))
        s2 = s1 + math.floor(math.log(2 / 3) * (1 << 30))
        assert list(out["cum_ls_scaled"]) == [s1, s2]

    def test_no_signups_empty(self, tmp_path, ray_session):
        sf = _write_events(tmp_path / "x", [(1, "view", 1.0)])
        assert len(r.q_events_survival(sf)) == 0


class TestEmbeddingsCV:
    def test_planted_clusters_high_accuracy(self, tmp_path,
                                            ray_session):
        rng = np.random.default_rng(7)
        n, d = 200, 6
        centers = rng.normal(size=(4, d)) * 0.4
        labels = rng.integers(0, 4, size=n)
        mat = centers[labels] + rng.normal(size=(n, d)) * 0.02
        t = pa.table({
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([list(map(float, row))
                                   for row in mat],
                                  pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        })
        tmp_path.mkdir(parents=True, exist_ok=True)
        pq.write_table(t, str(tmp_path / "embeddings.parquet"),
                       row_group_size=16)
        out = r.q_embeddings_cv(str(tmp_path))
        assert len(out) == 5
        assert int(out["n_test"].sum()) == n
        for _, row in out.iterrows():
            assert int(row["n_test"]) == sum(
                1 for i in range(n) if i % 5 == int(row["fold"]))
            assert int(row["n_correct"]) > int(row["n_test"]) * 0.9

    def test_matches_sequential_reference(self, tmp_path,
                                          ray_session):
        rng = np.random.default_rng(11)
        n, d = 97, 4
        labels = rng.integers(0, 3, size=n)
        mat = rng.normal(size=(n, d)) * 0.3
        t = pa.table({
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([list(map(float, row))
                                   for row in mat],
                                  pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        })
        tmp_path.mkdir(parents=True, exist_ok=True)
        pq.write_table(t, str(tmp_path / "embeddings.parquet"),
                       row_group_size=10)
        out = r.q_embeddings_cv(str(tmp_path))
        SCALE = float(1 << 20)
        vq = np.rint(np.asarray(
            [list(map(float, np.asarray(row, dtype=np.float32)))
             for row in mat], dtype=np.float64) * SCALE).astype(np.int64)
        want = {}
        for f in range(5):
            train = np.arange(n) % 5 != f
            test = ~train
            labs = sorted(set(labels[train].tolist()))
            cents = {}
            for l in labs:
                m = train & (labels == l)
                cents[l] = np.rint(
                    vq[m].sum(axis=0).astype(np.float64)
                    / int(m.sum())).astype(np.int64)
            correct = 0
            for i in np.nonzero(test)[0]:
                dists = [(int(((vq[i] - cents[l]) ** 2).sum()), l)
                         for l in labs]
                pred = min(dists)[1]
                correct += int(pred == labels[i])
            want[f] = (int(test.sum()), correct)
        got = {int(row["fold"]): (int(row["n_test"]),
                                  int(row["n_correct"]))
               for _, row in out.iterrows()}
        assert got == want


class TestTwoNN:
    def _write(self, tmp_path, mat):
        t = pa.table({
            "vec_id": pa.array(range(len(mat)), pa.int64()),
            "embedding": pa.array([list(map(float, row))
                                   for row in mat],
                                  pa.list_(pa.float32())),
            "label": pa.array([0] * len(mat), pa.int32()),
        })
        tmp_path.mkdir(parents=True, exist_ok=True)
        pq.write_table(t, str(tmp_path / "embeddings.parquet"),
                       row_group_size=16)
        return str(tmp_path)

    def test_bruteforce_reference_with_dups(self, tmp_path,
                                            ray_session):
        rng = np.random.default_rng(3)
        mat = rng.normal(size=(50, 4)) * 0.2
        mat[7] = mat[3]  # exact duplicate pair
        out = r.q_embeddings_twonn(self._write(tmp_path, mat))
        SCALE = float(1 << 20)
        vq = np.rint(np.asarray(
            [list(map(float, np.asarray(row, dtype=np.float32)))
             for row in mat], dtype=np.float64) * SCALE).astype(np.int64)
        want_sum, used, dups = 0, 0, 0
        for i in range(len(vq)):
            d = sorted(int(((vq[i] - vq[j]) ** 2).sum())
                       for j in range(len(vq)) if j != i)
            if d[0] == 0:
                dups += 1
                continue
            used += 1
            want_sum += math.floor(math.log(d[1] / d[0]) * (1 << 30))
        assert int(out["n_used"].iloc[0]) == used == 48
        assert int(out["n_dups"].iloc[0]) == dups == 2
        assert int(out["sum_lnmu_scaled"].iloc[0]) == want_sum

    def test_low_dim_manifold_reads_low(self, tmp_path, ray_session):
        # points on a 1-D curve embedded in 8-D: d-hat ~ 1, so
        # sum ln(mu) ~ n (TwoNN: d = n / sum ln mu). Sampling must be
        # NON-uniform: equally spaced points have equidistant
        # neighbors (mu = 1 everywhere) and the estimator diverges.
        rng = np.random.default_rng(21)
        ts = np.sort(rng.uniform(0.0, 1.0, 120))
        mat = np.stack([np.cos(2 * np.pi * ts) * 0.3,
                        np.sin(2 * np.pi * ts) * 0.3]
                       + [ts * 0.0] * 6, axis=1)
        out = r.q_embeddings_twonn(self._write(tmp_path, mat))
        n_used = int(out["n_used"].iloc[0])
        dhat = n_used / (int(out["sum_lnmu_scaled"].iloc[0])
                         / (1 << 30))
        assert 0.5 < dhat < 2.0


class TestSourceNovelty:
    def test_token_reference(self, tmp_path, ray_session):
        shared = "w1 w2 w3 w4 w5 w6 w7 w8"          # one 8-gram
        texts = [shared + " tailA",                  # s1: 2 grams
                 shared,                             # s2: 1 gram
                 "short doc"]                        # s2: no grams
        srcs = ["s1", "s2", "s2"]
        t = pa.table({
            "doc_id": pa.array(range(3), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * 3),
            "source": pa.array(srcs),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        })
        tmp_path.mkdir(parents=True, exist_ok=True)
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        out = r.q_docs_source_novelty(str(tmp_path))
        got = {row["source"]: (int(row["n_grams"]),
                               int(row["novel_grams"]))
               for _, row in out.iterrows()}
        # s1 has grams {G, G2}; s2 has {G}; G shared, G2 novel
        assert got == {"s1": (2, 1), "s2": (1, 0)}
