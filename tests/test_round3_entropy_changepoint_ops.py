"""Semantics tests for the fifth late-round-3 batch: unigram entropy
(`q_docs_unigram_entropy`), CUSUM changepoint (`q_events_changepoint`),
kNN classifier (`q_embeddings_knn_classifier`), and l-diversity
(`q_audit_l_diversity`).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from htmlparsersharp_ray.pipelines import relational as r

DAY_US = 86_400_000_000
K30 = 1 << 30


class TestUnigramEntropy:
    def _write(self, tmp_path, texts, srcs):
        t = pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(srcs),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        })
        tmp_path.mkdir(parents=True, exist_ok=True)
        pq.write_table(t, str(tmp_path / "documents.parquet"),
                       row_group_size=2)
        return str(tmp_path)

    def test_token_reference(self, tmp_path, ray_session):
        texts = ["a a b", "c", "x y"]
        srcs = ["s1", "s1", "s2"]
        out = r.q_docs_unigram_entropy(self._write(tmp_path, texts,
                                                   srcs))
        got = {row["source"]: (int(row["n_tokens"]),
                               int(row["vocab"]),
                               int(row["h_scaled"]))
               for _, row in out.iterrows()}
        # s1: counts a=2,b=1,c=1 over n=4
        h1 = sum(math.floor((c / 4) * math.log(4 / c) * K30)
                 for c in (2, 1, 1))
        # s2: uniform over 2 -> ln 2 (two floored halves)
        h2 = 2 * math.floor(0.5 * math.log(2.0) * K30)
        assert got == {"s1": (4, 3, h1), "s2": (2, 2, h2)}

    def test_single_term_zero_entropy(self, tmp_path, ray_session):
        out = r.q_docs_unigram_entropy(
            self._write(tmp_path, ["w w w w"], ["s"]))
        assert int(out["h_scaled"].iloc[0]) == 0
        assert int(out["vocab"].iloc[0]) == 1


class TestChangepoint:
    def _write(self, tmp_path, day_vals):
        rows = [(i, d, v) for i, (d, v) in enumerate(day_vals)]
        t = pa.table({
            "event_id": pa.array([x[0] for x in rows], pa.int64()),
            "ts": pa.array([x[1] * DAY_US + 3600_000_000
                            for x in rows], pa.timestamp("us")),
            "user_id": pa.array([0] * len(rows), pa.int64()),
            "event_type": pa.array(["view"] * len(rows)),
            "value": pa.array([float(x[2]) for x in rows]),
            "props": pa.array(["{}"] * len(rows)),
        })
        tmp_path.mkdir(parents=True, exist_ok=True)
        pq.write_table(t, str(tmp_path / "events.parquet"))
        return str(tmp_path)

    def test_level_shift_found(self, tmp_path, ray_session):
        # 5 days at 1.00 then 5 days at 9.00: split after day 4 (k=5)
        day_vals = [(d, 1.00) for d in range(5)] \
            + [(d, 9.00) for d in range(5, 10)]
        out = r.q_events_changepoint(self._write(tmp_path / "x",
                                                 day_vals))
        assert int(out["k_index"].iloc[0]) == 5
        xs = [100] * 5 + [900] * 5
        tot, d = sum(xs), len(xs)
        want = max(abs(d * sum(xs[:k]) - k * tot)
                   for k in range(1, d))
        assert int(out["stat_num"].iloc[0]) == want

    def test_constant_series_ties_to_smallest_k(self, tmp_path,
                                                ray_session):
        day_vals = [(d, 2.00) for d in range(6)]
        out = r.q_events_changepoint(self._write(tmp_path / "c",
                                                 day_vals))
        assert int(out["stat_num"].iloc[0]) == 0
        assert int(out["k_index"].iloc[0]) == 1


class TestKnnClassifier:
    def _write(self, tmp_path, mat, labels):
        t = pa.table({
            "vec_id": pa.array(range(len(labels)), pa.int64()),
            "embedding": pa.array([list(map(float, row))
                                   for row in mat],
                                  pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        })
        tmp_path.mkdir(parents=True, exist_ok=True)
        pq.write_table(t, str(tmp_path / "embeddings.parquet"),
                       row_group_size=16)
        return str(tmp_path)

    def test_bruteforce_reference(self, tmp_path, ray_session):
        rng = np.random.default_rng(17)
        n, d = 90, 4
        labels = rng.integers(0, 3, size=n)
        mat = rng.normal(size=(n, d)) * 0.3
        out = r.q_embeddings_knn_classifier(
            self._write(tmp_path, mat, labels))
        SCALE = float(1 << 20)
        vq = np.rint(np.asarray(
            [list(map(float, np.asarray(row, dtype=np.float32)))
             for row in mat], dtype=np.float64) * SCALE).astype(np.int64)
        train = [i for i in range(n) if i % 2 == 0]
        want = {}
        for i in range(n):
            if i % 2 == 0:
                continue
            ds_ = sorted((int(((vq[i] - vq[j]) ** 2).sum()), j)
                         for j in train)[:5]
            votes = {}
            for _, j in ds_:
                votes[int(labels[j])] = votes.get(int(labels[j]),
                                                  0) + 1
            best = min(votes, key=lambda l: (-votes[l], l))
            want[i] = best
        got = dict(zip(out["vec_id"].astype(int),
                       out["pred_label"].astype(int)))
        assert got == want

    def test_planted_clusters_accurate(self, tmp_path, ray_session):
        rng = np.random.default_rng(5)
        n, d = 120, 5
        centers = rng.normal(size=(3, d))
        labels = rng.integers(0, 3, size=n)
        mat = centers[labels] + rng.normal(size=(n, d)) * 0.05
        out = r.q_embeddings_knn_classifier(
            self._write(tmp_path, mat, labels))
        truth = {i: int(labels[i]) for i in range(n) if i % 2 == 1}
        correct = sum(int(p) == truth[int(v)]
                      for v, p in zip(out["vec_id"],
                                      out["pred_label"]))
        assert correct > len(out) * 0.9


class TestLDiversity:
    def test_hand_contingency(self, tmp_path, ray_session):
        nk = [1] * 100 + [2] * 4
        seg = ["A"] * 99 + ["B"] + ["A", "B", "C", "D"]
        t = pa.table({
            "c_custkey": pa.array(range(len(nk)), pa.int64()),
            "c_name": pa.array(["c"] * len(nk)),
            "c_nationkey": pa.array(nk, pa.int32()),
            "c_acctbal": pa.array([0.0] * len(nk)),
            "c_mktsegment": pa.array(seg),
        })
        tmp_path.mkdir(parents=True, exist_ok=True)
        pq.write_table(t, str(tmp_path / "customer.parquet"))
        out = r.q_audit_l_diversity(str(tmp_path))
        g = out.set_index("nation_key")
        # nation 1: 99:1 skew — distinct l = 2 but entropy << ln 2
        assert int(g.loc[1, "l_distinct"]) == 2
        assert int(g.loc[1, "h_scaled"]) < math.log(2) * K30 * 0.2
        # nation 2: uniform over 4 -> entropy ~ ln 4
        assert int(g.loc[2, "l_distinct"]) == 4
        want = 4 * math.floor(0.25 * math.log(4.0) * K30)
        assert int(g.loc[2, "h_scaled"]) == want
