"""Semantics tests for the second late-round-3 batch: Theil–Sen slope
(`q_events_theilsen`), Holt smoothing (`q_events_holt`), Simpson
repetition index (`q_docs_simpson`), k-source closeness
(`q_part_closeness`), and simplified silhouette
(`q_embeddings_silhouette`). References are brute-force
reimplementations (Fraction slopes, sequential smoother, token
dictionaries, NetworkX-free BFS, float silhouette).
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from htmlparsersharp_ray.pipelines import relational as r

DAY_US = 86_400_000_000


def _write_events(tmp_path, rows, ts):
    """rows: list of (event_type, value); ts: matching us stamps."""
    n = len(rows)
    t = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array([i % 3 for i in range(n)], pa.int64()),
        "event_type": pa.array([t for t, _ in rows]),
        "value": pa.array([float(v) for _, v in rows], pa.float64()),
        "props": pa.array(["{}"] * n),
    })
    tmp_path.mkdir(parents=True, exist_ok=True)
    pq.write_table(t, str(tmp_path / "events.parquet"),
                   row_group_size=3)
    return str(tmp_path)


class TestTheilSen:
    def test_median_slope_matches_fraction_sort(self, tmp_path,
                                                ray_session):
        # type a: days 0,1,3,7 with chosen totals
        series = [(0, 1.00), (1, 5.00), (3, 2.00), (7, 30.00)]
        rows = [("a", v) for _, v in series]
        ts = [d * DAY_US for d, _ in series]
        out = r.q_events_theilsen(_write_events(tmp_path / "x", rows,
                                                ts))
        pairs = []
        for i in range(len(series)):
            for j in range(i + 1, len(series)):
                dy = round(series[j][1] * 100) - round(series[i][1]
                                                       * 100)
                dx = series[j][0] - series[i][0]
                pairs.append((Fraction(dy, dx), dy, dx))
        pairs.sort()
        k = (len(pairs) + 1) // 2 - 1
        assert int(out["n_pairs"].iloc[0]) == len(pairs)
        got = Fraction(int(out["med_dy"].iloc[0]),
                       int(out["med_dx"].iloc[0]))
        assert got == pairs[k][0]

    def test_single_day_type_drops(self, tmp_path, ray_session):
        rows = [("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0)]
        ts = [0, DAY_US, 0, 0]  # "b" has one observed day
        out = r.q_events_theilsen(_write_events(tmp_path / "x", rows,
                                                ts))
        assert list(out["event_type"]) == ["a"]

    def test_exact_linear_series_recovers_slope(self, tmp_path,
                                                ray_session):
        rows = [("a", float(3 * i + 1)) for i in range(5)]
        ts = [i * DAY_US for i in range(5)]
        out = r.q_events_theilsen(_write_events(tmp_path / "x", rows,
                                                ts))
        assert (int(out["med_dy"].iloc[0])
                / int(out["med_dx"].iloc[0])) == 300.0


class TestHolt:
    def test_sequential_reference(self, tmp_path, ray_session):
        vals = [10.00, 12.00, 9.00, 20.00, 1.00, 1.00]
        rows = [("a", v) for v in vals]
        ts = [i * DAY_US for i in range(len(vals))]
        out = r.q_events_holt(_write_events(tmp_path / "x", rows, ts))

        def tdiv2(v):
            return v // 2 if v >= 0 else -((-v) // 2)

        lev, tr = None, 0
        want = []
        for v in vals:
            x = round(v * 100)
            if lev is None:
                lev, tr = x, 0
            else:
                prev = lev
                lev = tdiv2(x + prev + tr)
                tr = tdiv2(lev - prev + tr)
            want.append((x, lev, tr))
        got = list(zip(out["day_cents"], out["level_cents"],
                       out["trend_cents"]))
        assert [(int(a), int(b), int(c)) for a, b, c in got] == want
        # the drop from 20.00 to 1.00 must drive the trend negative
        assert int(out["trend_cents"].iloc[4]) < 0

    def test_constant_series_flat(self, tmp_path, ray_session):
        rows = [("a", 5.00)] * 4
        ts = [i * DAY_US for i in range(4)]
        out = r.q_events_holt(_write_events(tmp_path / "x", rows, ts))
        assert (out["level_cents"] == 500).all()
        assert (out["trend_cents"] == 0).all()


class TestSimpson:
    def test_token_dictionary_reference(self, tmp_path, ray_session):
        texts = ["a a b", "a c", ""]
        srcs = ["s1", "s1", "s2"]
        t = pa.table({
            "doc_id": pa.array(range(3), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * 3),
            "source": pa.array(srcs),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        })
        tmp_path.mkdir(parents=True, exist_ok=True)
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        out = r.q_docs_simpson(str(tmp_path))
        # s1: tokens a,a,b,a,c -> counts a=3,b=1,c=1 -> rep = 3*2 = 6
        assert list(out["source"]) == ["s1"]
        assert int(out["n_tokens"].iloc[0]) == 5
        assert int(out["rep_pairs"].iloc[0]) == 6

    def test_all_distinct_is_zero(self, tmp_path, ray_session):
        t = pa.table({
            "doc_id": pa.array([0], pa.int64()),
            "text": pa.array(["w1 w2 w3 w4"]),
            "lang": pa.array(["en"]),
            "source": pa.array(["s"]),
            "n_chars": pa.array([11], pa.int64()),
        })
        tmp_path.mkdir(parents=True, exist_ok=True)
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        out = r.q_docs_simpson(str(tmp_path))
        assert int(out["rep_pairs"].iloc[0]) == 0


class TestCloseness:
    def test_chain_graph_bfs_reference(self, tmp_path, ray_session):
        # orders chain parts 1-2, 2-3, 3-4, 4-5: path graph
        li_rows = [(1, 1), (1, 2), (2, 2), (2, 3), (3, 3), (3, 4),
                   (4, 4), (4, 5)]
        li = pa.table({
            "l_orderkey": pa.array([o for o, _ in li_rows], pa.int64()),
            "l_partkey": pa.array([p for _, p in li_rows], pa.int64()),
            "l_suppkey": pa.array([1] * len(li_rows), pa.int64()),
            "l_linenumber": pa.array(range(len(li_rows)), pa.int32()),
            "l_quantity": pa.array([1.0] * len(li_rows)),
            "l_extendedprice": pa.array([1.0] * len(li_rows)),
            "l_discount": pa.array([0.0] * len(li_rows)),
            "l_tax": pa.array([0.0] * len(li_rows)),
            "l_returnflag": pa.array(["N"] * len(li_rows)),
            "l_linestatus": pa.array(["O"] * len(li_rows)),
            "l_shipdate": pa.array([0] * len(li_rows),
                                   pa.timestamp("us")),
        })
        part = pa.table({
            "p_partkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "p_name": pa.array(["p"] * 5),
            "p_brand": pa.array(["b"] * 5),
            "p_type": pa.array(["t"] * 5),
            "p_size": pa.array([1, 1, 9, 9, 9], pa.int32()),
            "p_retailprice": pa.array([1.0] * 5),
        })
        tmp_path.mkdir(parents=True, exist_ok=True)
        pq.write_table(li, str(tmp_path / "lineitem.parquet"))
        pq.write_table(part, str(tmp_path / "part.parquet"))
        out = r.q_part_closeness(str(tmp_path))
        got = {int(s): (int(n), int(d))
               for s, n, d in zip(out["source"], out["n_reached"],
                                  out["total_dist"])}
        # from 1: hops 2->1, 3->2, 4->3 (5 beyond 3 hops from 1? 4 hops -> excluded)
        assert got[1] == (3, 1 + 2 + 3)
        # from 2: 1->1, 3->1, 4->2, 5->3
        assert got[2] == (4, 1 + 1 + 2 + 3)

    def test_isolated_source(self, tmp_path, ray_session):
        li = pa.table({
            "l_orderkey": pa.array([1, 1], pa.int64()),
            "l_partkey": pa.array([10, 11], pa.int64()),
            "l_suppkey": pa.array([1, 1], pa.int64()),
            "l_linenumber": pa.array([1, 2], pa.int32()),
            "l_quantity": pa.array([1.0, 1.0]),
            "l_extendedprice": pa.array([1.0, 1.0]),
            "l_discount": pa.array([0.0, 0.0]),
            "l_tax": pa.array([0.0, 0.0]),
            "l_returnflag": pa.array(["N", "N"]),
            "l_linestatus": pa.array(["O", "O"]),
            "l_shipdate": pa.array([0, 0], pa.timestamp("us")),
        })
        part = pa.table({
            "p_partkey": pa.array([5, 10, 11], pa.int64()),
            "p_name": pa.array(["p"] * 3),
            "p_brand": pa.array(["b"] * 3),
            "p_type": pa.array(["t"] * 3),
            "p_size": pa.array([1, 9, 9], pa.int32()),
            "p_retailprice": pa.array([1.0] * 3),
        })
        tmp_path.mkdir(parents=True, exist_ok=True)
        pq.write_table(li, str(tmp_path / "lineitem.parquet"))
        pq.write_table(part, str(tmp_path / "part.parquet"))
        out = r.q_part_closeness(str(tmp_path))
        assert got_row(out, 5) == (0, 0)


def got_row(out, s):
    m = out[out["source"] == s]
    return (int(m["n_reached"].iloc[0]), int(m["total_dist"].iloc[0]))


class TestSilhouette:
    def _write(self, tmp_path, mat, labels):
        t = pa.table({
            "vec_id": pa.array(range(len(labels)), pa.int64()),
            "embedding": pa.array([list(map(float, row))
                                   for row in mat],
                                  pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        })
        tmp_path.mkdir(parents=True, exist_ok=True)
        pq.write_table(t, str(tmp_path / "embeddings.parquet"))
        return str(tmp_path)

    def test_separated_clusters_score_near_one(self, tmp_path,
                                               ray_session):
        rng = np.random.default_rng(9)
        centers = np.array([[0.4, 0.4], [-0.4, -0.4]])
        labels = np.repeat([0, 1], 40)
        mat = centers[labels] + rng.normal(size=(80, 2)) * 0.01
        out = r.q_embeddings_silhouette(self._write(tmp_path, mat,
                                                    labels))
        K = 1 << 10
        for _, row in out.iterrows():
            assert int(row["s_scaled_sum"]) / (int(row["n"]) * K) > 0.9

    def test_matches_float_reference(self, tmp_path, ray_session):
        rng = np.random.default_rng(3)
        labels = rng.integers(0, 3, size=60)
        mat = rng.normal(size=(60, 5)) * 0.2
        sf = self._write(tmp_path, mat, labels)
        out = r.q_embeddings_silhouette(sf)
        # float simplified silhouette on the SAME quantized grid
        SCALE = float(1 << 20)
        vq = np.rint(mat.astype(np.float64) * SCALE).astype(np.int64)
        cents = {}
        for l in np.unique(labels):
            s = vq[labels == l].sum(axis=0)
            n = int((labels == l).sum())
            cents[int(l)] = np.rint(s.astype(np.float64)
                                    / n).astype(np.int64)
        K = 1 << 10
        sums = {}
        for i in range(60):
            dists = {l: int(((vq[i] - c) ** 2).sum())
                     for l, c in cents.items()}
            a = dists[int(labels[i])]
            b = min(v for l, v in dists.items()
                    if l != int(labels[i]))
            y = max(a, b)
            if y == 0:
                s = 0
            else:
                x = b - a
                sgn = (x > 0) - (x < 0)
                ax = abs(x)
                s = sgn * ((ax // y) * K + ((ax % y) * K) // y)
            ln = int(labels[i])
            n0, s0 = sums.get(ln, (0, 0))
            sums[ln] = (n0 + 1, s0 + s)
        for _, row in out.iterrows():
            assert (int(row["n"]), int(row["s_scaled_sum"])) == \
                sums[int(row["label"])]

    def test_single_label_is_empty(self, tmp_path, ray_session):
        mat = np.zeros((5, 3))
        out = r.q_embeddings_silhouette(
            self._write(tmp_path, mat, [2] * 5))
        assert len(out) == 0

    def test_empty_table_is_empty(self, tmp_path, ray_session):
        # review regression: the all-empty to_pandas() loses columns,
        # so the empty guard must run BEFORE the label/dim groupby
        out = r.q_embeddings_silhouette(
            self._write(tmp_path, np.zeros((0, 3)), []))
        assert len(out) == 0
