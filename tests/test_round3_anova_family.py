"""Semantics tests for the parametric k-sample family added late in
round 3: one-way ANOVA (`q_events_anova`), Brown–Forsythe spread test
(`q_events_levene`), Mann–Kendall trend test (`q_events_mann_kendall`),
Cramér's V (`q_part_cramers_v`), and the nearest-centroid confusion
matrix (`q_embeddings_confusion`).

References are independent: exact-Fraction F/W (the floored fixed-point
statistic must sit within the flooring error of the true value),
double-loop pairwise S for Mann–Kendall, and statistics.median for the
Brown–Forsythe centers.
"""

from __future__ import annotations

import statistics
from fractions import Fraction

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from htmlparsersharp_ray.pipelines import relational as r

K = 1 << 20


def _write_events(tmp_path, pairs, ts=None):
    """pairs: list of (event_type, value). Optional ts (us ints)."""
    n = len(pairs)
    if ts is None:
        ts = [1_700_000_000_000_000 + i for i in range(n)]
    t = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array([i % 3 for i in range(n)], pa.int64()),
        "event_type": pa.array([t for t, _ in pairs]),
        "value": pa.array([float(v) for _, v in pairs], pa.float64()),
        "props": pa.array(["{}"] * n),
    })
    tmp_path.mkdir(parents=True, exist_ok=True)
    pq.write_table(t, str(tmp_path / "events.parquet"),
                   row_group_size=3)
    return str(tmp_path)


def _true_f(groups):
    """Exact-Fraction one-way F over [(n, s, q), ...] moments."""
    k = len(groups)
    n = sum(g[0] for g in groups)
    S = sum(g[1] for g in groups)
    Q = sum(g[2] for g in groups)
    ssb = sum(Fraction(s * s, nt) for nt, s, _ in groups) \
        - Fraction(S * S, n)
    ssw = Q - sum(Fraction(s * s, nt) for nt, s, _ in groups)
    if k < 2 or n <= k or ssw == 0:
        return None
    return Fraction(ssb * (n - k), ssw * (k - 1))


class TestAnova:
    def test_matches_exact_fraction_f(self, tmp_path, ray_session):
        pairs = [("a", 1.00), ("a", 2.00), ("a", 2.50),
                 ("b", 5.00), ("b", 6.00), ("b", 4.00),
                 ("c", 1.00), ("c", 9.00)]
        sf = _write_events(tmp_path / "x", pairs)
        out = r.q_events_anova(sf)
        groups = {}
        for t, v in pairs:
            c = round(v * 100)
            nt, s, q = groups.get(t, (0, 0, 0))
            groups[t] = (nt + 1, s + c, q + c * c)
        for _, row in out.iterrows():
            assert (int(row["n"]), int(row["sum_cents"]),
                    int(row["sumsq_cents"])) == groups[row["event_type"]]
        f_true = _true_f(list(groups.values()))
        f_sc = int(out["f_scaled"].iloc[0])
        # flooring error: A loses < k, B < 1, final division < 1
        assert abs(f_sc / K - float(f_true)) < 1e-3
        assert int(out["df1"].iloc[0]) == 2
        assert int(out["df2"].iloc[0]) == 5

    def test_degenerate_single_type_and_constant(self, tmp_path,
                                                 ray_session):
        sf = _write_events(tmp_path / "one",
                           [("a", 1.0), ("a", 2.0), ("a", 3.0)])
        out = r.q_events_anova(sf)
        assert int(out["f_scaled"].iloc[0]) == -1
        sf = _write_events(tmp_path / "const",
                           [("a", 2.0), ("a", 2.0),
                            ("b", 2.0), ("b", 2.0)])
        out = r.q_events_anova(sf)
        # zero within-group variance -> undefined
        assert int(out["f_scaled"].iloc[0]) == -1

    def test_layout_invariance(self, tmp_path, ray_session):
        rng = np.random.default_rng(11)
        pairs = [("t" + str(rng.integers(0, 3)),
                  round(float(rng.uniform(0.01, 50.0)), 2))
                 for _ in range(60)]
        a = r.q_events_anova(_write_events(tmp_path / "a", pairs))
        n = len(pairs)
        t = pa.table({
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array([1_700_000_000_000_000 + i
                            for i in range(n)], pa.timestamp("us")),
            "user_id": pa.array([0] * n, pa.int64()),
            "event_type": pa.array([p[0] for p in pairs]),
            "value": pa.array([float(p[1]) for p in pairs]),
            "props": pa.array(["{}"] * n),
        })
        (tmp_path / "b").mkdir()
        pq.write_table(t, str(tmp_path / "b" / "events.parquet"),
                       row_group_size=1000)
        b = r.q_events_anova(str(tmp_path / "b"))
        pd.testing.assert_frame_equal(a, b)


class TestLevene:
    def test_matches_reference_medians_and_w(self, tmp_path,
                                             ray_session):
        pairs = [("a", 1.00), ("a", 3.00), ("a", 8.00), ("a", 9.00),
                 ("b", 5.00), ("b", 5.00), ("b", 40.00)]
        sf = _write_events(tmp_path / "x", pairs)
        out = r.q_events_levene(sf)
        by = {}
        for t, v in pairs:
            by.setdefault(t, []).append(round(v * 100))
        groups = {}
        for t, vs in by.items():
            med2 = statistics.median_low(vs) + statistics.median_high(vs)
            zs = [abs(2 * v - med2) for v in vs]
            groups[t] = (med2, (len(zs), sum(zs),
                                sum(z * z for z in zs)))
        for _, row in out.iterrows():
            med2, (nt, s, q) = groups[row["event_type"]]
            assert int(row["med2_cents"]) == med2
            assert (int(row["n"]), int(row["zsum"]),
                    int(row["zsumsq"])) == (nt, s, q)
        w_true = _true_f([g[1] for g in groups.values()])
        assert abs(int(out["w_scaled"].iloc[0]) / K
                   - float(w_true)) < 1e-3

    def test_identical_spread_is_small_w(self, tmp_path, ray_session):
        # same dispersion shape in both groups, different locations
        pairs = ([("a", v) for v in (1.0, 2.0, 3.0)]
                 + [("b", v) for v in (10.0, 11.0, 12.0)])
        out = r.q_events_levene(_write_events(tmp_path / "x", pairs))
        assert int(out["w_scaled"].iloc[0]) == 0  # z-moments identical


class TestMannKendall:
    def test_bruteforce_pairs(self, tmp_path, ray_session):
        # three days per type, with a tie inside type "b"
        day_us = 86_400_000_000
        rows, ts = [], []
        series = {"a": [(0, [1.0, 2.0]), (1, [5.0]), (2, [0.5])],
                  "b": [(0, [3.0]), (1, [3.0]), (2, [4.0]),
                        (3, [3.0])]}
        for t, days in series.items():
            for d, vals in days:
                for v in vals:
                    rows.append((t, v))
                    ts.append(d * day_us + 12 * 3_600_000_000)
        sf = _write_events(tmp_path / "x", rows, ts=ts)
        out = r.q_events_mann_kendall(sf).set_index("event_type")
        for t, days in series.items():
            xs = [round(sum(vs) * 100) for _, vs in days]
            n = len(xs)
            s = sum((xs[j] > xs[i]) - (xs[j] < xs[i])
                    for i in range(n) for j in range(i + 1, n))
            tie = 0
            for u in set(xs):
                c = xs.count(u)
                tie += c * (c - 1) * (2 * c + 5)
            var_num = n * (n - 1) * (2 * n + 5) - tie
            assert int(out.loc[t, "n_days"]) == n
            assert int(out.loc[t, "s_stat"]) == s
            assert int(out.loc[t, "var_num"]) == var_num

    def test_monotone_series_is_max_s(self, tmp_path, ray_session):
        day_us = 86_400_000_000
        rows = [("a", float(i + 1)) for i in range(6)]
        ts = [i * day_us for i in range(6)]
        out = r.q_events_mann_kendall(
            _write_events(tmp_path / "x", rows, ts=ts))
        assert int(out["s_stat"].iloc[0]) == 15  # C(6,2), all rising


class TestCramersV:
    def test_bruteforce_contingency(self, tmp_path, ray_session):
        brands = ["b1", "b1", "b1", "b2", "b2", "b2", "b2", "b3"]
        types = ["t1", "t1", "t2", "t1", "t2", "t2", "t2", "t1"]
        t = pa.table({
            "p_partkey": pa.array(range(len(brands)), pa.int64()),
            "p_name": pa.array(["p"] * len(brands)),
            "p_brand": pa.array(brands),
            "p_type": pa.array(types),
            "p_size": pa.array([1] * len(brands), pa.int32()),
            "p_retailprice": pa.array([1.0] * len(brands)),
        })
        tmp_path.mkdir(parents=True, exist_ok=True)
        pq.write_table(t, str(tmp_path / "part.parquet"))
        out = r.q_part_cramers_v(str(tmp_path))
        assert int(out["n_rows"].iloc[0]) == 8
        assert int(out["n_brands"].iloc[0]) == 3
        assert int(out["n_types"].iloc[0]) == 2
        # exact-Fraction chi-square over the FULL r x c cross product
        # (zero cells contribute r*c/n); floored terms sit within
        # n_cells flooring error
        n = 8
        obs = {}
        for b, ty in zip(brands, types):
            obs[(b, ty)] = obs.get((b, ty), 0) + 1
        rr = {b: brands.count(b) for b in set(brands)}
        cc = {ty: types.count(ty) for ty in set(types)}
        chi = sum(Fraction((obs.get((b, ty), 0) * n
                            - rr[b] * cc[ty]) ** 2,
                           n * rr[b] * cc[ty])
                  for b in rr for ty in cc)
        got = int(out["chisq_scaled"].iloc[0]) / K
        assert abs(got - float(chi)) < len(rr) * len(cc) / K + 1e-9
        v_true = float(chi / (n * 1)) ** 0.5
        assert abs(int(out["v_scaled"].iloc[0]) / K - v_true) < 1e-4

    def test_independent_columns_give_zero_v(self, tmp_path,
                                             ray_session):
        # perfectly proportional table -> chi2 == 0
        brands = ["b1"] * 4 + ["b2"] * 4
        types = ["t1", "t1", "t2", "t2"] * 2
        t = pa.table({
            "p_partkey": pa.array(range(8), pa.int64()),
            "p_name": pa.array(["p"] * 8),
            "p_brand": pa.array(brands),
            "p_type": pa.array(types),
            "p_size": pa.array([1] * 8, pa.int32()),
            "p_retailprice": pa.array([1.0] * 8),
        })
        tmp_path.mkdir(parents=True, exist_ok=True)
        pq.write_table(t, str(tmp_path / "part.parquet"))
        out = r.q_part_cramers_v(str(tmp_path))
        assert int(out["chisq_scaled"].iloc[0]) == 0
        assert int(out["v_scaled"].iloc[0]) == 0


class TestConfusion:
    def test_consistent_with_predictions(self, tmp_path, ray_session):
        rng = np.random.default_rng(5)
        n, d = 120, 4
        centers = rng.normal(size=(3, d)) * 3
        labels = rng.integers(0, 3, size=n)
        mat = centers[labels] + rng.normal(size=(n, d)) * 0.5
        t = pa.table({
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([list(map(float, row))
                                   for row in mat],
                                  pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        })
        tmp_path.mkdir(parents=True, exist_ok=True)
        pq.write_table(t, str(tmp_path / "embeddings.parquet"))
        sf = str(tmp_path)
        conf = r.q_embeddings_confusion(sf)
        preds = r.q_embeddings_nearest_centroid(sf)
        # total count == holdout size (odd vec_ids)
        assert int(conf["n"].sum()) == (n + 1) // 2 == len(preds)
        # regroup predictions with true labels -> identical matrix
        truth = pd.DataFrame({
            "vec_id": range(n), "true_label": labels.astype("int64")})
        m = (preds.merge(truth, on="vec_id")
             .groupby(["true_label", "pred_label"], as_index=False)
             .size().rename(columns={"size": "n"}))
        m = (m.astype({"true_label": "int64", "pred_label": "int64",
                       "n": "int64"})
             .sort_values(["true_label", "pred_label"])
             .reset_index(drop=True))
        pd.testing.assert_frame_equal(conf, m)
        # separable-ish clusters: diagonal dominates
        diag = conf[conf["true_label"] == conf["pred_label"]]["n"].sum()
        assert diag > conf["n"].sum() * 0.7


class TestSeasonalityOps:
    def _write_days(self, tmp_path, day_vals):
        rows = [(i, d, v) for i, (d, v) in enumerate(day_vals)]
        DAY_US = 86_400_000_000
        t = pa.table({
            "event_id": pa.array([x[0] for x in rows], pa.int64()),
            "ts": pa.array([x[1] * DAY_US + 7_000_000
                            for x in rows], pa.timestamp("us")),
            "user_id": pa.array([0] * len(rows), pa.int64()),
            "event_type": pa.array(["view"] * len(rows)),
            "value": pa.array([float(x[2]) for x in rows]),
            "props": pa.array(["{}"] * len(rows)),
        })
        tmp_path.mkdir(parents=True, exist_ok=True)
        pq.write_table(t, str(tmp_path / "events.parquet"))
        return str(tmp_path)

    def test_strength_reference(self, tmp_path, ray_session):
        # period-7 series plus noise on one day
        vals = [float((d % 7) + 1) for d in range(21)]
        vals[10] += 5.0
        sf = self._write_days(tmp_path / "x",
                              [(d, v) for d, v in enumerate(vals)])
        out = r.q_events_seasonality_strength(sf)
        cents = [round(v * 100) for v in vals]
        n = sx = sxx = sr = srr = 0
        for d in range(7, 21):
            x, rr = cents[d], cents[d] - cents[d - 7]
            n += 1
            sx += x
            sxx += x * x
            sr += rr
            srr += rr * rr
        got = out.iloc[0]
        assert (int(got["n_days"]), int(got["sum_x"]),
                int(got["sumsq_x"]), int(got["sum_r"]),
                int(got["sumsq_r"])) == (n, sx, sxx, sr, srr)
        # pure periodic part has tiny residual variance vs series
        assert srr < sxx

    def test_weekday_anova_strong_effect(self, tmp_path, ray_session):
        # 4 weeks, weekday-determined totals -> zero within-group
        # variance -> degenerate -1 sentinel
        day_vals = [(d, float((d % 7) * 10 + 1)) for d in range(28)]
        out = r.q_events_weekday_anova(
            self._write_days(tmp_path / "w", day_vals))
        assert len(out) == 7
        assert int(out["f_scaled"].iloc[0]) == -1  # ssw == 0
        # jittered totals -> huge but finite F
        day_vals = [(d, float((d % 7) * 10 + 1 + (d % 3) * 0.01))
                    for d in range(28)]
        out = r.q_events_weekday_anova(
            self._write_days(tmp_path / "w2", day_vals))
        assert int(out["f_scaled"].iloc[0]) > (1 << 20) * 100
