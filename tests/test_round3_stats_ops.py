"""Semantics tests for the higher-moment / trending / checksum batch:
grouped skewness+kurtosis from exact integer power sums, trailing-
window trending top-k, and order-independent partition checksums.

Tiny hand-crafted inputs pin the math against scipy-free closed forms;
DuckDB equivalence at sf scale is tools/check_oracle.py's job.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from htmlparsersharp_ray.pipelines import relational as r
from htmlparsersharp_ray.pipelines.relational import _h2d


def _write(tmp_path, name: str, table: pa.Table) -> str:
    tmp_path.mkdir(parents=True, exist_ok=True)
    pq.write_table(table, str(tmp_path / f"{name}.parquet"))
    return str(tmp_path)


def _ref_moments(vals):
    """Reference G1/G2 from textbook definitions over floats (values
    here are tiny ints, so float arithmetic is exact enough to match
    the engine's mirrored expressions to ~1e-12)."""
    x = np.asarray(vals, dtype=np.float64)
    n = len(x)
    m = x.mean()
    m2 = ((x - m) ** 2).mean()
    m3 = ((x - m) ** 3).mean()
    m4 = ((x - m) ** 4).mean()
    g1 = m3 / m2 ** 1.5
    skew = g1 * math.sqrt(n * (n - 1)) / (n - 2)
    g2 = m4 / m2 ** 2 - 3.0
    kurt = ((n + 1) * g2 + 6.0) * (n - 1) / ((n - 2) * (n - 3))
    std = math.sqrt(((x - m) ** 2).sum() / (n - 1))
    return std, skew, kurt


class TestH2D:
    def test_matches_python_float_on_these(self):
        """Fixed values where the split recombination coincides with
        correctly-rounded float(int) (always true below 2^62; above,
        only up to double rounding — see the property test)."""
        vals = [0, 1, -1, 2**53 + 1, -(2**53 + 3), 386318719748028000,
                -386318719748028000, 2**80 + 12345, -(2**90 + 7)]
        for v in vals:
            assert _h2d(v) == float(v), v


class TestPartSkewKurt:
    def test_matches_reference_formulas(self, ray_session, tmp_path):
        # skewed sample: long right tail in brand A, symmetric in B
        a = [900.00, 900.10, 900.20, 900.30, 999.90, 999.80]
        b = [910.00, 920.00, 930.00, 940.00, 950.00, 960.00]
        t = pa.table({
            "p_brand": pa.array(["A"] * 6 + ["B"] * 6),
            "p_retailprice": pa.array(a + b, pa.float64()),
        })
        d = _write(tmp_path, "part", t)
        out = r.q_part_skew_kurt(d)
        assert out["p_brand"].tolist() == ["A", "B"]
        for brand, vals in (("A", a), ("B", b)):
            row = out[out["p_brand"] == brand].iloc[0]
            cents = [round(v * 100) for v in vals]
            std, skew, kurt = _ref_moments(cents)
            assert row["n_rows"] == 6
            assert abs(row["stddev_cents"] - std) < 1e-9 * std
            assert abs(row["skew_price"] - skew) < 1e-9
            assert abs(row["kurt_price"] - kurt) < 1e-9
        # symmetric evenly-spaced sample: skew exactly ~0
        assert abs(out[out["p_brand"] == "B"]["skew_price"].iloc[0]) < 1e-12

    def test_partial_split_recombination(self, ray_session, tmp_path):
        """Large cents values exercise the c^2 = a*2^17 + b split; the
        4th-moment sum must survive int64-partial recombination."""
        vals = [999.90, 900.00, 955.55, 901.23, 998.76, 933.33, 977.77]
        t = pa.table({
            "p_brand": pa.array(["X"] * 7),
            "p_retailprice": pa.array(vals, pa.float64()),
        })
        out = r.q_part_skew_kurt(_write(tmp_path, "part", t))
        cents = [round(v * 100) for v in vals]
        std, skew, kurt = _ref_moments(cents)
        row = out.iloc[0]
        assert abs(row["stddev_cents"] - std) < 1e-9 * std
        assert abs(row["skew_price"] - skew) < 1e-9
        assert abs(row["kurt_price"] - kurt) < 1e-9


class TestEventsTrending:
    def _events(self, days, types):
        ts = pd.to_datetime([f"2024-01-{d:02d} 12:00:00" for d in days])
        n = len(days)
        return pa.table({
            "event_id": pa.array(range(n), pa.int64()),
            "user_id": pa.array([1] * n, pa.int64()),
            "event_type": pa.array(types, pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "value": pa.array([1.0] * n, pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        })

    def test_window_sees_types_absent_today(self, ray_session, tmp_path):
        """A type with zero events on day d but history inside [d-6, d]
        must still rank — the dense spine contract."""
        # 'a' fires day 1 only; 'b' fires days 1 and 5
        t = self._events([1, 1, 1, 5], ["a", "a", "b", "b"])
        out = r.q_events_trending(_write(tmp_path, "events", t))
        d5 = out[out["day"] == pd.Timestamp("2024-01-05")]
        # trailing 7d at day 5 covers day 1: a=2, b=2 -> tie broken by type
        assert d5["event_type"].tolist() == ["a", "b"]
        assert d5["cnt7"].tolist() == [2, 2]
        assert d5["rnk"].tolist() == [1, 2]

    def test_window_expires_after_seven_days(self, ray_session, tmp_path):
        # 'a' on day 1; 'b' on day 9: at day 9 the window [3..9] has no a
        t = self._events([1, 9], ["a", "b"])
        out = r.q_events_trending(_write(tmp_path, "events", t))
        d9 = out[out["day"] == pd.Timestamp("2024-01-09")]
        assert d9["event_type"].tolist() == ["b"]
        assert d9["cnt7"].tolist() == [1]

    def test_top3_cut_and_ordering(self, ray_session, tmp_path):
        days = [1] * 10
        types = ["a"] * 4 + ["b"] * 3 + ["c"] * 2 + ["d"] * 1
        t = self._events(days, types)
        out = r.q_events_trending(_write(tmp_path, "events", t))
        assert out["event_type"].tolist() == ["a", "b", "c"]
        assert out["cnt7"].tolist() == [4, 3, 2]


class TestOrdersChecksum:
    def _orders(self, keys, statuses, prices, dates):
        return pa.table({
            "o_orderkey": pa.array(keys, pa.int64()),
            "o_custkey": pa.array([1] * len(keys), pa.int64()),
            "o_orderstatus": pa.array(statuses, pa.string()),
            "o_totalprice": pa.array(prices, pa.float64()),
            "o_orderdate": pa.array(pd.to_datetime(dates),
                                    pa.timestamp("us")),
            "o_orderpriority": pa.array(["1"] * len(keys), pa.string()),
        })

    def test_signature_is_order_independent(self, ray_session, tmp_path):
        rows = ([1, 2, 3], ["F", "O", "P"], [10.00, 20.00, 30.00],
                ["2024-01-05", "2024-01-20", "2024-02-01"])
        d1 = _write(tmp_path / "a", "orders", self._orders(*rows))
        perm = ([3, 1, 2], ["P", "F", "O"], [30.00, 10.00, 20.00],
                ["2024-02-01", "2024-01-05", "2024-01-20"])
        d2 = _write(tmp_path / "b", "orders", self._orders(*perm))
        out1 = r.q_orders_checksum(d1)
        out2 = r.q_orders_checksum(d2)
        pd.testing.assert_frame_equal(out1, out2)
        assert out1["month"].tolist() == [202401, 202402]
        assert out1["n_rows"].tolist() == [2, 1]
        assert out1["total_cents"].tolist() == [3000, 3000]

    def test_single_row_flip_changes_signature(self, ray_session,
                                               tmp_path):
        base = ([1, 2], ["F", "F"], [10.00, 20.00],
                ["2024-01-05", "2024-01-06"])
        flip = ([1, 2], ["F", "O"], [10.00, 20.00],
                ["2024-01-05", "2024-01-06"])
        s1 = r.q_orders_checksum(
            _write(tmp_path / "a", "orders", self._orders(*base)))
        s2 = r.q_orders_checksum(
            _write(tmp_path / "b", "orders", self._orders(*flip)))
        assert s1["xor_sig"].iloc[0] != s2["xor_sig"].iloc[0]
        assert s1["n_rows"].iloc[0] == s2["n_rows"].iloc[0]


class TestCustomerPareto:
    def _orders(self, custs, prices):
        n = len(custs)
        return pa.table({
            "o_orderkey": pa.array(range(n), pa.int64()),
            "o_custkey": pa.array(custs, pa.int64()),
            "o_orderstatus": pa.array(["F"] * n),
            "o_totalprice": pa.array(prices, pa.float64()),
            "o_orderdate": pa.array(
                pd.to_datetime(["2024-01-01"] * n), pa.timestamp("us")),
            "o_orderpriority": pa.array(["1"] * n),
        })

    def test_exact_boundary_inclusion(self, ray_session, tmp_path):
        """total=100: ranks cut at the first row whose cum reaches 80.
        cum_before of the 80-crossing row must be < 80 (include), the
        next row lands at cum_before >= 80 (exclude)."""
        # revenues 50, 30, 15, 5 -> cum 50, 80, 95, 100; keep while
        # 5*cum_before < 4*100: rows 1 (0<80), 2 (50<80), NOT 3 (80==80)
        t = self._orders([1, 2, 3, 4], [50.0, 30.0, 15.0, 5.0])
        out = r.q_customer_pareto(_write(tmp_path, "orders", t))
        assert out["c_custkey"].tolist() == [1, 2]
        assert out["rnk"].tolist() == [1, 2]
        assert out["cum_c"].tolist() == [5000, 8000]

    def test_band_straddle_and_ties(self, ray_session, tmp_path):
        """Equal revenues tie-break by custkey; revenues in different
        bit-length bands get globally consistent ranks."""
        # rev cents: 819200 (band 20), 4096*100=409600 (band 19),
        # 409600 again (tie), 100 (band 7)
        t = self._orders([9, 3, 7, 1],
                         [8192.0, 4096.0, 4096.0, 1.0])
        out = r.q_customer_pareto(_write(tmp_path, "orders", t))
        # keep until cum_before >= 0.8*total
        assert out["rnk"].tolist() == list(range(1, len(out) + 1))
        assert out["c_custkey"].tolist()[:3] == [9, 3, 7]

    def test_multi_order_customers_aggregate_first(self, ray_session,
                                                   tmp_path):
        t = self._orders([1, 1, 2], [10.0, 10.0, 5.0])
        out = r.q_customer_pareto(_write(tmp_path, "orders", t))
        assert out.iloc[0]["c_custkey"] == 1
        assert out.iloc[0]["rev_c"] == 2000


class TestEventsChisq:
    def _events(self, types, dates):
        n = len(types)
        return pa.table({
            "event_id": pa.array(range(n), pa.int64()),
            "user_id": pa.array([1] * n, pa.int64()),
            "event_type": pa.array(types, pa.string()),
            "ts": pa.array(pd.to_datetime(dates), pa.timestamp("us")),
            "value": pa.array([1.0] * n, pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        })

    def test_independent_table_is_zero(self, ray_session, tmp_path):
        """Perfectly proportional 2x2 table -> chisq exactly 0."""
        # Mon 2024-01-01, Tue 2024-01-02; a:b = 2:1 on both days
        types = ["a", "a", "b", "a", "a", "b"]
        dates = ["2024-01-01"] * 3 + ["2024-01-02"] * 3
        out = r.q_events_chisq(_write(tmp_path, "events",
                                      self._events(types, dates)))
        assert out["chisq_scaled"].iloc[0] == 0
        assert out["df"].iloc[0] == 1
        assert out["n_rows"].iloc[0] == 6

    def test_known_value(self, ray_session, tmp_path):
        """Hand-checkable 2x2: O = [[3,1],[1,3]] -> chisq = 2.0
        (n=8, all margins 4: term = (O*8-16)^2/(8*16) per cell =
        (24-16)^2/128 = 0.5 each)."""
        types = (["a"] * 3 + ["b"]) + (["a"] + ["b"] * 3)
        dates = ["2024-01-01"] * 4 + ["2024-01-02"] * 4
        out = r.q_events_chisq(_write(tmp_path, "events",
                                      self._events(types, dates)))
        assert out["chisq_scaled"].iloc[0] == 2 * 1048576


class TestDocsCompressibility:
    def _docs(self, tmp_path, texts):
        n = len(texts)
        t = pa.table({
            "doc_id": pa.array(range(1, n + 1), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * n),
            "source": pa.array(["s"] * n),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        })
        return _write(tmp_path, "documents", t)

    def test_direct_zlib_differential(self, ray_session, tmp_path):
        import zlib

        from htmlparsersharp_ray.stages.text_analysis import (
            CompressibilityUDF, compressibility)
        import ray as _ray

        texts = ["hello world " * 50, "abc", "", "x" * 1000,
                 "The quick brown fox jumps over the lazy dog. " * 7]
        d = self._docs(tmp_path, texts)
        out = (compressibility(_ray.data.read_parquet(
            d + "/documents.parquet")).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
        for i, t in enumerate(texts):
            b = t.encode()
            comp = len(zlib.compress(b, CompressibilityUDF.LEVEL))
            assert out.loc[i, "raw_len"] == len(b)
            assert out.loc[i, "comp_len"] == comp
            expect = (comp * 1_000_000 // len(b)) if b else 1_000_000
            assert out.loc[i, "ratio_ppm"] == expect

    def test_entropy_ordering(self, ray_session, tmp_path):
        """Planted corpora: repeated template << prose << random-ish
        hex noise in compression ratio."""
        import hashlib

        template = "click here to subscribe now! " * 200
        prose = ("It was the best of times, it was the worst of times, "
                 "it was the age of wisdom, it was the age of "
                 "foolishness, it was the epoch of belief. ") * 20
        noise = "".join(hashlib.sha256(str(i).encode()).hexdigest()
                        for i in range(120))
        d = self._docs(tmp_path, [template, prose, noise])
        from htmlparsersharp_ray.stages.text_analysis import (
            compressibility)
        import ray as _ray

        out = (compressibility(_ray.data.read_parquet(
            d + "/documents.parquet")).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
        r_t, r_p, r_n = out["ratio_ppm"].tolist()
        assert r_t < r_p < r_n


class TestOrdersBenford:
    def test_digit_extraction_and_shares(self, ray_session, tmp_path):
        # cents: 999 (digit 9), 1000 (1), 100000 (1), 55555 (5)
        t = pa.table({
            "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
            "o_custkey": pa.array([1] * 4, pa.int64()),
            "o_orderstatus": pa.array(["F"] * 4),
            "o_totalprice": pa.array([9.99, 10.00, 1000.00, 555.55],
                                     pa.float64()),
            "o_orderdate": pa.array(pd.to_datetime(["2024-01-01"] * 4),
                                    pa.timestamp("us")),
            "o_orderpriority": pa.array(["1"] * 4),
        })
        out = r.q_orders_benford(_write(tmp_path, "orders", t))
        by = dict(zip(out["digit"], out["n_rows"]))
        assert by == {1: 2, 5: 1, 9: 1}
        row1 = out[out["digit"] == 1].iloc[0]
        assert row1["obs_ppm"] == 500000
        assert row1["exp_ppm"] == math.floor(math.log10(2.0) * 1e6)


class TestNationCustomerHhi:
    def _tables(self, tmp_path, custs, nations, orders):
        _write(tmp_path, "customer", pa.table({
            "c_custkey": pa.array(custs, pa.int64()),
            "c_nationkey": pa.array(nations, pa.int64()),
        }))
        ok, prices = zip(*orders)
        return _write(tmp_path, "orders", pa.table({
            "o_custkey": pa.array(ok, pa.int64()),
            "o_totalprice": pa.array(prices, pa.float64()),
        }))

    def test_monopoly_is_one_equal_split_is_inverse_n(self, ray_session,
                                                      tmp_path):
        # nation 0: one customer -> HHI = 1; nation 1: four equal
        # customers -> HHI = 1/4
        d = self._tables(
            tmp_path,
            custs=[1, 2, 3, 4, 5],
            nations=[0, 1, 1, 1, 1],
            orders=[(1, 50.0), (2, 10.0), (3, 10.0), (4, 10.0),
                    (5, 10.0)])
        out = r.q_nation_customer_hhi(d)
        assert out[out["c_nationkey"] == 0]["hhi"].iloc[0] == 1.0
        assert out[out["c_nationkey"] == 1]["hhi"].iloc[0] == 0.25
        assert out[out["c_nationkey"] == 1]["n_customers"].iloc[0] == 4

    def test_customers_without_orders_excluded(self, ray_session,
                                               tmp_path):
        d = self._tables(tmp_path, custs=[1, 2], nations=[0, 0],
                         orders=[(1, 5.0)])
        out = r.q_nation_customer_hhi(d)
        assert out["n_customers"].tolist() == [1]
        assert out["hhi"].tolist() == [1.0]


class TestEventsSes:
    def test_floor_recurrence(self, ray_session, tmp_path):
        # day totals cents: 100, 51, 10 ->
        # S1=100, S2=floor(151/2)=75, S3=floor(85/2)=42
        t = pa.table({
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "user_id": pa.array([1] * 3, pa.int64()),
            "event_type": pa.array(["a"] * 3),
            "ts": pa.array(pd.to_datetime(
                ["2024-01-01", "2024-01-02", "2024-01-03"]),
                pa.timestamp("us")),
            "value": pa.array([1.00, 0.51, 0.10], pa.float64()),
            "props": pa.array(["{}"] * 3),
        })
        out = r.q_events_ses(_write(tmp_path, "events", t))
        assert out["day_cents"].tolist() == [100, 51, 10]
        assert out["ses_cents"].tolist() == [100, 75, 42]


class TestEventsAutocorr:
    def test_linear_series_is_perfectly_correlated(self, ray_session,
                                                   tmp_path):
        """Strictly linear day totals: lag-1 pairs are collinear ->
        autocorr exactly 1.0 (integer stats make it bitwise 1.0)."""
        days = [f"2024-01-{d:02d}" for d in range(1, 11)]
        vals = [float(d) for d in range(1, 11)]
        t = pa.table({
            "event_id": pa.array(range(10), pa.int64()),
            "user_id": pa.array([1] * 10, pa.int64()),
            "event_type": pa.array(["a"] * 10),
            "ts": pa.array(pd.to_datetime(days), pa.timestamp("us")),
            "value": pa.array(vals, pa.float64()),
            "props": pa.array(["{}"] * 10),
        })
        out = r.q_events_autocorr(_write(tmp_path, "events", t))
        l1 = out[out["lag"] == 1].iloc[0]
        assert l1["n_pairs"] == 9
        # collinear pairs: r = 1 up to the final sqrt/division ULPs
        assert abs(l1["autocorr"] - 1.0) < 1e-12
        l7 = out[out["lag"] == 7].iloc[0]
        assert l7["n_pairs"] == 3

    def test_gap_days_drop_pairs(self, ray_session, tmp_path):
        """Missing days produce no (t, t-1) pair — pairing is by day
        VALUE, not row position."""
        days = ["2024-01-01", "2024-01-02", "2024-01-05", "2024-01-06"]
        t = pa.table({
            "event_id": pa.array(range(4), pa.int64()),
            "user_id": pa.array([1] * 4, pa.int64()),
            "event_type": pa.array(["a"] * 4),
            "ts": pa.array(pd.to_datetime(days), pa.timestamp("us")),
            "value": pa.array([1.0, 2.0, 4.0, 8.0], pa.float64()),
            "props": pa.array(["{}"] * 4),
        })
        out = r.q_events_autocorr(_write(tmp_path, "events", t))
        assert out[out["lag"] == 1].iloc[0]["n_pairs"] == 2  # 02, 06


class TestOrdersKeyGaps:
    def _orders(self, tmp_path, keys, statuses=None):
        n = len(keys)
        statuses = statuses or ["F"] * n
        t = pa.table({
            "o_orderkey": pa.array(keys, pa.int64()),
            "o_orderstatus": pa.array(statuses),
        })
        return _write(tmp_path, "orders", t)

    def test_known_gaps(self, ray_session, tmp_path):
        d = self._orders(tmp_path, [1, 2, 5, 6, 10])
        out = r.q_orders_key_gaps(d)
        assert list(zip(out["gap_start"], out["gap_end"],
                        out["gap_len"])) == [(3, 4, 2), (7, 9, 3)]

    def test_bucket_straddle_gap(self, ray_session, tmp_path):
        """Keys far enough apart to land in different range buckets:
        the straddle merge must still report the cross-bucket gap."""
        # max key 2^20 -> shift 9; keys 100 and 2^20 are in different
        # buckets with everything between missing
        d = self._orders(tmp_path, [100, 1 << 20])
        out = r.q_orders_key_gaps(d)
        assert list(zip(out["gap_start"], out["gap_end"])) == [
            (101, (1 << 20) - 1)]

    def test_status_filter(self, ray_session, tmp_path):
        """Non-F keys are invisible: key 3 exists with status O, so
        the F-sequence still has the 3-gap."""
        d = self._orders(tmp_path, [1, 2, 3, 4],
                         ["F", "F", "O", "F"])
        out = r.q_orders_key_gaps(d)
        assert list(zip(out["gap_start"], out["gap_end"])) == [(3, 3)]


class TestDocsSourceKl:
    def _docs(self, tmp_path, sources, texts):
        n = len(texts)
        t = pa.table({
            "doc_id": pa.array(range(1, n + 1), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * n),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        })
        return _write(tmp_path, "documents", t)

    def test_matching_source_has_zero_kl(self, ray_session, tmp_path):
        """A source whose term distribution EQUALS the corpus
        distribution has KL = 0 exactly (every ratio is 1, ln 1 = 0,
        floor(0) = 0)."""
        # two sources with identical distributions -> corpus == each
        d = self._docs(tmp_path, ["a", "b"],
                       ["x x y", "x x y"])
        out = r.q_docs_source_kl(d)
        assert out["kl_scaled"].tolist() == [0, 0]
        assert out["n_tokens"].tolist() == [3, 3]

    def test_skewed_source_positive_kl(self, ray_session, tmp_path):
        """A source concentrated on one term diverges; KL >= 0 up to
        the floor (each cell loses < 1/2^30)."""
        d = self._docs(tmp_path, ["a", "a", "b", "b"],
                       ["x x x x", "x x y", "y y y x", "y y"])
        out = r.q_docs_source_kl(d)
        # both sources differ from the pooled corpus distribution
        assert (out["kl_scaled"] > 0).all()

    def test_hand_computed(self, ray_session, tmp_path):
        import math

        d = self._docs(tmp_path, ["a", "b"], ["x x x y", "x y y y"])
        out = r.q_docs_source_kl(d)
        # corpus: x=4, y=4, N=8; source a: x=3, y=1, ns=4
        expect_a = (math.floor((3 / 4) * math.log((3 * 8) / (4 * 4))
                               * 2**30)
                    + math.floor((1 / 4) * math.log((1 * 8) / (4 * 4))
                                 * 2**30))
        assert out[out["source"] == "a"]["kl_scaled"].iloc[0] == expect_a


class TestNumericHelpersProperties:
    def test_h2d_contract_property(self):
        """_h2d's contract is the SQL mirror (same split, same IEEE
        ops), NOT correct rounding: below the 2^62 seam it equals
        float(v) exactly; above, the recombination may double-round
        one ULP off float(v) (hypothesis found 9074390995551966465),
        which is fine because the oracle computes the identical
        recombination."""
        import math

        from hypothesis import given, settings
        from hypothesis import strategies as st

        from htmlparsersharp_ray.pipelines.relational import _h2d

        @given(st.integers(min_value=-(2**125), max_value=2**125))
        @settings(max_examples=300, deadline=None)
        def check(v):
            got = _h2d(v)
            s = -1.0 if v < 0 else 1.0
            a = abs(v)
            # the exact mirrored recombination
            assert got == s * (float(a >> 62) * 4611686018427387904.0
                               + float(a & ((1 << 62) - 1)))
            if abs(v) < 2**62:
                assert got == float(v)
            elif float(v) != 0 and math.isfinite(float(v)):
                # within one ULP of the correctly-rounded value
                assert abs(got - float(v)) <= math.ulp(float(v))

        check()

    def test_bitlen64_property(self):
        import numpy as np
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from htmlparsersharp_ray.pipelines.relational import _bitlen64

        @given(st.lists(st.integers(min_value=0, max_value=2**62),
                        min_size=1, max_size=50))
        @settings(max_examples=100, deadline=None)
        def check(vals):
            got = _bitlen64(np.asarray(vals, dtype=np.int64))
            assert got.tolist() == [int(v).bit_length() for v in vals]

        check()


class TestEventsTypeOverlap:
    def _events(self, tmp_path, users, types):
        n = len(users)
        t = pa.table({
            "event_id": pa.array(range(n), pa.int64()),
            "user_id": pa.array(users, pa.int64()),
            "event_type": pa.array(types, pa.string()),
            "ts": pa.array(pd.to_datetime(["2024-01-01"] * n),
                           pa.timestamp("us")),
            "value": pa.array([1.0] * n, pa.float64()),
            "props": pa.array(["{}"] * n),
        })
        return _write(tmp_path, "events", t)

    def test_hand_counted_overlap(self, ray_session, tmp_path):
        # users: 1 does a+b, 2 does a, 3 does b, 4 does a (twice)
        d = self._events(tmp_path,
                         [1, 1, 2, 3, 4, 4],
                         ["a", "b", "a", "b", "a", "a"])
        out = r.q_events_type_overlap(d)
        row = out.iloc[0]
        assert (row["type_a"], row["type_b"]) == ("a", "b")
        assert row["n_both"] == 1      # only user 1
        assert row["n_either"] == 4
        assert row["jaccard_ppm"] == 250000

    def test_disjoint_cohorts(self, ray_session, tmp_path):
        d = self._events(tmp_path, [1, 2], ["a", "b"])
        out = r.q_events_type_overlap(d)
        assert out.iloc[0]["n_both"] == 0
        assert out.iloc[0]["jaccard_ppm"] == 0


class TestReviewFixes:
    """Regression pins for the session self-review findings: degenerate
    groups, zero/negative magnitudes, empty inputs, >63 types, and the
    HHI s^2 split."""

    def test_skew_kurt_skips_degenerate_groups(self, ray_session,
                                               tmp_path):
        # brand S: 3 rows (n-3 == 0); brand C: constant prices (m2=0);
        # brand G: healthy
        t = pa.table({
            "p_brand": pa.array(["S"] * 3 + ["C"] * 5 + ["G"] * 5),
            "p_retailprice": pa.array(
                [910.0, 920.0, 930.0] + [950.0] * 5
                + [900.0, 910.0, 930.0, 970.0, 999.9], pa.float64()),
        })
        out = r.q_part_skew_kurt(_write(tmp_path, "part", t))
        assert out["p_brand"].tolist() == ["G"]

    def test_benford_ignores_zero_and_uses_magnitude(self, ray_session,
                                                     tmp_path):
        t = pa.table({
            "o_custkey": pa.array([1, 2, 3], pa.int64()),
            "o_totalprice": pa.array([0.0, -5.00, 3.00], pa.float64()),
        })
        out = r.q_orders_benford(_write(tmp_path, "orders", t))
        by = dict(zip(out["digit"], out["n_rows"]))
        assert by == {5: 1, 3: 1}   # zero dropped, -500 counts as 5

    def test_key_gaps_no_f_rows_is_empty(self, ray_session, tmp_path):
        t = pa.table({
            "o_orderkey": pa.array([1, 2], pa.int64()),
            "o_orderstatus": pa.array(["O", "P"]),
        })
        out = r.q_orders_key_gaps(_write(tmp_path, "orders", t))
        assert len(out) == 0
        assert list(out.columns) == ["gap_start", "gap_end", "gap_len"]

    def test_type_overlap_raises_past_63_types(self, ray_session,
                                               tmp_path):
        import pytest

        n = 70
        t = pa.table({
            "event_id": pa.array(range(n), pa.int64()),
            "user_id": pa.array([1] * n, pa.int64()),
            "event_type": pa.array([f"t{i:03d}" for i in range(n)]),
            "ts": pa.array(pd.to_datetime(["2024-01-01"] * n),
                           pa.timestamp("us")),
            "value": pa.array([1.0] * n, pa.float64()),
            "props": pa.array(["{}"] * n),
        })
        d = _write(tmp_path, "events", t)
        with pytest.raises(ValueError, match="63-bit"):
            r.q_events_type_overlap(d)

    def test_hhi_survives_big_revenues(self, ray_session, tmp_path):
        """Revenues sized so a plain int64 sum of s^2 would wrap
        (~120 customers x (2.8e8)^2 > 2^63): the hi/lo split must
        keep HHI exact (equal split of k customers -> HHI = 1/k)."""
        k = 150
        _write(tmp_path, "customer", pa.table({
            "c_custkey": pa.array(range(k), pa.int64()),
            "c_nationkey": pa.array([0] * k, pa.int64()),
        }))
        _write(tmp_path, "orders", pa.table({
            "o_custkey": pa.array(range(k), pa.int64()),
            # $2.8M per order -> 2.8e8 cents each
            "o_totalprice": pa.array([2.8e6] * k, pa.float64()),
        }))
        out = r.q_nation_customer_hhi(str(tmp_path))
        assert out["n_customers"].tolist() == [k]
        assert abs(out["hhi"].iloc[0] - 1.0 / k) < 1e-15


class TestPartTrimmedMean:
    def test_hand_computed_trim(self, ray_session, tmp_path):
        # ten values 1..10 dollars: p10 = sorted[ceil(0.1*10)-1] = 1.00,
        # p90 = sorted[ceil(0.9*10)-1] = 9.00 -> keep 1..9, mean 5.00
        vals = [float(i) for i in range(1, 11)]
        t = pa.table({
            "p_brand": pa.array(["A"] * 10),
            "p_retailprice": pa.array(vals, pa.float64()),
        })
        out = r.q_part_trimmed_mean(_write(tmp_path, "part", t))
        row = out.iloc[0]
        assert row["n_rows"] == 10 and row["n_kept"] == 9
        assert row["lo_cents"] == 100 and row["hi_cents"] == 900
        assert row["trimmed_mean_cents"] == 500.0

    def test_outlier_removed(self, ray_session, tmp_path):
        # one huge outlier beyond p90 must not pollute the mean
        vals = [10.0] * 9 + [10000.0]
        t = pa.table({
            "p_brand": pa.array(["A"] * 10),
            "p_retailprice": pa.array(vals, pa.float64()),
        })
        out = r.q_part_trimmed_mean(_write(tmp_path, "part", t))
        assert out.iloc[0]["trimmed_mean_cents"] == 1000.0
        assert out.iloc[0]["n_kept"] == 9


class TestEventsInterarrival:
    def test_hand_computed_gaps(self, ray_session, tmp_path):
        # user 1 type a at t=0s,10s,30s -> gaps 10, 20
        # user 2 type a at t=0s,100s   -> gap 100
        # type b: single event, no gaps -> excluded entirely
        ts = pd.to_datetime([
            "2024-01-01 00:00:00", "2024-01-01 00:00:10",
            "2024-01-01 00:00:30", "2024-01-01 00:00:00",
            "2024-01-01 00:01:40", "2024-01-01 00:00:05"])
        t = pa.table({
            "event_id": pa.array(range(6), pa.int64()),
            "user_id": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
            "event_type": pa.array(["a", "a", "a", "a", "a", "b"]),
            "ts": pa.array(ts, pa.timestamp("us")),
            "value": pa.array([1.0] * 6, pa.float64()),
            "props": pa.array(["{}"] * 6),
        })
        out = r.q_events_interarrival(_write(tmp_path, "events", t))
        assert out["event_type"].tolist() == ["a"]
        row = out.iloc[0]
        # gaps sorted: [10, 20, 100]; p50 = ceil(.5*3)=2nd = 20,
        # p90 = ceil(.9*3)=3rd = 100
        assert row["n_gaps"] == 3
        assert row["p50_sec"] == 20
        assert row["p90_sec"] == 100

    def test_cross_user_gaps_never_mix(self, ray_session, tmp_path):
        # two users interleaved in time: gaps are within-user only
        ts = pd.to_datetime([
            "2024-01-01 00:00:00", "2024-01-01 00:00:01",
            "2024-01-01 00:10:00", "2024-01-01 00:10:01"])
        t = pa.table({
            "event_id": pa.array(range(4), pa.int64()),
            "user_id": pa.array([1, 2, 1, 2], pa.int64()),
            "event_type": pa.array(["a"] * 4),
            "ts": pa.array(ts, pa.timestamp("us")),
            "value": pa.array([1.0] * 4, pa.float64()),
            "props": pa.array(["{}"] * 4),
        })
        out = r.q_events_interarrival(_write(tmp_path, "events", t))
        assert out.iloc[0]["n_gaps"] == 2
        assert out.iloc[0]["p50_sec"] == 600  # both gaps exactly 10 min


class TestParetoPropertyDifferential:
    def test_random_revenues_vs_pandas_reference(self, ray_session,
                                                 tmp_path):
        """Randomized differential: band-offset global ranking must
        equal the straightforward sort-then-cumsum reference on
        revenue multisets WITH ties across band boundaries."""
        import numpy as np

        rng = np.random.default_rng(23)
        for trial in range(4):
            n = int(rng.integers(5, 60))
            # mix of magnitudes so several bit-length bands occupy,
            # plus forced ties
            cents = rng.choice(
                [1, 2, 3, 127, 128, 129, 255, 256, 1000, 65536,
                 100000], size=n).astype(np.int64)
            custs = np.arange(1, n + 1, dtype=np.int64)
            t = pa.table({
                "o_custkey": pa.array(custs),
                "o_totalprice": pa.array(cents / 100.0, pa.float64()),
            })
            d = _write(tmp_path / f"t{trial}", "orders", t)
            out = r.q_customer_pareto(d)
            # reference: sort by (rev desc, custkey), integer cumsum
            ref = pd.DataFrame({"c": custs, "r": cents}).sort_values(
                ["r", "c"], ascending=[False, True])
            total = int(cents.sum())
            cum, keep = 0, []
            for rank, (_, row) in enumerate(ref.iterrows(), start=1):
                if 5 * cum < 4 * total:
                    keep.append((int(row["c"]), int(row["r"]), rank,
                                 cum + int(row["r"])))
                cum += int(row["r"])
            got = list(zip(out["c_custkey"], out["rev_c"], out["rnk"],
                           out["cum_c"]))
            assert got == keep, f"trial {trial}"
