"""Semantics tests for the third late-round-3 batch: Markov entropy
rate (`q_events_markov_entropy`), Gini/Lorenz summary
(`q_customer_lorenz`), rich-club profile (`q_part_rich_club`), and
term burstiness (`q_docs_burstiness`). References are brute-force
reimplementations (float entropy from transition dicts, O(n²) pairwise
|diff|, hand-built graphs, token dictionaries).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from htmlparsersharp_ray.pipelines import relational as r


def _write_events_seq(tmp_path, seqs):
    """seqs: {user_id: [event_type, ...]} in time order."""
    rows = []
    for uid, types in seqs.items():
        for i, t in enumerate(types):
            rows.append((len(rows), 1_700_000_000_000_000 + i * 1000,
                         uid, t))
    t = pa.table({
        "event_id": pa.array([x[0] for x in rows], pa.int64()),
        "ts": pa.array([x[1] for x in rows], pa.timestamp("us")),
        "user_id": pa.array([x[2] for x in rows], pa.int64()),
        "event_type": pa.array([x[3] for x in rows]),
        "value": pa.array([1.0] * len(rows), pa.float64()),
        "props": pa.array(["{}"] * len(rows)),
    })
    tmp_path.mkdir(parents=True, exist_ok=True)
    pq.write_table(t, str(tmp_path / "events.parquet"))
    return str(tmp_path)


class TestMarkovEntropy:
    def test_reference_entropy(self, tmp_path, ray_session):
        seqs = {1: ["a", "b", "a", "b", "c"], 2: ["a", "b", "b"]}
        sf = _write_events_seq(tmp_path / "x", seqs)
        out = r.q_events_markov_entropy(sf)
        # transitions: a->b x3; b->a x1, b->b x1, b->c x1
        counts = {"a": {"b": 3}, "b": {"a": 1, "b": 1, "c": 1}}
        for _, row in out.iterrows():
            cs = counts[row["prev_type"]]
            rtot = sum(cs.values())
            want = sum(math.floor((c / rtot) * math.log(rtot / c)
                                  * (1 << 30)) for c in cs.values())
            assert int(row["n_out"]) == rtot
            assert int(row["n_next"]) == len(cs)
            assert int(row["h_scaled"]) == want
        # deterministic successor => zero entropy
        a = out[out["prev_type"] == "a"]
        assert int(a["h_scaled"].iloc[0]) == 0

    def test_uniform_successors_max_entropy(self, tmp_path,
                                            ray_session):
        seqs = {1: ["s", "a", "s", "b", "s", "c", "s", "d"]}
        out = r.q_events_markov_entropy(
            _write_events_seq(tmp_path / "x", seqs))
        s = out[out["prev_type"] == "s"]
        # ln(4) scaled, minus flooring error < 4
        want = math.log(4.0) * (1 << 30)
        assert abs(int(s["h_scaled"].iloc[0]) - want) < 8


class TestLorenz:
    def _write_orders(self, tmp_path, cust_prices):
        n = len(cust_prices)
        t = pa.table({
            "o_orderkey": pa.array(range(n), pa.int64()),
            "o_custkey": pa.array([c for c, _ in cust_prices],
                                  pa.int64()),
            "o_orderstatus": pa.array(["F"] * n),
            "o_totalprice": pa.array([float(p) for _, p in
                                      cust_prices], pa.float64()),
            "o_orderdate": pa.array([0] * n, pa.timestamp("us")),
            "o_orderpriority": pa.array(["1-URGENT"] * n),
        })
        tmp_path.mkdir(parents=True, exist_ok=True)
        pq.write_table(t, str(tmp_path / "orders.parquet"),
                       row_group_size=2)
        return str(tmp_path)

    def test_bruteforce_pairwise(self, tmp_path, ray_session):
        cust_prices = [(1, 10.00), (1, 5.00), (2, 3.00), (3, 40.00),
                       (4, 3.00), (5, 15.00)]
        sf = self._write_orders(tmp_path / "x", cust_prices)
        out = r.q_customer_lorenz(sf)
        rev = {}
        for c, p in cust_prices:
            rev[c] = rev.get(c, 0) + round(p * 100)
        vals = list(rev.values())
        want = sum(abs(a - b) for a in vals for b in vals)
        assert int(out["n_customers"].iloc[0]) == len(vals)
        assert int(out["sum_cents"].iloc[0]) == sum(vals)
        assert int(out["gini_num"].iloc[0]) == want

    def test_equal_revenues_zero_gini(self, tmp_path, ray_session):
        cust_prices = [(c, 7.00) for c in range(1, 6)]
        out = r.q_customer_lorenz(
            self._write_orders(tmp_path / "x", cust_prices))
        assert int(out["gini_num"].iloc[0]) == 0

    def test_randomized_bruteforce(self, tmp_path, ray_session):
        rng = np.random.default_rng(13)
        cust_prices = [(int(rng.integers(1, 40)),
                        round(float(rng.uniform(1, 500)), 2))
                       for _ in range(200)]
        sf = self._write_orders(tmp_path / "r", cust_prices)
        out = r.q_customer_lorenz(sf)
        rev = {}
        for c, p in cust_prices:
            rev[c] = rev.get(c, 0) + round(p * 100)
        vals = list(rev.values())
        want = sum(abs(a - b) for a in vals for b in vals)
        assert int(out["gini_num"].iloc[0]) == want


class TestRichClub:
    def test_star_plus_clique(self, tmp_path, ray_session):
        # orders: a 5-clique (parts 1-5 in one order) and pendant
        # parts 6,7 attached to part 1 via two-part orders
        li_rows = ([(1, p) for p in (1, 2, 3, 4, 5)]
                   + [(2, 1), (2, 6), (3, 1), (3, 7)])
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
        tmp_path.mkdir(parents=True, exist_ok=True)
        pq.write_table(li, str(tmp_path / "lineitem.parquet"))
        out = r.q_part_rich_club(str(tmp_path))
        got = {int(k): (int(n), int(e))
               for k, n, e in zip(out["k"], out["n_nodes"],
                                  out["n_edges"])}
        # degrees: part1=6, parts2-5=4, parts6,7=1
        assert got[4] == (1, 0)       # only part1 above 4; no edges
        # threshold 3 not in KS; check k=8: nobody above
        assert got[8] == (0, 0)

    def test_clique_above_threshold(self, tmp_path, ray_session):
        # 7-clique: all degrees 6 > 4 -> n_nodes=7, edges=21 at k=4
        li_rows = [(1, p) for p in range(1, 8)]
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
        tmp_path.mkdir(parents=True, exist_ok=True)
        pq.write_table(li, str(tmp_path / "lineitem.parquet"))
        out = r.q_part_rich_club(str(tmp_path))
        got = {int(k): (int(n), int(e))
               for k, n, e in zip(out["k"], out["n_nodes"],
                                  out["n_edges"])}
        assert got[4] == (7, 21)
        assert got[8] == (0, 0)


class TestBurstiness:
    def _write_docs(self, tmp_path, texts):
        t = pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        })
        tmp_path.mkdir(parents=True, exist_ok=True)
        pq.write_table(t, str(tmp_path / "documents.parquet"),
                       row_group_size=2)
        return str(tmp_path)

    def test_token_dictionary_reference(self, tmp_path, ray_session):
        texts = ["a a a b", "a b c", "c c c c"]
        out = r.q_docs_burstiness(self._write_docs(tmp_path, texts))
        got = {row["term"]: (int(row["total_count"]),
                             int(row["doc_freq"]), int(row["sumsq"]))
               for _, row in out.iterrows()}
        # a: docs (3,1) -> c=4 df=2 sq=10; b: (1,1) -> 2,2,2
        # c: (1,4) -> 5,2,17
        assert got == {"a": (4, 2, 10), "b": (2, 2, 2),
                       "c": (5, 2, 17)}

    def test_top32_cut_with_ties(self, tmp_path, ray_session):
        # 40 singleton terms + 2 frequent ones: cut keeps the 2
        # frequent plus the 30 alphabetically-smallest singletons
        texts = ["hot hot cold cold"] + [f"w{i:02d}" for i in range(40)]
        out = r.q_docs_burstiness(self._write_docs(tmp_path, texts))
        assert len(out) == 32
        terms = set(out["term"])
        assert {"hot", "cold"} <= terms
        assert "w29" in terms and "w30" not in terms


class TestGiniByBrand:
    def test_bruteforce_per_brand(self, tmp_path, ray_session):
        import numpy as np

        rng = np.random.default_rng(31)
        brands = [f"b{i % 4}" for i in range(80)]
        prices = [round(float(rng.uniform(1, 200)), 2)
                  for _ in range(80)]
        t = pa.table({
            "p_partkey": pa.array(range(80), pa.int64()),
            "p_name": pa.array(["p"] * 80),
            "p_brand": pa.array(brands),
            "p_type": pa.array(["t"] * 80),
            "p_size": pa.array([1] * 80, pa.int32()),
            "p_retailprice": pa.array(prices),
        })
        tmp_path.mkdir(parents=True, exist_ok=True)
        pq.write_table(t, str(tmp_path / "part.parquet"),
                       row_group_size=7)
        out = r.q_part_gini_by_brand(str(tmp_path))
        by = {}
        for b, p in zip(brands, prices):
            by.setdefault(b, []).append(round(p * 100))
        for _, row in out.iterrows():
            vs = by[row["brand"]]
            want = sum(abs(a - b2) for a in vs for b2 in vs)
            assert int(row["n"]) == len(vs)
            assert int(row["sum_cents"]) == sum(vs)
            assert int(row["gini_num"]) == want

    def test_uniform_brand_zero(self, tmp_path, ray_session):
        t = pa.table({
            "p_partkey": pa.array(range(4), pa.int64()),
            "p_name": pa.array(["p"] * 4),
            "p_brand": pa.array(["b"] * 4),
            "p_type": pa.array(["t"] * 4),
            "p_size": pa.array([1] * 4, pa.int32()),
            "p_retailprice": pa.array([9.99] * 4),
        })
        tmp_path.mkdir(parents=True, exist_ok=True)
        pq.write_table(t, str(tmp_path / "part.parquet"))
        out = r.q_part_gini_by_brand(str(tmp_path))
        assert int(out["gini_num"].iloc[0]) == 0
