"""Semantics tests for the round-3 closing operator batch: SCD2
dimension build, running COUNT(DISTINCT) window, local clustering
coefficient, BM25 ranked retrieval, and document-outline extraction.

Tiny hand-crafted inputs pin the edge cases (equal-ts ties, consecutive
repeats, pendant nodes, tf saturation vs length normalization, unclosed
heading chains); DuckDB equivalence at sf scale is
tools/check_oracle.py's job.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from htmlparsersharp_ray.pipelines import relational as r

OPEN_END = np.iinfo(np.int64).max


def _write(tmp_path, name: str, table: pa.Table) -> str:
    pq.write_table(table, str(tmp_path / f"{name}.parquet"))
    return str(tmp_path)


def _events(ids, users, types, ts):
    return pa.table({
        "event_id": pa.array(ids, pa.int64()),
        "user_id": pa.array(users, pa.int64()),
        "event_type": pa.array(types, pa.string()),
        "ts": pa.array(pd.to_datetime(ts), pa.timestamp("us")),
    })


class TestEventsScd2:
    def test_change_compression_and_intervals(self, ray_session, tmp_path):
        """Consecutive repeats merge into one version; valid_to chains
        to the NEXT CHANGE's ts (not the next event's); the last
        version is open-ended."""
        _write(tmp_path, "events", _events(
            ids=[1, 2, 3, 4, 5],
            users=[7, 7, 7, 7, 7],
            types=["a", "a", "b", "b", "a"],
            ts=["2024-01-01 00:00", "2024-01-01 01:00",
                "2024-01-01 02:00", "2024-01-01 03:00",
                "2024-01-01 04:00"],
        ))
        out = r.q_events_scd2(str(tmp_path))
        assert out["version"].tolist() == [1, 2, 3]
        assert out["event_type"].tolist() == ["a", "b", "a"]
        t0 = pd.Timestamp("2024-01-01 00:00").value // 1000
        t2 = pd.Timestamp("2024-01-01 02:00").value // 1000
        t4 = pd.Timestamp("2024-01-01 04:00").value // 1000
        assert out["valid_from_us"].tolist() == [t0, t2, t4]
        assert out["valid_to_us"].tolist() == [t2, t4, OPEN_END]

    def test_equal_ts_tie_breaks_on_event_id(self, ray_session, tmp_path):
        """Two changes at the SAME timestamp order by event_id — the
        lower id's version closes at the shared instant (empty
        interval), matching the oracle's window ORDER BY ts, event_id."""
        _write(tmp_path, "events", _events(
            ids=[10, 11], users=[1, 1], types=["x", "y"],
            ts=["2024-01-01", "2024-01-01"],
        ))
        out = r.q_events_scd2(str(tmp_path))
        t = pd.Timestamp("2024-01-01").value // 1000
        assert out["event_type"].tolist() == ["x", "y"]
        assert out["valid_to_us"].tolist() == [t, OPEN_END]

    def test_users_are_independent(self, ray_session, tmp_path):
        """Versions restart per user; single-event users get one
        open-ended version."""
        _write(tmp_path, "events", _events(
            ids=[1, 2, 3], users=[1, 2, 1], types=["a", "a", "b"],
            ts=["2024-01-01", "2024-01-02", "2024-01-03"],
        ))
        out = r.q_events_scd2(str(tmp_path))
        assert out[out["user_id"] == 2]["version"].tolist() == [1]
        assert out[out["user_id"] == 2]["valid_to_us"].tolist() == [OPEN_END]
        assert out[out["user_id"] == 1]["version"].tolist() == [1, 2]


class TestEventsDistinctRunning:
    def test_repeats_do_not_increment(self, ray_session, tmp_path):
        _write(tmp_path, "events", _events(
            ids=[1, 2, 3, 4, 5],
            users=[1, 1, 1, 1, 1],
            types=["a", "a", "b", "a", "c"],
            ts=["2024-01-01 00:00", "2024-01-01 01:00",
                "2024-01-01 02:00", "2024-01-01 03:00",
                "2024-01-01 04:00"],
        ))
        out = r.q_events_distinct_running(str(tmp_path))
        assert out["n_types"].tolist() == [1, 1, 2, 2, 3]

    def test_per_user_and_equal_ts_order(self, ray_session, tmp_path):
        """Counts reset per user; equal-ts rows order by event_id, so
        the lower id sees the smaller running count."""
        _write(tmp_path, "events", _events(
            ids=[21, 20, 30], users=[1, 1, 2], types=["a", "b", "z"],
            ts=["2024-01-01", "2024-01-01", "2024-01-01"],
        ))
        out = r.q_events_distinct_running(str(tmp_path))
        u1 = out[out["user_id"] == 1]
        assert u1["event_id"].tolist() == [20, 21]  # id order at equal ts
        assert u1["n_types"].tolist() == [1, 2]
        assert out[out["user_id"] == 2]["n_types"].tolist() == [1]


class TestPartClusteringCoeff:
    def test_triangle_plus_pendant(self, ray_session, tmp_path):
        """Order {1,2,3} makes a triangle, order {3,4} a pendant edge:
        nodes 1,2 have cc=1.0, node 3 (deg 3, one closed pair of three)
        has cc=1/3, node 4 (deg 1) is excluded."""
        _write(tmp_path, "lineitem", pa.table({
            "l_orderkey": pa.array([100, 100, 100, 200, 200], pa.int64()),
            "l_partkey": pa.array([1, 2, 3, 3, 4], pa.int64()),
        }))
        out = r.q_part_clustering_coeff(str(tmp_path))
        assert out["node"].tolist() == [1, 2, 3]  # deg-1 node 4 excluded
        assert out["deg"].tolist() == [2, 2, 3]
        assert out["triangles"].tolist() == [1, 1, 1]
        assert out["cc"].tolist() == [1.0, 1.0, 2.0 / 6.0]

    def test_triangle_free_nodes_report_zero(self, ray_session, tmp_path):
        """A path graph (no triangles) still reports every deg>=2 node,
        with cc exactly 0.0."""
        _write(tmp_path, "lineitem", pa.table({
            "l_orderkey": pa.array([1, 1, 2, 2], pa.int64()),
            "l_partkey": pa.array([5, 6, 6, 7], pa.int64()),
        }))
        out = r.q_part_clustering_coeff(str(tmp_path))
        assert out["node"].tolist() == [6]
        assert out["triangles"].tolist() == [0]
        assert out["cc"].tolist() == [0.0]


class TestDocsBm25:
    def _dirs(self, tmp_path, texts):
        return _write(tmp_path, "documents", pa.table({
            "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }))

    def test_ranking_semantics(self, ray_session, tmp_path):
        """Multi-term coverage beats a saturated single term; the
        no-term doc is absent; ranks are 1..n_matched."""
        d = self._dirs(tmp_path, [
            "join join join join",      # saturated single term
            "join hash vector x",       # one of each (two rare terms)
            "join",                     # short doc, single hit
            "filler filler",            # no query terms
        ])
        out = r.q_docs_bm25(d)
        assert out["doc_id"].tolist() == [2, 1, 3]
        assert out["rank"].tolist() == [1, 2, 3]
        assert (np.diff(out["score"].to_numpy()) < 0).all()

    def test_score_formula_exact(self, ray_session, tmp_path):
        """The engine's score equals the BM25 expression computed
        directly (k1=1.2, b=0.75, idf N/df), bitwise."""
        d = self._dirs(tmp_path, ["join join hash", "join y", "z z z z"])
        out = r.q_docs_bm25(d)
        # corpus: N=3, T=9, avgdl=3; df(join)=2, df(hash)=1
        avgdl = 9.0 / 3.0

        def sat(tf, dl):
            return (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))

        exp_doc1 = (3.0 / 2.0) * sat(2.0, 3.0) + (3.0 / 1.0) * sat(1.0, 3.0)
        exp_doc2 = (3.0 / 2.0) * sat(1.0, 2.0)
        got = dict(zip(out["doc_id"], out["score"]))
        assert got[1] == exp_doc1
        assert got[2] == exp_doc2
        assert 3 not in got

    def test_identical_docs_tie_break_doc_id(self, ray_session, tmp_path):
        d = self._dirs(tmp_path, ["hash q", "hash q"])
        out = r.q_docs_bm25(d)
        assert out["doc_id"].tolist() == [1, 2]
        assert out["score"].iloc[0] == out["score"].iloc[1]

    def test_top_k_cut(self, ray_session, tmp_path):
        """More matches than k: exactly k rows, highest scores kept
        (tf-graded docs of equal length rank by tf)."""
        texts = [("join " * (i + 1)).strip() + " pad" * 0 for i in range(12)]
        d = self._dirs(tmp_path, texts)
        out = r.q_docs_bm25(d, k=10)
        assert len(out) == 10
        # higher tf (later doc_id here) -> higher saturated score… but
        # longer dl too; with tf growing 1:1 with dl the score is still
        # strictly increasing in tf, so docs 12..3 survive the cut
        assert set(out["doc_id"]) == set(range(3, 13))


class TestExtractHeadings:
    """Pure-function round trip (no Ray) — the Ray wiring is exercised
    by the driver query and check_oracle."""

    def _orders(self, keys):
        n = len(keys)
        return pa.table({
            "o_orderkey": pa.array(keys, pa.int64()),
            "o_orderstatus": pa.array(["F"] * n),
            "o_orderpriority": pa.array(["1-URGENT"] * n),
            "o_totalprice": pa.array([123.45] * n),
        })

    def test_three_styles_same_outline(self):
        from htmlparsersharp_ray.stages.structured import (
            OutlineExtractUDF, render_order_outlines)

        out = OutlineExtractUDF()(
            render_order_outlines(self._orders([3, 4, 5]))).to_pandas()
        for k in (3, 4, 5):
            rows = out[out["o_orderkey"] == k]
            assert rows["seq"].tolist() == [1, 2, 3, 4]
            assert rows["level"].tolist() == [1, 2, 3, 2]
            assert rows["heading"].tolist() == [
                f"Order {k}", "Status F", "Priority 1-URGENT",
                "Total 12345"]
            assert rows["path"].tolist() == [
                "", f"Order {k}", f"Order {k} > Status F", f"Order {k}"]

    def test_unclosed_chain_yields_siblings(self):
        """Style 1 (key % 3 == 1) renders the UNCLOSED heading chain —
        the h1-h6 pop rule must make the headings siblings: nesting
        would leak later headings' text into element_text(h1)."""
        from htmlparsersharp_ray.html.dom import Element
        from htmlparsersharp_ray.html.parser import parse
        from htmlparsersharp_ray.stages.structured import (
            render_order_outlines)

        html = render_order_outlines(
            self._orders([1])).column("html").to_pylist()[0]
        assert "</h1>" not in html and "</h2>" not in html
        root = parse(html).root
        body = root.children[-1].children[-1]
        names = [c.name for c in body.children if isinstance(c, Element)]
        assert names == ["h1", "h2", "h3", "h2"]
