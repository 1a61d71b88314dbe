"""Semantics tests for the census/inspection operator batch: graph
degree histogram, top-k user journey paths, and keyword-in-context
concordance.

Tiny hand-crafted inputs pin the edge cases (pendant/isolated nodes,
path truncation at k with ts/event_id ties, term at document
boundaries and adjacent occurrences); DuckDB equivalence at sf scale is
tools/check_oracle.py's job.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from htmlparsersharp_ray.pipelines import relational as r


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


def _lineitem(orders, parts):
    return pa.table({
        "l_orderkey": pa.array(orders, pa.int64()),
        "l_partkey": pa.array(parts, pa.int64()),
    })


def _docs(ids, texts):
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    })


class TestPartDegreeHist:
    def test_star_plus_pair(self, ray_session, tmp_path):
        """Order 1 = {1,2,3,4} (star-free clique: each node degree 3),
        order 2 = {5,6} (degree 1 each): histogram has exactly two
        rows."""
        _write(tmp_path, "lineitem", _lineitem(
            orders=[1, 1, 1, 1, 2, 2],
            parts=[1, 2, 3, 4, 5, 6],
        ))
        out = r.q_part_degree_hist(str(tmp_path))
        assert out["deg"].tolist() == [1, 3]
        assert out["n_nodes"].tolist() == [2, 4]

    def test_duplicate_edges_collapse(self, ray_session, tmp_path):
        """The same pair co-occurring in two orders (and a repeated
        part within one order) counts as ONE undirected edge."""
        _write(tmp_path, "lineitem", _lineitem(
            orders=[1, 1, 1, 2, 2],
            parts=[7, 8, 7, 7, 8],
        ))
        out = r.q_part_degree_hist(str(tmp_path))
        # one edge 7-8: both nodes degree 1
        assert out["deg"].tolist() == [1]
        assert out["n_nodes"].tolist() == [2]

    def test_isolated_parts_absent(self, ray_session, tmp_path):
        """A part that never co-occurs (sole item of its order) has no
        edges and does not appear (matches the SQL edge-list oracle)."""
        _write(tmp_path, "lineitem", _lineitem(
            orders=[1, 2, 2], parts=[9, 1, 2],
        ))
        out = r.q_part_degree_hist(str(tmp_path))
        assert out["n_nodes"].sum() == 2  # only parts 1 and 2


class TestEventsPaths:
    def test_truncation_and_tie_order(self, ray_session, tmp_path):
        """User 1 has 7 events — only the first 5 (ordered by ts, ties
        by event_id) form the path; user 2's 2 events form a short
        path."""
        _write(tmp_path, "events", _events(
            ids=[1, 2, 3, 4, 5, 6, 7, 10, 11],
            users=[1, 1, 1, 1, 1, 1, 1, 2, 2],
            types=["a", "b", "c", "d", "e", "f", "g", "x", "y"],
            ts=["2024-01-01 00:00"] * 2 + [
                "2024-01-01 01:00", "2024-01-01 02:00",
                "2024-01-01 03:00", "2024-01-01 04:00",
                "2024-01-01 05:00", "2024-01-02 00:00",
                "2024-01-03 00:00"],
        ))
        out = r.q_events_paths(str(tmp_path))
        got = dict(zip(out["path"], out["n_users"]))
        assert got == {"a>b>c>d>e": 1, "x>y": 1}

    def test_equal_ts_breaks_on_event_id(self, ray_session, tmp_path):
        """All events at one instant: path order is event_id order."""
        _write(tmp_path, "events", _events(
            ids=[3, 1, 2], users=[5, 5, 5], types=["c", "a", "b"],
            ts=["2024-01-01"] * 3,
        ))
        out = r.q_events_paths(str(tmp_path))
        assert out["path"].tolist() == ["a>b>c"]

    def test_paths_count_across_users(self, ray_session, tmp_path):
        """Two users with the identical prefix collapse to one row
        with n_users=2."""
        _write(tmp_path, "events", _events(
            ids=[1, 2, 3, 4],
            users=[1, 1, 2, 2],
            types=["a", "b", "a", "b"],
            ts=["2024-01-01", "2024-01-02"] * 2,
        ))
        out = r.q_events_paths(str(tmp_path))
        assert out["path"].tolist() == ["a>b"]
        assert out["n_users"].tolist() == [2]


class TestDocsKwic:
    def test_boundary_contexts(self, ray_session, tmp_path):
        """Term at doc start → empty left_ctx; at doc end → empty
        right_ctx; mid-doc gets up to 3 tokens each side."""
        _write(tmp_path, "documents", _docs(
            ids=[1, 2, 3],
            texts=["vector at the start here",
                   "ends with the word vector",
                   "one two three vector five six seven eight"],
        ))
        out = r.q_docs_kwic(str(tmp_path))
        rows = {r_.doc_id: r_ for r_ in out.itertuples()}
        assert rows[1].pos == 1 and rows[1].left_ctx == ""
        assert rows[1].right_ctx == "at the start"
        assert rows[2].pos == 5 and rows[2].right_ctx == ""
        assert rows[2].left_ctx == "with the word"
        assert rows[3].left_ctx == "one two three"
        assert rows[3].right_ctx == "five six seven"

    def test_adjacent_occurrences_and_case(self, ray_session, tmp_path):
        """Adjacent occurrences each get their own row (the other
        occurrence appears in context); matching is on the lowercased
        corpus convention."""
        _write(tmp_path, "documents", _docs(
            ids=[4], texts=["  Vector vector done  "],
        ))
        out = r.q_docs_kwic(str(tmp_path))
        assert out["pos"].tolist() == [1, 2]
        assert out["left_ctx"].tolist() == ["", "vector"]
        assert out["right_ctx"].tolist() == ["vector done", "done"]

    def test_no_hits_and_empty_docs(self, ray_session, tmp_path):
        """Docs without the term, empty and whitespace-only docs emit
        nothing; schema is stable on an empty result."""
        _write(tmp_path, "documents", _docs(
            ids=[1, 2, 3], texts=["no match here", "", "   "],
        ))
        out = r.q_docs_kwic(str(tmp_path))
        assert len(out) == 0
        assert list(out.columns) == ["doc_id", "pos", "left_ctx",
                                     "right_ctx"]

    def test_short_context_window(self, ray_session, tmp_path):
        """A doc shorter than the window clamps cleanly (no wraparound
        into the flat array's neighbors)."""
        _write(tmp_path, "documents", _docs(
            ids=[1, 2], texts=["zz zz zz zz zz zz", "a vector b"],
        ))
        out = r.q_docs_kwic(str(tmp_path))
        assert len(out) == 1
        assert out["left_ctx"].tolist() == ["a"]
        assert out["right_ctx"].tolist() == ["b"]
