"""Semantics tests for the growth/accounting operator batch: weekly
churn waterfall, Heaps'-law vocabulary growth, and code-block
extraction (the <pre> leading-LF rule as a graded surface).

Tiny hand-crafted inputs pin the edge cases (gap weeks, last-week
churn, decile boundaries, decoy <pre>/<code> blocks, style
invariance); DuckDB equivalence at sf scale is tools/check_oracle.py's
job.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from htmlparsersharp_ray.pipelines import relational as r

WEEK_US = 7 * 86400 * 10**6


def _write(tmp_path, name: str, table: pa.Table) -> str:
    pq.write_table(table, str(tmp_path / f"{name}.parquet"))
    return str(tmp_path)


def _events_weeks(users_weeks):
    """users_weeks: list of (user_id, week_number) activity marks."""
    users = [u for u, _ in users_weeks]
    ts = [w * WEEK_US + 1000 for _, w in users_weeks]
    return pa.table({
        "event_id": pa.array(range(len(users)), pa.int64()),
        "user_id": pa.array(users, pa.int64()),
        "event_type": pa.array(["e"] * len(users), pa.string()),
        "ts": pa.array(pd.to_datetime(ts, unit="us"), pa.timestamp("us")),
    })


class TestEventsChurn:
    def test_waterfall(self, ray_session, tmp_path):
        """User 1 active weeks 0,1,3 (gap churns at 2 — dropped, no
        corpus activity — and retains nothing at 3); user 2 active
        week 1 only (churns at 2, also dropped)."""
        _write(tmp_path, "events", _events_weeks(
            [(1, 0), (1, 1), (1, 3), (2, 1)]))
        out = r.q_events_churn(str(tmp_path))
        out = out.set_index("week")
        assert out.index.tolist() == [0, 1, 3]
        assert out.loc[0].tolist() == [1, 1, 0, 0]   # active,new,ret,churn
        assert out.loc[1].tolist() == [2, 1, 1, 0]
        # week 3: user 1 returns (not retained — week 2 inactive);
        # churn at week 3 counts users active at 2 (= none)
        assert out.loc[3].tolist() == [1, 0, 0, 0]

    def test_churn_in_active_week(self, ray_session, tmp_path):
        """User 2 stops after week 0 while user 1 keeps week 1 active:
        week 1 shows the churn."""
        _write(tmp_path, "events", _events_weeks(
            [(1, 0), (1, 1), (2, 0)]))
        out = r.q_events_churn(str(tmp_path)).set_index("week")
        assert out.loc[1, "n_churned"] == 1
        assert out.loc[1, "n_retained"] == 1
        assert out.loc[1, "n_new"] == 0

    def test_duplicate_events_one_mark(self, ray_session, tmp_path):
        """Many events in one (user, week) count once everywhere."""
        _write(tmp_path, "events", _events_weeks(
            [(1, 0), (1, 0), (1, 0), (1, 1), (1, 1)]))
        out = r.q_events_churn(str(tmp_path)).set_index("week")
        assert out["n_active"].tolist() == [1, 1]
        assert out.loc[1, "n_retained"] == 1


class TestDocsVocabGrowth:
    def _docs(self, texts):
        return pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        })

    def test_cumulative_first_occurrence(self, ray_session, tmp_path):
        """10 docs = one per decile; a word repeated later never counts
        again; always exactly 10 output rows."""
        texts = ["a b", "a c", "c", "d", "a", "a", "a", "a", "a", "e"]
        _write(tmp_path, "documents", self._docs(texts))
        out = r.q_docs_vocab_growth(str(tmp_path))
        assert out["decile"].tolist() == list(range(1, 11))
        # new words: doc0 {a,b}=2, doc1 {c}=1, doc3 {d}=1, doc9 {e}=1
        assert out["vocab_size"].tolist() == [2, 3, 3, 4, 4, 4, 4, 4, 4, 5]

    def test_decile_boundary(self, ray_session, tmp_path):
        """5 docs: doc i lands in decile 2i+1 ((i*10)//5 + 1)."""
        texts = ["w0", "w1", "w2", "w3", "w4"]
        _write(tmp_path, "documents", self._docs(texts))
        out = r.q_docs_vocab_growth(str(tmp_path))
        assert out["vocab_size"].tolist() == [1, 1, 2, 2, 3, 3, 4, 4, 5, 5]

    def test_empty_docs(self, ray_session, tmp_path):
        """Whitespace-only docs contribute nothing but stay in the
        denominator."""
        texts = ["x", "  ", ""]
        _write(tmp_path, "documents", self._docs(texts))
        out = r.q_docs_vocab_growth(str(tmp_path))
        assert out["vocab_size"].tolist() == [1] * 10


class TestExtractCode:
    def _orders(self, keys, stats=None):
        n = len(keys)
        return pa.table({
            "o_orderkey": pa.array(keys, pa.int64()),
            "o_custkey": pa.array([c + 100 for c in range(n)], pa.int64()),
            "o_orderstatus": pa.array(stats or ["O"] * n, pa.string()),
            "o_orderpriority": pa.array(["1-URGENT"] * n, pa.string()),
        })

    def test_leading_lf_dropped_and_inner_lf_kept(self):
        """Style 0 renders <pre>\\n<code...>: the parser must drop that
        LF (code text starts with '#'), while the snippet's interior
        newlines survive."""
        from htmlparsersharp_ray.stages.structured import (
            CodeExtractUDF, _order_code, render_order_code)

        batch = render_order_code(self._orders([0]))  # 0 % 3 == 0
        assert "<pre>\n<code" in batch.column("html").to_pylist()[0]
        out = CodeExtractUDF()(batch)
        code = out.column("code").to_pylist()[0]
        assert code == _order_code(0, 100, "O", "1-URGENT")
        assert code.startswith("# order")
        assert code.count("\n") == 2

    def test_style_invariance(self):
        """All three styles (named entities / unquoted attrs / UPPER +
        numeric char refs) converge to the identical code string."""
        from htmlparsersharp_ray.stages.structured import (
            CodeExtractUDF, render_order_code)

        rows = self._orders([0, 1, 2], stats=["O", "F", "P"])
        out = CodeExtractUDF()(render_order_code(rows)).to_pandas()
        assert out["lang"].tolist() == ["python", "sql", "rust"]
        # same snippet shape modulo the embedded keys
        for _, row in out.iterrows():
            assert f'# order {row.o_orderkey} ' in row.code
            assert '< ' in row.code and '"?"' in row.code

    def test_decoys_do_not_extract(self):
        """One output row per order: the code-less <pre>, and style 1's
        inline <code>, never extract."""
        from htmlparsersharp_ray.stages.structured import (
            CodeExtractUDF, render_order_code)

        batch = render_order_code(self._orders([0, 1, 2]))
        html1 = batch.column("html").to_pylist()[1]
        assert "<code>inline()</code>" in html1  # decoy present in render
        out = CodeExtractUDF()(batch)
        assert out.num_rows == 3
        assert sorted(out.column("o_orderkey").to_pylist()) == [0, 1, 2]

    def test_entity_round_trip(self):
        """Named (&lt;) and numeric (&#60;/&#x3E;) references both
        decode to the raw specials in the extracted code."""
        from htmlparsersharp_ray.stages.structured import (
            CodeExtractUDF, render_order_code)

        batch = render_order_code(self._orders([3, 2]))  # styles 0 and 2
        htmls = batch.column("html").to_pylist()
        assert "&lt;" in htmls[0] and "&#60;" in htmls[1]
        out = CodeExtractUDF()(batch).to_pandas()
        for code in out["code"]:
            assert " < " in code and '"' in code and " & " in code
