"""Semantics tests for the per-source hapax census: hapax-ness is a
property of the GLOBAL per-source term count (must survive the term
living in many batches/docs), tokenization is the corpus convention.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from htmlparsersharp_ray.pipelines import relational as r


def _write_docs(tmp_path, sources, texts):
    n = len(texts)
    t = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * n),
        "source": pa.array(sources),
        "n_chars": pa.array([len(x) for x in texts], pa.int64()),
    })
    tmp_path.mkdir(parents=True, exist_ok=True)
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


class TestDocsHapax:
    def test_cross_doc_counts_defeat_local_hapax(self, tmp_path,
                                                 ray_session):
        # 'shared' appears once in each of two docs of srcA => c=2,
        # NOT a hapax; 'only' appears once overall => hapax
        sf = _write_docs(tmp_path / "a",
                         ["srcA", "srcA"],
                         ["shared only word word",
                          "shared word again"])
        out = r.q_docs_hapax(sf).set_index("source")
        # vocab: shared, only, word, again
        assert int(out.loc["srcA", "vocab"]) == 4
        # hapax: only, again (word appears 3x, shared 2x)
        assert int(out.loc["srcA", "hapax"]) == 2
        assert int(out.loc["srcA", "n_tokens"]) == 7

    def test_per_source_isolation(self, tmp_path, ray_session):
        # 'term' once in each source => hapax in BOTH independently
        sf = _write_docs(tmp_path / "b",
                         ["s1", "s2"],
                         ["term alpha alpha", "term beta beta"])
        out = r.q_docs_hapax(sf).set_index("source")
        assert int(out.loc["s1", "hapax"]) == 1
        assert int(out.loc["s2", "hapax"]) == 1

    def test_case_folding_and_empty_docs(self, tmp_path, ray_session):
        sf = _write_docs(tmp_path / "c",
                         ["s", "s", "s"],
                         ["Word word WORD", "   ", "unique"])
        out = r.q_docs_hapax(sf).set_index("source")
        assert int(out.loc["s", "vocab"]) == 2
        assert int(out.loc["s", "hapax"]) == 1  # 'unique'
        assert int(out.loc["s", "n_tokens"]) == 4

    def test_empty_corpus(self, tmp_path, ray_session):
        sf = _write_docs(tmp_path / "d", [], [])
        out = r.q_docs_hapax(sf)
        assert len(out) == 0
        assert list(out.columns) == ["source", "vocab", "hapax",
                                     "n_tokens"]
