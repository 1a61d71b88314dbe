"""Semantics tests for longest_dup_span: the binary search over span
length must land on the exact maximum cross-doc duplicated word-gram
length, with span count and lexicographic tie-break verified against a
brute force that enumerates every gram of every length.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from htmlparsersharp_ray.stages.dedup import longest_dup_span


def _docs_ds(texts):
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    })
    return ray.data.from_arrow(t)


def _ref(texts, min_len=8):
    toks = [(t or "").split() for t in texts]
    best, spans = None, set()
    max_nw = max((len(ws) for ws in toks), default=0)
    for L in range(min_len, max_nw + 1):
        seen = {}
        for did, ws in enumerate(toks):
            for i in range(len(ws) - L + 1):
                g = " ".join(ws[i:i + L])
                seen.setdefault(g, set()).add(did)
        dup = {g for g, ds in seen.items() if len(ds) >= 2}
        if dup:
            best, spans = L, dup
    if best is None:
        return None
    return best, len(spans), min(spans)


class TestLongestDupSpan:
    def test_planted_long_span(self, ray_session):
        shared = " ".join(f"w{i}" for i in range(20))
        texts = [
            "alpha beta " + shared + " gamma",
            "delta " + shared + " epsilon zeta",
            "unrelated " + " ".join(f"x{i}" for i in range(30)),
        ]
        out = longest_dup_span(_docs_ds(texts), min_len=8)
        assert tuple(out.iloc[0]) == _ref(texts)
        assert int(out.iloc[0]["max_len"]) == 20

    def test_tie_break_lexicographic(self, ray_session):
        a = " ".join(f"a{i}" for i in range(10))
        b = " ".join(f"b{i}" for i in range(10))
        texts = [a + " sep1 " + b,
                 a + " sep2 " + b,
                 "filler " + " ".join(f"z{i}" for i in range(12))]
        out = longest_dup_span(_docs_ds(texts), min_len=8)
        ref = _ref(texts)
        assert tuple(out.iloc[0]) == ref
        assert out.iloc[0]["n_spans"] == 2
        assert out.iloc[0]["span_text"].startswith("a0 ")

    def test_no_dup_returns_empty(self, ray_session):
        texts = [" ".join(f"u{i}" for i in range(15)),
                 " ".join(f"v{i}" for i in range(15))]
        out = longest_dup_span(_docs_ds(texts), min_len=8)
        assert len(out) == 0
        assert list(out.columns) == ["max_len", "n_spans", "span_text"]

    def test_within_doc_repeat_does_not_count(self, ray_session):
        # the same 10-gram twice in ONE doc is not a cross-doc dup
        block = " ".join(f"r{i}" for i in range(10))
        texts = [block + " mid " + block,
                 " ".join(f"s{i}" for i in range(12))]
        out = longest_dup_span(_docs_ds(texts), min_len=8)
        assert len(out) == 0

    def test_exact_boundary_at_min_len(self, ray_session):
        shared = " ".join(f"m{i}" for i in range(8))
        texts = ["p1 " + shared + " q1",
                 "p2 " + shared + " q2"]
        out = longest_dup_span(_docs_ds(texts), min_len=8)
        assert tuple(out.iloc[0]) == _ref(texts)
        assert int(out.iloc[0]["max_len"]) == 8

    def test_whole_doc_duplicate(self, ray_session):
        body = " ".join(f"d{i}" for i in range(25))
        texts = [body, body, "other words only here repeated never"]
        out = longest_dup_span(_docs_ds(texts), min_len=8)
        assert tuple(out.iloc[0]) == (25, 1, body)

    def test_randomized_vs_bruteforce(self, ray_session):
        rng = np.random.default_rng(99)
        vocab = [f"t{i}" for i in range(12)]  # small vocab => dups
        texts = [" ".join(rng.choice(vocab, size=40).tolist())
                 for _ in range(6)]
        out = longest_dup_span(_docs_ds(texts), min_len=8)
        ref = _ref(texts)
        if ref is None:
            assert len(out) == 0
        else:
            assert tuple(out.iloc[0]) == ref
