"""Semantics tests for the all-pairs KS drift matrix: pairwise exact
numerators against a brute-force ECDF reference, identical
distributions scoring zero, and the pair count |S| choose 2.
"""

from __future__ import annotations

import itertools

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from htmlparsersharp_ray.pipelines import relational as r


def _write_docs(tmp_path, sources, lens):
    n = len(sources)
    t = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(["x" * int(v) for v in lens]),
        "lang": pa.array(["en"] * n),
        "source": pa.array(sources),
        "n_chars": pa.array([int(v) for v in lens], pa.int64()),
    })
    tmp_path.mkdir(parents=True, exist_ok=True)
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _ref_pair(a_vals, b_vals):
    a = np.asarray(a_vals, dtype=np.int64)
    b = np.asarray(b_vals, dtype=np.int64)
    n1, n2 = len(a), len(b)
    best = 0
    for v in np.unique(np.concatenate([a, b])):
        dn = abs(int((a <= v).sum()) * n2 - int((b <= v).sum()) * n1)
        best = max(best, dn)
    return n1, n2, best


class TestSourceDrift:
    def test_identical_distributions_zero(self, tmp_path,
                                          ray_session):
        sources = ["s1"] * 4 + ["s2"] * 4
        lens = [10, 20, 30, 40] * 2
        sf = _write_docs(tmp_path / "a", sources, lens)
        out = r.q_docs_source_drift(sf)
        assert len(out) == 1
        assert int(out.iloc[0]["d_num"]) == 0

    def test_pairwise_vs_bruteforce(self, tmp_path, ray_session):
        rng = np.random.default_rng(321)
        sources, lens = [], []
        data = {}
        for i, shiftv in enumerate((0, 15, 40, 100)):
            vals = (rng.integers(10, 60, size=25) + shiftv).tolist()
            data[f"s{i}"] = vals
            sources += [f"s{i}"] * len(vals)
            lens += vals
        sf = _write_docs(tmp_path / "b", sources, lens)
        out = r.q_docs_source_drift(sf)
        assert len(out) == 6  # C(4, 2)
        for _, row in out.iterrows():
            n1, n2, dn = _ref_pair(data[row["src_a"]],
                                   data[row["src_b"]])
            assert (int(row["n_a"]), int(row["n_b"]),
                    int(row["d_num"])) == (n1, n2, dn)
            assert row["src_a"] < row["src_b"]

    def test_disjoint_supports_maximal(self, tmp_path, ray_session):
        sources = ["lo"] * 3 + ["hi"] * 5
        lens = [10, 11, 12, 500, 501, 502, 503, 504]
        sf = _write_docs(tmp_path / "c", sources, lens)
        out = r.q_docs_source_drift(sf)
        # fully separated => D = 1 => d_num = n_a * n_b
        assert int(out.iloc[0]["d_num"]) == 15

    def test_single_source_empty(self, tmp_path, ray_session):
        sf = _write_docs(tmp_path / "d", ["only"] * 3, [5, 6, 7])
        out = r.q_docs_source_drift(sf)
        assert len(out) == 0
