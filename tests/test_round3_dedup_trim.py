"""Semantics tests for dedup_trim — the Lee-et-al exact-substring
REMOVAL step: word positions covered by cross-doc duplicate 8-gram
spans are dropped from BOTH copies and docs rebuild from survivors.

DuckDB equivalence at sf scale is tools/check_oracle.py's job
(verified hash-exact at sf0.01 and sf0.1).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import ray

from htmlparsersharp_ray.stages.dedup import dedup_trim


def _docs(tmp_path, texts):
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * len(texts)),
        "source": pa.array(["s"] * len(texts)),
        "n_chars": pa.array([len(x) for x in texts], pa.int64()),
    })
    tmp_path.mkdir(parents=True, exist_ok=True)
    p = tmp_path / "documents.parquet"
    pq.write_table(t, str(p))
    return ray.data.read_parquet(str(p))


SHARED = "alpha beta gamma delta epsilon zeta eta theta"  # 8 words


class TestDedupTrim:
    def test_both_copies_lose_the_shared_span(self, ray_session,
                                              tmp_path):
        texts = [
            f"unique one two {SHARED} tail1 tail2",
            f"other prefix words here {SHARED} suffix9",
            "completely different text with no overlap at all ok",
        ]
        out = dedup_trim(_docs(tmp_path, texts), n=8)
        by = {int(r.doc_id): r for r in out.itertuples()}
        assert by[0].text_trimmed == "unique one two tail1 tail2"
        assert by[1].text_trimmed == "other prefix words here suffix9"
        assert by[2].text_trimmed == texts[2]
        assert by[2].n_kept == 9

    def test_identical_docs_trim_to_empty(self, ray_session, tmp_path):
        texts = [SHARED + " iota kappa", SHARED + " iota kappa"]
        out = dedup_trim(_docs(tmp_path, texts), n=8)
        assert list(out["n_kept"]) == [0, 0]
        assert list(out["text_trimmed"]) == ["", ""]

    def test_within_doc_repeat_alone_is_kept(self, ray_session,
                                             tmp_path):
        # the 8-gram repeats INSIDE doc 0 only — cross-doc rule says
        # nothing is trimmed anywhere
        texts = [f"{SHARED} bridge {SHARED}",
                 "nothing in common with the first document here now"]
        out = dedup_trim(_docs(tmp_path, texts), n=8)
        assert list(out["n_kept"]) == [17, 9]
        assert out["text_trimmed"][0] == texts[0]

    def test_short_and_empty_docs_pass_through(self, ray_session,
                                               tmp_path):
        texts = ["only three words", "", "   ",
                 f"{SHARED} x", f"{SHARED} y"]
        out = dedup_trim(_docs(tmp_path, texts), n=8)
        by = {int(r.doc_id): r for r in out.itertuples()}
        assert by[0].text_trimmed == "only three words"
        assert by[1].n_kept == 0 and by[1].text_trimmed == ""
        assert by[2].n_kept == 0 and by[2].text_trimmed == ""
        # docs 3/4 share the 8-gram; only the trailing word survives
        assert by[3].text_trimmed == "x"
        assert by[4].text_trimmed == "y"

    def test_overlapping_spans_union(self, ray_session, tmp_path):
        # doc0 shares words 0..8 with doc1 (two overlapping 8-grams:
        # positions 0 and 1) — the union covers 9 positions, not 16
        nine = SHARED + " iota"
        texts = [f"{nine} private tail", f"{nine} different ending"]
        out = dedup_trim(_docs(tmp_path, texts), n=8)
        by = {int(r.doc_id): r for r in out.itertuples()}
        assert by[0].text_trimmed == "private tail"
        assert by[1].text_trimmed == "different ending"

    def test_whitespace_normalizes_to_single_space(self, ray_session,
                                                   tmp_path):
        texts = ["word1   word2\tword3", "unrelated other doc text"]
        out = dedup_trim(_docs(tmp_path, texts), n=8)
        assert out["text_trimmed"][0] == "word1 word2 word3"
