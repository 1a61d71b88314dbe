"""Semantics tests for the SRM guardrail (`q_events_srm`) and the
language-ID confusion matrix (`docs_langid_confusion`).
"""

from __future__ import annotations

import importlib.util

import pyarrow as pa
import pyarrow.parquet as pq

from htmlparsersharp_ray.pipelines import relational as r


def _entry():
    spec = importlib.util.spec_from_file_location(
        "__ray_entry___srm", "/root/repo/__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_events_users(tmp_path, user_ids):
    n = len(user_ids)
    t = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array([1_700_000_000_000_000 + i for i in range(n)],
                       pa.timestamp("us")),
        "user_id": pa.array(user_ids, pa.int64()),
        "event_type": pa.array(["view"] * n),
        "value": pa.array([1.0] * n),
        "props": pa.array(["{}"] * n),
    })
    tmp_path.mkdir(parents=True, exist_ok=True)
    pq.write_table(t, str(tmp_path / "events.parquet"),
                   row_group_size=3)
    return str(tmp_path)


class TestSrm:
    def test_distinct_user_counts(self, tmp_path, ray_session):
        # users 0,2,4 even (3); 1,3 odd (2) — repeated events must
        # not inflate the assignment counts
        uids = [0, 2, 4, 1, 3, 0, 0, 1, 2]
        out = r.q_events_srm(_write_events_users(tmp_path / "x",
                                                 uids))
        assert int(out["n_a"].iloc[0]) == 3
        assert int(out["n_b"].iloc[0]) == 2
        assert int(out["srm_scaled"].iloc[0]) == (1 * (1 << 20)) // 5

    def test_balanced_split_zero(self, tmp_path, ray_session):
        out = r.q_events_srm(
            _write_events_users(tmp_path / "b", [0, 1, 2, 3]))
        assert int(out["srm_scaled"].iloc[0]) == 0


class TestLangidConfusion:
    def test_counts_match_langid(self, tmp_path, ray_session):
        texts = ["the cat sat on the mat and it is fine",
                 "der hund ist ein tier und das ist gut",
                 "le chat est dans la maison pour dormir",
                 "zz yy xx"]
        langs = ["en", "en", "fr", "de"]
        t = pa.table({
            "doc_id": pa.array(range(4), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(langs),
            "source": pa.array(["s"] * 4),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        })
        tmp_path.mkdir(parents=True, exist_ok=True)
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        conf = _entry().queries()["docs_langid_confusion"](
            str(tmp_path))
        got = {(row["lang"], row["lang_pred"]): int(row["n"])
               for _, row in conf.iterrows()}
        # doc0 en->en, doc1 en->de (German stopwords), doc2 fr->fr,
        # doc3 de->en (zero stopword hits fall back to en)
        assert got == {("en", "en"): 1, ("en", "de"): 1,
                       ("fr", "fr"): 1, ("de", "en"): 1}
        assert sum(got.values()) == 4
