"""Semantics tests for the seventh late-round-3 batch: definition-list
extraction (`extract_dl` — the dd/dt implied-end-tag round trip) and
kNN-distance outlier mining (`q_embeddings_outliers`).
"""

from __future__ import annotations

import importlib.util

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from htmlparsersharp_ray.pipelines import relational as r
from htmlparsersharp_ray.stages.structured import (
    DlExtractUDF,
    render_part_dls,
)


def _entry():
    spec = importlib.util.spec_from_file_location(
        "__ray_entry___dl", "/root/repo/__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _part_table(keys, brands, types, sizes):
    return pa.table({
        "p_partkey": pa.array(keys, pa.int64()),
        "p_name": pa.array(["p"] * len(keys)),
        "p_brand": pa.array(brands),
        "p_type": pa.array(types),
        "p_size": pa.array(sizes, pa.int32()),
        "p_retailprice": pa.array([1.0] * len(keys)),
    })


class TestExtractDl:
    def test_all_styles_converge(self, ray_session):
        # keys 0,1,2 hit the three styles; same logical content
        t = _part_table([0, 1, 2], ["B#1"] * 3,
                        ["STANDARD ANODIZED BRASS"] * 3, [7] * 3)
        rendered = render_part_dls(
            t.select(["p_partkey", "p_brand", "p_type", "p_size"]))
        out = DlExtractUDF()(rendered).to_pandas()
        for k in (0, 1, 2):
            g = (out[out["p_partkey"] == k]
                 .sort_values("term").reset_index(drop=True))
            assert list(g["term"]) == ["brand", "size", "type"]
            assert list(g["definition"]) == \
                ["B#1", "7", "STANDARD ANODIZED BRASS"]

    def test_implied_end_tags_are_load_bearing(self):
        # style-1 markup parses into SIBLING dt/dd under the dl — if
        # the parser nested unclosed elements, the first dd would
        # contain the remaining terms
        from htmlparsersharp_ray.html.dom import Element
        from htmlparsersharp_ray.html.parser import parse
        from htmlparsersharp_ray.stages.structured import element_text

        root = parse("<dl id=p-9><dt>a<dd>1<dt>b<dd>2</dl>").root
        stack, dl = [root], None
        while stack:
            n = stack.pop()
            if isinstance(n, Element) and n.name == "dl":
                dl = n
                break
            stack.extend(n.children)
        names = [c.name for c in dl.children
                 if isinstance(c, Element)]
        assert names == ["dt", "dd", "dt", "dd"]
        texts = [element_text(c) for c in dl.children
                 if isinstance(c, Element)]
        assert texts == ["a", "1", "b", "2"]

    def test_decoys_do_not_extract(self, ray_session):
        t = _part_table([1], ["B"], ["T"], [1])
        rendered = render_part_dls(
            t.select(["p_partkey", "p_brand", "p_type", "p_size"]))
        out = DlExtractUDF()(rendered).to_pandas()
        # exactly the three real pairs; orphan dt emits nothing
        assert len(out) == 3
        assert "orphan term" not in set(out["term"])


class TestEmbeddingsOutliers:
    def _write(self, tmp_path, mat):
        t = pa.table({
            "vec_id": pa.array(range(len(mat)), pa.int64()),
            "embedding": pa.array([list(map(float, row))
                                   for row in mat],
                                  pa.list_(pa.float32())),
            "label": pa.array([0] * len(mat), pa.int32()),
        })
        tmp_path.mkdir(parents=True, exist_ok=True)
        pq.write_table(t, str(tmp_path / "embeddings.parquet"),
                       row_group_size=16)
        return str(tmp_path)

    def test_bruteforce_reference(self, tmp_path, ray_session):
        rng = np.random.default_rng(23)
        mat = rng.normal(size=(60, 4)) * 0.2
        mat[13] += 3.0  # planted far outlier
        out = r.q_embeddings_outliers(self._write(tmp_path, mat))
        SCALE = float(1 << 20)
        vq = np.rint(np.asarray(
            [list(map(float, np.asarray(row, dtype=np.float32)))
             for row in mat], dtype=np.float64) * SCALE).astype(np.int64)
        want = []
        for i in range(len(vq)):
            d = sorted(int(((vq[i] - vq[j]) ** 2).sum())
                       for j in range(len(vq)) if j != i)
            want.append((i, d[4]))
        want.sort(key=lambda t: (-t[1], t[0]))
        want = want[:20]
        got = list(zip(out["vec_id"].astype(int),
                       out["dist_k"].astype(int)))
        assert got == want
        assert got[0][0] == 13  # the planted outlier ranks first
