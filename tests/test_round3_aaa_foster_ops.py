"""Semantics tests for the eighth late-round-3 batch: adoption-agency
round trip (`extract_formatting`), foster-parenting round trip
(`extract_foster`), and the nearest-centroid calibration table
(`q_embeddings_calibration`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from htmlparsersharp_ray.pipelines import relational as r
from htmlparsersharp_ray.stages.structured import (
    FormattingExtractUDF,
    FosterExtractUDF,
    render_customer_formatting,
    render_supplier_fosters,
)


class TestExtractFormatting:
    def test_all_styles_converge(self, ray_session):
        t = pa.table({
            "c_custkey": pa.array([0, 1, 2], pa.int64()),
            "c_name": pa.array(["Customer#9"] * 3),
            "c_mktsegment": pa.array(["MACHINERY"] * 3),
            "c_nationkey": pa.array([7] * 3, pa.int32()),
        })
        out = FormattingExtractUDF()(
            render_customer_formatting(t)).to_pandas()
        for k in (0, 1, 2):
            g = out[out["c_custkey"] == k].iloc[0]
            assert g["bold_text"] == "Customer#9MACHINERY"
            assert g["italic_text"] == "MACHINERYnation 7"
            assert g["plain_text"] == f"plain {k}"

    def test_adoption_agency_is_load_bearing(self):
        # the misnested style must put C under an <i> OUTSIDE <b>
        from htmlparsersharp_ray.html.dom import Element, Text
        from htmlparsersharp_ray.html.parser import parse

        root = parse("<p id=c-1><b>A<i>B</b>C</i>P</p>").root

        def collect(node, in_b, in_i, acc):
            for ch in node.children:
                if isinstance(ch, Text):
                    acc.append((ch.data, in_b, in_i))
                else:
                    collect(ch, in_b or ch.name == "b",
                            in_i or ch.name == "i", acc)

        acc = []
        collect(root, False, False, acc)
        got = {t: (b, i) for t, b, i in acc}
        assert got["A"] == (True, False)
        assert got["B"] == (True, True)
        assert got["C"] == (False, True)   # AAA split the <i>
        assert got["P"] == (False, False)


class TestExtractFoster:
    def test_all_styles_converge(self, ray_session):
        t = pa.table({
            "s_suppkey": pa.array([0, 1, 2], pa.int64()),
            "s_name": pa.array(["Supplier#5"] * 3),
            "s_nationkey": pa.array([3] * 3, pa.int32()),
        })
        out = FosterExtractUDF()(render_supplier_fosters(t)).to_pandas()
        for k in (0, 1, 2):
            g = out[out["s_suppkey"] == k].iloc[0]
            assert g["fostered"] == "note Supplier#5"
            assert g["cell"] == "acct 3"

    def test_foster_is_load_bearing(self):
        # the note written inside <table> must NOT remain inside it
        from htmlparsersharp_ray.html.dom import Element, Text
        from htmlparsersharp_ray.html.parser import parse

        root = parse("<table id=t-1>note<tr><td>cell</table>").root

        def table_text(node):
            if isinstance(node, Element) and node.name == "table":
                parts = []
                stack = list(node.children)
                while stack:
                    c = stack.pop()
                    if isinstance(c, Text):
                        parts.append(c.data)
                    else:
                        stack.extend(c.children)
                return "".join(parts)
            for ch in node.children:
                got = table_text(ch)
                if got is not None:
                    return got
            return None

        assert table_text(root) == "cell"  # note fostered OUT


class TestCalibration:
    def test_consistent_with_predictions(self, tmp_path, ray_session):
        rng = np.random.default_rng(29)
        n, d = 160, 4
        centers = rng.normal(size=(3, d))
        labels = rng.integers(0, 3, size=n)
        mat = centers[labels] + rng.normal(size=(n, d)) * 0.4
        t = pa.table({
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([list(map(float, row))
                                   for row in mat],
                                  pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        })
        tmp_path.mkdir(parents=True, exist_ok=True)
        pq.write_table(t, str(tmp_path / "embeddings.parquet"),
                       row_group_size=16)
        sf = str(tmp_path)
        cal = r.q_embeddings_calibration(sf)
        preds = r._nc_predictions(sf)
        assert int(cal["n"].sum()) == len(preds) == (n + 1) // 2
        # regroup the raw predictions -> identical table
        preds = preds.copy()
        preds["mb"] = [int(m).bit_length() for m in preds["margin"]]
        preds["ok"] = (preds["true_label"]
                       == preds["pred_label"]).astype(int)
        want = (preds.groupby("mb")
                .agg(n=("ok", "size"), c=("ok", "sum")))
        got = {int(row["margin_bin"]): (int(row["n"]),
                                        int(row["n_correct"]))
               for _, row in cal.iterrows()}
        assert got == {int(mb): (int(r2["n"]), int(r2["c"]))
                       for mb, r2 in want.iterrows()}
        # big-margin buckets should not be LESS accurate than the
        # smallest-margin bucket (weak monotonicity sanity)
        bins = sorted(got)
        lo_acc = got[bins[0]][1] / got[bins[0]][0]
        hi_acc = got[bins[-1]][1] / got[bins[-1]][0]
        assert hi_acc >= lo_acc
