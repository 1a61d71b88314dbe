"""Round-4 oracle promotions: graded link-graph extraction
(extract_nav_links) and the media_meta generator-spec round trip.
The DuckDB equivalence itself is tools/check_oracle.py's job; these
pin the SEMANTICS on hand-built inputs.
"""

from __future__ import annotations

import pyarrow as pa

from htmlparsersharp_ray.stages.parse_stage import (
    LinkExtractUDF,
    render_nation_links,
)


def _extract(html: str):
    udf = LinkExtractUDF()
    out = udf(pa.table({
        "conv_id": pa.array(["c"]),
        "turn_idx": pa.array([0], pa.int64()),
        "text": pa.array([html]),
    }))
    return out.to_pylist()


def test_three_render_styles_converge_to_same_link_layout():
    """All markup styles (quoted / unquoted+implied-</p> /
    single-quoted+nested inline) must yield the identical per-doc link
    multiset — that convergence is what makes the SQL oracle valid."""
    base = None
    for k in (0, 1, 2):  # one nation per style
        t = pa.table({
            "n_nationkey": pa.array([k], pa.int64()),
            "n_name": pa.array(["X"]),
            "n_regionkey": pa.array([7], pa.int64()),
        })
        html = render_nation_links(t).column("html")[0].as_py()
        rows = _extract(html)
        layout = sorted(
            (r["href"].replace(f"/nation/{k}", "/nation/K"),
             r["in_content"]) for r in rows)
        if base is None:
            base = layout
        else:
            assert layout == base, (k, layout, base)
    assert base == [("/nation/K", False), ("/nation/K", True),
                    ("/region/7", False), ("/region/7", True)]


def test_nav_and_footer_anchors_not_in_content():
    t = pa.table({
        "n_nationkey": pa.array([4], pa.int64()),
        "n_name": pa.array(["N"]),
        "n_regionkey": pa.array([1], pa.int64()),
    })
    html = render_nation_links(t).column("html")[0].as_py()
    rows = _extract(html)
    flags = {}
    for r in rows:
        flags.setdefault(r["href"], []).append(r["in_content"])
    assert sorted(flags["/nation/4"]) == [False, True]   # footer + content
    assert sorted(flags["/region/1"]) == [False, True]   # nav + content


def test_media_meta_matches_generator_spec():
    from htmlparsersharp_ray.stages.multimodal import (
        MediaMetaUDF,
        synth_media_table,
    )

    out = MediaMetaUDF()(synth_media_table(8)).to_pylist()
    for row in out:
        i = row["media_id"]
        if i % 2 == 0:
            assert (row["kind"], row["width"], row["height"],
                    row["sample_rate"], row["n_samples"],
                    row["payload_bytes"]) == ("image", 8, 8, 0, 0, 203)
        else:
            assert (row["kind"], row["width"], row["height"],
                    row["sample_rate"], row["n_samples"],
                    row["payload_bytes"]) == ("audio", 0, 0, 16000, 256, 556)
