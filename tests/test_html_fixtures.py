"""Tree-construction fixture corpus (html5lib-tests style, SURVEY.md §5.2.1).

Each .dat case parses #data (optionally with #document-fragment context)
and compares the serialized tree to #document byte-for-byte, and the
error count when present.
"""

from __future__ import annotations

import glob
import os

import pytest

from htmlparsersharp_ray.html import parse, parse_fragment, serialize_tree
from .conftest import load_dat_fixtures

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


def _collect():
    params = []
    for path in sorted(glob.glob(os.path.join(FIXTURE_DIR, "*.dat"))):
        name = os.path.splitext(os.path.basename(path))[0]
        for i, case in enumerate(load_dat_fixtures(path)):
            if case["document"] is None:
                continue  # extraction-only fixtures (#text) live elsewhere
            params.append(pytest.param(case, id=f"{name}-{i}"))
    return params


@pytest.mark.parametrize("case", _collect())
def test_tree_construction(case):
    if case["fragment"]:
        result = parse_fragment(case["data"], case["fragment"])
    else:
        result = parse(case["data"])
    tree = serialize_tree(result.root)
    assert tree == case["document"], (
        f"tree mismatch for {case['data']!r}\n--- got ---\n{tree}\n"
        f"--- expected ---\n{case['document']}"
    )
    if case["errors"] is not None:
        assert result.errors == case["errors"], (
            f"error count mismatch for {case['data']!r}: "
            f"got {result.errors}, expected {case['errors']}"
        )


def test_corpus_is_nonempty():
    assert len(_collect()) > 200
