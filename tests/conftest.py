"""Shared test fixtures. Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    yield
    ray.shutdown()


_ESCAPES = [("\\\\", "\\"), ("\\0", "\x00"), ("\\r", "\r"),
            ("\\v", "\x0b"), ("\\f", "\x0c"), ("\\ufeff", "﻿")]


def unescape_dat(s: str) -> str:
    """Reverse of gen_fixtures.escape_dat (control chars kept readable)."""
    out = []
    i = 0
    n = len(s)
    while i < n:
        c = s[i]
        if c == "\\" and i + 1 < n:
            for esc, raw in _ESCAPES:
                if s.startswith(esc, i):
                    out.append(raw)
                    i += len(esc)
                    break
            else:
                out.append(c)
                i += 1
        else:
            out.append(c)
            i += 1
    return "".join(out)


def load_dat_fixtures(path):
    """Parse an html5lib-tests style .dat file into test cases.

    Sections: #data, #errors (count or free text; only a leading integer is
    checked when present), #document-fragment (context tag), #document
    (expected serialized tree), #text (expected extracted text).
    """
    cases = []
    with open(path, encoding="utf-8") as f:
        content = f.read()
    blocks = content.split("\n\n#data\n")
    if blocks and blocks[0].startswith("#data\n"):
        blocks[0] = blocks[0][len("#data\n"):]
    for block in blocks:
        if not block.strip():
            continue
        case = {"data": "", "fragment": None, "document": None, "text": None,
                "errors": None}
        section = "data"
        lines = block.split("\n")
        buf = {"data": [], "errors": [], "document": [], "text": [], "fragment": []}
        for line in lines:
            if line == "#errors":
                section = "errors"
            elif line == "#document-fragment":
                section = "fragment"
            elif line == "#document":
                section = "document"
            elif line == "#text":
                section = "text"
            else:
                buf[section].append(line)
        case["data"] = unescape_dat("\n".join(buf["data"]))
        if buf["fragment"]:
            case["fragment"] = buf["fragment"][0].strip()
        if buf["document"]:
            case["document"] = unescape_dat("\n".join(buf["document"]).rstrip("\n"))
        if buf["text"]:
            case["text"] = unescape_dat("\n".join(buf["text"]).rstrip("\n"))
        if buf["errors"]:
            try:
                case["errors"] = int(buf["errors"][0])
            except ValueError:
                pass
        cases.append(case)
    return cases
