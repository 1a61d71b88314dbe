"""Scalar / per-document functions, importable standalone (no Ray).

The batched stages in ``..stages`` wrap these; they are exposed here so a
user can apply the same functions outside a pipeline (driver-side checks,
notebooks, tests).
"""

from ..stages.dedup import (  # noqa: F401
    _minhash_signature as minhash_signature,
    _shingles as shingles,
    _simhash64 as simhash64,
)
from ..html.parser import parse, parse_fragment, preprocess  # noqa: F401
from ..extract.boilerplate import extract_main_content  # noqa: F401


def extract_text(html: str) -> str:
    """One-call helper: HTML → main-content text."""
    return extract_main_content(parse(html).root).text
