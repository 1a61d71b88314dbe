"""Named character reference resolution (longest match + legacy rules).

The reference embeds the full WHATWG entity table (2,231 entries) as C#
arrays with a two-char-prefix acceleration index (reference:
Core/NamedCharacters.cs:13,352, Core/NamedCharacterAccel.cs HILO_ACCEL) and
does longest-match with historical without-semicolon rules
(reference: Core/Tokenizer.cs:3105-3512).

Python ships the identical WHATWG table in the standard library
(``html.entities.html5`` — public spec data), so we build lookup
structures from it once at import time: dict hits replace the
reference's binary scans.
"""

from __future__ import annotations

import re
from html.entities import html5 as _HTML5_ENTITIES

# Names that require the trailing semicolon, keyed WITHOUT the ';'.
WITH_SEMI: dict[str, str] = {}
# Historical names valid without a semicolon.
NO_SEMI: dict[str, str] = {}
for _name, _value in _HTML5_ENTITIES.items():
    if _name.endswith(";"):
        WITH_SEMI[_name[:-1]] = _value
    else:
        NO_SEMI[_name] = _value

_MAX_NOSEMI_LEN = max(len(n) for n in NO_SEMI)

# Maximal run of entity-name characters after '&'.
_NAME_RUN = re.compile(r"[A-Za-z0-9]+")


def match_entity(text: str, pos: int, in_attribute: bool):
    """Longest-match a named character reference at ``text[pos:]`` where
    ``text[pos-1]`` was '&'.

    Returns ``(consumed_chars, replacement, had_semicolon)`` or ``None``
    when nothing matches (caller emits the '&' literally / flags an
    ambiguous-ampersand error when a run was present).

    Implements the WHATWG "named character reference state" including the
    attribute-value legacy rule: a without-semicolon match inside an
    attribute value is abandoned when the next character is alphanumeric
    or '=' (reference: Core/Tokenizer.cs:3390-3448).
    """
    m = _NAME_RUN.match(text, pos)
    if m is None:
        return None
    run = m.group()
    run_end = m.end()
    # Full with-semicolon match on the whole run.
    if run_end < len(text) and text[run_end] == ";":
        value = WITH_SEMI.get(run)
        if value is not None:
            return (len(run) + 1, value, True)
    # Longest without-semicolon (legacy) prefix.
    limit = min(len(run), _MAX_NOSEMI_LEN)
    for length in range(limit, 0, -1):
        value = NO_SEMI.get(run[:length])
        if value is not None:
            if in_attribute:
                if length < len(run):
                    return None  # next char is alphanumeric by construction
                nxt = text[pos + length] if pos + length < len(text) else ""
                if nxt == "=":
                    return None
            return (length, value, False)
    return None
