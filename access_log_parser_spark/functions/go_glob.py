"""Go ``path/filepath.Match`` semantics in Python.

The reference glob-filters zip entry names with ``filepath.Match``
(`/root/reference/parser_core.go:535`), whose semantics differ from
Python ``fnmatch`` in two observable ways:

- ``*`` and ``?`` never match the path separator ``/`` (fnmatch's do);
- malformed patterns (unclosed class, trailing backslash, bad range
  syntax) are a hard error (``globPatternError``,
  parser_core.go:536-538), not a silent non-match.

This module translates a Go pattern to an anchored Python regex,
reproducing Go's error cases: inside ``[...]`` a range char may not be
``-`` or ``]`` or end-of-pattern (getEsc), the class must close after at
least one range, and a trailing ``\\`` is invalid.
"""

from __future__ import annotations

import re

GLOB_PATTERN_ERROR = "invalid glob pattern"


class GlobPatternError(ValueError):
    def __init__(self) -> None:
        super().__init__(GLOB_PATTERN_ERROR)


def _get_esc(pattern: str, i: int) -> tuple[str, int]:
    """One (possibly escaped) class char; Go's getEsc error cases."""
    if i >= len(pattern) or pattern[i] in "-]":
        raise GlobPatternError
    c = pattern[i]
    if c == "\\":
        i += 1
        if i >= len(pattern):
            raise GlobPatternError
        c = pattern[i]
    return c, i + 1


def translate(pattern: str) -> re.Pattern:
    out = []
    i, n = 0, len(pattern)
    while i < n:
        c = pattern[i]
        if c == "*":
            out.append("[^/]*")
            i += 1
        elif c == "?":
            out.append("[^/]")
            i += 1
        elif c == "\\":
            if i + 1 >= n:
                raise GlobPatternError
            out.append(re.escape(pattern[i + 1]))
            i += 2
        elif c == "[":
            i += 1
            negated = i < n and pattern[i] == "^"
            if negated:
                i += 1
            ranges = []
            nrange = 0
            while True:
                if i < n and pattern[i] == "]" and nrange > 0:
                    i += 1
                    break
                lo, i = _get_esc(pattern, i)
                hi = lo
                if i < n and pattern[i] == "-":
                    hi, i = _get_esc(pattern, i + 1)
                if ord(lo) <= ord(hi):  # Go: lo>hi is a no-op range, not an error
                    ranges.append(
                        re.escape(lo) if lo == hi else f"{re.escape(lo)}-{re.escape(hi)}"
                    )
                nrange += 1
            if ranges:
                out.append(("[^" if negated else "[") + "".join(ranges) + "]")
            else:  # only impossible ranges: negated matches any rune, else none
                out.append(r"[\s\S]" if negated else r"(?!x)x")
        else:
            out.append(re.escape(c))
            i += 1
    return re.compile("(?s)" + "".join(out) + r"\Z")


def go_match(pattern: str, name: str) -> bool:
    """``filepath.Match(pattern, name)``; raises GlobPatternError on a
    malformed pattern (even one that could not change the outcome)."""
    return translate(pattern).match(name) is not None
