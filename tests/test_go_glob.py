"""functions/go_glob.py vs Go's own filepath.Match test table.

Cases transliterated from the Go standard library's match tests
(path/filepath/match_test.go, public) — same pattern/name/expected
triples, with ErrBadPattern cases mapped to GlobPatternError.
"""

from __future__ import annotations

import pytest

from access_log_parser_spark.functions.go_glob import GlobPatternError, go_match

# (pattern, name, matches)
CASES = [
    ("abc", "abc", True),
    ("*", "abc", True),
    ("*c", "abc", True),
    ("a*", "a", True),
    ("a*", "abc", True),
    ("a*", "ab/c", False),            # * does not cross '/'
    ("a*/b", "abc/b", True),
    ("a*/b", "a/c/b", False),
    ("a*b*c*d*e*/f", "axbxcxdxe/f", True),
    ("a*b*c*d*e*/f", "axbxcxdxexxx/f", True),
    ("a*b*c*d*e*/f", "axbxcxdxe/xxx/f", False),
    ("a*b*c*d*e*/f", "axbxcxdxexxx/fff", False),
    ("a*b?c*x", "abxbbxdbxebxczzx", True),
    ("a*b?c*x", "abxbbxdbxebxczzy", False),
    ("ab[c]", "abc", True),
    ("ab[b-d]", "abc", True),
    ("ab[e-g]", "abc", False),
    ("ab[^c]", "abc", False),
    ("ab[^b-d]", "abc", False),
    ("ab[^e-g]", "abc", True),
    ("a\\*b", "a*b", True),
    ("a\\*b", "ab", False),
    ("a?b", "a☺b", True),
    ("a[^a]b", "a☺b", True),
    ("a???b", "a☺b", False),          # ☺ is ONE rune in Go and Python
    ("a[^a][^a][^a]b", "a☺b", False),
    ("[a-ζ]*", "α", True),
    ("*[a-ζ]", "A", False),
    ("a?b", "a/b", False),            # ? does not cross '/'
    ("a*b", "a/b", False),
    ("[\\]a]", "]", True),
    ("[\\-]", "-", True),
    ("[x\\-]", "x", True),
    ("[x\\-]", "-", True),
    ("[x\\-]", "z", False),
    ("[\\-x]", "x", True),
    ("[\\-x]", "-", True),
    ("[\\-x]", "a", False),
    ("*x", "xxx", True),
]

BAD = [
    ("[]a]", "]"),
    ("[-]", "-"),
    ("[x-]", "x"),
    ("[x-]", "-"),
    ("[x-]", "z"),
    ("[-x]", "x"),
    ("[-x]", "-"),
    ("[-x]", "a"),
    ("\\", "a"),
    ("[a-b-c]", "a"),
    ("[", "a"),
    ("[^", "a"),
    ("[^bc", "a"),
    ("a[", "a"),
]


@pytest.mark.parametrize("pattern,name,want", CASES)
def test_go_match_table(pattern, name, want):
    assert go_match(pattern, name) is want


@pytest.mark.parametrize("pattern,name", BAD)
def test_bad_patterns_raise(pattern, name):
    with pytest.raises(GlobPatternError):
        go_match(pattern, name)


def test_impossible_range_is_not_an_error():
    # Go: lo > hi never matches but is not ErrBadPattern
    assert go_match("[z-a]", "m") is False
    assert go_match("[^z-a]", "m") is True
