"""Pattern registry/validation tests (parser_regex.go:74-100,
parser_regex_test.go:393-516)."""

import re

import pytest

from access_log_parser_spark import patterns as pat


def test_presets_compile_and_are_all_named():
    for name, plist in pat.PRESETS.items():
        assert plist, name
        for p in plist:
            c = pat.validate_pattern(p)
            assert c.groups >= 1


def test_preset_widths():
    # SURVEY.md §2.9 field counts
    widths = {
        "apache_clf": 11,
        "apache_clf_vhost": 12,
        "s3": 28,
        "cloudfront": 33,
        "alb": 31,
        "nlb": 22,
        "clb": 17,
    }
    for name, w in widths.items():
        c = re.compile(pat.PRESETS[name][0])
        assert c.groups == w, name


def test_s3_fallback_widths():
    assert [re.compile(p).groups for p in pat.PRESETS["s3"]] == [28, 27, 26, 25, 20]


def test_invalid_pattern_rejected():
    with pytest.raises(pat.PatternError):
        pat.validate_pattern("(")  # does not compile


def test_no_capture_group_rejected():
    with pytest.raises(pat.PatternError, match="capture group not found"):
        pat.validate_pattern("[!-~]+")


def test_non_named_group_rejected():
    with pytest.raises(pat.PatternError, match="non-named capture group"):
        pat.validate_pattern("(?P<field1>[!-~]+) ([!-~]+) (?P<field3>[!-~]+)")


def test_re2_unsupported_constructs_rejected():
    """The reference's regexp.Compile (RE2) cannot express lookaround or
    backreferences, so user patterns using them must fail fast here too
    instead of silently meaning something the reference cannot run."""
    for bad, name in [
        (r"(?P<a>x)(?=y)", "lookahead"),
        (r"(?P<a>x)(?!y)", "negative lookahead"),
        (r"(?<=y)(?P<a>x)", "lookbehind"),
        (r"(?<!y)(?P<a>x)", "negative lookbehind"),
        (r"(?P<a>x)\1", "backreference"),
        (r"(?P<a>x)(?P=a)", "backreference"),
    ]:
        with pytest.raises(pat.PatternError, match=name):
            pat.validate_pattern(bad)
    # inside a character class these are literal chars, not constructs
    assert pat.validate_pattern(r"(?P<a>[(?=!]+)") is not None


def test_union_schema_order():
    compiled = [pat.validate_pattern(p) for p in pat.PRESETS["s3"]]
    union = pat.union_schema(compiled)
    assert union[0] == "bucket_owner"
    assert union[-1] == "acl_required"
    assert len(union) == 28
