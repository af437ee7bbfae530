"""End-to-end LTSV golden tests, transliterated from
/root/reference/parser_core_test.go (Test_parse* "ltsv:" cases, :278-431)."""

import golden_ltsv as g
from access_log_parser_spark import LTSVParser, Option


def test_all_match(spark):
    out, r = LTSVParser(spark).parse_string(g.ALL_MATCH_INPUT)
    assert out == g.ALL_MATCH_DATA
    assert r.counters() == (5, 5, 0, 0, 0)


def test_contains_unmatch_with_line_number(spark):
    p = LTSVParser(spark, Option(line_number=True))
    out, r = p.parse_string(g.CONTAINS_UNMATCH_INPUT)
    assert out == g.CONTAINS_UNMATCH_DATA
    assert r.counters() == (5, 4, 1, 0, 0)
    assert [e.line_number for e in r.errors] == [4]
    assert r.errors[0].line == g.T4_BAD


def test_filter(spark):
    p = LTSVParser(spark, Option(filters=g.FILTERS))
    out, r = p.parse_string(g.ALL_MATCH_INPUT)
    assert out == g.FILTER_DATA
    assert r.counters() == (5, 1, 0, 4, 0)


def test_skip_lines(spark):
    p = LTSVParser(spark, Option(skip_lines=g.SKIP_LINES, line_number=True))
    out, r = p.parse_string(g.ALL_MATCH_INPUT)
    assert out == g.SKIP_DATA
    assert r.counters() == (5, 3, 0, 0, 2)


def test_all_unmatch(spark):
    out, r = LTSVParser(spark).parse_string(g.ALL_UNMATCH_INPUT)
    assert out == []
    assert r.counters() == (5, 0, 5, 0, 0)
    assert [e.line_number for e in r.errors] == [1, 2, 3, 4, 5]


def test_all_skip(spark):
    p = LTSVParser(spark, Option(skip_lines=[1, 2, 3, 4, 5]))
    out, r = p.parse_string(g.ALL_MATCH_INPUT)
    assert out == []
    assert r.counters() == (5, 0, 0, 0, 5)


def test_empty(spark):
    out, r = LTSVParser(spark).parse_string("")
    assert out == []
    assert r.counters() == (0, 0, 0, 0, 0)


def test_mixed(spark):
    p = LTSVParser(
        spark,
        Option(
            skip_lines=g.MIXED_SKIP_LINES,
            filters=g.MIXED_FILTERS,
            line_number=True,
        ),
    )
    out, r = p.parse_string(g.CONTAINS_UNMATCH_INPUT)
    assert out == g.MIXED_DATA
    assert r.counters() == (5, 2, 1, 1, 1)


def test_unmatch_prefix(spark):
    p = LTSVParser(spark, Option(unmatch_lines=True, prefix=True, line_number=True))
    out, r = p.parse_string(g.CONTAINS_UNMATCH_INPUT)
    # parser_core_test.go:461-467 golden
    assert out[3] == "[ UNMATCHED ] " + g.T4_BAD
    assert out[0] == "[ PROCESSED ] " + g.CONTAINS_UNMATCH_DATA[0]
    assert r.counters() == (5, 4, 1, 0, 0)


def test_dynamic_width_rows(spark):
    # lines 4-5 omit referer/user_agent: dynamic per-line schema survives
    out, _ = LTSVParser(spark).parse_string(g.T4)
    assert out == [g.D4]
