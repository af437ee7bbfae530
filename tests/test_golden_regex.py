"""End-to-end S3 golden tests, transliterated from
/root/reference/parser_core_test.go:530-1980 (Test_parse* "regex:" cases).
Assertions: exact serialized lines AND counter tuples
(total, matched, unmatched, excluded, skipped)."""

import pytest

import golden_s3 as g
from access_log_parser_spark import Option, new_s3_parser
from access_log_parser_spark.filters import FilterError


def counters(result):
    return result.counters()


def test_all_match(spark):
    out, r = new_s3_parser(spark).parse_string(g.ALL_MATCH_INPUT)
    assert out == g.ALL_MATCH_DATA
    assert counters(r) == (5, 5, 0, 0, 0)
    assert r.check_invariant()
    assert r.errors == []


def test_contains_unmatch(spark):
    out, r = new_s3_parser(spark).parse_string(g.CONTAINS_UNMATCH_INPUT)
    assert out == g.CONTAINS_UNMATCH_DATA
    assert counters(r) == (5, 4, 1, 0, 0)
    assert len(r.errors) == 1
    assert r.errors[0].line_number == 4
    assert r.errors[0].line == g.L4_TRUNC


def test_filter(spark):
    p = new_s3_parser(spark, Option(filters=g.FILTERS))
    out, r = p.parse_string(g.ALL_MATCH_INPUT)
    assert out == g.FILTER_DATA
    assert counters(r) == (5, 1, 0, 4, 0)


def test_skip_lines_with_line_number(spark):
    p = new_s3_parser(spark, Option(skip_lines=g.SKIP_LINES, line_number=True))
    out, r = p.parse_string(g.ALL_MATCH_INPUT)
    assert out == g.SKIP_DATA
    assert counters(r) == (5, 3, 0, 0, 2)


def test_all_unmatch(spark):
    out, r = new_s3_parser(spark).parse_string(g.ALL_UNMATCH_INPUT)
    assert out == []
    assert counters(r) == (5, 0, 5, 0, 0)
    assert [e.line_number for e in r.errors] == [1, 2, 3, 4, 5]
    assert [e.line for e in r.errors] == [g.AU1, g.AU2, g.AU3, g.AU4, g.AU5]


def test_all_skip(spark):
    p = new_s3_parser(spark, Option(skip_lines=[1, 2, 3, 4, 5]))
    out, r = p.parse_string(g.ALL_MATCH_INPUT)
    assert out == []
    assert counters(r) == (5, 0, 0, 0, 5)


def test_empty_input(spark):
    out, r = new_s3_parser(spark).parse_string("")
    assert out == []
    assert counters(r) == (0, 0, 0, 0, 0)


def test_mixed_skip_filter_unmatch(spark):
    # parser_core_test.go:257-276: skip=[1], filter error_code != NoSuchBucketPolicy
    p = new_s3_parser(
        spark,
        Option(
            skip_lines=g.MIXED_SKIP_LINES,
            filters=g.MIXED_FILTERS,
            line_number=True,
        ),
    )
    out, r = p.parse_string(g.CONTAINS_UNMATCH_INPUT)
    assert out == g.MIXED_DATA
    assert counters(r) == (5, 2, 1, 1, 1)
    assert [e.line_number for e in r.errors] == [4]


def test_unmatch_lines_emitted(spark):
    p = new_s3_parser(spark, Option(unmatch_lines=True))
    out, r = p.parse_string(g.CONTAINS_UNMATCH_INPUT)
    # raw unmatched line appears in output stream at its position
    assert out == g.CONTAINS_UNMATCH_DATA[:3] + [g.L4_TRUNC] + g.CONTAINS_UNMATCH_DATA[3:]
    assert counters(r) == (5, 4, 1, 0, 0)


def test_unmatch_lines_with_prefix(spark):
    p = new_s3_parser(spark, Option(unmatch_lines=True, prefix=True))
    out, r = p.parse_string(g.CONTAINS_UNMATCH_INPUT)
    assert out[3] == "[ UNMATCHED ] " + g.L4_TRUNC
    assert out[0] == "[ PROCESSED ] " + g.CONTAINS_UNMATCH_DATA[0]
    assert counters(r) == (5, 4, 1, 0, 0)


def test_prefix_ansi_color_path(spark):
    """tty color path (parser_core.go:186-189): bold-green PROCESSED /
    bold-red UNMATCHED wrapped in reset — byte-identical escapes; and the
    multi-line record colors every physical line."""
    p = new_s3_parser(spark, Option(unmatch_lines=True, prefix=True, color=True))
    out, r = p.parse_string(g.CONTAINS_UNMATCH_INPUT)
    assert out[0] == "\033[1;32m[ PROCESSED ] \033[0m" + g.CONTAINS_UNMATCH_DATA[0]
    assert out[3] == "\033[1;31m[ UNMATCHED ] \033[0m" + g.L4_TRUNC
    assert counters(r) == (5, 4, 1, 0, 0)

    p2 = new_s3_parser(
        spark,
        Option(line_handler="pretty_json", labels=["bucket"], prefix=True, color=True),
    )
    out2, _ = p2.parse_string(g.L5)
    m = "\033[1;32m[ PROCESSED ] \033[0m"
    assert out2 == [f'{m}{{\n{m}  "bucket": "awsrandombucket77"\n{m}}}']

    # color=False forces the plain path even if stdout were a tty
    p3 = new_s3_parser(spark, Option(prefix=True, color=False))
    out3, _ = p3.parse_string(g.L5)
    assert out3[0].startswith("[ PROCESSED ] ")


def test_labels_selection_keeps_line_order(spark):
    # selectLabels keeps original line order, not target order
    p = new_s3_parser(spark, Option(labels=["method", "bucket"]))
    out, _ = p.parse_string(g.L5)
    assert out == ['{"bucket":"awsrandombucket77","method":"GET"}']


def test_labels_unknown_target_silently_dropped(spark):
    p = new_s3_parser(spark, Option(labels=["nonexistent", "bucket"]))
    out, _ = p.parse_string(g.L5)
    assert out == ['{"bucket":"awsrandombucket77"}']


def test_invalid_filter_syntax_raises(spark):
    p = new_s3_parser(spark, Option(filters=["aaa := bbb"]))
    with pytest.raises(FilterError):
        p.parse_string(g.ALL_MATCH_INPUT)


def test_filter_unknown_label_aborts(spark):
    p = new_s3_parser(spark, Option(filters=["no_such_label == x"]))
    with pytest.raises(Exception, match="invalid field name"):
        p.parse_string(g.ALL_MATCH_INPUT)


def test_filter_non_numeric_value_aborts(spark):
    # bytes_sent of line 1 is "113" but turn_around_time is "-": numeric
    # filter on a non-numeric value must abort the whole parse
    p = new_s3_parser(spark, Option(filters=["turn_around_time > 1"]))
    with pytest.raises(Exception, match="could not convert|cannot evaluate"):
        p.parse_string(g.ALL_MATCH_INPUT)


def test_tsv_handler_header_once(spark):
    p = new_s3_parser(spark, Option(line_handler="tsv", labels=["bucket", "method"]))
    out, r = p.parse_string(g.ALL_MATCH_INPUT)
    assert out[0] == "bucket\tmethod\nawsrandombucket43\tGET"
    assert out[1] == "awsrandombucket59\tGET"
    assert len(out) == 5
    assert counters(r) == (5, 5, 0, 0, 0)


def test_ltsv_handler_output(spark):
    p = new_s3_parser(spark, Option(line_handler="ltsv", labels=["bucket", "key"]))
    out, _ = p.parse_string(g.L5)
    # key value "-" stays "-"; empty would become "-"
    assert out == ["bucket:awsrandombucket77\tkey:-"]


def test_kv_handler_output(spark):
    p = new_s3_parser(spark, Option(line_handler="kv", labels=["bucket"]))
    out, _ = p.parse_string(g.L5)
    assert out == ['bucket="awsrandombucket77"']


def test_pretty_json_with_prefix_multiline(spark):
    p = new_s3_parser(
        spark, Option(line_handler="pretty_json", labels=["bucket"], prefix=True)
    )
    out, _ = p.parse_string(g.L5)
    assert out == [
        '[ PROCESSED ] {\n[ PROCESSED ]   "bucket": "awsrandombucket77"\n[ PROCESSED ] }'
    ]


def test_no_pattern_errors(spark):
    from access_log_parser_spark import RegexParser
    from access_log_parser_spark.decoders import NoPatternError

    p = RegexParser(spark)
    with pytest.raises(NoPatternError):
        p.parse_string(g.ALL_MATCH_INPUT)
