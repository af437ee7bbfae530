"""Custom LineHandler injection (Option.LineHandler, parser_core.go:64,
README.md:110-123): a user-supplied Python callable replaces the
serializer — the engine's UDF surface."""

import golden_s3 as g
from access_log_parser_spark import Option, RegexParser, new_s3_parser


def test_custom_line_handler(spark):
    # defined inside the test so cloudpickle serializes it by value
    # (module-level test functions aren't importable on executors)
    def csv_handler(labels, values, is_first):
        return ";".join(values[: len(labels)])

    p = new_s3_parser(
        spark, Option(labels=["bucket", "method", "http_status"], line_handler=csv_handler)
    )
    out, r = p.parse_string(g.ALL_MATCH_INPUT)
    assert out[0] == "awsrandombucket43;GET;200"
    assert len(out) == 5
    assert r.counters() == (5, 5, 0, 0, 0)


def test_user_patterns_regex_parser(spark):
    # AddPatterns-style user pattern flow (parser_regex.go:91-100)
    p = RegexParser(spark, Option())
    p.add_pattern(r"^(?P<k>\w+)=(?P<v>\w+)$")
    out, r = p.parse_string("a=1\nbad line\nb=2")
    assert out == ['{"k":"a","v":"1"}', '{"k":"b","v":"2"}']
    assert r.counters() == (3, 2, 1, 0, 0)
