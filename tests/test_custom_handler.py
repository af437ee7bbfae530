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


def test_builtin_handler_passed_as_callable_keeps_tsv_header(spark):
    """Option(line_handler=handlers.tsv_line_handler) — the callable
    spelling of the built-in — must behave exactly like
    Option(line_handler="tsv"), including the first-matched-per-source
    TSV header row (the engine used to detect TSV by NAME only)."""
    from access_log_parser_spark import handlers

    by_name, _ = new_s3_parser(spark, Option(line_handler="tsv")).parse_string(
        g.ALL_MATCH_INPUT
    )
    by_fn, _ = new_s3_parser(
        spark, Option(line_handler=handlers.tsv_line_handler)
    ).parse_string(g.ALL_MATCH_INPUT)
    assert by_fn == by_name
    assert by_fn[0].startswith("bucket_owner\t")  # header present
