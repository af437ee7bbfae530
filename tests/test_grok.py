"""Grok-lite macro expansion + end-to-end parse."""

import pytest

from access_log_parser_spark import Option
from access_log_parser_spark.grok import compile_grok, grok_parser, grok_to_regex
from access_log_parser_spark.patterns import PatternError


def test_macro_expansion_named_and_anonymous():
    rx = grok_to_regex("%{IPV4:ip} - %{USER:user}")
    assert rx == r"(?P<ip>(?:\d{1,3}\.){3}\d{1,3})\ \-\ (?P<user>[a-zA-Z0-9._-]+)"
    rx2 = grok_to_regex("%{INT} %{WORD:w}")
    assert "(?:" in rx2 and "(?P<w>" in rx2


def test_literal_text_is_escaped():
    rx = grok_to_regex("cost=$%{NUMBER:amt} (usd)")
    import re

    assert re.search(rx, "cost=$12.50 (usd)").group("amt") == "12.50"


def test_unknown_macro_rejected():
    with pytest.raises(PatternError, match="unknown grok macro"):
        grok_to_regex("%{NOSUCHMACRO:x}")


def test_all_named_validation():
    # a grok expr with zero captures fails the engine's pattern validation
    with pytest.raises(PatternError):
        compile_grok("%{INT} %{WORD}")


def test_grok_parser_end_to_end(spark):
    p = grok_parser(
        spark,
        [
            "%{TIMESTAMP_ISO8601:ts} %{LOGLEVEL:level} %{NOTSPACE:logger} - %{GREEDYDATA:msg}",
            "%{TIMESTAMP_ISO8601:ts} %{LOGLEVEL:level} %{GREEDYDATA:msg}",
        ],
        Option(),
    )
    text = (
        "2024-03-01T10:00:00Z INFO app.core - started ok\n"
        "2024-03-01T10:00:01Z ERROR boom\n"
        "not a log line\n"
    )
    out, r = p.parse_string(text)
    assert r.counters() == (3, 2, 1, 0, 0)
    assert out[0] == (
        '{"ts":"2024-03-01T10:00:00Z","level":"INFO","logger":"app.core",'
        '"msg":"started ok"}'
    )
    assert out[1] == '{"ts":"2024-03-01T10:00:01Z","level":"ERROR","msg":"boom"}'


def test_grok_apache_clf_equivalent(spark):
    # grok-authored CLF grammar parses the reference's sample line
    p = grok_parser(
        spark,
        ['%{IPORHOST:remote_host} %{NOTSPACE:ident} %{USER:user} [%{HTTPDATE:ts}] "%{WORD:method} %{URIPATH:path} HTTP/%{NUMBER:httpver}" %{INT:status} %{INT:size}'],
    )
    out, r = p.parse_string(
        '123.45.67.89 - frank [10/Oct/2000:13:55:36 -0700] "GET /apache_pb.gif HTTP/1.0" 200 2326'
    )
    assert r.matched == 1
    assert '"remote_host":"123.45.67.89"' in out[0]
    assert '"status":"200"' in out[0]
